package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN view under
  * append-only deltas — the join half of incremental view maintenance
  * ([[IncrementalAgg]] is the aggregate half). For an inner equi-join
  * view J = A ⋈_k B, the classic delta rule:
  *
  *   ΔJ = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB),   Jnew = J ⊎ ΔJ
  *
  * is exact under bag semantics for APPEND-ONLY deltas (each new pair
  * (a, b) has a in ΔA or b in ΔB or both; pairs with both old are
  * already in J; the three terms are disjoint by construction).
  * Updates/deletes should be compacted into retract+append form first
  * (UpdateJob.applyChangelog) — retractions then subtract by key, the
  * standard IVM treatment.
  *
  * Why this matters at 100 TB: re-running A ⋈ B re-shuffles both full
  * tables every refresh; the delta rule shuffles the DELTAS against
  * the base sides only — with A and B stored bucketed on k
  * (Scale.writeBucketed), the two delta-vs-base joins are
  * exchange-free on the base side, so refresh cost tracks delta size,
  * not base size. The base-vs-base join never re-runs.
  */
object IncrementalJoin {

  /** Bring a published inner-join view current: `oldView` must carry
    * exactly the columns of `aOld.join(bOld, keys)` (keys + both
    * payloads). Returns the refreshed view ≡
    * (aOld ∪ aDelta) ⋈ (bOld ∪ bDelta) bit-for-bit — the equivalence
    * the q149 oracle asserts by recomputing from scratch. */
  def mergeDelta(oldView: DataFrame,
      aOld: DataFrame, aDelta: DataFrame,
      bOld: DataFrame, bDelta: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    val deltaA = aDelta.join(bOld, keys)
    val deltaB = aOld.join(bDelta, keys)
    val deltaAB = aDelta.join(bDelta, keys)
    oldView
      .unionByName(deltaA)
      .unionByName(deltaB)
      .unionByName(deltaAB)
  }
}
