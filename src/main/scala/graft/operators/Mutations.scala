package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-oriented restatements of the reference's keyed mutation sinks.
  *
  * The reference issues one `UPDATE ... WHERE id = k` per row
  * (`etl/etl.py:315-351`) and one `DELETE ... WHERE id IN (...)` per chunk
  * (`etl/etl.py:354-372`). On Spark these become single distributed plans:
  * MERGE-style outer-join + column selection for update, left-anti join
  * for delete.
  *
  * Scale notes (100 TB): both shapes shuffle the BASE table on the key
  * unless the mutation side is broadcast-small — AQE converts the join to
  * a broadcast automatically when it is. For repeated mutation of the same
  * stored table, use PartitionedTable (key-bucketed layout + dynamic
  * partition overwrite): only the buckets containing mutated keys are
  * scanned and rewritten (SURVEY §7.5).
  */
object UpdateJob {

  /** MERGE ... WHEN MATCHED THEN UPDATE semantics over plain DataFrames.
    *
    * `updates` must contain the key columns plus the columns to replace;
    * any base column missing from `updates` is carried through unchanged.
    * Duplicate keys in `updates`: when `orderCol` is given, the row with
    * the greatest `orderCol` wins (the reference applies updates in file
    * order, so last row per key wins — SURVEY §7.5); otherwise an
    * arbitrary-but-deterministic `dropDuplicates` picks one.
    *
    * `preserveNullUpdates` is the fixed-mode alternative to reference
    * quirk Q10 (`etl/etl.py:334`: UPDATE always SETs the_geom, even to
    * NULL): when true, a NULL update value keeps the base value instead
    * of overwriting it. Default false — reference-faithful overwrite.
    */
  def merge(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      orderCol: Option[String] = None,
      preserveNullUpdates: Boolean = false): DataFrame = {
    val deduped = orderCol match {
      case Some(oc) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(oc).desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", oc)
      case None => updates.dropDuplicates(keys)
    }
    val updCols = deduped.columns.filterNot(keys.contains).toSeq
    val renamed = updCols.foldLeft(deduped) { (df, c) =>
      df.withColumnRenamed(c, s"__u_$c")
    }.withColumn("__matched", lit(true))
    // __matched marker (not value-null checks) so NULL update values work
    base.join(renamed, keys.toSeq, "left_outer")
      .select(base.columns.toIndexedSeq.map { c =>
        if (updCols.contains(c)) {
          val updated =
            if (preserveNullUpdates) coalesce(col(s"__u_$c"), col(c))
            else col(s"__u_$c")
          when(col("__matched"), updated).otherwise(col(c)).as(c)
        } else
          col(c)
      }: _*)
  }

  /** MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT
    * (upsert). `updates` must have the full base schema. */
  def upsert(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val survivors = base.join(
      updates.select(keys.map(col): _*).distinct(), keys.toSeq, "left_anti")
    survivors.unionByName(updates.select(base.columns.map(col): _*))
  }

  /** Full ANSI MERGE INTO semantics in one pass — the three-branch
    * statement (WHEN MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT
    * MATCHED [AND cond] THEN INSERT, WHEN NOT MATCHED BY SOURCE [AND
    * cond] THEN DELETE) that [[upsert]] (unconditional two-branch) and
    * [[applyChangelog]] (op-column-driven) each cover a slice of.
    *
    * Clause conditions may reference base columns by name and source
    * columns as `src_<name>`; `Some(lit(true))` is an unconditional
    * clause, `None` omits the clause (ANSI default: matched rows
    * without a matched clause stay, unmatched source rows without an
    * insert clause are ignored, base-only rows without a
    * not-matched-by-source clause stay). Matched evaluation order is
    * delete-first (the fixed clause order; ANSI evaluates clauses in
    * statement order). UPDATE and INSERT take the full source row
    * (SET * / INSERT *). `source` must be key-unique — ANSI raises on
    * multiple matches; here a `require` guards it via a count check
    * only when `checkDuplicateSource` (a full pass; disable on trusted
    * feeds).
    *
    * Plan shape (100 TB): ONE full-outer key join (the only shuffle;
    * AQE broadcasts/skew-splits as sizes dictate) + a row-local
    * 5-way CASE projection. The base is never rewritten per clause. */
  def mergeInto(base: DataFrame, source: DataFrame, keys: Seq[String],
      whenMatchedDelete: Option[Column] = None,
      whenMatchedUpdate: Option[Column] = None,
      whenNotMatchedInsert: Option[Column] = None,
      whenNotMatchedBySourceDelete: Option[Column] = None,
      checkDuplicateSource: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    // a base column literally named src_<other base column> (or the
    // presence markers) would collide with the renamed source side and
    // make the clause conditions ambiguous — fail fast (the AsOfJoin
    // __rt guard discipline)
    require(!base.columns.exists(c => base.columns.contains(s"src_$c")),
      "mergeInto: base column names may not collide with src_-prefixed " +
        "forms of other base columns")
    require(!base.columns.exists(c =>
        c == "base__present" || c == "src__present"),
      "mergeInto: base__present/src__present are reserved column names")
    if (checkDuplicateSource) {
      val dups = source.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).count()
      require(dups == 0L,
        "mergeInto: source has duplicate keys (ANSI MERGE cardinality)")
    }
    val cols = base.columns.toSeq
    val src = cols.foldLeft(source.select(cols.map(col): _*)) { (df, c) =>
      df.withColumnRenamed(c, s"src_$c")
    }.withColumn("src__present", lit(true))
    val joined = base.withColumn("base__present", lit(true))
      .join(src, keys.map(k => col(k) === col(s"src_$k"))
        .reduce(_ && _), "full_outer")
    val matched = col("base__present").isNotNull &&
      col("src__present").isNotNull
    val srcOnly = col("base__present").isNull
    val baseOnly = col("src__present").isNull
    val f = lit(false)
    val delM = whenMatchedDelete.getOrElse(f)
    val updM = whenMatchedUpdate.getOrElse(f)
    val insN = whenNotMatchedInsert.getOrElse(f)
    val delB = whenNotMatchedBySourceDelete.getOrElse(f)
    val keep =
      when(matched, !coalesce(delM, f))
        .when(srcOnly, coalesce(insN, f))
        .otherwise(!coalesce(delB, f))
    val useSource =
      (matched && !coalesce(delM, f) && coalesce(updM, f)) || srcOnly
    joined.filter(keep)
      .select(cols.map(c =>
        when(useSource, col(s"src_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** CDC changelog apply: compact an ordered change stream
    * (upsert/delete events, one `seqCol` position each) to its NET
    * effect per key, then apply to the base in one pass — the
    * replication-log consumer every warehouse table maintenance runs
    * (Debezium/DMS-style feeds). Per key, the row with the greatest
    * (seq, op) wins; a winning delete removes the key, a winning upsert
    * replaces (or inserts) the full row. `changes` must carry the base
    * schema plus `seqCol`/`opCol`; op values are matched
    * case-insensitively ("d"/"delete" delete, anything else upserts).
    *
    * Scale (100 TB): the window shuffles the CHANGELOG by key (a day's
    * changes, not the table); the base is touched only by a key
    * anti-join (AQE broadcasts the net-key side when small) plus a
    * union — never rewritten per event. Determinism: the (seq, op)
    * order is total whenever seq is unique per key; equal-seq ties
    * break by op descending, so upsert beats delete at the same
    * position, deterministically. */
  def applyChangelog(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.nonEmpty, "need at least one key column")
    // lower() in the tie-break: delete detection below is
    // case-insensitive, so the ordering must be too — with the raw
    // column an uppercase "UPSERT" would sort below "delete" and the
    // documented upsert-beats-delete tie rule would silently invert
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, lower(col(opCol)).desc)
    val net = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val isDelete = lower(col(opCol)).isin("d", "delete")
    val upserts = net.filter(!isDelete).select(base.columns.map(col): _*)
    base.join(net.select(keys.map(col): _*), keys.toSeq, "left_anti")
      .unionByName(upserts)
  }
}

/** Slowly-changing-dimension Type 2 merge: keyed updates close out the
  * current version row and append a new one, preserving full history —
  * the warehouse-standard change-tracking companion to UpdateJob's
  * overwrite MERGE.
  *
  * Scale: one shuffle join of the CURRENT slice against the update
  * batch on the key; historical (already-closed) rows pass through
  * untouched with a map-only filter. Composes with PartitionedTable
  * the same way as the other mutations — bucket by key and only
  * touched buckets rewrite.
  */
object Scd2 {

  /** Apply `updates` (key + the tracked attribute columns + `tsCol`)
    * to a versioned dimension `dim` carrying `valid_from` /
    * `valid_to` LONG columns (open version: valid_to IS NULL).
    * A matched open row is closed (valid_to = update ts) and a new
    * open version appended; updates whose tracked attributes all
    * equal the current version are no-ops (no spurious versions).
    * Updates for unknown keys insert a fresh open version.
    *
    * `updates` must be key-unique (one batch = one version step);
    * dedupe upstream with UpdateJob.merge's orderCol pattern when the
    * batch carries multiple rows per key. */
  def apply(dim: DataFrame, updates: DataFrame, keys: Seq[String],
      attrs: Seq[String], tsCol: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs required")
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
    val u = updates.select(
      (keys.map(col) ++ attrs.map(c => col(c).as(s"__u_$c")) :+
        col(tsCol).as("__u_ts")): _*)
    val joined = open.join(u, keys.toSeq, "full_outer")
    val changed = attrs.map(c => !(col(s"__u_$c") <=> col(c)))
      .reduce(_ || _)
    val matchedChanged = col("__u_ts").isNotNull &&
      col("valid_from").isNotNull && changed
    // surviving open rows: untouched, or update was a no-op
    val stillOpen = joined.filter(col("valid_from").isNotNull &&
        (col("__u_ts").isNull || !changed))
      .select(dim.columns.map(col).toIndexedSeq: _*)
    // closed-out prior versions
    val closedOut = joined.filter(matchedChanged)
      .select(dim.columns.map {
        case "valid_to" => col("__u_ts").as("valid_to")
        case c => col(c)
      }.toIndexedSeq: _*)
    // new versions: changed updates + brand-new keys
    val fresh = joined.filter(col("__u_ts").isNotNull &&
        (col("valid_from").isNull || changed))
      .select(dim.columns.map {
        case "valid_from" => col("__u_ts").as("valid_from")
        case "valid_to" => lit(null).cast("long").as("valid_to")
        case c if attrs.contains(c) => col(s"__u_$c").as(c)
        case c => col(c)
      }.toIndexedSeq: _*)
    closed.unionByName(stillOpen).unionByName(closedOut).unionByName(fresh)
  }

  /** Point-in-time (temporal) lookup: resolve each fact row against the
    * dimension VERSION that was valid at the fact's own timestamp —
    * `valid_from <= ts < valid_to` (open version: valid_to IS NULL).
    * The read-side complement of the Type-2 writer above: joining a
    * fact to the CURRENT version back-dates history; this join
    * reproduces what the dimension said when the fact happened.
    *
    * Facts with no matching key (or a timestamp before the key's first
    * version) keep their row with NULL dimension attributes (left
    * join).
    *
    * Scale: an equi-join on the dimension key — the validity range is a
    * residual join filter, NOT the join condition, so this plans as a
    * plain hash/broadcast join keyed on uniform dimension keys (never a
    * range-explosion). Version count per key is bounded by update
    * cadence, so per-key fan-in stays small. */
  def pointInTime(facts: DataFrame, dim: DataFrame, keys: Seq[String],
      factTs: String): DataFrame = {
    require(keys.nonEmpty, "need at least one dimension key")
    val f = facts.alias("__f")
    val d = dim.alias("__d")
    val keyCond = keys.map(k => col(s"__f.$k") === col(s"__d.$k"))
      .reduce(_ && _)
    val valid = col("__d.valid_from") <= col(s"__f.$factTs") &&
      (col("__d.valid_to").isNull ||
        col(s"__f.$factTs") < col("__d.valid_to"))
    val dimAttrs = dim.columns.filterNot(keys.contains)
      .filterNot(Seq("valid_from", "valid_to").contains)
    f.join(d, keyCond && valid, "left")
      .select(facts.columns.map(c => col(s"__f.$c")) ++
        dimAttrs.map(c => col(s"__d.$c")): _*)
  }
}

object DeleteJob {

  /** DELETE FROM base WHERE key IN (keys) — left-anti join rewrite.
    * `keyDf` needs exactly the key columns. Reference `etl/etl.py:366-370`. */
  def deleteByKeys(base: DataFrame, keyDf: DataFrame,
      keys: Seq[String]): DataFrame =
    base.join(keyDf.select(keys.map(col): _*).distinct(), keys.toSeq,
      "left_anti")
}
