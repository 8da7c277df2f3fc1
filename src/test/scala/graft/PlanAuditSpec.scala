package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Automated scale-pattern lint over EVERY registry query's physical
  * plan at sf0.001: no data-bearing single-partition exchange, no
  * cartesian product, and every Window operator carries a partition
  * spec. The manual round-1/2 plan audits found exactly these
  * anti-patterns (single-partition resume windows, window-argmax) —
  * this pins their absence for all current and future queries.
  *
  * A single-partition exchange IS allowed when it feeds a global
  * (no-grouping) aggregate: its input is the bounded per-partition
  * partial rows (one row or k-item heap per partition), not data —
  * that is the correct plan for `SELECT count(*)` or a global top-k
  * merge.
  *
  * Caveat: operators that eagerly checkpoint internally (the dedup
  * pipelines, connected components) return lineage-truncated frames,
  * so this audits their (small) result plans plus every lazily-built
  * query in full; the internal stages of the eager pipelines are
  * covered by their own plan assertions (SimilaritySpec, ScaleSpec)
  * and the Explain main. */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def offendingExchanges(root: SparkPlan): Seq[String] = {
    // a single-partition exchange is benign iff its child subtree is a
    // global partial aggregate — the shuffled rows are then the bounded
    // per-partition partials (one row / k-item heap per partition),
    // not data. Wrapper nodes (WholeStageCodegen/InputAdapter) hide
    // the aggregate from parent matching, so inspect the child side.
    //
    // EXCEPTION to the exception (r7 VERDICT item 3): a global
    // aggregate whose partials are collect_list/collect_set is NOT
    // bounded — each "partial" row carries every element its
    // partition saw, so the exchange is a full-table single-row pack
    // in disguise (the pre-r8 kaplanMeier shape). Such an aggregate
    // is only benign when a limit/top-k already bounds the subtree
    // below it (the q366 pattern: fold a ≤200-row sorted list).
    def bounded(p: SparkPlan): Boolean = p.collectFirst {
      case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
      case _: org.apache.spark.sql.execution.GlobalLimitExec => true
      case _: org.apache.spark.sql.execution.LocalLimitExec => true
      case _: org.apache.spark.sql.execution.CollectLimitExec => true
    }.getOrElse(false)
    def benignGlobalAgg(aggExprs: Seq[Any], p: SparkPlan): Boolean =
      !aggExprs.exists(e => e.toString.contains("collect_list") ||
        e.toString.contains("collect_set")) || bounded(p)
    def globalPartialAggBelow(p: SparkPlan): Boolean = p.collectFirst {
      case h: HashAggregateExec if h.groupingExpressions.isEmpty =>
        benignGlobalAgg(h.aggregateExpressions, h)
      case o: ObjectHashAggregateExec if o.groupingExpressions.isEmpty =>
        benignGlobalAgg(o.aggregateExpressions, o)
      case s: SortAggregateExec if s.groupingExpressions.isEmpty =>
        benignGlobalAgg(s.aggregateExpressions, s)
    }.getOrElse(false)
    root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 &&
            !globalPartialAggBelow(e.child) =>
        "SinglePartitionExchange"
    }
  }

  /** Rows exempt from the global-collect pack lint, each with the
    * contract that bounds its packed list. Adding a name here is a
    * DESIGN DECISION: the collect input must be a keyed aggregate over
    * a CATEGORICAL key (bounded by the domain, not data volume),
    * packed deliberately for the q60 sorted-fold (order-deterministic
    * float summation). A pack over a data-cardinality key (the pre-r8
    * kaplanMeier's per-duration table) belongs in the two-pass
    * partition-offset prefix shape instead, never here. */
  private val allowedGlobalPacks = Map(
    // temperatureQuotas folds √n over the per-LANGUAGE count table —
    // k = #languages in the mixture, a few dozen by construction
    "q141_temperature_mix" -> "per-language mixture weights",
    // one-way ANOVA folds Σ(Σx)²/n over the per-EVENT-TYPE moment
    // table — k = #event types, a fixed categorical domain
    "q263_anova" -> "per-event-type moment terms",
    // corpus BLEU folds ln p_n over the per-ORDER precision table —
    // k = maxN ≤ 6 rows by the operator's own require
    "q378_bleu" -> "per-order BLEU precision terms",
    // chrF folds P_n/R_n over the same per-ORDER table — k = maxN ≤ 6
    // rows by Evaluation.chrF's own require (the q378 shape)
    "q384_chrf" -> "per-order chrF precision/recall terms")

  test("no registry query plans a data-bearing single-partition " +
      "exchange, cartesian product, or unpartitioned window") {
    // static plans: AQE wrapping hides the exchange tree from collect
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val exec = fn(spark, sfDir).queryExecution.executedPlan
          val planStr = exec.toString
          val exchangeIssues =
            if (allowedGlobalPacks.contains(name)) Nil
            else offendingExchanges(exec)
          val issues = exchangeIssues ++ Seq(
            "CartesianProduct" -> planStr.contains("CartesianProduct"),
            // Window arguments render as [functions], [partitionSpec],
            // [orderSpec] — an empty partition spec shows as `, [], [`
            "GlobalWindow" -> ("""Window \[[^\]]*\], \[\], \[""".r
              .findFirstIn(planStr).isDefined)
          ).collect { case (tag, true) => tag }
          if (issues.nonEmpty) Some(s"$name: ${issues.mkString(", ")}")
          else None
      }
      offenders shouldBe empty
    } finally spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
  }
}
