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
    def globalPartialAggBelow(p: SparkPlan): Boolean = p.collectFirst {
      case h: HashAggregateExec if h.groupingExpressions.isEmpty => true
      case o: ObjectHashAggregateExec if o.groupingExpressions.isEmpty => true
      case s: SortAggregateExec if s.groupingExpressions.isEmpty => true
    }.getOrElse(false)
    root.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 &&
            !globalPartialAggBelow(e.child) =>
        "SinglePartitionExchange"
    }
  }

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
          val issues = offendingExchanges(exec) ++ Seq(
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
