package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Adversarial-skew smoke for the round-5 newcomers (r5 VERDICT item
  * 6): measures the two operators whose 100 TB story rests on a
  * boundedness argument, under the exact skew that argument must
  * survive.
  *
  *  - k-core on a power-law hub graph: one node of degree 10⁴ glued
  *    onto the lineitem background graph. The per-round cost model is
  *    ONE degree aggregate + two shrinking semi-joins; a hub is just
  *    10⁴ more rows through a hash aggregate (no per-key state beyond
  *    the count), so wall must stay ~flat and the hub must peel once
  *    its one-shot partners do. Per-round survivor counts are printed
  *    (maxRounds probing — each probe re-runs the peel, so the probe
  *    column is diagnostics, not the timed path).
  *  - source-overlap with one gram shared by ALL sources: the pair
  *    join is keyed by gram, so the universal gram creates the
  *    worst-case bucket — #sources rows joining #sources rows. The
  *    bound is (#sources choose 2) output pairs per gram, INDEPENDENT
  *    of document count; pair-row count must stay ≤ C(20,2) = 190 and
  *    wall must track the gram stream, not docs².
  *
  * Usage: runMain graft.tools.SkewSmoke [sfDir]
  */
object SkewSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    // ---------------------------------------------------- k-core hub
    // background: the ScaleSmoke bipartite projection (~120k edges)
    val background = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_suppkey").cast("long").as("s"),
        (col("l_partkey") % 300 + 10000).cast("long").as("p"))
      .repartition(32)
    for (hubDeg <- Seq(0, 1000, 10000)) {
      // hub node 777777 linked to hubDeg fresh one-shot partners:
      // the partners' degree is 1 < k, so round 1 peels them all and
      // the hub's surviving degree collapses to its background edges
      val edges =
        if (hubDeg == 0) background
        else background.unionAll(
          spark.range(hubDeg.toLong).select(lit(777777L).as("s"),
            (col("id") + 900000000L).as("p")))
      val (coreN, t) = time { Graph.kCore(edges, "s", "p", k = 35).count() }
      // per-round survivor counts (diagnostic probes, re-run the peel)
      val rounds = (1 to 3).map(r =>
        Graph.kCore(edges, "s", "p", k = 35, maxRounds = r).count())
      println(f"kcore-hub deg=$hubDeg%6d core=$coreN%7d  $t%6.1f s  " +
        s"survivors/round=${rounds.mkString(",")}")
      sweep()
    }

    // ------------------------------------------- overlap universal gram
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    for (planted <- Seq(false, true)) {
      val corpus =
        if (!planted) docs
        else docs.withColumn("text",
          concat(col("text"), lit(" universally shared gram")))
      val (rows, t) = time {
        graft.operators.CorpusOverlap
          .sourceOverlap(corpus, "source", "text", n = 3).count()
      }
      // the hottest gram's bucket: how many (source, gram) rows share
      // the most frequent gram — the join fan-out it can cause is
      // exactly C(bucket, 2)
      val toks = corpus.select(col("source").as("src"),
        split(graft.functions.TextAnalysis.normalizeText(col("text")), " ")
          .as("tk")).filter(size(col("tk")) >= 3)
      val hottest = toks.select(col("src"), explode(transform(
          sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))
          .as("g"))
        .distinct()
        .groupBy(col("g")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().getLong(0)
      println(f"overlap planted=$planted%5s pairs=$rows%5d " +
        f"hottestGramBucket=$hottest%3d  $t%6.1f s")
      sweep()
    }
    spark.stop()
  }
}
