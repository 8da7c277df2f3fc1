package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve smoke for the round-6-continuation operators — each
  * newcomer's 100 TB story is a linearity/boundedness claim measured
  * here at 1×/3×/10× blowups of sf0.1:
  *
  *  - WL refinement (Graph.wlRefine): each round is one edge-table
  *    join + one aggregate — linear in edges, rounds constant.
  *  - Closeness centrality (Graph.closenessCentrality): the composite
  *    (seed, node) frontier shares each round's shuffle — linear in
  *    edges for a fixed seed set; blowup copies are disjoint
  *    components, so reach per seed stays CONSTANT.
  *  - Resource allocation (Graph.resourceAllocation): pair fan-out
  *    bounded by C(cap, 2) per center — pairs grow linearly with
  *    disjoint copies, never quadratically.
  *  - AMS F2 / join-size (Sketches.amsF2/amsJoinSize): map-side fan
  *    of `rows` sign streams collapsing to `rows` groups — pure
  *    map-linear, shuffle constant.
  *
  * Usage: runMain graft.tools.R6Smoke [sfDir] [maxFactor]
  */
object R6Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
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

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % 20000).as("src"),
        (col("l_partkey") * 7 % 20000).as("dst"))
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"))

    def edgeBlowup(f: Int): DataFrame =
      (0 until f).map { i =>
        li.select((col("src") + lit(i * 1000000L)).as("src"),
          (col("dst") + lit(i * 1000000L)).as("dst"))
      }.reduce(_ unionAll _).repartition(32)

    for (f <- Seq(1, 3, maxFactor).distinct.filter(_ <= maxFactor)) {
      val e = edgeBlowup(f).persist()
      val ne = e.count()

      val (nWl, tWl) = time {
        graft.operators.Graph.wlRefine(e, "src", "dst", rounds = 2)
          .filter(col("round") === 2).count()
      }
      println(f"wl       ${f}%2dx edges=$ne%9d nodes=$nWl%8d  $tWl%6.1f s")
      sweep(); e.persist(); e.count()

      val seeds = (0 until f).flatMap(i =>
        Seq(0L, 7L, 1234L).map(_ + i * 1000000L))
      val (rCl, tCl) = time {
        val d = graft.operators.Graph.closenessCentrality(
          e, "src", "dst", seeds, maxHops = 6)
        d.agg(sum(col("n_reach"))).head().getLong(0)
      }
      println(f"close    ${f}%2dx edges=$ne%9d reach=$rCl%9d  $tCl%6.1f s")
      sweep(); e.persist(); e.count()

      val (nRa, tRa) = time {
        graft.operators.Graph.resourceAllocation(e, "src", "dst",
          maxCenterDegree = 10, minCn = 2).count()
      }
      println(f"ra       ${f}%2dx edges=$ne%9d pairs=$nRa%9d  $tRa%6.1f s")
      sweep()
      e.unpersist(blocking = false)

      val ev = (0 until f).map { i =>
        events.select((col("event_id") + lit(i * 100000000L))
          .as("event_id"), col("user_id"))
      }.reduce(_ unionAll _).repartition(32).persist()
      val nv = ev.count()
      val (_, tAms) = time {
        graft.operators.Sketches.amsF2(ev, col("user_id") % 500,
          rows = 9).count()
      }
      println(f"amsF2    ${f}%2dx rows=$nv%10d  $tAms%6.1f s")
      sweep()
      ev.unpersist(blocking = false)
    }
    spark.stop()
  }
}
