package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve smoke for the late-round-6 extension batch — the four
  * newcomers whose 100 TB story is a boundedness/linearity claim:
  *
  *  - Gram matrix (Pca.gramMatrixInt8): work is rows·d²/2 by
  *    construction; the curve must be linear in rows with the shuffle
  *    pinned at d²/2 rows regardless of scale.
  *  - grid-DBSCAN (Clustering.gridDbscan): per-cell density + bounded
  *    neighbor probes; a blowup multiplies points but NOT cells, so
  *    wall tracks the point stream and the CC input stays cell-sized.
  *  - CIDR LPM (WebFilter.longestPrefixMatch): fan-out is #distinct
  *    prefix lengths (3 here) — linear in addresses, flat in rules.
  *  - modularity (Graph.modularity): two assignment joins + community
  *    aggregates — linear in edges.
  *
  * Usage: runMain graft.tools.NewOpsSmoke [sfDir] [maxFactor]
  */
object NewOpsSmoke {
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
    def blowup(base: DataFrame, idCol: String, factor: Int): DataFrame =
      (0 until factor).map { i =>
        base.withColumn(idCol, col(idCol) + lit(i * 10000000L))
      }.reduce(_ unionAll _).repartition(32)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_orderkey") % 20000).as("src"),
        (col("l_partkey") * 7 % 20000).as("dst"))

    for (f <- Seq(1, 3, maxFactor).distinct.filter(_ <= maxFactor)) {
      val vecs = blowup(emb, "vec_id", f)
      val nv = vecs.count()
      val (gRows, tGram) = time {
        graft.operators.Pca.gramMatrixInt8(vecs, "embedding").count()
      }
      println(f"gram     ${f}%2dx vecs=$nv%8d cells=$gRows%6d  $tGram%6.1f s")
      sweep()

      val pts = blowup(events, "event_id", f)
      val np = pts.count()
      val (clusters, tDb) = time {
        graft.operators.Clustering.gridDbscan(pts, "event_id",
            "value", "user_id", cell = 10.0, minPts = 120L * f)
          .select(col("cluster")).distinct().count()
      }
      println(f"dbscan   ${f}%2dx pts=$np%8d clusters=$clusters%5d  $tDb%6.1f s")
      sweep()

      import spark.implicits._
      val ips = pts.select(col("event_id"),
        ((col("user_id") % 200) * 65536 + (col("event_id") % 250) * 256
          + (col("event_id") * 7) % 250 + (10L << 24)).as("ip_long"))
      val rules = Seq(
        ((10L << 24), 8), ((10L << 24) + (5L << 16), 16),
        ((10L << 24) + (17L << 16), 16),
        ((10L << 24) + (5L << 16) + (3L << 8), 24),
        ((10L << 24) + (42L << 16) + (7L << 8), 24))
        .toDF("net_long", "prefix_len")
      val (matched, tLpm) = time {
        graft.operators.WebFilter.longestPrefixMatch(ips, "ip_long", rules)
          .filter(col("matched_len").isNotNull).count()
      }
      println(f"lpm      ${f}%2dx ips=$np%8d matched=$matched%8d  $tLpm%6.1f s")
      sweep()

      // modularity: blow the EDGE set up (same node space, denser graph)
      val edges = (0 until f).map { i =>
        li.select(((col("src") + lit(i * 37)) % 20000).as("src"),
          ((col("dst") + lit(i * 101)) % 20000).as("dst"))
      }.reduce(_ unionAll _).repartition(32)
      val assign = graft.operators.Graph.canonicalEdges(edges, "src", "dst")
        .select(explode(array(col("u"), col("v"))).as("node")).distinct()
        .select(col("node"), (col("node") % 50).as("comm"))
      val (mRows, tMod) = time {
        graft.operators.Graph
          .modularity(edges, "src", "dst", assign, "node", "comm").count()
      }
      println(f"modular  ${f}%2dx comms=$mRows%5d               $tMod%6.1f s")
      sweep()
    }
    spark.stop()
  }
}
