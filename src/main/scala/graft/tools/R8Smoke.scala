package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade soak extension (r7 VERDICT next item 7): the three
  * top-of-table bench rows — q258 containment, q250 tf-cosine, q177
  * incremental CC — measured ONE POINT past R7Smoke's 1×/3×/10×
  * curves, at 30×, to confirm the linear fits hold beyond the range
  * they were fitted on. Same blowup disciplines as R7Smoke/ScaleSmoke
  * (token-disjoint copies; constant CC delta against a scaled old
  * pair set), so the counters must land on the extrapolated line:
  * containment candidates at exactly 30× the 1× count, tf-cosine
  * bound/out at 30×, mergecc wall tracking the star summary.
  *
  * Usage: runMain graft.tools.R8Smoke [sfDir] [factor]
  */
object R8Smoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(30)
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def docBlowup(f: Int): DataFrame =
      (0 until f).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          regexp_replace(lower(col("text")), "([a-z0-9]+)", s"$$1x$i")
            .as("text"))
      }.reduce(_ unionAll _).repartition(32)

    import graft.operators.SetSimJoin
    val d = docBlowup(factor).persist()
    val nd = d.count()

    // q258 containment: candidate count from the REAL probe stage
    val grams = graft.functions.TextAnalysis.wordNgrams(col("text"), 4)
    val sets = SetSimJoin.tokenSets(d, "doc_id", grams).persist()
    val probes = SetSimJoin.prefixProbes(sets, 0.8)
    val postings = sets.select(col("__id").as("__bid"),
      explode(col("__toks")).as("__tok"))
    val (nCand, tCand) = time {
      probes.join(postings, Seq("__tok"))
        .filter(col("__id") =!= col("__bid"))
        .select(col("__id"), col("__bid")).distinct().count()
    }
    sets.unpersist(blocking = false)
    val (nCont, tCont) = time {
      SetSimJoin.containmentSelfJoin(d, "doc_id", grams, 0.8).count()
    }
    println(f"contain  ${factor}%2dx docs=$nd%8d cand=$nCand%9d " +
      f"out=$nCont%7d candWall=$tCand%5.1f s wall=$tCont%5.1f s")
    sweep(); d.persist(); d.count()

    // q250 tf-cosine: Σ C(df,2) bound from the REAL rare-term table
    val tf = SetSimJoin.tfTerms(d, "doc_id", "text", 4).persist()
    val rare = SetSimJoin.rareTerms(tf, maxDf = 3)
    val (bound, nRare) = {
      val r = rare.agg(
        coalesce(sum((col("df") * (col("df") - 1) / 2).cast("long")),
          lit(0L)).as("b"),
        count(lit(1)).as("n")).head()
      (r.getLong(0), r.getLong(1))
    }
    tf.unpersist(blocking = false)
    val (nCos, tCos) = time {
      SetSimJoin.tfCosinePairs(d, "doc_id", "text",
        maxDf = 3, ngramN = 4).count()
    }
    println(f"tfcos    ${factor}%2dx docs=$nd%8d rare=$nRare%9d " +
      f"candBound=$bound%9d out=$nCos%7d wall=$tCos%5.1f s")
    sweep()
    d.unpersist(blocking = false)

    // q177 incremental CC: old pair set scaled 30×, delta CONSTANT —
    // wall must track the star summary, never the historical pairs
    val ccPairs = (0 until factor).map { i =>
      spark.range(40000).select(
        (col("id") + lit(i * 10000000L)).as("id1"),
        (col("id") + lit(i * 10000000L + 40000L)).as("id2"))
    }.reduce(_ unionAll _).repartition(32)
    val oldAssign = graft.operators.Dedup.connectedComponents(ccPairs)
    val newEdges = spark.range(2000).select(
      (col("id") * 3).as("id1"), (col("id") * 3 + 900000000L).as("id2"))
    val (mcRows, tMc) = time {
      graft.operators.Dedup.mergeClusters(oldAssign, newEdges).count()
    }
    println(f"mergecc  ${factor}%2dx oldpairs=${ccPairs.count()}%8d " +
      f"merged=$mcRows%8d  $tMc%6.1f s")
    spark.stop()
  }
}
