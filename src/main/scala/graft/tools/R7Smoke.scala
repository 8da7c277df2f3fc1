package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve + adversarial stanzas for the round-6 join newcomers
  * (r6 VERDICT item 7): the directed containment join (q258) and the
  * rare-term-blocked TF-cosine pairs (q250). Each operator's 100 TB
  * story is a candidate-bound claim, measured here on the REAL stages:
  *
  *  - containmentSelfJoin: candidates = prefix-probes ⋈ postings, so
  *    fan-in per token is (probes carrying it) × df. The rarest-first
  *    prefix order keeps frequent tokens out of probes — verified by
  *    the adversarial stanza, which plants a UNIVERSAL 4-gram in every
  *    document and records how many probes carry it (hotInPrefix) and
  *    the realized candidate count.
  *  - tfCosinePairs: candidates are pairs sharing a rare term
  *    (2 ≤ df ≤ maxDf), bounded by Σ C(df,2) ≤ C(maxDf,2)·|rare| —
  *    the bound is computed from the operator's own rare-term table
  *    and printed next to the realized pairs.
  *
  * Copies in the 1×/3×/10× blowup are token-disjoint (every word is
  * suffixed with the copy index), so true pairs and candidates must
  * grow LINEARLY with the factor — any superlinear growth in the
  * printed counters falsifies the blocking claim.
  *
  * Usage: runMain graft.tools.R7Smoke [sfDir] [maxFactor]
  */
object R7Smoke {
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // token-disjoint copies: suffix every word with the copy index so
    // cross-copy grams can never collide (identical-text copies would
    // multiply every df by f and square the cross-copy pair count)
    def docBlowup(f: Int): DataFrame =
      (0 until f).map { i =>
        docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          regexp_replace(lower(col("text")), "([a-z0-9]+)", s"$$1x$i")
            .as("text"))
      }.reduce(_ unionAll _).repartition(32)

    import graft.operators.SetSimJoin

    for (f <- Seq(1, 3, maxFactor).distinct.filter(_ <= maxFactor)) {
      val d = docBlowup(f).persist()
      val nd = d.count()

      // ---- containment curve: candidates from the REAL probe stage
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
      println(f"contain  ${f}%2dx docs=$nd%8d cand=$nCand%9d " +
        f"out=$nCont%7d candWall=$tCand%5.1f s wall=$tCont%5.1f s")
      sweep(); d.persist(); d.count()

      // ---- tf-cosine curve: Σ C(df,2) bound from the REAL rare table
      val tf = SetSimJoin.tfTerms(d, "doc_id", "text", 4).persist()
      val rare = SetSimJoin.rareTerms(tf, maxDf = 3)
      val (bound, nRare) = {
        // df*(df-1) is even; Column./ is a double Divide, so cast back.
        // coalesce: sum over an empty rare table is NULL, not 0
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
      println(f"tfcos    ${f}%2dx docs=$nd%8d rare=$nRare%9d " +
        f"candBound=$bound%9d out=$nCos%7d wall=$tCos%5.1f s")
      sweep()
      d.unpersist(blocking = false)
    }

    // ---- adversarial: a UNIVERSAL 4-gram planted in every document.
    // A naive token-bucket join would put |docs|² candidates in its
    // bucket; the rarest-first prefix order must keep it out of every
    // probe whose set has more than one gram (prefixLen = n−⌈.8n⌉+1
    // reaches the last-sorted position only at n = 1).
    val hot = docs.select(col("doc_id"),
      concat(col("text"), lit(" zqh zqh zqh zqh")).as("text"))
      .repartition(32).persist()
    val nh = hot.count()
    val hotGram = "zqh zqh zqh zqh"
    val hotSets = SetSimJoin.tokenSets(hot, "doc_id",
      graft.functions.TextAnalysis.wordNgrams(col("text"), 4)).persist()
    val hotProbes = SetSimJoin.prefixProbes(hotSets, 0.8).persist()
    val hotInPrefix = hotProbes.filter(col("__tok") === hotGram).count()
    val maxBucket = hotProbes.groupBy(col("__tok"))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).head().getLong(0)
    val hotPostings = hotSets.select(col("__id").as("__bid"),
      explode(col("__toks")).as("__tok"))
    val nHotCand = hotProbes.join(hotPostings, Seq("__tok"))
      .filter(col("__id") =!= col("__bid"))
      .select(col("__id"), col("__bid")).distinct().count()
    hotProbes.unpersist(blocking = false)
    hotSets.unpersist(blocking = false)
    val (nHotOut, tHot) = time {
      SetSimJoin.containmentSelfJoin(hot, "doc_id",
        graft.functions.TextAnalysis.wordNgrams(col("text"), 4), 0.8)
        .count()
    }
    println(f"conthot     docs=$nh%8d hotDf=$nh%8d " +
      f"hotInPrefix=$hotInPrefix%d maxProbeBucket=$maxBucket%d " +
      f"cand=$nHotCand%9d out=$nHotOut%7d wall=$tHot%5.1f s")
    hot.unpersist(blocking = false)
    spark.stop()
  }
}
