package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** Scaling + adversarial stanzas for the round-8 perceptual dedup
  * family (hammingNearDupPairs — the q389/q390/q397 band join).
  * (Its own tool: graft.tools.R8Smoke is the earlier one-decade soak
  * of q258/q250/q177 and keeps its recorded CLI contract.)
  *
  * The honest 100 TB claim has TWO terms:
  *  - planted near-dup PAIRS grow linearly with the corpus (each copy
  *    set is hash-disjoint, so true pairs can only come from its own
  *    planted edits);
  *  - random CANDIDATES grow ~ 4·N²/2¹⁷ (birthday collisions on four
  *    16-bit bands — the price of guaranteed Hamming-3 recall). The
  *    constant is tiny (one verify per ~32k pair-candidates) but the
  *    term is quadratic: beyond ~10M hashes per run, shard the join
  *    or extend the banding (Multimodal.bands64 — shared by operator,
  *    index, and this harness) — the stanza PRINTS the realized
  *    candidate count next to the 4·C(N,2)/2¹⁶ prediction so the
  *    model is checkable, not asserted.
  *
  * The adversarial stanza plants a CONSTANT hash on 30k items (the
  * boilerplate image: a blank thumbnail) and shows the maxBucketSize
  * cap dropping the 4 poisoned buckets — pairs stay exactly the
  * planted count instead of gaining C(30k, 2) ≈ 450M.
  *
  * Usage: runMain graft.tools.PerceptualSmoke [baseN] [maxFactor]
  */
object PerceptualSmoke {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.map(_.toInt).getOrElse(50000)
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // copy set i: baseN originals (xxhash64-derived hashes, disjoint
    // across copies) + one 1-bit-edited near-dup each
    def hashes(f: Int): DataFrame =
      (0 until f).map { i =>
        val orig = spark.range(baseN).select(
          (col("id") + lit(i * 10000000L)).as("doc_id"),
          xxhash64(concat(lit(s"c$i:"), col("id").cast("string")))
            .as("dhash"))
        val edited = orig.select((col("doc_id") + lit(5000000L))
            .as("doc_id"),
          col("dhash").bitwiseXOR(lit(1L)).as("dhash"))
        orig.unionAll(edited)
      }.reduce(_ unionAll _).repartition(32)

    var plantedAt1 = -1L
    println("factor,n_items,candidates,predicted_rand_cands,pairs,wall_s")
    Seq(1, 3, maxFactor).distinct.filter(_ <= maxFactor).foreach { f =>
      val h = hashes(f).localCheckpoint(true)
      val n = h.count()
      // candidate count via the operator's OWN banding (bands64)
      val banded = h.withColumn("__bands",
        Multimodal.bands64(col("dhash")))
      val (cands, _) = time(
        Dedup.candidatePairs(banded, "doc_id", "__bands").count())
      val predicted = 4.0 * n * n / 2.0 / 65536.0
      val (pairs, wall) = time(
        Multimodal.hammingNearDupPairs(h, "doc_id", "dhash",
          maxHamming = 2).count())
      if (f == 1) plantedAt1 = pairs
      println(f"$f,$n,$cands,${predicted.toLong},$pairs,$wall%.1f")
    }

    // adversarial: 30k items share ONE constant hash (blank-thumbnail
    // boilerplate); the cap must drop those buckets, keeping pairs at
    // the f=1 planted count (measured above) and wall bounded
    val blank = spark.range(30000).select(
      (col("id") + lit(900000000L)).as("doc_id"),
      lit(42L).as("dhash"))
    val ((adv, wallAdv)) = time(
      Multimodal.hammingNearDupPairs(hashes(1).unionAll(blank), "doc_id",
        "dhash", maxHamming = 2).count())
    println(f"adversarial: planted=$plantedAt1 withBlank=$adv " +
      f"(capped buckets drop the 450M-pair boilerplate) wall=$wallAdv%.1f")
    spark.stop()
  }
}
