package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalPerceptualDedup, Multimodal,
  PersistentIndex}

/** Scaling stanza for the round-10 band-partitioned persistent index
  * (PersistentIndex / IncrementalPerceptualDedup): grow the index one
  * decade (1× → 3× → 10×) by daily appends, and at each size measure
  * the SMALL-probe wall (a trickle batch / retry re-verification /
  * point lookup — the shapes partition pruning exists for) plus the
  * file-level pruning ratio the probe achieved.
  *
  * Measurement hygiene: the two timed runs per stanza use the SAME
  * probe batch under the SAME tag (retry semantics — the second run
  * excludes its own first publish, so both time identical work), the
  * reported pruning ratio is computed for that exact batch, and the
  * probe tag's files are deleted afterwards so the measured index
  * never accretes probe debris between stanzas.
  *
  * The honest cost model this prints:
  *  - a SMALL probe (few items → few bands) hashes into few `pfx=N/`
  *    partitions, so its index READ is O(touched partitions), not
  *    O(index) — the wall should stay near-flat across the decade;
  *  - a BULK daily batch (thousands of items) touches essentially all
  *    64 partitions and reads the whole index — the same cost as the
  *    pre-partitioned layout, bounded by the band-join shuffle as
  *    before. Pruning is a small-probe win by construction, priced
  *    here as data, not asserted.
  *
  * Usage: runMain graft.tools.IndexSmoke [batchN] [probeN]
  */
object IndexSmoke {
  def main(args: Array[String]): Unit = {
    val batchN = args.headOption.map(_.toInt).getOrElse(20000)
    val probeN = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_index_smoke").toString + "/idx"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }

    def batch(i: Int, n: Int): DataFrame = spark.range(n).select(
      (col("id") + lit(i * 10000000L)).as("doc_id"),
      xxhash64(concat(lit(s"b$i:"), col("id").cast("string")))
        .as("dhash"))

    var day = 0
    def growTo(batches: Int): Unit = {
      while (day < batches) {
        IncrementalPerceptualDedup.acceptBatch(batch(day, batchN),
          "doc_id", "dhash", idx, f"day$day%03d", maxHamming = 6)
          .count()
        day += 1
      }
    }

    var probeSeq = 9000
    /** Min-of-two wall for ONE probe batch under ONE tag, plus the
      * (prunedFiles, allFiles) listing for exactly that batch; the
      * tag's published files are removed before returning. */
    def probeWall(): (Double, Int, Int) = {
      probeSeq += 1
      val tag = s"probe$probeSeq"
      val pfxs = batch(probeSeq, probeN)
        .select(explode(Multimodal.bands64(col("dhash"))).as("band"))
        .select(PersistentIndex.pfxOf(col("band")).as("p"))
        .distinct().collect().map(_.getInt(0)).toSet
      val all = PersistentIndex.dataFilesFor(spark, idx,
        Some(tag), None).size
      val pruned = PersistentIndex.dataFilesFor(spark, idx,
        Some(tag), Some(pfxs)).size
      def run(): Double = time {
        IncrementalPerceptualDedup.acceptBatch(batch(probeSeq, probeN),
          "doc_id", "dhash", idx, tag, maxHamming = 6).count()
      }
      val w = math.min(run(), run())
      val p = new org.apache.hadoop.fs.Path(idx)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (fs.listStatus(p).filter(_.isDirectory).map(_.getPath) :+ p)
        .foreach { d =>
          fs.listStatus(d).filter(_.getPath.getName.startsWith(s"$tag-"))
            .foreach(f => fs.delete(f.getPath, false))
        }
      (w, pruned, all)
    }

    println(s"[index-smoke] batchN=$batchN probeN=$probeN " +
      s"pfx-partitions=${PersistentIndex.NumPfx}")
    Seq(2, 6, 20).foreach { batches =>
      growTo(batches)
      val (w, prunedFiles, allFiles) = probeWall()
      println(f"[index-smoke] size=${batches * batchN}%8d rows " +
        f"files=$allFiles%4d read=$prunedFiles%4d " +
        f"(${100.0 * prunedFiles / math.max(1, allFiles)}%5.1f%%) " +
        f"probe_wall=$w%6.3f s")
    }
    // compaction keeps the pruning ratio and the probe wall
    val (before, after) =
      IncrementalPerceptualDedup.compactIndex(spark, idx)
    val (w2, prunedC, allC) = probeWall()
    println(f"[index-smoke] compacted $before%d -> $after%d files; " +
      f"read=$prunedC%d/$allC%d probe_wall=$w2%6.3f s")

    // auto-compaction cadence sawtooth: a fresh index accretes one
    // file set per daily batch until compactIndexIfAccreted's
    // threshold trips, folds to ~one file per partition, and accretes
    // again — the file count saws instead of growing without bound,
    // with verdicts untouched (spec-pinned; this prints the shape)
    val idx2 = java.nio.file.Files
      .createTempDirectory("graft_index_smoke_auto").toString + "/idx"
    val factor = 2
    println(s"[index-smoke] auto-compaction sawtooth " +
      s"(maxFileFactor=$factor, threshold=" +
      s"${factor * PersistentIndex.NumPfx} files):")
    (0 until 8).foreach { d =>
      IncrementalPerceptualDedup.acceptBatch(batch(100 + d, batchN),
        "doc_id", "dhash", idx2, f"auto$d%03d", maxHamming = 6).count()
      val beforeAuto = PersistentIndex.dataFileCount(spark, idx2)
      val compacted = IncrementalPerceptualDedup
        .compactIndexIfAccreted(spark, idx2, maxFileFactor = factor)
      val afterAuto = PersistentIndex.dataFileCount(spark, idx2)
      println(f"[index-smoke]   day=$d%2d files=$beforeAuto%4d -> " +
        f"$afterAuto%4d ${if (compacted.nonEmpty) "COMPACTED" else ""}")
    }
    spark.stop()
  }
}
