package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Scale curve for the round-10 shift-robust audio family
  * (audioShiftDedup = WAV decode → per-window WHT tokens →
  * exact-token candidate buckets → codegen'd LCS): 1×/3×/10× clip
  * counts with one trimmed copy planted per clip, reporting the
  * realized candidate-pair count next to the planted count and the
  * found-pair count — the honest claim is that candidates stay LINEAR
  * (random clips share no window token, so only planted pairs meet in
  * a bucket; the machinery inherits videoFrameHashDedup's audited
  * shape, this prices the audio-specific decode+windowing path on
  * top of it).
  *
  * Usage: runMain graft.tools.AudioSeqSmoke [baseN]
  */
object AudioSeqSmoke {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.map(_.toInt).getOrElse(3000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 6 windows x 128 samples per clip, LCG-derived 16-bit PCM from
    // the clip id (deterministic, collision-free across clips)
    def samplesOf(id: Long): Array[Int] = {
      var s = id * 6364136223846793005L + 1442695040888963407L
      Array.fill(6 * 128) {
        s = s * 6364136223846793005L + 1442695040888963407L
        (((s >>> 33) % 65536L) - 32768L).toInt
      }
    }

    def wavs(f: Int): Dataset[Multimodal.WavRow] =
      spark.range(f.toLong * baseN).as[Long].mapPartitions(_.flatMap {
        id =>
          val base = samplesOf(id)
          Iterator(
            Multimodal.WavRow(id,
              Multimodal.encodeWavPcm16(base.toSeq, 8000)),
            Multimodal.WavRow(id + 10000000L,
              Multimodal.encodeWavPcm16(base.drop(256).toSeq, 8000)))
      })

    println(s"[audio-smoke] baseN=$baseN window=128 drop=2 windows")
    Seq(1, 3, 10).foreach { f =>
      val w = wavs(f)
      val seqs = Multimodal.wavSpectralSeqTable(w, 128)
        .localCheckpoint(true)
      // realized candidate pairs: clip pairs sharing >= 1 exact token
      val tok = seqs.select(col("doc_id"), explode(col("seq")).as("t"))
      val cands = tok.as("a").join(tok.as("b"),
          col("a.t") === col("b.t") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val (found, wall) = time {
        Multimodal.audioShiftDedup(w, minSim = 0.5,
          windowSamples = 128).count()
      }
      println(f"[audio-smoke] clips=${f * baseN}%7d planted=${f * baseN}%7d " +
        f"candidates=$cands%7d found=$found%7d wall=$wall%7.2f s")
    }

    // the hop dial priced as measured data (round 11): hop = 32
    // carries ~4x the tokens per clip; candidates must stay linear
    // (planted pairs only — a finer hop multiplies tokens, not the
    // collision structure) and the wall factor IS the documented cost
    // of sub-window trim granularity
    println(s"[audio-smoke] hop dial (hopSamples=32, 4x tokens, " +
      "planted trim = 96 samples = 3 hops):")
    Seq(1, 3).foreach { f =>
      val w = spark.range(f.toLong * baseN).as[Long].mapPartitions(
        _.flatMap { id =>
          val base = samplesOf(id)
          Iterator(
            Multimodal.WavRow(id,
              Multimodal.encodeWavPcm16(base.toSeq, 8000)),
            Multimodal.WavRow(id + 10000000L,
              Multimodal.encodeWavPcm16(base.drop(96).toSeq, 8000)))
        })
      val tok = Multimodal.wavSpectralSeqTable(w, 128, hopSamples = 32)
        .localCheckpoint(true)
        .select(col("doc_id"), explode(col("seq")).as("t"))
      val cands = tok.as("a").join(tok.as("b"),
          col("a.t") === col("b.t") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val (found, wall) = time {
        Multimodal.audioShiftDedup(w, minSim = 0.5,
          windowSamples = 128, hopSamples = 32).count()
      }
      println(f"[audio-smoke]   clips=${f * baseN}%7d " +
        f"candidates=$cands%7d found=$found%7d wall=$wall%7.2f s")
    }

    // the Hamming-tolerance dial priced as measured data (round 12):
    // planted copies go through the NON-IDENTITY 16 -> 44.1 kHz
    // upsample (stored as real 44.1 kHz WAVs, canonicalized back on
    // decode — every sample interpolation-perturbed, the exact arm's
    // total miss), and the tolerant arm pays TWO documented costs the
    // exact arm does not: (1) candidates carry the 16-bit-band
    // birthday term ~4·N²/2¹⁷ (verify-only pairs — N = total window
    // hashes; measured 321k candidates at 108k hashes vs the model's
    // 356k), the SAME quadratic model hammingNearDupPairs documents,
    // so the image family's ~10M-hash shard guidance applies where
    // exact-token candidates stayed linear; (2) recall beyond
    // Hamming 3/window is pigeonhole-probabilistic: a window pair
    // whose 5-8 flipped bits touch all FOUR bands shares no band key,
    // and a pair is a candidate only if SOME window keeps a band
    // intact — measured 2 misses in 9000 planted pairs (0.02%), both
    // with every per-window distance <= 8 but all-band scatter in
    // every window. Found pairs are still exact (verify never lies);
    // the dial trades candidate cost + tail recall for crossing the
    // lossy frontier at all.
    println(s"[audio-smoke] tolerance dial (maxHamming=10, 4x band " +
      "tokens, planted copy = 441:160 resample roundtrip):")
    Seq(1, 3).foreach { f =>
      val w = spark.range(f.toLong * baseN).as[Long].mapPartitions(
        _.flatMap { id =>
          val base = samplesOf(id)
          Iterator(
            Multimodal.WavRow(id,
              Multimodal.encodeWavPcm16(base.toSeq, 16000)),
            Multimodal.WavRow(id + 10000000L,
              Multimodal.encodeWavPcm16(
                Multimodal.resampleLinear(base, 16000, 44100).toSeq,
                44100)))
        })
      val tok = Multimodal.wavSpectralSeqLongTable(w, 128,
          canonicalRate = 16000)
        .localCheckpoint(true)
        .select(col("doc_id"),
          explode(expr("array_distinct(flatten(transform(seq, h -> " +
            "transform(array(0, 1, 2, 3), k -> concat('b', k, ':', " +
            "string(shiftrightunsigned(h, 16 * k) & 65535))))))"))
            .as("t"))
      val cands = tok.as("a").join(tok.as("b"),
          col("a.t") === col("b.t") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val (found, wall) = time {
        Multimodal.audioTolerantDedup(w, minSim = 0.5,
          windowSamples = 128, maxHamming = 10,
          canonicalRate = 16000).count()
      }
      println(f"[audio-smoke]   clips=${f * baseN}%7d " +
        f"candidates=$cands%7d found=$found%7d wall=$wall%7.2f s")
    }
    spark.stop()
  }
}
