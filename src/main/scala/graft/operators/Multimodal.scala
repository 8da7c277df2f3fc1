package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support (north-star extension):
  * media travels as an opaque `binary` column with typed metadata; decode
  * and feature extraction run per-partition so expensive codec/model
  * initialization happens once per task, not per row — the Scala analog
  * of a Pandas-UDF/mapInPandas batch.
  *
  * The decode step is STUBBED (this environment ships no image/audio
  * codecs): `DeterministicFakeDecoder` derives stable pseudo-metadata
  * from the bytes' md5, so the Spark-side plumbing — schema, partition
  * batch shape, per-partition init, typed output — is real and tested,
  * and the features are oracle-reproducible. Swap in a real decoder by
  * implementing `MediaDecoder.decode` (see `RealCodecDecoder`).
  *
  * Scale: feature extraction is map-only over the binary column;
  * `binaryFile` sources should cap `maxPartitionBytes` so a task's batch
  * of blobs fits in memory; decoded frames never materialize as a whole
  * column — only extracted features leave the partition.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, content: Array[Byte], kind: String)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      digest: String, width: Int, height: Int, n_frames: Int)

  case class Decoded(width: Int, height: Int, nFrames: Int)

  /** One instance per partition; `open()` models codec/model init. */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def decode(bytes: Array[Byte]): Decoded
  }

  /** STUB decoder: metadata derived deterministically from md5(bytes).
    * Replaces the real image/audio decode unavailable in this
    * environment; replicable in any engine with md5. */
  class DeterministicFakeDecoder extends MediaDecoder {
    @transient private var openCount = 0
    override def open(): Unit = { openCount += 1 }
    override def decode(bytes: Array[Byte]): Decoded = {
      val hex = DeterministicFakeDecoder.md5Hex(bytes)
      val w = (Integer.parseInt(hex.substring(0, 4), 16) % 1920) + 1
      val h = (Integer.parseInt(hex.substring(4, 8), 16) % 1080) + 1
      Decoded(w, h, (bytes.length % 100).toInt)
    }
  }
  object DeterministicFakeDecoder {
    def md5Hex(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
  }

  /** Placeholder for a real codec-backed decoder: the interface is the
    * contract; the implementation needs image/audio libraries absent
    * here. */
  class RealCodecDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte]): Decoded =
      ??? // real image/audio/video decode - not available in this env
  }

  /** Wrap a text table as a binary media table (stand-in for
    * `spark.read.format("binaryFile")` on real media files). */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String,
      kind: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("content"),
      lit(kind).as("kind"))

  /** Per-partition feature extraction: decoder initialized once per
    * partition, then a streaming loop over the rows — the batch shape a
    * real codec/model wants. */
  def extractFeatures(media: Dataset[MediaRow],
      newDecoder: () => MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = newDecoder()
      decoder.open()
      rows.map { r =>
        val d = decoder.decode(r.content)
        MediaFeatures(r.doc_id, r.kind, r.content.length.toLong,
          DeterministicFakeDecoder.md5Hex(r.content),
          d.width, d.height, d.nFrames)
      }
    }
  }

  /** Aspect-preserving resize arithmetic (pure; the real pixel work
    * happens wherever the decoder lives). */
  def resizeDims(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    if (w <= maxSide && h <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, math.round(h.toDouble * maxSide / w).toInt))
    else (math.max(1, math.round(w.toDouble * maxSide / h).toInt), maxSide)
  }

  /** Deterministic frame sampling: every `stride`-th frame index. */
  def sampleFrameIndices(nFrames: Int, stride: Int): Seq[Int] =
    (0 until nFrames by math.max(1, stride)).toSeq

  /** Byte-level near-duplicate detection over binary media columns:
    * content bytes are reinterpreted losslessly as a Latin-1 string
    * (one char per byte) and fed through the SimHash near-dup pipeline
    * — byte-shingle SimHash is genuinely similarity-preserving over
    * raw byte streams, so blobs differing by small edits (metadata
    * patch, re-mux, truncated tail) land within `maxHamming` bits
    * while unrelated blobs do not. This is the modality-agnostic
    * half of media dedup (a REAL computation, not the stubbed codec
    * path): content-identical-modulo-container dups are caught without
    * decoding; perceptual (pixel-space) dedup additionally needs the
    * decoder to emit frame features, which then feed the same pipeline
    * or the embedding near-dup path. Same banded bucket-join scale
    * shape as text SimHash, but over BYTE shingles (binary has no
    * whitespace token structure — word tokenization would hash most
    * blobs to one giant token). Output: (id1, id2, hamming). */
  def binaryNearDups(media: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", maxHamming: Int = 6,
      shingleBytes: Int = 8): DataFrame =
    Dedup.simhashNearDupsFromTokens(
      media.withColumn("__bytes_as_text",
        decode(col(contentCol), "ISO-8859-1")),
      idCol,
      // RAW shingles: the text path's normalization (lower/trim/
      // whitespace-collapse) would alias byte values — 'A' vs 'a',
      // padding runs — into one sketch and report distinct blobs as
      // duplicates
      graft.functions.TextAnalysis.rawCharShingles(col("__bytes_as_text"),
        shingleBytes),
      maxHamming)
}
