package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal-pipeline coverage: binary content column + per-partition
  * (stub-)decode feature extraction, oracle-checked because the fake
  * decoder's features are md5/length-derived (reproducible in DuckDB). */
object QueriesMultimodal {

  private def q29Features(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.asMediaTable(
      Tables.load(s, dir, "documents"), "doc_id", "text", "image")
      .as[MediaRow]
    Multimodal.extractFeatures(media,
        () => new Multimodal.DeterministicFakeDecoder)
      .toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("digest"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q29Sql =
    """SELECT doc_id, 'image' AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST((('0x' || substr(md5(text), 1, 4))::BIGINT % 1920) + 1 AS INT) AS width,
      |  CAST((('0x' || substr(md5(text), 5, 4))::BIGINT % 1080) + 1 AS INT) AS height,
      |  CAST(octet_length(encode(text)) % 100 AS INT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q251
  /** Preprocessing plan over decoded media: aspect-preserving resize
    * (Multimodal.resizeDims, max side 512) and deterministic frame
    * sampling (every 7th frame) applied per row in a typed map after
    * the per-partition stub decode — the Spark-side plumbing (batch
    * shape, typed pipeline) is real; only the codec is the documented
    * stub. Oracle replays the md5-fake dims and the floor(x+0.5)
    * rounding that Scala math.round performs. */
  private def q251MediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.asMediaTable(
      Tables.load(s, dir, "documents"), "doc_id", "text", "image")
      .as[MediaRow]
    Multimodal.extractFeatures(media,
        () => new Multimodal.DeterministicFakeDecoder)
      .map { f =>
        val (rw, rh) = Multimodal.resizeDims(f.width, f.height, 512)
        val nSampled =
          Multimodal.sampleFrameIndices(f.n_frames, 7).size
        (f.doc_id, f.width, f.height, rw, rh, f.n_frames, nSampled)
      }
      .toDF("doc_id", "width", "height", "rw", "rh", "n_frames",
        "n_sampled")
      .orderBy(col("doc_id"))
  }

  private val q251Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST((('0x' || substr(md5(text), 1, 4))::BIGINT % 1920) + 1
      |      AS INT) AS width,
      |    CAST((('0x' || substr(md5(text), 5, 4))::BIGINT % 1080) + 1
      |      AS INT) AS height,
      |    CAST(octet_length(encode(text)) % 100 AS INT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  CAST(CASE
      |    WHEN width <= 512 AND height <= 512 THEN width
      |    WHEN width >= height THEN 512
      |    ELSE greatest(1, floor(width * 512.0 / height + 0.5))
      |  END AS INT) AS rw,
      |  CAST(CASE
      |    WHEN width <= 512 AND height <= 512 THEN height
      |    WHEN width >= height
      |      THEN greatest(1, floor(height * 512.0 / width + 0.5))
      |    ELSE 512
      |  END AS INT) AS rh,
      |  n_frames,
      |  CAST((n_frames + 6) // 7 AS INT) AS n_sampled
      |FROM f ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q323
  /** Binary frame windowing — the audio/video chunking plan shape:
    * payloads are REAL BinaryType columns (UTF-8 bytes of ASCII-only
    * docs, so the oracle can regenerate identical bytes from text),
    * sliced into 256-byte frames at hop 128 with Spark's binary
    * substring, each frame fingerprinted with md5-over-bytes. The
    * plumbing a frame-sampling media pipeline needs — explode of a
    * per-row frame index sequence, binary slicing, per-frame digest —
    * is all exercised on the engine; only the codec behind the bytes
    * is the documented stub. Map-only: no shuffle until the output
    * sort. */
  private def q323MediaFrames(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .filter(col("doc_id") <= 50 &&
        col("text").rlike("^[\\x20-\\x7e]*$") &&
        length(col("text")) >= 256)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        length(col("text")).cast("long").as("nb"))
    docs
      .select(col("doc_id"), col("payload"), col("nb"),
        explode(sequence(lit(0L),
          floor((col("nb") - 256).cast("double") / 128.0).cast("long")))
          .as("idx"))
      .select(col("doc_id"), col("idx"),
        md5(expr("substring(payload, CAST(idx * 128 + 1 AS INT), 256)"))
          .as("frame_md5"),
        col("nb").as("n_bytes"))
      .orderBy(col("doc_id"), col("idx"))
  }

  private val q323Sql =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS nb
      |  FROM documents
      |  WHERE doc_id <= 50 AND regexp_matches(text, '^[\x20-\x7e]*$')
      |    AND length(text) >= 256),
      |f AS (
      |  SELECT doc_id, text, nb,
      |    unnest(generate_series(0, (nb - 256) // 128)) AS idx
      |  FROM d)
      |SELECT doc_id, idx,
      |  md5(substr(text, CAST(idx * 128 + 1 AS INT), 256)) AS frame_md5,
      |  nb AS n_bytes
      |FROM f ORDER BY doc_id, idx""".stripMargin

  // -------------------------------------------------------------- q367
  /** REAL audio decode end to end (Multimodal.encodeWavPcm16 /
    * decodeWavPcm16): per-user 16-bit PCM is synthesized
    * deterministically from events cents (pmod 2¹⁶ − 32768), encoded
    * into standard RIFF/WAVE blobs per partition, then the REAL
    * parser walks the container (magic, fmt chunk, data chunk) and
    * emits exact-integer features (count / peak / Σs²). The oracle
    * recomputes the features straight from events — the round-trip
    * pattern (q162/q163) applied to actual media bytes: any header
    * mis-write, endianness slip, or sample corruption flips the hash.
    * Unlike q29/q251 (md5-fake decode for the env-bound image/video
    * codecs), nothing here is stubbed. */
  private def q367WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(col("user_id"), col("event_id"),
        (pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(65536L)) - 32768L).cast("int").as("s"))
    val pcm = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("s"))))
        .as("a"))
      .select(col("user_id").as("doc_id"),
        expr("transform(a, x -> x.s)").as("samples"))
      .as[Multimodal.PcmRow]
    val wav = Multimodal.encodeWavTable(pcm, sampleRate = 8000)
    Multimodal.wavFeatureTable(wav).toDF().orderBy(col("doc_id"))
  }

  private val q367Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 65536)
      |      + 65536) % 65536 - 32768 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500)
      |SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
      |  CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits_per_sample,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(count(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(max(abs(s)) AS INT) AS peak,
      |  CAST(sum(s * s) AS BIGINT) AS sum_sq
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q368
  /** REAL image decode end to end (Multimodal.encodeBmpGray24 /
    * decodeBmpGray24) — q367's image sibling: per-user grayscale
    * strips (luma = events cents mod 256, event_id order) encode into
    * standard 24-bit BMPs per partition, the REAL parser walks the
    * headers / bottom-up rows / 4-byte padding, and the exact-integer
    * features hash-match the oracle's direct recompute from events.
    * first/last are position-dependent, so a row-order or stride bug
    * flips the hash even where the sums agree. */
  private def q368BmpDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(col("user_id"), col("event_id"),
        pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(256L)).cast("int").as("g"))
    val strips = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("g"))))
        .as("a"))
      .select(col("user_id").as("doc_id"),
        expr("transform(a, x -> x.g)").as("lumas"))
      .as[Multimodal.GrayRow]
    Multimodal.bmpFeatureTable(Multimodal.encodeBmpTable(strips))
      .toDF().orderBy(col("doc_id"))
  }

  private val q368Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500)
      |SELECT doc_id,
      |  CAST(count(*) AS INT) AS width, CAST(1 AS INT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  CAST(sum(g) AS BIGINT) AS sum_gray,
      |  CAST(max(g) AS INT) AS max_gray,
      |  CAST(arg_min(g, event_id) AS INT) AS first_gray,
      |  CAST(arg_max(g, event_id) AS INT) AS last_gray
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q373
  /** REAL COMPRESSED-codec decode end to end (Multimodal.encodePngGray8
    * / decodePngGray8): per-user 16-wide grayscale images (luma =
    * events cents mod 256 in event_id order, truncated to whole rows)
    * encode into standard non-interlaced 8-bit PNGs — zlib-deflated
    * scanlines whose filter types ROTATE through all five
    * (None/Sub/Up/Average/Paeth) — then the strict decoder walks
    * signature / CRC-verified chunks / Inflater / per-row
    * reconstruction and emits exact-integer features that hash-match
    * the oracle's direct recompute from events. Unlike q367/q368
    * (header-only containers), the pixel bytes here pass through REAL
    * compression: any filter-reconstruction, zlib-boundary, or
    * geometry bug flips the hash. first/last are position-dependent,
    * so row-order bugs can't hide behind the sums. */
  /** q373/q399/q400's shared fixture: per-user 16-wide grayscale
    * images from events cents (event_id order, truncated to whole
    * rows) — one definition so a luma-formula or slicing tweak can
    * never silently diverge between the codec rows. */
  private def events16Images(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.Png2dRow] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(col("user_id"), col("event_id"),
        pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(256L)).cast("int").as("g"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("g"))))
        .as("a"))
      .select(col("user_id").as("doc_id"),
        expr("slice(transform(a, x -> x.g), 1, " +
          "(size(a) div 16) * 16)").as("lumas"))
      .filter(size(col("lumas")) >= 16)
      .withColumn("width", lit(16))
      .as[Multimodal.Png2dRow]
  }

  private def q373PngDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.pngFeatureTable(
        Multimodal.encodePngTable(events16Images(s, dir)))
      .toDF().orderBy(col("doc_id"))

  private val q373Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, g,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT * FROM r WHERE n >= 16 AND rn <= (n // 16) * 16)
      |SELECT doc_id, CAST(16 AS INT) AS width,
      |  CAST(count(*) // 16 AS INT) AS height,
      |  CAST(0 AS INT) AS color_type,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  CAST(sum(g) AS BIGINT) AS sum_gray,
      |  CAST(max(g) AS INT) AS max_gray,
      |  CAST(arg_min(g, rn) AS INT) AS first_gray,
      |  CAST(arg_max(g, rn) AS INT) AS last_gray
      |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q399
  /** REAL LZW-compressed codec decode end to end
    * (Multimodal.encodeGifGray8 / decodeGifGray8) — q373's GIF
    * sibling and a genuinely DIFFERENT compression family from
    * PNG/zip/Avro's deflate: dictionary codes with growing 9→12-bit
    * widths, LSB-first packing, 255-byte sub-blocks, all implemented
    * from the GIF89a spec with no library at all. Same fixture shape
    * as q373 (16-wide event images); the pixels pass through actual
    * LZW compression, so any code-width, dictionary-growth, KwKwK,
    * or sub-block bug flips the exact-integer features the oracle
    * recomputes straight from events. */
  private def q399GifDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.gifFeatureTable(
        Multimodal.encodeGifTable(events16Images(s, dir)))
      .toDF().orderBy(col("doc_id"))

  private val q399Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, g,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT * FROM r WHERE n >= 16 AND rn <= (n // 16) * 16)
      |SELECT doc_id, CAST(16 AS INT) AS width,
      |  CAST(count(*) // 16 AS INT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  CAST(sum(g) AS BIGINT) AS sum_gray,
      |  CAST(max(g) AS INT) AS max_gray,
      |  CAST(arg_min(g, rn) AS INT) AS first_gray,
      |  CAST(arg_max(g, rn) AS INT) AS last_gray
      |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q400
  /** REAL pixel resize end to end (Multimodal.resizePixels over
    * decodePngLumas): the q373 images decode through real PNG
    * compression, nearest-neighbor-resize to a fixed 8×8 thumbnail
    * (down- OR up-sampling depending on each image's height — both
    * paths on the hash), and emit exact-integer thumbnail features.
    * NN sampling is exact integer SELECTION (target (i,j) reads
    * source (⌊iH/8⌋, ⌊j·16/8⌋)), so the oracle recomputes every
    * thumbnail pixel straight from events with no float anywhere —
    * the real-pixel half of the q251 resize row, which only sized. */
  private def q400ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.encodePngTable(events16Images(s, dir))
      .map { r =>
        val (w, h, lumas) = Multimodal.decodePngLumas(r.content)
        val t = Multimodal.resizePixels(lumas, w, h, tw = 8, th = 8)
        (r.doc_id, w, h, 8, 8, t.map(_.toLong).sum, t.max,
          t.head, t.last)
      }
      .toDF("doc_id", "src_w", "src_h", "tw", "th", "sum_gray",
        "max_gray", "first_gray", "last_gray")
      .orderBy(col("doc_id"))
  }

  private val q400Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, g,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, g, rn, (n // 16) * 16 AS np FROM r
      |      WHERE n >= 16 AND rn <= (n // 16) * 16),
      |geom AS (SELECT doc_id, CAST(max(np) // 16 AS INT) AS h FROM u
      |         GROUP BY 1),
      |tpix AS (
      |  SELECT g2.doc_id, t.i, t.j,
      |    ((t.i * g2.h) // 8) * 16 + ((t.j * 16) // 8) + 1 AS src_rn
      |  FROM geom g2,
      |    (SELECT a.i, b.j FROM unnest(range(0, 8)) AS a(i),
      |       unnest(range(0, 8)) AS b(j)) t),
      |tv AS (
      |  SELECT tp.doc_id, tp.i, tp.j, u.g
      |  FROM tpix tp JOIN u ON u.doc_id = tp.doc_id
      |    AND u.rn = tp.src_rn)
      |SELECT tv.doc_id,
      |  CAST(16 AS INT) AS src_w, geom.h AS src_h,
      |  CAST(8 AS INT) AS tw, CAST(8 AS INT) AS th,
      |  CAST(sum(tv.g) AS BIGINT) AS sum_gray,
      |  CAST(max(tv.g) AS INT) AS max_gray,
      |  CAST(arg_min(tv.g, tv.i * 8 + tv.j) AS INT) AS first_gray,
      |  CAST(arg_max(tv.g, tv.i * 8 + tv.j) AS INT) AS last_gray
      |FROM tv JOIN geom ON geom.doc_id = tv.doc_id
      |GROUP BY tv.doc_id, geom.h ORDER BY tv.doc_id""".stripMargin

  // -------------------------------------------------------------- q377
  /** Mixed-media dispatch end to end: one binary `content` column
    * carrying WAV, BMP, PNG, GIF, AND baseline-JPEG blobs (all
    * REAL-encoded per user from events), fed through the production
    * multimodal API —
    * `extractFeatures` with a per-partition `RealCodecDecoder` — which
    * must dispatch each blob on its magic bytes to the right strict
    * parser. This is the shape a real binaryFile ingest takes (a
    * directory of heterogeneous media), and it gates the DISPATCH
    * layer the per-format rows (q367/q368/q373) can't: a magic
    * misroute or a decoder whose features disagree with its encoder
    * flips the per-kind geometry columns. The oracle recomputes every
    * geometry directly from per-user event counts. */
  private def q377MixedMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 200)
      .select(col("user_id"), col("event_id"),
        (pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(65536L)) - 32768L).cast("int").as("s"),
        pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(256L)).cast("int").as("g"))
    val grouped = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("s"),
        col("g")))).as("a"))
    val wavs = Multimodal.encodeWavTable(
      grouped.select(col("user_id").as("doc_id"),
        expr("transform(a, x -> x.s)").as("samples"))
        .as[Multimodal.PcmRow], sampleRate = 8000)
      .toDF().withColumn("kind", lit("audio"))
    val bmps = Multimodal.encodeBmpTable(
      grouped.select(col("user_id").as("doc_id"),
        expr("transform(a, x -> x.g)").as("lumas"))
        .as[Multimodal.GrayRow])
      .toDF().withColumn("kind", lit("image_bmp"))
    val pngs = Multimodal.encodePngTable(
      grouped.select(col("user_id").as("doc_id"),
        expr("slice(transform(a, x -> x.g), 1, (size(a) div 16) * 16)")
          .as("lumas"))
        .filter(size(col("lumas")) >= 16)
        .withColumn("width", lit(16))
        .as[Multimodal.Png2dRow])
      .toDF().withColumn("kind", lit("image_png"))
    val gifs = Multimodal.encodeGifTable(
      grouped.select(col("user_id").as("doc_id"),
        expr("slice(transform(a, x -> x.g), 1, (size(a) div 16) * 16)")
          .as("lumas"))
        .filter(size(col("lumas")) >= 16)
        .withColumn("width", lit(16))
        .as[Multimodal.Png2dRow])
      .toDF().withColumn("kind", lit("image_gif"))
    val jpgs = Multimodal.encodeJpegTable(
      grouped.select(col("user_id").as("doc_id"),
        expr("slice(transform(a, x -> x.g), 1, (size(a) div 16) * 16)")
          .as("lumas"))
        .filter(size(col("lumas")) >= 16)
        .withColumn("width", lit(16))
        .as[Multimodal.Png2dRow])
      .toDF().withColumn("kind", lit("image_jpg"))
    val media = wavs.unionAll(bmps).unionAll(pngs).unionAll(gifs)
      .unionAll(jpgs)
      .select(col("doc_id"), col("content"), col("kind"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(media,
        () => new Multimodal.RealCodecDecoder)
      .toDF()
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("n_frames"))
      .orderBy(col("kind"), col("doc_id"))
  }

  private val q377Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, count(*) AS n
      |  FROM events WHERE value IS NOT NULL AND user_id <= 200
      |  GROUP BY 1)
      |SELECT doc_id, kind, width, height, n_frames FROM (
      |  SELECT doc_id, 'audio' AS kind, CAST(0 AS INT) AS width,
      |    CAST(0 AS INT) AS height, CAST(n AS INT) AS n_frames
      |  FROM s
      |  UNION ALL
      |  SELECT doc_id, 'image_bmp', CAST(n AS INT), CAST(1 AS INT),
      |    CAST(1 AS INT)
      |  FROM s
      |  UNION ALL
      |  SELECT doc_id, 'image_png', CAST(16 AS INT),
      |    CAST(n // 16 AS INT), CAST(1 AS INT)
      |  FROM s WHERE n >= 16
      |  UNION ALL
      |  SELECT doc_id, 'image_gif', CAST(16 AS INT),
      |    CAST(n // 16 AS INT), CAST(1 AS INT)
      |  FROM s WHERE n >= 16
      |  UNION ALL
      |  SELECT doc_id, 'image_jpg', CAST(16 AS INT),
      |    CAST(n // 16 AS INT), CAST(1 AS INT)
      |  FROM s WHERE n >= 16)
      |ORDER BY kind, doc_id""".stripMargin

  // -------------------------------------------------------------- q389
  /** Perceptual image dedup end to end (Multimodal.pngDHashTable +
    * hammingNearDupPairs): 9-wide grayscale images synthesize from
    * events (the q373 fixture shape), plus a PLANTED near-dup copy of
    * every image with its first luma nudged +1 mod 256 — a one-pixel
    * edit that flips at most dHash bit (0,0), so every (original,
    * copy) pair must land within Hamming 1 and share 3 of 4 bands.
    * The pixels round-trip REAL PNG compression before hashing (any
    * filter/inflate bug perturbs lumas and flips hashes), the dHash
    * is exact integer arithmetic (cross-multiplied cell means), and
    * the oracle restates pixels → pooling → bits → bands → pairs →
    * Hamming bit for bit from the events formula. The image-modality
    * sibling of text SimHash dedup, on decoded pixels rather than
    * bytes — a re-encoded copy of the same picture still collides. */
  /** q389/q397's shared fixture: 9-wide event images + planted
    * one-pixel-edit copies, through REAL PNG encode/decode to a
    * (doc_id, width, height, dhash) table. */
  /** The 9-wide image dataset behind [[dhashFixture]] (base images +
    * planted one-pixel-edit copies) — also fed through the GIF codec
    * by the q403 codec-invariance row. */
  private def events9Images(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Multimodal.Png2dRow] = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(col("user_id"), col("event_id"),
        pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(256L)).cast("int").as("g"))
    val base = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("g"))))
        .as("a"))
      .select(col("user_id").as("doc_id"),
        expr("slice(transform(a, x -> x.g), 1, " +
          "(size(a) div 9) * 9)").as("lumas"))
      .filter(size(col("lumas")) >= 72) // dHash needs height >= 8
    val copies = base.select((col("doc_id") + 100000L).as("doc_id"),
      concat(array(pmod(element_at(col("lumas"), 1) + 1, lit(256))),
        expr("slice(lumas, 2, size(lumas) - 1)")).as("lumas"))
    base.unionAll(copies)
      .withColumn("width", lit(9))
      .as[Multimodal.Png2dRow]
  }

  private[graft] def dhashFixture(s: SparkSession, dir: String): DataFrame =
    Multimodal.pngDHashTable(
      Multimodal.encodePngTable(events9Images(s, dir))).toDF()

  private def q389ImageDhashDedup(s: SparkSession, dir: String): DataFrame = {
    Multimodal.hammingNearDupPairs(dhashFixture(s, dir), "doc_id",
        "dhash", maxHamming = 6)
      .select(col("id1"), col("id2"), col("hamming").cast("int")
        .as("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  /** q389/q397's shared oracle CTE chain: events → pixels (+ planted
    * copies) → pooled cells → bits → two's-complement 64-bit hash →
    * HUGEINT unsigned form → four 16-bit bands. */
  private val dhashSqlCtes =
    """s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, g,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, g, rn FROM r
      |      WHERE (n // 9) * 9 >= 72 AND rn <= (n // 9) * 9),
      |px AS (
      |  SELECT doc_id, rn, g FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, rn,
      |    CASE WHEN rn = 1 THEN (g + 1) % 256 ELSE g END
      |  FROM u),
      |geom AS (SELECT doc_id, count(*) // 9 AS h FROM px GROUP BY 1),
      |cells AS (
      |  SELECT px.doc_id,
      |    CAST((((rn - 1) // 9) * 8) // geom.h AS INT) AS i,
      |    CAST((rn - 1) % 9 AS INT) AS j,
      |    CAST(sum(g) AS BIGINT) AS sg, CAST(count(*) AS BIGINT) AS c
      |  FROM px JOIN geom ON geom.doc_id = px.doc_id
      |  GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.doc_id, a.i * 8 + a.j AS b
      |  FROM cells a JOIN cells b ON b.doc_id = a.doc_id
      |    AND b.i = a.i AND b.j = a.j + 1
      |  WHERE a.j < 8 AND a.sg * b.c > b.sg * a.c),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS dhash
      |  FROM bits GROUP BY 1),
      |allh AS (
      |  SELECT geom.doc_id, coalesce(hs.dhash, 0) AS dhash
      |  FROM geom LEFT JOIN hs ON hs.doc_id = geom.doc_id),
      |uh AS (
      |  SELECT doc_id, dhash,
      |    CAST(dhash AS HUGEINT) + (CASE WHEN dhash < 0
      |      THEN CAST(18446744073709551616 AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS hv
      |  FROM allh),
      |bands AS (
      |  SELECT doc_id, k.k,
      |    CAST((hv // CAST(k.p AS HUGEINT)) % 65536 AS BIGINT) AS band
      |  FROM uh CROSS JOIN (VALUES (0, 1), (1, 65536),
      |    (2, 4294967296), (3, 281474976710656)) AS k(k, p))""".stripMargin

  private val q389Sql =
    s"""WITH $dhashSqlCtes,
       |cand AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b ON b.k = a.k AND b.band = a.band
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT c.id1, c.id2,
       |  CAST(bit_count(xor(h1.dhash, h2.dhash)) AS INT) AS hamming
       |FROM cand c
       |JOIN allh h1 ON h1.doc_id = c.id1
       |JOIN allh h2 ON h2.doc_id = c.id2
       |WHERE bit_count(xor(h1.dhash, h2.dhash)) <= 6
       |ORDER BY c.id1, c.id2""".stripMargin

  // -------------------------------------------------------------- q390
  /** Perceptual AUDIO dedup end to end (Multimodal.wavAudioHashTable
    * + hammingNearDupPairs) — q389's audio sibling, completing the
    * modality set (bytes: binaryNearDups; pixels: q389; samples:
    * here): per-user PCM from events (the q367 fixture), plus a
    * PLANTED copy of every clip with its first sample nudged by ±1 —
    * a one-sample edit that perturbs only frame 0's energy, so every
    * (original, copy) pair lands within Hamming 1 of the 64-bit
    * energy-difference fingerprint and shares 3 of 4 bands. Samples
    * round-trip REAL RIFF/WAVE encode/decode before hashing; the
    * fingerprint is exact integer arithmetic (cross-multiplied frame
    * mean energies), and the oracle restates samples → frames →
    * energies → bits → bands → pairs bit for bit. */
  private def q390AudioFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(col("user_id"), col("event_id"),
        (pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(65536L)) - 32768L).cast("int").as("s"))
    val base = ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("event_id"), col("s"))))
        .as("a"))
      .select(col("user_id").as("doc_id"),
        expr("transform(a, x -> x.s)").as("samples"))
      .filter(size(col("samples")) >= 65)
    val s1 = element_at(col("samples"), 1)
    val copies = base.select((col("doc_id") + 100000L).as("doc_id"),
      concat(array(when(s1 < 32767, s1 + 1).otherwise(s1 - 1)),
        expr("slice(samples, 2, size(samples) - 1)")).as("samples"))
    val pcm = base.unionAll(copies).as[Multimodal.PcmRow]
    val hashes = Multimodal.wavAudioHashTable(
      Multimodal.encodeWavTable(pcm, sampleRate = 8000)).toDF()
    Multimodal.hammingNearDupPairs(hashes, "doc_id", "ahash",
        maxHamming = 6)
      .select(col("id1"), col("id2"), col("hamming").cast("int")
        .as("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  private val q390Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 65536)
      |      + 65536) % 65536 - 32768 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 65),
      |px AS (
      |  SELECT doc_id, rn, n, s FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, rn, n,
      |    CASE WHEN rn = 1 THEN
      |      (CASE WHEN s < 32767 THEN s + 1 ELSE s - 1 END)
      |    ELSE s END
      |  FROM u),
      |cells AS (
      |  SELECT doc_id, CAST(((rn - 1) * 65) // n AS INT) AS f,
      |    CAST(sum(s * s) AS BIGINT) AS e, CAST(count(*) AS BIGINT) AS c
      |  FROM px GROUP BY 1, 2),
      |bits AS (
      |  SELECT a.doc_id, a.f AS b
      |  FROM cells a JOIN cells b ON b.doc_id = a.doc_id
      |    AND b.f = a.f + 1
      |  WHERE a.f < 64 AND a.e * b.c > b.e * a.c),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS ahash
      |  FROM bits GROUP BY 1),
      |docs AS (SELECT DISTINCT doc_id FROM px),
      |allh AS (
      |  SELECT docs.doc_id, coalesce(hs.ahash, 0) AS ahash
      |  FROM docs LEFT JOIN hs ON hs.doc_id = docs.doc_id),
      |uh AS (
      |  SELECT doc_id, ahash,
      |    CAST(ahash AS HUGEINT) + (CASE WHEN ahash < 0
      |      THEN CAST(18446744073709551616 AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS hv
      |  FROM allh),
      |bands AS (
      |  SELECT doc_id, k.k,
      |    CAST((hv // CAST(k.p AS HUGEINT)) % 65536 AS BIGINT) AS band
      |  FROM uh CROSS JOIN (VALUES (0, 1), (1, 65536),
      |    (2, 4294967296), (3, 281474976710656)) AS k(k, p)),
      |cand AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM bands a JOIN bands b ON b.k = a.k AND b.band = a.band
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT c.id1, c.id2,
      |  CAST(bit_count(xor(h1.ahash, h2.ahash)) AS INT) AS hamming
      |FROM cand c
      |JOIN allh h1 ON h1.doc_id = c.id1
      |JOIN allh h2 ON h2.doc_id = c.id2
      |WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 6
      |ORDER BY c.id1, c.id2""".stripMargin

  // -------------------------------------------------------------- q394
  /** Video-style near-dup end to end (Multimodal.videoFrameHashDedup)
    * — the FOURTH modality, frame sequences: each ASCII document
    * becomes a "video" of 9×8 frames (72 char-code lumas per frame,
    * the binary-as-pixels stand-in for the env-bound video codecs —
    * the HASH and ALIGNMENT layers are the real computation), every
    * frame fingerprinted with the REAL dHash64 kernel, plus a PLANTED
    * copy of every video with its second frame DROPPED — the edit
    * Hamming-on-one-global-hash provably cannot survive but LCS
    * alignment must: the copy scores exactly 2(F−1)/(2F−1) ≥ 6/7.
    * Candidates share one exact frame hash; survivors pay one integer
    * LCS; sim is ONE division of exact integers. The oracle restates
    * char codes → per-frame bits → 64-bit hashes (two's-complement
    * bit-63 rebuild) → the shared-hash join → per-pair LCS via the
    * q391 recursive prefix-max DP, bit for bit. */
  private def q394VideoDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.load(s, dir, "documents")
      .filter(pmod(col("doc_id"), lit(2)) === 0 &&
        col("text").rlike("^[\\x20-\\x7e]*$") &&
        length(col("text")) >= 288)
      .select(col("doc_id"),
        expr("length(text) div 72").cast("int").as("nf"),
        transform(split(col("text"), ""), c => ascii(c)).as("codes"))
    val frames = d
      .select(col("doc_id"),
        explode(sequence(lit(0), col("nf") - 1)).as("f"),
        col("codes"))
      .select(col("doc_id"), col("f"),
        expr("slice(codes, f * 72 + 1, 72)").as("lumas"))
      .as[(Long, Int, Seq[Int])]
      .map { case (id, f, lumas) =>
        (id, f, Multimodal.dHash64(lumas.toArray, 9, 8))
      }
      .toDF("doc_id", "f", "h")
    val seqs = frames.groupBy(col("doc_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("f"), col("h")))),
        x => x.getField("h").cast("string")).as("seq"))
    val copies = seqs.select((col("doc_id") + 100000L).as("doc_id"),
      concat(slice(col("seq"), 1, 1),
        expr("slice(seq, 3, size(seq) - 2)")).as("seq"))
    Multimodal.videoFrameHashDedup(seqs.unionAll(copies), "doc_id",
        "seq", minSim = 0.75)
      .orderBy(col("id1"), col("id2"))
  }

  private val q394Sql =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, text, CAST(length(text) // 72 AS INT) AS nf
      |  FROM documents
      |  WHERE doc_id % 2 = 0 AND regexp_matches(text, '^[\x20-\x7e]*$')
      |    AND length(text) >= 288),
      |px AS (
      |  SELECT doc_id, CAST(k // 72 AS INT) AS f,
      |    CAST(k % 72 AS INT) AS p,
      |    ord(substr(text, CAST(k + 1 AS INT), 1)) AS code
      |  FROM d, unnest(range(0, nf * 72)) AS t(k)),
      |bits AS (
      |  SELECT a.doc_id, a.f, ((a.p // 9) * 8 + (a.p % 9)) AS b
      |  FROM px a JOIN px b2 ON b2.doc_id = a.doc_id AND b2.f = a.f
      |    AND b2.p = a.p + 1
      |  WHERE a.p % 9 < 8 AND a.code > b2.code),
      |hs AS (
      |  SELECT doc_id, f,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS h
      |  FROM bits GROUP BY 1, 2),
      |fr AS (SELECT DISTINCT doc_id, f FROM px),
      |fh AS (
      |  SELECT fr.doc_id, fr.f,
      |    CAST(coalesce(hs.h, 0) AS VARCHAR) AS h
      |  FROM fr LEFT JOIN hs ON hs.doc_id = fr.doc_id AND hs.f = fr.f),
      |seqs0 AS (SELECT doc_id, list(h ORDER BY f) AS seq FROM fh
      |          GROUP BY 1),
      |seqs AS (
      |  SELECT doc_id, seq FROM seqs0
      |  UNION ALL
      |  SELECT doc_id + 100000, list_concat(seq[1:1], seq[3:])
      |  FROM seqs0),
      |cand AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM (SELECT doc_id, unnest(seq) AS h FROM seqs) a
      |  JOIN (SELECT doc_id, unnest(seq) AS h FROM seqs) b
      |    ON b.h = a.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT c.id1, c.id2, s1.seq AS c1, s2.seq AS c2
      |  FROM cand c JOIN seqs s1 ON s1.doc_id = c.id1
      |  JOIN seqs s2 ON s2.doc_id = c.id2),
      |step(id1, id2, i, dp) AS (
      |  SELECT id1, id2, 0, list_transform(range(0, len(c2) + 1), x -> 0)
      |  FROM pairs
      |  UNION ALL
      |  SELECT s.id1, s.id2, s.i + 1,
      |    [0] || list_transform(range(1, len(p.c2) + 1), j ->
      |      greatest(s.dp[j + 1],
      |        list_max(list_transform(range(1, j + 1), j2 ->
      |          s.dp[j2] + CASE WHEN p.c1[s.i + 1] = p.c2[j2]
      |            THEN 1 ELSE 0 END))))
      |  FROM step s JOIN pairs p ON p.id1 = s.id1 AND p.id2 = s.id2
      |  WHERE s.i < len(p.c1))
      |SELECT p.id1, p.id2,
      |  CAST(len(p.c1) AS BIGINT) AS n1,
      |  CAST(len(p.c2) AS BIGINT) AS n2,
      |  CAST(f.dp[len(p.c2) + 1] AS BIGINT) AS lcs,
      |  CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
      |    / (len(p.c1) + len(p.c2)) AS sim
      |FROM pairs p JOIN step f ON f.id1 = p.id1 AND f.id2 = p.id2
      |  AND f.i = len(p.c1)
      |WHERE CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
      |    / (len(p.c1) + len(p.c2)) >= 0.75
      |ORDER BY p.id1, p.id2""".stripMargin

  // -------------------------------------------------------------- q397
  /** Incremental perceptual dedup end to end
    * (IncrementalPerceptualDedup.acceptBatch) — q389's hash table
    * arriving as THREE batches (doc_id mod 3; the +100000 planted
    * copies land one batch after their originals since 100000 ≡ 1
    * mod 3, so every planted pair is cross-batch by construction):
    * each batch probes the persistent band index built by the EARLIER
    * batches, flags its items with any earlier near-dup
    * (Hamming ≤ 6), and appends its own bands. The index is COMPACTED
    * between batches 1 and 2 (compactIndex rewrites every per-batch
    * file set into one), so the row also pins, under the oracle, that
    * compaction preserves the tag-exclusion and flag semantics — the
    * oracle knows nothing about files. The oracle restates the whole
    * state machine declaratively — an item flags iff an earlier-BATCH
    * item shares a band within Hamming 6 — so an index that
    * self-masks, misses a batch, double-appends, or loses rows to
    * compaction shifts some item's exact n_hits and fails the row. */
  private def q397IncrImageDedup(s: SparkSession, dir: String): DataFrame = {
    // checkpoint once: each acceptBatch call materializes its banded
    // input eagerly — uncached, the PNG encode/decode/dHash fixture
    // would re-run per batch (3× the row's real cost)
    val hashes = dhashFixture(s, dir)
      .withColumn("__batch", pmod(col("doc_id"), lit(3)).cast("int"))
      .localCheckpoint(true)
    val idxRoot = java.nio.file.Files
      .createTempDirectory("graft_incr_dhash")
    val idx = idxRoot.toString
    try {
    (0 until 3).map { b =>
      if (b == 2) // flags must be invariant under the file rewrite
        graft.operators.IncrementalPerceptualDedup.compactIndex(s, idx)
      graft.operators.IncrementalPerceptualDedup.acceptBatch(
        hashes.filter(col("__batch") === b)
          .select(col("doc_id"), col("dhash")),
        "doc_id", "dhash", idx, s"day$b", maxHamming = 6)
    }.reduce(_ unionAll _).orderBy(col("doc_id"))
    // each acceptBatch's flags are localCheckpoint-materialized, so
    // the index tree is dead weight once the union is built (q419's
    // no-orphaned-/tmp-tree hygiene)
    } finally QueriesDedup.deleteRecursively(idxRoot)
  }

  private[graft] val q397Sql =
    s"""WITH $dhashSqlCtes,
       |cand AS (
       |  SELECT a.doc_id AS did, b.doc_id AS eid
       |  FROM bands a JOIN bands b ON b.k = a.k AND b.band = a.band
       |    AND (b.doc_id % 3) < (a.doc_id % 3)
       |  GROUP BY 1, 2),
       |fl AS (
       |  SELECT c.did, c.eid,
       |    CAST(bit_count(xor(h1.dhash, h2.dhash)) AS INT) AS hamming
       |  FROM cand c
       |  JOIN allh h1 ON h1.doc_id = c.did
       |  JOIN allh h2 ON h2.doc_id = c.eid
       |  WHERE bit_count(xor(h1.dhash, h2.dhash)) <= 6)
       |SELECT did AS doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       |  CAST(min(hamming) AS INT) AS min_hamming,
       |  min(eid) AS min_earlier_id
       |FROM fl GROUP BY 1 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q403
  /** Codec-invariance of the perceptual hash, pinned as DATA: every
    * fixture image is encoded through BOTH real compressed codecs —
    * zlib/filtered PNG and LZW/palette GIF, two entirely independent
    * compression families and parsers — decoded back, and dHashed;
    * the two hashes must be IDENTICAL per image. This is the property
    * the whole perceptual-dedup family rests on ("a re-compressed
    * copy of the same picture still collides"): a bug in EITHER
    * codec's pixel path that q373/q399's summary features happen to
    * cancel (e.g. a row-order slip that preserves sums) breaks hash
    * equality here. The oracle computes the hash once from events and
    * asserts it for both columns. (The third real image codec, JPEG,
    * is LOSSY by nature and so excluded from this bit-equality
    * invariant by design — its bounded-Hamming counterpart is q407.) */
  private def q403CodecInvariantHash(s: SparkSession, dir: String): DataFrame = {
    val imgs = events9Images(s, dir)
    val png = Multimodal.pngDHashTable(Multimodal.encodePngTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("dhash_png"))
    val gif = Multimodal.gifDHashTable(Multimodal.encodeGifTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("dhash_gif"))
    png.join(gif, Seq("doc_id"))
      .select(col("doc_id"), col("dhash_png"), col("dhash_gif"),
        (col("dhash_png") === col("dhash_gif")).as("codec_invariant"))
      .orderBy(col("doc_id"))
  }

  private val q403Sql =
    s"""WITH $dhashSqlCtes
       |SELECT doc_id, dhash AS dhash_png, dhash AS dhash_gif,
       |  TRUE AS codec_invariant
       |FROM allh ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q406
  /** GAIN-INVARIANT spectral audio dedup end to end
    * (Multimodal.spectralWhtHash64 + hammingNearDupPairs) — closing
    * the q390 fingerprint's stated weakness: its amplitude envelope is
    * defeated by a volume change. Per-user PCM synthesizes from events
    * with EVEN samples (cents mod 16384, centered, ×2), and every clip
    * gets TWO planted copies: one at double gain (+100000) and one at
    * half gain (+200000) — both EXACT scalings on even samples, under
    * which the WHT band energies scale uniformly by g² and every
    * same-frame band comparison (and hence the whole 64-bit hash) is
    * provably unchanged: all three variants collide at Hamming 0,
    * which the amplitude hash provably cannot do. Samples round-trip
    * REAL RIFF/WAVE encode/decode before hashing; the fingerprint is
    * exact integer end to end (±1 WHT coefficients, BIGINT energies,
    * strict comparisons), and the oracle restates samples → windows →
    * WHT coefficients → band energies → bits → bands → pairs bit for
    * bit. */
  private def q406SpectralFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 8 users per clip: single-user streams top out under the 128-
    // sample spectral minimum at sf0.01, and longer clips are the
    // realistic fingerprint shape anyway
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(expr("user_id div 8").as("clip_id"), col("event_id"),
        col("user_id"),
        ((pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(16384L)) - 8192L) * 2L).cast("int").as("s"))
    val base = ev.groupBy(col("clip_id"))
      .agg(sort_array(collect_list(struct(col("event_id"),
        col("user_id"), col("s")))).as("a"))
      .select(col("clip_id").as("doc_id"),
        expr("transform(a, x -> x.s)").as("samples"))
      .filter(size(col("samples")) >= 128)
    val louder = base.select((col("doc_id") + 100000L).as("doc_id"),
      expr("transform(samples, x -> CAST(x * 2 AS INT))").as("samples"))
    val quieter = base.select((col("doc_id") + 200000L).as("doc_id"),
      expr("transform(samples, x -> CAST(x DIV 2 AS INT))").as("samples"))
    val pcm = base.unionAll(louder).unionAll(quieter)
      .as[Multimodal.PcmRow]
    val hashes = Multimodal.wavSpectralHashTable(
      Multimodal.encodeWavTable(pcm, sampleRate = 8000)).toDF()
    Multimodal.hammingNearDupPairs(hashes, "doc_id", "ahash",
        maxHamming = 6)
      .select(col("id1"), col("id2"), col("hamming").cast("int")
        .as("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  private val q406Sql =
    """WITH s AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    (((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192) * 2 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 128),
      |px AS (
      |  SELECT doc_id, rn, n, s FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, rn, n, s * 2 FROM u
      |  UNION ALL
      |  SELECT doc_id + 200000, rn, n, s // 2 FROM u),
      |wnd AS (
      |  SELECT doc_id, (rn - 1) // 8 AS w, CAST((rn - 1) % 8 AS INT)
      |      AS t,
      |    n // 8 AS nw, s
      |  FROM px WHERE rn <= (n // 8) * 8),
      |coefs AS (
      |  SELECT doc_id, CAST((w * 16) // nw AS INT) AS f, w, k.k,
      |    CAST(sum(CASE WHEN bit_count(k.k & t) % 2 = 0 THEN s
      |      ELSE -s END) AS BIGINT) AS c
      |  FROM wnd CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5),
      |    (6), (7)) AS k(k)
      |  GROUP BY 1, 2, 3, 4),
      |en AS (
      |  SELECT doc_id, f, k, CAST(sum(c * c) AS BIGINT) AS e
      |  FROM coefs GROUP BY 1, 2, 3),
      |bits AS (
      |  SELECT a.doc_id, a.f * 4 + a.k AS b
      |  FROM en a JOIN en b2 ON b2.doc_id = a.doc_id AND b2.f = a.f
      |    AND b2.k = a.k + 4
      |  WHERE a.k < 4 AND a.e > b2.e),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS ahash
      |  FROM bits GROUP BY 1),
      |alldocs AS (SELECT DISTINCT doc_id FROM px),
      |allh AS (
      |  SELECT alldocs.doc_id, coalesce(hs.ahash, 0) AS ahash
      |  FROM alldocs LEFT JOIN hs ON hs.doc_id = alldocs.doc_id),
      |uh AS (
      |  SELECT doc_id, ahash,
      |    CAST(ahash AS HUGEINT) + (CASE WHEN ahash < 0
      |      THEN CAST(18446744073709551616 AS HUGEINT)
      |      ELSE CAST(0 AS HUGEINT) END) AS hv
      |  FROM allh),
      |bands AS (
      |  SELECT doc_id, k.k,
      |    CAST((hv // CAST(k.p AS HUGEINT)) % 65536 AS BIGINT) AS band
      |  FROM uh CROSS JOIN (VALUES (0, 1), (1, 65536),
      |    (2, 4294967296), (3, 281474976710656)) AS k(k, p)),
      |cand AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM bands a JOIN bands b ON b.k = a.k AND b.band = a.band
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT c.id1, c.id2,
      |  CAST(bit_count(xor(h1.ahash, h2.ahash)) AS INT) AS hamming
      |FROM cand c
      |JOIN allh h1 ON h1.doc_id = c.id1
      |JOIN allh h2 ON h2.doc_id = c.id2
      |WHERE bit_count(xor(h1.ahash, h2.ahash)) <= 6
      |ORDER BY c.id1, c.id2""".stripMargin

  // -------------------------------------------------------------- q404
  /** REAL baseline-JPEG round-trip (graft.operators.Jpeg, written from
    * ITU-T T.81 — Huffman entropy coding, dequantize, IDCT): the q373
    * fixture images encode with the flat quant table (≈ quality 100)
    * and decode back through the strict parser. JPEG is LOSSY, so the
    * gate is a TOLERANCE contract, not bit equality: geometry columns
    * are exact (the oracle recomputes them from events) and
    * `within_tol` pins per-image max |decoded − original| ≤ 2 —
    * measured max is 1 at sf0.01 AND sf0.1 (flat quant leaves only
    * DCT-coefficient rounding), so the bound carries 2× margin. Any
    * Huffman, zigzag, dequantize, IDCT, padding, or byte-stuffing bug
    * blows the tolerance or the exact geometry. */
  private def q404JpegRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events16Images(s, dir)
      .map { r =>
        val blob = graft.operators.Jpeg.encodeJpegGray(r.lumas, r.width)
        val (w, h, dec) = graft.operators.Jpeg.decodeJpegLumas(blob)
        val maxe = r.lumas.iterator.zip(dec.iterator)
          .map { case (a, b) => math.abs(a - b) }.max
        (r.doc_id, w, h, w.toLong * h, maxe <= 2)
      }
      .toDF("doc_id", "width", "height", "n_pixels", "within_tol")
      .orderBy(col("doc_id"))
  }

  private val q404Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT * FROM r WHERE n >= 16 AND rn <= (n // 16) * 16)
      |SELECT doc_id, CAST(16 AS INT) AS width,
      |  CAST(count(*) // 16 AS INT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  TRUE AS within_tol
      |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q409
  /** PROGRESSIVE JPEG (SOF2, spectral-selection scans with EOB-run
    * coding) pinned against baseline as DATA: every q373 fixture image
    * encodes BOTH ways under the Annex K quant table (coarse
    * quantization zeroes most AC bands, so the progressive AC scans
    * emit genuine EOBn runs), and the two streams must decode
    * PIXEL-IDENTICAL — not within a tolerance: both modes quantize the
    * same coefficients and share one dequant+IDCT, so any divergence
    * is a scan-layer bug (EOB-run bookkeeping, band bounds,
    * non-interleaved grid, DC prediction chains). This is the
    * progressive sibling of q403's codec-invariance: exact equality
    * across two entirely different entropy LAYOUTS of the same
    * mathematical image. Geometry columns stay oracle-exact. */
  private def q409JpegProgressive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events16Images(s, dir)
      .map { r =>
        val J = graft.operators.Jpeg
        val q = J.QuantAnnexKLuma
        val base = J.decodeJpegLumas(J.encodeJpegGray(r.lumas, r.width, q))
        val prog = J.decodeJpegLumas(
          J.encodeJpegGray(r.lumas, r.width, q, progressive = true))
        (r.doc_id, base._1, base._2, base._1.toLong * base._2,
          java.util.Arrays.equals(base._3, prog._3))
      }
      .toDF("doc_id", "width", "height", "n_pixels", "pixels_identical")
      .orderBy(col("doc_id"))
  }

  private val q409Sql =
    """WITH s AS (
      |  SELECT user_id AS doc_id, event_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 256)
      |      + 256) % 256 AS g
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY event_id)
      |      AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT * FROM r WHERE n >= 16 AND rn <= (n // 16) * 16)
      |SELECT doc_id, CAST(16 AS INT) AS width,
      |  CAST(count(*) // 16 AS INT) AS height,
      |  CAST(count(*) AS BIGINT) AS n_pixels,
      |  TRUE AS pixels_identical
      |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q407
  /** Perceptual-hash survival of a JPEG re-encode, pinned as data —
    * the q403 codec-invariance pattern with a BOUND instead of
    * equality (JPEG is lossy, PNG/GIF are not): every q389 fixture
    * image is decoded from REAL PNG bytes and dHashed, then re-encoded
    * through the REAL baseline-JPEG codec, decoded, and dHashed again;
    * `collides` pins Hamming(dhash_png, dhash_jpeg) ≤ 6 — the SAME
    * threshold the near-dup join uses, so this row is literally "a
    * JPEG re-encode of the same picture still collides in perceptual
    * dedup", the property that makes the family usable on real web
    * corpora. Measured max Hamming is 1 at sf0.01 and sf0.1 (6×
    * margin). dhash_png itself is EXACT and recomputed by the oracle
    * from events (the q403 chain). */
  private def q407JpegHashCollision(s: SparkSession, dir: String): DataFrame = {
    val imgs = events9Images(s, dir)
    val png = Multimodal.pngDHashTable(Multimodal.encodePngTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("dhash_png"))
    val jpg = Multimodal.jpegDHashTable(Multimodal.encodeJpegTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("__dhash_jpg"))
    png.join(jpg, Seq("doc_id"))
      .select(col("doc_id"), col("dhash_png"),
        (bit_count(col("dhash_png").bitwiseXOR(col("__dhash_jpg")))
          <= 6).as("collides"))
      .orderBy(col("doc_id"))
  }

  private val q407Sql =
    s"""WITH $dhashSqlCtes
       |SELECT doc_id, dhash AS dhash_png, TRUE AS collides
       |FROM allh ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q410
  /** Perceptual-hash survival of a SUCCESSIVE-APPROXIMATION
    * progressive JPEG re-encode — the q407 contract extended to the
    * scan script real web encoders emit (libjpeg's default
    * progression refines one approximation bit per scan, T.81
    * G.1.2.3): every q389 fixture image decodes from REAL PNG bytes,
    * dHashes, re-encodes through the SA-progressive JPEG script
    * (Al=1 first passes + Ah=1 DC/AC refinement scans with EOB runs
    * carrying buffered correction bits), decodes back through the
    * refinement decoder, and dHashes again; `collides` pins
    * Hamming ≤ 6 — the near-dup join threshold. SA quantizes the
    * SAME coefficients as baseline (two's-complement bit slicing for
    * DC, magnitude-bit slicing for AC), so the decoded pixels are
    * identical to q407's baseline re-encode and the measured bound
    * carries over; any refinement-layer bug (correction-bit order,
    * EOB-run interaction, approximation-level bookkeeping) perturbs
    * pixels and blows the bound. */
  private def q410JpegSaHashCollision(s: SparkSession, dir: String)
      : DataFrame = {
    val imgs = events9Images(s, dir)
    val png = Multimodal.pngDHashTable(Multimodal.encodePngTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("dhash_png"))
    val sa = Multimodal.jpegDHashTable(Multimodal.encodeJpegTable(imgs,
        progressive = true, successiveApprox = true))
      .toDF().select(col("doc_id"), col("dhash").as("__dhash_sa"))
    png.join(sa, Seq("doc_id"))
      .select(col("doc_id"), col("dhash_png"),
        (bit_count(col("dhash_png").bitwiseXOR(col("__dhash_sa")))
          <= 6).as("collides"))
      .orderBy(col("doc_id"))
  }

  private val q410Sql =
    s"""WITH $dhashSqlCtes
       |SELECT doc_id, dhash AS dhash_png, TRUE AS collides
       |FROM allh ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q411
  /** SHIFT-robust audio near-dup pinned as data — the r9 next-round
    * item closing spectralWhtHash64's stated weakness (its fixed
    * 16-frame grid mis-aligns under any trim, the weakness class the
    * gain fix closed for amplitude): q406's 8-user clips become REAL
    * WAV blobs, plus planted TRIMMED copies with the first 256
    * samples (two 128-sample windows) dropped. The fixed-grid hash
    * would flip essentially every frame bit on such a copy; the
    * window-sequence path (audioShiftDedup: per-window WHT
    * fingerprints → exact-token candidate buckets → codegen'd LCS)
    * aligns the surviving nw−2 windows exactly, so every
    * (original, trimmed) pair reports lcs = nw−2 and
    * sim = 2(nw−2)/(2nw−2) ≥ 0.5 while unrelated clips share no
    * window hash at all. The oracle restates the WHOLE pipeline —
    * samples → 128-sample windows → 8-point WHT per 8-sample
    * sub-window → energy-comparison bits → two's-complement 64-bit
    * tokens → shared-token candidates → recursive-CTE LCS → sim —
    * from the events formula, through real RIFF/WAVE encode/decode
    * on the Spark side. */
  /** q411/q415/q416's shared clip fixture: 8-user PCM clips (≥ 512
    * samples — 4 complete 128-sample windows — even 16-bit values). */
  private def audioClips(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .filter(col("value").isNotNull && col("user_id") <= 500)
      .select(expr("user_id div 8").as("clip_id"), col("event_id"),
        col("user_id"),
        ((pmod((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(16384L)) - 8192L) * 2L).cast("int").as("s"))
    ev.groupBy(col("clip_id"))
      .agg(sort_array(collect_list(struct(col("event_id"),
        col("user_id"), col("s")))).as("a"))
      .select(col("clip_id").as("doc_id"),
        expr("transform(a, x -> x.s)").as("samples"))
      .filter(size(col("samples")) >= 512) // >= 4 complete windows
  }

  private def q411AudioShiftDedup(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val base = audioClips(s, dir)
    val trimmed = base.select((col("doc_id") + 100000L).as("doc_id"),
      expr("slice(samples, 257, size(samples) - 256)").as("samples"))
    val pcm = base.unionAll(trimmed).as[Multimodal.PcmRow]
    Multimodal.audioShiftDedup(
        Multimodal.encodeWavTable(pcm, sampleRate = 8000),
        minSim = 0.5, windowSamples = 128)
      .orderBy(col("id1"), col("id2"))
  }

  /** The shared window-token oracle chain (q411/q416/q418 — q415
    * threads an extra `arm` column through the same shape and stays
    * standalone): per-window 8-point WHT coefficients →
    * energy-comparison bits → two's-complement 64-bit tokens →
    * shared-token candidate pairs → recursive-CTE LCS. Expects a
    * `wnd(doc_id, w, sw, t, s)` CTE upstream; ends with the `step`
    * DP table; [[whtSeqLcsSelect]] is the matching final
    * projection. One definition so a fix lands everywhere at once. */
  private val whtSeqLcsCtes =
    """coefs AS (
      |  SELECT doc_id, w, sw, k.k,
      |    CAST(sum(CASE WHEN bit_count(k.k & t) % 2 = 0 THEN s
      |      ELSE -s END) AS BIGINT) AS c
      |  FROM wnd CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5),
      |    (6), (7)) AS k(k)
      |  GROUP BY 1, 2, 3, 4),
      |bits AS (
      |  SELECT a.doc_id, a.w, (a.sw * 4 + a.k) AS b
      |  FROM coefs a JOIN coefs b2 ON b2.doc_id = a.doc_id
      |    AND b2.w = a.w AND b2.sw = a.sw AND b2.k = a.k + 4
      |  WHERE a.k < 4 AND a.c * a.c > b2.c * b2.c),
      |hs AS (
      |  SELECT doc_id, w,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS h
      |  FROM bits GROUP BY 1, 2),
      |wd AS (SELECT DISTINCT doc_id, w FROM wnd),
      |fh AS (
      |  SELECT wd.doc_id, wd.w,
      |    CAST(coalesce(hs.h, 0) AS VARCHAR) AS h
      |  FROM wd LEFT JOIN hs ON hs.doc_id = wd.doc_id AND hs.w = wd.w),
      |seqs AS (SELECT doc_id, list(h ORDER BY w) AS seq FROM fh
      |         GROUP BY 1),
      |cand AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM (SELECT doc_id, unnest(seq) AS h FROM seqs) a
      |  JOIN (SELECT doc_id, unnest(seq) AS h FROM seqs) b
      |    ON b.h = a.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT c.id1, c.id2, s1.seq AS c1, s2.seq AS c2
      |  FROM cand c JOIN seqs s1 ON s1.doc_id = c.id1
      |  JOIN seqs s2 ON s2.doc_id = c.id2),
      |step(id1, id2, i, dp) AS (
      |  SELECT id1, id2, 0, list_transform(range(0, len(c2) + 1), x -> 0)
      |  FROM pairs
      |  UNION ALL
      |  SELECT st.id1, st.id2, st.i + 1,
      |    [0] || list_transform(range(1, len(p.c2) + 1), j ->
      |      greatest(st.dp[j + 1],
      |        list_max(list_transform(range(1, j + 1), j2 ->
      |          st.dp[j2] + CASE WHEN p.c1[st.i + 1] = p.c2[j2]
      |            THEN 1 ELSE 0 END))))
      |  FROM step st JOIN pairs p ON p.id1 = st.id1 AND p.id2 = st.id2
      |  WHERE st.i < len(p.c1))""".stripMargin

  private def whtSeqLcsSelect(minSim: String): String =
    s"""SELECT p.id1, p.id2,
       |  CAST(len(p.c1) AS BIGINT) AS n1,
       |  CAST(len(p.c2) AS BIGINT) AS n2,
       |  CAST(f.dp[len(p.c2) + 1] AS BIGINT) AS lcs,
       |  CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
       |    / (len(p.c1) + len(p.c2)) AS sim
       |FROM pairs p JOIN step f ON f.id1 = p.id1 AND f.id2 = p.id2
       |  AND f.i = len(p.c1)
       |WHERE CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
       |    / (len(p.c1) + len(p.c2)) >= $minSim
       |ORDER BY p.id1, p.id2""".stripMargin

  private val q411Sql =
    """WITH RECURSIVE s AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    (((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192) * 2 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 512),
      |px AS (
      |  SELECT doc_id, rn, s, n FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, rn - 256, s, n - 256 FROM u
      |  WHERE rn > 256),
      |wnd AS (
      |  SELECT doc_id, CAST((rn - 1) // 128 AS INT) AS w,
      |    CAST(((rn - 1) % 128) // 8 AS INT) AS sw,
      |    CAST((rn - 1) % 8 AS INT) AS t, s
      |  FROM px WHERE rn <= (n // 128) * 128),""".stripMargin +
      "\n" + whtSeqLcsCtes + "\n" + whtSeqLcsSelect("0.5")

  // -------------------------------------------------------------- q415
  /** The hop dial as GATE DATA (r10 next-round #5 — q411 plants
    * window-ALIGNED trims, so the hopSamples overlap dial was only
    * spec-pinned): the q411 clips gain planted copies trimmed by 96
    * samples — 3 hops of 32, NOT a multiple of the 128-sample window —
    * and the dedup runs BOTH ways. With hopSamples = windowSamples/4
    * (4× tokens — the documented cost of the dial, priced in
    * BENCH_NOTES) every trimmed window is sample-identical to an
    * original window 3 hop positions later, so all planted pairs
    * align at lcs = nw−3 and are found; with the dial OFF
    * (hop = window) the trim re-phases every window, no tokens are
    * shared, and the planted pairs are MISSED — both arms emitted as
    * counts, so the miss is pinned as data, not just absent. Trim
    * granularity IS the hop (a 37-sample trim would need hop 1 at
    * 128× tokens — the dial trades cost for granularity, it does not
    * abolish the trade). Oracle restates the full overlapping-window
    * pipeline for both arms: windows at each hop (a range join of
    * samples into window spans) → 8-point WHT per 8-sample sub-window
    * → energy-comparison bits → two's-complement tokens →
    * shared-token candidates → recursive-CTE LCS → sim ≥ 0.5 →
    * per-arm counts. */
  private def q415HopDialTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = audioClips(s, dir)
    val trimmed = base.select((col("doc_id") + 100000L).as("doc_id"),
      expr("slice(samples, 97, size(samples) - 96)").as("samples"))
    val wav = Multimodal.encodeWavTable(
      base.unionAll(trimmed).as[Multimodal.PcmRow], sampleRate = 8000)
      .localCheckpoint(true) // two arms read the same encoded blobs
    def arm(name: String, hop: Int): DataFrame =
      Multimodal.audioShiftDedup(wav, minSim = 0.5,
          windowSamples = 128, hopSamples = hop)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("id2") === col("id1") + 100000L, 1L)
            .otherwise(0L)), lit(0L)).as("n_planted_found"))
        .select(lit(name).as("arm"), col("n_pairs"),
          col("n_planted_found"))
    arm("hop32", 32).unionAll(arm("hop128", 128)).orderBy(col("arm"))
  }

  private val q415Sql =
    """WITH RECURSIVE s AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    (((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192) * 2 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 512),
      |px AS (
      |  SELECT doc_id, rn, s, n FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, rn - 96, s, n - 96 FROM u
      |  WHERE rn > 96),
      |arms(arm, hop) AS (VALUES ('hop32', 32), ('hop128', 128)),
      |nws AS (
      |  SELECT a.arm, a.hop, d.doc_id, CAST(w.w AS INT) AS w
      |  FROM (SELECT DISTINCT doc_id, n FROM px) d
      |  CROSS JOIN arms a,
      |    unnest(range(0, greatest((d.n - 128) // a.hop + 1, 0))) AS w(w)),
      |wnd AS (
      |  SELECT nws.arm, nws.doc_id, nws.w,
      |    CAST((p.rn - 1 - nws.w * nws.hop) // 8 AS INT) AS sw,
      |    CAST((p.rn - 1 - nws.w * nws.hop) % 8 AS INT) AS t, p.s
      |  FROM nws JOIN px p ON p.doc_id = nws.doc_id
      |    AND p.rn >= nws.w * nws.hop + 1
      |    AND p.rn <= nws.w * nws.hop + 128),
      |coefs AS (
      |  SELECT arm, doc_id, w, sw, k.k,
      |    CAST(sum(CASE WHEN bit_count(k.k & t) % 2 = 0 THEN s
      |      ELSE -s END) AS BIGINT) AS c
      |  FROM wnd CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5),
      |    (6), (7)) AS k(k)
      |  GROUP BY 1, 2, 3, 4, 5),
      |bits AS (
      |  SELECT a.arm, a.doc_id, a.w, (a.sw * 4 + a.k) AS b
      |  FROM coefs a JOIN coefs b2 ON b2.arm = a.arm
      |    AND b2.doc_id = a.doc_id AND b2.w = a.w AND b2.sw = a.sw
      |    AND b2.k = a.k + 4
      |  WHERE a.k < 4 AND a.c * a.c > b2.c * b2.c),
      |hs AS (
      |  SELECT arm, doc_id, w,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS h
      |  FROM bits GROUP BY 1, 2, 3),
      |wd AS (SELECT DISTINCT arm, doc_id, w FROM wnd),
      |fh AS (
      |  SELECT wd.arm, wd.doc_id, wd.w,
      |    CAST(coalesce(hs.h, 0) AS VARCHAR) AS h
      |  FROM wd LEFT JOIN hs ON hs.arm = wd.arm
      |    AND hs.doc_id = wd.doc_id AND hs.w = wd.w),
      |seqs AS (SELECT arm, doc_id, list(h ORDER BY w) AS seq FROM fh
      |         GROUP BY 1, 2),
      |cand AS (
      |  SELECT a.arm, a.doc_id AS id1, b.doc_id AS id2
      |  FROM (SELECT arm, doc_id, unnest(seq) AS h FROM seqs) a
      |  JOIN (SELECT arm, doc_id, unnest(seq) AS h FROM seqs) b
      |    ON b.arm = a.arm AND b.h = a.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT c.arm, c.id1, c.id2, s1.seq AS c1, s2.seq AS c2
      |  FROM cand c JOIN seqs s1 ON s1.arm = c.arm
      |    AND s1.doc_id = c.id1
      |  JOIN seqs s2 ON s2.arm = c.arm AND s2.doc_id = c.id2),
      |step(arm, id1, id2, i, dp) AS (
      |  SELECT arm, id1, id2, 0,
      |    list_transform(range(0, len(c2) + 1), x -> 0)
      |  FROM pairs
      |  UNION ALL
      |  SELECT st.arm, st.id1, st.id2, st.i + 1,
      |    [0] || list_transform(range(1, len(p.c2) + 1), j ->
      |      greatest(st.dp[j + 1],
      |        list_max(list_transform(range(1, j + 1), j2 ->
      |          st.dp[j2] + CASE WHEN p.c1[st.i + 1] = p.c2[j2]
      |            THEN 1 ELSE 0 END))))
      |  FROM step st JOIN pairs p ON p.arm = st.arm
      |    AND p.id1 = st.id1 AND p.id2 = st.id2
      |  WHERE st.i < len(p.c1)),
      |hits AS (
      |  SELECT p.arm, p.id1, p.id2
      |  FROM pairs p JOIN step f ON f.arm = p.arm AND f.id1 = p.id1
      |    AND f.id2 = p.id2 AND f.i = len(p.c1)
      |  WHERE CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
      |      / (len(p.c1) + len(p.c2)) >= 0.5)
      |SELECT a.arm, CAST(count(h.id1) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(sum(CASE WHEN h.id2 = h.id1 + 100000 THEN 1
      |    ELSE 0 END), 0) AS BIGINT) AS n_planted_found
      |FROM arms a LEFT JOIN hits h ON h.arm = a.arm
      |GROUP BY a.arm ORDER BY a.arm""".stripMargin

  // -------------------------------------------------------------- q416
  /** Resample-robust audio dedup (r10 next-round #6): a sample-rate-
    * converted copy — the most common real audio transform after
    * trim/gain — shares NO 128-sample window tokens with its
    * original, because every window holds different values on a
    * different time grid. Fix: normalize every clip to a CANONICAL
    * rate first (resampleLinear — exact-rational positions, floored
    * linear interpolation, integer in/out), then window. The gate
    * plants 2×-rate copies: each clip upsamples 8 → 16 kHz through
    * resampleLinear itself (odd positions exact, even positions
    * floored midpoints), becomes a REAL 16 kHz WAV blob, and the
    * dedup runs with canonicalRate = 8000 — the 16 kHz decode
    * resamples back down, landing EXACTLY on the original samples
    * (even output positions are exact rational hits — the identity
    * the scaladoc pins), so every (original, copy) pair aligns at
    * lcs = nw, sim = 1.0, while unrelated clips share nothing. The
    * oracle restates the interpolation chain itself — upsample (odd
    * rn exact, even rn floored midpoint via lead()) → downsample
    * (odd positions of the upsampled stream) → windows → WHT →
    * tokens → candidates → recursive-CTE LCS. Non-integer ratios
    * (where the roundtrip is NOT identity) are spec-pinned in
    * MultimodalSpec. */
  private def q416ResampleDedup(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val base = audioClips(s, dir).as[Multimodal.PcmRow]
    val up = base.map(r => Multimodal.PcmRow(r.doc_id + 100000L,
      Multimodal.resampleLinear(r.samples.toArray, 8000, 16000).toSeq))
    val wav = Multimodal.encodeWavTable(base, sampleRate = 8000)
      .unionAll(Multimodal.encodeWavTable(up, sampleRate = 16000))
    Multimodal.audioShiftDedup(wav, minSim = 0.9, windowSamples = 128,
        canonicalRate = 8000)
      .orderBy(col("id1"), col("id2"))
  }

  private val q416Sql =
    """WITH RECURSIVE s AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    (((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192) * 2 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 512),
      |up AS (
      |  SELECT doc_id + 100000 AS doc_id, 2 * rn - 1 AS rn, s,
      |    2 * n AS n
      |  FROM u
      |  UNION ALL
      |  SELECT doc_id + 100000, 2 * rn,
      |    CASE WHEN rn < n
      |      THEN s + CAST(floor((lead_s - s) / 2.0) AS BIGINT)
      |      ELSE s END,
      |    2 * n
      |  FROM (SELECT doc_id, rn, n, s,
      |          lead(s) OVER (PARTITION BY doc_id ORDER BY rn) AS lead_s
      |        FROM u)),
      |down AS (
      |  SELECT doc_id, (rn + 1) // 2 AS rn, s, n // 2 AS n FROM up
      |  WHERE rn % 2 = 1),
      |px AS (
      |  SELECT doc_id, rn, s, n FROM u
      |  UNION ALL
      |  SELECT doc_id, rn, s, n FROM down),
      |wnd AS (
      |  SELECT doc_id, CAST((rn - 1) // 128 AS INT) AS w,
      |    CAST(((rn - 1) % 128) // 8 AS INT) AS sw,
      |    CAST((rn - 1) % 8 AS INT) AS t, s
      |  FROM px WHERE rn <= (n // 128) * 128),
""".stripMargin +
      "\n" + whtSeqLcsCtes + "\n" + whtSeqLcsSelect("0.9")

  // -------------------------------------------------------------- q418
  /** The composed audio transform GAUNTLET — real-web copies rarely
    * apply one transform; this gate plants a copy that stacks all
    * three the family defends against, and the three mechanisms must
    * compose: each clip is gain-halved (exact — fixture samples are
    * even, and the WHT hash is EXACTLY invariant under exact scaling,
    * the q406 contract), trimmed by 96 samples (3 hops of 32, NOT a
    * window multiple — the q415 dial case), and 2×-upsampled to a
    * REAL 16 kHz WAV (the q416 resample case). Dedup runs with
    * hopSamples = 32 AND canonicalRate = 8000: the decode resamples
    * back (landing exactly on the halved samples), the hop granularity
    * absorbs the trim, and the gain invariance makes every surviving
    * window token IDENTICAL to its original counterpart — every
    * (original, copy) pair aligns at lcs = nw−3 like q415's found
    * arm. Any one mechanism missing breaks the pair: no canonical
    * rate → zero shared tokens; no hop dial → the trim re-phases
    * everything; an inexact gain or resampler → tokens flip. Oracle
    * restates the chain from the events formula: the halved stream
    * is the pre-×2 base expression itself (no division anywhere),
    * trim, the q416 upsample/downsample CTEs, the q415 hop-32 window
    * machinery, WHT, tokens, candidates, recursive-CTE LCS. */
  private def q418AudioGauntlet(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val base = audioClips(s, dir).as[Multimodal.PcmRow]
    val copies = base.map { r =>
      val half = r.samples.map(_ / 2).toArray
      val trimmed = java.util.Arrays.copyOfRange(half, 96, half.length)
      Multimodal.PcmRow(r.doc_id + 100000L,
        Multimodal.resampleLinear(trimmed, 8000, 16000).toSeq)
    }
    val wav = Multimodal.encodeWavTable(base, sampleRate = 8000)
      .unionAll(Multimodal.encodeWavTable(copies, sampleRate = 16000))
    Multimodal.audioShiftDedup(wav, minSim = 0.5, windowSamples = 128,
        hopSamples = 32, canonicalRate = 8000)
      .orderBy(col("id1"), col("id2"))
  }

  private val q418Sql =
    """WITH RECURSIVE sh AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    ((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s * 2) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM sh),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 512),
      |trimmed AS (
      |  SELECT doc_id, rn - 96 AS rn, s, n - 96 AS n FROM u
      |  WHERE rn > 96),
      |up AS (
      |  SELECT doc_id + 100000 AS doc_id, 2 * rn - 1 AS rn, s,
      |    2 * n AS n
      |  FROM trimmed
      |  UNION ALL
      |  SELECT doc_id + 100000, 2 * rn,
      |    CASE WHEN rn < n
      |      THEN s + CAST(floor((lead_s - s) / 2.0) AS BIGINT)
      |      ELSE s END,
      |    2 * n
      |  FROM (SELECT doc_id, rn, n, s,
      |          lead(s) OVER (PARTITION BY doc_id ORDER BY rn) AS lead_s
      |        FROM trimmed)),
      |down AS (
      |  SELECT doc_id, (rn + 1) // 2 AS rn, s, n // 2 AS n FROM up
      |  WHERE rn % 2 = 1),
      |px AS (
      |  SELECT doc_id, rn, s * 2 AS s, n FROM u
      |  UNION ALL
      |  SELECT doc_id, rn, s, n FROM down),
      |nws AS (
      |  SELECT d.doc_id, CAST(w.w AS INT) AS w
      |  FROM (SELECT DISTINCT doc_id, n FROM px) d,
      |    unnest(range(0, greatest((d.n - 128) // 32 + 1, 0))) AS w(w)),
      |wnd AS (
      |  SELECT nws.doc_id, nws.w,
      |    CAST((p.rn - 1 - nws.w * 32) // 8 AS INT) AS sw,
      |    CAST((p.rn - 1 - nws.w * 32) % 8 AS INT) AS t, p.s
      |  FROM nws JOIN px p ON p.doc_id = nws.doc_id
      |    AND p.rn >= nws.w * 32 + 1 AND p.rn <= nws.w * 32 + 128),
""".stripMargin +
      "\n" + whtSeqLcsCtes + "\n" + whtSeqLcsSelect("0.5")

  // -------------------------------------------------------------- q420
  /** The LOSSY frontier of audio dedup (r11 next-round #1): a
    * NON-INTEGER resample — 44.1 kHz ⇄ 16 kHz, ratio 441:160, the
    * single most common real conversion — perturbs every sample
    * (the roundtrip through [[Multimodal.resampleLinear]] is NOT the
    * identity, unlike the nesting 2× case q416 exploits), flipping a
    * few bits of nearly every 64-bit window hash; the exact-equality
    * arm is then a (near-)total miss, where tolerant matching should
    * still align. Gate: the q411 clips declared as 16 kHz WAVs gain
    * planted copies upsampled 16 → 44.1 kHz through resampleLinear
    * itself (so the oracle can replay the exact interpolation chain)
    * and stored as REAL 44.1 kHz WAVs; dedup canonicalizes both to
    * 16 kHz — the copy comes back one sample short and every sample
    * interpolation-perturbed (measured ≤ 9 bits per window at sf0.01
    * AND sf0.1; unrelated windows ≥ 23) — and runs BOTH arms at
    * minSim 0.5: `exact` ([[Multimodal.audioShiftDedup]], raw-token
    * candidates + equality LCS) finds almost nothing, `hamming10`
    * ([[Multimodal.audioTolerantDedup]], 4×16-bit band candidates +
    * popcount(xor) ≤ 10 LCS) finds every planted pair — and ONLY
    * the planted pairs (n_pairs = n_planted_found IS the adversarial
    * no-false-collision stanza: unrelated clips never collide at
    * k = 10). Both arms emit count rows, the q415 pattern, so the
    * exact miss is pinned as data. Oracle restates everything from
    * the events formula: exact-rational upsample (idx/rem against
    * denominator 441) → downsample (denominator 160) → windows →
    * WHT → BIGINT tokens → per-arm candidates (raw token vs 16-bit
    * bands) → recursive-CTE LCS whose match predicate is
    * bit_count(xor) ≤ k with k = 0 replaying equality → sim ≥ 0.5 →
    * per-arm counts. Cost of the dial (×4 candidate tokens per
    * window) recorded in BENCH_NOTES. */
  private def q420TolerantResample(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val base = audioClips(s, dir).as[Multimodal.PcmRow]
    val copies = base.map(r => Multimodal.PcmRow(r.doc_id + 100000L,
      Multimodal.resampleLinear(r.samples.toArray, 16000, 44100).toSeq))
    val wav = Multimodal.encodeWavTable(base, sampleRate = 16000)
      .unionAll(Multimodal.encodeWavTable(copies, sampleRate = 44100))
      .localCheckpoint(true) // two arms read the same encoded blobs
    def counts(name: String, pairs: DataFrame): DataFrame =
      pairs.agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("id2") === col("id1") + 100000L, 1L)
          .otherwise(0L)), lit(0L)).as("n_planted_found"))
        .select(lit(name).as("arm"), col("n_pairs"),
          col("n_planted_found"))
    val exact = counts("exact",
      Multimodal.audioShiftDedup(wav, minSim = 0.5,
        windowSamples = 128, canonicalRate = 16000))
    val tol = counts("hamming10",
      Multimodal.audioTolerantDedup(wav, minSim = 0.5,
        windowSamples = 128, maxHamming = 10, canonicalRate = 16000))
    exact.unionAll(tol).orderBy(col("arm"))
  }

  private val q420Sql =
    """WITH RECURSIVE s AS (
      |  SELECT user_id // 8 AS doc_id, event_id, user_id,
      |    (((CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) % 16384)
      |      + 16384) % 16384 - 8192) * 2 AS s
      |  FROM events WHERE value IS NOT NULL AND user_id <= 500),
      |r AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY event_id, user_id, s) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS n
      |  FROM s),
      |u AS (SELECT doc_id, s, rn, n FROM r WHERE n >= 512),
      |-- upsample 16 kHz -> 44.1 kHz: output i (0-based) sits at the
      |-- exact rational source position i*160/441; exact hit when the
      |-- remainder vanishes, floored linear interpolation otherwise —
      |-- resampleLinear's arithmetic verbatim (reduced denominators:
      |-- floor(d*(p%44100)/44100) = floor(d*((i*160)%441)/441))
      |um AS (SELECT DISTINCT doc_id, n, (n * 441) // 160 AS m FROM u),
      |upi AS (
      |  SELECT um.doc_id, um.n, um.m, CAST(i.i AS BIGINT) AS i,
      |    (CAST(i.i AS BIGINT) * 160) // 441 AS idx,
      |    (CAST(i.i AS BIGINT) * 160) % 441 AS rem
      |  FROM um, unnest(range(0, um.m)) AS i(i)),
      |up AS (
      |  SELECT upi.doc_id, upi.i + 1 AS rn, upi.m,
      |    CASE WHEN upi.rem = 0 OR upi.idx + 2 > upi.n THEN u1.s
      |      ELSE u1.s + CAST(floor((u2.s - u1.s) * upi.rem / 441.0)
      |        AS BIGINT) END AS s
      |  FROM upi JOIN u u1 ON u1.doc_id = upi.doc_id
      |    AND u1.rn = upi.idx + 1
      |  LEFT JOIN u u2 ON u2.doc_id = upi.doc_id
      |    AND u2.rn = upi.idx + 2),
      |-- canonicalize the 44.1 kHz copy back to 16 kHz (denominator
      |-- 160); the roundtrip is NOT the identity — that is the point
      |dm AS (SELECT DISTINCT doc_id, m, (m * 160) // 441 AS n2 FROM up),
      |dni AS (
      |  SELECT dm.doc_id, dm.m, dm.n2, CAST(i.i AS BIGINT) AS i,
      |    (CAST(i.i AS BIGINT) * 441) // 160 AS idx,
      |    (CAST(i.i AS BIGINT) * 441) % 160 AS rem
      |  FROM dm, unnest(range(0, dm.n2)) AS i(i)),
      |down AS (
      |  SELECT dni.doc_id + 100000 AS doc_id, dni.i + 1 AS rn,
      |    dni.n2 AS n,
      |    CASE WHEN dni.rem = 0 OR dni.idx + 2 > dni.m THEN p1.s
      |      ELSE p1.s + CAST(floor((p2.s - p1.s) * dni.rem / 160.0)
      |        AS BIGINT) END AS s
      |  FROM dni JOIN up p1 ON p1.doc_id = dni.doc_id
      |    AND p1.rn = dni.idx + 1
      |  LEFT JOIN up p2 ON p2.doc_id = dni.doc_id
      |    AND p2.rn = dni.idx + 2),
      |px AS (
      |  SELECT doc_id, rn, s, n FROM u
      |  UNION ALL
      |  SELECT doc_id, rn, s, n FROM down),
      |wnd AS (
      |  SELECT doc_id, CAST((rn - 1) // 128 AS INT) AS w,
      |    CAST(((rn - 1) % 128) // 8 AS INT) AS sw,
      |    CAST((rn - 1) % 8 AS INT) AS t, s
      |  FROM px WHERE rn <= (n // 128) * 128),
      |coefs AS (
      |  SELECT doc_id, w, sw, k.k,
      |    CAST(sum(CASE WHEN bit_count(k.k & t) % 2 = 0 THEN s
      |      ELSE -s END) AS BIGINT) AS c
      |  FROM wnd CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5),
      |    (6), (7)) AS k(k)
      |  GROUP BY 1, 2, 3, 4),
      |bits AS (
      |  SELECT a.doc_id, a.w, (a.sw * 4 + a.k) AS b
      |  FROM coefs a JOIN coefs b2 ON b2.doc_id = a.doc_id
      |    AND b2.w = a.w AND b2.sw = a.sw AND b2.k = a.k + 4
      |  WHERE a.k < 4 AND a.c * a.c > b2.c * b2.c),
      |hs AS (
      |  SELECT doc_id, w,
      |    CAST(sum(CASE WHEN b = 63 THEN -9223372036854775808
      |      ELSE CAST(1 AS BIGINT) << b END) AS BIGINT) AS h
      |  FROM bits GROUP BY 1, 2),
      |wd AS (SELECT DISTINCT doc_id, w FROM wnd),
      |fh AS (
      |  SELECT wd.doc_id, wd.w, CAST(coalesce(hs.h, 0) AS BIGINT) AS h
      |  FROM wd LEFT JOIN hs ON hs.doc_id = wd.doc_id AND hs.w = wd.w),
      |seqs AS (SELECT doc_id, list(h ORDER BY w) AS seq FROM fh
      |         GROUP BY 1),
      |arms(arm, k) AS (VALUES ('exact', 0), ('hamming10', 10)),
      |toks AS (SELECT DISTINCT doc_id, h FROM fh),
      |-- exact-arm candidates share a RAW 64-bit token; tolerant-arm
      |-- candidates share any 16-bit band of any window token (the
      |-- bands64 layout: arithmetic shift + mask equals the unsigned
      |-- shift's low 16 bits)
      |bandtoks AS (
      |  SELECT DISTINCT doc_id, b.b,
      |    (h >> (16 * b.b)) & 65535 AS bv
      |  FROM toks, (VALUES (0), (1), (2), (3)) AS b(b)),
      |cand AS (
      |  SELECT 'exact' AS arm, a.doc_id AS id1, b.doc_id AS id2
      |  FROM toks a JOIN toks b ON b.h = a.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3
      |  UNION ALL
      |  SELECT 'hamming10', a.doc_id, b.doc_id
      |  FROM bandtoks a JOIN bandtoks b ON b.b = a.b AND b.bv = a.bv
      |    AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT c.arm, ar.k, c.id1, c.id2, s1.seq AS c1, s2.seq AS c2
      |  FROM cand c JOIN arms ar ON ar.arm = c.arm
      |  JOIN seqs s1 ON s1.doc_id = c.id1
      |  JOIN seqs s2 ON s2.doc_id = c.id2),
      |step(arm, id1, id2, i, dp) AS (
      |  SELECT arm, id1, id2, 0,
      |    list_transform(range(0, len(c2) + 1), x -> 0)
      |  FROM pairs
      |  UNION ALL
      |  SELECT st.arm, st.id1, st.id2, st.i + 1,
      |    [0] || list_transform(range(1, len(p.c2) + 1), j ->
      |      greatest(st.dp[j + 1],
      |        list_max(list_transform(range(1, j + 1), j2 ->
      |          st.dp[j2] + CASE WHEN
      |            bit_count(xor(p.c1[st.i + 1], p.c2[j2])) <= p.k
      |            THEN 1 ELSE 0 END))))
      |  FROM step st JOIN pairs p ON p.arm = st.arm
      |    AND p.id1 = st.id1 AND p.id2 = st.id2
      |  WHERE st.i < len(p.c1)),
      |hits AS (
      |  SELECT p.arm, p.id1, p.id2
      |  FROM pairs p JOIN step f ON f.arm = p.arm AND f.id1 = p.id1
      |    AND f.id2 = p.id2 AND f.i = len(p.c1)
      |  WHERE CAST(2 * f.dp[len(p.c2) + 1] AS DOUBLE)
      |      / (len(p.c1) + len(p.c2)) >= 0.5)
      |SELECT a.arm, CAST(count(h.id1) AS BIGINT) AS n_pairs,
      |  CAST(coalesce(sum(CASE WHEN h.id2 = h.id1 + 100000 THEN 1
      |    ELSE 0 END), 0) AS BIGINT) AS n_planted_found
      |FROM arms a LEFT JOIN hits h ON h.arm = a.arm
      |GROUP BY a.arm ORDER BY a.arm""".stripMargin

  // -------------------------------------------------------------- q414
  /** EXIF orientation normalization pinned as data — the r10
    * next-round headline (a large share of real crawl photos are
    * STORED rotated with an APP1 orientation tag; without applying
    * it, a metadata-rotated copy decodes in stored orientation,
    * dHashes differently, and silently falls OUT of perceptual
    * near-dup): every q389 fixture image is re-encoded through the
    * real JPEG codec in ALL 8 Exif orientations — the stored plane is
    * the INVERSE flip/rotate of the upright pixels (dimensions swap
    * for 5–8), the stream carries a minimal CP-3451 APP1 block — and
    * decoded back through the orientation-applying decoder.
    * `upright_geom` pins that the decode un-swapped the geometry
    * (width back to 9 for every orientation) and `collides` pins
    * Hamming(dhash_png, dhash_oriented) ≤ 6, the near-dup join
    * threshold — i.e. a rotated-in-metadata copy of a crawl photo
    * lands back INSIDE perceptual dedup. JPEG is lossy, so the bound
    * is the q407/q410 contract, not equality; dhash_png is exact and
    * the oracle recomputes it from events. Malformed-APP1 strictness
    * (truncated TIFF, bad byte-order mark, wrong tag type,
    * out-of-range value → loud error; non-Exif APP1 → ignored) is
    * spec-pinned in JpegSpec, with an ImageIO cross-check that our
    * upright output equals the 8-case transform applied to ImageIO's
    * (orientation-ignoring) raw decode. */
  private def q414ExifOrientationCollision(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    val imgs = events9Images(s, dir)
    val png = Multimodal.pngDHashTable(Multimodal.encodePngTable(imgs))
      .toDF().select(col("doc_id"), col("dhash").as("dhash_png"))
    val tagged = imgs.flatMap { r =>
      val h = r.lumas.length / r.width
      (1 to 8).map { o =>
        val (stored, sw, _) = graft.operators.Jpeg.applyExifOrientation(
          r.lumas.toArray, r.width, h,
          graft.operators.Jpeg.inverseExifOrientation(o))
        Multimodal.WavRow(r.doc_id * 8L + (o - 1),
          graft.operators.Jpeg.encodeJpegGray(stored.toSeq, sw,
            exifOrientation = o))
      }
    }
    val dec = Multimodal.jpegDHashTable(tagged).toDF()
      .select(floor(col("doc_id") / 8).cast("long").as("doc_id"),
        (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("orientation"),
        (col("width") === 9).as("upright_geom"),
        col("dhash").as("__dhash_o"))
    png.join(dec, Seq("doc_id"))
      .select(col("doc_id"), col("orientation"), col("dhash_png"),
        col("upright_geom"),
        (bit_count(col("dhash_png").bitwiseXOR(col("__dhash_o")))
          <= 6).as("collides"))
      .orderBy(col("doc_id"), col("orientation"))
  }

  private val q414Sql =
    s"""WITH $dhashSqlCtes
       |SELECT a.doc_id, CAST(o.o AS INT) AS orientation,
       |  a.dhash AS dhash_png, TRUE AS upright_geom, TRUE AS collides
       |FROM allh a CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6),
       |  (7), (8)) AS o(o)
       |ORDER BY a.doc_id, o.o""".stripMargin

  // -------------------------------------------------------------- q413
  /** JPEG COLOR features — the q404 tolerance pattern on the RGB
    * decode path (decodeJpegRgb: per-component coefficient planes,
    * replication chroma upsampling, JFIF YCbCr→RGB matrix): each
    * 9-wide fixture image becomes a full 3-component 4:4:4 JPEG with
    * deterministic chroma planes synthesized from its luma
    * (cb = 64 + y/2, cr = 64 + (255−y)/2 — full-range, varying), and
    * the decoded R/G/B planes must sit within ±8 of the EXACT JFIF
    * conversion of the SOURCE planes per pixel (flat quant bounds
    * each decoded Y/Cb/Cr plane within ±2, the matrix propagates
    * that to < 7 per channel, measured max 5). Geometry columns are
    * oracle-exact; a bug in chroma storage, upsampling, or the
    * conversion matrix blows a channel's tolerance. Closes the
    * "multimodal features are gray-only for the dominant web format"
    * gap: JPEG blobs now yield real color statistics. */
  private def q413JpegColorFeatures(s: SparkSession, dir: String)
      : DataFrame = {
    import s.implicits._
    events9Images(s, dir)
      .map { r =>
        val w = r.width
        val n = r.lumas.length
        val cb = r.lumas.map(v => 64 + v / 2)
        val cr = r.lumas.map(v => 64 + (255 - v) / 2)
        val blob = graft.operators.Jpeg.encodeJpegYcc(r.lumas, cb, cr,
          w, subsample420 = false)
        val rgb = graft.operators.Jpeg.decodeJpegRgb(blob)
        def clamp(v: Long): Int = math.max(0, math.min(255, v.toInt))
        var maxR = 0; var maxG = 0; var maxB = 0
        var i = 0
        while (i < n) {
          val cbv = cb(i) - 128
          val crv = cr(i) - 128
          val exR = clamp(Math.round(r.lumas(i) + 1.402 * crv))
          val exG = clamp(Math.round(r.lumas(i) - 0.344136 * cbv -
            0.714136 * crv))
          val exB = clamp(Math.round(r.lumas(i) + 1.772 * cbv))
          maxR = math.max(maxR, math.abs(rgb.r(i) - exR))
          maxG = math.max(maxG, math.abs(rgb.g(i) - exG))
          maxB = math.max(maxB, math.abs(rgb.b(i) - exB))
          i += 1
        }
        (r.doc_id, w, n / w, n.toLong,
          maxR <= 8, maxG <= 8, maxB <= 8)
      }
      .toDF("doc_id", "width", "height", "n_pixels", "r_ok", "g_ok",
        "b_ok")
      .orderBy(col("doc_id"))
  }

  private val q413Sql =
    s"""WITH $dhashSqlCtes
       |SELECT doc_id, CAST(9 AS INT) AS width,
       |  CAST(count(*) // 9 AS INT) AS height,
       |  CAST(count(*) AS BIGINT) AS n_pixels,
       |  TRUE AS r_ok, TRUE AS g_ok, TRUE AS b_ok
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q404_jpeg_roundtrip" -> (q404JpegRoundtrip _),
    "q406_spectral_fingerprint" -> (q406SpectralFingerprint _),
    "q409_jpeg_progressive" -> (q409JpegProgressive _),
    "q410_jpeg_sa_collision" -> (q410JpegSaHashCollision _),
    "q411_audio_shift_dedup" -> (q411AudioShiftDedup _),
    "q415_hop_dial_trim" -> (q415HopDialTrim _),
    "q416_resample_dedup" -> (q416ResampleDedup _),
    "q418_audio_gauntlet" -> (q418AudioGauntlet _),
    "q420_tolerant_resample" -> (q420TolerantResample _),
    "q413_jpeg_color_features" -> (q413JpegColorFeatures _),
    "q414_exif_orientation" -> (q414ExifOrientationCollision _),
    "q407_jpeg_perceptual_collision" -> (q407JpegHashCollision _),
    "q403_codec_invariant_hash" -> (q403CodecInvariantHash _),
    "q397_incr_image_dedup" -> (q397IncrImageDedup _),
    "q399_gif_decode" -> (q399GifDecode _),
    "q400_image_resize" -> (q400ImageResize _),
    "q394_video_framehash_dedup" -> (q394VideoDedup _),
    "q390_audio_fingerprint_dedup" -> (q390AudioFingerprint _),
    "q389_image_dhash_dedup" -> (q389ImageDhashDedup _),
    "q377_mixed_media" -> (q377MixedMedia _),
    "q29_multimodal_features" -> (q29Features _),
    "q251_media_resize" -> (q251MediaResize _),
    "q323_media_frames" -> (q323MediaFrames _),
    "q367_wav_decode" -> (q367WavDecode _),
    "q368_bmp_decode" -> (q368BmpDecode _),
    "q373_png_decode" -> (q373PngDecode _))

  val oracles: Map[String, String] = Map(
    "q404_jpeg_roundtrip" -> q404Sql,
    "q406_spectral_fingerprint" -> q406Sql,
    "q409_jpeg_progressive" -> q409Sql,
    "q410_jpeg_sa_collision" -> q410Sql,
    "q411_audio_shift_dedup" -> q411Sql,
    "q415_hop_dial_trim" -> q415Sql,
    "q416_resample_dedup" -> q416Sql,
    "q418_audio_gauntlet" -> q418Sql,
    "q420_tolerant_resample" -> q420Sql,
    "q413_jpeg_color_features" -> q413Sql,
    "q414_exif_orientation" -> q414Sql,
    "q407_jpeg_perceptual_collision" -> q407Sql,
    "q403_codec_invariant_hash" -> q403Sql,
    "q397_incr_image_dedup" -> q397Sql,
    "q399_gif_decode" -> q399Sql,
    "q400_image_resize" -> q400Sql,
    "q394_video_framehash_dedup" -> q394Sql,
    "q390_audio_fingerprint_dedup" -> q390Sql,
    "q389_image_dhash_dedup" -> q389Sql,
    "q377_mixed_media" -> q377Sql,
    "q29_multimodal_features" -> q29Sql,
    "q251_media_resize" -> q251Sql,
    "q323_media_frames" -> q323Sql,
    "q367_wav_decode" -> q367Sql,
    "q368_bmp_decode" -> q368Sql,
    "q373_png_decode" -> q373Sql)
}
