package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

/** Streaming-pipeline coverage, oracle-checked in batch mode: the same
  * transforms run behind readStream (StreamingSpec proves that with
  * MemoryStream); batch execution makes them DuckDB-comparable. */
object QueriesStreaming {

  /** Write each frame as ONE parquet data file under `dir` with
    * strictly increasing mtimes — FileStreamSource consumes
    * pre-existing files in modification-time order, so this pins the
    * batch order deterministically. Stamping mtimes explicitly
    * replaces the former 200 ms-per-file spacing sleeps (a pure
    * fixed cost, ~1 s per lifecycle row) with zero waiting; stamps
    * are in the recent past so they can never tie or lead a later
    * write on any filesystem granularity. */
  private def writeOrderedFiles(frames: Seq[DataFrame], dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val stageRoot = java.nio.file.Files.createTempDirectory("graft_stage")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val t0 = System.currentTimeMillis() - (frames.size + 1) * 1000L
    // ONE write job for every frame (r13, guide §1.2): the previous
    // shape ran frames.size serial single-task coalesce(1) writes —
    // each a full plan execution plus a parquet commit, measured as
    // the dominant fixed cost of the streaming lifecycle rows. The
    // union is partitioned by the frame ordinal (explicit N so AQE
    // cannot fold two frames' rows into one task) and split back into
    // one dir per frame by partitionBy; all rows of a frame sit in
    // one task, so each dir holds exactly one part file, which then
    // moves to its mtime-stamped destination exactly as before.
    val stage = stageRoot.resolve("all")
    frames.zipWithIndex
      .map { case (f, i) => f.withColumn("__of", lit(i)) }
      .reduce(_ unionAll _)
      .repartition(frames.size, col("__of"))
      .write.mode("overwrite").partitionBy("__of").parquet(stage.toString)
    frames.indices.foreach { i =>
      val fdir = stage.resolve(s"__of=$i")
      // a zero-row frame produces no partition dir in the fused write;
      // keep the old per-frame path for that (rare) shape so the batch
      // STRUCTURE — one file per frame, empty or not — is unchanged
      if (!java.nio.file.Files.isDirectory(fdir))
        frames(i).coalesce(1).write.mode("overwrite")
          .parquet(fdir.toString)
      val listing = java.nio.file.Files.list(fdir)
      val part = try {
        listing.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(
            s"no part file written for ordered frame $i"))
      } finally listing.close()
      val dest = java.nio.file.Paths.get(dir, f"f$i%02d.parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L))
    }
    // the staging roots hold only _SUCCESS/.crc leftovers now the part
    // files moved out — sweep them so lifecycle rows don't accrete
    // temp directories across bench runs
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p)) {
        val ls = java.nio.file.Files.list(p)
        try ls.iterator().asScala.toList.foreach(rmTree)
        finally ls.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(stageRoot)
  }

  /** Run `body` with spark.sql.shuffle.partitions lowered to `n`,
    * restoring the session value after. The multi-trigger lifecycle
    * rows pay per-batch fixed costs proportional to the state/sink
    * partition count (measured as task-deser seconds in the bench
    * attrib map: 32 partitions × ~6 micro-batches = hundreds of tiny
    * tasks); their aggregates are exact (counts/cents/min/max/dedup),
    * so the partition count never reaches the gate hash. At real
    * scale the caller sizes this to data; the sf0.1 fixture's
    * micro-batches are KB-sized. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)
      (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  /** Await an AvailableNow run; on timeout STOP the query before
    * throwing — a zombie stream would keep executing micro-batches in
    * the shared session and skew every subsequent row's wall. */
  private def awaitOrStop(q: org.apache.spark.sql.streaming.StreamingQuery,
      what: String): Unit =
    if (!q.awaitTermination(180000L)) {
      q.stop()
      throw new IllegalStateException(s"$what timed out")
    }


  // --------------------------------------------------------------- q27
  /** Tumbling 1-hour windowed counts per event type. */
  private def q27Window(s: SparkSession, dir: String): DataFrame =
    EventPipeline.windowedTypeCounts(
        Tables.load(s, dir, "events"), streaming = false)
      .orderBy(col("window_start"), col("event_type"))

  private val q27Sql =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  event_type, count(*) AS n, sum(value) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // --------------------------------------------------------------- q28
  /** Gap-based (30 min) per-user sessions via session_window. */
  private def q28Sessions(s: SparkSession, dir: String): DataFrame =
    EventPipeline.sessions(Tables.load(s, dir, "events"), streaming = false)
      .orderBy(col("user_id"), col("session_start"))

  private val q28Sql =
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, sum(value) AS sum_value
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  // --------------------------------------------------------------- q43
  /** Stream-stream interval join in batch mode: view -> purchase
    * attribution within 30 minutes per user (StreamingSpec drives the
    * same transform through MemoryStream with watermarks on both
    * sides). */
  private def q43Attribution(s: SparkSession, dir: String): DataFrame =
    EventPipeline.attributionJoin(Tables.load(s, dir, "events"),
        "view", "purchase", streaming = false)
      .orderBy(col("target_id"), col("source_id"))

  private val q43Sql =
    """SELECT v.event_id AS source_id, p.event_id AS target_id,
      |  v.user_id, v.ts AS source_ts, p.ts AS target_ts, p.value
      |FROM events v JOIN events p
      |  ON p.user_id = v.user_id
      | AND v.event_type = 'view' AND p.event_type = 'purchase'
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL '30 minutes'
      |ORDER BY target_id, source_id""".stripMargin

  // -------------------------------------------------------------- q110
  /** Incremental aggregate maintenance driven by a REAL Structured
    * Streaming run (not batch mode): the q96 published rollup is
    * refreshed by a foreachBatch loop over a file-source delta stream —
    * pre-cutoff lineitem publishes the base table, the post-cutoff
    * delta lands as 4 parquet files consumed one per micro-batch
    * (maxFilesPerTrigger=1 + AvailableNow), and every batch merges its
    * partial aggregates into the published table via
    * IncrementalAgg.mergeDelta + an atomic overwrite. The production
    * 100 TB refresh shape: each trigger costs one DELTA scan plus an
    * aggregate-sized merge; the base fact rows are scanned once ever.
    * count/sum(decimal)/min/max merging is exact and batch-split
    * independent, so the final table equals the oracle's from-scratch
    * recompute bit for bit regardless of how files landed in
    * micro-batches. */
  private def q110StreamIncremental(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalAgg, ParquetTable}
    val work = java.nio.file.Files.createTempDirectory("graft_sinc")
    try {
    val pub = work.resolve("published").toString
    val deltaDir = work.resolve("delta").toString
    val ckpt = work.resolve("ckpt").toString
    val li = Tables.load(s, dir, "lineitem")
      .withColumn("qty", col("l_quantity").cast("decimal(18,2)"))
    val cutoff = lit("1998-01-01").cast("timestamp")
    ParquetTable.overwriteAtomic(
      li.filter(col("l_shipdate") < cutoff)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price")),
      pub)
    li.filter(col("l_shipdate") >= cutoff)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qty").as("sum_qty"), col("l_extendedprice").as("min_price"),
        col("l_extendedprice").as("max_price"))
      .repartition(4)
      .write.mode("overwrite").parquet(deltaDir)
    val schema = s.read.parquet(deltaDir).schema
    // exactly-once under micro-batch replay: the refresher skips batch
    // ids whose marker is already in the published table (markers
    // commit inside the same atomic dir swap as the data) — Spark's
    // foreachBatch is at-least-once, so an unguarded merge would
    // double-count the last batch after a crash-restart
    val refresh = IncrementalAgg.idempotentRefresher(s, pub,
      keys = Seq("l_returnflag", "l_linestatus"),
      counts = Seq("n_items"), sums = Seq("sum_qty"),
      mins = Seq("min_price"), maxs = Seq("max_price"))
    // only the micro-batch loop runs at reduced partitions (the
    // per-batch merges are aggregate-sized); the base publish above
    // keeps the session's full scan/agg parallelism
    withShufflePartitions(s, 4) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(deltaDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(refresh)
        .start()
      awaitOrStop(q, "incremental refresh stream")
    }
    // gate shape: the exact decimal sum leaves as BIGINT cents (r5
    // adjudication — the driver's hasher rejects decimal128 sums even
    // when bit-identical; q91/q140 keep the decimal-typed coverage).
    // localCheckpoint materializes the (6-row) result so the scratch
    // tree can be deleted before returning (the q419 hygiene: no
    // orphaned /tmp tree per invocation)
    ParquetTable.read(s, pub)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_items"),
        (col("sum_qty") * 100).cast("long").as("sum_qty_cents"),
        col("min_price"), col("max_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .localCheckpoint(true)
    } finally QueriesDedup.deleteRecursively(work)
  }

  private val q110Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)
      |    AS sum_qty_cents,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- q175
  /** Streaming exact dedup through a REAL micro-batched run
    * (EventPipeline.dedupedStream = dropDuplicatesWithinWatermark):
    * the whole event stream is planted in duplicate (each row twice
    * at the SAME event time — duplicates inside the watermark
    * horizon, which is the operator's contract: state expires at the
    * watermark, so only dups within the horizon dedup, exactly like
    * at-least-once replay dups in production) and arrives over four
    * TIME-ORDERED parquet files consumed one per trigger, so the
    * watermark only advances between batches and never drops a
    * legitimate first arrival. The gate output is payload-free
    * (per-bucket distinct-key census), so WHICH physical copy
    * survived — an arrival-order artifact — never reaches the hash.
    * Quarter files get explicitly stamped ascending mtimes because
    * FileStreamSource orders by modification time (a bulk write ties
    * arbitrarily — a later-quarter file consumed first would put
    * earlier quarters behind the watermark and drop them).
    * The 100 TB point: dedup state is bounded by the watermark
    * horizon, not stream history. */
  private def q175StreamDedup(s: SparkSession, dir: String): DataFrame =
    withShufflePartitions(s, 4) {
    import graft.streaming.EventPipeline
    val work = java.nio.file.Files.createTempDirectory("graft_sdd")
    try {
    val deltaDir = work.resolve("delta").toString
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val ev0 = Tables.load(s, dir, "events")
      .select(col("event_id").as("k"), col("ts"))
    val ev = ev0.unionAll(ev0)
    // boundaries INSIDE the fixture's span (events run through
    // January 2024 at every sf) so all four quarters are non-empty
    // and the multi-batch watermark advance actually exercises
    val bounds = Seq("2024-01-08", "2024-01-15", "2024-01-22")
      .map(b => lit(b).cast("timestamp"))
    writeOrderedFiles(Seq(
      ev.filter(col("ts") < bounds(0)),
      ev.filter(col("ts") >= bounds(0) && col("ts") < bounds(1)),
      ev.filter(col("ts") >= bounds(1) && col("ts") < bounds(2)),
      ev.filter(col("ts") >= bounds(2))), deltaDir)
    val schema = s.read.parquet(deltaDir).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
    val q = EventPipeline.dedupedStream(src, Seq("k"), "10 minutes")
      .select(col("k"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitOrStop(q, "streaming dedup")
    s.read.parquet(outDir)
      .groupBy((col("k") % 25).as("bucket"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("bucket"))
      .localCheckpoint(true) // materialize, then drop the scratch tree
    } finally QueriesDedup.deleteRecursively(work)
    }

  private val q175Sql =
    """SELECT event_id % 25 AS bucket, count(DISTINCT event_id) AS n_keys
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- q222
  /** Streaming CUSUM drift alarms (EventPipeline.cusumAlarms, k=7000¢
    * slack, h=30000¢ bar) through a REAL four-trigger run: per-user
    * GroupState carries the CUSUM level across micro-batches (state is
    * one long per user — |users|-bounded, not history-bounded), each
    * alarm emits exactly once in Append mode, and the time-ordered
    * quarter files guarantee the cross-batch in-order contract. The
    * oracle replays the identical integer recurrence in batch via the
    * q207 reflection closed form — streaming state carry and batch
    * windows must land on the same alarm set. */
  private def q222StreamCusum(s: SparkSession, dir: String): DataFrame =
    withShufflePartitions(s, 4) {
    import graft.streaming.EventPipeline
    val work = java.nio.file.Files.createTempDirectory("graft_scu")
    try {
    val deltaDir = work.resolve("delta").toString
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val ev0 = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val bounds = Seq("2024-01-08", "2024-01-15", "2024-01-22")
      .map(b => lit(b).cast("timestamp"))
    writeOrderedFiles(Seq(
      ev0.filter(col("ts") < bounds(0)),
      ev0.filter(col("ts") >= bounds(0) && col("ts") < bounds(1)),
      ev0.filter(col("ts") >= bounds(1) && col("ts") < bounds(2)),
      ev0.filter(col("ts") >= bounds(2))), deltaDir)
    val schema = s.read.parquet(deltaDir).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
    import s.implicits._
    val alarms = EventPipeline.cusumAlarms(
      src.as[EventPipeline.Ev], k = 7000L, h = 30000L)
    val q = alarms.toDF()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitOrStop(q, "streaming cusum")
    s.read.parquet(outDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_alarms"),
        min(col("event_id")).as("first_eid"),
        max(col("event_id")).as("last_eid"))
      .orderBy(col("user_id"))
      .localCheckpoint(true) // materialize, then drop the scratch tree
    } finally QueriesDedup.deleteRecursively(work)
    }

  private val q222Sql =
    """WITH b AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) - 7000
      |      AS d
      |  FROM events WHERE value IS NOT NULL),
      |y AS (
      |  SELECT user_id, us, event_id, d,
      |    sum(d) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS y
      |  FROM b),
      |sc AS (
      |  SELECT user_id, event_id,
      |    y - least(0, min(y) OVER (PARTITION BY user_id
      |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)) AS s
      |  FROM y)
      |SELECT user_id, count(*) AS n_alarms,
      |  min(event_id) AS first_eid, max(event_id) AS last_eid
      |FROM sc WHERE s > 30000
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- q194
  /** Stream-static enrichment (EventPipeline.enrichedDailyTotals), as
    * a REAL multi-trigger run: four mtime-ordered quarter files feed
    * a file stream that broadcast-joins the static customer dimension
    * (key = user_id mod |customer| + 1) and aggregates watermarked
    * per-(day, mktsegment) counts + exact cents. Two far-future
    * sentinel files flush the watermark — the first advances it past
    * January, the second's batch emits the finalized windows (append
    * mode only emits below-watermark windows on a LATER batch);
    * neither sentinel window can itself finalize and both fall to the
    * < Feb filter. Oracle = the same join/agg in batch over the raw
    * events. */
  private def q194StreamEnrich(s: SparkSession, dir: String): DataFrame =
    withShufflePartitions(s, 4) {
    import graft.streaming.EventPipeline
    val work = java.nio.file.Files.createTempDirectory("graft_sse")
    try {
    val deltaDir = work.resolve("delta").toString
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val bounds = Seq("2024-01-08", "2024-01-15", "2024-01-22")
      .map(b => lit(b).cast("timestamp"))
    def sentinel(d: String): DataFrame =
      s.range(1).select(lit(-1L).as("event_id"),
        lit(d).cast("timestamp").as("ts"), lit(0L).as("user_id"),
        lit(0.0).as("value"))
    writeOrderedFiles(Seq(
      ev.filter(col("ts") < bounds(0)),
      ev.filter(col("ts") >= bounds(0) && col("ts") < bounds(1)),
      ev.filter(col("ts") >= bounds(1) && col("ts") < bounds(2)),
      ev.filter(col("ts") >= bounds(2)),
      sentinel("2024-02-15"), sentinel("2024-03-01")), deltaDir)
    val cust = Tables.load(s, dir, "customer")
    val n = cust.count()
    val schema = s.read.parquet(deltaDir).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(deltaDir)
    val q = EventPipeline.enrichedDailyTotals(src, cust,
        pmod(col("user_id"), lit(n)) + 1, "c_custkey", "c_mktsegment")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    awaitOrStop(q, "streaming enrichment")
    s.read.parquet(outDir)
      .filter(col("window_start") < lit("2024-02-01").cast("timestamp"))
      .orderBy(col("window_start"), col("c_mktsegment"))
      .localCheckpoint(true) // materialize, then drop the scratch tree
    } finally QueriesDedup.deleteRecursively(work)
    }

  private val q194Sql =
    """WITH nn AS (SELECT count(*) AS n FROM customer),
      |e AS (
      |  SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
      |    user_id,
      |    CAST(CAST(round(value, 2) AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      AS cents
      |  FROM events),
      |j AS (
      |  SELECT e.window_start, c.c_mktsegment, e.cents
      |  FROM e CROSS JOIN nn
      |  JOIN customer c ON c.c_custkey = (e.user_id % nn.n) + 1)
      |SELECT window_start, c_mktsegment, count(*) AS n,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- export

  // -------------------------------------------------------------- q402
  /** STREAMING perceptual dedup — q397's incremental band index
    * driven by a REAL Structured Streaming run (the q110 lifecycle):
    * the dHash fixture lands as three mtime-ordered parquet files
    * (one per doc_id-mod-3 batch), a file-source stream replays them
    * one micro-batch each under AvailableNow, and foreachBatch runs
    * IncrementalPerceptualDedup.acceptBatch against the growing
    * index, staging each micro-batch's flags idempotently (the
    * at-least-once guard: a replayed batch republishes over its own
    * tag instead of double-appending). The collected flag table must
    * equal q397's — the SAME declarative oracle gates both, so the
    * streaming harness can add or lose nothing. */
  private def q402StreamPerceptual(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalPerceptualDedup, ParquetTable}
    val work = java.nio.file.Files.createTempDirectory("graft_sperc")
    try {
    val deltaDir = work.resolve("delta").toString
    val ckpt = work.resolve("ckpt").toString
    val idx = work.resolve("index").toString
    val out = work.resolve("flags").toString
    val hashes = QueriesMultimodal.dhashFixture(s, dir)
      .withColumn("__batch", pmod(col("doc_id"), lit(3)).cast("int"))
      .localCheckpoint(true)
    writeOrderedFiles((0 until 3).map(b =>
      hashes.filter(col("__batch") === b)
        .select(col("doc_id"), col("dhash"))), deltaDir)
    val schema = s.read.parquet(deltaDir).schema
    withShufflePartitions(s, 4) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(deltaDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              batchId: Long) =>
            // MID-STREAM compaction before the last micro-batch (the
            // q397 discipline inside a running query): the file
            // rewrite must be invisible to the flags — the oracle
            // knows nothing about files, so any tag-exclusion or
            // row-loss slip under streaming shifts a verdict and
            // fails the row
            if (batchId == 2)
              IncrementalPerceptualDedup.compactIndex(s, idx)
            val flags = IncrementalPerceptualDedup.acceptBatch(
              df.toDF(), "doc_id", "dhash", idx, s"day$batchId",
              maxHamming = 6)
            ParquetTable.appendStaged(flags, out, s"day$batchId")
            ()
        }
        .start()
      awaitOrStop(q, "streaming perceptual dedup")
    }
    ParquetTable.read(s, out).orderBy(col("doc_id"))
      .localCheckpoint(true) // materialize, then drop the scratch tree
    } finally QueriesDedup.deleteRecursively(work)
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q402_stream_perceptual" -> (q402StreamPerceptual _),
    "q194_stream_enrich" -> (q194StreamEnrich _),
    "q222_stream_cusum" -> (q222StreamCusum _),
    "q27_stream_window" -> (q27Window _),
    "q28_stream_sessions" -> (q28Sessions _),
    "q43_stream_attribution" -> (q43Attribution _),
    "q110_stream_incremental" -> (q110StreamIncremental _),
    "q175_stream_dedup" -> (q175StreamDedup _),
  )

  val oracles: Map[String, String] = Map(
    "q402_stream_perceptual" -> QueriesMultimodal.q397Sql,
    "q194_stream_enrich" -> q194Sql,
    "q222_stream_cusum" -> q222Sql,
    "q27_stream_window" -> q27Sql,
    "q175_stream_dedup" -> q175Sql,
    "q28_stream_sessions" -> q28Sql,
    "q43_stream_attribution" -> q43Sql,
    "q110_stream_incremental" -> q110Sql,
  )
}
