package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Ev

/** Streaming behavior: the batch-oracle-checked transforms (q27/q28)
  * driven as real streams with MemoryStream — micro-batch progression,
  * watermark-based finalization, custom-state sessionization. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, typ: String,
      v: Double): Ev = Ev(id, ts(t), user, typ, v)

  test("windowed counts accumulate across micro-batches (update mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = EventPipeline.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:20:00", 2, "click", 2.0),
        ev(3, "2024-01-01 11:05:00", 1, "view", 3.0))
      query.processAllAvailable()
      stream.addData(ev(4, "2024-01-01 10:40:00", 3, "click", 4.0))
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT window_start, event_type, n FROM win_counts
          |WHERE event_type = 'click'
          |ORDER BY window_start, n""".stripMargin).collect()
      // update mode re-emits the 10:00 click window: first 2, then 3
      rows.map(_.getLong(2)).toSeq shouldBe Seq(2, 3)
    } finally query.stop()
  }

  test("stream-static enrichment joins dimension and sums exact cents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "HOME")).toDF("k", "seg")
    val stream = MemoryStream[Ev]
    val query = EventPipeline.enrichedDailyTotals(stream.toDF(), dim,
        pmod(col("user_id"), lit(2)) + 1, "k", "seg")
      .writeStream.format("memory").queryName("enrich_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(
        ev(1, "2024-01-01 10:00:00", 2, "click", 1.10), // u2 -> k1 AUTO
        ev(2, "2024-01-01 11:00:00", 4, "click", 2.25), // u4 -> k1 AUTO
        ev(3, "2024-01-01 12:00:00", 3, "click", 5.00)) // u3 -> k2 HOME
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT seg, n, sum_cents FROM enrich_totals ORDER BY seg""")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rows.toSeq shouldBe Seq(("AUTO", 2L, 335L), ("HOME", 1L, 500L))
    } finally query.stop()
  }

  test("streaming dedup emits each key once within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = EventPipeline.dedupedStream(stream.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:00:30", 1, "click", 1.0), // dup in batch
        ev(2, "2024-01-01 10:01:00", 2, "view", 2.0))
      query.processAllAvailable()
      stream.addData(
        ev(2, "2024-01-01 10:02:00", 2, "view", 2.0), // dup across batches
        ev(3, "2024-01-01 10:03:00", 3, "click", 3.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_stream").collect()
        .map(_.getLong(0)).sorted.toSeq
      ids shouldBe Seq(1L, 2L, 3L)
    } finally query.stop()
  }

  test("watermark drops data later than the delay (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = EventPipeline.windowedTypeCounts(stream.toDF(),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("wm_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(ev(1, "2024-01-01 10:05:00", 1, "click", 1.0))
      query.processAllAvailable()
      // advance event time far: watermark passes 10:00-11:00 window end
      stream.addData(ev(2, "2024-01-01 13:00:00", 1, "click", 1.0))
      query.processAllAvailable()
      // this event is 3h late, behind the watermark -> dropped
      stream.addData(ev(3, "2024-01-01 10:06:00", 2, "click", 9.0))
      query.processAllAvailable()
      val finalized = spark.sql(
        "SELECT n FROM wm_counts WHERE window_start = TIMESTAMP '2024-01-01 10:00:00'")
        .collect()
      finalized.map(_.getLong(0)).toSeq shouldBe Seq(1) // late row excluded
    } finally query.stop()
  }

  test("stream-stream interval join matches batch and bounds state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
      ev(2, "2024-01-01 10:20:00", 1, "purchase", 9.99), // joins with 1
      ev(3, "2024-01-01 09:00:00", 1, "view", 0.0), // >30min before 2
      ev(4, "2024-01-01 10:10:00", 2, "view", 0.0),
      ev(5, "2024-01-01 11:10:00", 2, "purchase", 5.0), // no view in window
      ev(6, "2024-01-01 11:05:00", 2, "view", 0.0)) // joins with 5
    val stream = MemoryStream[Ev]
    val query = EventPipeline.attributionJoin(stream.toDF(),
        "view", "purchase")
      .writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(data.take(4): _*)
      query.processAllAvailable()
      stream.addData(data.drop(4): _*)
      // advance the watermark so pending join results finalize
      stream.addData(ev(99, "2024-01-01 15:00:00", 9, "view", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("attr_join")
        .select("source_id", "target_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = EventPipeline.attributionJoin(data.toDF(),
          "view", "purchase", streaming = false)
        .select("source_id", "target_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      streamed shouldBe batch
      streamed shouldBe Seq((1L, 2L), (6L, 5L))
    } finally query.stop()
  }

  test("outer stream-stream join emits unmatched sources as nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view", 0.0), // joins with 2
      ev(2, "2024-01-01 10:20:00", 1, "purchase", 9.99),
      ev(3, "2024-01-01 09:00:00", 1, "view", 0.0), // >30min -> NULL row
      ev(4, "2024-01-01 10:10:00", 2, "view", 0.0)) // no purchase -> NULL
    val stream = MemoryStream[Ev]
    val query = EventPipeline.attributionJoinOuter(stream.toDF(),
        "view", "purchase")
      .writeStream.format("memory").queryName("attr_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(data: _*)
      query.processAllAvailable()
      // null-extended rows finalize only once the watermark proves the
      // window empty. The GLOBAL watermark is the MIN across the two
      // filtered inputs, so BOTH event types need late advancers — a
      // view-only advancer leaves the purchase side's watermark (and
      // with it the null emission) stuck at the last real purchase.
      stream.addData(
        ev(99, "2024-01-01 15:00:00", 9, "view", 0.0),
        ev(101, "2024-01-01 15:00:00", 9, "purchase", 0.0))
      query.processAllAvailable()
      stream.addData(
        ev(100, "2024-01-01 20:00:00", 9, "view", 0.0),
        ev(102, "2024-01-01 20:00:00", 9, "purchase", 0.0))
      query.processAllAvailable()
      def render(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
      val streamed = render(spark.table("attr_outer")
        .filter(col("user_id") =!= 9) // watermark-advancer rows
        .select("source_id", "target_id").collect())
      val batch = render(EventPipeline.attributionJoinOuter(data.toDF(),
          "view", "purchase", streaming = false)
        .select("source_id", "target_id").collect())
      streamed shouldBe batch
      streamed shouldBe Seq((1L, 2L), (3L, -1L), (4L, -1L))
    } finally query.stop()
  }

  test("session_window and flatMapGroupsWithState agree in batch") {
    import spark.implicits._
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "view", 2.0),
      ev(3, "2024-01-01 11:30:00", 1, "click", 3.0), // 80 min gap -> new
      ev(4, "2024-01-01 10:00:00", 2, "click", 4.0)).toDS()
    val viaWindow = EventPipeline.sessions(events.toDF(), streaming = false)
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
    val viaState = EventPipeline.sessionizeWithState(events, 30 * 60 * 1000L)
      .orderBy("user_id", "session_start").collect()
      .map(s => (s.user_id, s.session_start, s.n_events))
    viaWindow.toSeq shouldBe viaState.toSeq
    viaWindow.length shouldBe 3
    viaWindow(0)._3 shouldBe 2 // user1 first session has 2 events
  }

  test("checkpoint resume: restart continues state without reprocessing") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_ckpt_in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
    Seq(ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:20:00", 2, "click", 2.0)).toDF()
      .write.parquet(in.resolve("p1").toString)

    // memory sink can't recover from a checkpoint; foreachBatch can —
    // append each micro-batch's updated rows to a parquet log
    val outDir = java.nio.file.Files.createTempDirectory("graft_ckpt_out")
    def start() =
      EventPipeline.windowedTypeCounts(
          EventPipeline.fromStream(spark, in.toString + "/*"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir.toString)
        }
        .option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Update()).start()

    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    spark.read.parquet(outDir.toString)
      .filter(col("event_type") === "click")
      .agg(max(col("n"))).head().getLong(0) shouldBe 2

    // new data arrives while the query is down (same 10:00 window)
    Seq(ev(3, "2024-01-01 10:40:00", 3, "click", 3.0)).toDF()
      .write.parquet(in.resolve("p2").toString)

    val q2 = start()
    try {
      q2.processAllAvailable()
      // state restored from checkpoint: window count includes pre-restart
      // events (2) plus the new one
      spark.read.parquet(outDir.toString)
        .filter(col("event_type") === "click")
        .agg(max(col("n"))).head().getLong(0) shouldBe 3
      // and only the NEW file was read after restart (no reprocessing)
      q2.recentProgress.map(_.numInputRows).sum shouldBe 1
    } finally q2.stop()
  }

  test("streaming CSV ingest: files process exactly once across restarts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csvstream")
    val table = dir.resolve("table").toString
    val ckpt = dir.resolve("ckpt").toString
    val cfg = graft.sources.IngestConfig(tableName = "s",
      delimiter = "|", xColumn = "lon", yColumn = "lat")
    java.nio.file.Files.write(dir.resolve("a.csv"),
      "Name|lon|lat|amount\nalpha|1.5|2.5|10\nbeta|3.5|4.5|20\n".getBytes)

    val q1 = graft.streaming.CsvStreamIngest.runAvailableNow(
      spark, dir.toString + "/*.csv", table, ckpt, cfg)
    q1.awaitTermination()
    val first = spark.read.parquet(table)
    first.count() shouldBe 2
    // typed projection applied: amount voted numeric, geometry first
    first.columns.head shouldBe "the_geom"
    first.schema("amount").dataType.typeName shouldBe "double"

    // a new file lands while the query is down; restart ingests ONLY it
    java.nio.file.Files.write(dir.resolve("b.csv"),
      "Name|lon|lat|amount\ngamma|5.5|6.5|30\n".getBytes)
    val q2 = graft.streaming.CsvStreamIngest.runAvailableNow(
      spark, dir.toString + "/*.csv", table, ckpt, cfg)
    q2.awaitTermination()
    val all = spark.read.parquet(table)
    all.count() shouldBe 3 // exactly once: 2 + 1, no reprocessing
    all.filter(col("name") === "gamma").count() shouldBe 1
  }

  test("file-source streaming ingest of the events table shape") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    val batch = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:40:00", 2, "view", 2.0)).toDF()
    batch.write.parquet(dir.resolve("part1").toString)
    val stream = EventPipeline.fromStream(spark, dir.toString + "/*")
    stream.isStreaming shouldBe true
    val query = EventPipeline.windowedTypeCounts(stream)
      .writeStream.format("memory").queryName("file_counts")
      .outputMode(OutputMode.Update()).start()
    try {
      query.processAllAvailable()
      spark.table("file_counts").count() shouldBe 2
    } finally query.stop()
  }

  test("transformWithState keeps named per-key state across micro-batches") {
    import spark.implicits._
    import graft.streaming.StatefulTotals
    import graft.streaming.StatefulTotals.UserEvent
    implicit val sqlCtx = spark.sqlContext
    // transformWithState's named state variables are state-store column
    // families — RocksDB-provider-only (the HDFS-backed default store
    // cannot host them). Scope the provider to this query's lifetime.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[UserEvent]
    val query = StatefulTotals.runningTotals(stream.toDS())
      .toDF()
      .writeStream.format("memory").queryName("running_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: user 1 twice, user 2 once
      stream.addData(UserEvent(1L, 10.0), UserEvent(1L, 5.0),
        UserEvent(2L, 7.0))
      query.processAllAvailable()
      // batch 2: user 1 again — its count/total must CONTINUE, not reset
      stream.addData(UserEvent(1L, 1.0))
      query.processAllAvailable()
      val rows = spark.table("running_totals")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // update mode appends one row per touched key per batch
      rows.toSet shouldBe Set((1L, 2L, 15.0), (2L, 1L, 7.0), (1L, 3L, 16.0))
      // the latest row per key carries the full running state
      val latest = rows.groupBy(_._1).view.mapValues(_.last).toMap
      latest(1L) shouldBe ((1L, 3L, 16.0))
    } finally {
      query.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("cusumAlarms carries state across micro-batches exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // k=10, h=25: values 30,20 push s to 20 then 30 (alarm at ev 2);
    // batch 2 continues from s=30: +5 -> 25 (no), +30 -> 45 (alarm)
    val stream = MemoryStream[Ev]
    val query = EventPipeline.cusumAlarms(stream.toDS(), k = 10L,
        h = 25L)
      .writeStream.format("memory").queryName("cusum_alarms")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        ev(1, "2024-01-01 10:00:00", 1, "x", 0.30),
        ev(2, "2024-01-01 10:01:00", 1, "x", 0.20))
      query.processAllAvailable()
      stream.addData(
        ev(3, "2024-01-01 10:02:00", 1, "x", 0.05),
        ev(4, "2024-01-01 10:03:00", 1, "x", 0.30))
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_id FROM cusum_alarms ORDER BY event_id")
        .as[Long].collect().toSeq
      rows shouldBe Seq(2L, 4L)
    } finally query.stop()
  }

  test("cusumAlarms batch mode equals TimeSeries.cusum alarm counts") {
    import spark.implicits._
    import graft.operators.TimeSeries
    val evs = (1 to 300).map { i =>
      ev(i.toLong, f"2024-01-01 ${10 + i / 60}%02d:${i % 60}%02d:00",
        i % 5, "x", (i * 37 % 100) / 100.0 * 3)
    }
    val ds = evs.toDS()
    val streamed = EventPipeline.cusumAlarms(ds, k = 100L, h = 150L)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val batch = TimeSeries.cusum(
        ds.toDF().select(col("user_id"), col("ts"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents")),
        Seq("user_id"), Seq(unix_micros(col("ts")), col("event_id")),
        col("cents"), k = 100L, h = 150L)
      .select("user_id", "n_alarms").as[(Long, Long)].collect().toMap
    streamed shouldBe batch.filter(_._2 > 0)
  }
}
