package graft

import org.apache.spark.sql.functions._
import graft.operators.{BatchGeocodeConfig, BatchGeocodeJob, Geocoding,
  LookupTableGeocoder}

/** Lookup-table geocoder unit behavior (the oracle covers q10
  * end-to-end; this pins the operator-level contracts), plus the HTTP
  * batch-job lifecycle driven against a loopback server. */
class GeocodingSpec extends SparkSpec {
  import spark.implicits._

  private def lookup = Seq(
    ("Dublin", -6.26, 53.35),
    ("  MADRID ", -3.70, 40.42)).toDF("address", "lon", "lat")

  private def input = Seq(
    (1, "dublin"), (2, "Madrid"), (3, "atlantis"), (4, ""), (5, null))
    .toDF("id", "addr")

  test("address matching is case and whitespace insensitive") {
    val out = new LookupTableGeocoder(lookup).geocode(input, "addr")
      .orderBy("id").collect()
    out(0).getAs[Double]("geo_lon") shouldBe -6.26
    out(1).getAs[Double]("geo_lat") shouldBe 40.42
    out(2).isNullAt(out(2).fieldIndex("geo_lon")) shouldBe true
  }

  test("three-way routing: found / not_found / invalid") {
    val routed = Geocoding.routed(new LookupTableGeocoder(lookup),
      input, "addr").orderBy("id").collect()
    routed.map(_.getAs[String]("status")).toSeq shouldBe
      Seq("found", "found", "not_found", "invalid", "invalid")
  }

  test("non-broadcast dim path produces identical results") {
    val b = Geocoding.routed(new LookupTableGeocoder(lookup, broadcastDim = true),
      input, "addr").orderBy("id").collect()
    val s = Geocoding.routed(new LookupTableGeocoder(lookup, broadcastDim = false),
      input, "addr").orderBy("id").collect()
    b.map(_.toString).toSeq shouldBe s.map(_.toString).toSeq
  }

  test("duplicate addresses in the lookup keep one deterministic entry") {
    val dup = lookup.unionAll(Seq(("dublin", 0.0, 0.0)).toDF("address", "lon", "lat"))
    val out = new LookupTableGeocoder(dup).geocode(input.filter(col("id") === 1), "addr")
      .collect()
    out.length shouldBe 1 // no fan-out from the duplicate key
  }

  // ------------------------------------ HTTP batch lifecycle (loopback)

  /** In-memory zip builder for the fake server's result payload. */
  private def zip(members: (String, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(out)
    members.foreach { case (name, text) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(text.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    out.toByteArray
  }

  private def readZipMembers(path: java.nio.file.Path): Map[String, String] = {
    val zis = new java.util.zip.ZipInputStream(
      java.nio.file.Files.newInputStream(path))
    val members = Iterator.continually(zis.getNextEntry)
      .takeWhile(_ != null)
      .map { e =>
        val buf = new java.io.ByteArrayOutputStream()
        val b = new Array[Byte](8192)
        var n = zis.read(b)
        while (n >= 0) { buf.write(b, 0, n); n = zis.read(b) }
        e.getName -> new String(buf.toByteArray, "UTF-8")
      }.toMap
    zis.close()
    members
  }

  test("batch job lifecycle: submit, poll to completed, download, re-ingest") {
    val readme = "raw member copied verbatim\nno rewriting here"
    val resultZip = zip(
      "req-42_out.txt" ->
        ("recId|displayLatitude|displayLongitude|SeqNumber\n" +
          "1|53.35|-6.26|0\n2|40.42|-3.70|1\n"),
      "req-42_err.txt" -> "recId|searchText\n3|atlantis\n",
      "README.md" -> readme)

    var submittedQuery: String = null
    var submittedBody: Array[Byte] = null
    var statusPolls = 0
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jobs/", { exchange =>
      val path = exchange.getRequestURI.getPath
      val query = Option(exchange.getRequestURI.getQuery).getOrElse("")
      def respond(code: Int, body: Array[Byte]): Unit = {
        exchange.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) exchange.getResponseBody.write(body)
        exchange.close()
      }
      if (exchange.getRequestMethod == "POST" && path == "/jobs/") {
        submittedQuery = query
        submittedBody = exchange.getRequestBody.readAllBytes()
        respond(200, ("<Response><MetaInfo><RequestId>req-42</RequestId>" +
          "</MetaInfo><Status>accepted</Status></Response>").getBytes("UTF-8"))
      } else if (path == "/jobs/req-42" && query.contains("action=status")) {
        statusPolls += 1
        val s = if (statusPolls < 2) "running" else "completed"
        respond(200, (s"<Response><Status>$s</Status></Response>")
          .getBytes("UTF-8"))
      } else if (path == "/jobs/req-42/all") {
        respond(200, resultZip)
      } else respond(404, Array.emptyByteArray)
    })
    server.setExecutor(null)
    server.start()
    try {
      val cfg = BatchGeocodeConfig(
        baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/jobs/",
        appId = "app", appCode = "code", pollIntervalMs = 5L)
      val csv = "recId|searchText|country\n1|Dublin|IE\n2|Madrid|ES\n3|atlantis|XX\n"
      val job = new BatchGeocodeJob(cfg).submit(csv.getBytes("UTF-8"))

      job.requestId shouldBe Some("req-42")
      job.status shouldBe Some("accepted")
      // the reference's run parameters all travel in the query string
      submittedQuery should include ("action=run")
      submittedQuery should include ("gen=9")
      // URI.getQuery hands the handler the DECODED string
      submittedQuery should include ("outcols=recId,displayLatitude,displayLongitude")
      submittedQuery should include ("app_id=app")
      new String(submittedBody, "UTF-8") shouldBe csv

      job.awaitCompletion().status shouldBe Some("completed")
      statusPolls should be >= 2

      val dir = java.nio.file.Files.createTempDirectory("graft_geo")
      val saved = job.download(dir).get
      saved.getFileName.toString shouldBe "req-42sss.zip"
      val members = readZipMembers(saved)
      members.keySet shouldBe Set("req-42_out.txt", "req-42_err.txt", "README.md")
      // _out: HERE's SeqNumber column cleaned away, header = outcols
      members("req-42_out.txt") shouldBe
        "recId|displayLatitude|displayLongitude\n1|53.35|-6.26\n2|40.42|-3.70\n"
      // _err: columns the member lacks fill with "" (reference __get_row__)
      members("req-42_err.txt") shouldBe
        "recId|displayLatitude|displayLongitude\n3||\n"
      // non-result members copy verbatim
      members("README.md") shouldBe readme

      // the rewritten zip round-trips through the existing zip CSV source
      val ingested = graft.sources.ZipSource.readZipCsv(spark, dir.toString,
        "_out.txt", graft.sources.IngestConfig("geo", delimiter = "|"),
        outputColumns = Seq("recId", "displayLatitude", "displayLongitude"))
      ingested.columns.toSeq shouldBe Seq("recid", "displaylatitude", "displaylongitude")
      ingested.count() shouldBe 2
      ingested.orderBy("recid").collect().map(_.getString(1)).toSeq shouldBe
        Seq("53.35", "40.42")
    } finally server.stop(0)
  }

  test("result-zip CSV fitting honors quoted newlines and delimiters") {
    import graft.operators.BatchGeocodeJob
    // an embedded newline inside a quoted field is ONE record
    val text = "recId|displayLatitude|note\n1|53.3|\"Main St\nApt 4\"\n2|40.4|plain\n"
    val fitted = BatchGeocodeJob.fitCsv(text, Seq("recId", "note"), '|')
    fitted shouldBe "recId|note\n1|\"Main St\nApt 4\"\n2|plain\n"
    // doubled quotes stay escaped through parse + re-render
    val quoted = BatchGeocodeJob.fitCsv(
      "recId|note\n1|\"say \"\"hi\"\"|ok\"\n", Seq("note"), '|')
    quoted shouldBe "note\n\"say \"\"hi\"\"|ok\"\n"
  }

  test("batch job download raises on a non-404 error instead of writing an empty zip") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jobs/", { exchange =>
      val body = "<html>bad gateway</html>".getBytes("UTF-8")
      exchange.sendResponseHeaders(502, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.setExecutor(null)
    server.start()
    try {
      val cfg = BatchGeocodeConfig(
        baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/jobs/",
        appId = "app", appCode = "code")
      val job = new BatchGeocodeJob(cfg)
      job.requestId = Some("req-42")
      val err = intercept[java.io.IOException] {
        job.download(java.nio.file.Files.createTempDirectory("graft_geo502"))
      }
      err.getMessage should include ("HTTP 502")
      err.getMessage should include ("bad gateway")
    } finally server.stop(0)
  }

  test("status poll raises on a non-200 response with the error body") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jobs/", { exchange =>
      val body = "<html>service melting</html>".getBytes("UTF-8")
      exchange.sendResponseHeaders(500, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.setExecutor(null)
    server.start()
    try {
      val cfg = BatchGeocodeConfig(
        baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/jobs/",
        appId = "app", appCode = "code")
      val job = new BatchGeocodeJob(cfg)
      job.requestId = Some("req-42")
      val err = intercept[java.io.IOException] { job.refresh() }
      err.getMessage should include ("HTTP 500")
      err.getMessage should include ("status poll")
      err.getMessage should include ("service melting")
    } finally server.stop(0)
  }

  test("download raises on a 200 body that is not a zip archive") {
    // a proxy can hand back 200 + HTML; ZipInputStream yields zero
    // entries on it — that must raise, never save an empty result zip
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jobs/", { exchange =>
      val body = "<html>interstitial login page</html>".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.setExecutor(null)
    server.start()
    try {
      val cfg = BatchGeocodeConfig(
        baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/jobs/",
        appId = "app", appCode = "code")
      val job = new BatchGeocodeJob(cfg)
      job.requestId = Some("req-42")
      val dir = java.nio.file.Files.createTempDirectory("graft_geo_badzip")
      val err = intercept[java.io.IOException] { job.download(dir) }
      err.getMessage should include ("not a zip")
      // nothing was saved
      java.nio.file.Files.list(dir).count() shouldBe 0
    } finally server.stop(0)
  }

  test("download raises on a zip with a corrupt member stream") {
    // flip a byte inside the first member's deflate data: the streaming
    // read must surface ZipException (bad stream or CRC), not emit a
    // partial member as a clean result
    val good = zip("req-42_out.txt" ->
      "recId|displayLatitude|displayLongitude\n1|53.35|-6.26\n2|40.42|-3.70\n")
    val corrupt = good.clone()
    val nameLen = "req-42_out.txt".length
    corrupt(30 + nameLen + 4) = (corrupt(30 + nameLen + 4) ^ 0xFF).toByte
    intercept[java.io.IOException] {
      graft.operators.BatchGeocodeJob.rewriteResultZip(corrupt,
        Seq("recId", "displayLatitude"), "|")
    }
  }

  test("batch job download returns None on 404; bad submit raises Details") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/jobs/", { exchange =>
      val body: Array[Byte] =
        if (exchange.getRequestMethod == "POST")
          ("<Response><Details>invalid app credentials</Details></Response>")
            .getBytes("UTF-8")
        else Array.emptyByteArray
      val code = if (exchange.getRequestMethod == "POST") 200 else 404
      exchange.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.setExecutor(null)
    server.start()
    try {
      val cfg = BatchGeocodeConfig(
        baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}/jobs/",
        appId = "app", appCode = "code")
      val bad = intercept[java.io.IOException] {
        new BatchGeocodeJob(cfg).submit("recId\n1\n".getBytes("UTF-8"))
      }
      bad.getMessage should include ("invalid app credentials")

      // not-ready download: the reference records the 404 and returns
      val job = new BatchGeocodeJob(cfg)
      job.requestId = Some("req-42")
      job.download(java.nio.file.Files.createTempDirectory("graft_geo404")) shouldBe None
      job.status shouldBe Some("404")
    } finally server.stop(0)
  }
}
