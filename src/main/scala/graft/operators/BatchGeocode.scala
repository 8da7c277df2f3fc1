package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, IOException}
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Batch-geocode HTTP job configuration — the reference's run parameters
  * (`/root/reference/etl/geocoding.py:51-63`: action=run, gen=9, header,
  * indelim/outdelim, mailto, outcols, outputCombined, maxresults, plus
  * the app credentials). */
final case class BatchGeocodeConfig(
    baseUrl: String,
    appId: String,
    appCode: String,
    inputDelimiter: String = "|",
    outputDelimiter: String = "|",
    outputColumns: Seq[String] =
      Seq("recId", "displayLatitude", "displayLongitude"),
    maxResults: Int = 1,
    email: String = "",
    pollIntervalMs: Long = 200L,
    maxPolls: Int = 50)

/** HTTP batch-geocode job — the reference's submit → poll → download
  * lifecycle (`/root/reference/etl/geocoding.py:40-116`) made
  * executable:
  *
  *  - `submit` POSTs the CSV as the raw request body with the run
  *    parameters in the query string and parses `RequestId`/`Status`
  *    out of the XML response (a missing RequestId raises with the
  *    response's `Details` text — the reference logs it and leaves the
  *    job inert; a library call-site wants the failure).
  *  - `refresh` GETs `{base}/{requestId}?action=status` and re-reads
  *    `Status`; `awaitCompletion` polls it to a terminal state.
  *  - `download` GETs `{base}/{requestId}/all` (404 → None) and
  *    rewrites the returned zip: `_out.txt`/`_err.txt` members are
  *    re-emitted with EXACTLY the configured output columns (header row
  *    first, missing columns as "", extras dropped — the reference's
  *    `__get_row__` cleaning of HERE's sequence columns), any other
  *    member is copied verbatim, and the result is saved as
  *    `<targetDir>/<requestId>sss.zip` (the reference's naming).
  *
  * This is a CLIENT-side lifecycle, one HTTP round-trip per corpus
  * batch, exactly like the reference — the cluster-side operator stays
  * the lookup join in [[Geocoding]]. A typical pipeline writes the
  * `not_found` split of `Geocoding.routed` as the submitted CSV and
  * ingests the rewritten result zip back through
  * `ZipSource.readZipCsv` (same column-fitting semantics). The spec
  * drives the full state machine against a loopback HTTP server; the
  * sandbox has no egress.
  */
final class BatchGeocodeJob(cfg: BatchGeocodeConfig) {

  @volatile var requestId: Option[String] = None
  @volatile var status: Option[String] = None

  private def credParams: Seq[(String, String)] =
    Seq("app_code" -> cfg.appCode, "app_id" -> cfg.appId)

  /** POST the CSV body; populates requestId + status. */
  def submit(csvBody: Array[Byte]): this.type = {
    val params = Seq(
      "action" -> "run",
      "gen" -> "9",
      "header" -> "true",
      "indelim" -> cfg.inputDelimiter,
      "outdelim" -> cfg.outputDelimiter,
      "mailto" -> cfg.email,
      "outcols" -> cfg.outputColumns.mkString(","),
      "outputCombined" -> "false",
      "maxresults" -> cfg.maxResults.toString) ++ credParams
    val (code, body) =
      BatchGeocodeJob.http("POST", url(cfg.baseUrl, "", params), Some(csvBody))
    BatchGeocodeJob.requireOk(code, body, "submit")
    requestId = BatchGeocodeJob.xmlText(body, "RequestId")
    if (requestId.isEmpty)
      throw new IOException("batch geocode submit rejected: " +
        BatchGeocodeJob.xmlText(body, "Details").getOrElse("(no Details)"))
    status = BatchGeocodeJob.xmlText(body, "Status")
    this
  }

  /** Re-read the job status (`action=status`). */
  def refresh(): this.type = {
    val id = requestId.getOrElse(throw new IOException("no requestId"))
    val (code, body) = BatchGeocodeJob.http("GET",
      url(cfg.baseUrl, id, ("action" -> "status") +: credParams), None)
    BatchGeocodeJob.requireOk(code, body, s"status poll for $id")
    status = BatchGeocodeJob.xmlText(body, "Status")
    this
  }

  /** Poll until `completed` (returned), or raise on `failed`/`cancelled`
    * or poll-budget exhaustion. */
  def awaitCompletion(): this.type = {
    var polls = 0
    while (!status.contains("completed")) {
      if (status.exists(s => s == "failed" || s == "cancelled"))
        throw new IOException(s"batch geocode job ${requestId.get}: " +
          status.get)
      if (polls >= cfg.maxPolls)
        throw new IOException(s"batch geocode job ${requestId.get}: still " +
          s"${status.getOrElse("unknown")} after ${cfg.maxPolls} polls")
      Thread.sleep(cfg.pollIntervalMs)
      refresh()
      polls += 1
    }
    this
  }

  /** Download `{base}/{id}/all`, rewrite result members to the
    * configured output columns, save `<targetDir>/<id>sss.zip`.
    * Returns the saved path, or None on HTTP 404 (the reference's
    * not-ready signal). */
  def download(targetDir: java.nio.file.Path): Option[java.nio.file.Path] = {
    val id = requestId.getOrElse(throw new IOException("no requestId"))
    val (code, body) = BatchGeocodeJob.http("GET",
      url(cfg.baseUrl, s"$id/all", credParams), None)
    if (code == 404) { status = Some("404"); return None }
    // 404 is the reference's not-ready signal; anything else non-200
    // is an ERROR body (HTML from a proxy, XML Details, ...) that must
    // not be rewritten into an empty-but-"successful" result zip
    BatchGeocodeJob.requireOk(code, body, s"download for $id")
    val cleaned = BatchGeocodeJob.rewriteResultZip(body,
      cfg.outputColumns, cfg.outputDelimiter)
    val target = targetDir.resolve(s"${id}sss.zip")
    java.nio.file.Files.write(target, cleaned)
    Some(target)
  }

  private def url(base: String, pathSuffix: String,
      params: Seq[(String, String)]): String = {
    val b = if (base.endsWith("/")) base else base + "/"
    val q = params.map { case (k, v) =>
      URLEncoder.encode(k, "UTF-8") + "=" + URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    s"$b$pathSuffix?$q"
  }
}

object BatchGeocodeJob {

  /** Raise on any non-2xx status with a snippet of the error body —
    * proxies return HTML, the service returns XML Details; neither
    * should be parsed as a success payload. */
  private[graft] def requireOk(code: Int, body: Array[Byte],
      what: String): Unit =
    if (code < 200 || code >= 300)
      throw new IOException(s"batch geocode $what: HTTP $code " +
        new String(body.take(200), StandardCharsets.UTF_8))

  /** Minimal HTTP round-trip on the JDK client (no added deps):
    * returns (status code, response body — error stream on >=400). */
  private[graft] def http(method: String, url: String,
      body: Option[Array[Byte]]): (Int, Array[Byte]) = {
    val conn =
      URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/octet-stream")
        conn.getOutputStream.write(b)
      }
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val out = new ByteArrayOutputStream()
      if (is != null) {
        val buf = new Array[Byte](8192)
        var n = is.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = is.read(buf) }
        is.close()
      }
      (code, out.toByteArray)
    } finally conn.disconnect()
  }

  /** First text content of `tag` in an XML document (DTDs disabled). */
  private[graft] def xmlText(doc: Array[Byte],
      tag: String): Option[String] = {
    if (doc.isEmpty) return None
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val d = f.newDocumentBuilder().parse(new ByteArrayInputStream(doc))
    val nodes = d.getElementsByTagName(tag)
    if (nodes.getLength == 0) None else Option(nodes.item(0).getTextContent)
  }

  /** Rewrite a result zip: `_out.txt`/`_err.txt` members re-fitted to
    * `outputColumns` (header first; per row, a named column's value or
    * "" when the member lacks it — exact-name match, like the
    * reference's DictReader lookup); other members byte-identical.
    *
    * A 200 body that is NOT a zip (proxy HTML, truncated transfer)
    * yields zero entries from ZipInputStream rather than an error —
    * silently rewriting that into an empty-but-"successful" result zip
    * would lose the whole batch, so it raises instead (the reference's
    * zipfile.ZipFile would raise BadZipFile at the same point,
    * `/root/reference/etl/geocoding.py:88-116`). A corrupt MEMBER
    * (damaged deflate stream / CRC mismatch) raises from the streaming
    * read itself as java.util.zip.ZipException. */
  private[graft] def rewriteResultZip(zipBytes: Array[Byte],
      outputColumns: Seq[String], delimiter: String): Array[Byte] = {
    require(delimiter.length == 1, "delimiter must be a single character")
    val delim = delimiter.charAt(0)
    val zis = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    val out = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(out)
    var members = 0
    Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .foreach { entry =>
        val bytes = readAll(zis)
        members += 1
        zos.putNextEntry(new ZipEntry(entry.getName))
        val name = entry.getName
        if (name.endsWith("_out.txt") || name.endsWith("_err.txt"))
          zos.write(fitCsv(new String(bytes, StandardCharsets.UTF_8),
            outputColumns, delim).getBytes(StandardCharsets.UTF_8))
        else zos.write(bytes)
        zos.closeEntry()
      }
    zos.close()
    // zero entries is ambiguous: a VALID empty archive (end-of-central-
    // directory signature PK\5\6, which Python's zipfile also opens
    // without raising) means a legitimately empty batch result; any
    // other zero-entry body is a non-zip payload (proxy HTML, truncated
    // transfer) that must raise rather than be saved as "success"
    val emptyArchive = zipBytes.length >= 4 &&
      zipBytes(0) == 0x50.toByte && zipBytes(1) == 0x4B.toByte &&
      zipBytes(2) == 0x05.toByte && zipBytes(3) == 0x06.toByte
    if (members == 0 && !emptyArchive)
      throw new IOException("batch geocode result body is not a zip " +
        s"archive (no members in ${zipBytes.length} bytes)")
    out.toByteArray
  }

  private def readAll(zis: ZipInputStream): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = zis.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = zis.read(buf) }
    out.toByteArray
  }

  /** Record-split honoring RFC-4180 quoting: newlines inside a quoted
    * field belong to the record, not the record separator (doubled
    * quotes toggle the state twice, so they can't close a field). */
  private[graft] def splitRecords(text: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '"') { inQuotes = !inQuotes; sb.append(ch) }
      else if ((ch == '\n' || ch == '\r') && !inQuotes) {
        if (ch == '\r' && i + 1 < text.length && text.charAt(i + 1) == '\n')
          i += 1
        out += sb.result()
        sb.clear()
      } else sb.append(ch)
      i += 1
    }
    out += sb.result()
    out.toIndexedSeq
  }

  /** Re-emit a header+rows CSV with exactly `outputColumns`. */
  private[graft] def fitCsv(text: String, outputColumns: Seq[String],
      delim: Char): String = {
    val lines = splitRecords(text).filter(_.nonEmpty)
    val sb = new StringBuilder
    sb.append(outputColumns.map(renderField(_, delim)).mkString(delim.toString))
      .append('\n')
    if (lines.nonEmpty) {
      val header = splitCsvLine(lines.head, delim)
      val idx = header.zipWithIndex.toMap
      lines.tail.foreach { line =>
        val fields = splitCsvLine(line, delim)
        val fitted = outputColumns.map { c =>
          idx.get(c).filter(_ < fields.length).map(fields).getOrElse("")
        }
        sb.append(fitted.map(renderField(_, delim)).mkString(delim.toString))
          .append('\n')
      }
    }
    sb.result()
  }

  /** RFC-4180-style parse of one line: double quotes delimit fields,
    * doubled quotes escape a literal quote. */
  private[graft] def splitCsvLine(line: String,
      delim: Char): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb.append('"'); i += 1
          } else inQuotes = false
        } else sb.append(ch)
      } else if (ch == '"') inQuotes = true
      else if (ch == delim) { out += sb.result(); sb.clear() }
      else sb.append(ch)
      i += 1
    }
    out += sb.result()
    out.toIndexedSeq
  }

  private def renderField(v: String, delim: Char): String =
    if (v.indexOf(delim) >= 0 || v.indexOf('"') >= 0 || v.indexOf('\n') >= 0)
      "\"" + v.replace("\"", "\"\"") + "\""
    else v
}
