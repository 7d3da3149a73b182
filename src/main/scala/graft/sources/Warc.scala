package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader — the container format crawl
  * corpora ship in (one response/request/warcinfo record per capture,
  * optionally one gzip member per record so readers can seek).
  *
  * Scale model: a production crawl is tens of thousands of ~1 GB WARC
  * files; the unit of parallelism is the FILE (gzip members don't split),
  * exactly how crawl pipelines consume them — `read` maps one task per
  * file via `binaryFiles` and parses records STREAMING (memory is one
  * record, never one file). At 100 TB that is ~100k tasks over a
  * file-count-partitioned RDD; no shuffle is involved in ingestion.
  *
  * The reference has no web-archive surface (its ingest tier stops at
  * OSM/shapefile, e.g. server-plugin OSMImporter.java); WARC is
  * first-class here because an LLM-training corpus pipeline starts from
  * crawl archives.
  */
object Warc {

  /** One parsed WARC record. `body` is the HTTP message body for
    * `application/http` payloads (headers stripped), the raw payload
    * otherwise; `httpStatus` is None for non-response records.
    */
  final case class WarcRecord(
      file: String,
      warcType: String,
      url: Option[String],
      recordDate: Option[String],
      recordId: Option[String],
      contentType: Option[String],
      httpStatus: Option[Long],
      payloadLen: Long,
      bodyLen: Long,
      host: Option[String],
      body: Array[Byte])

  /** Read every record in the files matching `pattern` (mix of plain
    * `.warc` and per-record-gzip `.warc.gz` is fine). One task per file.
    */
  def read(spark: SparkSession, pattern: String): DataFrame = {
    import spark.implicits._
    val rdd = spark.sparkContext.binaryFiles(pattern).flatMap {
      case (path, pds) =>
        val raw: InputStream = pds.open()
        // multi-member gzip: GZIPInputStream chains concatenated members,
        // which is precisely the record-per-member WARC.gz layout
        val in = new BufferedInputStream(
          if (path.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16) else raw,
          1 << 16)
        val name = path.substring(path.lastIndexOf('/') + 1)
        records(in, name)
    }
    spark.createDataset(rdd).toDF()
  }

  /** Streaming record iterator over one (decompressed) WARC stream; closes
    * `in` on exhaustion. Malformed framing fails loudly — a truncated
    * record in a crawl shard is data loss, not something to skip silently.
    */
  def records(in: InputStream, file: String): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def advance(): Unit = {
        if (done || nextRec != null) return
        val first = readLine(in)
        if (first == null) { done = true; in.close(); return }
        if (first.isEmpty) { advance(); return } // tolerate stray CRLF runs
        require(first.startsWith("WARC/"),
          s"$file: expected WARC version line, got '$first'")
        var headers = Map.empty[String, String]
        var line = readLine(in)
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          require(i > 0, s"$file: malformed WARC header line '$line'")
          headers += (line.substring(0, i).trim.toLowerCase ->
            line.substring(i + 1).trim)
          line = readLine(in)
        }
        require(line != null, s"$file: EOF inside WARC header block")
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"$file: record without Content-Length")).toLong
        val payload = readFully(in, len, file)
        // record terminator: two CRLFs
        expect(in, "\r\n\r\n", file)
        val wtype = headers.getOrElse("warc-type", "unknown")
        val ctype = headers.get("content-type")
        val url = headers.get("warc-target-uri")
        val isHttp = ctype.exists(_.toLowerCase.startsWith("application/http"))
        val (status, body) =
          if (isHttp) splitHttp(payload) else (None, payload)
        nextRec = WarcRecord(file, wtype, url,
          headers.get("warc-date"), headers.get("warc-record-id"), ctype,
          status, len, body.length.toLong, url.map(hostOf), body)
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** HTTP message → (status for responses, body after the header block).
    * Requests and header-only messages yield an empty body.
    */
  private def splitHttp(payload: Array[Byte]): (Option[Long], Array[Byte]) = {
    val sep = indexOfCrlfCrlf(payload)
    val head = new String(payload, 0,
      if (sep >= 0) sep else payload.length, StandardCharsets.ISO_8859_1)
    val body =
      if (sep >= 0) java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      else Array.emptyByteArray
    val status = head.split("\r\n").headOption.flatMap { sl =>
      val p = sl.split(" ")
      if (p.length >= 2 && p(0).startsWith("HTTP/")) p(1).toLongOption else None
    }
    (status, body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** CRLF (or bare-LF) line as ISO-8859-1; null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
    val s = buf.toString(StandardCharsets.ISO_8859_1)
    if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s.substring(0, s.length - 1)
    else s
  }

  private def readFully(in: InputStream, n: Long, file: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$file: record payload over 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n.toInt - off)
      if (k < 0) throw new EOFException(
        s"$file: truncated payload ($off of $n bytes)")
      off += k
    }
    out
  }

  private def expect(in: InputStream, s: String, file: String): Unit =
    s.foreach { ch =>
      val c = in.read()
      require(c == ch.toInt,
        s"$file: bad record terminator (got ${if (c < 0) "EOF" else c.toString})")
    }

  // ------------------------------------------------------------- URL canon

  private val TrackingParam =
    "^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_eid)=".r

  /** Canonical form of an absolute http(s) URL — the dedup key a crawl
    * pipeline groups captures by: lowercase scheme+host, default port
    * stripped, fragment dropped, tracking parameters (utm_*, fbclid,
    * gclid, msclkid, mc_eid) removed, remaining query params sorted
    * byte-lexicographically, empty path → "/".
    */
  def canonicalUrl(u: String): String = {
    val noFrag = { val i = u.indexOf('#'); if (i >= 0) u.substring(0, i) else u }
    val si = noFrag.indexOf("://")
    require(si > 0, s"not an absolute URL: $u")
    val scheme = noFrag.substring(0, si).toLowerCase
    val rest = noFrag.substring(si + 3)
    val pathStart = {
      val i = rest.indexWhere(c => c == '/' || c == '?')
      if (i < 0) rest.length else i
    }
    var hostPort = rest.substring(0, pathStart).toLowerCase
    val defPort =
      if (scheme == "https") ":443" else if (scheme == "http") ":80" else ""
    if (defPort.nonEmpty && hostPort.endsWith(defPort))
      hostPort = hostPort.dropRight(defPort.length)
    val pq = rest.substring(pathStart)
    val qi = pq.indexOf('?')
    val path0 = if (qi >= 0) pq.substring(0, qi) else pq
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qi >= 0) pq.substring(qi + 1) else ""
    val kept = query.split("&").filter(_.nonEmpty)
      .filterNot(p => TrackingParam.findFirstIn(p + "=").isDefined)
      .sorted
    scheme + "://" + hostPort + path +
      (if (kept.isEmpty) "" else "?" + kept.mkString("&"))
  }

  /** Path component of an absolute URL (query/fragment stripped; host-only
    * URLs → "/") — the string robots.txt rules match against.
    */
  def pathOf(u: String): String = {
    val si = u.indexOf("://")
    if (si < 0) return "/"
    val rest = u.substring(si + 3)
    val ps = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (ps < 0 || rest.charAt(ps) != '/') "/"
    else {
      val p = rest.substring(ps)
      val e = p.indexWhere(c => c == '?' || c == '#')
      if (e < 0) p else p.substring(0, e)
    }
  }

  /** Host (lowercased, port stripped) of an absolute URL. */
  def hostOf(u: String): String = {
    val si = u.indexOf("://")
    if (si < 0) return ""
    val rest = u.substring(si + 3)
    val e = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val hp = (if (e < 0) rest else rest.substring(0, e)).toLowerCase
    val ci = hp.indexOf(':')
    if (ci >= 0) hp.substring(0, ci) else hp
  }

  // ----------------------------------------------------------- fixture gen

  /** warcinfo payload every generated shard starts with (length is part of
    * the ingest-stats oracle contract).
    */
  val InfoPayload: Array[Byte] =
    "software: graft-warc/1.0\r\nformat: WARC File Format 1.1\r\n"
      .getBytes(StandardCharsets.US_ASCII)

  /** Serialize one WARC/1.1 record (headers + payload + terminator). */
  def writeRecord(out: java.io.OutputStream, warcType: String,
      url: Option[String], contentType: String, payload: Array[Byte]): Unit = {
    val sb = new StringBuilder
    sb ++= "WARC/1.1\r\n"
    sb ++= s"WARC-Type: $warcType\r\n"
    url.foreach(u => sb ++= s"WARC-Target-URI: $u\r\n")
    sb ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    sb ++= s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(payload)}>\r\n"
    sb ++= s"Content-Type: $contentType\r\n"
    sb ++= s"Content-Length: ${payload.length}\r\n\r\n"
    out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
  }

  /** One gzip member holding exactly the bytes `record` — the
    * record-per-member layout of `.warc.gz`.
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  // --------------------------------------------------------------- oracles

  /** DuckDB replay of the warc_ingest_stats expectation, derived from the
    * documents table by the same formulas the fixture generator uses —
    * an independent derivation, not a re-run of the parser.
    */
  def ingestStatsDuckSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text,
       |         'www.host' || ((doc_id // 2) % 5) || '.example' AS host
       |  FROM documents
       |), resp AS (
       |  SELECT CASE WHEN doc_id % 10 = 7 THEN 404 ELSE 200 END AS st,
       |         CASE WHEN doc_id % 10 = 7 THEN 9
       |              ELSE octet_length(encode(text)) END AS body,
       |         host
       |  FROM d
       |)
       |SELECT * FROM (
       |  SELECT 'request' AS warc_type, CAST(-1 AS BIGINT) AS http_status,
       |         count(*)::BIGINT AS n_recs, CAST(0 AS BIGINT) AS body_bytes,
       |         count(DISTINCT host)::BIGINT AS n_hosts
       |  FROM d WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT 'response', CAST(st AS BIGINT), count(*)::BIGINT,
       |         sum(body)::BIGINT, count(DISTINCT host)::BIGINT
       |  FROM resp GROUP BY 2
       |  UNION ALL
       |  SELECT 'warcinfo', CAST(-1 AS BIGINT), CAST(4 AS BIGINT),
       |         CAST(${4 * InfoPayload.length} AS BIGINT), CAST(0 AS BIGINT)
       |) ORDER BY warc_type, http_status""".stripMargin

  /** DuckDB replay of warc_url_canon: the canonical group a (2k, 2k+1)
    * doc pair lands in, derived straight from doc_id — independent of the
    * canonicalizer implementation.
    */
  def urlCanonDuckSql: String =
    """WITH g AS (
      |  SELECT doc_id // 2 AS p, count(*)::BIGINT AS n
      |  FROM documents GROUP BY 1
      |)
      |SELECT 'https://www.host' || (p % 5) || '.example/doc/' || p || '?x=1'
      |         AS curl,
      |       n AS n_urls, n AS n_recs
      |FROM g WHERE n >= 2 ORDER BY curl""".stripMargin
}
