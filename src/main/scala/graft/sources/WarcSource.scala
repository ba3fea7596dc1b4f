package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record reader — the container training-data
  * pipelines actually ingest: Common Crawl publishes its corpus as
  * WARC, so "read the web corpus" means "fan WARC records out of
  * archive blobs". Re-expressed Spark-first like [[PdfSource]]:
  * `binaryFile` scan (or any binary column) -> row-local record
  * fan-out via typed flatMap — bytes stay in columns, no temp files.
  *
  * Format, from the standard: a record is `WARC/1.0\r\n`, header
  * lines `Name: Value\r\n`, a blank line, `Content-Length` payload
  * bytes, and a `\r\n\r\n` terminator; `response` records carry an
  * HTTP message (status line, headers, blank line, body) as payload.
  * Both plain and GZIP archives parse — Common Crawl compresses each
  * record as its OWN gzip member, and java.util.zip's GZIPInputStream
  * reads concatenated members as one stream, which is exactly the
  * member-per-record layout.
  *
  * Malformed-input contract (the [[graft.multimodal.MjpegAvi]]
  * discipline): a corrupt record STOPS the parse and returns the
  * records before it — never throws on untrusted archive bytes; all
  * bound checks are in Long arithmetic.
  *
  * Scale note: parallelism here is per-FILE (Common Crawl segments are
  * ~1 GB — thousands of files saturate any cluster). Sub-file record
  * splitting needs a custom FileFormat seeking gzip-member boundaries;
  * that is the documented boundary, and the per-record-member layout
  * above is what makes it possible. */
final case class WarcRecord(
    record_no: Int,
    warc_type: String,
    target_uri: String,
    warc_date: String,
    content_length: Long,
    http_status: Int,
    mime: String,
    body_text: String)

object WarcSource {

  /** Parse every record in one WARC buffer (plain or gzip). */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val plain =
      if (bytes.length >= 2 &&
          (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var n = 0
    while (p < plain.length) {
      parseRecord(plain, p, n) match {
        case Some((rec, next)) => out += rec; p = next; n += 1
        case None => p = plain.length // malformed tail: stop cleanly
      }
    }
    out.result()
  }

  /** One record at `from`; returns (record, offsetAfter). */
  private def parseRecord(
      b: Array[Byte], from: Int, no: Int): Option[(WarcRecord, Int)] = {
    val headEnd = indexOfBlank(b, from)
    if (headEnd < 0) return None
    val head = new String(b, from, headEnd - from, ISO_8859_1)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    val hs = headers(lines.drop(1))
    val len = hs.get("content-length").flatMap(v =>
      scala.util.Try(v.toLong).toOption).getOrElse(-1L)
    val payloadAt = headEnd + 4
    // overflow-proof bound: compare against the REMAINING byte count —
    // `payloadAt + len` would wrap for a Content-Length near
    // Long.MaxValue and slip past a direct comparison (the MjpegAvi
    // lesson, one level up)
    if (len < 0 || len > (b.length - payloadAt).toLong) return None
    val wtype = hs.getOrElse("warc-type", "")
    val (status, mime, body) =
      if (wtype == "response") parseHttp(b, payloadAt, len.toInt)
      else (-1, hs.getOrElse("content-type", ""), "")
    val rec = WarcRecord(no, wtype,
      hs.getOrElse("warc-target-uri", ""),
      hs.getOrElse("warc-date", ""),
      len, status, mime, body)
    // terminator: two CRLFs after the payload (tolerate EOF right after
    // the final payload byte — archives in the wild end both ways)
    var next = payloadAt + len.toInt
    var crlf = 0
    while (crlf < 2 && next + 2 <= b.length &&
        b(next) == '\r' && b(next + 1) == '\n') { next += 2; crlf += 1 }
    Some((rec, next))
  }

  /** HTTP payload of a response record: (status, content-type, body
    * text for text-mime bodies else ""). */
  private def parseHttp(
      b: Array[Byte], at: Int, len: Int): (Int, String, String) = {
    val end = at + len
    val headEnd = indexOfBlank(b, at)
    if (headEnd < 0 || headEnd >= end) return (-1, "", "")
    val head = new String(b, at, headEnd - at, ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption
      .flatMap(l => "HTTP/\\S+ (\\d{3})".r.findFirstMatchIn(l))
      .map(_.group(1).toInt).getOrElse(-1)
    val hs = headers(lines.drop(1))
    val mime = hs.getOrElse("content-type", "")
    val body =
      if (mime.takeWhile(_ != ';').trim.startsWith("text/") &&
          headEnd + 4 <= end)
        new String(b, headEnd + 4, end - (headEnd + 4),
          StandardCharsets_UTF8)
      else ""
    (status, mime, body)
  }

  private val StandardCharsets_UTF8 = java.nio.charset.StandardCharsets.UTF_8

  private def headers(lines: Array[String]): Map[String, String] =
    lines.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None
      else Some(l.substring(0, i).trim.toLowerCase ->
        l.substring(i + 1).trim)
    }.toMap

  /** Offset of the first CRLFCRLF at/after `from`, or -1. */
  private def indexOfBlank(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 4 <= b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' &&
          b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Inflate a (possibly multi-member) gzip buffer; None-equivalent
    * empty array on corrupt input (parse then yields zero records). */
  private def gunzipAll(bytes: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } catch { case _: java.io.IOException => Array.emptyByteArray }

  /** Record fan-out over (archive_id, content) blobs — the operator a
    * `spark.read.format("binaryFile").load(...)` scan feeds. */
  def records(archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    import archives.sparkSession.implicits._
    archives.flatMap { case (id, content) =>
      parseWarc(content).map(r => (id, r.record_no, r.warc_type,
        r.target_uri, r.warc_date, r.content_length, r.http_status,
        r.mime, r.body_text))
    }.toDF("archive_id", "record_no", "warc_type", "target_uri",
      "warc_date", "content_length", "http_status", "mime", "body_text")
  }

  // ---- fixture encoder (tests + the warc_records oracle) -------------

  /** Serialize records as a plain WARC buffer. `http` entries become
    * response records with a full HTTP message payload. */
  def encodeWarc(
      recs: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (wtype, uri, date, payload) =>
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: $wtype\r\n")
      if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
      head.append(s"WARC-Date: $date\r\n")
      if (wtype == "response")
        head.append("Content-Type: application/http; msgtype=response\r\n")
      head.append(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(head.toString.getBytes(ISO_8859_1))
      out.write(payload)
      out.write("\r\n\r\n".getBytes(ISO_8859_1))
    }
    out.toByteArray
  }

  /** An HTTP 200 text/plain message payload for [[encodeWarc]]. */
  def httpTextPayload(body: String): Array[Byte] = {
    val b = body.getBytes(StandardCharsets_UTF8)
    (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      s"Content-Length: ${b.length}\r\n\r\n").getBytes(ISO_8859_1) ++ b
  }

  /** Per-record gzip members (the Common Crawl layout). */
  def gzipMembers(
      recs: Seq[(String, String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(encodeWarc(Seq(r)))
      gz.finish()
    }
    out.toByteArray
  }
}
