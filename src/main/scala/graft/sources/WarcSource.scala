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
  * bound checks are in Long arithmetic, gzip inflation is incremental
  * with a hard output cap (a decompression bomb yields the first
  * [[WarcSource.MaxInflatedBytes]] bytes, never OutOfMemoryError), and
  * bytes decoded before a corrupt/truncated gzip tail are KEPT so the
  * earlier intact records still parse.
  *
  * Scale note: [[WarcSource.records]] parallelizes per FILE (Common
  * Crawl segments are ~1 GB — thousands of files saturate any
  * cluster); [[WarcSource.recordsSplit]] additionally splits WITHIN an
  * archive at validated gzip-member boundaries (0x1f8b scan + inflate
  * probe for a `WARC/` record start), so one consolidated multi-GB
  * archive fans out across tasks exactly like a splittable
  * FileFormat's byte-range splits — the member-per-record layout is
  * what makes the boundaries seekable. */
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
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] =
    parseWarcCapped(bytes, MaxInflatedBytes)._1

  /** [[parseWarc]] with an explicit inflation cap, ALSO reporting
    * whether the cap was hit (records past it are absent — the flag is
    * what keeps that loss observable instead of silent; the
    * distributed readers feed it into [[truncationCount]]). */
  private[graft] def parseWarcCapped(
      bytes: Array[Byte], cap: Long): (Seq[WarcRecord], Boolean) = {
    val (plain, truncated) =
      if (isGzip(bytes)) gunzipAllChecked(bytes, cap)
      else (bytes, false)
    val out = Seq.newBuilder[WarcRecord]
    var p = 0
    var n = 0
    while (p < plain.length) {
      parseRecord(plain, p, n) match {
        case Some((rec, next)) => out += rec; p = next; n += 1
        case None => p = plain.length // malformed tail: stop cleanly
      }
    }
    (out.result(), truncated)
  }

  /** Headers, payload extent, and next-record offset of the record at
    * `from` — the walk SHARED by the full parse and the cheap
    * [[countRecords]] numbering pass, so their record counts agree by
    * construction. */
  private def recordBounds(b: Array[Byte], from: Int)
      : Option[(Map[String, String], Int, Long, Int)] = {
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
    // terminator: two CRLFs after the payload (tolerate EOF right after
    // the final payload byte — archives in the wild end both ways)
    var next = payloadAt + len.toInt
    var crlf = 0
    while (crlf < 2 && next + 2 <= b.length &&
        b(next) == '\r' && b(next + 1) == '\n') { next += 2; crlf += 1 }
    Some((hs, headEnd, len, next))
  }

  /** One record at `from`; returns (record, offsetAfter). */
  private def parseRecord(
      b: Array[Byte], from: Int, no: Int): Option[(WarcRecord, Int)] =
    recordBounds(b, from).map { case (hs, headEnd, len, next) =>
      val payloadAt = headEnd + 4
      val wtype = hs.getOrElse("warc-type", "")
      val (status, mime, body) =
        if (wtype == "response") parseHttp(b, payloadAt, len.toInt)
        else (-1, hs.getOrElse("content-type", ""), "")
      val rec = WarcRecord(no, wtype,
        hs.getOrElse("warc-target-uri", ""),
        hs.getOrElse("warc-date", ""),
        len, status, mime, body)
      (rec, next)
    }

  /** Record count of one buffer WITHOUT building row values — no HTTP
    * crack, no body decode, no row fan-out; just inflate + header walk
    * (same [[recordBounds]] the parse uses, same stop-cleanly
    * contract). The cheap first pass of [[recordsSplit]] numbering. */
  def countRecords(bytes: Array[Byte]): Int = {
    val plain = if (isGzip(bytes)) gunzipAll(bytes) else bytes
    var p = 0
    var n = 0
    while (p < plain.length) {
      recordBounds(plain, p) match {
        case Some((_, _, _, next)) => n += 1; p = next
        case None => p = plain.length
      }
    }
    n
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
        new String(b, headEnd + 4, end - (headEnd + 4), charsetOf(mime))
      else ""
    (status, mime, body)
  }

  private val StandardCharsets_UTF8 = java.nio.charset.StandardCharsets.UTF_8

  private val CharsetPat = "(?i)charset=\"?([\\w.:+-]+)".r

  /** Charset of a Content-Type value (`text/html; charset=ISO-8859-1`),
    * defaulting UTF-8. Crawl data is charset-messy: unknown or malformed
    * charset names also fall back to UTF-8 rather than throw (and
    * `new String` substitutes invalid sequences, so even a wrong
    * fallback stays a clean-stop, not a crash). */
  private[graft] def charsetOf(mime: String): java.nio.charset.Charset =
    CharsetPat.findFirstMatchIn(mime).map(_.group(1)).flatMap { name =>
      try Some(java.nio.charset.Charset.forName(name))
      catch { case _: Exception => None }
    }.getOrElse(StandardCharsets_UTF8)

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

  /** Hard inflated-output bound per parse unit. A whole ~1 GB Common
    * Crawl segment inflates past the JVM 2 GB array limit — for those,
    * [[recordsSplit]] keeps each parse unit (one split slice) far below
    * this cap; a single-buffer [[parseWarc]] of an oversized or
    * bomb-crafted archive returns the records inside the first cap
    * bytes instead of dying on OutOfMemoryError. */
  val MaxInflatedBytes: Long = 1L << 30

  /** Inflate a (possibly multi-member) gzip buffer INCREMENTALLY:
    * output is bounded by `cap` (never OutOfMemoryError on a
    * decompression bomb), and bytes decoded BEFORE a corrupt or
    * truncated tail are kept — parseWarc then applies its stop-cleanly
    * contract to the partial buffer, so earlier intact members still
    * yield their records (the same contract the plain path honors). */
  private[graft] def gunzipAll(
      bytes: Array[Byte], cap: Long = MaxInflatedBytes): Array[Byte] =
    gunzipAllChecked(bytes, cap)._1

  /** [[gunzipAll]] plus a TRUNCATED flag: true iff the cap stopped the
    * inflation while the stream still had output (a legitimate
    * high-ratio archive loses tail records exactly then — the flag is
    * the difference between bounded-memory protection and silent data
    * loss). The post-loop probe read makes the flag precise: an
    * archive whose inflated size lands exactly ON the cap is not
    * truncated. */
  private[graft] def gunzipAllChecked(
      bytes: Array[Byte], cap: Long = MaxInflatedBytes)
      : (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(64L, bytes.length.toLong * 4), 1L << 20).toInt)
    var truncated = false
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n > 0 && out.size() < cap) {
          val take = math.min(n.toLong, cap - out.size()).toInt
          if (take < n) truncated = true
          out.write(buf, 0, take)
          n = in.read(buf)
        }
        if (!truncated && n > 0 && out.size() >= cap)
          truncated = in.read(buf) > 0
      } finally in.close()
    } catch { case _: java.io.IOException => () } // keep bytes so far
    (out.toByteArray, truncated)
  }

  // ---- sub-file splitting at gzip-member boundaries ------------------

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** First VALIDATED gzip-member record start at/after `from`, or -1:
    * a candidate offset carries the member magic (0x1f 0x8b), deflate
    * method 0x08, zero reserved flag bits — and an inflate PROBE of
    * its first bytes must read `WARC/`, so a member that continues a
    * spanning record (or a chance byte pattern inside compressed data)
    * is never a boundary. The byte scan is a cheap 4-byte compare;
    * probes fire only on the ~n/2^27 false candidates that pass it. */
  def nextMemberOffset(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
          (bytes(i + 2) & 0xff) == 0x08 && (bytes(i + 3) & 0xe0) == 0 &&
          probeWarcMember(bytes, i)) return i
      i += 1
    }
    -1
  }

  /** ALL validated member record starts (diagnostics/tests —
    * [[splitRanges]] itself probes only near split targets, so slicing
    * a 1 GB archive costs one byte scan plus ~len/target probes, not
    * one probe per member). */
  def memberOffsets(bytes: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var at = nextMemberOffset(bytes, 0)
    while (at >= 0) { out += at; at = nextMemberOffset(bytes, at + 1) }
    out.result()
  }

  /** True iff inflating the member at `at` starts with `WARC/`. */
  private def probeWarcMember(b: Array[Byte], at: Int): Boolean =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b, at, b.length - at))
      try {
        val head = new Array[Byte](5)
        var got = 0
        var n = in.read(head, got, 5 - got)
        while (n > 0 && got + n < 5) { got += n; n = in.read(head, got, 5 - got) }
        if (n > 0) got += n
        got == 5 && head(0) == 'W' && head(1) == 'A' && head(2) == 'R' &&
          head(3) == 'C' && head(4) == '/'
      } finally in.close()
    } catch { case _: java.io.IOException => false }

  /** Contiguous byte ranges covering the archive, each starting at a
    * validated member boundary and spanning >= `targetSplitBytes`
    * compressed bytes (except the last). Plain archives, single-stream
    * gzip, and anything unsplittable degrade to ONE range — the
    * per-file behavior, never a wrong answer. */
  def splitRanges(
      bytes: Array[Byte], targetSplitBytes: Long): Seq[(Int, Int)] = {
    if (bytes.isEmpty) return Seq.empty
    val whole = Seq((0, bytes.length))
    if (!isGzip(bytes)) return whole
    if (nextMemberOffset(bytes, 0) != 0) return whole
    val target = math.max(1L, targetSplitBytes)
    val starts = Seq.newBuilder[Int]
    var cur = 0
    starts += 0
    var continue = true
    while (continue) {
      val from = cur.toLong + target
      val next =
        if (from >= bytes.length) -1
        else nextMemberOffset(bytes, from.toInt)
      if (next < 0) continue = false
      else { starts += next; cur = next }
    }
    val ss = starts.result()
    ss.zip(ss.drop(1) :+ bytes.length)
  }

  /** Per-SparkContext named accumulator ("graft.warc.truncated")
    * counting parse units whose inflated output hit
    * [[MaxInflatedBytes]] during [[records]]/[[recordsSplit]] — each
    * such unit silently lost its tail records to the bomb cap, so a
    * legitimate high-ratio archive shows up HERE (and in the Spark UI
    * per stage) instead of as invisible data loss. Counted in the
    * record-producing pass only (the numbering pass inflates the same
    * slices and would double-count). Monotonic per context; read
    * deltas around an action via [[truncationCount]]. */
  def truncationAccumulator(
      spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.util.LongAccumulator =
    truncAccs.computeIfAbsent(spark.sparkContext,
      ctx => ctx.longAccumulator("graft.warc.truncated"))

  /** Current value of [[truncationAccumulator]] (0 when nothing ever
    * truncated on this context). */
  def truncationCount(spark: org.apache.spark.sql.SparkSession): Long =
    truncationAccumulator(spark).value

  private val truncAccs = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext, org.apache.spark.util.LongAccumulator]

  /** Record fan-out over (archive_id, content) blobs — the operator a
    * `spark.read.format("binaryFile").load(...)` scan feeds. */
  def records(archives: Dataset[(Long, Array[Byte])]): DataFrame = {
    import archives.sparkSession.implicits._
    val trunc = truncationAccumulator(archives.sparkSession)
    archives.flatMap { case (id, content) =>
      val (recs, truncated) = parseWarcCapped(content, MaxInflatedBytes)
      if (truncated) trunc.add(1)
      recs.map(r => (id, r.record_no, r.warc_type,
        r.target_uri, r.warc_date, r.content_length, r.http_status,
        r.mime, r.body_text))
    }.toDF("archive_id", "record_no", "warc_type", "target_uri",
      "warc_date", "content_length", "http_status", "mime", "body_text")
  }

  /** Compressed bytes per split slice — the
    * `spark.sql.files.maxPartitionBytes` of this source. The default
    * (64 MB compressed, so ~5x that inflated per task) keeps every
    * slice far below [[MaxInflatedBytes]]. */
  val DefaultSplitBytes: Long = 64L * 1024 * 1024

  /** Per-slice fan-out of [[recordsSplit]]: each archive becomes
    * (archive_id, split_no, slice bytes) rows, one per
    * [[splitRanges]] range. Split once here (narrow), then a
    * repartition moves each archive byte exactly ONCE to its task —
    * the in-memory-column equivalent of a FileFormat handing byte
    * ranges to separate readers. */
  def splitSlices(
      archives: Dataset[(Long, Array[Byte])],
      targetSplitBytes: Long): Dataset[(Long, Int, Array[Byte])] = {
    import archives.sparkSession.implicits._
    archives.flatMap { case (id, content) =>
      splitRanges(content, targetSplitBytes).zipWithIndex.map {
        case ((s0, e0), i) =>
          (id, i, java.util.Arrays.copyOfRange(content, s0, e0))
      }
    }
  }

  /** [[records]] with SUB-FILE parallelism: one archive's gzip members
    * fan out across tasks in `targetSplitBytes`-sized slices, so a
    * consolidated multi-GB archive no longer serializes onto one task.
    * Same schema and record numbering as [[records]] — `record_no` is
    * reconstructed from per-split record counts (a split-count-sized
    * relation: one row per slice) via a prefix sum per archive and a
    * broadcast join back, so record BODIES never shuffle again after
    * the slice fan-out. Split-invariant by construction: slices start
    * only at validated whole-record member boundaries
    * (WarcSourceSpec proves records(1 file) == recordsSplit(any N)). */
  def recordsSplit(
      archives: Dataset[(Long, Array[Byte])],
      targetSplitBytes: Long = DefaultSplitBytes): DataFrame =
    recordsSplitWithSlices(archives, targetSplitBytes)._1

  /** [[recordsSplit]] plus the persisted slice handle, for callers
    * that materialize the result eagerly and can then RELEASE the
    * cache (`slices.unpersist()`) — the streaming corpus drain does
    * this per micro-batch, otherwise every batch's compressed archive
    * bytes would accumulate in the block manager for the stream's
    * lifetime. */
  private[graft] def recordsSplitWithSlices(
      archives: Dataset[(Long, Array[Byte])],
      targetSplitBytes: Long = DefaultSplitBytes)
      : (DataFrame, Dataset[(Long, Int, Array[Byte])]) = {
    import archives.sparkSession.implicits._
    // pin the COMPRESSED slices (the cheapest representation there is)
    // so the count pass and the parse pass share one slicing + shuffle.
    // MEMORY_ONLY, deliberately: eviction under pressure actually
    // frees space (MEMORY_AND_DISK blocks spill and then SIT on disk
    // until unpersist), and persist (not localCheckpoint) keeps
    // lineage — evicted or lost blocks recompute from the
    // repartition's shuffle files instead of failing the job
    val slices = splitSlices(archives, targetSplitBytes)
      .repartition(col("_1"), col("_2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // cheap numbering pass: inflate + header walk only (countRecords),
    // one OUTPUT row per slice — never the full record fan-out
    val counts = slices
      .map { case (id, sp, slice) => (id, sp, countRecords(slice)) }
      .toDF("archive_id", "split_no", "n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("archive_id")).orderBy(col("split_no"))
      .rowsBetween(Long.MinValue, -1)
    // window input is split-count-sized metadata (one row per slice)
    val offsets = counts.select(col("archive_id"), col("split_no"),
      coalesce(sum(col("n")).over(w), lit(0L)).as("rec_offset"))
    val trunc = truncationAccumulator(archives.sparkSession)
    val parsed = slices
      .flatMap { case (id, sp, slice) =>
        val (recs, truncated) = parseWarcCapped(slice, MaxInflatedBytes)
        if (truncated) trunc.add(1)
        recs.map(r => (id, sp, r.record_no, r.warc_type,
          r.target_uri, r.warc_date, r.content_length, r.http_status,
          r.mime, r.body_text))
      }
      .toDF("archive_id", "split_no", "rec_in_split", "warc_type",
        "target_uri", "warc_date", "content_length", "http_status",
        "mime", "body_text")
    val out = parsed
      .join(broadcast(offsets), Seq("archive_id", "split_no"))
      .select(col("archive_id"),
        (col("rec_offset") + col("rec_in_split")).cast("int")
          .as("record_no"),
        col("warc_type"), col("target_uri"), col("warc_date"),
        col("content_length"), col("http_status"), col("mime"),
        col("body_text"))
    (out, slices)
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
  def httpTextPayload(body: String): Array[Byte] =
    httpPayload(body, "text/plain", StandardCharsets_UTF8)

  /** An HTTP 200 payload with an explicit Content-Type value (charset
    * parameter included verbatim) and the body encoded in `cs` — the
    * fixture for charset-aware decoding. */
  def httpPayload(
      body: String, contentType: String,
      cs: java.nio.charset.Charset): Array[Byte] = {
    val b = body.getBytes(cs)
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
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
