package graft

import graft.sources.WarcSource
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** WARC parse: plain + gzip-member archives, HTTP payload extraction,
  * malformed-input contract. The Spark fan-out is oracle-checked by
  * `warc_records`. */
class WarcSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture = Seq(
    ("warcinfo", "", "2024-01-01T00:00:00Z",
      "software: graft-fixture\r\n".getBytes("ISO-8859-1")),
    ("response", "https://example.org/a", "2024-01-01T00:00:01Z",
      WarcSource.httpTextPayload("hello warc world")),
    ("request", "https://example.org/a", "2024-01-01T00:00:01Z",
      "GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n".getBytes("ISO-8859-1")))

  test("plain WARC: records, HTTP status/mime, text body") {
    val recs = WarcSource.parseWarc(WarcSource.encodeWarc(fixture))
    assert(recs.length == 3)
    assert(recs.map(_.warc_type) == Seq("warcinfo", "response", "request"))
    val resp = recs(1)
    assert(resp.target_uri == "https://example.org/a")
    assert(resp.http_status == 200)
    assert(resp.mime == "text/plain")
    assert(resp.body_text == "hello warc world")
    // non-response records carry no HTTP fields
    assert(recs(0).http_status == -1 && recs(2).body_text == "")
  }

  test("per-record gzip members parse identically (Common Crawl layout)") {
    val plain = WarcSource.parseWarc(WarcSource.encodeWarc(fixture))
    val gz = WarcSource.parseWarc(WarcSource.gzipMembers(fixture))
    assert(gz == plain)
  }

  // ---- charset-aware body decode -----------------------------------

  test("Content-Type charset parameter drives the body decode") {
    import java.nio.charset.Charset
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val latin = "café au lait à la carte"
    val czech = "žluťoučký kůň"
    val recs = Seq(
      ("response", "https://e.org/l1", "2024-02-01T00:00:00Z",
        WarcSource.httpPayload(latin, "text/html; charset=ISO-8859-1",
          ISO_8859_1)),
      ("response", "https://e.org/cz", "2024-02-01T00:00:01Z",
        WarcSource.httpPayload(czech, "text/plain; charset=windows-1250",
          Charset.forName("windows-1250"))),
      ("response", "https://e.org/bad", "2024-02-01T00:00:02Z",
        WarcSource.httpPayload("fallback é", "text/plain; charset=no-such-cs",
          UTF_8)),
      ("response", "https://e.org/q", "2024-02-01T00:00:03Z",
        WarcSource.httpPayload("quoted", "text/plain; charset=\"utf-8\"",
          UTF_8)))
    val got = WarcSource.parseWarc(WarcSource.encodeWarc(recs))
    assert(got.map(_.body_text) ==
      Seq(latin, czech, "fallback é", "quoted"))
    // and the pure helper: unknown / malformed names fall back to UTF-8
    assert(WarcSource.charsetOf("text/plain") ==
      java.nio.charset.StandardCharsets.UTF_8)
    assert(WarcSource.charsetOf("text/html; charset=ISO-8859-1") ==
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(WarcSource.charsetOf("text/html; charset=!!!") ==
      java.nio.charset.StandardCharsets.UTF_8)
  }

  // ---- gzip: bounded + partial inflation ----------------------------

  test("gunzipAll caps inflated output (bomb-shaped input, no OOM)") {
    val big = Array.fill[Byte](1 << 20)('a')
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(big); gz.finish()
    val inflated = WarcSource.gunzipAll(out.toByteArray, cap = 100L)
    assert(inflated.length == 100)
    assert(inflated.sameElements(big.take(100)))
  }

  test("hitting the inflation cap is REPORTED, not silent") {
    val big = Array.fill[Byte](1 << 20)('a')
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(big); gz.finish()
    val bytes = out.toByteArray
    // under the cap: full output, no flag
    val (full, t0) = WarcSource.gunzipAllChecked(bytes)
    assert(!t0 && full.length == (1 << 20))
    // over the cap: bounded output, flag raised
    val (part, t1) = WarcSource.gunzipAllChecked(bytes, cap = 100L)
    assert(t1 && part.length == 100)
    // landing exactly ON the cap is NOT truncation (the probe read)
    val (exact, t2) = WarcSource.gunzipAllChecked(bytes, cap = 1L << 20)
    assert(!t2 && exact.length == (1 << 20))
    // the parse surface carries the flag and keeps earlier records
    val warc = WarcSource.gzipMembers(fixture)
    val inflatedLen = WarcSource.gunzipAll(warc).length
    val (recs, t3) = WarcSource.parseWarcCapped(warc, inflatedLen / 2)
    assert(t3 && recs.nonEmpty && recs.length < fixture.length)
    val (all, t4) = WarcSource.parseWarcCapped(warc, Long.MaxValue)
    assert(!t4 && all.length == fixture.length)
  }

  test("truncated gzip tail keeps earlier members' records") {
    val gz = WarcSource.gzipMembers(fixture)
    val offs = WarcSource.memberOffsets(gz)
    assert(offs.length == 3)
    // cut mid-way through the THIRD member's deflate data
    val cut = gz.take(offs(2) + (gz.length - offs(2)) / 2)
    val recs = WarcSource.parseWarc(cut)
    assert(recs.length == 2)
    assert(recs == WarcSource.parseWarc(WarcSource.encodeWarc(fixture)).take(2))
  }

  // ---- sub-file splitting at gzip-member boundaries ------------------

  private def manyRecs(n: Int) = (0 until n).flatMap { k =>
    Seq(
      ("response", s"https://example.org/p$k", "2024-03-01T00:00:00Z",
        WarcSource.httpTextPayload(s"page $k body " + ("x " * (k % 7)))),
      ("request", s"https://example.org/p$k", "2024-03-01T00:00:00Z",
        s"GET /p$k HTTP/1.1\r\n\r\n".getBytes("ISO-8859-1")))
  }

  test("memberOffsets: one validated boundary per member, covering") {
    val recs = manyRecs(6)
    val gz = WarcSource.gzipMembers(recs)
    val offs = WarcSource.memberOffsets(gz)
    assert(offs.length == recs.length) // one member per record
    assert(offs.head == 0)
    assert(offs == offs.sorted && offs.distinct == offs)
    // plain archives and single-stream gzip have no internal boundaries
    assert(WarcSource.memberOffsets(WarcSource.encodeWarc(recs)).isEmpty)
    val one = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(one)
    g.write(WarcSource.encodeWarc(recs)); g.finish()
    assert(WarcSource.memberOffsets(one.toByteArray) == Seq(0))
  }

  test("splitRanges: contiguous, member-aligned, target-sized") {
    val gz = WarcSource.gzipMembers(manyRecs(8))
    val offs = WarcSource.memberOffsets(gz).toSet
    for (target <- Seq(1L, 64L, 300L, 100000L)) {
      val rs = WarcSource.splitRanges(gz, target)
      assert(rs.head._1 == 0 && rs.last._2 == gz.length)
      assert(rs.zip(rs.drop(1)).forall { case ((_, e), (s, _)) => e == s })
      assert(rs.forall { case (s, _) => s == 0 || offs(s) })
      if (target == 100000L) assert(rs == Seq((0, gz.length)))
    }
    // plain archive: always exactly one range
    val plain = WarcSource.encodeWarc(manyRecs(3))
    assert(WarcSource.splitRanges(plain, 1L) == Seq((0, plain.length)))
  }

  test("split-invariance: same records from 1 file split N ways, any N") {
    import spark.implicits._
    val recs = manyRecs(10)
    val archives = spark.createDataset(Seq(
      0L -> WarcSource.gzipMembers(recs),
      1L -> WarcSource.encodeWarc(manyRecs(4)),
      2L -> WarcSource.gzipMembers(manyRecs(1))))
    val whole = WarcSource.records(archives)
      .collect().map(_.toSeq).sortBy(_.toString)
    for (target <- Seq(1L, 100L, 500L, 2000L, Long.MaxValue)) {
      val split = WarcSource.recordsSplit(archives, target)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(split.toSeq == whole.toSeq, s"target=$target")
    }
    // and the gzip archive genuinely fans out: >1 split at small targets
    assert(WarcSource.splitRanges(WarcSource.gzipMembers(recs), 500L)
      .length > 1)
  }

  test("malformed archives stop cleanly, never throw") {
    assert(WarcSource.parseWarc(Array.emptyByteArray).isEmpty)
    assert(WarcSource.parseWarc("not a warc at all".getBytes).isEmpty)
    assert(WarcSource.parseWarc(Array.fill[Byte](64)(0x1f)).isEmpty)
    // truncated payload: the earlier intact record still parses
    val whole = WarcSource.encodeWarc(fixture)
    val cut = whole.take(whole.length - 40)
    val recs = WarcSource.parseWarc(cut)
    assert(recs.nonEmpty && recs.length < 3)
    // absurd Content-Length must fail the Long bound check
    val bomb = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Long.MaxValue - 2}\r\n\r\nxx").getBytes("ISO-8859-1")
    assert(WarcSource.parseWarc(bomb).isEmpty)
    // corrupt gzip magic -> zero records, no throw
    val gz = WarcSource.gzipMembers(fixture)
    gz(12) = (gz(12) ^ 0x55).toByte
    WarcSource.parseWarc(gz) // must not throw; content may truncate
  }
}
