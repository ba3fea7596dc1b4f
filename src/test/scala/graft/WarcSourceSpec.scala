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
