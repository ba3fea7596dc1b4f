package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.analysis.TextAnalysis
import graft.dedup.Dedup
import graft.operators.{AsOfJoin, ConnectedComponents, RangeJoin}

/** Fluent DataFrame syntax for the engine's operator library:
  *
  * {{{
  * import graft.syntax._
  * docs.nearDupPairsLsh("doc_id", "text")      // MinHash-LSH dedup
  * clicks.asOfBackward(errors, "user_id", "ts", Seq("err_value"))
  * events.pointInIntervals(intervals, 3600L)   // bucketed range join
  * pairs.connectedComponents("da", "db")       // dup groups
  * docs.withTextQuality("text")                // quality columns
  * }}}
  *
  * Thin forwarding layer only — every method delegates to the tested
  * operator objects, so library users get one import instead of six
  * object names.
  */
package object syntax {

  implicit final class GraftDataFrameOps(private val df: DataFrame)
      extends AnyVal {

    // ---- joins the DataFrame API lacks --------------------------------

    /** Backward as-of join: latest `right` row with ts <= this row's ts. */
    def asOfBackward(right: DataFrame, key: String, ts: String,
        rightVals: Seq[String]): DataFrame =
      AsOfJoin.backward(df, right, key, ts, rightVals)

    /** Forward as-of join: earliest `right` row with ts >= this row's ts. */
    def asOfForward(right: DataFrame, key: String, ts: String,
        rightVals: Seq[String]): DataFrame =
      AsOfJoin.forward(df, right, key, ts, rightVals)

    /** Bucketed point-in-interval range join (`ts` ∈ [start, end)). */
    def pointInIntervals(intervals: DataFrame,
        bucketWidthSec: Long): DataFrame =
      RangeJoin.pointInInterval(df, intervals, bucketWidthSec)

    // ---- dedup family -------------------------------------------------

    /** Exact duplicate groups by normalized-content fingerprint. */
    def exactDupGroups(idCol: String, textCol: String): DataFrame =
      Dedup.exactDupGroups(df, idCol, textCol)

    /** Near-dup pairs via MinHash-LSH banding + exact-Jaccard rescore. */
    def nearDupPairsLsh(idCol: String, textCol: String,
        threshold: Double = Dedup.JaccardThreshold): DataFrame =
      Dedup.minhashLshPairs(df, idCol, textCol, threshold)

    /** Near-dup pairs via the full inverted-index n-gram Jaccard join. */
    def nearDupPairsExact(idCol: String, textCol: String,
        threshold: Double = Dedup.JaccardThreshold): DataFrame =
      Dedup.ngramJaccardPairs(df, idCol, textCol, threshold)

    /** Near-dup pairs by SimHash Hamming distance. */
    def nearDupPairsSimhash(idCol: String, textCol: String,
        maxDist: Int = Dedup.HammingMax): DataFrame =
      Dedup.simhashPairs(df, idCol, textCol, maxDist)

    /** Connected components over this edge list (e.g. near-dup pairs):
      * (node, component = min reachable id). */
    def connectedComponents(srcCol: String, dstCol: String): DataFrame =
      ConnectedComponents.run(df, srcCol, dstCol)

    // ---- text analysis ------------------------------------------------

    /** Appends token-count / quality / language columns for `textCol`. */
    def withTextQuality(textCol: String): DataFrame = {
      val c = org.apache.spark.sql.functions.col(textCol)
      df.withColumn("n_tokens", TextAnalysis.tokenCount(c))
        .withColumn("quality", TextAnalysis.qualityScore(c))
        .withColumn("lang_pred", TextAnalysis.langId(c))
    }

    /** Winnowing fingerprint summary per document. */
    def winnowFingerprints(idCol: String, textCol: String): DataFrame =
      TextAnalysis.winnowSummary(df, idCol, textCol)
  }

  /** Column helpers mirrored from the operator library. */
  def normalizeCzech(c: Column): Column =
    graft.text.CzechText.normalizeCzech(c)
  def correctName(c: Column): Column =
    graft.text.NameCorrection.correctName(c)
  def processPrice(shop: Column, text: Column, classId: Column): Column =
    graft.price.PriceFunctions.processPrice(shop, text, classId)
  def array_dot(a: Column, b: Column): Column =
    graft.functions.ArrayOps.array_dot(a, b)
}
