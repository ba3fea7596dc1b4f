package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Learned document-quality scoring, fastText-style (Joulin et al.
  * 2017, arXiv:1607.01759; the classifier-screening step in public
  * corpus recipes — CCNet, C4, GPT-3's Common Crawl filter): hashed
  * word n-gram features (unigrams + bigrams, hashed into [[Buckets]]
  * buckets — collisions SUM, the fastText memory/accuracy tradeoff) ·
  * an integer weight vector, through a logistic link.
  *
  * The model here is a LOADED model: training happens offline (this
  * engine scores, it does not fit — same boundary as
  * [[graft.enrich.InferenceService]]); [[Lexicon]] is a small
  * interpretable instance (function-word mass up, spam markers down)
  * standing in for trained weights. Weights are integer
  * (milli-log-odds), so the raw score is EXACT int64 arithmetic and
  * hash-checks against DuckDB; only the final sigmoid is float,
  * rounded to 4 decimals under the same discipline as the cosine
  * operators.
  *
  * Scale shape: scoring is ROW-LOCAL — tokenize, hash, aggregate over
  * the row's own feature array against the weight MAP LITERAL (model-
  * sized, ~100 distinct buckets here; a dense trained model at the
  * full 4096 buckets is still a bounded plan literal, and one larger
  * than that would ride a one-row broadcast relation exactly like
  * [[graft.sim.KMeans.assignBroadcast]]'s centroids). No shuffle, no
  * join, no UDF — the whole operator is codegen'd built-ins. */
object QualityModel {

  /** Feature-hash buckets (2^12 — fastText uses 2^21 at web scale;
    * sized down with the lexicon, the architecture is what counts). */
  val Buckets = 4096

  /** Integer weights are milli-log-odds: p = sigmoid(score / 1000). */
  val ScoreScale = 1000.0

  /** Log-odds offset a document starts from (milli-units): negative,
    * so an empty/contentless document scores as junk. */
  val Bias = -400L

  /** The loaded model, term -> milli-log-odds weight. Unigrams and
    * bigrams mix freely — both hash into the same bucket space. */
  val Lexicon: Seq[(String, Long)] = Seq(
    // function-word mass: the strongest cheap fluency signal
    "the" -> 120L, "and" -> 90L, "of" -> 90L, "to" -> 80L, "a" -> 70L,
    "in" -> 70L, "is" -> 60L, "was" -> 60L, "for" -> 50L, "with" -> 50L,
    "that" -> 50L, "it" -> 40L, "on" -> 40L, "as" -> 40L, "are" -> 40L,
    "this" -> 40L, "by" -> 30L, "be" -> 30L, "at" -> 30L, "from" -> 30L,
    "or" -> 30L, "an" -> 30L, "not" -> 30L, "but" -> 30L, "we" -> 20L,
    "his" -> 20L, "her" -> 20L, "they" -> 20L, "which" -> 20L,
    "were" -> 20L, "been" -> 20L, "has" -> 20L, "had" -> 20L,
    "their" -> 20L, "more" -> 10L, "when" -> 10L, "who" -> 10L,
    "will" -> 10L, "would" -> 10L, "there" -> 10L, "can" -> 10L,
    // fluent-bigram bonuses
    "of the" -> 80L, "in the" -> 60L, "to the" -> 40L, "on the" -> 30L,
    "and the" -> 30L, "it is" -> 30L, "for the" -> 30L,
    // spam / boilerplate markers
    "free" -> -200L, "click" -> -300L, "buy" -> -200L, "cheap" -> -250L,
    "win" -> -200L, "offer" -> -150L, "sale" -> -150L, "deal" -> -100L,
    "discount" -> -200L, "subscribe" -> -250L, "unsubscribe" -> -400L,
    "http" -> -150L, "https" -> -150L, "www" -> -150L, "com" -> -100L,
    "price" -> -50L, "shop" -> -50L, "order" -> -50L, "shipping" -> -150L,
    "click here" -> -500L, "buy now" -> -500L, "limited time" -> -400L,
    "best price" -> -300L, "free shipping" -> -400L)

  /** bucket -> summed weight (hash collisions SUM, as in fastText). */
  lazy val bucketWeights: Seq[(Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(term: String): Long = {
      val hex = md.digest(("qm:" + term).getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % Buckets
    }
    Lexicon.groupBy { case (t, _) => bucket(t) }
      .map { case (b, ws) => (b, ws.map(_._2).sum) }
      .toSeq.sortBy(_._1)
  }

  /** Normalized token array: lowercase, non-alphanumerics to spaces,
    * collapsed — byte-identical in both engines by construction. */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " ")), " ")

  private def tokensSql(expr: String): String =
    s"string_split(trim(regexp_replace(regexp_replace(lower($expr), " +
      s"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')"

  /** Unigrams + bigrams of the normalized tokens. */
  def features(text: Column): Column = {
    val t = tokens(text)
    val n = greatest(size(t) - 1, lit(0))
    val bigrams = zip_with(
      slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
    concat(t, bigrams)
  }

  /** Exact integer raw score: bias + sum of bucket weights over the
    * row's own features — one aggregate over a row-local array against
    * the model map literal. */
  def rawScore(text: Column): Column = {
    val wmap = map(bucketWeights.flatMap { case (b, w) =>
      Seq(lit(b), lit(w)) }: _*)
    aggregate(
      features(text),
      lit(Bias),
      (acc, f) => acc + coalesce(
        element_at(wmap, Dedup.md5Hash32(f, "qm:") % Buckets), lit(0L)))
  }

  /** Calibrated probability: sigmoid(raw / 1000), rounded to 4 under
    * the float discipline. */
  def prob(raw: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-raw.cast("double") / ScoreScale)), 4)

  /** DuckDB twin of the whole scoring pipeline for `rel(doc_id, text)`:
    * ends in `qs(doc_id, q_score, q_prob, q_keep)`. The weight VALUES
    * table is emitted from the SAME [[bucketWeights]], so Spark and the
    * oracle share one model by construction. */
  def oracleCte(rel: String): String = {
    val values = bucketWeights
      .map { case (b, w) => s"($b, $w)" }.mkString(", ")
    s"""qw(b, wt) AS (VALUES $values),
       |qtok AS (
       |  SELECT doc_id, ${tokensSql("text")} AS ws FROM $rel),
       |qfeat AS (
       |  SELECT doc_id,
       |    list_concat(ws, CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
       |      ELSE [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]
       |      END) AS fs
       |  FROM qtok),
       |qf AS (SELECT doc_id, unnest(fs) AS f FROM qfeat),
       |qsum AS (
       |  SELECT qf.doc_id, sum(coalesce(qw.wt, 0)) AS s
       |  FROM qf LEFT JOIN qw
       |    ON ${Dedup.md5Hash32Sql("qf.f", "qm:")} % $Buckets = qw.b
       |  GROUP BY qf.doc_id),
       |qs AS (
       |  SELECT t.doc_id,
       |    CAST($Bias + coalesce(qsum.s, 0) AS BIGINT) AS q_score,
       |    round(1.0 / (1.0 + exp(-($Bias + coalesce(qsum.s, 0))
       |      / $ScoreScale)), 4) AS q_prob,
       |    ($Bias + coalesce(qsum.s, 0) >= 0) AS q_keep
       |  FROM qtok t LEFT JOIN qsum ON t.doc_id = qsum.doc_id)"""
      .stripMargin
  }
}
