package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — Cavnar & Trenkle 1994 ("N-Gram-
  * Based Text Categorization"), the published algorithm behind
  * `textcat` and the ancestor of fastText langid: per-language
  * character n-gram frequency profiles (top-K by count), documents
  * classified by rank out-of-place distance against each profile.
  * The trained upgrade of the heuristic marker-word
  * [[TextAnalysis.langId]].
  *
  * Everything is INTEGER — counts, ranks, the out-of-place distance,
  * and its [[ProfileK]] penalty for grams missing from a profile — so
  * training and classification hash-check end-to-end with zero float
  * steps (the strongest form of the engine's exactness discipline; not
  * even a rounding grid is needed).
  *
  * Scale shape: profiles are MODEL-sized (languages x K rows,
  * broadcast); per-doc work is one char-n-gram explode, one (doc,
  * gram) count, one per-doc rank window (partitioned by doc, never
  * global), and a broadcast join against the profiles. Deterministic
  * ties everywhere: (count DESC, gram ASC) for ranks, (distance ASC,
  * lang ASC) for the verdict.
  */
object LangIdTrain {

  /** n-gram orders (the paper uses 1..5; 1..3 keeps profiles tight). */
  val MaxN = 3

  /** Profile length K (the paper's 300, sized to the fixture). */
  val ProfileK = 50

  /** Normalized, space-padded character stream: lowercase, non-letters
    * to spaces, collapsed, wrapped in single spaces (the paper's word
    * padding so grams see word boundaries). */
  private def padded(text: Column): Column =
    concat(lit(" "),
      trim(regexp_replace(regexp_replace(lower(text), "[^a-z]", " "),
        " +", " ")),
      lit(" "))

  /** All character n-grams of orders 1..[[MaxN]]. The padded string is
    * bound ONCE as a lambda variable (the Dedup.shingles idiom):
    * substr over the raw regexp_replace chain would re-normalize the
    * document for every position x order (no CSE into lambda
    * bodies). A one-element string array stands in for the usual
    * token-array binding. */
  def charNgrams(text: Column): Column =
    element_at(
      transform(array(padded(text)), p =>
        flatten(array((1 to MaxN).map { n =>
          when(length(p) >= n,
            transform(sequence(lit(1), length(p) - (n - 1)),
              i => p.substr(i, lit(n))))
            .otherwise(array().cast("array<string>"))
        }: _*))),
      1)

  /** Train profiles from `labeled(lang, text)`: (lang, gram, rank),
    * rank 1..K by (count DESC, gram ASC). */
  def fit(labeled: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    labeled
      .select(col("lang"), explode(charNgrams(col("text"))).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(col("c").desc, col("gram"))).cast("long"))
      .filter(col("rank") <= ProfileK)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** Classify `docs(doc_id, text)` against `profiles` ([[fit]]'s
    * output): (doc_id, lang, dist) — the winning language per doc with
    * its out-of-place distance. */
  def classify(docs: DataFrame, profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docProfile = docs
      .select(col("doc_id"), explode(charNgrams(col("text"))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .withColumn("drank",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("c").desc, col("gram"))).cast("long"))
      .filter(col("drank") <= ProfileK)
      .select(col("doc_id"), col("gram"), col("drank"))
    val langs = profiles.select(col("lang")).distinct()
    val dists = docProfile
      .crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(coalesce(abs(col("drank") - col("rank")),
        lit(ProfileK.toLong))).as("dist"))
    dists
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("dist"), col("lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("dist"))
  }

  /** DuckDB twin: CTEs over `trainRel(lang, text)` and
    * `docRel(doc_id, text)`, ending in `licls(doc_id, lang, dist)`. */
  def oracleCtes(trainRel: String, docRel: String): String = {
    def pad(c: String): String =
      s"(' ' || trim(regexp_replace(regexp_replace(lower($c), " +
        "'[^a-z]', ' ', 'g'), ' +', ' ', 'g')) || ' ')"
    // per-order unnest unioned (the ngram_diversity pattern) — one
    // SELECT per n over the padded stream
    def gramRel(keyCol: String, rel: String): String =
      (1 to MaxN).map { n =>
        val p = pad("text")
        s"""SELECT $keyCol, unnest([substring($p, i, $n)
           |    for i in range(1, length($p) - ${n - 1} + 1)]) AS gram
           |  FROM $rel""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
    s"""litrg AS (
       |  ${gramRel("lang", trainRel)}),
       |liprof AS (
       |  SELECT lang, gram, rank FROM (
       |    SELECT lang, gram, count(*) AS c,
       |      CAST(row_number() OVER (PARTITION BY lang
       |        ORDER BY count(*) DESC, gram) AS BIGINT) AS rank
       |    FROM litrg GROUP BY lang, gram) __lp
       |  WHERE rank <= $ProfileK),
       |lidg AS (
       |  ${gramRel("doc_id", docRel)}),
       |lidp AS (
       |  SELECT doc_id, gram, drank FROM (
       |    SELECT doc_id, gram, count(*) AS c,
       |      CAST(row_number() OVER (PARTITION BY doc_id
       |        ORDER BY count(*) DESC, gram) AS BIGINT) AS drank
       |    FROM lidg GROUP BY doc_id, gram) __ld
       |  WHERE drank <= $ProfileK),
       |lilang AS (SELECT DISTINCT lang FROM liprof),
       |lidist AS (
       |  SELECT d.doc_id, l.lang,
       |    CAST(sum(coalesce(abs(d.drank - p.rank), $ProfileK))
       |      AS BIGINT) AS dist
       |  FROM lidp d CROSS JOIN lilang l
       |  LEFT JOIN liprof p ON p.lang = l.lang AND p.gram = d.gram
       |  GROUP BY d.doc_id, l.lang),
       |licls AS (
       |  SELECT doc_id, lang, dist FROM (
       |    SELECT doc_id, lang, dist,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY dist, lang) AS rn
       |    FROM lidist) __lc
       |  WHERE rn = 1)""".stripMargin
  }
}
