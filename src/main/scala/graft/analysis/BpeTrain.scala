package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINING for byte-pair-encoding merges — the published tokenizer-
  * training algorithm (Sennrich et al. 2016, arXiv:1508.07909): start
  * from characters, repeatedly count adjacent symbol pairs across the
  * word-frequency table and merge the most frequent pair, with the
  * deterministic tie-break count DESC, pair ASC. The third hash-checked
  * iterative loop in the engine after k-means and the perceptron
  * ([[QualityTrain]]): integer counts throughout, a fixed number of
  * rounds, every round bit-reproducible against an unrolled-CTE DuckDB
  * oracle (`corpus_bpe`).
  *
  * Representation: a word is its symbols joined by DOUBLE spaces and
  * wrapped in double spaces (`"  l  o  w  </w>  "`). Merging pair
  * (a, b) is then one `replace(w, " a  b ", " ab ")`: the pattern
  * keeps half of each boundary separator, so consecutive occurrences
  * re-form valid boundaries and ONE standard leftmost non-overlapping
  * replace-all pass implements exactly the greedy left-to-right BPE
  * merge — in Spark and DuckDB alike, with no regex and no lookaround
  * (`[a,a,a]` -> `[aa,a]`, `[a,b,a,b]` -> `[ab,ab]`). Symbols are
  * space-free by construction, which also makes the space-joined pair
  * string's ordering coincide with (s1, s2) tuple ordering (space
  * sorts below every symbol character).
  *
  * Scale shape: one corpus-wide word count up front, then every round
  * runs on the VOCAB-sized word-frequency table (the published trainer
  * operates on the frequency dict, never the corpus): one pair explode
  * + integer aggregate, a 1-row best-pair limit, and a broadcast 1-row
  * cross join to apply the merge; words and the best row are
  * localCheckpointed per round so lineage never replays earlier
  * rounds. Driver state: zero collects.
  */
object BpeTrain {

  /** End-of-word marker (the paper's `</w>`); space-free like every
    * symbol, so it can never collide with a separator. */
  val EndOfWord = "</w>"

  /** Character symbols + [[EndOfWord]], double-space joined and
    * wrapped — the initial working form of one word. */
  def initWord(word: Column): Column =
    concat(lit("  "),
      array_join(concat(
        regexp_extract_all(word, lit("."), lit(0)),
        array(lit(EndOfWord))), "  "),
      lit("  "))

  /** Adjacent-pair fan-out of one working form: `"s1 s2"` strings
    * (space-joined; ordering = tuple ordering since symbols are
    * space-free). Fully-merged single-symbol words yield no pairs. */
  private def pairs(w: Column): Column =
    // symbol array bound ONCE as a lambda variable (the Dedup.shingles
    // idiom): element_at over the raw split would re-split the working
    // form for every pair (no CSE into lambda bodies; words are short,
    // but the loop runs every round over the whole vocab)
    element_at(
      transform(array(split(trim(w), "  ")), syms =>
        when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => concat(element_at(syms, i), lit(" "),
              element_at(syms, i + 1))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Learn `rounds` BPE merges from `words(word, cnt)`; returns the
    * merge table (round, pair, merged, n) — the trained tokenizer
    * artifact, rounds rows. Precondition: the corpus supports at least
    * `rounds` merges (a round with no pairs left would go empty). */
  def fit(words: DataFrame, rounds: Int): DataFrame =
    train(words, rounds)._2.reduce(_ unionAll _)

  /** Inference path of the trained tokenizer: apply the `rounds`
    * learned merges to the same vocab and emit the token frequency
    * table (token, n) — what the segmented corpus tokenizes to
    * (`corpus_bpe_encode`). Same vocab-sized loop as [[fit]]; the
    * encode step itself is one symbol explode + integer aggregate. */
  def encodeTokens(words: DataFrame, rounds: Int): DataFrame =
    train(words, rounds)._1
      .select(col("cnt"), explode(split(trim(col("w")), "  ")).as("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))

  /** Tokenize documents with learned merges — the full tokenizer path
    * (train -> segment a CORPUS), what a pipeline runs to produce
    * model input. `docWords(doc_id, word, dn)` carries per-doc word
    * counts; `words(word, cnt)` is the training vocab; output is
    * (doc_id, token, n).
    *
    * Words IN the training vocab reuse their final working forms (the
    * word -> form map is vocab-sized; the join shuffles on the word
    * key — deliberately NOT a forced broadcast: a web-scale vocab
    * outgrows one). Words NOT in the vocab — real inference input —
    * fall back to MERGE REPLAY: char-split and fold the learned merge
    * table (rounds rows, broadcast as one ordered array) over the
    * working form with the same boundary-preserving replace the
    * trainer uses. Replaying the merges in round order reproduces the
    * trained form exactly for in-vocab words, so the fallback is the
    * same function restricted to the unseen ones — no silent OOV drop
    * (the pre-r9 inner join made unseen words vanish from the
    * output). */
  def tokenizeDocs(
      docWords: DataFrame, words: DataFrame, rounds: Int): DataFrame = {
    val (forms, merges) = train(words, rounds)
    val marr = merges.reduce(_ unionAll _)
      .agg(transform(
        array_sort(collect_list(struct(col("round"), col("pair")))),
        x => x.getField("pair")).as("__ms"))
    docWords
      .join(forms.select(col("word"), col("w")), Seq("word"), "left")
      .crossJoin(broadcast(marr))
      .select(col("doc_id"), col("dn"),
        coalesce(col("w"),
          aggregate(col("__ms"), initWord(col("word")), applyMerge))
          .as("wf"))
      .select(col("doc_id"), col("dn"),
        explode(split(trim(col("wf")), "  ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(sum(col("dn")).as("n"))
  }

  /** One merge-replay step: apply learned pair `p` ("s1 s2") to
    * working form `acc` — the identical boundary-preserving replace
    * the trainer's per-round merge uses. */
  private def applyMerge(acc: Column, p: Column): Column =
    replace(acc,
      concat(lit(" "), element_at(split(p, " "), 1), lit("  "),
        element_at(split(p, " "), 2), lit(" ")),
      concat(lit(" "), regexp_replace(p, " ", ""), lit(" ")))

  /** The merge loop shared by [[fit]] / [[encodeTokens]] /
    * [[tokenizeDocs]]: final working forms (keyed by the original
    * word) + the per-round best-pair rows. */
  private def train(
      words: DataFrame, rounds: Int): (DataFrame, Seq[DataFrame]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var w = words
      .select(col("word"), initWord(col("word")).as("w"), col("cnt"))
      .localCheckpoint()
    var merges: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      val best = w
        .select(col("cnt"), explode(pairs(col("w"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1)
        .localCheckpoint() // 1 row: the round-r merge decision
      merges :+= best.select(lit(r).as("round"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"), col("n"))
      w = w.crossJoin(broadcast(best.select(col("pair").as("__p"))))
        .select(col("word"), expr(
          """replace(w, ' ' || split(__p, ' ')[0] || '  ' ||
            |            split(__p, ' ')[1] || ' ',
            |        ' ' || replace(__p, ' ', '') || ' ')""".stripMargin)
          .as("w"), col("cnt"))
        .localCheckpoint() // vocab-sized snapshot per round
    }
    (w, merges)
  }

  /** DuckDB twin: the same unrolled rounds over `rel(word, cnt)`.
    * Emits CTEs `bw0..bw$rounds` (working forms) and `mb1..mb$rounds`
    * (per-round best pair); consume the merges as
    * `SELECT i AS round, pair, replace(pair, ' ', '') AS merged, n
    * FROM mb$i`. */
  def oracleCtes(rel: String, rounds: Int): String = {
    val base =
      s"""bw0 AS (
         |  SELECT word, '  ' || array_to_string(
         |      list_append(regexp_extract_all(word, '.'), '$EndOfWord'),
         |      '  ') || '  ' AS w,
         |    cnt
         |  FROM $rel)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val prev = s"bw${i - 1}"
      s"""pc$i AS (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt,
         |      unnest([s[j] || ' ' || s[j + 1] for j in range(1, len(s))])
         |        AS pair
         |    FROM (SELECT cnt, string_split(trim(w), '  ') AS s
         |      FROM $prev) __sy) __pr
         |  GROUP BY pair),
         |mb$i AS (
         |  SELECT pair, n FROM pc$i ORDER BY n DESC, pair LIMIT 1),
         |bw$i AS (
         |  SELECT word, replace(w,
         |      ' ' || string_split(pair, ' ')[1] || '  ' ||
         |            string_split(pair, ' ')[2] || ' ',
         |      ' ' || replace(pair, ' ', '') || ' ') AS w,
         |    cnt
         |  FROM $prev, mb$i)""".stripMargin
    }
    s"""$base,
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** Per-doc tokenization SELECT over [[oracleCtes]]'s final bw CTE
    * joined to `docRel(doc_id, word, dn)` — the DuckDB twin of
    * [[tokenizeDocs]]. */
  def oracleTokenizeSelect(docRel: String, rounds: Int): String =
    s"""SELECT doc_id, token, CAST(sum(dn) AS BIGINT) AS n
       |FROM (SELECT d.doc_id, d.dn,
       |    unnest(string_split(trim(b.w), '  ')) AS token
       |  FROM $docRel d JOIN bw$rounds b USING (word)) __dt
       |GROUP BY doc_id, token
       |ORDER BY doc_id, token""".stripMargin

  /** MERGE-REPLAY CTEs over [[oracleCtes]]'s mb CTEs: segment the
    * distinct words of `docRel(doc_id, word, dn)` — vocab membership
    * irrelevant — by char-splitting and applying each round's learned
    * pair in order (scalar subqueries against mb1..mb$rounds), the
    * DuckDB twin of [[tokenizeDocs]]'s fallback path. Emits
    * `aw0..aw$rounds`; consume via [[oracleApplySelect]]. */
  def oracleApplyCtes(docRel: String, rounds: Int): String = {
    val base =
      s"""aw0 AS (
         |  SELECT word, '  ' || array_to_string(
         |      list_append(regexp_extract_all(word, '.'), '$EndOfWord'),
         |      '  ') || '  ' AS w
         |  FROM (SELECT DISTINCT word FROM $docRel) __aw)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""aw$i AS (
         |  SELECT word, replace(w,
         |      (SELECT ' ' || string_split(pair, ' ')[1] || '  ' ||
         |              string_split(pair, ' ')[2] || ' ' FROM mb$i),
         |      (SELECT ' ' || replace(pair, ' ', '') || ' ' FROM mb$i))
         |    AS w
         |  FROM aw${i - 1})""".stripMargin
    }
    s"""$base,
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** Per-doc tokenization SELECT over [[oracleApplyCtes]]'s final aw
    * CTE — replay covers every word, in-vocab or not. */
  def oracleApplySelect(docRel: String, rounds: Int): String =
    s"""SELECT doc_id, token, CAST(sum(dn) AS BIGINT) AS n
       |FROM (SELECT d.doc_id, d.dn,
       |    unnest(string_split(trim(a.w), '  ')) AS token
       |  FROM $docRel d JOIN aw$rounds a USING (word)) __at
       |GROUP BY doc_id, token
       |ORDER BY doc_id, token""".stripMargin

  /** Merge-table SELECT over [[oracleCtes]]'s mb CTEs. */
  def oracleSelect(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""SELECT $i AS round, pair, replace(pair, ' ', '') AS merged, n
         |FROM mb$i""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY round"

  /** Token-frequency SELECT over [[oracleCtes]]'s final bw CTE — the
    * DuckDB twin of [[encodeTokens]]. */
  def oracleEncodeSelect(rounds: Int): String =
    s"""SELECT token, CAST(sum(cnt) AS BIGINT) AS n
       |FROM (SELECT cnt, unnest(string_split(trim(w), '  ')) AS token
       |  FROM bw$rounds) __tok
       |GROUP BY token
       |ORDER BY token""".stripMargin
}
