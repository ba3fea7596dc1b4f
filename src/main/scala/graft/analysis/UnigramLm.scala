package graft.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo, "Subword Regularization",
  * arXiv:1804.10959 — the SentencePiece unigram model, the standard
  * alternative to BPE): seed a vocabulary from frequent substrings,
  * iterate EM over the word table re-estimating piece probabilities,
  * segment by Viterbi at inference. This implementation runs HARD EM
  * (Viterbi E-step: each word's single best segmentation contributes
  * its pieces, weighted by word frequency) — the deterministic
  * integer-exact variant of the paper's soft E-step, chosen so every
  * round hash-checks against a DuckDB oracle; the soft/hard difference
  * is documented, not hidden (Kudo §3.2 uses the same Viterbi
  * approximation at inference time).
  *
  * Exactness discipline (the [[NgramLm]] micro-nat convention): each
  * piece's cost is −ln(p) rounded ONCE onto the 1e-6 grid and cast to
  * int64; Viterbi sums and compares exact integers thereafter, ties
  * broken by LONGEST piece — bit-identical across engines.
  *
  * Scale shape: the training loop runs on the WORD table (vocab-sized
  * — distinct words with counts, never the corpus; the [[BpeTrain]]
  * discipline). The model (seed top-K + single chars) is collected and
  * broadcast per round — model-sized, the only driver state. The
  * E-step is one row-local flatMap over words + a map-side-combined
  * groupBy on pieces.
  *
  * Contract: words longer than [[MaxWordLen]] chars are excluded from
  * training (both engines filter identically; the oracle's Viterbi DP
  * unrolls one CTE per character position).
  */
object UnigramLm {

  /** Maximum piece length in characters. */
  val MaxPieceLen = 4

  /** Maximum trainable word length (the DP unroll bound). */
  val MaxWordLen = 16

  /** Seed vocabulary: top-K substrings by weighted frequency, PLUS all
    * single characters (coverage guarantee: every word stays
    * segmentable after pruning). */
  val SeedTopK = 60

  /** Hard-EM rounds. */
  val Rounds = 2

  private val Inf = Long.MaxValue / 4

  /** Exact-integer Viterbi segmentation of one word under a piece-cost
    * map: minimize summed micro-nat cost; ties prefer the LONGEST
    * piece at each backtrack step (deterministic, mirrored by the
    * oracle's ORDER BY l DESC). */
  def viterbi(word: String, cost: Map[String, Long]): Seq[String] = {
    val n = word.length
    val dp = Array.fill(n + 1)(Inf)
    dp(0) = 0L
    for (j <- 1 to n; l <- 1 to math.min(MaxPieceLen, j)) {
      cost.get(word.substring(j - l, j)).foreach { c =>
        if (dp(j - l) != Inf && dp(j - l) + c < dp(j))
          dp(j) = dp(j - l) + c
      }
    }
    require(dp(n) != Inf, s"word '$word' not coverable by vocabulary")
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = (math.min(MaxPieceLen, pos) to 1 by -1).find { l =>
        cost.get(word.substring(pos - l, pos))
          .exists(c => dp(pos - l) != Inf && dp(pos - l) + c == dp(pos))
      }.get
      out += word.substring(pos - l, pos)
      pos -= l
    }
    out.reverse.toSeq
  }

  /** Micro-nat cost column: −ln(cnt/total) rounded once onto the 1e-6
    * grid (the [[NgramLm]] convention: one float op per piece per
    * round, integer thereafter). */
  private def costCol(total: Long): org.apache.spark.sql.Column =
    round(log(lit(total) * lit(1.0) / col("cnt")) * 1e6).cast("long")

  /** Train on a `(word, cnt)` relation; returns the final vocabulary
    * `(piece, cnt, cost)` — piece usage counts from the last Viterbi
    * E-step and their re-estimated micro-nat costs. */
  def fit(words: DataFrame, rounds: Int = Rounds): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val w = words
      .filter(length(col("word")) <= MaxWordLen && length(col("word")) >= 1)
      .select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)]
      .localCheckpoint()

    // seed: every substring of length 1..MaxPieceLen, weighted by word
    // count (row-local flatMap; the substring table is vocab-derived)
    val subs = w.flatMap { case (word, cnt) =>
      for {
        i <- 0 until word.length
        l <- 1 to math.min(MaxPieceLen, word.length - i)
      } yield (word.substring(i, i + l), cnt)
    }.toDF("piece", "cnt")
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint()
    // top-K by (cnt DESC, piece) — TakeOrderedAndProject, no global
    // window — plus ALL single chars for coverage; UNION dedups
    val seed = subs.orderBy(col("cnt").desc, col("piece")).limit(SeedTopK)
      .unionByName(subs.filter(length(col("piece")) === 1))
      .dropDuplicates("piece")
      .localCheckpoint()

    def collectVocab(v: DataFrame): Map[String, Long] =
      v.select(col("piece"), col("cost")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    val seedTotal = seed.agg(sum(col("cnt"))).head.getLong(0)
    var vocab = collectVocab(seed.select(col("piece"), col("cnt"),
      costCol(seedTotal).as("cost")))
    var result: DataFrame = null
    for (_ <- 1 to rounds) {
      val model = vocab // stable reference for the closure
      val counts = w.flatMap { case (word, cnt) =>
        viterbi(word, model).map(_ -> cnt)
      }.toDF("piece", "cnt")
        .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
        .localCheckpoint()
      val total = counts.agg(sum(col("cnt"))).head.getLong(0)
      result = counts.select(col("piece"), col("cnt"),
        costCol(total).as("cost"))
        .localCheckpoint()
      vocab = collectVocab(result)
    }
    result.orderBy(col("piece"))
  }

  // ---- DuckDB oracle ---------------------------------------------------

  /** CTE chain from a `(word, cnt)` relation to `u_v$rounds(piece,
    * cnt, cost)`: seed substrings + top-K ∪ single chars, then per
    * round the Viterbi DP unrolled one CTE per character position,
    * deterministic longest-piece backtrack, piece-count fold and
    * micro-nat re-estimation — the same unrolled-loop discipline as
    * [[graft.sim.KMeans.oracleCtes]]. */
  def oracleCtes(wordsRel: String, rounds: Int = Rounds): String = {
    val seedCtes =
      s"""u_w AS MATERIALIZED (
         |  SELECT word, CAST(cnt AS BIGINT) AS wcnt FROM $wordsRel
         |  WHERE length(word) BETWEEN 1 AND $MaxWordLen),
         |u_subs AS MATERIALIZED (
         |  SELECT substr(word, ii.i, ll.l) AS piece,
         |    CAST(sum(wcnt) AS BIGINT) AS cnt
         |  FROM u_w, generate_series(1, $MaxWordLen) AS ii(i),
         |    generate_series(1, $MaxPieceLen) AS ll(l)
         |  WHERE ii.i + ll.l - 1 <= length(word)
         |  GROUP BY 1),
         |u_topk AS (
         |  SELECT piece, cnt FROM u_subs
         |  ORDER BY cnt DESC, piece LIMIT $SeedTopK),
         |u_seed AS (
         |  SELECT piece, cnt FROM u_topk
         |  UNION
         |  SELECT piece, cnt FROM u_subs WHERE length(piece) = 1),
         |u_v0 AS MATERIALIZED (
         |  SELECT piece, cnt,
         |    CAST(round(ln((SELECT sum(cnt) FROM u_seed) * 1.0 / cnt)
         |      * 1000000) AS BIGINT) AS cost
         |  FROM u_seed)""".stripMargin
    val roundCtes = (1 to rounds).map(roundCte).mkString(",\n")
    s"""$seedCtes,
       |$roundCtes""".stripMargin
  }

  /** The Viterbi DP + backtrack CTE block, parameterized on the word
    * relation and vocabulary so the SAME chain serves training rounds
    * AND held-out encoding: emits `${p}_dp` (word, pos, c) and
    * `${p}_pieces` (word, strt, piece) — pieces carry their start
    * offset so consumers can reassemble left-to-right. */
  private def dpChain(p: String, wordsRel: String, v: String): String = {
    // dp position CTEs: ${p}_dp$j = min cost to cover word[0..j)
    val dpSteps = (1 to MaxWordLen).map { j =>
      val cands = (1 to math.min(MaxPieceLen, j)).map { l =>
        val prev = if (j - l == 0) s"${p}_dp0" else s"${p}_dp${j - l}"
        s"""SELECT p.word, p.c + v.cost AS c
           |    FROM $prev p JOIN $v v
           |      ON v.piece = substr(p.word, ${j - l + 1}, $l)
           |    WHERE length(p.word) >= $j""".stripMargin
      }.mkString("\n    UNION ALL\n    ")
      s"""${p}_dp$j AS MATERIALIZED (
         |  SELECT word, min(c) AS c FROM (
         |    $cands) __c$j GROUP BY word)""".stripMargin
    }.mkString(",\n")
    val dpUnion = (s"SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS c " +
      s"FROM ${p}_dp0") +:
      (1 to MaxWordLen).map(j =>
        s"SELECT word, $j AS pos, c FROM ${p}_dp$j")
    // choice: at each reachable (word, pos), the piece the backtrack
    // takes — longest l whose predecessor cost is consistent
    val chCands = (1 to MaxPieceLen).map { l =>
      s"""SELECT d.word, d.pos, v.piece, $l AS l
         |    FROM ${p}_dp d
         |    JOIN ${p}_dp pr ON pr.word = d.word AND pr.pos = d.pos - $l
         |    JOIN $v v ON v.piece = substr(d.word, d.pos - $l + 1, $l)
         |    WHERE d.pos >= $l AND pr.c + v.cost = d.c""".stripMargin
    }.mkString("\n    UNION ALL\n    ")
    // backtrack: MaxWordLen fixed steps, pos strictly decreasing
    val btSteps = (1 to MaxWordLen).map { k =>
      s"""${p}_bt$k AS MATERIALIZED (
         |  SELECT b.word, b.pos - ch.l AS pos, ch.piece
         |  FROM ${p}_bt${k - 1} b JOIN ${p}_ch ch
         |    ON ch.word = b.word AND ch.pos = b.pos
         |  WHERE b.pos > 0)""".stripMargin
    }.mkString(",\n")
    val btUnion = (1 to MaxWordLen)
      .map(k => s"SELECT word, pos AS strt, piece FROM ${p}_bt$k")
      .mkString("\n    UNION ALL\n    ")
    s"""${p}_dp0 AS MATERIALIZED (
       |  SELECT word, CAST(0 AS BIGINT) AS c FROM $wordsRel),
       |$dpSteps,
       |${p}_dpu AS (
       |  ${dpUnion.mkString("\n  UNION ALL\n  ")}),
       |${p}_dp AS MATERIALIZED (SELECT word, pos, c FROM ${p}_dpu),
       |${p}_ch AS MATERIALIZED (
       |  SELECT word, pos, piece, l FROM (
       |    SELECT *, row_number() OVER (PARTITION BY word, pos
       |      ORDER BY l DESC) AS rn
       |    FROM ($chCands) __cc) __cr WHERE rn = 1),
       |${p}_bt0 AS MATERIALIZED (
       |  SELECT word, length(word) AS pos FROM $wordsRel),
       |$btSteps,
       |${p}_pieces AS (
       |    $btUnion)""".stripMargin
  }

  /** One hard-EM round `r`: DP over `u_v${r-1}`, backtrack, counts,
    * re-estimated costs into `u_v$r`. */
  private def roundCte(r: Int): String = {
    val p = s"r$r"
    s"""${dpChain(p, "u_w", s"u_v${r - 1}")},
       |${p}_cnt AS MATERIALIZED (
       |  SELECT piece, CAST(sum(w.wcnt) AS BIGINT) AS cnt
       |  FROM ${p}_pieces pc JOIN u_w w USING (word) GROUP BY piece),
       |u_v$r AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(round(ln((SELECT sum(cnt) FROM ${p}_cnt) * 1.0 / cnt)
       |      * 1000000) AS BIGINT) AS cost
       |  FROM ${p}_cnt)""".stripMargin
  }

  /** Final SELECT over [[oracleCtes]]'s chain. */
  def oracleSelect(rounds: Int = Rounds): String =
    s"SELECT piece, cnt, cost FROM u_v$rounds ORDER BY piece"

  /** CTEs segmenting a HELD-OUT word relation with the trained
    * `u_v$rounds` vocabulary (append after [[oracleCtes]]): words not
    * fully coverable by the surviving pieces are dropped — identically
    * in both engines, since coverability IS dp-reachability. */
  def oracleEncodeCtes(evalWordsRel: String,
      rounds: Int = Rounds): String =
    s"""u_ew AS MATERIALIZED (
       |  SELECT word FROM $evalWordsRel
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen),
       |${dpChain("enc", "u_ew", s"u_v$rounds")},
       |u_enc AS (
       |  SELECT p.word,
       |    string_agg(p.piece, ' ' ORDER BY p.strt) AS seg,
       |    CAST(count(*) AS BIGINT) AS n_pieces,
       |    min(d.c) AS cost
       |  FROM enc_pieces p
       |  JOIN enc_dp d ON d.word = p.word AND d.pos = length(p.word)
       |  GROUP BY p.word)""".stripMargin

  /** Final SELECT over [[oracleEncodeCtes]]. */
  def oracleEncodeSelect: String =
    "SELECT word, seg, n_pieces, cost FROM u_enc ORDER BY word"

  /** Viterbi-segment a `(word)` relation under a trained cost map
    * (broadcast, model-sized): returns `(word, seg, n_pieces, cost)`;
    * uncoverable or over-length words are dropped — the oracle's
    * dp-reachability semantics. */
  def encode(words: DataFrame, vocab: Map[String, Long]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words
      .filter(length(col("word")) <= MaxWordLen && length(col("word")) >= 1)
      .select(col("word").cast("string")).as[String]
      .flatMap { word =>
        viterbiOpt(word, vocab).map { pieces =>
          (word, pieces.mkString(" "), pieces.size.toLong,
            pieces.map(vocab).sum)
        }
      }
      .toDF("word", "seg", "n_pieces", "cost")
  }

  /** [[viterbi]] returning None when the word is not coverable. */
  def viterbiOpt(word: String,
      cost: Map[String, Long]): Option[Seq[String]] =
    try Some(viterbi(word, cost))
    catch { case _: IllegalArgumentException => None }
}
