package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINING for WordPiece merges — the third published subword
  * tokenizer family next to BPE ([[BpeTrain]], frequency-greedy) and
  * unigram-LM ([[UnigramLm]], EM-pruned): WordPiece (Schuster &
  * Nakajima, "Japanese and Korean Voice Search", ICASSP 2012; the BERT
  * tokenizer) runs the SAME merge loop as BPE but picks the pair that
  * maximizes the LIKELIHOOD gain score
  * `count(ab) / (count(a) * count(b))` — merge what co-occurs more
  * than its parts' popularity predicts, not what is merely frequent.
  *
  * Representation: BERT's continuation convention — a word's first
  * character is a bare symbol, every later one carries the `##`
  * prefix (`"  l  ##o  ##w  "`, double-space joined and wrapped, the
  * [[BpeTrain]] working form). Merging pair `(a, ##b)` concatenates
  * and drops the right's `##` (`a##b → a·b`, keeping the LEFT's
  * continuation status), so one boundary-preserving `replace` pass
  * implements the merge in both engines, and final symbols ARE the
  * BERT-style vocab (`play`, `##ing`).
  *
  * Score arithmetic is EXACT integer: the selection compares
  * `q = (n * Scale) div (c_left * c_right)` on the fixed [[Scale]]
  * grid with the deterministic tie-break (q DESC, n DESC, pair ASC) —
  * no float division, so Spark and DuckDB agree bit for bit.
  * Precondition (documented regime, the [[graft.functions
  * .FreqSketchOps]] discipline): `n * Scale` and `c_left * c_right`
  * must stay inside int64 — holds while weighted symbol totals stay
  * under ~3×10^9; at a larger corpus drop [[Scale]] a decade (ranking
  * is unchanged: q only loses trailing resolution).
  *
  * Scale shape: identical to [[BpeTrain]] — the loop runs on the
  * VOCAB-sized word-frequency table, never the corpus; per round one
  * symbol aggregate, one pair aggregate + two vocab-sized count joins,
  * a 1-row best limit, and a broadcast 1-row cross join applying the
  * merge; localCheckpoint per round keeps lineage flat. Zero driver
  * collects.
  */
object WordPiece {

  /** Integer score grid: q = (n * Scale) div (c_l * c_r). */
  val Scale = 1000000000000L

  /** `"  l  ##o  ##w  "` — first char bare, rest `##`-prefixed,
    * double-space joined and wrapped. */
  def initWord(word: Column): Column = {
    val chars = regexp_extract_all(word, lit("."), lit(0))
    val syms = concat(
      slice(chars, lit(1), lit(1)),
      transform(slice(chars, lit(2), size(chars) - 1),
        c => concat(lit("##"), c)))
    concat(lit("  "), array_join(syms, "  "), lit("  "))
  }

  /** Adjacent-pair fan-out (the [[BpeTrain]] lambda-bound idiom). */
  private def pairs(w: Column): Column =
    element_at(
      transform(array(split(trim(w), "  ")), syms =>
        when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => concat(element_at(syms, i), lit(" "),
              element_at(syms, i + 1))))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Learn `rounds` WordPiece merges from `words(word, cnt)`; returns
    * (round, pair, merged, n, q) — merged in BERT vocab form.
    * Precondition: the corpus supports `rounds` merges. */
  def fit(words: DataFrame, rounds: Int): DataFrame =
    train(words, rounds)._2.reduce(_ unionAll _)

  /** Token-frequency table (token, n) after applying the learned
    * merges — tokens carry the `##` continuation marks. */
  def encodeTokens(words: DataFrame, rounds: Int): DataFrame =
    train(words, rounds)._1
      .select(col("cnt"), explode(split(trim(col("w")), "  ")).as("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("n"))

  private def train(
      words: DataFrame, rounds: Int): (DataFrame, Seq[DataFrame]) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var w = words
      .select(col("word"), initWord(col("word")).as("w"), col("cnt"))
      .localCheckpoint()
    var merges: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      val syms = w
        .select(col("cnt"), explode(split(trim(col("w")), "  ")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("cnt")).as("c"))
      val best = w
        .select(col("cnt"), explode(pairs(col("w"))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
        .withColumn("s1", element_at(split(col("pair"), " "), 1))
        .withColumn("s2", element_at(split(col("pair"), " "), 2))
        .join(syms.select(col("sym").as("s1"), col("c").as("c1")),
          Seq("s1"))
        .join(syms.select(col("sym").as("s2"), col("c").as("c2")),
          Seq("s2"))
        .select(col("pair"), col("n"),
          expr(s"(n * ${Scale}L) div (c1 * c2)").as("q"))
        .orderBy(col("q").desc, col("n").desc, col("pair"))
        .limit(1)
        .localCheckpoint() // 1 row: the round-r merge decision
      merges :+= best.select(lit(r).as("round"), col("pair"),
        expr("split(pair, ' ')[0] || substring(split(pair, ' ')[1], 3)")
          .as("merged"),
        col("n"), col("q"))
      w = w.crossJoin(broadcast(best.select(col("pair").as("__p"))))
        .select(col("word"), expr(
          """replace(w, ' ' || split(__p, ' ')[0] || '  ' ||
            |            split(__p, ' ')[1] || ' ',
            |        ' ' || split(__p, ' ')[0] ||
            |            substring(split(__p, ' ')[1], 3) || ' ')"""
            .stripMargin)
          .as("w"), col("cnt"))
        .localCheckpoint() // vocab-sized snapshot per round
    }
    (w, merges)
  }

  /** DuckDB twin: unrolled rounds over `rel(word, cnt)`. Emits
    * `wp0..wp$rounds` (working forms), `ws$i` (symbol counts) and
    * `wb$i` (per-round best pair with n and q). */
  def oracleCtes(rel: String, rounds: Int): String = {
    val base =
      s"""wp0 AS MATERIALIZED (
         |  SELECT word, '  ' || array_to_string(list_prepend(
         |      regexp_extract_all(word, '.')[1],
         |      list_transform(regexp_extract_all(word, '.')[2:],
         |        c -> '##' || c)), '  ') || '  ' AS w,
         |    cnt
         |  FROM $rel)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val prev = s"wp${i - 1}"
      s"""ws$i AS MATERIALIZED (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest(string_split(trim(w), '  ')) AS sym
         |    FROM $prev) __sy
         |  GROUP BY sym),
         |wc$i AS MATERIALIZED (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT cnt,
         |      unnest([s[j] || ' ' || s[j + 1] for j in range(1, len(s))])
         |        AS pair
         |    FROM (SELECT cnt, string_split(trim(w), '  ') AS s
         |      FROM $prev) __sp) __pr
         |  GROUP BY pair),
         |wb$i AS MATERIALIZED (
         |  SELECT pair, n,
         |    CAST((n * $Scale) // (l.c * r.c) AS BIGINT) AS q
         |  FROM wc$i p
         |  JOIN ws$i l ON l.sym = string_split(p.pair, ' ')[1]
         |  JOIN ws$i r ON r.sym = string_split(p.pair, ' ')[2]
         |  ORDER BY q DESC, n DESC, pair LIMIT 1),
         |wp$i AS MATERIALIZED (
         |  SELECT word, replace(w,
         |      ' ' || string_split(pair, ' ')[1] || '  ' ||
         |            string_split(pair, ' ')[2] || ' ',
         |      ' ' || string_split(pair, ' ')[1] ||
         |            substr(string_split(pair, ' ')[2], 3) || ' ') AS w,
         |    cnt
         |  FROM $prev, wb$i)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Merge-table SELECT over [[oracleCtes]]'s wb CTEs. */
  def oracleSelect(rounds: Int): String =
    (1 to rounds).map { i =>
      s"""SELECT $i AS round, pair,
         |  string_split(pair, ' ')[1] ||
         |    substr(string_split(pair, ' ')[2], 3) AS merged, n, q
         |FROM wb$i""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY round"

  /** Token-frequency SELECT over [[oracleCtes]]'s final wp CTE. */
  def oracleEncodeSelect(rounds: Int): String =
    s"""SELECT token, CAST(sum(cnt) AS BIGINT) AS n
       |FROM (SELECT cnt, unnest(string_split(trim(w), '  ')) AS token
       |  FROM wp$rounds) __tok
       |GROUP BY token
       |ORDER BY token""".stripMargin

  // ---- inference: greedy longest-match-first (the BERT tokenizer) ---

  /** Maximum word length segmentable at inference (the oracle's
    * per-position unroll bound — the [[UnigramLm.MaxWordLen]]
    * convention). */
  val MaxWordLen = 16

  /** BERT's WordpieceTokenizer: greedy maximum-munch against the
    * trained vocabulary — at each position take the LONGEST vocab
    * piece (`##`-prefixed when not word-initial); any position with no
    * match makes the whole word `[UNK]` (returned as None). NOTE this
    * is the published INFERENCE algorithm and deliberately not merge
    * replay: greedy segmentation of an unseen word can differ from
    * replaying the training merges — that divergence is the
    * documented WordPiece semantics (Devlin et al. 2019 §A; the
    * `corpus_bpe_apply` fallback is the replay alternative). */
  def greedySegment(word: String, vocab: Set[String]): Option[Seq[String]] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val prefix = if (pos == 0) "" else "##"
      val l = (math.min(word.length - pos, MaxWordLen) to 1 by -1)
        .find(l => vocab.contains(prefix + word.substring(pos, pos + l)))
      l match {
        case None => return None
        case Some(k) => out += prefix + word.substring(pos, pos + k)
          pos += k
      }
    }
    Some(out.toSeq)
  }

  /** Segment a HELD-OUT `(word)` relation with the vocabulary trained
    * on `words` — train + real inference composed (the
    * `corpus_unigram_encode` discipline). The vocabulary is collected
    * and broadcast (model-sized — distinct final symbols, the
    * [[UnigramLm.encode]] precedent); segmentation is a row-local
    * flatMap. Returns (word, seg, n_pieces); uncoverable words emit
    * BERT's `[UNK]` with n_pieces 1; words over [[MaxWordLen]] are
    * dropped (both engines filter identically). */
  def segmentHeldOut(
      heldOut: DataFrame, words: DataFrame, rounds: Int): DataFrame = {
    val spark = heldOut.sparkSession
    import spark.implicits._
    val vocab = train(words, rounds)._1
      .select(explode(split(trim(col("w")), "  ")).as("p"))
      .distinct().as[String].collect().toSet // model-sized
    heldOut
      .filter(length(col("word")).between(1, MaxWordLen))
      .select(col("word").cast("string")).distinct().as[String]
      .map { w =>
        greedySegment(w, vocab) match {
          case Some(ps) => (w, ps.mkString(" "), ps.size.toLong)
          case None => (w, "[UNK]", 1L)
        }
      }
      .toDF("word", "seg", "n_pieces")
  }

  /** DuckDB twin of [[segmentHeldOut]] over [[oracleCtes]]'s final wp
    * CTE and `heldRel(word)`: the greedy cursor walks one CTE per
    * character position (the [[UnigramLm]] DP-unroll discipline); at
    * each position the longest vocab match advances the cursor, a miss
    * latches `bad`. */
  def oracleApplyCtes(heldRel: String, rounds: Int): String = {
    val base =
      s"""wv AS MATERIALIZED (
         |  SELECT list(DISTINCT piece) AS ps
         |  FROM (SELECT unnest(string_split(trim(w), '  ')) AS piece
         |    FROM wp$rounds) __v),
         |gs0 AS MATERIALIZED (
         |  SELECT word, ps, 1 AS cur, '' AS seg, FALSE AS bad
         |  FROM (SELECT DISTINCT word FROM $heldRel
         |    WHERE length(word) BETWEEN 1 AND $MaxWordLen) __hw, wv)"""
        .stripMargin
    val steps = (1 to MaxWordLen).map { j =>
      val pieceOf = if (j == 1) "substr(word, cur, bl)"
      else "'##' || substr(word, cur, bl)"
      s"""gs$j AS MATERIALIZED (
         |  SELECT word, ps,
         |    CASE WHEN act AND bl IS NOT NULL THEN cur + bl
         |         ELSE cur END AS cur,
         |    CASE WHEN act AND bl IS NOT NULL THEN
         |        seg || (CASE WHEN seg = '' THEN '' ELSE ' ' END) ||
         |          $pieceOf
         |      ELSE seg END AS seg,
         |    CASE WHEN act AND bl IS NULL THEN TRUE ELSE bad END AS bad
         |  FROM (
         |    SELECT *,
         |      (NOT bad AND cur = $j AND cur <= length(word)) AS act,
         |      list_max(list_filter(
         |        [x for x in range(1, $MaxWordLen + 1)],
         |        l -> l <= length(word) - cur + 1 AND list_contains(ps,
         |          (CASE WHEN cur = 1 THEN '' ELSE '##' END) ||
         |            substr(word, cur, l)))) AS bl
         |    FROM gs${j - 1}) __g$j)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  /** Final SELECT over [[oracleApplyCtes]]'s last position CTE. */
  def oracleApplySelect: String =
    s"""SELECT word,
       |  CASE WHEN bad THEN '[UNK]' ELSE seg END AS seg,
       |  CAST(CASE WHEN bad THEN 1
       |    ELSE len(string_split(seg, ' ')) END AS BIGINT) AS n_pieces
       |FROM gs$MaxWordLen ORDER BY word""".stripMargin
}
