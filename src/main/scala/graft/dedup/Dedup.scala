package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.TextAnalysis

/** Deduplication operators for training-data pipelines, each designed as
  * the shuffle-minimal Spark shape that survives a 100 TB corpus:
  *
  *  - exact:    one groupBy on a 128-bit fingerprint (a single shuffle of
  *              (hash, id) pairs — never the document bodies).
  *  - n-gram Jaccard: shingle explode (narrow) -> shared-shingle candidate
  *              join -> count-based exact Jaccard. The candidate join is
  *              the classic inverted-index trick: only documents sharing
  *              at least one shingle ever meet, so the quadratic pair
  *              space is never materialized.
  *  - MinHash+LSH: per-document k-hash signature (one aggregation), band
  *              keys, equi-join on (band, key) — candidate generation cost
  *              is linear in corpus size; only candidates get the exact
  *              Jaccard rescore.
  *  - SimHash:  bit-vote aggregation to one 32-bit signature per document;
  *              near-dup = small Hamming distance.
  *
  * All hash math derives from md5 (hex -> integer), which exists in both
  * Spark and the DuckDB oracle — signatures are engine-independent, so
  * even the LSH path is hash-checked, not just "rows > 0".
  *
  * Skew note: a pathologically hot shingle (stopword phrase) fans the
  * uncapped candidate join quadratically. The DEFAULT n-gram entry is
  * therefore [[ngramJaccardPairsAtScale]] — df-capped candidate
  * generation with exact scores and an absolute cap ceiling — and
  * [[ngramJaccardPairs]] remains the uncapped reference formulation
  * the oracle mirrors.
  */
object Dedup {

  val ShingleSize = 3
  val MinhashK = 8
  /** 2 bands x 4 rows: candidate probability ~ 1-(1-j^4)^2 — near 1 for
    * true near-dups (j >= 0.95) while suppressing this corpus's high
    * baseline similarity (j ~ 0.2 -> 0.3% candidate rate; 2-row bands
    * would admit ~16% of ALL pairs as candidates). */
  val Bands = 2
  val RowsPerBand: Int = MinhashK / Bands
  val JaccardThreshold = 0.8
  val SimhashBits = 32
  val HammingMax = 3

  /** Default simhash group cap for the multi-signal triage composition
    * (dedup_multisignal): a clone farm collapses onto one signature, so
    * an uncapped signal squares the pair output (the 10x canary
    * measured ~278M pairs). 16 representatives per identical-signature
    * group keep every cross-group near-dup relation visible while
    * bounding intra-group pairs at C(16,2)=120; exact_dedup already
    * reports over-cap groups in full as clusters. */
  val MultisigMaxGroup = 16

  /** Word-shingle array (size 3) of a whitespace-tokenized text column;
    * documents with fewer than 3 words get no shingles.
    *
    * The tokenized array is bound ONCE as a lambda variable (the
    * single-element transform): referencing `split(text)` directly inside
    * the per-shingle lambda would re-split the whole text for every
    * element_at — Catalyst does not common-subexpression-eliminate into
    * lambda bodies, which made shingling quadratic in document length
    * (measured 9x slowdown at sf0.1). */
  def shingles(text: Column): Column =
    element_at(
      transform(array(split(text, " ")), ws =>
        when(size(ws) < ShingleSize, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), size(ws) - (ShingleSize - 1)),
            i => concat_ws("|", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2))))),
      1)

  /** Deterministic 32-bit-range hash of a string via md5 (engine-neutral). */
  def md5Hash32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 8), 16, 10).cast("long")

  /** Per-document distinct shingle SETS — ZERO shuffle: shingling is
    * row-local, so the distinct set is array_distinct over the row's own
    * shingle array (the r01-r02 explode + groupBy/collect_set shape paid
    * a |corpus|x|shingles|-row shuffle for a per-row computation). Every
    * downstream consumer (signatures, counts, the inverted index)
    * derives narrowly from this. */
  def docShingleSets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // spread narrow inputs first: a single-split test file would
    // otherwise shingle on one core (no-op on well-split inputs)
    graft.relational.Scale.spreadIfNarrow(docs)
      .select(col(idCol).as("doc_id"),
        array_distinct(shingles(col(textCol))).as("ss"))
      // docs under ShingleSize words had no rows in the explode shape;
      // keep that contract (an empty-set row would otherwise flow into
      // signatures as all-NULL and band-join with other empty docs)
      .filter(size(col("ss")) > 0)

  /** (doc_id, shingle) pairs, distinct (narrow explode of the sets). */
  def docShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docShingleSets(docs, idCol, textCol)
      .select(col("doc_id"), explode(col("ss")).as("s"))

  /** Exact duplicate groups by normalized-content fingerprint:
    * (fingerprint, n, ids_csv) for groups with more than one member. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_list(col("doc_id"))), ",").as("ids_csv"))
      .filter(col("n") > 1)

  /** Exact pairwise n-gram Jaccard over documents that share at least one
    * shingle, thresholded. Output: (da, db, jaccard). */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = JaccardThreshold): DataFrame = {
    // checkpoint: three consumers (both self-join sides + counts) read
    // these sets. The r04 zero-shuffle rewrite removed the groupBy whose
    // Exchange the self-join used to REUSE, so without a checkpoint the
    // full split+shingle+distinct work re-ran once per consumer
    // (measured 2.8x on the bench — the r04 regression).
    val sets = docShingleSets(docs, idCol, textCol).localCheckpoint()
    // join on a 64-bit hash of the shingle, not the string: the
    // inverted-index exchange carries 8-byte keys instead of ~25-byte
    // phrases. The shared count is then over distinct shingle HASHES —
    // it differs from the string count only if two DIFFERENT shingles of
    // the same doc pair collide in 64 bits (~2^-64 per shingle pair; the
    // standard accepted trade at corpus scale, and the oracle gate
    // verifies it holds on the test corpora).
    val sh = sets.select(col("doc_id"),
      explode(col("ss")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    val counts = sets.select(col("doc_id"), size(col("ss")).cast("long").as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("doc_id", "da")
        .withColumnRenamed("n", "na"), "da")
      .join(counts.withColumnRenamed("doc_id", "db")
        .withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** Default document-frequency cap for at-scale candidate generation:
    * 5% of the corpus, floored at 64 and CEILINGED at 1024.
    *
    * A shingle present in >5% of all documents is a stopword phrase — it
    * contributes O(df^2) candidate pairs while carrying no near-dup
    * signal (a >=0.8-Jaccard pair shares most of its shingles, which are
    * overwhelmingly pair-specific). The floor keeps the cap from binding
    * at test scale, where the oracle gate proves output identity with
    * the uncapped operator. The ceiling is the actual 100 TB guard: a
    * FRACTIONAL cap alone is no cap at corpus scale (5% of 10^10
    * documents still admits 10^17 pairs from one shingle); 1024 bounds
    * any single shingle's pair fan-out at ~500k — the standard absolute
    * df cutoff for inverted-index dedup. */
  def defaultDfCap(nDocs: Long): Long =
    math.max(64L, math.min(1024L, nDocs / 20L))

  /** [[ngramJaccardPairs]] with a document-frequency cap on the inverted
    * index: shingles appearing in more than `maxDf` documents are
    * excluded from CANDIDATE GENERATION (a stopword-phrase shingle fans
    * the join quadratically — the skew hazard in this file's header),
    * but the Jaccard rescore still uses the FULL shingle sets, so scores
    * are exact. Approximation is one-sided and precise: only a pair
    * sharing NO shingle below the cap can be missed. With maxDf at the
    * corpus size, output is identical to the uncapped operator.
    *
    * This is the AT-SCALE DEFAULT for n-gram dedup (the bench entry runs
    * it with [[defaultDfCap]]): the uncapped operator is the one
    * remaining quadratic hazard under a hot shingle.
    *
    * Plan shape — the SAME groupBy-count inverted-index join as the
    * uncapped operator (a distinct-candidate-pairs + full-set
    * array_intersect rescore was measured 4x slower at sf0.1: on a
    * high-baseline-similarity corpus nearly every pair shares a
    * shingle, so the candidate relation is join-sized and dragging each
    * document's whole shingle array through it dwarfs the counting
    * join). The exact intersection splits by the cap:
    *
    *   |A n B|  =  shared RARE shingles (the capped counting join)
    *             + shared HOT shingles (array_intersect of per-doc HOT
    *               sets — bounded by |hot| per doc, usually empty)
    *
    * Hot shingles (df > cap) are a SMALL relation by construction (at
    * most |occurrences|/cap values), broadcast both to the anti-join
    * that drops them from the index and to the per-doc hot-set
    * collection. Scores are exact for every emitted pair; only a pair
    * sharing NO rare shingle is missed (one-sided, as documented). */
  def ngramJaccardPairsCapped(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long,
      threshold: Double = JaccardThreshold): DataFrame =
    ngramJaccardCappedFromSets(
      docShingleSets(docs, idCol, textCol).localCheckpoint(),
      maxDf, threshold)

  /** [[ngramJaccardPairsCapped]] with the cap DERIVED from the corpus
    * ([[defaultDfCap]]) — the at-scale default entry. Counting the
    * checkpointed sets costs one cached-block scan, not a second pass
    * over the raw corpus. */
  def ngramJaccardPairsAtScale(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = JaccardThreshold): DataFrame = {
    val sets = docShingleSets(docs, idCol, textCol).localCheckpoint()
    ngramJaccardCappedFromSets(sets, defaultDfCap(sets.count()), threshold)
  }

  private def ngramJaccardCappedFromSets(
      sets: DataFrame,
      maxDf: Long,
      threshold: Double): DataFrame = {
    // 8-byte hashed keys for every exchange the index takes part in,
    // exactly as in the uncapped operator (same collision trade, same
    // oracle-gate verification)
    val sh = sets.select(col("doc_id"), explode(col("ss")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    // the df pass: ONE count-aggregate exchange of the 8-byte index —
    // the whole price of skew protection when the cap is slack. (A
    // fused posting-list variant — one groupBy producing df + bounded
    // doc lists + in-row pair expansion — was measured 30% SLOWER at
    // sf0.1: the typed-aggregator hop costs more than the exchange it
    // saves, and Catalyst reuses the self-join's exchange anyway.)
    val hot = sh.groupBy(col("s"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("s"))
      .localCheckpoint() // small in sane regimes: <= |occurrences|/cap keys
    // DRIVER-side branch on the hot relation: with no hot shingle
    // (the oracle-gate regime, and most real corpora under a sane cap)
    // the plan IS the uncapped plan — no anti-join, no hot-set joins,
    // nothing to pay but the df pass above. The branch decides plan
    // SHAPE only; emitted scores are exact either way. The count is one
    // scan of the checkpointed blocks and ALSO sizes the broadcast
    // decision below.
    val nHot = hot.count()
    val hotIsEmpty = nHot == 0L
    // |occurrences|/maxDf is only "tiny" while the corpus is: at the
    // 100 TB design point it can reach billions of keys, and a FORCED
    // broadcast hint bypasses autoBroadcastJoinThreshold's size check —
    // so gate the hint on estimated bytes (~40 B/key in the hashed
    // relation, same budget as the simhash band build) and let the
    // anti-/hot-set joins fall back to shuffle joins beyond it.
    def hotHinted: DataFrame =
      if (nHot * 40L <= SimhashBroadcastMaxBytes) broadcast(hot) else hot
    val shRare =
      if (hotIsEmpty) sh else sh.join(hotHinted, Seq("s"), "left_anti")
    val interRare = shRare.as("a")
      .join(shRare.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("ir"))
    val counts = sets.select(col("doc_id"), size(col("ss")).cast("long").as("n"))
    val base = interRare
      .join(counts.withColumnRenamed("doc_id", "da")
        .withColumnRenamed("n", "na"), "da")
      .join(counts.withColumnRenamed("doc_id", "db")
        .withColumnRenamed("n", "nb"), "db")
    val withI =
      if (hotIsEmpty) base.withColumn("i", col("ir"))
      else {
        // exact intersection = shared rare (counted above) + shared hot
        // (array_intersect of per-doc HOT sets — bounded by the doc's
        // own shingle count, usually empty)
        val hotSets = sh.join(hotHinted, Seq("s"))
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("s"))).as("hs"))
        val emptyHs = array().cast("array<bigint>")
        base
          .join(hotSets.select(col("doc_id").as("da"), col("hs").as("ha")),
            Seq("da"), "left")
          .join(hotSets.select(col("doc_id").as("db"), col("hs").as("hb")),
            Seq("db"), "left")
          .withColumn("i", col("ir") +
            size(array_intersect(coalesce(col("ha"), emptyHs),
              coalesce(col("hb"), emptyHs))).cast("long"))
      }
    withI
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** CONTAINMENT near-dup pairs: overlap coefficient
    * |A ∩ B| / min(|A|, |B|) over the same shingle sets as
    * [[ngramJaccardPairs]]. The symmetric Jaccard misses a short
    * document EMBEDDED in a long one (the intersection is the whole
    * short set, but the union is dominated by the long one); the
    * overlap coefficient is the standard containment test for exactly
    * that case — quote extraction, boilerplate wrapping, excerpt pages.
    * Same inverted-index plan, same skew caveat (the df-capped path of
    * the Jaccard operator applies unchanged if needed at scale).
    * Output: (da, db, containment). */
  def ngramContainmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double): DataFrame = {
    val sets = docShingleSets(docs, idCol, textCol).localCheckpoint()
    val sh = sets.select(col("doc_id"), explode(col("ss")).as("s0"))
      .select(col("doc_id"), xxhash64(col("s0")).as("s"))
    val counts = sets.select(col("doc_id"), size(col("ss")).cast("long").as("n"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
      .join(counts.withColumnRenamed("doc_id", "da")
        .withColumnRenamed("n", "na"), "da")
      .join(counts.withColumnRenamed("doc_id", "db")
        .withColumnRenamed("n", "nb"), "db")
      .withColumn("containment",
        round(col("i").cast("double") / least(col("na"), col("nb")), 4))
      .filter(col("containment") >= threshold)
      .select(col("da"), col("db"), col("containment"))
  }

  def ngramContainmentOracle(docsRel: String, threshold: Double): String =
    s"""WITH ${shinglesCte(docsRel)},
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da, db, containment FROM (
       |  SELECT da, db,
       |    round(i * 1.0 / least(ca.n, cb.n), 4) AS containment
       |  FROM inter
       |  JOIN cnt ca ON ca.doc_id = da
       |  JOIN cnt cb ON cb.doc_id = db) __c
       |WHERE containment >= $threshold
       |ORDER BY da, db""".stripMargin

  /** EXACT substring dedup spans (Lee et al. 2021, arXiv:2107.06499 —
    * the suffix-array method's semantics re-expressed relationally) with
    * a document-frequency cap on the gram index: a position is
    * duplicated iff some corpus-duplicated `l`-token window covers it,
    * and the output spans are the per-doc islands merge of those
    * windows. Grams with df above `maxDf` are DROPPED before the merge.
    * The approximation is one-sided and precise: a dropped gram has
    * df > maxDf > 1, so it IS duplicated — dropping it can only shrink
    * or split spans (lose recall on ultra-hot boilerplate, which the
    * line-level dedup pass targets anyway), never emit a false span.
    * With maxDf at the corpus size, output is identical to the uncapped
    * formulation.
    *
    * Plan shape — why this beats the compact single-window form at
    * scale: the uncapped query computes df as
    * `count over Window.partitionBy(h)`, which pins EVERY occurrence of
    * a hot gram (a boilerplate navigation phrase shared by millions of
    * docs) onto ONE task, and AQE's skew splitting does not apply to
    * window exchanges. Here df comes from a groupBy aggregate — partial
    * aggregation collapses a hot gram to one row per map task, so the
    * reduce side sees at most `numPartitions` rows per gram — and the
    * kept-gram set (every duplicated gram at or below the cap, at most
    * |occurrences|/2 keys) comes back via a LEFT SEMI join, where a
    * skewed probe-side partition is exactly what AQE skew-join
    * splitting handles. The occurrence relation is computed twice (once
    * aggregated, once joined) — two narrow scan+explode passes instead
    * of persisting a corpus-sized exploded relation, the standard trade
    * at the 100 TB design point. The islands merge itself is PER-DOC
    * windows (partitioned, never global), unchanged from the uncapped
    * form.
    *
    * Output: (doc_id, span_id, start_tok, end_tok, n_tok), 1-based
    * token positions, spans closed under gram overlap (gap > l starts a
    * new island). */
  def substringDupSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      maxDf: Long = Long.MaxValue): DataFrame = {
    def occ = substrGramOccurrences(docs, idCol, textCol, l)
    val kept = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
      .select(col("h"))
    substrIslandsMerge(occ.join(kept, Seq("h"), "left_semi"), l)
  }

  /** [[substringDupSpans]]'s semantics in the COMPACT single-pass form:
    * df as one `count over partitionBy(h)` window on the gram shuffle
    * (no cap, no second scan). One exchange total, but every occurrence
    * of a hot gram lands on one task and AQE skew splitting does not
    * apply to window exchanges — use the capped operator when the
    * corpus can contain boilerplate grams (the 100 TB default). */
  def substringDupSpansWindowed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    substrIslandsMerge(
      substrGramOccurrences(docs, idCol, textCol, l)
        .withColumn("c", count(lit(1))
          .over(Window.partitionBy(col("h"))))
        .filter(col("c") > 1)
        .drop("c"),
      l)
  }

  /** Distinct `l`-token-gram fingerprints of an eval suite — the
    * decontamination key at PUBLISHED gram lengths (GPT-3 checks
    * 13-grams, Lee et al. 8+): 3-shingle overlap saturates on a large
    * corpus (natural collisions flag most documents), while a shared
    * 8-gram is near-certain genuine overlap. Column: `h` (xxhash64,
    * internal-only — see [[substringDupSpans]]'s collision note). */
  def evalGramHashes(
      evalSet: DataFrame, idCol: String, textCol: String,
      l: Int): DataFrame =
    substrGramOccurrences(evalSet, idCol, textCol, l)
      .select(col("h")).distinct()

  /** Corpus documents sharing at least `minShared` DISTINCT `l`-grams
    * with the eval suite — long-gram decontamination, same broadcast
    * plan shape as [[contamination]] (eval suites are bounded small by
    * definition; the corpus side is one narrow gram explode + one
    * groupBy(doc_id), no self-join). Output: (doc_id, n_shared). */
  def gramContamination(
      corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String,
      l: Int, minShared: Long): DataFrame = {
    val ev = broadcast(evalGramHashes(evalSet, idCol, textCol, l))
    substrGramOccurrences(corpus, idCol, textCol, l)
      .select(col("doc_id"), col("h")).distinct()
      .join(ev, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The largest per-gram row count admitted to the duplicate-occurrence
    * relation under `maxDf` — the single-key concentration the df cap
    * bounds. With maxDf at Long.MaxValue this is the biggest h-partition
    * the windowed form's sort must swallow on one task; under a cap it
    * is at most the cap. (Profiler instrumentation, not an operator.) */
  def substringDupSpansMaxPartitionRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int,
      maxDf: Long): Long =
    substrGramOccurrences(docs, idCol, textCol, l)
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1 && col("df") <= maxDf)
      .agg(coalesce(max(col("df")), lit(0L)).as("m"))
      .head().getLong(0)

  /** (doc_id, p, h): 1-based position and 64-bit fingerprint of every
    * `l`-token window of the [a-z]+-tokenized lowercased text.
    *
    * The token array is bound ONCE as a lambda variable (the
    * [[shingles]] single-element-transform idiom): referencing the
    * regexp_extract_all directly inside the per-gram lambda would
    * re-tokenize the whole document for EVERY gram — Catalyst does not
    * common-subexpression-eliminate into lambda bodies, which made the
    * gram pass quadratic in document length (surfaced by the r9 10x
    * canary: 70.5s -> 13.9s on the capped operator at 50k docs).
    *
    * The fingerprint is xxhash64, not md5: `h` is an INTERNAL grouping
    * key — the output is spans, so no hash ever surfaces — and an
    * 8-byte long makes every occurrence-relation exchange a fraction
    * of the 32-char md5 hex string's, at far lower per-gram compute.
    * Same collision trade as the ngram inverted index (file header):
    * the DuckDB twin keys on md5 internally, and the span gates prove
    * result parity. */
  private def substrGramOccurrences(
      docs: DataFrame, idCol: String, textCol: String, l: Int): DataFrame = {
    val grams = element_at(
      transform(
        array(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"),
          lit(0))),
        ts => when(size(ts) >= l,
          transform(sequence(lit(1), size(ts) - (l - 1)),
            i => xxhash64(array_join(slice(ts, i, lit(l)), " "))))
          .otherwise(array().cast("array<bigint>"))),
      1)
    docs
      .select(col(idCol).as("doc_id"), posexplode(grams).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("h"))
  }

  /** Per-doc islands merge of duplicated gram positions (gap > l starts
    * a new span) — partitioned windows, never global. */
  private def substrIslandsMerge(occ: DataFrame, l: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    occ
      .withColumn("ns",
        when(col("p") - lag(col("p"), 1).over(w) > l, 1).otherwise(0))
      .withColumn("span_id", sum(col("ns")).over(w))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("p")).as("start_tok"),
        (max(col("p")) + (l - 1)).as("end_tok"))
      .withColumn("n_tok", col("end_tok") - col("start_tok") + 1)
  }

  /** DuckDB twin of [[substringDupSpans]] (select list:
    * doc_id, span_id, start_tok, end_tok, n_tok — unordered; append
    * ORDER BY at the call site). `maxDf` mirrors the cap. */
  def substringDupSpansOracle(docsRel: String, l: Int, maxDf: Long): String =
    s"""WITH sdtok AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS a
       |  FROM $docsRel __sd),
       |sdg AS (
       |  SELECT doc_id, i AS p,
       |    md5(array_to_string(a[i:i+${l - 1}], ' ')) AS h
       |  FROM (SELECT doc_id, a,
       |      unnest(range(1, len(a) - ${l - 2})) AS i
       |    FROM sdtok) __sdi),
       |sdd AS (SELECT h FROM sdg GROUP BY h
       |  HAVING count(*) > 1 AND count(*) <= $maxDf),
       |sdo AS (SELECT g.doc_id, g.p FROM sdg g JOIN sdd USING (h)),
       |sds AS (
       |  SELECT doc_id, p,
       |    CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
       |        > $l THEN 1 ELSE 0 END AS ns
       |  FROM sdo),
       |sdi AS (
       |  SELECT doc_id, p,
       |    CAST(sum(ns) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
       |  FROM sds)
       |SELECT doc_id, span_id, min(p) AS start_tok,
       |  max(p) + ${l - 1} AS end_tok,
       |  max(p) + ${l - 1} - min(p) + 1 AS n_tok
       |FROM sdi GROUP BY doc_id, span_id""".stripMargin

  /** Benchmark DECONTAMINATION (C4/Dolma-style): flag corpus documents
    * sharing at least `minShared` distinct shingles with ANY document of
    * an evaluation set — the overlap check a training corpus runs
    * against its benchmark suites before training.
    *
    * Plan shape: the eval set's distinct shingle hashes BROADCAST (an
    * eval suite is bounded small by definition — documents, not a
    * corpus; the hint is a hard assumption, documented, not size-gated
    * like the hot-shingle relation), the corpus side stays a row-local
    * shingle explode joined map-side, then ONE groupBy(doc_id) count.
    * No corpus self-join, no shuffle of bodies — linear at 100 TB.
    * Join keys are 64-bit shingle hashes (the file-header collision
    * trade; the oracle joins the strings and the gate proves parity).
    *
    * Output: (doc_id, n_shared) for non-eval docs meeting the bar. */
  def contamination(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Long): DataFrame =
    contaminationAgainstHashes(corpus,
      evalShingleHashes(evalSet, idCol, textCol), idCol, textCol, minShared)

  /** The eval suite's distinct shingle-hash relation — compute ONCE
    * (and checkpoint, if probing repeatedly: the streaming corpus build
    * reuses it across every micro-batch). Column: `h` (xxhash64). */
  def evalShingleHashes(
      evalSet: DataFrame, idCol: String, textCol: String): DataFrame =
    docShingles(evalSet, idCol, textCol)
      .select(xxhash64(col("s")).as("h")).distinct()

  /** [[contamination]] against a PRECOMPUTED eval hash relation. */
  def contaminationAgainstHashes(
      corpus: DataFrame,
      evalHashes: DataFrame,
      idCol: String,
      textCol: String,
      minShared: Long): DataFrame = {
    val cs = docShingles(corpus, idCol, textCol)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    cs.join(broadcast(evalHashes), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Universal-hash family over one md5 base hash: h_i(s) =
    * (A_i * H(s) + B_i) mod P with P prime — one md5 per shingle instead
    * of k, same LSH guarantees. Constants are fixed so the DuckDB oracle
    * reproduces signatures exactly. */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = 2L * i + 3L
  def minhashB(i: Int): Long = 7L * i + 1L

  /** MinHash signature columns h0..h{k-1} per document. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val base = md5Hash32(col("s"), "mh:")
    val hs = (0 until MinhashK).map(i =>
      min((base * minhashA(i) + minhashB(i)) % MinhashP).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(hs.head, hs.tail: _*)
  }

  /** MinHash signatures computed ROW-LOCALLY from per-doc shingle sets —
    * zero shuffle, identical values to [[minhashSignatures]] (min over
    * the same hash multiset). Since r04 the whole signature is ONE
    * codegen'd pass via the native [[graft.functions.MinhashSig]]
    * expression (one md5 per shingle, all K minima updated in a tight
    * loop) — the lambda twin below walked the array K+1 times through
    * interpreted closures. The explode + 64-way-agg shape both replace
    * shuffled |corpus|x|shingles| rows to compute a per-row value. */
  def minhashSignaturesFromSets(sets: DataFrame): DataFrame = {
    val coeffA = (0 until MinhashK).map(minhashA)
    val coeffB = (0 until MinhashK).map(minhashB)
    sets.select(col("doc_id"),
        graft.functions.MinhashSig
          .minhash_sig(col("ss"), coeffA, coeffB, MinhashP).as("__mh"))
      .select(
        col("doc_id") +:
          (0 until MinhashK).map(i =>
            element_at(col("__mh"), i + 1).as(s"h$i")): _*)
  }

  /** Pure-built-ins twin of [[minhashSignaturesFromSets]] — the semantic
    * REFERENCE the native expression is property-spec-pinned against,
    * and the shape the DuckDB oracle CTEs mirror. */
  def minhashSignaturesFromSetsLambda(sets: DataFrame): DataFrame = {
    val hashed = sets.select(col("doc_id"),
      transform(col("ss"), s => md5Hash32(s, "mh:")).as("hb"))
    hashed.select(
      col("doc_id") +:
        (0 until MinhashK).map(i =>
          array_min(transform(col("hb"), x =>
            (x * minhashA(i) + minhashB(i)) % MinhashP)).as(s"h$i")): _*)
  }

  /** LSH candidate pairs (shared band) -> exact Jaccard rescore.
    *
    * Unlike [[ngramJaccardPairs]] (whose inverted-index join IS the
    * algorithm), here only the few LSH candidates need exact Jaccard, so
    * the rescore joins each candidate pair against per-document shingle
    * SETS and intersects in-place — the shared-shingle join over the whole
    * corpus never happens. */
  /** Band-bucket admission cap for LSH candidate generation: a bucket
    * holding B documents contributes O(B^2) candidate pairs, so one
    * 10^6-member near-identical cluster (template boilerplate that
    * survived exact dedup) is the LSH path's quadratic hazard — the
    * band-join twin of the hot-shingle problem. Buckets above the cap
    * are excluded from candidate generation; the miss is one-sided
    * (a pair is lost only when EVERY band it shares is over the cap —
    * i.e. within a giant homogeneous cluster, which exact dedup or the
    * capped output's connected components already represent). 1024
    * bounds any bucket's fan-out at ~500k pairs.
    *
    * This cap is the DEFAULT for [[minhashLshPairs]] (pass
    * `Long.MaxValue` for the uncapped reference form). Its recall
    * contract is pinned twice: DedupCappedSpec (cap semantics on
    * synthetic clusters) and the hash-checked gate query
    * `minhash_lsh_capped`, whose corpus makes the cap BIND against a
    * DuckDB oracle replicating the per-bucket admission filter. */
  val MaxBandBucket = 1024L

  /** ONE fused 64-bit band key per (doc, band) — band index hashed in —
    * instead of a (bi, "h1_h2_…" string) pair: the self-join exchange
    * carries 8 bytes per band row. Equal bands always collide to the
    * same key, so every true candidate survives; a cross-band collision
    * only ADDS a candidate, and the exact-Jaccard rescore drops it —
    * the DEFINED output is unchanged. */
  def minhashBandKeys(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"),
      explode(array((0 until Bands).map { b =>
        val hs = (0 until RowsPerBand)
          .map(r => col(s"h${RowsPerBand * b + r}"))
        xxhash64(lit(b) +: hs: _*)
      }: _*)).as("bk"))

  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBandBucket): DataFrame = {
    val sets = docShingleSets(docs, idCol, textCol).localCheckpoint()
    val sig = minhashSignaturesFromSets(sets)
    val bands = minhashBandKeys(sig)
    // bucket-size admission as a WINDOW count over the band key (no
    // census job, no checkpoint, no driver action — a separate count +
    // anti-join guard measured +0.4s per query in extra jobs). Regime
    // note: in the AT-SCALE shuffle-join regime the window's bk
    // exchange is the very exchange the self-join needs, so the guard
    // rides it for free; at bench scale the self-join is a BROADCAST
    // hash join (PLANS.md), so there the window adds the only exchange
    // — the measured +0.26s is that, accepted as the guard's price. A
    // hot bucket's rows land on one window task, but the work is
    // LINEAR in the bucket (16-byte rows) — the quadratic part is
    // exactly what the filter prevents.
    val admitted = bands
      .withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bk"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val cand = admitted.as("a")
      .join(admitted.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val shSets = sets.select(col("doc_id"), col("ss"),
      size(col("ss")).cast("long").as("n"))
    cand
      .join(shSets.select(col("doc_id").as("da"), col("ss").as("ssa"),
        col("n").as("na")), "da")
      .join(shSets.select(col("doc_id").as("db"), col("ss").as("ssb"),
        col("n").as("nb")), "db")
      .withColumn("i", size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** Cross-corpus near-duplicate probe: LSH pairs BETWEEN two document
    * relations — the "don't re-ship what the last publish shipped"
    * gate. Candidates come from an equi-join of the two sides' band
    * keys (never a self-join of either side: the published corpus is
    * not re-paired against itself, and at deployment scale the `pub`
    * band relation is the PERSISTED index
    * [[graft.dedup.IncrementalDedup]] maintains, probed not rebuilt).
    * Candidate-only exact-Jaccard rescore, identical rounding and
    * threshold semantics to [[minhashLshPairs]]. `maxBucket` admission
    * applies per side per band bucket (a hot bucket's cost here is
    * |pub bucket| x |inc bucket|).
    *
    * Output: (pub_id, new_id, jaccard) — one row per incoming document
    * per published near-duplicate. */
  def minhashLshPairsBetween(
      pub: DataFrame,
      inc: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBandBucket): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))
    def sideBands(sets: DataFrame, outId: String) =
      minhashBandKeys(minhashSignaturesFromSets(sets))
        .withColumn("__bn", count(lit(1)).over(w))
        .filter(col("__bn") <= maxBucket)
        .select(col("doc_id").as(outId), col("bk"))
    val pubSets = docShingleSets(pub, idCol, textCol).localCheckpoint()
    val incSets = docShingleSets(inc, idCol, textCol).localCheckpoint()
    val cand = sideBands(pubSets, "pub_id")
      .join(sideBands(incSets, "new_id"), "bk")
      .select(col("pub_id"), col("new_id"))
      .distinct()
    val ps = pubSets.select(col("doc_id").as("pub_id"),
      col("ss").as("ssa"), size(col("ss")).cast("long").as("na"))
    val is = incSets.select(col("doc_id").as("new_id"),
      col("ss").as("ssb"), size(col("ss")).cast("long").as("nb"))
    cand
      .join(ps, "pub_id")
      .join(is, "new_id")
      .withColumn("i",
        size(array_intersect(col("ssa"), col("ssb"))).cast("long"))
      .withColumn("jaccard", round(col("i").cast("double")
        / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("pub_id"), col("new_id"), col("jaccard"))
  }

  /** MinHash-LSH acceptance gate (the dedup analog of
    * `IvfPq.recallEval`): measures THIS band configuration's candidate
    * quality against the exact inverted-index Jaccard ground truth —
    * the evaluation an LSH rollout runs once per (bands, rowsPerBand,
    * cap) choice before trusting it on the corpus.
    *
    * One row: `n_truth` exact pairs >= threshold, `n_cand` distinct
    * band-collision candidates, `n_found` candidates that are true
    * pairs, `recall_ppm` = found/truth and `cand_precision_ppm` =
    * found/cand — both EXACT integer divisions (no float path, so the
    * measurement itself hash-checks). Precision here is the
    * wasted-rescore-work metric: every non-true candidate still pays an
    * exact-Jaccard rescore at corpus scale.
    *
    * Scale shape: ONE shingle-set checkpoint feeds truth, signatures
    * and candidates. The ground-truth side reuses the DF-CAPPED exact
    * generator ([[ngramJaccardPairsCapped]]'s core) at
    * [[defaultDfCap]], so a hot shingle cluster cannot square the
    * truth join at a bigger corpus — the once-per-config price stays
    * ~linear (LshRecallCapSpec pins capped == uncapped truth on the
    * gate corpus, and the 10x canary tracks growth). Candidates bucket
    * by the EXACT (band index, key string) pair — not the fused 64-bit
    * band hash the production pair generator uses — because here the
    * raw candidate COUNT is the measured output: minhashLshPairs can
    * afford hash-fused keys (a cross-band collision only adds a
    * candidate the exact rescore drops), but this eval has no rescore
    * downstream of `n_cand`, so it buys exactness instead of the
    * narrower key. Everything downstream of the sets is (da, db)
    * narrow. */
  def lshRecallEval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = JaccardThreshold,
      maxBucket: Long = MaxBandBucket): DataFrame = {
    val sets = docShingleSets(docs, idCol, textCol).localCheckpoint()
    // exact ground truth — the df-capped inverted-index generator from
    // the SHARED sets checkpoint (scores exact; only a pair sharing NO
    // rare shingle can be missed, and the cap's floor keeps it slack on
    // the oracle-gate corpora — equality pinned by LshRecallCapSpec)
    val truth = ngramJaccardCappedFromSets(
        sets, defaultDfCap(sets.count()), threshold)
      .select(col("da"), col("db"))
      .localCheckpoint()
    // candidates: same banding + bucket admission as minhashLshPairs,
    // but keyed by the exact (band index, joined-minhash string) so
    // n_cand is collision-free by construction
    val sig = minhashSignaturesFromSets(sets)
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until Bands).map { b =>
        concat_ws("_", (0 until RowsPerBand)
          .map(r => col(s"h${RowsPerBand * b + r}")): _*)
      }: _*)).as(Seq("bi", "bk")))
    val admitted = bands
      .withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bi"), col("bk"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val cand = admitted.as("a")
      .join(admitted.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
      .localCheckpoint()
    val found = cand.join(truth, Seq("da", "db"), "left_semi")
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_truth"), col("n_cand"), col("n_found"),
        expr("n_found * 1000000L div n_truth").as("recall_ppm"),
        expr("n_found * 1000000L div n_cand").as("cand_precision_ppm"))
  }

  /** DuckDB twin of [[lshRecallEval]]: reuses the [[minhashLshCtes]]
    * chain for signatures / bands / admitted candidates (its `jac` and
    * `lshpairs` CTEs go unreferenced here, so DuckDB never executes
    * them), re-buckets nothing — the chain's `cand` already keys by the
    * exact (band index, key string) pair the Spark side now uses — and
    * rebuilds the TRUTH side as the df-capped exact generator
    * ([[ngramJaccardPairsCapped]]'s arithmetic: rare-shingle counting
    * join + hot-set intersection add-back, scores exact).
    *
    * Multiply-referenced CTEs (`cand` via `candm`, `hot`, `truth`) are
    * AS MATERIALIZED per the repo's oracle rule — inlining would
    * re-execute the banding subtree and the quadratic truth join once
    * per reference. */
  def lshRecallEvalOracle(
      docsRel: String,
      threshold: Double,
      maxBucket: Long = MaxBandBucket): String =
    s"""WITH ${minhashLshCtes(docsRel, threshold, maxBucket)},
       |candm AS MATERIALIZED (SELECT da, db FROM cand),
       |capv AS (
       |  SELECT greatest(64, least(1024, count(DISTINCT doc_id) // 20)) AS cap
       |  FROM sh),
       |hot AS MATERIALIZED (
       |  SELECT s FROM (SELECT s, count(*) AS df FROM sh GROUP BY s) __df, capv
       |  WHERE df > cap),
       |shr AS (SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)),
       |interr AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ir
       |  FROM shr a JOIN shr b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |hsets AS (
       |  SELECT doc_id, list(s ORDER BY s) AS hs
       |  FROM sh JOIN hot USING (s) GROUP BY doc_id),
       |truth AS MATERIALIZED (
       |  SELECT da, db FROM (
       |    SELECT i.da, i.db,
       |      i.ir + coalesce(len(list_intersect(ha.hs, hb.hs)), 0) AS it,
       |      ca.n AS na, cb.n AS nb
       |    FROM interr i
       |    LEFT JOIN hsets ha ON ha.doc_id = i.da
       |    LEFT JOIN hsets hb ON hb.doc_id = i.db
       |    JOIN cnt ca ON ca.doc_id = i.da
       |    JOIN cnt cb ON cb.doc_id = i.db) __t
       |  WHERE round(it * 1.0 / (na + nb - it), 4) >= $threshold),
       |fnd AS (
       |  SELECT c.da, c.db FROM candm c
       |  JOIN truth t ON t.da = c.da AND t.db = c.db),
       |m AS (
       |  SELECT (SELECT count(*) FROM truth) AS n_truth,
       |    (SELECT count(*) FROM candm) AS n_cand,
       |    (SELECT count(*) FROM fnd) AS n_found)
       |SELECT n_truth, n_cand, n_found,
       |  n_found * 1000000 // n_truth AS recall_ppm,
       |  n_found * 1000000 // n_cand AS cand_precision_ppm
       |FROM m""".stripMargin

  /** 32-bit SimHash per document from distinct whitespace tokens:
    * per-bit majority vote over word hashes. Fully ROW-LOCAL (zero
    * shuffle) and, since r04, one codegen'd JVM loop per row via the
    * native [[graft.functions.SimhashSig]] expression — the lambda
    * formulation below evaluated ~|words| x 32 interpreted closure steps
    * per document plus an md5-hex→conv string round-trip per word.
    * Document ids must be integral. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = array_distinct(
      filter(split(col(textCol), " "), w => length(w) > 0))
    docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.SimhashSig.simhash_sig(words).as("simhash"))
  }

  /** The pure-built-ins twin of [[simhash]] (interpreted higher-order
    * lambdas). Kept as the semantic REFERENCE: DedupSpec pins the native
    * expression to this formulation bit-for-bit, and this shape is the
    * one the DuckDB oracle mirrors. Values equal BitVoteAggregator's:
    * +1 vote per set bit, -1 per clear bit, final bit = vote sum > 0.
    * Column-valued shifts aren't expressible (shiftright takes literal
    * amounts only), so bit b extracts via exact integer division by a
    * literal 2^b array. */
  def simhashLambda(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pow2 = array((0 until SimhashBits).map(b => lit(1L << b)): _*)
    val words = array_distinct(
      filter(split(col(textCol), " "), w => length(w) > 0))
    val hashes = transform(words, w => md5Hash32(w, "sh:"))
    val zero = array((0 until SimhashBits).map(_ => lit(0L)): _*)
    val votes = aggregate(hashes, zero, (acc, h) =>
      zip_with(acc,
        transform(pow2, p =>
          when((floor(h / p) % 2) === 1, lit(1L)).otherwise(lit(-1L))),
        (a, b) => a + b))
    val sig = aggregate(
      zip_with(votes, pow2, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
    docs.select(col(idCol).cast("long").as("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance <= maxDist.
    *
    * Candidate generation uses Hamming-LSH banding, not a cross join: the
    * 32-bit signature splits into (maxDist + 1) bands, and by pigeonhole
    * any pair within distance maxDist agrees exactly on at least one
    * band — so an equi-join on (band index, band value) finds EVERY
    * qualifying pair with linear candidate cost. Result is exact. */
  /** Broadcast the band build side only while its ESTIMATED BYTES stay
    * well under driver memory. A row-count guard was wrong here: 80M
    * band rows of (simhash, ids[], bk) approaches the 8 GB
    * broadcast-relation hard limit and OOMs a default-sized driver long
    * before that limit trips (broadcast() hints bypass
    * autoBroadcastJoinThreshold's own size check). 256 MB is a
    * conservative fraction of even a 1-2 GB driver heap. */
  val SimhashBroadcastMaxBytes: Long = 256L * 1024 * 1024

  /** Rough in-memory size of the band build side: per band row a
    * 40-byte fixed part (simhash + bk + array header) plus 8 bytes per
    * doc id carried in `ids`. */
  def simhashBandBuildBytes(nValues: Long, nDocs: Long, nBands: Int): Long =
    nBands.toLong * (nValues * 40L + nDocs * 8L)

  /** `maxGroup` is the r11 at-scale guard (the simhash analog of
    * minhash's band-bucket cap): an identical-signature group larger
    * than `maxGroup` contributes only its FIRST `maxGroup` members (by
    * doc_id) to pair generation — intra-group pairs AND cross-value
    * expansion both bound at maxGroup², so a clone farm cannot square
    * the output (the canary's 10x clone corpus measured 278M pairs
    * uncapped — each emitted pair exact, but pair VOLUME is the cost).
    * One-sided and precise: every emitted pair's hamming is exact;
    * only pairs involving an over-cap group's tail are missed, and
    * exact_dedup already reports those groups as clusters. Default
    * Int.MaxValue keeps the reference form unchanged; `simhash_capped`
    * pins the binding behavior cross-engine. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = HammingMax,
      maxGroup: Int = Int.MaxValue): DataFrame = {
    // Band-join over DISTINCT SIGNATURE VALUES, not documents: a
    // clustered corpus collapses many docs onto one signature, so
    // (1) hamming-0 pairs fall out of the identical-signature groups
    //     with no join at all, and
    // (2) the pigeonhole band join probes |distinct values| rows per
    //     bucket instead of |docs| — candidate volume shrinks by the
    //     square of the clustering factor (4x here) — and qualifying
    //     value pairs expand back to doc pairs afterwards. Exactness is
    //     unchanged: equal-sig pairs are case (1); distinct-sig pairs
    //     within maxDist still agree on >= 1 of the maxDist+1 bands.
    val rawGroups = simhash(docs, idCol, textCol)
      .groupBy(col("simhash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    val groups = (
      if (maxGroup == Int.MaxValue) rawGroups
      else rawGroups.withColumn("ids", slice(col("ids"), 1, maxGroup)))
      .localCheckpoint()
    // one cheap pass over the checkpointed blocks for both size stats
    val statsRow = groups
      .agg(count(lit(1)).as("nv"), sum(size(col("ids"))).as("nd")).first()
    val nValues = statsRow.getLong(0)
    val nDocs = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
    val nBands = maxDist + 1
    val bandBits = SimhashBits / nBands
    val bandMod = 1L << bandBits

    // (1) all ordered pairs inside each identical-signature group
    val intra = groups.filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(slice(ids, i + 1, size(ids) - i),
          |       j -> struct(element_at(ids, i) as da, j as db))))"""
          .stripMargin)).as("p"))
      .select(col("p.da").as("da"), col("p.db").as("db"),
        lit(0).cast("int").as("hamming"))

    // (2) distinct-value band join; integer band math fused into one
    // long key (band index in the high bits) for the long-keyed hash
    // relation. Build side broadcast while it fits; beyond that the
    // join falls back to shuffle + AQE skew splitting.
    val bands = groups.select(col("simhash"), col("ids"),
        explode(sequence(lit(0), lit(nBands - 1))).as("bi"))
      .withColumn("bk",
        col("bi").cast("long") * lit(1L << 32) +
          expr(s"shiftright(simhash, bi * $bandBits)") % bandMod)
      .select(col("simhash"), col("ids"), col("bk"))
    val build =
      if (simhashBandBuildBytes(nValues, nDocs, nBands)
          <= SimhashBroadcastMaxBytes) broadcast(bands.as("b"))
      else bands.as("b")
    val valuePairs = bands.as("a")
      .join(build,
        col("a.bk") === col("b.bk") &&
          col("a.simhash") < col("b.simhash"))
      .select(col("a.ids").as("aids"), col("b.ids").as("bids"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // the same value pair can collide in several bands
    val cross = valuePairs
      .select(col("hamming"), explode(col("aids")).as("x"), col("bids"))
      .select(col("hamming"), col("x"), explode(col("bids")).as("y"))
      .select(least(col("x"), col("y")).as("da"),
        greatest(col("x"), col("y")).as("db"), col("hamming"))

    intra.unionByName(cross)
  }

  // ---- DuckDB oracle builders (same constructions, SQL dialect) ------

  /** Shared CTE: distinct (doc_id, shingle) pairs from a docs relation. */
  def shinglesCte(docsRel: String): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest([ws[i] || '|' || ws[i+1] || '|' || ws[i+2]
       |            for i in range(1, len(ws) - ${ShingleSize - 2})]) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $docsRel) __w
       |  WHERE len(ws) >= $ShingleSize)""".stripMargin

  def md5Hash32Sql(expr: String, salt: String): String =
    s"(('0x' || substr(md5('$salt' || $expr), 1, 8))::BIGINT)"

  val jaccardCte: String =
    s"""cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jac AS (
       |  SELECT da, db, round(i * 1.0 / (ca.n + cb.n - i), 4) AS jaccard
       |  FROM inter
       |  JOIN cnt ca ON ca.doc_id = da
       |  JOIN cnt cb ON cb.doc_id = db)""".stripMargin

  def ngramJaccardOracle(docsRel: String, threshold: Double): String =
    s"""WITH ${shinglesCte(docsRel)},
       |$jaccardCte
       |SELECT da, db, jaccard FROM jac WHERE jaccard >= $threshold
       |ORDER BY da, db""".stripMargin

  /** CTE chain ending in `lshpairs(da, db, jaccard)` — the LSH-candidate
    * near-dup pairs, reusable by every oracle that consumes them
    * (minhash_lsh_dups itself, corpus selection, component closure).
    *
    * `maxBucket` mirrors [[minhashLshPairs]]'s band-bucket admission
    * cap: when finite, band buckets holding more than `maxBucket`
    * documents are excluded from candidate generation — the SQL twin of
    * the Spark side's window-count filter, so a gate corpus where the
    * cap BINDS is still hash-checkable. */
  def minhashLshCtes(
      docsRel: String,
      threshold: Double,
      maxBucket: Long = Long.MaxValue): String = {
    val hashes = (0 until MinhashK)
      .map(i => s"min((${md5Hash32Sql("s", "mh:")} * ${minhashA(i)} + " +
        s"${minhashB(i)}) % $MinhashP) AS h$i").mkString(", ")
    val bandRows = (0 until Bands)
      .map { b =>
        val key = (0 until RowsPerBand)
          .map(r => s"h${RowsPerBand * b + r}").mkString(" || '_' || ")
        s"SELECT doc_id, $b AS bi, $key AS bk FROM sig"
      }
      .mkString("\n  UNION ALL ")
    val admitted =
      if (maxBucket == Long.MaxValue) "bands"
      else s"""(SELECT doc_id, bi, bk FROM (
              |    SELECT doc_id, bi, bk,
              |      count(*) OVER (PARTITION BY bi, bk) AS bn
              |    FROM bands) __adm WHERE bn <= $maxBucket)"""
        .stripMargin
    s"""${shinglesCte(docsRel)},
       |sig AS MATERIALIZED (SELECT doc_id, $hashes FROM sh GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM $admitted a JOIN $admitted b
       |    ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |$jaccardCte,
       |lshpairs AS (
       |  SELECT j.da, j.db, j.jaccard
       |  FROM jac j JOIN cand c ON j.da = c.da AND j.db = c.db
       |  WHERE j.jaccard >= $threshold)""".stripMargin
  }

  def minhashLshOracle(docsRel: String, threshold: Double): String =
    s"""WITH ${minhashLshCtes(docsRel, threshold)}
       |SELECT da, db, jaccard FROM lshpairs
       |ORDER BY da, db""".stripMargin

  /** Oracle for the CAPPED LSH path over an inline corpus subquery —
    * used by the gate fixture where the band-bucket cap BINDS, so the
    * documented one-sided miss is pinned by the hash-checked gate, not
    * only by DedupCappedSpec. */
  def minhashLshCappedOracle(
      corpusSubquery: String,
      threshold: Double,
      maxBucket: Long): String =
    s"""WITH corpus AS $corpusSubquery,
       |${minhashLshCtes("corpus", threshold, maxBucket)}
       |SELECT da, db, jaccard FROM lshpairs
       |ORDER BY da, db""".stripMargin

  /** The simhash pair CTE chain alone, ending in `shpairs(da, db,
    * hamming)` — CTE names prefixed `sh_` so the chain composes with
    * [[minhashLshCtes]] inside one WITH (dedup_multisignal). */
  def simhashPairsCtes(docsRel: String, maxDist: Int): String =
    s"""sh_words AS (
       |  SELECT DISTINCT doc_id, w
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM $docsRel) __u
       |  WHERE length(w) > 0),
       |sh_hashed AS (SELECT doc_id, ${md5Hash32Sql("w", "sh:")} AS h FROM sh_words),
       |sh_bits AS (
       |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM sh_hashed, (SELECT unnest(range(0, $SimhashBits)) AS b) __bits
       |  GROUP BY doc_id, b),
       |sh_sig AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
       |  FROM sh_bits GROUP BY doc_id),
       |shpairs AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM sh_sig a JOIN sh_sig b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist)""".stripMargin

  def simhashPairsOracle(docsRel: String, maxDist: Int): String =
    s"""WITH ${simhashPairsCtes(docsRel, maxDist)}
       |SELECT da, db, hamming FROM shpairs
       |ORDER BY da, db""".stripMargin

  /** Capped-chain CTEs: [[simhashPairsCtes]] plus the per-signature
    * group cap expressed as a row_number window over each
    * identical-signature group — the SQL mirror of
    * `slice(sort_array(ids), 1, maxGroup)`. Ends in `shpairs_c(da, db,
    * hamming)`; the chain's uncapped `shpairs` goes unreferenced (and
    * unexecuted). Composable inside a larger WITH (dedup_multisignal
    * wires it alongside the minhash chain). */
  def simhashPairsCappedCtes(
      docsRel: String, maxDist: Int, maxGroup: Int): String =
    s"""${simhashPairsCtes(docsRel, maxDist)},
       |sh_kept AS MATERIALIZED (
       |  SELECT doc_id, simhash FROM (
       |    SELECT doc_id, simhash, row_number() OVER (
       |      PARTITION BY simhash ORDER BY doc_id) AS grn
       |    FROM sh_sig) __g
       |  WHERE grn <= $maxGroup),
       |shpairs_c AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
       |  FROM sh_kept a JOIN sh_kept b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxDist)""".stripMargin

  def simhashPairsCappedOracle(
      docsRel: String, maxDist: Int, maxGroup: Int): String =
    s"""WITH ${simhashPairsCappedCtes(docsRel, maxDist, maxGroup)}
       |SELECT da, db, hamming FROM shpairs_c
       |ORDER BY da, db""".stripMargin
}
