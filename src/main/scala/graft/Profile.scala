package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Stage-level profiler for the dedup pipelines: times each sub-stage of
  * a slow query in isolation so regressions can be attributed to a stage
  * instead of guessed at. Usage: runMain graft.Profile [sfDir] [hot]
  * (`hotsem` = the semantic-cluster section of hot mode alone)
  *
  * `hot` mode runs ONLY the hot-corpus regime: corpora engineered so the
  * dedup admission caps BIND (a stopword shingle in every document; a
  * giant near-identical cluster), timing capped vs uncapped paths — the
  * measured proof that the guards keep the operators linear exactly
  * where the uncapped forms go quadratic. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hotSemOnly = args.contains("hotsem") // section (4) alone
    val hotOnly = args.contains("hot") || hotSemOnly
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (args.contains("warc")) {
      // ONE consolidated gzip-member archive — the regime where the
      // per-file reader serializes onto a single task; the measured
      // proof that recordsSplit fans the same archive across tasks.
      import graft.sources.WarcSource
      import spark.implicits._
      val nRecs = 100000
      val recs = (0 until nRecs).map { k =>
        ("response", s"https://example.org/p$k", "2024-03-01T00:00:00Z",
          WarcSource.httpTextPayload(s"doc $k " + Seq.tabulate(60)(i =>
            s"w${(k * 31 + i * 7) % 997}").mkString(" ")))
      }
      val bytes = time("build archive (driver)")(WarcSource.gzipMembers(recs))
      println(f"[profile] one archive: $nRecs records, " +
        f"${bytes.length / 1e6}%.1f MB compressed")
      val archives = spark.createDataset(Seq(0L -> bytes))
        .repartition(1).localCheckpoint()
      time("records (per-file: 1 task)")(noop(WarcSource.records(archives)))
      val target = 256L * 1024
      // stage attribution for the split path
      val slices = WarcSource.splitSlices(archives, target)
      time("  slices scan+copy (serial)")(noop(slices.toDF()))
      val spread = slices.repartition(col("_1"), col("_2"))
      time("  +repartition (shuffle)")(noop(spread.toDF()))
      time("  +parse, no numbering")(noop(spread.flatMap { case (id, sp, b) =>
        WarcSource.parseWarc(b).map(r => (id, sp, r.record_no, r.warc_type,
          r.target_uri, r.warc_date, r.content_length, r.http_status,
          r.mime, r.body_text))
      }.toDF()))
      time("recordsSplit (256KB slices)")(noop(
        WarcSource.recordsSplit(archives, target)))
      // re-measure both WARM (first timings carry cold-JIT cost)
      time("records warm (1 task)")(noop(WarcSource.records(archives)))
      time("recordsSplit warm")(noop(
        WarcSource.recordsSplit(archives, target)))
      val tasks = WarcSource.recordsSplit(archives, target)
        .select(expr("spark_partition_id()").as("pid")).distinct().count()
      println(s"[profile] recordsSplit parse tasks on ONE archive: $tasks" +
        s" (slices: ${WarcSource.splitRanges(bytes, target).length})")
      spark.stop()
      return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup count")(docs.count())

    if (args.contains("canary")) {
      // ---- 10x scale-regime canary (r9, VERDICT #7) ----------------
      // The headline capped dedup/ANN family on a 10x-replicated
      // corpus: every doc and vector appears in a 10-member exact
      // cluster, so each detector runs with its hazard regime ACTIVE
      // (identical LSH buckets, df-10 grams, dense k-means clusters)
      // at 10x the sweep's largest SF. Catches perf regime shifts the
      // three-SF oracle sweep misses — the HLL promotion-boundary bug
      // class, on the perf side. Results land in BENCH_NOTES per round.
      val docs10 = docs
        .select(explode(sequence(lit(0L), lit(9L))).as("i"),
          col("doc_id"), col("text"))
        .select((col("doc_id") * 16 + col("i")).as("doc_id"), col("text"))
        .localCheckpoint()
      println(s"[profile] canary corpus: ${docs10.count()} docs " +
        "(10x, 10-member exact clusters)")
      time("exact dedup groups")(noop(
        Dedup.exactDupGroups(docs10, "doc_id", "text")))
      time("ngram at-scale (capped)")(noop(
        Dedup.ngramJaccardPairsAtScale(docs10, "doc_id", "text")))
      time("minhash LSH (capped 1024)")(noop(
        Dedup.minhashLshPairs(docs10, "doc_id", "text")))
      time("simhash pairs")(noop(
        Dedup.simhashPairs(docs10, "doc_id", "text")))
      time("substr spans capped (16)")(noop(
        Dedup.substringDupSpans(docs10, "doc_id", "text", 8, maxDf = 16)))
      time("winnow spans capped (8)")(noop(
        graft.analysis.TextAnalysis.winnowSharedSpans(
          docs10, "doc_id", "text", minShared = 5, maxDf = 8)))
      val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val emb10 = emb0
        .select(explode(sequence(lit(0L), lit(9L))).as("i"),
          col("vec_id"), col("embedding"))
        .select((col("vec_id") * 16 + col("i")).as("vec_id"),
          col("embedding"))
        .localCheckpoint()
      println(s"[profile] canary vectors: ${emb10.count()} " +
        "(10-member identical clusters)")
      time("semdedup capped (1024)")(noop(
        graft.dedup.SemanticDedup.semanticDedup(emb10,
          k = 8, iters = 2, threshold = 0.45, maxCluster = 1024)))
      time("ann ivf topk")(noop(
        graft.sim.Similarity.ivfTopK(emb10, 20, 5)))
      time("ann lsh topk")(noop(
        graft.sim.Similarity.lshTopK(emb10, 20, 5)))
      time("ann int8 topk")(noop(
        graft.sim.Similarity.int8TopK(emb10, 20, 5)))
      time("ann ivfpq topk")(noop(
        graft.sim.IvfPq.topK(emb10, 20, 5)))

      // ---- r10 extension: the funnel/sketch wave under 10x spread --
      // crawl_curate / corpus_curate_full / join_skew_probe /
      // table_profile are COMPOSITION points (multi-stage funnels, two
      // independent sketches, one-scan profiling) where a regime shift
      // would first appear. They read table dirs, so the canary stages
      // a 10x table dir: documents replicated with the cluster id
      // scheme above, lineitem replicated verbatim (10x key
      // frequencies — the skew probe's MG map must stay exact).
      val canaryDir = java.nio.file.Files
        .createTempDirectory("canary10x").toString
      docs
        .select(explode(sequence(lit(0L), lit(9L))).as("__i"), col("*"))
        .select((col("doc_id") * 16 + col("__i")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .write.parquet(s"$canaryDir/documents.parquet")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(explode(sequence(lit(0L), lit(9L))).as("__i"), col("*"))
        .drop("__i")
        .write.parquet(s"$canaryDir/lineitem.parquet")
      // orders replicated with remapped keys (residue semantics shift,
      // which a no-oracle timing canary tolerates): o_custkey is kept,
      // so the CDC/view entries see 10x delta volume against the SAME
      // group count — the view-maintenance stress regime
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(explode(sequence(lit(0L), lit(9L))).as("__i"), col("*"))
        .withColumn("o_orderkey", col("o_orderkey") * 16 + col("__i"))
        .drop("__i")
        .write.parquet(s"$canaryDir/orders.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "events", "embeddings"))
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.parquet(s"$canaryDir/$t.parquet")
      for (q <- Seq("crawl_curate", "corpus_curate_full",
          "join_skew_probe", "table_profile",
          // r10 additions: link-graph iteration + sitemap funnel
          "link_hits", "sitemap_frontier",
          // r10 wave-eight additions: graph family over the 10x parse,
          // LSH acceptance gate with df-10 shingles (quadratic truth
          // side in its active regime), collocations at 10x vocab
          // counts, and the fusion/diversification pair
          "graph_triangles", "graph_kcore", "graph_label_prop",
          "lsh_recall_eval", "corpus_collocations",
          "search_rrf_hybrid", "search_mmr_diversify",
          // r11 additions (VERDICT #3): the heaviest r10 entries not
          // yet tracked — training loops, the multi-signal dedup
          // composition, deep-graph clustering, the ANN acceptance
          // gate — plus the new CDC read at 10x change volume
          "quality_train", "quality_train_score", "dedup_multisignal",
          "dedup_components_logstar", "ann_recall_eval",
          "table_changes",
          // r11 wave-ten additions: decontaminate's broadcast-join
          // fan-out under 10x duplicated grams (every eval doc has 10
          // corpus clones — the overlap-volume hazard regime),
          // seq_pack's bounded-group exchange at 10x group count,
          // pii_scrub's row-local regex pass (linearity control)
          "decontaminate", "seq_pack", "pii_scrub",
          // span-level twin: same broadcast shape as decontaminate
          // plus the doc_id-partitioned hit window
          "decontaminate_spans",
          // r12 additions (VERDICT #7): the two new r11 heavies —
          // the standing-search streaming protocol (checkpointed
          // drains + index round-trip; data-volume share shows here)
          // and the content-stream rasterizer (fixture-sized input,
          // linearity control for the text-showing subset) — plus the
          // end-to-end publish funnel, whose gates all hit their
          // hazard regimes on the 10x clone corpus at once.
          // NOTE (r11 OOM lesson): the 10x canary at the default 8g
          // driver heap could tip inside the UNCAPPED dedup_multisignal
          // (~278M-pair output). The composition is capped since r12;
          // if any entry OOMs, re-run with SPARK_DRIVER_MEM=16g
          // (build.sbt reads it) and record the heap in BENCH_NOTES.
          "search_rrf_standing", "pdf_split", "corpus_ship",
          // r12 wave-eleven additions: the CDC/view stack (10x delta
          // volume against an unchanged group count), the
          // two-relation band probe (cross-bucket product regime),
          // the giant-group running sum (one language dominating is
          // exactly its regime), and the tar publish (shard write
          // volume; manifest agg is narrow)
          "mv_incremental", "mv_standing", "cross_corpus_dups",
          "leakage_safe_split", "token_budget_sample",
          "corpus_tar_publish", "mv_rewrite",
          // chunking (row-local linearity control) + sorted packing
          // (re-id range exchange at 10x)
          "doc_chunk", "seq_pack_sorted",
          // hard negatives: brute Q x 10xC scoring + the IVF probe
          // contrast; drift monitor as a scan-linearity control
          "ann_hard_negatives", "ann_hard_negatives_ivf",
          "corpus_drift_psi",
          // r13 additions: CDC-fed ANN maintenance (delta-localized
          // partition rewrite under 10x delta volume; embeddings stay
          // 1x so the delta itself is the regime) and the roll-up
          // rewrite (summary-sized re-aggregation; 10x orders base)
          "ann_incremental_cdc", "mv_rewrite_rollup",
          // r16: compressed-store maintenance + the serve-pointer
          // lifecycle under 10x
          "ann_incremental_pq", "ann_rebuild_standing",
          // r17: the standing dedup drain (two feed files over the 10x
          // corpus) and the codes-only store's CDC maintenance
          "cross_corpus_dups_standing", "ann_adc_codes_only"))
        time(s"$q @10x")(noop(SparkEntry.queries(q)(spark, canaryDir)))
      spark.stop()
      return
    }

    if (args.contains("canary30")) {
      // ---- 30x tier (r13, VERDICT #5): the cap-bearing family -------
      // The brief's bar is 100x scale and the 10x canary proves one
      // order; this tier re-runs exactly the pair generators whose
      // caps keep them linear — 30-member exact clusters at 30x the
      // sweep's largest SF, default heap. Acceptance: sub-quadratic
      // observed scaling vs the 10x tier rows (a capped operator
      // should scale ~linearly in corpus size; anything that squares
      // gets its cap fixed, not its row annotated).
      val canaryDir = java.nio.file.Files
        .createTempDirectory("canary30x").toString
      docs
        .select(explode(sequence(lit(0L), lit(29L))).as("__i"), col("*"))
        .select((col("doc_id") * 32 + col("__i")).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .write.parquet(s"$canaryDir/documents.parquet")
      println(s"[profile] canary30 corpus: " +
        spark.read.parquet(s"$canaryDir/documents.parquet").count() +
        " docs (30x, 30-member exact clusters)")
      // orders replicated with remapped keys, custkey kept: the CDC
      // maintenance entries see 30x DELTA volume against the same
      // group count (the 10x branch's scheme, one tier up); embeddings
      // likewise so the ANN maintenance delta (ids %10 in {3,7}) is
      // 30x while the quantizer stays fixed-size
      spark.read.parquet(s"$sfDir/orders.parquet")
        .select(explode(sequence(lit(0L), lit(29L))).as("__i"), col("*"))
        .withColumn("o_orderkey", col("o_orderkey") * 32 + col("__i"))
        .drop("__i")
        .write.parquet(s"$canaryDir/orders.parquet")
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(explode(sequence(lit(0L), lit(29L))).as("__i"), col("*"))
        .withColumn("vec_id", col("vec_id") * 32 + col("__i"))
        .drop("__i")
        .write.parquet(s"$canaryDir/embeddings.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "lineitem", "events"))
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.parquet(s"$canaryDir/$t.parquet")
      for (q <- Seq("dedup_multisignal", "simhash_capped",
          "cross_corpus_dups", "minhash_lsh_capped",
          "leakage_safe_split", "corpus_ship",
          // r14 additions (VERDICT #7): the maintenance classes at 30x
          // delta volume — the dirty-group rescan and the
          // partition-rewrite + ledger-probe path must stay delta-linear
          "mv_rewrite_extrema_cdc", "ann_incremental_cdc",
          // r15 additions: the epoch-mix publish funnel (packing +
          // sharding under 30x, copies included) and the rebuild
          // (O(index) by definition — its row is the honest cost of
          // re-training, not a regression to explain)
          "corpus_ship_epochs", "ann_rebuild",
          // r16: the COMPRESSED store's CDC maintenance at 30x delta —
          // the encode projection must ride the staged write without
          // changing the delta-linear shape (init's codebook training
          // is O(index) by design, like rebuild's row)
          "ann_incremental_pq",
          // r17: the codes-only write shape at 30x delta — dropping v
          // must not change the delta-linear maintenance profile
          "ann_adc_codes_only"))
        time(s"$q @30x")(noop(SparkEntry.queries(q)(spark, canaryDir)))
      spark.stop()
      return
    }

    if (args.contains("anncdc")) {
      // ---- ann_incremental_cdc / ann_standing stage attribution -----
      // (r15, VERDICT #1): the two queries regressed ~2x when the
      // ledger sidecar landed; this times every stage in isolation so
      // the maintenance protocol's own cost is separable from the
      // fixture cost (VersionedTable commits, init, the streaming
      // harness) that both queries pay identically.
      import graft.sim.IncrementalAnnIndex
      import graft.sinks.VersionedTable
      val base = java.nio.file.Files
        .createTempDirectory("anncdcprof").toString
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val root = s"$base/vt"
      val v0 = time("commit v0")(
        VersionedTable.commit(emb.filter(col("vec_id") % 10 =!= 3), root))
      val v1 = time("commit v1")(
        VersionedTable.commit(emb.filter(col("vec_id") % 10 =!= 7), root))
      val v2 = time("commit v2")(
        VersionedTable.commit(emb.filter(col("vec_id") % 10 =!= 9), root))
      val store = s"$base/ivf"
      time("init (v0 corpus)")(IncrementalAnnIndex.init(
        VersionedTable.readVersion(spark, root, v0), store))
      val feed01 = time("changes v0->v1 (plan+ckpt)")(
        VersionedTable.changes(spark, root, v0, v1, Seq("vec_id"))
          .localCheckpoint())
      time("applyChanges v0->v1")(
        IncrementalAnnIndex.applyChanges(feed01, store))
      val feed12 = time("changes v1->v2 (plan+ckpt)")(
        VersionedTable.changes(spark, root, v1, v2, Seq("vec_id"))
          .localCheckpoint())
      time("applyChanges v1->v2")(
        IncrementalAnnIndex.applyChanges(feed12, store))
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("embedding"))
      time("topK")(noop(
        IncrementalAnnIndex.topK(q, store, 10).orderBy(col("qid"),
          col("rank"))))
      // the standing twin's extra fixture: cdc files + streaming drain
      val store2 = s"$base/ivf2"
      time("init (store2)")(IncrementalAnnIndex.init(
        VersionedTable.readVersion(spark, root, v0), store2))
      val cdcDir = s"$base/cdc"
      // landDelta stamps strictly increasing mtimes so a same-
      // timestamp tie can never mis-order the burst writes and trip
      // the drain's slot check mid-profile
      time("write cdc files")(Seq((v0, v1), (v1, v2)).foreach {
        case (a, b) =>
          graft.streaming.AnnMaintainJob.landDelta(spark,
            VersionedTable.changes(spark, root, a, b, Seq("vec_id")),
            cdcDir)
      })
      time("AnnMaintainJob.runOnce (2 batches)")(
        graft.streaming.AnnMaintainJob.runOnce(
          spark, cdcDir, store2, s"$base/ckpt", seedSourceVersion = v0))
      // auto-compaction canary: the same drain with compact() after
      // every applied batch — the delta between this row and the plain
      // drain above is the steady-state housekeeping cost
      val store3 = s"$base/ivf3"
      time("init (store3)")(IncrementalAnnIndex.init(
        VersionedTable.readVersion(spark, root, v0), store3))
      time("runOnce + autoCompact")(
        graft.streaming.AnnMaintainJob.runOnce(
          spark, cdcDir, store3, s"$base/ckpt3", seedSourceVersion = v0,
          autoCompactEvery = 1, autoCompactMaxFiles = 4))
      spark.stop()
      return
    }

    if (args.contains("dedupstore")) {
      // ---- dedup-store index-growth axis (r16) ----------------------
      // processBatch/probeStorePairs cost as the ACCEPTED CORPUS grows
      // 10x/30x with the batch held fixed — the bucketed-store
      // acceptance run (the dedup twin of annledger). Pre-bucketing,
      // the redelivery skip and the band probe scanned O(corpus); with
      // both trees hash-bucketed every store read prunes to the
      // batch's buckets, so batch wall time must stay ~flat across the
      // corpus tiers. Index filler is md5-derived pseudo-random text
      // (no near-dups, so admission keeps the index AT size and the
      // probe's candidate set stays batch-bounded).
      import graft.dedup.IncrementalDedup
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")).localCheckpoint()
      val n1 = docs0.count()
      val batch = docs0.limit(200).localCheckpoint()
      for (mult <- Seq(1, 10, 30)) {
        val store = java.nio.file.Files
          .createTempDirectory(s"dedupstore$mult").toString + "/corpus"
        val filler = spark.range(n1 * mult)
          .select((col("id") + 1000000000L).as("doc_id"),
            concat_ws(" ", transform(sequence(lit(1), lit(20)),
              i => md5(concat(col("id").cast("string"), lit("-"),
                i.cast("string"))))).as("text"))
        println(s"[profile] dedupstore corpus x$mult: " +
          s"${n1 * mult} accepted docs (batch fixed at 200)")
        IncrementalDedup.processBatch(filler, store, threshold = 1.01)
        time(s"processBatch @x$mult (fixed batch)")(
          IncrementalDedup.processBatch(batch, store))
        time(s"probeStorePairs @x$mult (fixed batch)")(
          noop(IncrementalDedup.probeStorePairs(batch, store)))
        // takedown tier (r18 VERDICT "missing #3"): removeDocs a FIXED
        // 200-doc set as the corpus grows — bucket-bounded by
        // construction (docs rewrite touches the doomed ids' buckets,
        // bands rewrite the doomed band keys' buckets), so the row
        // must stay ~flat like the batch rows above. The doomed set is
        // the first 200 filler ids (present at every tier, disjoint
        // from the measured batch).
        val doomed = spark.range(200)
          .select((col("id") + 1000000000L).as("doc_id"))
        time(s"removeDocs @x$mult (fixed 200 docs)")(
          IncrementalDedup.removeDocs(spark, store, doomed))
      }
      // the non-default bucket count at the top tier: 64 buckets give
      // 4x narrower per-bucket scans, so the fixed batch should cost
      // AT MOST the 16-bucket x30 row (the r16 VERDICT's
      // parameterization bar)
      locally {
        val mult = 30
        val store = java.nio.file.Files
          .createTempDirectory("dedupstore64").toString + "/corpus"
        val filler = spark.range(n1 * mult)
          .select((col("id") + 1000000000L).as("doc_id"),
            concat_ws(" ", transform(sequence(lit(1), lit(20)),
              i => md5(concat(col("id").cast("string"), lit("-"),
                i.cast("string"))))).as("text"))
        println(s"[profile] dedupstore corpus x$mult @64 buckets: " +
          s"${n1 * mult} accepted docs (batch fixed at 200)")
        IncrementalDedup.processBatch(filler, store, threshold = 1.01,
          storeBuckets = 64)
        time(s"processBatch @x$mult buckets=64 (fixed batch)")(
          IncrementalDedup.processBatch(batch, store))
        time(s"probeStorePairs @x$mult buckets=64 (fixed batch)")(
          noop(IncrementalDedup.probeStorePairs(batch, store)))
        val doomed = spark.range(200)
          .select((col("id") + 1000000000L).as("doc_id"))
        time(s"removeDocs @x$mult buckets=64 (fixed 200 docs)")(
          IncrementalDedup.removeDocs(spark, store, doomed))
      }
      spark.stop()
      return
    }

    if (args.contains("annledger")) {
      // ---- index-growth axis (r14, VERDICT #1) ----------------------
      // Maintenance cost as the INDEX grows 10x/30x with the DELTA held
      // constant — the ledger-sidecar acceptance run. Pre-ledger, the
      // per-delta id discovery scanned O(index); with the hash-bucketed
      // ledger both lookups prune to the delta's buckets, so the
      // applyChanges wall time must stay ~flat across the index tiers
      // (the touched-partition rewrite is delta-sized by construction).
      import graft.sim.IncrementalAnnIndex
      import graft.sinks.VersionedTable
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val n1 = emb.count()
      for (mult <- Seq(1, 10, 30)) {
        val dir = java.nio.file.Files
          .createTempDirectory(s"annledger$mult").toString
        val corpus =
          (if (mult == 1) emb
           else emb
             .select(explode(sequence(lit(0L), lit(mult - 1L))).as("__i"),
               col("vec_id"), col("embedding"))
             .select((col("vec_id") * 32 + col("__i")).as("vec_id"),
               col("embedding"))).localCheckpoint()
        println(s"[profile] annledger index x$mult: ${corpus.count()} " +
          s"vectors (delta fixed at ~${n1 / 5} rows)")
        val root = s"$dir/vt"
        // v0 = corpus; v1 = the SAME fixed-size change set at every
        // tier: the base-1x ids %10==7 leave, %10==3 of a fresh id
        // range arrive — delta size is ~n1/5 regardless of mult
        val inBase = col("vec_id") < n1 * 40 // base-1x id space ceiling
        val leavers = corpus.filter(inBase && col("vec_id") % 10 === 7)
          .limit((n1 / 10).toInt)
        val arrivals = emb.filter(col("vec_id") % 10 === 3)
          .select((col("vec_id") + 100000000L).as("vec_id"),
            col("embedding"))
        VersionedTable.commit(corpus, root)
        VersionedTable.commit(
          corpus.join(leavers.select("vec_id"), Seq("vec_id"), "left_anti")
            .unionByName(arrivals), root)
        val store = s"$dir/ivf"
        time(s"init @x$mult")(
          IncrementalAnnIndex.init(
            VersionedTable.readVersion(spark, root, 0L), store,
            ledgerBuckets = 256))
        val feed = VersionedTable
          .changes(spark, root, 0L, 1L, Seq("vec_id")).localCheckpoint()
        println(s"[profile]   delta rows: ${feed.count()}")
        time(s"applyChanges @x$mult (fixed delta)")(
          IncrementalAnnIndex.applyChanges(feed, store))
        // takedown tier (r19): takedownVecs a FIXED 200-id set as the
        // index grows — the probe prunes to the ids' ledger buckets
        // and the rewrite touches only their (bucket, list) pairs, so
        // the row must stay ~flat like applyChanges above. The doomed
        // set is arrival ids (present at every tier, disjoint from the
        // delta's leaver side).
        val doomed = arrivals.limit(200).select("vec_id")
        time(s"takedownVecs @x$mult (fixed 200 ids)")(
          IncrementalAnnIndex.takedownVecs(spark, store, doomed))
      }
      spark.stop()
      return
    }

    if (args.contains("multisig")) {
      // ---- dedup_multisignal stage attribution (r11) ---------------
      // The canary showed the composition costing ~2.8x the sum of its
      // standalone signals; this section times each signal and the
      // fusion joins in isolation ON THE SAME corpus to attribute it.
      import graft.analysis.TextAnalysis
      // same 10x replication scheme as the canary branch
      val d0 = docs
        .select(explode(sequence(lit(0L), lit(9L))).as("i"),
          col("doc_id"), col("text"))
        .select((col("doc_id") * 16 + col("i")).as("doc_id"), col("text"))
      // extra-clone ids start past the OBSERVED max replicated id — a
      // fixed +100000 offset would collide with the doc_id*16+i space
      // once the base corpus passes ~6250 docs and silently skew the
      // per-signal timings being attributed
      val cloneOffset =
        d0.agg(max(col("doc_id"))).first().getLong(0) + 16
      val d = d0.unionAll(d0.filter(col("doc_id") < 5)
          .select((col("doc_id") + cloneOffset).as("doc_id"), col("text")))
        .localCheckpoint()
      println(s"[profile] multisig corpus: ${d.count()} docs")
      val mh = Dedup.minhashLshPairs(d, "doc_id", "text")
        .select(col("da"), col("db"), lit(true).as("by_minhash"))
      // r12: the triage query now composes the CAPPED simhash signal
      // (MultisigMaxGroup) — attribute that form, and keep the uncapped
      // timing as the clone-farm contrast
      val sh = Dedup.simhashPairs(d, "doc_id", "text",
          maxGroup = Dedup.MultisigMaxGroup)
        .select(col("da"), col("db"), lit(true).as("by_simhash"))
      val shUncapped = Dedup.simhashPairs(d, "doc_id", "text")
        .select(col("da"), col("db"), lit(true).as("by_simhash"))
      val fp = d.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val ex = fp.as("a")
        .join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          lit(true).as("by_exact"))
      time("minhash signal alone")(noop(mh))
      time("simhash signal alone (capped)")(noop(sh))
      time("simhash signal alone (uncapped)")(noop(shUncapped))
      time("exact signal alone")(noop(ex))
      val mhC = mh.localCheckpoint(); val shC = sh.localCheckpoint()
      val exC = ex.localCheckpoint()
      println(s"[profile] pair rows: mh=${mhC.count()} " +
        s"sh=${shC.count()} ex=${exC.count()}")
      // no trailing orderBy: the shipped composition dropped its global
      // sort (the harness sorts rows itself before hashing)
      time("fusion joins alone")(noop(
        mhC.join(shC, Seq("da", "db"), "full")
          .join(exC, Seq("da", "db"), "full")
          .select(col("da"), col("db"),
            coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
            coalesce(col("by_simhash"), lit(false)).as("by_simhash"),
            coalesce(col("by_exact"), lit(false)).as("by_exact"))))
      time("composed (one plan)")(noop(
        mh.join(sh, Seq("da", "db"), "full")
          .join(ex, Seq("da", "db"), "full")
          .select(col("da"), col("db"),
            coalesce(col("by_minhash"), lit(false)).as("by_minhash"),
            coalesce(col("by_simhash"), lit(false)).as("by_simhash"),
            coalesce(col("by_exact"), lit(false)).as("by_exact"))))
      spark.stop()
      return
    }

    if (args.contains("ivfpq")) {
      // ---- IVFADC probed fraction vs flat ADC (r10, VERDICT #1) ----
      // The composition's claim is that a query scores ONLY the probed
      // lists' codes. Measured: the scored candidate-pair count of
      // IvfPq.topK vs ann_topk_pq's all-codes scan, plus wall times.
      // The fraction ~= NProbe/Coarse modulo list-size imbalance.
      import graft.sim.{IvfPq, ProductQuantizer}
      val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .localCheckpoint()
      val n = emb0.count()
      val nq = 20L
      val flatPairs = nq * (n - 1) // ADC scores every code per query
      // probed pairs: rebuild the coarse assignment exactly as topK
      // does and sum the probed lists' sizes per query
      val q = graft.sim.KMeans.quantized(emb0).localCheckpoint()
      val cents = graft.sim.KMeans.centroidsOf(
        graft.sim.KMeans.fitQ(q, IvfPq.Coarse, IvfPq.CoarseIters))
      val listed = q.select(col("vec_id"),
          graft.sim.KMeans.assignExpr(cents, col("q")).as("list_id"))
        .groupBy(col("list_id")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // scored rows BEFORE top-k = sum over (query, probed list) of
      // list size — the same integer-L2 probe ranking the operator uses
      val probed = {
        val wProbe = org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cdist"), col("list_id"))
        import spark.implicits._
        val cdf = broadcast(cents.map { case (cid, arr) => (cid, arr) }
          .toDF("list_id", "cv"))
        q.filter(col("vec_id") < nq)
          .select(col("vec_id").as("qid"), col("q").as("qq"))
          .crossJoin(cdf)
          .withColumn("cdist", aggregate(
            zip_with(col("qq"), col("cv"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x))
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= IvfPq.NProbe)
          .select(col("qid"), col("list_id")).collect()
          .map { r => listed.getOrElse(r.getLong(1), 0L) }.sum
      }
      println(f"[profile] corpus vectors: $n, queries: $nq")
      println(f"[profile] flat ADC pairs:   $flatPairs")
      println(f"[profile] IVFADC pairs:     $probed  " +
        f"(${100.0 * probed / flatPairs}%.1f%% of flat; " +
        f"NProbe/Coarse = ${100.0 * IvfPq.NProbe / IvfPq.Coarse}%.1f%%)")
      println(s"[profile] probe list sizes: ${listed.toSeq.sortBy(_._1)}")
      (1 to 3).foreach { i =>
        time(s"ann_topk_pq flat ADC (pass $i)")(noop(
          ProductQuantizer.adcTopK(emb0, 20, 5)))
        time(s"ann_topk_ivfpq       (pass $i)")(noop(
          IvfPq.topK(emb0, 20, 5)))
      }
      spark.stop()
      return
    }

    if (hotOnly) {
      if (!hotSemOnly) {
      // ---- regime where the caps BIND ------------------------------
      // (1) hot shingle: one 13-word stopword phrase appended to EVERY
      // document -> 11 shingles with df = |corpus|. The uncapped
      // inverted-index join fans 11 * C(n, 2) candidate rows from those
      // alone; the df cap drops them from candidate generation.
      val hotDocs = docs.select(col("doc_id"),
        concat(col("text"), lit(" the very best price ever seen in" +
          " this great shop today and forever")).as("text"))
        .localCheckpoint()
      val n = hotDocs.count()
      println(s"[profile] hot corpus: $n docs, every one sharing 11 " +
        "corpus-wide shingles")
      time("ngram UNCAPPED on hot corpus")(noop(
        Dedup.ngramJaccardPairs(hotDocs, "doc_id", "text")))
      time("ngram CAPPED (at-scale) on hot")(noop(
        Dedup.ngramJaccardPairsAtScale(hotDocs, "doc_id", "text")))

      // (2) giant near-identical cluster: 1500 clones of doc 0 (above
      // the 1024 band-bucket cap) -> one LSH bucket of ~1500 per band;
      // the uncapped band self-join materializes ~C(1500, 2) = 1.1M
      // candidate pairs and drags full shingle sets through the
      // rescore; the admission cap excludes the bucket.
      val cluster = docs.select(col("doc_id"), col("text")).unionAll(
        docs.filter(col("doc_id") === 0)
          .select(explode(sequence(lit(1L), lit(1500L))).as("i"), col("text"))
          .select((col("i") + 300000L).as("doc_id"), col("text")))
        .localCheckpoint()
      println(s"[profile] cluster corpus: ${cluster.count()} docs, one " +
        "1501-member identical cluster")
      time("LSH UNCAPPED on cluster")(noop(
        Dedup.minhashLshPairs(cluster, "doc_id", "text",
          maxBucket = Long.MaxValue)))
      time("LSH CAPPED (1024) on cluster")(noop(
        Dedup.minhashLshPairs(cluster, "doc_id", "text")))

      // (2b) substring dup spans at the BINDING regime: the sf docs
      // replicated x20, truncated to 10 body tokens + a shared 13-token
      // tail -> 100k docs, 1.6M gram occurrences of which ~600k are the
      // tail's 6 interior L-grams (df = 100k each). The windowed form
      // pins those 600k rows on 6 h-keys (window exchanges get no AQE
      // skew splitting — the per-task ceiling that single-tasks at
      // 100 TB); the capped operator collapses them map-side in the df
      // aggregate and the semi join drops them before any sort. Cap 24
      // keeps the x20-replicated body grams (df 20), so capped output
      // stays non-empty — recall loss is exactly the hot tail.
      // Runs BEFORE (3): the winnow-uncapped job's shuffle state taxes
      // whatever follows it (the documented 3x order effect).
      locally {
        val tail = " the very best price ever seen in this great shop" +
          " today and forever"
        val hotSpan = docs
          .select(explode(sequence(lit(0L), lit(19L))).as("i"),
            col("doc_id"), col("text"))
          .select((col("doc_id") * 100 + col("i")).as("doc_id"),
            concat(array_join(slice(split(col("text"), " "), 1, 10), " "),
              lit(tail)).as("text"))
          .localCheckpoint()
        println(s"[profile] span corpus: ${hotSpan.count()} docs, 6 " +
          "tail grams at df=100k")
        time("substr spans CAPPED (df<=24)")(noop(
          Dedup.substringDupSpans(hotSpan, "doc_id", "text", 8, maxDf = 24)))
        time("substr spans WINDOWED on hot")(noop(
          Dedup.substringDupSpansWindowed(hotSpan, "doc_id", "text", 8)))
        // the quantity the cap bounds: rows of the biggest h-partition
        // entering the windowed form's sort vs after the capped filter
        val hotRows = Dedup.substringDupSpansMaxPartitionRows(
          hotSpan, "doc_id", "text", 8, maxDf = Long.MaxValue)
        val cappedRows = Dedup.substringDupSpansMaxPartitionRows(
          hotSpan, "doc_id", "text", 8, maxDf = 24)
        println(s"[profile] max gram-partition rows: windowed=$hotRows " +
          s"capped=$cappedRows")
      }

      // (3) boilerplate span: the hot-shingle corpus from (1) doubles as
      // the winnow hot regime — the appended phrase's ~60 normalized
      // chars contribute identical winnow fingerprints to EVERY doc, so
      // each carries df = |corpus| and the uncapped pair join fans
      // C(n, 2) pairs from boilerplate alone; the df cap drops those
      // fingerprints before candidate generation (one-sided).
      // capped runs FIRST: the uncapped job leaves GBs of shuffle state
      // behind and taxes whatever follows it (order effect measured 3x
      // on the capped run when it went second)
      time("winnow spans CAPPED (df<=8)")(noop(
        graft.analysis.TextAnalysis.winnowSharedSpans(
          hotDocs, "doc_id", "text", minShared = 5, maxDf = 8)))
      time("winnow spans UNCAPPED on hot")(noop(
        graft.analysis.TextAnalysis.winnowSharedSpans(
          hotDocs, "doc_id", "text", minShared = 5, maxDf = Long.MaxValue)))
      }

      // (4) giant semantic cluster: 24000 near-identical embeddings on
      // top of the 2000-vector corpus -> one k-means cluster of ~24000;
      // the uncapped within-cluster pair join materializes
      // ~C(24000, 2) = 288M pairs each paying a 64-dim dot product —
      // the C(n, 2) term in the flesh; the capped path pays only the
      // (linear) k-means training and window count, since the cluster
      // admission cap excludes the hot cluster (one-sided).
      // capped FIRST for the same shuffle-state order effect as (3).
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val hotEmb = emb.select(col("vec_id"), col("embedding")).unionAll(
        emb.filter(col("vec_id") === 7)
          .select(explode(sequence(lit(1L), lit(24000L))).as("i"),
            col("embedding"))
          .select((col("i") + 400000L).as("vec_id"), col("embedding")))
        .localCheckpoint()
      println(s"[profile] semantic corpus: ${hotEmb.count()} vectors, " +
        "one ~24000-member identical cluster")
      time("semdedup CAPPED (1024) on hot")(noop(
        graft.dedup.SemanticDedup.semanticDedup(hotEmb,
          k = 4, iters = 2, threshold = 0.45, maxCluster = 1024)))
      time("semdedup UNCAPPED on hot")(noop(
        graft.dedup.SemanticDedup.semanticDedup(hotEmb,
          k = 4, iters = 2, threshold = 0.45)))
      spark.stop()
      return
    }

    time("split only")(noop(docs.select(split(col("text"), " ").as("ws"))))
    time("shingles only")(noop(
      docs.select(Dedup.shingles(col("text")).as("sh"))))
    time("shingles+explode")(noop(
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))))
    time("docShingleSets")(noop(
      Dedup.docShingleSets(docs, "doc_id", "text")))
    val sets = time("docShingleSets+checkpoint")(
      Dedup.docShingleSets(docs, "doc_id", "text").localCheckpoint())
    val sh = sets.select(col("doc_id"), explode(col("ss")).as("s"))
    time("signatures")(noop(Dedup.minhashSignatures(sh)))
    time("full minhashLshPairs")(noop(
      Dedup.minhashLshPairs(docs, "doc_id", "text")))
    time("full ngramJaccardPairs")(noop(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text")))
    time("ngramJaccardPairsAtScale")(noop(
      Dedup.ngramJaccardPairsAtScale(docs, "doc_id", "text")))
    time("full simhashPairs")(noop(
      Dedup.simhashPairs(docs, "doc_id", "text")))
    time("simhash signatures")(noop(
      Dedup.simhash(docs, "doc_id", "text")))

    // q_pair_cooccur stages: order-set aggregate vs pair fan-out+count
    locally {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      time("pc: orders sets only")(noop(
        li.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
          .filter(size(col("ps")) > 1)))
      val sets = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")) > 1)
      time("pc: +pair explode")(noop(
        sets.select(explode(expr(
          """flatten(transform(sequence(1, size(ps) - 1),
            |  i -> transform(slice(ps, i + 1, size(ps) - i),
            |       j -> element_at(ps, i) * 4294967296 + j)))"""
            .stripMargin)).as("pk"))))
      time("pc: +count+top20 (full)")(noop(
        sets.select(explode(expr(
          """flatten(transform(sequence(1, size(ps) - 1),
            |  i -> transform(slice(ps, i + 1, size(ps) - i),
            |       j -> element_at(ps, i) * 4294967296 + j)))"""
            .stripMargin)).as("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pk")).limit(20)))
    }

    // q_stats_aggs percentile formulations
    locally {
      import graft.relational.Scale
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      time("stats builtin buffered")(noop(
        li.groupBy(col("l_returnflag")).agg(
          round(expr("median(l_quantity)"), 4).as("med_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90_price"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("qty_price_corr"))))
      def base = li.groupBy(col("l_returnflag")).agg(
        round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("qty_price_corr"))
      time("stats hist two-scan")(noop {
        val med = Scale.groupedExactPercentiles(li, "l_returnflag",
          col("l_quantity"), Seq("med_raw" -> 0.5))
        val p90 = Scale.groupedExactPercentiles(li, "l_returnflag",
          col("l_extendedprice"), Seq("p90_raw" -> 0.9))
        base.join(med, "l_returnflag").join(p90, "l_returnflag")
      })
      time("stats hist fused stack")(noop {
        val stacked = li.select(col("l_returnflag"),
          expr("stack(2, 'qty', CAST(l_quantity AS DOUBLE)," +
            " 'price', l_extendedprice) AS (metric, v)"))
        val pct = Scale.groupedExactPercentiles(stacked,
            Seq("l_returnflag", "metric"), col("v"),
            Seq("p50" -> 0.5, "p90" -> 0.9))
          .groupBy(col("l_returnflag"))
          .agg(max(when(col("metric") === "qty", col("p50"))).as("med_raw"),
            max(when(col("metric") === "price", col("p90"))).as("p90_raw"))
        base.join(pct, "l_returnflag")
      })
    }

    // embedding similar-pairs variants
    import graft.functions.ArrayOps.array_dot
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("similarPairs current")(noop(
      graft.sim.Similarity.similarPairs(emb, 0.45)))
    locally {
      def side(v: String, e: String, n: String) = emb
        .select(col("vec_id").as(v),
          col("embedding").cast("array<double>").as(e))
        .withColumn(n, sqrt(array_dot(col(e), col(e))))
      val a = side("va", "ea", "na")
      val b = side("vb", "eb", "nb")
      val sim = round(array_dot(col("ea"), col("eb")) / (col("na") * col("nb")), 4)
      val out = a.join(b, col("va") < col("vb") && sim >= 0.45)
        .select(col("va"), col("vb"), sim.as("sim"))
      time("similarPairs cheap-first")(noop(out))
    }
    spark.stop()
  }
}
