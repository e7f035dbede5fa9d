package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress probe: run the heavy operators on synthetically multiplied
  * inputs (10x and 30x sf0.1) to measure how cost grows with data size —
  * the local evidence behind the 100 TB design claims (results recorded in
  * SCALE.md). Not part of the driver contract; run manually:
  *   sbt "runMain graft.ScaleProbe [multiplier] [op1,op2,...]"
  * (second arg: only probe the named operators)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 10
    val only: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.read.parquet(s"$d/region.parquet").count() // warmup

    // docs x mult: ids offset per replica; every 5th token perturbed per
    // replica so replicas are NOT near-dups of each other (keeps the
    // near-dup result set realistic instead of exploding it)
    val docs: DataFrame = spark.read.parquet(s"$d/documents.parquet")
      .crossJoin(spark.range(mult).toDF("r"))
      .select(
        (col("doc_id") * mult + col("r")).as("doc_id"),
        col("lang"), col("source"),
        array_join(
          transform(split(trim(col("text")), "\\s+"),
            (w, i) => when(pmod(i + col("r").cast("int"), lit(5)) === 0,
              concat(w, col("r").cast("string"))).otherwise(w)),
          " ").as("text"))
      .localCheckpoint()

    val emb: DataFrame = spark.read.parquet(s"$d/embeddings.parquet")
      .crossJoin(spark.range(mult).toDF("r"))
      .select(
        (col("vec_id") * mult + col("r")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(col("r") * 31 + i, lit(17)).cast("float") - 8.0f) / 100.0f)
          .as("embedding"),
        col("label"))
      .localCheckpoint()

    val li: DataFrame = spark.read.parquet(s"$d/lineitem.parquet")
      .crossJoin(spark.range(mult).toDF("r"))
      .withColumn("l_orderkey", col("l_orderkey") * mult + col("r"))
      .drop("r")
      .localCheckpoint()

    val nDocs = docs.count(); val nEmb = emb.count(); val nLi = li.count()
    println(s"[scale] mult=$mult docs=$nDocs embeddings=$nEmb lineitem=$nLi")

    def time(name: String, rows: Long)(f: => Long): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-18s ${sec}%7.1f s  ${rows / sec / 1e6}%8.2f M input rows/s  ($n out)")
    }

    time("snippets", nDocs) { SnippetGen.docSnippets(docs).count() }
    val tS = System.nanoTime()
    val stats = Dedup.ngramStats(docs)
    println(f"[scale] ngram stats (${(System.nanoTime() - tS) / 1e9}%.1f s): $stats " +
      s"pairsPerDoc=${stats.pairsPerDoc.round} -> strategy=${Dedup.chooseNgramStrategy(stats).name}")
    time("dedup_ngram_auto", nDocs) { Dedup.ngramNearDupsAuto(docs, 0.5).count() }
    if (sys.env.contains("SPARK_GRAFT_SCALE_EXACT"))
      time("dedup_ngram", nDocs) { Dedup.ngramNearDups(docs, 0.5).count() }
    time("dedup_minhash", nDocs) { Dedup.minhashNearDups(docs, 0.5).count() }
    time("dedup_exact", nDocs) { Dedup.exact(docs, "text", "doc_id").count() }
    time("dedup_clusters", nDocs) {
      Dedup.nearDupClusters(
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b")).count()
    }
    time("cdc_diff", nDocs) {
      val v2 = docs.filter(col("doc_id") % 97 =!= 0)
      Mutations.snapshotDiff(docs, v2, "doc_id", "text")
        .filter(col("change") =!= "unchanged").count()
    }
    time("pack_sequences", nDocs) {
      Curation.packSequences(docs.select("doc_id", "lang", "text"), "lang").count()
    }
    time("hash_sample", nDocs) {
      Curation.hashSample(docs, "text", 8).count()
    }
    time("topk_bruteforce", nEmb) {
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < mult * 5), 10).count()
    }
    time("lsh_topk", nEmb) {
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < mult * 5), 10).count()
    }
    time("ivf_topk_learned", nEmb) {
      // the q_ann_recall production shape: lists learned with 2 Lloyd
      // iterations (list count grows with the corpus — constant target
      // list size, the IVF regime), then 4-probe retrieval; query panel
      // grows with mult like lsh_topk's
      val km = Similarity.kmeansAssign(emb, 10 * mult, 2)
      Similarity.ivfTopK(km, km.filter(col("vec_id") < mult * 5),
        "list_id", 10, 4).count()
    }
    time("ivf_topk_hier", nEmb) {
      // same retrieval with the TWO-LEVEL assign (kmeansAssignHier):
      // O(sqrt(k)) cosines per row per Lloyd iteration instead of k —
      // the finding-12 remedy applied to list learning
      val km = Similarity.kmeansAssignHier(emb, 10 * mult, 2)
      Similarity.ivfTopK(km, km.filter(col("vec_id") < mult * 5),
        "list_id", 10, 4).count()
    }
    // persisted-index split of the same workload: TRAIN once (kmeans +
    // partitioned snapshot write), then PROBE with a FIXED 20-query panel
    // against the published snapshot. The probe row is the serving cost a
    // deployment pays per batch — it must scale with the probed lists'
    // share of the corpus (nprobe/k, and k grows with the corpus at a
    // constant list-size target), never with training or the full scan.
    locally {
      val ivfRoot = "/tmp/graft_probe_ivf"
      Dedup.rmTree(new java.io.File(ivfRoot))
      time("ivf_index_train", nEmb) {
        Similarity.writeIvfIndex(spark, emb, ivfRoot, 10 * mult, 2); nEmb
      }
      time("ivf_index_probe", nEmb) {
        Similarity.ivfProbeIndex(spark, ivfRoot,
          emb.filter(col("vec_id") < 20), 10, 4).count()
      }
      Dedup.rmTree(new java.io.File(ivfRoot))
    }
    time("agg_pricing", nLi) {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"), count(lit(1)).as("n"))
        .count()
    }
    time("fingerprint", nDocs) {
      docs.select(graft.functions.GraftFunctions.poly_hash(col("text"))).count()
    }
    // round-3 operators
    time("tfidf", nDocs) { TextSearch.tfIdf(docs, nDocs).count() }
    time("bm25", nDocs) {
      val r = docs.agg(count(lit(1)),
        sum(size(split(trim(col("text")), "\\s+")).cast("long"))).head()
      TextSearch.bm25(docs, TextSearch.Bm25Query, r.getLong(0),
        r.getLong(1).toDouble / r.getLong(0)).count()
    }
    time("contamination", nDocs) {
      // benchmark sets are FIXED SIZE in practice (a benchmark suite does
      // not grow with the training corpus), so the bench side stays at
      // replica 0's src0 slice (500 docs at any multiplier): the postings
      // join cost sum(freq_corpus * freq_bench) then grows linearly with
      // the corpus. Scaling the bench side WITH the corpus reproduces the
      // saturated-vocab quadratic shape of SCALE.md finding 4 instead.
      TextSearch.contamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0" &&
          pmod(col("doc_id"), lit(mult.toLong)) === 0), 3L).count()
    }
    time("chunk", nDocs) { Curation.chunkTokens(docs).count() }
    time("mixture", nDocs) { Curation.mixtureSample(docs, "source").count() }
    time("repetition", nDocs) { TextAnalysis.repetition(docs).count() }
    // round-3 batch-2 operators. Force with .head() on the 1-row
    // aggregate, never .count(): count-of-aggregate column-prunes the
    // aggregate expressions away (Aggregate[max(e)] -> Aggregate[] both
    // yield one row), which would time a zero-column scan instead of the
    // operator under test.
    time("normalize", nDocs) {
      docs.select(TextNormalize.normalized(col("text")).as("n"))
        .agg(max(length(col("n")))).head(); 1L
    }
    time("c4_filters", nDocs) { TextNormalize.c4Filters(docs).filter(col("kept")).count() }
    time("stopword_df", nDocs) { TextSearch.stopwordDf(docs, 20).count() }
    time("bpe_pairs", nDocs) { TextSearch.bpePairs(docs, 20).count() }
    time("winnow", nDocs) { Dedup.winnowFingerprints(docs).count() }
    time("dedup_keepbest", nDocs) { Dedup.keepBest(docs).count() }
    time("quantize", nEmb) {
      Similarity.quantize(emb).agg(max(col("max_err"))).head(); 1L
    }
    time("zorder", nLi) {
      li.select(Advanced.zvalue(pmod(col("l_orderkey"), lit(65536L)),
        pmod(col("l_partkey"), lit(65536L))).as("z")).agg(max(col("z"))).head(); 1L
    }
    // plain inverted-postings containment goes quadratic on the saturated
    // synthetic vocab (135 s at 30x, SCALE.md) — probe the prefix-filtered
    // exact variant, which is the declared scale path
    time("containment", nDocs) { Dedup.containmentDupsPrefix(docs, 0.9).count() }
    time("containment_auto", nDocs) { Dedup.containmentDupsAuto(docs, 0.9).count() }
    time("repeated_spans", nDocs) { Dedup.repeatedSpans(docs).count() }
    // round-3 batch-4 operators: force through an aggregate over the
    // operator's computed column (same pruning caveat as above)
    time("span_dedup", nDocs) {
      Dedup.spanDedup(docs).agg(sum(length(col("text_clean")))).head(); nDocs
    }
    time("bigram_lm", nDocs) {
      val v = docs.select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .distinct().count()
      TextSearch.bigramLm(docs, v).count()
    }
    time("importance", nDocs) {
      TextAnalysis.importanceWeights(docs, col("source") === "src0")
        .agg(sum(col("log_weight"))).head(); nDocs
    }
    time("split_safe", nDocs) {
      // pair generation at scale goes through the LSH path, like the
      // clusters probe; splitSafe consumes whatever pair source is fed
      Curation.splitSafe(docs,
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b"))
        .groupBy("split").count().collect().length.toLong
    }
    time("budget_select", nDocs) {
      Curation.budgetSelect(docs, 1000000L).agg(max(col("tokens_before"))).head(); nDocs
    }
    // round-3 batch-5 operators
    // the declared trainer path: one capped vocab aggregate + driver loop
    time("bpe_train_local", nDocs) { TextSearch.bpeTrainLocal(docs, 8).count() }
    time("bpe_encode", nDocs) {
      val merges = TextSearch.bpeTrainLocal(docs, 8)
        .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      TextSearch.bpeEncode(docs, merges).agg(sum(col("n_bpe_tokens"))).head(); nDocs
    }
    time("vocab_coverage", nDocs) {
      TextSearch.vocabCoverage(docs, Seq(0.5, 0.9)).head(); nDocs
    }
    // REALISTIC-VOCAB trainer probe (VERDICT r5 #6): the 8-merge gate
    // rows above never stress the driver loop. 1k and 10k merges measure
    // the incremental pair-count maintenance + max-scan cost the
    // production trainer actually pays (Sennrich-style: driver work over
    // the capped word-freq dict, zero Spark jobs per merge). The trainer
    // may exhaust the pair supply first — the learned count is printed so
    // the row is honest about how many merges it actually performed.
    Seq(1000, 10000).foreach { m =>
      var merges: Seq[(String, String)] = Seq.empty
      time(s"bpe_train_${m}", nDocs) {
        merges = TextSearch.bpeTrainLocal(docs, m)
          .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
        merges.length.toLong
      }
      // encode with the JUST-LEARNED table (train cost excluded): the
      // single-pass UDF's per-row cost grows with merge-table depth, the
      // plan does not
      time(s"bpe_encode_${m}", nDocs) {
        TextSearch.bpeEncode(docs, merges).agg(sum(col("n_bpe_tokens"))).head(); nDocs
      }
    }
    time("dataset_card", nDocs) { TextAnalysis.datasetCard(docs).count() }
    time("cross_dedup", nDocs) {
      Dedup.crossNearDupsExact(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), 0.5).count()
    }
    time("cross_dedup_lsh", nDocs) {
      Dedup.crossNearDups(
        docs.filter(col("source") === "src0"),
        docs.filter(col("source") =!= "src0"), 0.5).count()
    }
    // the realistic shape: the probe side is a FIXED held-out set (an
    // eval benchmark does not grow with the training corpus) — same
    // bounded-side rule as the contamination probe above
    time("cross_dedup_fixed", nDocs) {
      Dedup.crossNearDupsExact(
        docs.filter(col("source") === "src0" && pmod(col("doc_id"), lit(mult.toLong)) === 0),
        docs.filter(col("source") =!= "src0"), 0.5).count()
    }
    time("quota_sample", nDocs) {
      Curation.quotaSample(docs, "lang", 25).count()
    }
    // round-4 operators
    time("nb_classify", nDocs) {
      TextAnalysis.nbClassify(docs, "lang").count()
    }
    time("mix_plan", nDocs) {
      Curation.mixPlan(docs, 1000000.0, 2.0, 2.0).count()
    }
    time("confusion", nDocs) { TextAnalysis.confusion(docs).count() }
    time("novelty", nDocs) { TextAnalysis.novelty(docs).count() }
    // round-4 batch-2 operators
    time("sem_dedup", nEmb) {
      // cluster count scales WITH the corpus (the SemDeDup regime:
      // constant target cluster size), so per-cluster pair work stays
      // bounded; a fixed k under a growing corpus would be quadratic
      Similarity.semDedup(emb, 16 * mult, 0.35).filter(col("is_dup")).count()
    }
    time("sem_dedup_hier", nEmb) {
      // same growing-k regime through the two-level assignment:
      // ~2*sqrt(k) cosines per row instead of k
      Similarity.semDedupHier(emb, 16 * mult, 0.35).filter(col("is_dup")).count()
    }
    time("coreset_k8", nEmb) {
      // running-min shape (round 5): one cosine per row per round + a
      // localCheckpoint — per-round cost must stay FLAT in the number of
      // already-selected centers (the r4 literal-chain was k²/2·N)
      Similarity.kCenterSelect(emb, 8).count()
    }
    time("coreset_k32", nEmb) {
      // 4x the rounds must cost ~4x coreset_k8, not 16x
      Similarity.kCenterSelect(emb, 32).count()
    }
    time("bloom_decontam", nDocs) {
      // bench side fixed (same bounded-benchmark rule as `contamination`)
      TextSearch.bloomContamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0" &&
          pmod(col("doc_id"), lit(mult.toLong)) === 0), 1L).count()
    }
    time("calibration", nDocs) {
      TextAnalysis.calibrationSweep(docs, col("lang") === "en",
        size(filter(split(trim(col("text")), "\\s+"),
          w => w.isInCollection(Stopwords.en))),
        size(split(trim(col("text")), "\\s+")), 20).count()
    }
    time("export_manifest", nDocs) {
      Curation.exportManifest(
        docs.withColumn("n_chars", length(col("text"))), 64).count()
    }
    val ev = graft.engine.Tables.normalizeTs(
        spark.read.parquet(s"$d/events.parquet"))
      .crossJoin(spark.range(mult).toDF("r"))
      .select((col("event_id") * mult + col("r")).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"))
      .localCheckpoint()
    val nEv = ev.count()
    time("decay", nEv) {
      val ref = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
      // sum over the score column so the decimal weight math cannot be
      // pruned (bare .count() drops the sum aggregate entirely)
      EventAnalytics.decayScores(ev, ref)
        .agg(sum(col("decayed_score"))).head(); nEv
    }
    time("skew_stats", nEv) {
      Advanced.keySkew(ev.withColumn("event_type", pmod(col("event_id"), lit(5L))),
        "event_type", "user_id").collect().length.toLong
    }
    time("funnel", nEv) {
      EventAnalytics.funnel(ev, Seq("view", "click", "purchase"))
        .agg(sum(col("depth"))).head(); nEv
    }
    time("retention", nEv) { EventAnalytics.retention(ev).count() }
    time("anomaly", nEv) { EventAnalytics.anomalies(ev, 3.0).count() }
    time("transitions", nEv) { EventAnalytics.transitions(ev).count() }
    // skew posture: the event suite shuffles on user_id; a power-law
    // corpus concentrates a constant FRACTION of all events on one hot
    // user (here 1/3), so the hot window partition grows linearly with
    // the corpus and pins one task — AQE splits skewed JOIN/AGG
    // partitions but can never split a window partition (every row of a
    // window key must see one task). These rows measure how far the
    // hot task stretches the suite vs the uniform runs above.
    val evSkew = ev
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(3L)) === 0, lit(424242L))
          .otherwise(col("user_id")))
      .localCheckpoint()
    time("funnel_hotuser", nEv) {
      EventAnalytics.funnel(evSkew, Seq("view", "click", "purchase"))
        .agg(sum(col("depth"))).head(); nEv
    }
    time("retention_hotuser", nEv) { EventAnalytics.retention(evSkew).count() }
    time("anomaly_hotuser", nEv) { EventAnalytics.anomalies(evSkew, 3.0).count() }
    // the algebraic escape: same hot fixture through the two-phase
    // formulation (map-side-combined moments + AQE-splittable join) and
    // through the router, which should detect the 1/3-hot user and pick
    // two_phase on its own once the hot count clears the task budget
    time("anomaly_hotuser_2p", nEv) {
      EventAnalytics.anomaliesTwoPhase(evSkew, 3.0).count()
    }
    time("anomaly_hotuser_auto", nEv) {
      EventAnalytics.anomaliesAuto(evSkew, 3.0).count()
    }

    // dedup-gate batch at scale (round 6): one full micro-batch of the
    // multiplied corpus through all four rejection stages against an
    // index seeded with the corpus' even half — the per-batch serving
    // cost of the streaming gate (the q_dedup_gate bench row is two
    // micro-batches at sf0.1 plus harness overhead; this isolates the
    // batch itself as the corpus grows)
    if (only.isEmpty || only.contains("dedup_gate_batch")) {
      val root = "/tmp/graft_probe_gate"
      Dedup.rmTree(new java.io.File(root))
      val half = docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
      graft.streaming.StreamingJobs.dedupGateBatch(spark, half, 0L,
        s"$root/acc", s"$root/idx", s"$root/rej", 0.5, exactPairs = true)
      time("dedup_gate_batch", nDocs) {
        graft.streaming.StreamingJobs.dedupGateBatch(spark,
          docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"), 1L,
          s"$root/acc", s"$root/idx", s"$root/rej", 0.5, exactPairs = true)
        spark.read.parquet(s"$root/acc").count()
      }
      Dedup.rmTree(new java.io.File(root))
    }

    // round-4c additions: orders multiplied CONSISTENTLY with lineitem
    // (same orderkey transform) so the pagerank derivation join scales
    // with mult instead of dropping rows. Both big inputs are staged to
    // PARQUET, not localCheckpoint: an ExistingRDD scan feeds the SMJ
    // row-by-row off the heap and its cost degrades superlinearly with
    // the cached volume (24 s vs 5 s at 30x — SCALE finding 13), which
    // would masquerade as an engine defect.
    if (only.isEmpty || only.contains("pagerank")) {
      li.write.mode("overwrite").parquet("/tmp/graft_probe_li")
      spark.read.parquet(s"$d/orders.parquet")
        .crossJoin(spark.range(mult).toDF("r"))
        .withColumn("o_orderkey", col("o_orderkey") * mult + col("r"))
        .drop("r")
        .write.mode("overwrite").parquet("/tmp/graft_probe_ord")
      val liP = spark.read.parquet("/tmp/graft_probe_li")
      val ordx = spark.read.parquet("/tmp/graft_probe_ord")
      time("pagerank", nLi) {
        val cust = spark.read.parquet(s"$d/customer.parquet")
        val supp = spark.read.parquet(s"$d/supplier.parquet")
        val edges = liP.select(col("l_orderkey"), col("l_suppkey"))
          .join(ordx.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust.select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(supp.select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
        Graph.pageRank(edges, 5, 0.85).count()
      }
    }
    // round-6: the composite curation pipeline with the UNHINTED dedup
    // anti-join — the dropped set grows with the corpus, so the planner
    // must keep picking a strategy that works when it is no longer
    // broadcastable (qCurate dropped its broadcast() hint this round).
    // Pair generation goes through the LSH path at scale, like the
    // clusters probe (the oracle-pinned exact-ngram path is a gate-scale
    // choice, not the 100 TB one).
    time("curate", nDocs) {
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(docs))
      val dropped = Dedup.nearDupClusters(
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b"))
        .filter(col("id") =!= col("label")).select(col("id").as("doc_id"))
      scored.join(dropped, Seq("doc_id"), "left_anti")
        .filter(col("quality_score") >= 0.5 && col("lang_pred") =!= "und")
        .count()
    }
    // curate component breakdown (sum ≈ curate; the residual is the
    // anti-join + final filter)
    time("curate_scored", nDocs) {
      TextAnalysis.withLangId(TextAnalysis.withQuality(docs))
        .agg(sum(col("quality_score")), count(col("lang_pred"))).head(); nDocs
    }
    time("curate_dropped", nDocs) {
      Dedup.nearDupClusters(
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b"))
        .filter(col("id") =!= col("label")).count()
    }
    // phase-split diagnostic: construction (pair gen + clusters, eager
    // checkpoints) vs execution (scored scan + anti-join)
    if (only.contains("curate_v3")) {
      val t0 = System.nanoTime()
      val dropped = Dedup.nearDupClusters(
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b"))
        .filter(col("id") =!= col("label")).select(col("id").as("doc_id"))
        .localCheckpoint()
      println(f"[scale] curate_v3 construct ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val t1 = System.nanoTime()
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(docs))
        .filter(col("quality_score") >= 0.5 && col("lang_pred") =!= "und")
        .select("doc_id", "lang_pred", "n_tokens", "quality_score")
      val n = scored.join(dropped, Seq("doc_id"), "left_anti").count()
      println(f"[scale] curate_v3 execute ${(System.nanoTime() - t1) / 1e9}%.1f s ($n out)")
    }
    // variant: quality/lang filter + projection BEFORE the anti-join
    time("curate_v2", nDocs) {
      val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(docs))
        .filter(col("quality_score") >= 0.5 && col("lang_pred") =!= "und")
        .select("doc_id", "lang_pred", "n_tokens", "quality_score")
      val dropped = Dedup.nearDupClusters(
        Dedup.minhashNearDups(docs, 0.5).select("doc_a", "doc_b"))
        .filter(col("id") =!= col("label")).select(col("id").as("doc_id"))
      scored.join(dropped, Seq("doc_id"), "left_anti").count()
    }
    time("embed_outliers", nEmb) { Similarity.embedOutliers(emb, 2.0).count() }
    time("phrase_search", nDocs) {
      TextSearch.phraseSearch(docs, Seq("part", "filter")).count()
    }

    // ---- round-6 widening: web ingestion, PQ serving, session stream
    {
      import spark.implicits._
      import graft.sources.{HtmlIngest, WarcIngest}
      // the probe's multiplied docs frame is a SINGLE partition (broadcast
      // crossJoin of a one-split file) — narrow per-row operators would
      // serialize on one core, which is the finding-2 trap, not a
      // measurement; spread like Tables.rebalance does for engine paths
      // lazy: materialized only when a probe in this block actually runs
      // (a filtered invocation like `ScaleProbe 30 anomaly` must not pay
      // the 64-partition re-spread or the PQ training below)
      lazy val docsWide = docs.select(col("doc_id"), col("text"))
        .repartition(64, col("doc_id")).as[(Long, String)].localCheckpoint()
      time("html_extract", nDocs) {
        docsWide.map { case (id, t) =>
            HtmlIngest.htmlToText(
              HtmlIngest.buildHtml(id, if (t == null) "" else t)).length
          }.filter(_ >= 0).count()
      }
      time("warc_parse", nDocs) {
        // build + walk multi-record archives in memory, ~50 docs/archive
        docsWide.mapPartitions(_.grouped(50).map(g =>
            WarcIngest.parseWarcResponses(WarcIngest.buildWarcFile(g)).length.toLong))
          .reduce(_ + _)
      }
      time("url_filter", nDocs) { UrlOps.urlVerdicts(docs.repartition(64, col("doc_id"))).count() }
      time("cdc_chunks", nDocs) { Dedup.cdcChunks(docs).count() }
      time("compress_ratio", nDocs) {
        TextAnalysis.compressionSignals(
          docs.repartition(64, col("doc_id"))).count()
      }
      time("unigram_lm", nDocs) { TextSearch.unigramSegment(docs).count() }
      lazy val pqBooks = Similarity.pqTrainCodebooks(emb, 2)
      time("pq_adc_topk", nEmb) {
        // FIXED 20-query panel: the growth axis is the corpus (encode +
        // rank are linear in N per query); serving QPS scales by adding
        // executors, not by growing this probe's panel
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 20 * mult.toLong &&
          pmod(col("vec_id"), lit(mult.toLong)) === 0), pqBooks, 50).count()
      }
      time("stream_session", nEv) {
        val us = 1000000L
        val bounds = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
        val midUs = (bounds.getLong(0) + bounds.getLong(1)) / 2
        val waves = Seq(
          ev.filter(unix_micros(col("ts")) < midUs).select(col("user_id"), col("ts")),
          ev.filter(unix_micros(col("ts")) >= midUs).select(col("user_id"), col("ts")),
          spark.range(1).select(lit(-1L).as("user_id"),
            timestamp_micros(lit(bounds.getLong(1) + 4 * 3600 * us)).as("ts")))
        graft.streaming.StreamingJobs.replaySessionWaves(spark,
          graft.operators.Dedup.processTempDir("graft_scale_sess"),
          waves, "1 hour", "30 minutes").count()
      }

      // ---- round-7 widening: span corruption, WordPiece, charset, robots
      time("span_corrupt", nDocs) {
        Curation.spanCorrupt(docsWide.toDF("doc_id", "text"))
          .agg(sum(col("n_masked"))).head(); nDocs
      }
      time("wordpiece", nDocs) {
        // corpus collapses to the bounded (word, freq) table before any
        // encoding — the BPE/unigram trainer discipline
        val words = TextSearch.uniWordFreq(docsWide.toDF("doc_id", "text"))
          .localCheckpoint()
        val vocab = TextSearch.uniSeedVocab(words).map(_._1).toSet
        val bc = spark.sparkContext.broadcast(vocab)
        words.select(col("word"), col("freq")).as[(String, Long)]
          .mapPartitions { it =>
            val v = bc.value
            it.map { case (w, _) => TextSearch.wordpieceEncode(w, v).length }
          }.count()
      }
      time("charset_sniff", nDocs) {
        import graft.sources.CharsetSniff
        docsWide.map { case (id, t) =>
          CharsetSniff.sniff(CharsetSniff.encodePayload(id, t))._1.length
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("robots_verdict", nDocs) {
        docsWide.mapPartitions { it =>
          // cache keyed by the parsed HOST (the per-domain dim), not the
          // per-document URL — a URL key would never hit and grow one
          // entry per row (review finding, round 7)
          val cache = scala.collection.mutable.Map
            .empty[String, Seq[CrawlPolicy.RobotsGroup]]
          it.map { case (id, _) =>
            val host = UrlOps.parseUrl(graft.sources.HtmlIngest.pageBaseUrl(id))
              .map(_.host).getOrElse("")
            val groups = cache.getOrElseUpdate(host,
              CrawlPolicy.parseRobots(CrawlPolicy.robotsFor(host)))
            if (CrawlPolicy.verdict(groups, CrawlPolicy.Agent, "/x/" + id)._1) 1L else 0L
          }
        }.agg(sum(col("value"))).head(); nDocs
      }

      // ---- round-7 batch 2: media near-dup, OCR, BFS frontier
      // media sets grow with mult (ids are dense, every image/clip
      // distinct); encode+decode are per-row narrow work, the near-dup
      // joins are the growth axis under test
      val nMedia = 200L * mult
      time("image_dhash", nMedia) {
        Multimodal.dhashNearDups(
          spark.range(nMedia).select(col("id").as("doc_id"))
            .repartition(64, col("doc_id")).as[Long]
            .mapPartitions(it => it.map(id => (id, Multimodal.buildPngTextured(id, 0))))
            .toDF("doc_id", "media")).count()
      }
      time("audio_fp", nMedia) {
        Multimodal.audioFpVerdicts(
          spark.range(nMedia).select(col("id").as("doc_id"))
            .repartition(64, col("doc_id")).as[Long]
            .mapPartitions(it => it.map(id => (id, Multimodal.buildWavTextured(id, 1))))
            .toDF("doc_id", "media")).count()
      }
      time("ocr_roundtrip", nMedia) {
        // render + template-match decode per document: embarrassingly
        // parallel narrow work, the probe pins per-row cost flat
        docsWide.filter(col("doc_id") < nMedia).map { case (id, t) =>
          graft.sources.OcrEngine.ocrExtractPdf(
            graft.sources.OcrEngine.buildPdfScanned(t)).length.toLong
        }.agg(sum(col("value"))).head(); nMedia
      }
      time("ocr_trained", nMedia) {
        // training is corpus-independent (37 glyphs x 8 samples); the
        // per-doc recognition is the same narrow walk as the fixed font
        import graft.sources.{OcrEngine, OcrTrained}
        val learned = OcrTrained.trainTemplates(OcrTrained.trainingSamples(spark))
        val fontB = OcrTrained.FontB.toMap
        docsWide.filter(col("doc_id") < nMedia).map { case (id, t) =>
          val (w, h, img) = OcrEngine.renderRasterWith(fontB)(OcrEngine.ocrNormalize(t))
          OcrTrained.ocrExtractPdfWith(learned)(
            OcrEngine.buildScannedPdf(w, h, img)).length.toLong
        }.agg(sum(col("value"))).head(); nMedia
      }
      time("pca", nEmb) {
        // d^2 Long accumulators ride the scan (one narrow pass per
        // partial); the iteration is d-sized driver work
        graft.operators.Spectral.topComponent(emb).count()
      }
      time("luhn", nDocs) {
        // narrow per-row construct + codegen'd declarative checksum
        import org.apache.spark.sql.functions.{reverse => frev}
        docs.select(col("doc_id")).as[Long]
          .mapPartitions(it => it.map(id =>
            (id, graft.operators.TextAnalysis.panFor(id))))
          .toDF("doc_id", "pan")
          .withColumn("rev", frev(col("pan")))
          .withColumn("ok", expr(
            "aggregate(transform(sequence(0, length(rev) - 1), i -> " +
              "CASE WHEN i % 2 = 1 THEN " +
              "IF(2 * (ascii(substring(rev, i + 1, 1)) - 48) > 9, " +
              "2 * (ascii(substring(rev, i + 1, 1)) - 48) - 9, " +
              "2 * (ascii(substring(rev, i + 1, 1)) - 48)) " +
              "ELSE ascii(substring(rev, i + 1, 1)) - 48 END), " +
              "0, (acc, x) -> acc + x) % 10 = 0"))
          .filter(col("ok")).count()
      }
      time("distinct_n", nDocs) {
        // three positional explodes, each collapsing map-side to a
        // distinct-gram count — the stopword_df shape
        graft.operators.TextAnalysis.distinctN(docs).count()
      }
      time("doremi", nDocs) {
        // one map-side-combined corpus aggregation; the MW loop runs on
        // the |domains|-sized collected table
        graft.operators.Doremi.reweight(
          graft.operators.Doremi.domainLoss(docs)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq).size.toLong
      }
      time("doremi_kn", nDocs) {
        // the real proxy loss: one bigram explode (keys shuffle, text
        // doesn't) + doc/source-keyed aggs feed the same MW loop
        graft.operators.Doremi.reweight(
          graft.operators.Doremi.domainLossKn(docs)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq).size.toLong
      }
      time("pca_k", nEmb) {
        // the two scatter passes are shared with pca; deflation adds k
        // d-sized driver solves, corpus-independent
        graft.operators.Spectral.topComponentsK(
          emb, graft.operators.Spectral.TopK).count()
      }
      time("rep_span_max", nDocs) {
        // ~7 linear passes (per-doc binary search, global counting);
        // worst round = |open lengths| x corpus positions, cap-bounded
        graft.operators.Dedup.longestRepeatedSpan(docs).count()
      }
      time("maxsim_routed", nEmb) {
        // router candidates per query token (exact arm under the corpus
        // threshold, index arms beyond) + exact rerank on candidate docs
        val toks = emb.select(expr("vec_id div 4").as("doc_id"),
          pmod(col("vec_id"), lit(4L)).cast("int").as("tok_id"), col("embedding"))
        graft.operators.Similarity.maxSimTopKRouted(
          toks, toks.filter(col("doc_id") < 3), 10).count()
      }
      time("minhash_est", nDocs) {
        // the dedup_minhash shape + one K-wide compare per candidate
        graft.operators.Dedup.minhashEstimates(docs).count()
      }
      time("unicode_nfc", nDocs) {
        // narrow per-row UAX#15 composition, the md_extract shape
        docsWide.map { case (id, _) =>
          java.text.Normalizer.normalize(
            graft.operators.TextNormalize.nfdTextFor(id),
            java.text.Normalizer.Form.NFC).length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("alpha_sample", nDocs) {
        // one keyed corpus aggregation + a |sources|-row scalar attach
        graft.operators.Curation.alphaSample(docs).count()
      }
      time("abtt_k", nEmb) {
        // the shared fit + one narrow per-vector removal pass
        graft.operators.Spectral.abttK(emb).count()
      }
      time("ann_auto", nEmb) {
        // the router flips from exact (1x: 2000 vecs) to sharded HNSW
        // (10x/30x: over AnnExactCorpusMax) — the probe exercises the
        // crossover itself
        graft.operators.Similarity.annTopKAutoTagged(
          emb, emb.filter(col("vec_id") % 997 === 0), 10)._1.count()
      }
      time("caption_trained", nMedia) {
        // bounded trainer panel (400 pairs) + narrow per-row scoring:
        // the probe pins the whole train+classify cost flat in corpus
        graft.operators.Multimodal.qCaptionTrained(spark, d).count()
      }
      // ---- round-7 batch 3: markdown prose, audio resample, shot cuts
      // all narrow per-row decode/extract work (media bytes never
      // shuffle); probes pin per-row cost flat in corpus size
      time("md_extract", nDocs) {
        import graft.sources.MarkdownIngest
        docsWide.map { case (id, t) =>
          MarkdownIngest.mdToText(
            MarkdownIngest.buildMd(id, if (t == null) "" else t)).length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("wiki_extract", nDocs) {
        import graft.sources.WikiIngest
        docsWide.map { case (id, t) =>
          WikiIngest.wikiToText(
            WikiIngest.buildWiki(id, if (t == null) "" else t)).length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("tex_extract", nDocs) {
        import graft.sources.LatexIngest
        docsWide.map { case (id, t) =>
          LatexIngest.texToText(
            LatexIngest.buildTex(id, if (t == null) "" else t)).length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("audio_resample", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            Multimodal.decodeWavSamples(Multimodal.buildWavTextured(id, 1)) match {
              case Some((rate, ch, samples)) =>
                Multimodal.resampleLinear(samples, ch, rate,
                  Multimodal.ResampleRate).length.toLong
              case None => 0L
            }
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("video_shots", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            val dims = ((id % 19 + 6).toInt, (id % 11 + 6).toInt, Multimodal.ShotFrames)
            Multimodal.decodeAviGray(
              Multimodal.buildAviDib(dims, Multimodal.shotPixel(id))) match {
              case Some((w, h, rs)) =>
                Multimodal.shotBoundaries(w, h, rs).count(_._3).toLong
              case None => 0L
            }
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("audio_vad", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            Multimodal.decodeWavSamples(Multimodal.buildWavVad(id)) match {
              case Some((_, _, samples)) => Multimodal.vadSegments(samples).length.toLong
              case None                  => 0L
            }
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("png_meta", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            Multimodal.pngTextChunks(Multimodal.addTextChunks(
              Multimodal.buildPng(id), Multimodal.pngMetaFor(id))) match {
              case Some((_, _, kvs)) => kvs.length.toLong
              case None              => 0L
            }
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("bitext_align", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            val n = Bitext.nSrcSentences(id)
            Bitext.align(Array.tabulate(n)(Bitext.srcLen(id, _)),
              Bitext.tgtLens(id).toArray).length.toLong
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("code_scan", nDocs) {
        import graft.sources.CodeIngest
        docsWide.map { case (id, t) =>
          val code = CodeIngest.buildCode(id, if (t == null) "" else t)
          val sc = CodeIngest.scanComments(code)
          val (_, via) = CodeIngest.detectLicense(code)
          sc.nLine.toLong + sc.nBlock + CodeIngest.secretCounts(code).length + via.length
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("chat_parse", nDocs) {
        import graft.sources.ChatIngest
        docsWide.map { case (id, t) =>
          ChatIngest.parseChat(
            ChatIngest.buildChat(id, if (t == null) "" else t)).length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("blur_screen", nMedia) {
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .map { id =>
            val bytes = if (id % 4 == 0) Multimodal.buildPngBlur(id)
              else Multimodal.buildPngTextured(id, 0)
            Multimodal.decodePngGray(bytes) match {
              case Some((w, h, px)) => Multimodal.lapEnergy(w, h, px)
              case None             => -1L
            }
          }.agg(sum(col("value"))).head(); nMedia
      }
      time("json_validate", nDocs) {
        import graft.sources.JsonContract
        docsWide.map { case (id, t) =>
          JsonContract.validate(JsonContract.parseFlat(
            JsonContract.buildLine(id, "en", "src", t)))._1.length.toLong
        }.agg(sum(col("value"))).head(); nDocs
      }
      time("hnsw_topk", nEmb) {
        // per-shard graph build + 20-query fan-out; the growth axis is
        // shard size (graph build ~ n·M·efC per shard). The multiplied
        // emb's perturbation arithmetic promoted to array<double> —
        // cast back to the table's float element type
        val embF = emb.select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        val panel = embF.filter(col("vec_id") < 20)
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          .sortBy(_._1)
        Hnsw.hnswTopK(embF, panel, 10).count()
      }
      if (only.isEmpty || only.contains("hnsw_insert")) {
        // the base index build is SETUP, paid once outside the timer
        // (a review caught the timer wrapping writeHnswIndex, which made
        // the registered metric track the O(base) rebuild the probe
        // exists to prove unnecessary — the append-only phase is the
        // whole claim): restore (one index scan) + |batch| real inserts;
        // the batch is FIXED (1k vectors) while the base grows with mult
        val embF = emb.select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        val root = graft.operators.Dedup.processTempDir("scale_hnsw_insert")
        graft.operators.Dedup.rmTree(new java.io.File(root))
        val base = embF.filter(col("vec_id") >= 1000)
        val batch = embF.filter(col("vec_id") < 1000)
        Hnsw.writeHnswIndex(spark, base, root)
        time("hnsw_insert", nEmb) {
          Hnsw.appendHnswIndex(spark, root, batch)
          nEmb
        }
      }
      time("bfs_frontier", 400L * mult) {
        // node universe grows with mult; seeds and hop budget fixed —
        // per-wave cost tracks the FRONTIER, not the graph
        val bound = 400L * mult
        val edges = spark.range(bound).select(col("id").as("src"),
          explode(array((col("id") * 31 + 7) % bound,
            (col("id") * 17 + 3) % bound)).as("dst")).localCheckpoint()
        val seeds = spark.range(3).select(col("id").as("node"))
        graft.operators.Graph.bfsFrontier(edges, seeds, 5).count()
      }

      // ---- round-7 batch 10: video near-dup, anchor text, DPO, JPEG walk
      time("video_dedup", nMedia) {
        // clips grow with mult; the (frame, band) bucket join is the
        // growth axis (decode + per-frame hashing is per-row narrow)
        Multimodal.videoNearDups(
          spark.range(nMedia).select(col("id").as("doc_id"))
            .repartition(64, col("doc_id")).as[Long]
            .mapPartitions(it => it.map(id =>
              (id, Multimodal.buildAviDib(Multimodal.aviDims(id),
                Multimodal.videoPixelTextured(id, 0)))))
            .toDF("doc_id", "media")).count()
      }
      time("anchor_text", nMedia * 5) {
        // hub pages grow with mult (5 links each); both aggregates are
        // map-side combinable on the target key, the top-anchor window
        // runs over the collapsed tally
        import graft.sources.HtmlIngest
        import org.apache.spark.sql.expressions.Window
        val links = spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .mapPartitions { it =>
            it.flatMap { id =>
              val base = HtmlIngest.pageBaseUrl(id)
              HtmlIngest.extractAnchors(HtmlIngest.buildAnchorPage(id))
                .flatMap { case (href, text) =>
                  UrlOps.resolveRef(base, href).map(abs => (id, abs, text))
                }
            }
          }.toDF("doc_id", "url", "anchor")
        val tally = links.groupBy("url", "anchor").agg(count(lit(1)).as("n"))
        tally.withColumn("rn", row_number().over(
            Window.partitionBy("url").orderBy(col("n").desc, col("anchor").asc)))
          .filter(col("rn") === 1).count()
      }
      time("dpo_pairs", nDocs) {
        // pools stay prompt-sized as the corpus grows (the bucket key
        // spreads); one exchange feeds both ranking windows
        Curation.dpoPairs(docs).count()
      }
      time("rouge", nDocs) {
        // pairs double with the corpus; overlap joins are (pair, gram)
        // keyed with map-side partials — the contamination-join shape
        TextAnalysis.rougePairs(docs).count()
      }
      time("hits", nLi) {
        // the edge list is nation x nation however big lineitem grows —
        // the probe measures the trade-edge aggregation (corpus-sized)
        // + 4 iterations of |nodes|-sized joins
        graft.operators.Graph.hits(
          li.select(col("l_orderkey") % 25, (col("l_orderkey") * 7) % 25, lit(1L))
            .toDF("src", "dst", "w")
            .groupBy("src", "dst").agg(sum("w").as("w")), 4).count()
      }
      time("html_tables", nMedia) {
        // pages grow with mult; the walk is one O(len) pass per page,
        // 5 scalars per cell exit
        import graft.sources.HtmlIngest
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .mapPartitions(it => it.map(id =>
            HtmlIngest.extractTables(HtmlIngest.buildTablePage(id)).length.toLong))
          .agg(sum(col("value"))).head(); nMedia
      }
      time("caption_check", nMedia) {
        // per-pair decode + parse, one verdict row exits
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .mapPartitions(it => it.map { id =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(Multimodal.buildPng(id)))
            if (img != null && Multimodal.captionFor(id)
                .startsWith(s"image ${img.getWidth}x")) 1L else 0L
          })
          .agg(sum(col("value"))).head(); nMedia
      }
      time("jpeg_meta", nMedia) {
        // header-only walk: per-row narrow, no decode — should scale
        // with encode cost (the probe's own fixture generation)
        spark.range(nMedia).select(col("id").as("doc_id"))
          .repartition(64, col("doc_id")).as[Long]
          .mapPartitions(it => it.map(id =>
            if (Multimodal.jpegMeta(Multimodal.buildJpeg(id)).isDefined) 1L else 0L))
          .agg(sum(col("value"))).head(); nMedia
      }
      time("langid_trained", nDocs) {
        // two trigram explodes over the corpus; profiles are a 3K-row
        // broadcast; the label-space completion is |classes| = 3 rows
        import graft.operators.TrainedLangId
        val corpus = TrainedLangId.labeledCorpus(docs)
        val prof = TrainedLangId.trainProfiles(corpus.filter(col("doc_id") % 2 === 0))
        TrainedLangId.classify(
          corpus.filter(col("doc_id") % 2 === 1).select("doc_id", "t"), prof).count()
      }
    }
    spark.stop()
  }
}
