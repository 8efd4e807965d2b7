package graft

/** Automated scale audit over EVERY registered query's physical plan —
  * the regression gate behind the ".explain and iterate" rule: a
  * future edit that sneaks in an unbounded cartesian product, loses a
  * pushed filter, or drops the top-k plan shape fails here, not at
  * 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  // topKJoin deliberately crossJoins a BROADCAST query side (bounded,
  // documented at Similarity.topKJoin); it plans as
  // BroadcastNestedLoopJoin, never a shuffled CartesianProduct.
  // knn_classify and retrieval_eval ride the same operator.
  // bigram_pmi crossJoins its BROADCAST 1-row corpus-totals aggregate
  // (TextAnalysis.bigramPmi) — bounded by construction. The DSIR
  // queries do the same for the 1-row gram totals
  // (Dsir.logRatioTable).
  // binary_batch_knn broadcasts its query codes the same way
  // (BinaryQuantIndex.queryBatch).
  // pct_rank_scores crossJoins its broadcast 1-row count the same way.
  // margin_pairs/margin_mine ride topKJoin's broadcast query cross in
  // both directions (BitextMine). domain_kl crossJoins its broadcast
  // few-keys totals and 1-row corpus scalars (Drift.unigramKl) —
  // both bounded by construction.
  // sketch_quantiles joins 4 probe rows against the ≤ B-row sketch on
  // a rank-range inequality (HistSketch.quantiles) — both sides
  // bounded by construction.
  private val broadcastNljAllowed =
    // skipgram_pmi crossJoins its broadcast 1-row totals exactly like
    // bigram_pmi — bounded by construction
    Set("knn_batch_join", "knn_classify", "retrieval_eval", "bigram_pmi",
      "skipgram_pmi",
      // ks_drift / chi2_drift / embedding_anisotropy_md5 cross only
      // their broadcast 1-row totals (Drift.ksStat / Drift.chiSquared
      // / the anisotropy count) — bounded by construction, the
      // bigram_pmi shape
      "ks_drift", "chi2_drift", "embedding_anisotropy_md5",
      "dsir_weights", "dsir_select", "binary_batch_knn",
      "pct_rank_scores", "margin_pairs", "margin_mine", "domain_kl",
      "sketch_quantiles",
      // funnel_steps crossJoins its broadcast 1-row step-1 count
      // (Funnel.funnel); cooc_lift its broadcast 1-row corpus doc
      // count (TextAnalysis.coocLift); token_pagerank rides the same
      // cooc pairs plus Graph.pageRank's broadcast 1-row N;
      // dense_hourly crossJoins its broadcast 1-row bucket bounds
      // (TimeWindows.densify) — all bounded by construction
      // funnel_lag and hll_setops cross only broadcast 1-row
      // aggregates (per-step lag scalars / sketch estimates + exacts)
      // period_over_period rides densify's broadcast bounds;
      // ab_test crosses its broadcast 1-row variant min/max
      "funnel_steps", "cooc_lift", "token_pagerank", "dense_hourly",
      "funnel_lag", "hll_setops", "period_over_period", "ab_test",
      // the weighted/directed PageRank and the graph queries ride the
      // same cooc pairs (broadcast 1-row N); pagerank_directed also
      // crosses its broadcast 1-row per-round dangling-mass scalar —
      // bounded by construction
      "token_pagerank_weighted", "pagerank_directed",
      "token_triangles", "token_bfs",
      // token_hits crosses its broadcast 1-row L1 normalizers;
      // token_ppr its broadcast 1-row seed count + dangling scalar;
      // session_funnel is funnel_steps' shape keyed by session
      "token_hits", "token_ppr", "session_funnel",
      // ivf_fixed_recall rides topKJoin's broadcast query cross for
      // its brute-force reference side (8 queries, bounded);
      // split_by_component crosses its broadcast 1-row leaking-pair
      // count — bounded by construction
      "ivf_fixed_recall", "split_by_component",
      // graph_ann_recall rides the same topKJoin broadcast query
      // cross for its exact-cosine truth side (≤ 5 queries, bounded)
      "graph_ann_recall",
      // rfm_segments crosses three broadcast 1-row counts (the
      // Profile.ntileExact quartile arithmetic) — bounded by
      // construction
      "rfm_segments",
      // vocab_growth crosses a broadcast 1-row count (ntileExact) and
      // inequality-joins its broadcast ≤10-row bucket summary —
      // bounded by construction
      "vocab_growth",
      // length_batches inequality-joins its broadcast ≤64-row
      // power-of-two bucket-count summary (per-bucket start offsets)
      // — bounded by construction
      "length_batches",
      // k_anonymity inequality-joins its 4-row threshold frame
      // against the (lang, source) class sizes — bounded by
      // construction
      "k_anonymity",
      // funnel_exclusion composes three broadcast 1-row counts;
      // changepoint_cusum inequality-joins its broadcast
      // calendar-sized day summary + a 1-row totals cross — all
      // bounded by construction
      "funnel_exclusion", "changepoint_cusum",
      // psi_drift crosses ntileExact's broadcast 1-row count, bins
      // the current slice against the broadcast ≤10-row edge table
      // (inequality join), and crosses two broadcast 1-row totals —
      // bounded by construction
      "psi_drift",
      // blocking_quality composes four broadcast 1-row counts;
      // hour_profile and covisitation cross their broadcast 1-row
      // totals — bounded by construction
      "blocking_quality", "hour_profile", "covisitation",
      // modularity crosses its broadcast 1-row edge count m onto the
      // communities-sized frame — bounded by construction; the
      // louvain move round rides the same broadcast 1-row m onto its
      // per-(node, neighbor-community) candidate frame
      "modularity_by_community", "louvain_move",
      // calibration_ece crosses its broadcast 1-row bin-count total
      // onto the bins-sized reliability frame; shard_plan crosses its
      // broadcast 1-row weight total onto the shards-sized balance
      // report — both bounded by construction (the bigram_pmi shape)
      "calibration_ece", "shard_plan",
      // louvain_quality rides modularityWeighted's broadcast 1-row m
      // cross onto the communities-sized frame (the modularity shape)
      "louvain_quality",
      // kneser_ney_score crosses its broadcast 1-row bigram-type
      // total B onto the per-position score frame — bounded by
      // construction (the bigram_pmi shape)
      "kneser_ney_score")

  // Queries allowed to plan a GLOBAL (unpartitioned) window — each
  // windows over a frame bounded by construction, documented at the
  // operator. Everything else must keep windows key-partitioned (or
  // use the two-phase PrefixScan rank) — a global window funnels the
  // whole frame into one task, the canonical 100 TB scale-killer.
  private val globalWindowAllowed: Set[String] = Set(
    // hybrid_rrf fuses two top-20 ranked lists (≤ 2k rows by
    // construction: k per retriever)
    "hybrid_rrf",
    // sketch_quantiles ranks the ≤ B-row sketch buckets, not the data
    "sketch_quantiles")

  private def planOf(name: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
  }

  test("no query plans an unbounded cartesian product") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a shuffled cartesian product:\n$plan")
      if (!broadcastNljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join:\n$plan")
    }
  }

  test("single-query k-NN stays TakeOrderedAndProject over a pruned scan") {
    for (name <- Seq("knn_top5", "cosine_top5")) {
      val plan = planOf(name)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name lost the top-k plan:\n$plan")
      // no shuffle of the corpus, and the scan reads only (id, vector)
      assert(!plan.contains("Exchange"), s"$name shuffles the corpus:\n$plan")
      assert(plan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
        s"$name reads more than it needs:\n$plan")
    }
  }

  test("dimension joins broadcast the small side") {
    val plan = planOf("q2_join_agg")
    assert(plan.contains("BroadcastHashJoin"), s"q2 lost its broadcasts:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"q2 shuffles a dimension:\n$plan")
  }

  test("batch top-k join ranks via WindowGroupLimit, not a full sort") {
    val plan = planOf("knn_batch_join")
    assert(plan.contains("WindowGroupLimit"),
      s"knn_batch_join lost the group-limit pushdown:\n$plan")
  }

  test("tf-idf carries no mandatory broadcast hint (AQE decides at runtime)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val analyzed = SparkEntry.queries("tfidf_sample")(spark, sf())
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      s"tfidf re-grew a forced broadcast:\n$analyzed")
  }

  test("exact dedup aggregates with map-side partial min_by") {
    val plan = planOf("exact_dedup")
    assert(plan.contains("partial_min_by"),
      s"exact_dedup lost partial aggregation:\n$plan")
  }

  test("store in-batch dedup takes the same partial min_by shape") {
    // setData's first-wins dedup delegates to Dedup.exactFirstWins;
    // guard the plan on a record-schema frame so a regression back to
    // the row_number window (which ships every row) fails here
    val records = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("text AS target", "lang AS option1", "source AS option2")
    val plan = graft.operators.Dedup
      .exactFirstWins(records, Seq("target"), Seq("target"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min_by"),
      s"store-path dedup lost partial aggregation:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      s"store-path dedup regressed to a window:\n$plan")
  }

  test("bucketed store append anti-joins with NO Exchange on the " +
      "existing side") {
    import org.apache.spark.sql.functions.lit
    val tbl = "graft_plan_audit_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val store = new graft.store.VectorStore(spark,
        graft.functions.HashEmbedder(dim = 8),
        bucketedTable = Some(tbl), numBuckets = 4)
      val base = spark.read.parquet(s"${sf()}/documents.parquet")
        .selectExpr("text AS target", "lang AS option1")
      store.setData(base)
      val incoming = base.withColumn("option1", lit("new"))
      val plan = store.appendAntiJoin(incoming)
        .queryExecution.executedPlan.toString
      // exactly ONE hash exchange — the O(batch) incoming side; the
      // store side reads its buckets pre-partitioned
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan).length
      assert(exchanges == 1,
        s"bucketed append should exchange only the incoming side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"existing side lost its bucketed scan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("IVF batch join needs no broadcast of either side and keeps " +
      "WindowGroupLimit") {
    // the operator's contract: millions of queries × billions of corpus
    // rows meet in a hash join keyed by cell id — it must plan cleanly
    // with broadcasting disabled entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf("ivf_batch_knn")
      assert(plan.contains("WindowGroupLimit"),
        s"ivf_batch_knn lost the group-limit pushdown:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"ivf_batch_knn is not a shuffled equi-join on cell id:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
        s"ivf_batch_knn degenerates without broadcast:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("as-of join stays union+window — no join operator at all") {
    val plan = planOf("asof_join")
    // the operator's whole point: no per-key inequality join (which
    // would plan as a nested-loop/cartesian product)
    assert(!plan.contains("Join"), s"asof_join re-grew a join:\n$plan")
    assert(plan.contains("Window"), s"asof_join lost its window:\n$plan")
  }

  test("range join binned to an equi-join, not an inequality join") {
    val plan = planOf("range_join")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"range_join is not an equi-join:\n$plan")
  }

  test("projection-only queries prune the parquet scan to read columns") {
    val plan = planOf("token_counts")
    // documents has (doc_id, text, lang, source, n_chars); only two
    // must be read
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"token_counts reads more than it projects:\n$plan")
  }

  test("decontaminate semi-joins the benchmark grams via BROADCAST " +
      "(the corpus side never shuffles for the probe)") {
    val plan = planOf("decontaminate")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"),
      s"decontaminate lost the broadcast semi-join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"decontaminate shuffles the corpus for the probe:\n$plan")
  }

  test("dup_spans gram count aggregates with map-side partial agg " +
      "and the span window partitions by document") {
    val plan = planOf("dup_spans")
    assert(plan.contains("partial_count"),
      s"dup_spans gram count lost its partial aggregation:\n$plan")
    assert(plan.contains("Window"),
      s"dup_spans lost the per-document span window:\n$plan")
  }

  test("BM25 search broadcasts the idf side and keeps the top-k plan") {
    val plan = planOf("bm25_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bm25 lost the top-k plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bm25 idf side not broadcast:\n$plan")
  }

  test("domain-mix rebalance is a narrow filter — no shuffle beyond " +
      "the output sort") {
    val plan = planOf("domain_mix")
    assert(!plan.replaceFirst("Exchange rangepartitioning", "")
      .contains("Exchange"),
      s"domain_mix shuffles beyond the output sort:\n$plan")
  }

  test("budget selection never regresses to a global window") {
    val plan = planOf("budget_select")
    assert(!plan.contains("Window"),
      s"budget_select fell back to a single-partition window:\n$plan")
  }

  test("PII audit is a single narrow projection over a pruned scan") {
    val plan = planOf("pii_scrub")
    assert(!plan.replaceFirst("Exchange rangepartitioning", "")
      .contains("Exchange"),
      s"pii_scrub shuffles beyond the output sort:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"pii_scrub reads more than it needs:\n$plan")
  }

  test("bloom anti join: one exact join, bloom probe below it, settled branch join-free") {
    val plan = planOf("bloom_anti_join")
    assert(plan.contains("bloom_might_contain"),
      s"bloom_anti_join lost the membership probe:\n$plan")
    val joins = "(?i)sortmergejoin|broadcasthashjoin|shuffledhashjoin".r
      .findAllIn(plan.toLowerCase).length
    assert(joins == 1, s"bloom_anti_join expected exactly 1 join, got $joins:\n$plan")
  }

  test("winsorize clamps via a broadcast cutpoints join, not a second data shuffle") {
    val plan = planOf("winsorized_values")
    assert(plan.contains("BroadcastHashJoin"),
      s"winsorized_values lost the broadcast cuts join:\n$plan")
  }

  test("batch BM25 keeps the per-query group limit at real-data scale") {
    val plan = planOf("bm25_batch")
    assert(plan.contains("WindowGroupLimit"),
      s"bm25_batch lost the group-limit pushdown:\n$plan")
  }

  test("binary-quant single query scans CODES only into a top-k heap; " +
      "batch keeps the per-query group limit") {
    val single = planOf("binary_knn")
    assert(single.contains("TakeOrderedAndProject"),
      s"binary_knn lost the candidate top-k plan:\n$single")
    val batch = planOf("binary_batch_knn")
    assert(batch.contains("WindowGroupLimit"),
      s"binary_batch_knn lost the group-limit pushdown:\n$batch")
  }

  test("filtered kNN pushes the metadata predicate into the parquet " +
      "scan — eligibility is decided at the source") {
    val plan = planOf("filtered_knn")
    assert(plan.contains("EqualTo(lang,en)"),
      s"filtered_knn lost the lang pushdown:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"filtered_knn lost the top-k plan:\n$plan")
  }

  test("SRP near-dup candidates shuffle ids only — embeddings join " +
      "back by id exactly twice, never through the band join") {
    val plan = planOf("srp_neardup")
    // the band candidate self-join must see (vec_id, __table, __bucket)
    // and nothing vector-shaped; the embedding column re-enters later
    // via the two payload joins
    val bandJoins = plan.split("\n").filter(l =>
      l.contains("Join") && l.contains("__bucket"))
    assert(bandJoins.nonEmpty, s"band join disappeared:\n$plan")
    assert(!bandJoins.exists(_.contains("embedding")),
      s"embeddings cross the band shuffle:\n${bandJoins.mkString("\n")}")
    // exact-cosine verification happens once per distinct pair, after
    // a distinct — not inside the bucket join
    assert(plan.contains("HashAggregate"),
      s"candidate distinct disappeared:\n$plan")
  }

  test("DSIR scoring joins the llr table BROADCAST — the corpus never " +
      "shuffles to meet the model (asserted on the artifact-BUILD " +
      "plan: the registered dsir_weights serves the SharedFrames " +
      "parquet, and its build runs exactly this pipeline)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val tgt = docs.filter(col("source").isin("src1", "src2"))
    val llr = graft.operators.Dsir.logRatioTable(tgt, docs, "text",
      buckets = 4096, portableHash = true, oracleRounding = true)
    val plan = graft.operators.Dsir
      .importanceWeights(docs, "doc_id", "text", llr,
        buckets = 4096, portableHash = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"DSIR scoring lost the broadcast llr join:\n$plan")
    // the corpus-sized doc-completion left join may legitimately
    // sort-merge (both sides are corpus-sized); the per-GRAM bucket
    // join must not — that would shuffle every gram occurrence
    assert(!plan.split("\n").exists(l =>
        l.contains("SortMergeJoin") && l.contains("[bucket")),
      s"DSIR scoring sort-merges the gram/llr join:\n$plan")
    // and the registered query itself serves the materialized slim
    // artifact — a parquet scan, no per-call refit
    val served = planOf("dsir_weights")
    assert(served.contains("Scan parquet") && !served.contains("Join"),
      s"dsir_weights should serve the shared artifact scan:\n$served")
  }

  test("sliding windows aggregate with map-side partial aggregation") {
    val plan = planOf("events_sliding")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"events_sliding lost partial aggregation:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"events_sliding grew a join:\n$plan")
  }

  test("HLL sketch shuffles registers, not values: partial aggregation " +
      "below the exchange bounds every map task at m rows") {
    val plan = planOf("hll_registers")
    val exch = plan.indexOf("Exchange hashpartitioning")
    val partial = plan.lastIndexOf("HashAggregate")
    assert(exch >= 0 && partial > exch,
      s"hll_registers lost the partial-agg-before-exchange shape:\n$plan")
    assert(!plan.contains("Window"), s"hll_registers grew a window:\n$plan")
  }

  test("margin mining keeps the per-query group limit on both " +
      "neighborhood ranks") {
    val plan = planOf("margin_pairs")
    assert(plan.contains("WindowGroupLimit"),
      s"margin_pairs lost the group-limit pushdown:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"margin_pairs lost the broadcast sum joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"margin_pairs shuffles a neighborhood-sum join:\n$plan")
  }

  test("compaction planner and snapshot diff never plan a global " +
      "window; the diff joins by key hash") {
    val cp = planOf("compaction_plan")
    assert(!cp.contains("Window"),
      s"compaction_plan regressed to a window:\n$cp")
    val sd = planOf("snapshot_diff")
    assert(sd.contains("FullOuter") || sd.contains("full_outer") ||
      sd.contains("SortMergeJoin") || sd.contains("ShuffledHashJoin"),
      s"snapshot_diff lost its key join:\n$sd")
    assert(!sd.contains("CartesianProduct") &&
      !sd.contains("BroadcastNestedLoopJoin"),
      s"snapshot_diff must join by key equality:\n$sd")
  }

  test("global-window sweep: NO registered query plans an " +
      "unpartitioned window outside the bounded-frame allowlist") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Window => LogicalWindow, WindowGroupLimit}
    for (name <- SparkEntry.queries.keys.toSeq.sorted
        if !globalWindowAllowed(name)) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val qe = SparkEntry.queries(name)(spark, sf()).queryExecution
      val bad = qe.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a global unpartitioned window (single-task " +
          s"sort of the whole frame at scale) — partition it, use " +
          s"the PrefixScan two-phase rank, or justify an allowlist " +
          s"entry:\n${qe.optimizedPlan}")
    }
  }

  test("event-analytics windows are key-partitioned — never a " +
      "move-everything-to-one-task global window") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    for (q <- Seq("session_stats", "event_transitions", "event_journeys",
        "period_over_period", "rolling_zscore")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val plan = SparkEntry.queries(q)(spark, sf())
        .queryExecution.executedPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q plans an unpartitioned window:\n${plan.toString}")
    }
  }
}
