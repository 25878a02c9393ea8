package graft

import org.apache.spark.sql.functions._

/** Dev tool: empirical scale-up study. Replicates the fact tables of an
  * existing fixture N× (key-offset so join integrity holds: same customer
  * universe, N× the orders/lineitems/events per key — organic growth
  * shape) into /tmp, then times representative queries at 1× and N× and
  * prints the scaling ratio. A shuffle-honest plan should scale ≈ N on
  * compute-bound queries and < N on job-floor-bound ones; anything ≫ N is
  * a quadratic smell. `runMain graft.DevScaling [srcDir] [reps]`. */
object DevScaling {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dst = DevReplicas.ensure(spark, src, reps)

    // linear- or bounded-output queries only: PAIR-generating document/
    // embedding queries (jaccard, minhash pair form, near-dup) are
    // excluded because their OUTPUT grows superlinearly by semantics
    val picks = Seq("q_scan_project", "q_agg_pricing", "q_join_agg",
      "q_semi_join", "q_bloom_semi_join", "q_window_topk", "q_percentiles",
      "q_asof_join", "q_sessionize", "q_cdc_apply", "q_monthly_revenue",
      "q_quality_filter", "q_tfidf", "q_minhash_dedup_map",
      "q_kmeans_step", "q_vector_quantize", "q_ngram_counts",
      // round-5 late additions: linear (chunking, rarity, global rank) and
      // bounded-output (split table, KS stat, next-token table, winsorize,
      // padding waste) shapes
      "q_chunk_windows", "q_global_rank", "q_rarity_score", "q_train_split",
      "q_ks_drift", "q_next_token", "q_winsorize", "q_padding_waste",
      // final round-5 wave: composed scalable-numbering ops and the
      // bounded audit/analytics shapes
      "q_pareto", "q_window_dedup", "q_tvd_drift", "q_rfm_cells",
      "q_ship_priority", "q_market_share", "q_stickiness", "q_user_growth",
      // round-5 closing wave: TPC-H classic shapes (bounded/row-bound),
      // diversity aggregates (bounded), dual-carry as-of (linear), XOR
      // checksum (bounded). q_triangle_count is EXCLUDED by design: under
      // identical-payload replication every support-1 pair saturates the
      // support-2 threshold, so the edge set itself grows 30×+ — the ratio
      // would measure a different graph, not the operator's scaling
      "q_small_qty_revenue", "q_top_supplier", "q_large_orders",
      "q_simpson_diversity", "q_ttr_profile", "q_asof_nearest",
      "q_table_checksum", "q_power_iteration", "q_zipf_profile",
      // q_fuzzy_match is EXCLUDED: it reads only the customer dim, which
      // this study copies (not replicates) — both sides would be identical
      "q_reagg_audit", "q_changepoint", "q_seasonal_anomaly",
      "q_auc_per_class", "q_calibration_bins",
      // round-5 window/time-series wave: linear one-sort window folds and
      // the calendar-bounded rolling moments. q_pagerank_step is EXCLUDED
      // for the q_triangle_count reason: identical-payload replication
      // inflates co-purchase edge support, changing the graph itself
      "q_clamped_balance", "q_ewma_decay", "q_rolling_corr",
      // retrieval/sketch wave: both bounded-output (≤5·|vocab| postings,
      // exact heavy-hitter set). q_label_prop EXCLUDED for the graph-
      // support-inflation reason above
      "q_inverted_index", "q_heavy_hitters",
      // audit/diagnostics wave: all bounded-output (6 relations, top-20
      // keys, |sources| rows). q_graph_components EXCLUDED: co-purchase
      // edge support inflates under identical-payload replication (the
      // q_triangle_count reason)
      "q_fk_audit", "q_skew_profile", "q_dataset_card",
      // experiment/dedup wave: O(1) readout and linear fp-window. The
      // pair-generating q_containment and graph q_bfs_levels are excluded
      // (superlinear pair output under identical-payload replication;
      // edge-support inflation)
      "q_abtest_chi2", "q_prefix_dup",
      // trend/imputation wave: calendar-bounded pair join, fp-keyed
      // incremental dedup (linear), LOCF window (linear)
      "q_mann_kendall", "q_incremental_dedup", "q_locf_impute",
      // TPC-H classics wave: bounded outputs (5 nations, top-20, 1 row)
      "q_regional_revenue", "q_returned_customers", "q_promo_share",
      // sequence/layout wave: O(1) funnel readout, linear two-window
      // discovery curve, linear zone-map build
      "q_funnel_bounded", "q_discovery_curve", "q_zone_map",
      // balance/yield wave: bounded outputs (classes, sources)
      "q_balanced_sample", "q_dedup_report",
      // robust time-series wave: all calendar-bounded after the monthly
      // map-side aggregate
      "q_theil_sen", "q_autocorr", "q_runs_test",
      // waterfall/session wave: calendar- and bucket-bounded outputs
      "q_revenue_bridge", "q_ab_quantiles", "q_session_lengths",
      // robust-baseline wave: calendar-bounded frames and 9-row output
      "q_rolling_median", "q_benford", "q_cohort_ltv",
      // order-statistics wave: value-cardinality-bounded windows
      "q_weighted_median", "q_trimmed_mean", "q_mode_stat", "q_iqr_outliers",
      // calendar-bounded interpolation (spine size is date-span-bound)
      "q_gap_interp",
      // round-7 wave: bounded re-aggregates (order-count distribution,
      // per-part argmin, trigram/gap cells all collapse map-side to the
      // same key space at any replication) and the linear norm screen
      "q_order_count_dist", "q_min_price_supplier", "q_char_ngrams",
      "q_interarrival", "q_norm_outliers",
      // round-7 second wave: bounded readouts (nation grid, source-pair
      // matrix, calendar² grid, 4-row manifest, calendar-bounded bursts).
      // q_cross_source_dup survives identical-payload replication because
      // the distinct (fp, source) table is replication-invariant
      "q_idle_customers", "q_cross_source_dup", "q_seasonality_index",
      "q_snapshot_diff", "q_burst_days",
      // round-7 closing pair: sweep-line over replication-invariant session
      // boundaries (10× events collapse into the SAME sessions); linear
      // fp-keyed survivorship aggregate
      "q_max_concurrency", "q_dedup_survivorship",
      // growth accounting collapses to the replication-invariant distinct
      // (user, day) table; quantile-normalize is the linear two-phase rank
      "q_growth_accounting", "q_quantile_normalize",
      // round-9 wave: linear fact scans with bounded outputs (priority
      // census, top-10 wait counts, breach rows, 64-bucket audit), linear
      // per-doc/row-local maps (entropy, BPE pairs, frame schedule) and
      // broadcast-probe rankings (NDCG, MIPS). q_clustering_coeff is
      // EXCLUDED for the q_triangle_count reason: identical-payload
      // replication inflates co-purchase edge support, changing the graph
      "q_order_priority", "q_late_suppliers", "q_bollinger", "q_ndcg",
      "q_feature_hash", "q_doc_entropy", "q_mips", "q_bpe_merges",
      "q_frame_sample",
      // round-9 TPC-H/curation wave: bounded grids (nation×year, top-20,
      // |sources| rows), linear fact scans, row-local membership tests
      "q_nation_profit", "q_part_supplier_counts", "q_dominant_supplier",
      "q_blocklist_filter",
      // round-9 wave 5: linear user-keyed windows (attribution, lateness
      // profile) and the relational PQ pipeline (broadcast nests, linear
      // encode). q_kcore EXCLUDED for the graph edge-support reason
      "q_attribution", "q_late_arrivals", "q_ann_pq",
      // round-9 wave 6: linear scans (int8 prefilter + 50-row rerank) and
      // the token-keyed LM scoring joins
      "q_quantized_rerank", "q_bigram_ppx",
      // round-9 wave 7: co-keyed PIT interval join (bounded census) and
      // the bounded pool nest + anti-join sampler (|users|·5 output)
      "q_pit_join", "q_negative_sample",
      // round-9 wave 8: bounded-output sketch audits (KMV bottom-k,
      // CMS counter table) — linear scans, constant-size sketches
      "q_kmv_distinct", "q_cms_estimate",
      // round-10 governance wave: linear token-join rollup (|customer|
      // output over fixed dims), bounded class census, ≤256-cell Morton
      // grid, byte-linear bin plan over the calendar-bounded file listing
      "q_pii_redact", "q_k_anonymity", "q_zorder_layout", "q_compaction_plan",
      // round-10 curation/streaming-parity wave: substring dedup is
      // shingle-df linear (identical-payload replication inflates every
      // df 10× — the maximal-flagging worst case, still one doc-keyed
      // window per doc); closed sessions are linear user-keyed windows
      "q_substring_dedup", "q_closed_sessions",
      // cluster-inherited split: identical-payload replication collapses the
      // 10× corpus into star-topology clusters (fixpoint in FEWER rounds)
      "q_leakage_split",
      // sketch algebra: bounded 1-row output, linear distinct-hash scan
      "q_kmv_set_ops",
      // mergeable histogram + two-phase exact ranks: linear scan, 3-row output
      "q_hist_quantiles",
      // mergeable log-bucket sketch: identical-payload replication leaves
      // the bucket table identical (counts 10x) - purely linear
      "q_ddsketch_quantiles",
      // calendar-bounded daily grid after one map-side aggregate
      // (q_setsim_join is EXCLUDED like every pair-OUTPUT query: under
      // identical-payload replication the >=0.7 pair set itself grows
      // quadratically in the clone mass — the sf1 oracle run measures it)
      "q_trending",
      // one Expand aggregate pass, |columns| output rows
      "q_ndv_stats",
      // Fast-AGMS estimators: linear per-key count scans feeding 576-row
      // counter tables, 1-row outputs; MRR is the q_ndcg broadcast-probe
      // ranking shape; rank fusion combines two TakeOrdered 20-row lists
      "q_join_size_est", "q_ams_f2", "q_mrr", "q_rank_fusion",
      // curation scoring: token-grain map-side counts + broadcast ratio /
      // total tables, row-local statistics; grouped quantiles = per-nation
      // 32-bucket histograms with the audit rank bounded to target buckets
      "q_dsir_weights", "q_chi2_tokens", "q_group_quantiles",
      // governance/mixture/retrieval wave: bounded-output aggregate chains
      // (|sources| / |types| / |classes| rows); maxsim is the broadcast
      // query-bag scan with map-side max/sum and a TakeOrdered readout
      "q_temperature_mix", "q_dp_counts", "q_maxsim", "q_l_diversity",
      // privacy-triad/curation-pairing wave: t-closeness runs its window
      // over the bounded class×band grid only; winnowing is doc-keyed
      // sliding frames (bounded by one doc); triplet mining and preference
      // pairs are broadcast-scan + map-side struct argmaxes, no windows
      "q_t_closeness", "q_winnow_fingerprint", "q_triplet_mine",
      "q_preference_pairs",
      // embedding-eval/JL wave: 64-group census, inlined-centroid purity,
      // broadcast sign-table projection over a bounded pair set
      // (q_winnow_matches is EXCLUDED like every pair-OUTPUT query — the
      // replicated fixture inflates the shared-fingerprint pair mass
      // quadratically; the sf1 oracle run measures it: 239,900 pairs,
      // both engines agree)
      "q_embed_dim_stats", "q_cluster_purity", "q_random_projection",
      // distributional-divergence wave: token-grain map-side counts,
      // token-keyed (never broadcast-vocab) joins, e9-snapped row-local
      // log terms summed as integers; JS pair expansion bounded by
      // |sources| per token bucket
      "q_kl_divergence", "q_mutual_info", "q_js_sources",
      // survival/stump/PSI wave: customer-keyed gap windows + calendar-
      // bounded curve frames; 64-bucket and 10-bin censuses over 1-row
      // stats broadcasts
      "q_survival_curve", "q_gini_split", "q_psi_drift",
      // resampling/decomposition wave: the Poisson-bootstrap expansion is
      // row-local and combines to 64 rows per partition before the
      // exchange; the decomposition windows run over the calendar-bounded
      // day series
      "q_bootstrap_ci", "q_seasonal_decompose")

    def time(name: String, dir: String): Double = {
      val fn = Queries.all(name)
      fn(spark, dir).write.mode("overwrite").format("noop").save() // warmup
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // optional 3rd arg: comma-separated query-name filter for focused
    // reruns — any registered query, not just the curated picks (so bench
    // regressions can be adjudicated in a quiet JVM with this tool)
    val onlyArg = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val selected = onlyArg
      .map(o => o.toSeq.sorted.filter(Queries.all.contains))
      .getOrElse(picks)

    println(f"[scaling] ${"query"}%-20s ${"t_1x"}%8s ${"t_" + reps + "x"}%8s ratio")
    selected.foreach { q =>
      val t1 = time(q, src)
      val tN = time(q, dst)
      println(f"[scaling] $q%-20s $t1%8.2f $tN%8.2f ${tN / t1}%5.1f")
    }
    spark.stop()
  }
}
