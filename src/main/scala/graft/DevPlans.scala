package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump formatted physical plans of flagship queries into
  * PLANS.md (plan-shape commentary lives there; assertions in PlanSpec). */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local("8")
    val picks = Seq(
      "q_join_agg" -> ("Star join: nation (25 rows) is explicitly broadcast; " +
        "at this small SF the planner broadcasts the other dims too, at scale " +
        "orders/customer exceed the threshold and shuffle on their keys (AQE " +
        "re-plans at runtime). Aggregation is partial before the final exchange."),
      "q_agg_pricing" -> ("Scan-heavy aggregate: shipdate predicate reaches " +
        "PushedFilters, ReadSchema carries only the needed columns, " +
        "HashAggregate runs map-side (partial_*) over exact integer units " +
        "before one exchange; the averages finish in round-half-up integer " +
        "division above the final aggregate."),
      "q_semi_join" -> ("FK-gated scan: LeftSemi — probe rows are filtered, " +
        "never multiplied; the orders side is filtered before the join."),
      "q_seeded_sample" -> ("Deterministic sample: TakeOrderedAndProject — " +
        "per-partition heaps + driver merge of 20 rows; the input is never " +
        "range-shuffled."),
      "q_minhash_signature" -> ("MinHash: shingles form ROW-LOCALLY inside the " +
        "scan stage (native expression — no token shuffle); the only exchange " +
        "carries one partially-aggregated row per (doc, partition)."),
      "q_percentiles" -> ("Two-round distributed selection: count per " +
        "ordered-bits bucket, then a broadcast join filters to the ≤2 boundary " +
        "buckets per (group, p) — the full data is never sorted; the " +
        "interpolation itself finishes in exact 20th-unit integer arithmetic " +
        "(no engine-specific double rounding)."),
      "q_bloom_semi_join" -> ("Runtime-filtered semi-join: the codegen'd " +
        "bloom_might_contain predicate sits INSIDE the fact scan's filter, so " +
        "only ~|matches| rows reach the shuffle; the exact LeftSemi behind it " +
        "drops bloom false positives (oracle = the plain semi-join)."),
      "q_ann_exhaustive" -> ("IVF as dataflow: centroid assignment is a " +
        "greatest-of-structs argmax over codegen'd cosine expressions in the " +
        "scan stage; the top-k is TakeOrderedAndProject (per-partition heaps), " +
        "never a global sort."),
      "q_batch_assign" -> ("Scalable chunking: every Window is partitioned " +
        "(bucket-local); no SinglePartition window anywhere."),
      "q_asof_join" -> ("As-of join: one shuffle of |events|+|orders| on the " +
        "user key, carry-forward window within each key partition."),
      "q_chunk_windows" -> ("Context-window chunking: a pure map stage — " +
        "sequence/explode/slice keep every token array in its own row; no " +
        "join, no aggregate, nothing shuffles until the presentation sort."),
      "q_global_rank" -> ("Scalable global ranking: width_bucket tags a " +
        "monotone bucket, the O(buckets) base table broadcast-joins back, and " +
        "row_number runs inside __bucket partitions — the single-task global " +
        "window never appears."),
      "q_clamped_balance" -> ("Lindley fold as dataflow: the 'inherently " +
        "sequential' clamped running balance is two stacked window aggregates " +
        "(running sum, then running min of it) sharing ONE sort and ONE " +
        "user-key exchange — no mapGroups state, growing frames only."),
      "q_heavy_hitters" -> ("Bounded-memory frequent items: per-partition " +
        "Misra-Gries candidates (mapPartitions — the one imperative seam), " +
        "then the candidate list broadcasts INTO the exact re-count join; the " +
        "raw token stream is never hash-aggregated over its full key space."),
      "q_revenue_bridge" -> ("Revenue waterfall: lag(month)/lag(cents)/" +
        "lead(month) fuse into one customer-keyed Window over the (customer, " +
        "month) aggregate; both consuming aggregate branches are calendar-" +
        "bounded and merge on the month key."),
      "q_regional_revenue" -> ("TPC-H Q5 shape: region filter pushes through " +
        "nation→customer before any fact is touched; every dim rides a " +
        "BroadcastHashJoin and only lineitem⋈orders shuffles."),
      "q_min_price_supplier" -> ("Argmin as an aggregate: the per-part winner " +
        "is min(struct(price, suppkey)) — partial-mergeable, so the offer " +
        "collapse and the argmin ride map-side combines; no rank window ever " +
        "sorts the offers, and the supplier dim broadcasts onto the winner set."),
      "q_norm_outliers" -> ("Integer norm screen: the squared norm is one " +
        "codegen'd higher-order-function projection inside the scan stage " +
        "(zero shuffle); the only exchanges carry the bounded (label, cell) " +
        "collapse, and the median fence broadcasts back as a label-keyed row."),
      "q_late_suppliers" -> ("TPC-H Q21 as ONE aggregate pass: the textbook " +
        "double-correlated-EXISTS would scan the fact three times; here the " +
        "finished-order fact shuffles once on the order key, the per-order " +
        "distinct-supplier / distinct-late counts fold in that single " +
        "HashAggregate, the supplier dim broadcasts onto the bounded blame " +
        "set, and the top-10 is TakeOrderedAndProject."),
      "q_dominant_supplier" -> ("Both grains from one shuffle: the per-part " +
        "total re-aggregates the (part, supplier) pair grain, and because the " +
        "join's inferred not-null guards are stated explicitly on the source, " +
        "the two subtrees are statically identical — AQE stage reuse serves " +
        "them from ONE fact exchange (visible as a reused ShuffleQueryStage) " +
        "instead of scanning lineitem twice."),
      "q_ann_pq" -> ("Product quantization as dataflow: the 16-row " +
        "sub-centroid table derives from the embeddings scan (no driver " +
        "collect) and broadcasts into the encode nest; the exact argmin is a " +
        "partially-aggregated min over a (distance, cid) struct — the n×k " +
        "expansion never shuffles; the probe's 16-entry ADC table broadcasts " +
        "for the final lookup-join and the ranking is TakeOrderedAndProject."),
      "q_pit_join" -> ("Point-in-time feature join: the SCD2 dimension " +
        "builds in one customer-keyed window (running count + lead close " +
        "the intervals), then the lookup is an EQUI join on the customer " +
        "key with the interval containment as a join residual — " +
        "SortMergeJoin/ShuffledHashJoin, never a nested loop; events and " +
        "dimension co-locate on one key exchange each."),
      "q_kmv_distinct" -> ("Bottom-k sketch without a global sort: phase 1 " +
        "ranks inside (type, hash-range-bucket) partitions — uniform hashes " +
        "keep the 128 buckets balanced — and phase 2 ranks only the ≤128·k " +
        "survivors per type; the estimator finishes in exact integer " +
        "division. The k-smallest of a set is always inside the union of " +
        "per-bucket k-smallest, so the two-phase cut is exact, not " +
        "approximate."),
      "q_substring_dedup" -> ("Exact-substring dedup with NO pair join: " +
        "positional shingles form row-locally (native expression + " +
        "posexplode, zero shuffle), the dup-shingle set is one distinct + " +
        "map-side count, membership returns as a shingle-keyed LeftSemi, " +
        "and the interval-union accounting is a doc-keyed window — every " +
        "exchange is keyed on shingle or doc, nothing grows quadratically " +
        "in the duplicate mass."),
      "q_kmv_set_ops" -> ("Sketch algebra: both side sketches come off the " +
        "two-phase bucketed rank; every operator past that point consumes " +
        "ONLY sketch rows (≤2K), so the union/Jaccard/intersection " +
        "estimates are broadcast-sized joins over a 128-row frame — the " +
        "mergeability story (combine per-partition sketches, rescan " +
        "nothing) is visible as plan shape."),
      "q_setsim_join" -> ("Prefix-filtered set-similarity join: candidates " +
        "come from a shingle-keyed equi self-join restricted to each doc's " +
        "rarest-first PREFIX (the AllPairs bound), so the join key is a " +
        "token, never a cross product; the exact Jaccard verify is one " +
        "pair-keyed aggregate over the provably complete candidate set."),
      "q_join_size_est" -> ("Sketch-driven CBO input: ONE fact scan feeds " +
        "the per-key count aggregate and AQE stage reuse serves it to both " +
        "the exact fold and the sketch build; the counter tables are 576 " +
        "rows a side at any scale, the Fast-AGMS inner product joins those " +
        "bounded frames, and the only window ranks the 9-row median."),
      "q_maxsim" -> ("Late-interaction retrieval: the 8-row query bag rides " +
        "a BroadcastNestedLoopJoin into the token scan (per-pair dots are " +
        "codegen'd zip_with folds snapped to e4 integers in the scan " +
        "stage), the (doc, query-token) max and doc sum combine map-side, " +
        "and the top-10 is TakeOrderedAndProject — the corpus never sorts."),
      "q_group_quantiles" -> ("Self-bounding sketch audit: per-nation " +
        "histograms merge map-side; the exact-rank audit joins the probe " +
        "targets back on (nation, bucket) so every order-statistic window " +
        "frame holds ~1/B of its nation — the sketch names the only slices " +
        "the exact path must rank."),
      "q_winnow_matches" -> ("MOSS match step: k-gram hashes form row-locally, " +
        "the winnow selection is one doc-partitioned struct-min window " +
        "(frame bounded by a single document), and pairs exist only inside " +
        "a shared fingerprint's bucket — a df-capped equi self-join, the " +
        "LSH-bucket shape; the corpus is never crossed."),
      "q_t_closeness" -> ("Privacy-triad EMD: three map-side censuses feed a " +
        "bounded class-by-band grid built from broadcast frames; the " +
        "cumulative-flow window runs over that grid alone — nothing " +
        "corpus-sized is ever windowed or sorted."),
      "q_js_sources" -> ("Divergence matrix: per-source token shares join " +
        "TOKEN-KEYED with in-bucket pair expansion bounded by |sources|; " +
        "every log term snaps to e9 fixed-point in the scan stage so the " +
        "pair-grain sums are integer and aggregation-order-free, and the " +
        "exclusive mass finishes in a closed form — the unshared support " +
        "never joins."),
      "q_triplet_mine" -> ("Contrastive mining: the anchor bag rides a " +
        "BroadcastNestedLoopJoin into the candidate scan, cosines snap to " +
        "e4 inside the scan stage, and both argmaxes are conditional " +
        "struct-max aggregates — map-side partials, no window, no sort; " +
        "the readout is |anchors| rows."),
      "q_minhash_dedup" -> ("LSH banding with the AQE reuse pin: the " +
        "bucket-count and probe branches both sit on the signature's " +
        "doc-keyed partial-min exchange, and ReusedExchange dedupes it — " +
        "the scan→shingles→md5 pipeline runs ONCE per execution (an " +
        "explicit checkpoint was measured worse; SCALING.md)."),
      "q_setsim_join" -> ("Exact set-similarity with PPJoin pruning: the " +
        "length filter rides the prefix candidate join itself, the " +
        "positional suffix-bound prunes grouped candidates before the " +
        "exact-intersection joins, and set sizes carry through instead of " +
        "re-joining — sf1 wall 20.9 s → 3.3 s warm."),
      "q_hll_distinct" -> ("Portable HyperLogLog: one map-side register-max " +
        "census per (group, bucket) — 64 mergeable counters per group at " +
        "any corpus size; the harmonic sum stays an exact int64 and the " +
        "estimate takes one final double op."),
      "q_part_top_shipments" -> ("Bounded-buffer grouped top-k: the typed " +
        "aggregator truncates to k pairs per group in the MAP tasks " +
        "(partial_topkagg), so the exchange carries k·|groups| rows — " +
        "no windowspecdefinition anywhere over the fact table."),
      "q_ipf_raking" -> ("Survey raking: two map-side corpus censuses, " +
        "then five exact-integer rescale rounds that never leave the " +
        "≤125-row broadcast grid — per-round lineage cuts keep the " +
        "10-join chain from re-optimizing its whole prefix."),
      "q_markov_attribution" -> ("Removal-effect attribution: the plan IS " +
        "a LocalTableScan — the corpus work (rank/lead truncation + the " +
        "transition census) ran during construction, and the 16-iteration " +
        "absorption solve is a documented bounded driver step over the " +
        "collected ≤49-row matrix, replayed bit-equal by the oracle's " +
        "materialized CTEs."),
      "q_jaro_er" -> ("Entity resolution with the native jaro_winkler " +
        "expression: names collapse to their saturated 64-entry vocabulary " +
        "BEFORE any pair forms (the census is the first aggregate), the " +
        "noun block is an equi-join, and the codegen'd static kernel scores " +
        "inside the join stage — no UDF, no cartesian."),
      "q_shapley_attribution" -> ("Exact Shapley: the ONLY data-sized " +
        "exchange is the user-mask census; the 16-subset zeta transform, " +
        "the 4-channel marginal sums and the efficiency total all run on " +
        "broadcast frames measured in rows, not gigabytes."),
      "q_merkle_diff" -> ("Merkle reconciliation: two map-side checksum " +
        "censuses name the dirty buckets, and the row-grain full-outer diff " +
        "sits BEHIND a broadcast LeftSemi on that bucket list — at a 0.1% " +
        "drift rate the expensive join touches ~the changed rows, not the " +
        "table."),
      "q_crossval_ols" -> ("Distributed 5-fold CV in two passes: one " +
        "fold-grouped moment census, fold models solved as pooled-minus-" +
        "fold arithmetic on the 5-row frame, then one scoring scan with " +
        "the model frame broadcast — no per-fold rescan anywhere."),
      "q_sprt" -> ("Sequential test: the running LLR is the two-phase " +
        "scalable prefix sum — bucket bases + bucket-local windows; no " +
        "single-task stream fold, hardcoded integer LLR increments."),
      "q_bradley_terry" -> ("Arena ranking: the basket-bounded pair census " +
        "is checkpoint-cut ONCE and both MM iterations replay it from the " +
        "cut — the expensive self-join appears zero times in the downstream " +
        "plan; readout is TakeOrdered top-20."),
      "q_silhouette" -> ("Cluster quality with zero joins: the 8 seed " +
        "centroids bake into the scan as literal arrays, every squared " +
        "deviation snaps to e9 before summing (exact-integer distances — " +
        "the float-summation-order hazard never arises), and the 8-row " +
        "readout aggregates map-side."),
      "q_fdr_bh" -> ("Multiple testing at scale, expansion-free: ONE fact " +
        "scan emits 2+2*64 conditional sums per brand (each replicate's " +
        "(n1, s1); the shared totals give the complement arm by " +
        "subtraction), so no 64x row ever materializes — r12 rewrite, " +
        "8.3->3.9 s at sf0.1, 109->25 s at 100x; the 25-row census " +
        "unpivots via stack and the BH step-up runs on the bounded brand " +
        "frame with the rejection rule cross-multiplied to integers."),
      "q_stream_interval_join" -> ("The streaming operator run as batch: " +
        "EliminateEventTimeWatermark has dropped both watermark nodes, " +
        "leaving a user-keyed equi join with the ±30 min band riding as a " +
        "join filter — never a per-user cartesian; in streaming mode the " +
        "same tree bounds its state by the watermark."),
      "q_ann_ivf_recall" -> ("ANN quality audit in one corpus pass: the " +
        "exact top-10 is TakeOrderedAndProject over the e4-snapped cosine " +
        "scan; centroid selection is a 16-row TakeOrdered; probe ranking, " +
        "the 160-row assignment nest and the 5-level recall census all run " +
        "on broadcast bounded frames — the IVF pipeline is never re-run " +
        "per nprobe (containment property)."),
      "q_ddsketch_quantiles" -> ("Mergeable relative-error quantiles: the " +
        "(month, log-bucket) census combines map-side to ~60 longs per " +
        "partition, the merge is counter addition on the bounded bucket " +
        "table, and the only single-partition window is the sketch cumsum; " +
        "the exact audit ranks inside __bucket partitions (two-phase " +
        "scalable order statistic)."),
      "q_simhash_portable" -> ("Portable SimHash twin: the 32 bit-votes " +
        "aggregate map-side in ONE token-grain census (partial_sum spans), " +
        "the 12-bit block key drives an equi self-join — never all-pairs — " +
        "and the declared degenerate-block cap (2000) rides as a count " +
        "aggregate + shuffle-hash semi filter ON the same block key the " +
        "pair join shuffles on, so the guard costs no extra fact exchange; " +
        "hamming filters inside the join stage via codegen'd bit_count."),
    )
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of flagship queries\n\n")
    sb.append("Generated by `sbt \"runMain graft.DevPlans\"` at sf0.01. The\n")
    sb.append("shape properties called out here are pinned by PlanSpec; this\n")
    sb.append("file is the human-readable tour.\n")
    picks.foreach { case (name, note) =>
      val df = Queries.all(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"\n## $name\n\n$note\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
