package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: 100× scale-up study for the HEAVY TAIL — the most expensive
  * queries on the board (graph family, fuzzy match, LSH precision,
  * character n-grams, trimmed mean, sweep-line, quantile normalize),
  * measured at 1× (sf0.1) vs 100× (≈ sf10: 60 M lineitem, 1.5 M customer,
  * 10 M events, 500 k docs) with per-query total shuffle read/write bytes
  * from a task-metrics listener.
  *
  * Uses [[DevSfGen]]'s FULL-DIMENSION replication (not [[DevScaling]]'s
  * fixed-dim organic-growth shape) deliberately: with every entity
  * re-keyed per replica, the co-purchase graph becomes 100 DISJOINT
  * copies of the 1× graph — edge support is NOT inflated, so the graph
  * queries measure the operator's scaling on a 100×-edge graph of the
  * same local structure (the reason they were excluded from the
  * fixed-dim study no longer applies). Likewise fuzzy-match sees 100×
  * DISTINCT names (regenerated from the new keys), not 100 copies of
  * each name, so its deletion blocks grow linearly.
  *
  * Methodology: 1× timings are min-of-2 after a warmup run; 100× timings
  * are a single shot (the JVM is warm from the preceding queries, and at
  * minutes-scale walls the scheduling jitter a second rep would average
  * away is < 5 %). A linear query should land near ratio ≈ 100 on
  * compute-bound shapes and well under on job-floor/bounded-output
  * shapes; anything ≫ 100 is a quadratic smell.
  *
  * `runMain graft.DevHeavyTail [queries-csv]`
  */
object DevHeavyTail {

  /** Accumulates total shuffle read/write bytes across task ends. The
    * listener bus is async; [[drain]] sleeps briefly after a query so the
    * final task-end events land before the counters are read. Dev-only —
    * the shipped engine registers no listeners. */
  final class ShuffleMeter extends SparkListener {
    val read = new AtomicLong(0L)
    val write = new AtomicLong(0L)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0L); write.set(0L) }
    def drain(): (Long, Long) = { Thread.sleep(500); (read.get, write.get) }
  }

  val heavyTail: Seq[String] = Seq(
    "q_agg_pricing",      // linear anchor: one map-side-combined aggregate
    "q_graph_components", // min-label propagation + pointer jumping
    "q_bfs_levels",       // capped relaxation rounds
    "q_triangle_count",   // degree-oriented wedge join
    "q_fuzzy_match",      // deletion-neighborhood blocking (now capped)
    "q_trimmed_mean",     // distinct-value weight-table window
    "q_lsh_precision",    // banded minhash candidate pairs vs exact
    "q_lsh_recall",       // df-capped true pairs vs banded candidates
    "q_char_ngrams",      // per-char trigram explosion
    "q_max_concurrency",  // sweep-line two-phase prefix sum
    "q_minhash_est",      // signature build + per-pair estimate
    "q_quantile_normalize", // two-phase global rank, row-linear output
    "q_sem_dedup",        // adaptive-k cluster blocking + triangular blocked self-join
    // round-9 wave: the new queries whose cost grows with the fact/graph
    "q_clustering_coeff", // per-node triangles over the degree-oriented kernel
    "q_order_priority",   // quarter-filtered LeftSemi over the full fact
    "q_late_suppliers",   // per-order distinct-supplier aggregate
    "q_part_supplier_counts", // distinct-pair collapse + attribute-grid count-distinct
    "q_ann_pq",           // n×16 broadcast encode nest over the full embedding corpus
    "q_quantized_rerank", // int8 full-scan prefilter + 50-row exact rerank
    "q_bigram_ppx",       // bigram stream + two count-table joins
    "q_kcore",            // 2-core fixpoint, checkpoint-truncated rounds
    // round-10 completion: the bench top-15 entries that had no 100× row
    "q_pagerank_step",    // one relational superstep over the co-purchase graph
    "q_label_prop",       // one label-propagation round
    "q_part_affinity",    // co-purchase pair collapse + nation grid
    "q_weighted_median",  // distinct-value weight-table window
    "q_rfm_cells",        // two-phase bucket rank at 3 grains
    // round-10 curation op: shingle-df + doc-keyed union windows
    "q_substring_dedup",
    // round-12 completion: the five multi-second round-11 queries that
    // carried 10x evidence only, plus the two VERDICT-suggested extras
    "q_pagerank_iter",    // 8 checkpoint-cut relational supersteps
    "q_fdr_bh",           // 64x null-contrast expansion, map-side to |brands|*65
    "q_bradley_terry",    // basket-bounded pair census + 2 MM iterations
    "q_merkle_diff",      // drift-proportional partition-tree diff
    "q_frequent_triples", // A-Priori triple mining over bounded baskets
    "q_mann_whitney",     // distinct-value rank census
    "q_ipf_raking",       // 3 IPF rounds on the bounded margin grid
    // round-13 completion: the four round-12 queries that carried 10x
    // evidence only (the first three are bench top-tail at 1.0-1.8 s)
    "q_ddsketch_quantiles",  // log-bucket census + two-phase exact audit rank
    "q_stream_interval_join", // user-keyed equi join, ±30 min band residual
    "q_simhash_portable",    // token census + capped 4096-block self-join
    "q_ann_ivf_recall")      // one TakeOrdered corpus pass + bounded recall census

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf10"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    DevSfGen.build(spark, src, dst, reps = 100)

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      Queries.all(name)(spark, dir).write.mode("overwrite").format("noop").save()
      graft.operators.Checkpoints.release(spark)
      (System.nanoTime() - t0) / 1e9
    }

    val selected = if (args.nonEmpty) args(0).split(",").toSeq else heavyTail
    println(f"[heavytail] ${"query"}%-22s ${"t_1x"}%8s ${"t_100x"}%9s ${"ratio"}%6s ${"shufW_100x"}%11s ${"shufR_100x"}%11s")
    selected.foreach { q =>
      run(q, src) // warmup
      val t1 = (1 to 2).map(_ => run(q, src)).min
      meter.reset()
      val tN = run(q, dst)
      val (r, w) = meter.drain()
      println(f"[heavytail] $q%-22s $t1%8.2f $tN%9.2f ${tN / t1}%6.1f ${w / 1e6}%9.1f MB ${r / 1e6}%9.1f MB")
    }
    spark.stop()
  }
}
