package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph kernels over plain edge-list DataFrames — the
  * relational formulation (joins + aggregates), never a driver-side
  * adjacency structure. The reference delegates all graph-shaped
  * analytics to its warehouse tier (SURVEY.md §3.3); these are the
  * Spark-native equivalents.
  */
object Graph {

  /** Exact connected components by min-label propagation with pointer
    * jumping, over an undirected edge list. Per round: every node takes
    * the minimum label among itself and its neighbors (ONE map-side
    * combinable aggregate over the symmetric edges), then labels are
    * pointer-jumped (`label := label(label)`) so chains collapse
    * geometrically — O(log n) rounds on a path, not O(diameter). Lineage
    * is truncated per round with localCheckpoint and the driver only
    * sees one convergence COUNT per round — the
    * [[TextOps.lshDedupClusters]] iteration discipline on a general
    * graph. The fixpoint (min node id per component) is unique, so the
    * result is deterministic regardless of partitioning or round count.
    * Returns (node, component); the result holds the final round's
    * checkpoint blocks — `.unpersist()` it when done, or drop all
    * stranded blocks at a quiescent point via [[Checkpoints.release]]
    * (what the Bench/Verify batch harnesses do after each query). */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node")).agg(min(col("label")).as("nbr"))
      val hop = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      // pointer jump: adopt my label's own label (labels are node ids, so
      // the self-join resolves; a label may itself be mid-update, which is
      // fine — any monotone decrease stays inside the component)
      val next = hop.join(
          hop.select(col("node").as("__n"), col("label").as("__l")),
          col("label") === col("__n"))
        .select(col("node"), col("__l").as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "prev"), Seq("node"))
        .where(col("label") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    if (iter > 0) sym.unpersist()
    labels.withColumnRenamed("label", "component")
  }
}
