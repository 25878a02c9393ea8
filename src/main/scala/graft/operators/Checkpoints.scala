package graft.operators

import org.apache.spark.sql.SparkSession

/** Release path for the checkpoint blocks the iterative operators leave
  * behind ([[Graph.connectedComponents]], [[Graph.bfsLevels]],
  * [[TextOps.lshDedupClusters]] and friends): each returns a frame backed
  * by its final `localCheckpoint`, whose blocks stay pinned in the block
  * manager until explicitly unpersisted. In a long-lived session running
  * hundreds of queries (the bench batch, a notebook), each call strands
  * another generation of blocks; on a real cluster that is executor
  * storage memory stolen from shuffles for the rest of the session.
  *
  * [[release]] drops EVERY persisted RDD, so call it only at a quiescent
  * point — after a query's sink has fully materialized, or between batch
  * passes. Unpersisting a localCheckpoint while a concurrent query still
  * reads it is not a slow recompute but a job failure: a localCheckpoint
  * truncates lineage, so the lost blocks cannot be rebuilt. */
object Checkpoints {
  /** Drop all persisted RDD blocks (non-blocking). Safe only when no
    * in-flight job can still read a checkpointed frame. */
  def release(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
}
