package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Test-scope streaming replay harness (moved out of
  * [[graft.streaming.EventStreams]] in round 14: its per-batch
  * `collect()` is unbounded by design — it captures WHOLE micro-batches
  * for spec assertions — which is fine in a test fixture and a
  * scale-killer anywhere near production code, so it lives with its only
  * consumer, StreamingSpec). */
object StreamingHarness {

  /** AvailableNow replay capturing each micro-batch's (batchId, rows) via
    * `foreachBatch` — for Update-mode operators whose LATEST emission per
    * key is the answer: a memory sink accumulates across batches and
    * cannot tell them apart, so reconciling "current state" from it is
    * impossible; per-batch capture makes the recency explicit.
    *
    * `checkpoint`: pass a FIXED directory to run the restart protocol — a
    * second call with the same checkpoint starts a NEW query instance
    * that resumes from the stored offsets + state store instead of
    * replaying from scratch (the crash-recovery half of the durability
    * story; StreamingSpec asserts state continuity through it). Default
    * stays a throwaway temp dir (single-run replay). */
  def runAvailableNowBatches(df: DataFrame, checkpoint: Option[String] = None)
      : Seq[(Long, Seq[org.apache.spark.sql.Row])] = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[org.apache.spark.sql.Row])]
    val ckpt = checkpoint.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ckpt_fb").toString)
    val q = df.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) => {
        buf += ((id, b.collect().toSeq)); ()
      })
      .start()
    q.awaitTermination()
    buf.toSeq
  }
}
