package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** The ingestion-client shape of the reference's API lookups, as engine
  * plumbing: a per-partition batched lookup with retry/backoff and pacing
  * (search_artist_id_and_name.py:24-62, spotify_etl_v2.py:36-66,108-117 at
  * /root/reference) — everything EXCEPT the actual HTTP call, which is a
  * pluggable function (this environment has no egress; production plugs a
  * real client in).
  *
  * Semantics mirror the reference: inputs are chunked (50/request there),
  * a failed chunk retries with exponential backoff then is SKIPPED (the
  * reference logs-and-continues, spotify_etl_v2.py:111-117), and each
  * input can expand to 0..N results (search returns up to 20 candidates —
  * inner-join "skip empty" semantics). Runs inside `mapPartitions`, so one
  * client/session per partition, chunked requests, and pacing between
  * chunks — never per row, never on the driver. */
object RestLookup {

  /** @param lookup     resolves one chunk of keys to (key, result) pairs;
    *                    throws to signal a retryable failure
    * @param chunkSize  keys per request (reference: 50)
    * @param maxRetries attempts per chunk before skipping it (reference: 5)
    * @param backoffMs  base backoff, doubled per attempt (reference: 1 s);
    *                   also the inter-chunk pacing floor (reference: 0.5 s
    *                   sleeps — pass 0 in tests)
    */
  def lookupJoin[K, V](keys: Dataset[K], lookup: Seq[K] => Seq[(K, V)],
                       chunkSize: Int = 50, maxRetries: Int = 5,
                       backoffMs: Long = 0L)
                      (implicit ev: Encoder[(K, V)]): Dataset[(K, V)] =
    keys.mapPartitions { it =>
      // per-partition prologue: a real impl builds its HTTP client here
      it.grouped(chunkSize).flatMap { chunk =>
        var attempt = 0
        var result: Seq[(K, V)] = null
        while (result == null && attempt < maxRetries) {
          try {
            result = lookup(chunk)
          } catch {
            case _: Exception =>
              attempt += 1
              if (backoffMs > 0 && attempt < maxRetries)
                Thread.sleep(backoffMs << (attempt - 1))
          }
        }
        if (backoffMs > 0) Thread.sleep(backoffMs) // pacing between chunks
        Option(result).getOrElse(Seq.empty) // exhausted retries → skip chunk
      }
    }

  /** DataFrame face of [[lookupJoin]] for a string key column. */
  def resolveColumn(df: DataFrame, keyCol: String,
                    lookup: Seq[String] => Seq[(String, String)],
                    resultCol: String, chunkSize: Int = 50): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val resolved = lookupJoin[String, String](
      df.select(keyCol).distinct().as[String], lookup, chunkSize)
      .toDF(keyCol, resultCol)
    df.join(resolved, Seq(keyCol)) // inner: unresolved keys drop (reference 41-42)
  }
}
