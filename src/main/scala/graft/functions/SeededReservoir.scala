package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact deterministic sample-N as a typed [[Aggregator]]: keeps the N keys
  * with the smallest seeded Knuth hash — the distributed, mergeable
  * formulation of `random.Random(seed).sample(ids, n)` from the reference
  * (sp_airflow/dags/spotify_etl_v2.py:91-97 at /root/reference).
  *
  * Each partition maintains a bounded top-N buffer (the merge is
  * associative + commutative), so the shuffle carries at most N keys per
  * partition no matter the input size — same network profile as
  * TakeOrderedAndProject, usable anywhere an aggregate can appear (e.g.
  * one sample per group in a single pass, which the orderBy+limit
  * formulation cannot express). */
class SeededReservoir(n: Int, seed: Long)
    extends Aggregator[Long, Seq[(Long, Long)], Seq[Long]] {

  private def hash(key: Long): Long = {
    val masked = ((key % 2147483648L) + 2147483648L) % 2147483648L
    ((masked + seed) * 2654435761L) % 4294967296L
  }

  /** Buffer: up to n (hash, key) pairs, kept sorted ascending. */
  override def zero: Seq[(Long, Long)] = Vector.empty

  private def trim(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sorted.take(n)

  override def reduce(buf: Seq[(Long, Long)], key: Long): Seq[(Long, Long)] =
    trim(buf :+ ((hash(key), key)))

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[Long] = buf.sorted.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    Encoders.kryo[Seq[Long]]
}
