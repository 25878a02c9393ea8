package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Grouped exact top-k as a typed [[Aggregator]] with a BOUNDED buffer —
  * the scale path beside the window formulation (`row_number() ≤ k` after
  * a whole-partition sort):
  *
  *  - the window form must SHUFFLE AND SORT every row of every group
  *    before discarding all but k — at 100 TB the exchange carries the
  *    full fact table;
  *  - this aggregator keeps at most k (value, id) pairs per group per
  *    MAP task (reduce/merge are associative + commutative, so Spark
  *    plans it as a partial aggregate), and the exchange carries
  *    `k · |groups|` rows per partition no matter the input size — the
  *    same network profile the [[SeededReservoir]] sampler gets, applied
  *    to ranking.
  *
  * Total order (value desc, id asc) — ties can never make the result
  * engine-dependent. Output is the sorted top-k pair list; callers
  * posexplode it into (rank, value, id) rows. ShufflesSpec pins equality
  * with the window form on real data; SCALING.md records the measured
  * shuffle/wall comparison. */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  /** Buffer/result ordering: value DESC, then id ASC. */
  private def trim(b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.sortBy(t => (-t._1, t._2)).take(k)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    // cheap reject keeps the common case allocation-free: a full buffer
    // whose worst element beats x (ties to the smaller id) is unchanged
    if (b.size >= k && {
      val w = b.last; w._1 > x._1 || (w._1 == x._1 && w._2 < x._2)
    }) b
    else trim(b :+ x)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    if (a.isEmpty) b else if (b.isEmpty) a else trim(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    Encoders.kryo[Seq[(Long, Long)]]

  /** Relational output (array<struct>) so the k pairs posexplode into
    * (rank, value, id) rows — a kryo blob would be opaque to SQL. */
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
