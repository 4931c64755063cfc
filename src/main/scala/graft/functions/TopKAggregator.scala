package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (the `Aggregator[IN, BUF, OUT]` extension point): exact
  * top-k (value desc, id asc) per group with a bounded buffer — the
  * map-side-combinable alternative to a rank-window + filter, which must
  * shuffle every row. Buffers merge associatively, so Spark runs it with
  * partial aggregation: only k rows per group per partition reach the
  * exchange. At 100 TB that's the difference between shuffling the corpus
  * and shuffling k×partitions rows.
  */
class TopKAggregator(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty
  override def reduce(buf: Seq[(Long, Double)], row: (Long, Double)): Seq[(Long, Double)] =
    trim(buf :+ row)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(buf)
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}

/** Exact min-k by (key asc, id asc) with the same bounded, map-side-
  * combinable shape as [[TopKAggregator]]. The sampling primitive: with
  * `key = hash(id)` this is a deterministic uniform sample of k per group
  * whose shuffle carries k rows per group per partition — the 100 TB
  * sampling shape (a rank-window formulation shuffles every row first).
  * Longs compare exactly, so results are bit-identical to the oracle's
  * ORDER BY hash LIMIT k whatever the partitioning.
  */
class MinKAggregator(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] = s.sortWith(lt).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty
  override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] =
    trim(buf :+ row)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(buf)
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] = bufferEncoder
}
