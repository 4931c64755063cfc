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
