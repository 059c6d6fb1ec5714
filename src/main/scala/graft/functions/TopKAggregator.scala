package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"): exact top-k by
  * score as an `Aggregator[IN, BUF, OUT]`. Distributed shape: each
  * partition keeps at most k (score, id) pairs in its buffer, merge is
  * k-way — so the shuffle carries O(k · partitions) instead of the input.
  * Equivalent result to the `row_number() <= k` window, but one hash
  * aggregate (map-side partial) instead of a partition-wide sort: the
  * right plan when k << group size.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    // order: score desc, id asc — deterministic ties
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)],
                      in: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ in)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
