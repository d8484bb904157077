package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]]'s long twin: per-group top-k longs kept sorted
  * descending in a k-bounded buffer, so partial aggregation ships at
  * most k values per group per partition. Used where the ranking key
  * is a COMPOSITE packed into one long (e.g. the kNN graph's
  * `cos_int·2^40 − neighbor`, whose descending order is exactly
  * "cosine desc, neighbor asc") — a bounded top-k with a tiebreak
  * and no window shuffle of the full candidate stream.
  */
class TopKLongAggregator(k: Int) extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[Long], v: Long): ArrayBuffer[Long] = {
    var i = 0
    while (i < buf.length && buf(i) >= v) i += 1
    if (i < k) {
      buf.insert(i, v)
      if (buf.length > k) buf.remove(k)
    }
    buf
  }

  override def reduce(buf: ArrayBuffer[Long], v: Long): ArrayBuffer[Long] =
    insert(buf, v)

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(buf: ArrayBuffer[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
