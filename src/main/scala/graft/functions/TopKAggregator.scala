package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]`): per-group
  * top-k doubles, kept sorted descending. The buffer is bounded at k
  * elements, so partial aggregation ships at most k values per group
  * per partition — the same partial/merge/finish contract as Spark's
  * built-in aggregates, demonstrated on the one surface the built-ins
  * don't cover directly (bounded per-group top-k without a window
  * shuffle of full rows).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, ArrayBuffer[Double], Seq[Double]] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[Double], v: Double): ArrayBuffer[Double] = {
    // insertion into a ≤k sorted-descending buffer
    var i = 0
    while (i < buf.length && buf(i) >= v) i += 1
    if (i < k) {
      buf.insert(i, v)
      if (buf.length > k) buf.remove(k)
    }
    buf
  }

  override def reduce(buf: ArrayBuffer[Double], v: Double): ArrayBuffer[Double] =
    insert(buf, v)

  override def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    b.foreach(insert(a, _))
    a
  }

  override def finish(buf: ArrayBuffer[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
