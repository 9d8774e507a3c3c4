package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Heap-based exact top-k aggregate
  * (`Aggregator[java.lang.Double, _, Array[Double]]`).
  *
  * Why: `rank() <= k` needs a full per-group sort (O(n log n) per group,
  * spills on wide groups); this keeps a bounded k-element min-heap per
  * group in the partial aggregate, so the shuffle carries at most k
  * values per group per partition — the map-side-combine shape that
  * survives groups of any width at 100 TB. Output is the top k values
  * sorted descending (ties keep all equal values up to k, same multiset
  * as the sort-based form).
  *
  * Input is boxed so SQL NULLs reach `reduce` and are SKIPPED, matching
  * the rank/window form this replaces (a primitive Double input would
  * instead abort on the null-assertion in the deserializer).
  *
  * Register with `udaf(new TopKAggregator(k))` or via
  * [[GraftFunctions.register]] for SQL.
  */
class TopKAggregator(k: Int)
    extends Aggregator[java.lang.Double, Array[Double], Array[Double]] {

  // buffer: min-heap laid out as a sorted-ascending bounded array
  // (k is small; insertion into a k-array is effectively O(k))
  override def zero: Array[Double] = Array.empty

  override def reduce(buf: Array[Double], v: java.lang.Double): Array[Double] =
    if (v == null) buf else insert(buf, v.doubleValue())

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length < k) {
      val out = new Array[Double](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, buf.length)
      out(buf.length) = v
      java.util.Arrays.sort(out)
      out
    } else if (v > buf(0)) {
      val out = buf.clone()
      out(0) = v
      java.util.Arrays.sort(out)
      out
    } else buf
  }

  override def finish(buf: Array[Double]): Array[Double] = buf.reverse

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
