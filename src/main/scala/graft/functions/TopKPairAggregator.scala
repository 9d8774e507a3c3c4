package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Heap-based exact top-k over (score, id) PAIRS — the grouped form the
  * batch k-NN join needs ([[graft.extensions.Similarity.knnJoin]]),
  * where the payload id must ride along with the score.
  *
  * Why not `rank() <= k`: the window form shuffles and sorts every
  * (query, corpus) pair — |Q|·|C| rows — before discarding all but k per
  * query. This Aggregator keeps a bounded k-pair buffer in the PARTIAL
  * aggregate, so the shuffle after the map-side combine carries at most
  * k pairs per (group, partition): the corpus never shuffles.
  *
  * Ordering is total and deterministic: higher score first, ties broken
  * by smaller id — exactly the `ORDER BY score DESC, id` the DuckDB
  * oracle replays. Output is the best-first array of (score, id)
  * structs. NULL score or id inputs are skipped (boxed input fields for
  * the same reason as [[TopKAggregator]]).
  */
class TopKPairAggregator(k: Int)
    extends Aggregator[TopKPairAggregator.In,
      (Array[Double], Array[Long]), Array[TopKPairAggregator.Out]] {
  import TopKPairAggregator.{In, Out}

  override def zero: (Array[Double], Array[Long]) =
    (Array.empty, Array.empty)

  override def reduce(
      buf: (Array[Double], Array[Long]), v: In): (Array[Double], Array[Long]) =
    if (v == null || v.score == null || v.id == null) buf
    else insert(buf, v.score.doubleValue(), v.id.longValue())

  override def merge(
      a: (Array[Double], Array[Long]),
      b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
    var acc = a
    var i = 0
    while (i < b._1.length) { acc = insert(acc, b._1(i), b._2(i)); i += 1 }
    acc
  }

  // a pair ranks ahead of another on higher score, then smaller id
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  // buffer is kept worst-first at index 0 (k is small; re-sorting the
  // k-array on insert is effectively O(k))
  private def insert(
      buf: (Array[Double], Array[Long]), s: Double,
      id: Long): (Array[Double], Array[Long]) = {
    val (ss, ids) = buf
    if (ss.length < k) sortWorstFirst(ss :+ s, ids :+ id)
    else if (beats(s, id, ss(0), ids(0))) {
      val ns = ss.clone(); val ni = ids.clone()
      ns(0) = s; ni(0) = id
      sortWorstFirst(ns, ni)
    } else buf
  }

  private def sortWorstFirst(
      ss: Array[Double], ids: Array[Long]): (Array[Double], Array[Long]) = {
    val order = ss.zip(ids)
      .sortWith((a, b) => beats(b._1, b._2, a._1, a._2))
    (order.map(_._1), order.map(_._2))
  }

  override def finish(buf: (Array[Double], Array[Long])): Array[Out] =
    buf._1.zip(buf._2)
      .sortWith((a, b) => beats(a._1, a._2, b._1, b._2))
      .map { case (s, i) => Out(s, i) }

  override def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Double], Array[Long])]()

  override def outputEncoder: Encoder[Array[Out]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Out]]()
}

object TopKPairAggregator {
  /** Boxed so SQL NULLs reach `reduce` and are skipped. */
  case class In(score: java.lang.Double, id: java.lang.Long)
  case class Out(score: Double, id: Long)
}
