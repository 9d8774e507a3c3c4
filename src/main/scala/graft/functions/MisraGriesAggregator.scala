package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a mergeable Spark `Aggregator`
  * (`Aggregator[java.lang.Long, Map[Long, Long], Map[Long, Long]]`).
  *
  * Why: exact per-key counts over an unbounded key domain carry
  * O(distinct) aggregation state — the profile that falls over when a
  * 100 TB stream has billions of keys and only the few dominant ones
  * matter (mixture weights, hot-shard detection, stopword discovery).
  * Misra-Gries keeps AT MOST k counters per partial aggregate, so the
  * shuffle carries O(k) per partition regardless of key cardinality —
  * the same bounded-state discipline as [[TopKAggregator]].
  *
  * Guarantees (standard MG, preserved by the mergeable-summaries merge
  * of Agarwal et al., "Mergeable Summaries", PODS'12):
  *   - underestimate only:  est(x) <= true(x)
  *   - bounded error:       true(x) - est(x) <= n / (k+1)  (n = stream size)
  *   - therefore every x with true(x) > n/(k+1) SURVIVES in the output.
  *
  * The surviving counter SET (and the estimates) legitimately depend on
  * partitioning/merge order, so queries must assert the guarantees
  * above — never hash the raw sketch (the w30 contract-query shape).
  *
  * reduce: classic MG — count if present, insert if room, else
  * decrement all (implemented lazily via an offset would complicate the
  * encoder; k is small so the eager map rebuild is fine).
  * merge: sum counters pointwise, then subtract the (k+1)-th largest
  * count from every counter and drop non-positives — the PODS'12 merge
  * that keeps both the size bound and the error bound additive-safe.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[java.lang.Long, Map[Long, Long], Map[Long, Long]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], v: java.lang.Long): Map[Long, Long] =
    if (v == null) m
    else {
      val item = v.longValue()
      m.get(item) match {
        case Some(c) => m.updated(item, c + 1)
        case None if m.size < k => m.updated(item, 1L)
        case None =>
          m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
      }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = (a.keySet ++ b.keySet).iterator
      .map(i => i -> (a.getOrElse(i, 0L) + b.getOrElse(i, 0L))).toMap
    if (combined.size <= k) combined
    else {
      // (k+1)-th largest combined count: everything shrinks by it
      val kth = combined.values.toArray.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (i, c) =>
        val nc = c - kth
        if (nc > 0) Some(i -> nc) else None
      }
    }
  }

  override def finish(m: Map[Long, Long]): Map[Long, Long] = m

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}
