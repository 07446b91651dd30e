package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a typed, partial-aggregable
  * `Aggregator`: at most `k` (item, counter) pairs, the deterministic
  * counter-based alternative to the probabilistic [[CountMinSketchAgg]].
  *
  * Guarantees (for any partitioning / merge order — the summary's
  * CONTENTS are order-dependent, but the bounds are not):
  *  - `0 <= true(x) - estimate(x) <= n / (k + 1)` where n is the total
  *    element count (Misra & Gries 1982; merge preserves the bound by
  *    the offset argument of Agarwal et al., "Mergeable Summaries",
  *    ACM TODS 2013: reduce-side decrements and the merge-side
  *    subtraction of the (k+1)-th largest counter each account for
  *    k+1 arrivals per unit of undercount);
  *  - hence every x with `true(x) > n/(k+1)` is PRESENT in the summary.
  *
  * Because the contents are merge-order-dependent, correctness gates
  * must check the GUARANTEE (presence + bounded undercount) against
  * exact counts, never hash the raw summary — same pattern as the HLL
  * bound gate.
  *
  * Scale shape: fixed k-entry state regardless of key cardinality,
  * map-side combine applies (the whole point: the exact groupBy this
  * replaces shuffles every distinct key; this ships k pairs per task).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], x: Long): Map[Long, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        // classic MG step: a new item against a full table decrements
        // every counter (the arrival is "paired off" with k survivors)
        m.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // Agarwal et al.: subtract the (k+1)-th largest counter from all,
      // drop non-positive — back to <= k entries, bound preserved
      val d = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.flatMap { case (key, c) =>
        if (c > d) Some(key -> (c - d)) else None
      }
    }
  }

  override def finish(m: Map[Long, Long]): Map[Long, Long] = m

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}
