package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Presto approx_most_frequent(buckets, value, capacity) as a CUSTOM
  * TYPED AGGREGATOR — the Misra–Gries frequent-items summary (the same
  * family as Presto's Filtered Space-Saving implementation).
  *
  * Guarantees, matching the sketch contract Presto documents:
  *   - each reported count is an UNDERestimate, low by at most n/capacity
  *     (n = group size);
  *   - any value with true frequency > n/capacity is present;
  *   - when capacity ≥ distinct-values the summary never evicts, so every
  *     count is EXACT and the output is deterministic regardless of
  *     partitioning — which is what makes the oracle entry hash-checkable.
  *
  * Scale shape: the buffer is bounded at `capacity` entries, and Spark
  * applies the aggregator map-side (partial aggregation), so each input
  * partition contributes at most `capacity` map entries into the shuffle
  * — the per-key-bounded-state asymmetry that makes heavy-hitters
  * tractable at 100 TB where an exact groupBy(value) would shuffle every
  * distinct value. Merge is the standard summary merge: pointwise sum,
  * then subtract the (capacity+1)-th largest count and drop non-positives.
  */
object ApproxMostFrequent {

  final class ApproxMostFrequentAgg(buckets: Int, capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(buckets >= 1, "approx_most_frequent: buckets must be >= 1")
    require(capacity >= buckets,
      "approx_most_frequent: capacity must be >= buckets")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] = {
      if (v == null) return b // aggregate functions ignore NULLs
      b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < capacity => b.updated(v, 1L)
        case None => // Misra–Gries: decrement every counter, drop zeros
          b.iterator.map { case (k, c) => k -> (c - 1) }
            .filter(_._2 > 0).toMap
      }
    }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(k => k -> (b1.getOrElse(k, 0L) + b2.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count; ties with the cut
        // drop to zero, so at most `capacity` entries survive
        val cut = sum.valuesIterator.toIndexedSeq
          .sorted(Ordering[Long].reverse)(capacity)
        sum.iterator.map { case (k, c) => k -> (c - cut) }
          .filter(_._2 > 0).toMap
      }
    }

    /** Top `buckets` entries by (count desc, value asc) — the
      * deterministic tie-break the oracle replays with row_number(). */
    override def finish(b: Map[String, Long]): Map[String, Long] =
      b.toSeq.sortBy { case (k, c) => (-c, k) }.take(buckets).toMap

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }

  /** Column-level entry point: approx_most_frequent(buckets, value,
    * capacity) for string values. */
  def apply(buckets: Int, value: Column, capacity: Int): Column =
    udaf(new ApproxMostFrequentAgg(buckets, capacity)).apply(value)
}
