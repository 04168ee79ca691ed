package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Presto numeric_histogram(buckets, value[, weight]) as a custom typed
  * Aggregator — the Ben-Haim & Tom-Tov streaming histogram (JMLR 11,
  * 2010, "A Streaming Parallel Decision Tree Algorithm"), the published
  * algorithm Presto's implementation follows.
  *
  * State is a sorted vector of at most `buckets` (centroid, weight)
  * bins; inserting past capacity merges the closest adjacent pair into
  * its weighted mean (leftmost-smallest-gap tie-break, so the summary is
  * deterministic for a given input order). Merge unions the bin lists
  * and re-compacts — bounded state map-side, exactly the
  * heavy-hitter-shaped asymmetry that scales: each input partition
  * contributes at most `buckets` bins into the shuffle regardless of
  * group size.
  *
  * When the group's distinct-value count never exceeds `buckets`, no
  * bin ever merges, so the result is the EXACT value→weight map,
  * deterministic under any partitioning — the regime the oracle entry
  * pins (the same exact-regime trick as [[ApproxMostFrequent]]).
  */
object NumericHistogram {

  final class NumericHistogramAgg(buckets: Int)
      extends Aggregator[(Double, Double), Vector[(Double, Double)], Map[Double, Double]] {
    require(buckets >= 2, "numeric_histogram: buckets must be >= 2")

    override def zero: Vector[(Double, Double)] = Vector.empty

    /** Insert (value, weight) keeping the vector sorted by centroid;
      * same-centroid bins coalesce, then compact to `buckets`. */
    private def insert(b: Vector[(Double, Double)], v: Double, w: Double): Vector[(Double, Double)] = {
      val i = b.indexWhere(_._1 >= v)
      val merged =
        if (i >= 0 && b(i)._1 == v) b.updated(i, (v, b(i)._2 + w))
        else if (i < 0) b :+ ((v, w))
        else (b.take(i) :+ ((v, w))) ++ b.drop(i)
      compact(merged)
    }

    /** While over capacity, merge the adjacent pair with the smallest
      * centroid gap (leftmost on ties) into its weighted mean. */
    private def compact(b0: Vector[(Double, Double)]): Vector[(Double, Double)] = {
      var b = b0
      while (b.length > buckets) {
        var best = 0
        var bestGap = Double.MaxValue
        var i = 0
        while (i < b.length - 1) {
          val gap = b(i + 1)._1 - b(i)._1
          if (gap < bestGap) { bestGap = gap; best = i }
          i += 1
        }
        val (p1, c1) = b(best)
        val (p2, c2) = b(best + 1)
        val m = ((p1 * c1 + p2 * c2) / (c1 + c2), c1 + c2)
        b = (b.take(best) :+ m) ++ b.drop(best + 2)
      }
      b
    }

    override def reduce(b: Vector[(Double, Double)], in: (Double, Double)): Vector[(Double, Double)] = {
      val (v, w) = in
      // NaN is the null-lowering sentinel (skipped); a real non-positive
      // weight is a caller bug and must error, not silently skew the
      // histogram (Presto raises)
      if (v.isNaN || w.isNaN) b
      else if (w <= 0)
        throw new IllegalArgumentException(
          s"numeric_histogram: weight must be positive, got $w")
      else insert(b, v, w)
    }

    override def merge(b1: Vector[(Double, Double)], b2: Vector[(Double, Double)]): Vector[(Double, Double)] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      // merge-sort the bin lists, coalescing equal centroids, then compact
      val all = (b1 ++ b2).groupBy(_._1).iterator
        .map { case (p, bs) => (p, bs.map(_._2).sum) }.toVector.sortBy(_._1)
      compact(all)
    }

    override def finish(b: Vector[(Double, Double)]): Map[Double, Double] = b.toMap

    override def bufferEncoder: Encoder[Vector[(Double, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[(Double, Double)]]()
    override def outputEncoder: Encoder[Map[Double, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Double, Double]]()
  }

  /** numeric_histogram(buckets, value [, weight]) — weight defaults 1.
    * NULL values/weights lower to NaN (the tuple encoder has no null
    * slot for primitives) and the reducer skips NaN — Presto's
    * ignore-NULL aggregate semantics. */
  def apply(buckets: Int, value: Column, weight: Column): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    udaf(new NumericHistogramAgg(buckets)).apply(
      coalesce(value.cast("double"), lit(Double.NaN)),
      coalesce(weight.cast("double"), lit(Double.NaN)))
  }
}
