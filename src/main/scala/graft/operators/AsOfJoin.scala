package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from existing
  * operators (preference (a) of the custom-operator ladder — no custom
  * physical node needed).
  *
  * As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime in the same key group. Implemented as the
  * union-of-sides + running last_value window — ONE shuffle on
  * (key), no range-condition nested loop, no per-key explosion: the
  * standard scale-out formulation (a range-condition join would plan as
  * BroadcastNestedLoop and die at 100 TB).
  *
  * Binned range join: point-in-interval matching via interval
  * discretization — intervals explode into fixed-width bins, points join
  * their bin (equi-join!), then the exact containment filter runs on the
  * tiny per-bin candidate set.
  */
object AsOfJoin {

  /** For every `left` row, attach `valueCol` from the latest `right` row
    * at or before the left row's time within the same key. Rows with no
    * prior right row are dropped (inner as-of). Both inputs must carry
    * `key` and `time` columns with these names. */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, time: String,
               valueCol: String, as: String): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn(as, lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(key), col(time), col(valueCol).as(as))
      .withColumn("_side", lit(0))
    val lAligned = l.select((col(key) +: col(time) +: col(as) +: col("_side") +:
      left.columns.filter(c => c != key && c != time).map(col).toSeq): _*)
    val rAligned = r.select((col(key) +: col(time) +: col(as) +: col("_side") +:
      left.columns.filter(c => c != key && c != time).map(c => lit(null).cast(left.schema(c).dataType).as(c)).toSeq): _*)
    // right rows sort before left rows at equal time → inclusive <=
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn(as, last(col(as), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col(as).isNotNull)
      .drop("_side")
  }

  /** Equi-join points to intervals through fixed-width bins. `intervals`
    * carries (lo, hi]-style bounds; a point p matches iff lo <= p < hi.
    * Bin width should be chosen near the median interval length so each
    * interval spans O(1) bins. */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    val binnedPoints = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    binnedPoints.join(binnedIntervals, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
