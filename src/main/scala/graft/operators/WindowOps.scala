package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame extensions beyond Spark's built-ins.
  *
  * GROUPS frames (reference IR declares them: Expr.h:526-612
  * BoundType/WindowType incl. GROUPS) are not supported by Spark's
  * Window API — but a GROUPS frame is exactly a RANGE frame over the
  * dense rank of the ordering: peer rows share a dense-rank value, so
  * `RANGE BETWEEN k PRECEDING AND CURRENT ROW` on dense_rank equals
  * `GROUPS BETWEEN k PRECEDING AND CURRENT ROW` on the original order.
  * Two window passes over ONE shuffle (same partitioning), still fully
  * distributed.
  */
object WindowOps {

  /** Add `as` = agg over a GROUPS frame of the (partitionBy, orderBy)
    * window. `lower`/`upper` follow rangeBetween conventions
    * (negative = preceding, Window.currentRow = 0). */
  def groupsFrame(df: DataFrame, partitionBy: Seq[Column], orderBy: Column,
                  agg: Column => Column, target: Column,
                  lower: Long, upper: Long, as: String): DataFrame = {
    val rankW = Window.partitionBy(partitionBy: _*).orderBy(orderBy)
    val frameW = Window.partitionBy(partitionBy: _*).orderBy(col("_dr"))
      .rangeBetween(lower, upper)
    df.withColumn("_dr", dense_rank().over(rankW))
      .withColumn(as, agg(target).over(frameW))
      .drop("_dr")
  }
}
