package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Sample}
import org.apache.spark.sql.graft.Shim

/** Plan-time sampling selectivity — the Spark rendering of the
  * reference's sampled leaf estimation (History::setLeafSelectivity
  * Cost.h:52-57; TableLayout::sample ConnectorMetadata.h:253-269; gated
  * by OptimizerOptions.sampleFilters, OptimizerOptions.h:53-57).
  *
  * When the optimizer meets a filtered scan with no recorded history, it
  * runs the predicate over a bounded sample of the actual files and
  * extrapolates the row count, memoizing the estimate in [[History]] so
  * each (table, filters) key is sampled at most once per process. The
  * parquet total count is metadata-only; the sampled filter scans ~50k
  * rows — milliseconds of planning cost traded against shuffling a
  * mis-sized join side, the same trade the reference gates behind
  * sampleFilters.
  */
object Sampling {

  private val SampleTarget = 50000.0

  /** Re-entrancy guard: the sampling jobs themselves pass through the
    * optimizer; they must not trigger further sampling. */
  private val inSampling = new ThreadLocal[Boolean] { override def initialValue = false }
  def inProgress: Boolean = inSampling.get()

  /** Estimate output rows of Filter(cond, rel) by sampled execution. */
  def estimateFilteredRows(spark: SparkSession, rel: LogicalPlan, cond: Expression): Long = {
    inSampling.set(true)
    try {
      val total = Shim.ofRows(spark, rel).count() // parquet metadata count
      if (total == 0) 0L
      else {
        val frac = math.min(1.0, SampleTarget / total.toDouble)
        val sampledPlan = Filter(cond, Sample(0.0, frac, withReplacement = false, 42L, rel))
        val matches = Shim.ofRows(spark, sampledPlan).count()
        math.round(matches / frac)
      }
    } finally inSampling.set(false)
  }
}
