package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project, Sample}
import org.apache.spark.sql.graft.Shim

/** Plan-time sampling selectivity — the Spark rendering of the
  * reference's sampled leaf estimation (History::setLeafSelectivity
  * Cost.h:52-57; TableLayout::sample ConnectorMetadata.h:253-269; gated
  * by OptimizerOptions.sampleFilters, OptimizerOptions.h:53-57) and
  * sampled join fanout (JoinSample.cpp:217 sampleJoin, hash-sampled key
  * intersection at :28-63, gated by OptimizerOptions.sampleJoins).
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

  private val DefaultSampleTarget = 50000.0

  private def sampleTarget(spark: SparkSession): Double =
    spark.conf.getOption("graft.sampling.targetRows").map(_.toDouble)
      .getOrElse(DefaultSampleTarget)

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
        val frac = math.min(1.0, sampleTarget(spark) / total.toDouble)
        val sampledPlan = Filter(cond, Sample(0.0, frac, withReplacement = false, 42L, rel))
        val matches = Shim.ofRows(spark, sampledPlan).count()
        math.round(matches / frac)
      }
    } finally inSampling.set(false)
  }

  /** True iff `cond` carries at least one equi-conjunct that splits
    * across the two sides — the sampled join then plans as a hash join,
    * so its cost is linear in the sampled inputs. Pure theta joins are
    * never sampled (the sampled plan itself would be a nested loop). */
  def hasEquiConjunct(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    History.conjuncts(cond).exists {
      // Both sides must REFERENCE columns: a literal's empty reference
      // set is a subset of every outputSet, so without this guard a
      // column-vs-constant equality (l.c = 5) on a theta join would
      // count as a cross-side equi-conjunct and the sampled plan would
      // execute as a plan-time nested-loop product.
      case EqualTo(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
      case _ => false
    }
  }

  /** Estimate the output rows of an inner equi-join by sampled execution
    * — the reference's sampleJoin (JoinSample.cpp:217): mis-estimated
    * join fanout is the classic cause of a wrong broadcast/shuffle
    * choice at 100×, because Σₖ lₖ·rₖ is invisible to per-side static
    * stats when the key distribution is skewed.
    *
    * Estimator: Bernoulli row-sample each side at its OWN rate
    * pₛ = min(1, target/nₛ) and scale the sampled join count by
    * 1/(p_l·p_r). This is unbiased for the fanout sum (every (l,r) pair
    * survives with probability p_l·p_r) and, unlike the reference's
    * coordinated key-hash sampling, keeps bounded variance when one
    * heavy key dominates the output: a coordinated scheme keeps or
    * drops a heavy key's ENTIRE lₖ·rₖ block (relative std ≈ √f on
    * one-hot skew), while row sampling keeps ~p_l·lₖ of its left rows
    * and ~p_r·rₖ of its right rows so the block's contribution
    * concentrates. Per-side rates matter for dimension-fact joins
    * (round-17 review): one shared rate sized from the LARGER side
    * decimated a small dimension to ~0 sampled rows (25-row nation at
    * a fact-sized rate had a ~16% chance of keeping nothing → a
    * memoized 0-row estimate → broadcast hint on a huge join); per-side
    * rates keep a sub-target side intact (pₛ = 1) and bound each
    * sampled input at ~target rows. Totals come from parquet metadata
    * (no data scan).
    */
  def estimateJoinOutputRows(spark: SparkSession, left: LogicalPlan, right: LogicalPlan,
                             cond: Expression): Long = {
    val t0 = System.nanoTime()
    inSampling.set(true)
    try {
      val lTotal = roughRows(spark, left)
      val rTotal = roughRows(spark, right)
      if (lTotal == 0 || rTotal == 0) 0L
      else {
        val target = sampleTarget(spark)
        val pL = math.min(1.0, target / lTotal.toDouble)
        val pR = math.min(1.0, target / rTotal.toDouble)
        val scale = 1.0 / (pL * pR)
        def samp(plan: LogicalPlan, p: Double, seed: Long): LogicalPlan =
          if (p >= 1.0) plan else Sample(0.0, p, withReplacement = false, seed, plan)
        val j = Join(samp(left, pL, 42L), samp(right, pR, 43L), Inner, Some(cond), JoinHint.NONE)
        // Work cap (reference gate analogue: OptimizerOptions.sampleJoins,
        // JoinSample.cpp:48-52): the sampled join's OUTPUT is
        // ~true_output/f, which is unbounded for near-cross-product
        // joins, so the sampled plan runs under a LocalLimit. A
        // partition that hits the cap contributes `cap` rows, so
        // matches >= cap iff the count may be truncated; the estimate
        // then degrades to the FLOOR cap*scale — with the default cap
        // (2M) far above any broadcast row limit, a capped join can
        // never be mistaken for broadcastable, and the plan-time job
        // is bounded by cap rows per output partition.
        val cap = joinOutputCap(spark)
        val limited = org.apache.spark.sql.catalyst.plans.logical.LocalLimit(
          org.apache.spark.sql.catalyst.expressions.Literal(
            math.min(cap, Int.MaxValue.toLong).toInt), j)
        val matches = Shim.ofRows(spark, limited).count()
        math.round(math.min(matches, cap) * scale)
      }
    } finally {
      inSampling.set(false)
      noteJoinSampleElapsed(spark, (System.nanoTime() - t0) / 1000000)
    }
  }

  /** Ceiling on sampled-join output rows (per partition, and the
    * truncation-detection threshold on the total). */
  private def joinOutputCap(spark: SparkSession): Long =
    spark.conf.getOption("graft.sampling.joinOutputCap").map(_.toLong)
      .getOrElse(2000000L)

  /** Wall-clock circuit breaker: if one sampled-join estimate exceeds
    * the time budget (graft.sampling.joinTimeBudgetMs, default 5000),
    * further join sampling in this process is skipped — the planner
    * falls back to static estimates instead of paying pathological
    * plan-time latency per join. Memoized estimates keep serving. */
  private val joinBudgetBreached = new java.util.concurrent.atomic.AtomicBoolean(false)
  def joinSamplingAllowed: Boolean = !joinBudgetBreached.get()
  def resetJoinSamplingBreaker(): Unit = joinBudgetBreached.set(false)

  private def joinTimeBudgetMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.sampling.joinTimeBudgetMs").map(_.toLong)
      .getOrElse(5000L)

  /** Record a completed estimate's cost against the budget. */
  private[plans] def noteJoinSampleElapsed(spark: SparkSession, elapsedMs: Long): Unit =
    if (elapsedMs > joinTimeBudgetMs(spark)) joinBudgetBreached.set(true)

  /** Cheap row-count upper bound used only to size the sample rate:
    * strip filters/projections down to the bare relation, whose count is
    * parquet-metadata-only. An over-count just makes the sample rate a
    * touch conservative. */
  private def roughRows(spark: SparkSession, plan: LogicalPlan): Long = plan match {
    case Filter(_, child) => roughRows(spark, child)
    case Project(_, child) => roughRows(spark, child)
    case other => Shim.ofRows(spark, other).count()
  }
}
