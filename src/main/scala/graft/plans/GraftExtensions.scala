package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** History-fed broadcast planning — the Catalyst seam for the reference's
  * sampling/history cardinality feedback (SURVEY §4.8: History ::
  * setLeafSelectivity Cost.h:52-57, recorded actuals reused for costing
  * VeloxHistory.cpp:32-70; broadcast-vs-partition decided from those
  * cardinalities in joinByHash Optimization.cpp:885-1046).
  *
  * When a (relation, pushed filters) subtree has a recorded actual row
  * count small enough to broadcast, wrap it in a BROADCAST hint. This
  * repairs the case static stats cannot see: Spark estimates a filtered
  * scan at full file size, so a 0.1%-selective dimension filter still
  * plans as a shuffle join until AQE (and AQE only helps after the first
  * shuffle materializes — the hint removes that shuffle entirely).
  *
  * Injected via spark.sql.extensions (SparkSessionExtensions), so any
  * session — including spark.sql text queries — benefits.
  */
class HistoryStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def broadcastRowLimit: Long =
    spark.conf.getOption("graft.history.broadcastRowLimit").map(_.toLong).getOrElse(500000L)

  // canonical-key conjunct split — ONE definition (History.conjuncts)
  // shared by the rule, the sampler, and actual-recording so the three
  // can never drift apart on key equality (round-17 review)
  private def conjuncts(e: Expression): Seq[Expression] = History.conjuncts(e)

  /** (root paths, current total bytes) — the size is the data fingerprint
    * half of the history key, so counts recorded against smaller/older
    * data can never justify a broadcast of the grown relation. */
  private def relPath(rel: LogicalRelation): Option[(String, Long)] = rel.relation match {
    case fs: HadoopFsRelation =>
      Some((fs.location.rootPaths.map(_.toString).sorted.mkString(";"), fs.location.sizeInBytes))
    case _ => None
  }

  private def samplingEnabled: Boolean =
    spark.conf.getOption("graft.sampling.enabled").contains("true")

  /** Interpolation over recorded operating points (History.interpolateScan,
    * the reference's Model.h) — on by default: it only fires when the same
    * scan shape was recorded at two or more other data sizes. */
  private def interpolateEnabled: Boolean =
    !spark.conf.getOption("graft.history.interpolate").contains("false")

  /** Join-fanout sampling gate — the reference's OptimizerOptions
    * .sampleJoins (JoinSample.cpp:217), separate from sampleFilters. */
  private def joinSamplingEnabled: Boolean =
    spark.conf.getOption("graft.sampling.joins").contains("true")

  /** Scan-shaped = (optionally filtered/projected) file relation. Join
    * sampling is restricted to scan-shaped sides, like the reference's
    * sampleJoin which samples the two leaf scans of one join — so the
    * sampled plan never executes a nested join as a side effect. */
  private def scanShaped(plan: LogicalPlan): Boolean = plan match {
    case Filter(_, child) => scanShaped(child)
    case Project(_, child) => scanShaped(child)
    case rel: LogicalRelation => relPath(rel).isDefined
    case _ => false
  }

  /** Canonical history key for a plan subtree: scans key on (path, data
    * fingerprint, pushed filters); joins compose their sides' keys with
    * the normalized join condition. */
  private def canonicalKey(plan: LogicalPlan): Option[String] = plan match {
    case Filter(cond, rel: LogicalRelation) =>
      relPath(rel).map { case (p, bytes) => History.scanKey(p, bytes, conjuncts(cond)) }
    case rel: LogicalRelation =>
      relPath(rel).map { case (p, bytes) => History.scanKey(p, bytes, Nil) }
    case Project(_, child) => canonicalKey(child)
    case Join(l, r, Inner, Some(cond), _) =>
      for (lk <- canonicalKey(l); rk <- canonicalKey(r))
        yield s"join[$lk * $rk | ${History.exprKey(conjuncts(cond))}]"
    case _ => None
  }

  private def recordedRows(plan: LogicalPlan): Option[Long] = plan match {
    case Filter(cond, rel: LogicalRelation) =>
      relPath(rel).flatMap { case (p, bytes) =>
        val key = History.scanKey(p, bytes, conjuncts(cond))
        History.lookup(key).orElse {
          // Unseen data size, known shape: interpolate between recorded
          // operating points (Model.h) BEFORE paying for a sample.
          if (interpolateEnabled) History.interpolateScan(p, bytes, conjuncts(cond))
          else None
        }.orElse {
          // No history yet: optionally sample the predicate at plan time
          // (reference sampleFilters, OptimizerOptions.h:53-57) and
          // memoize so each key is sampled once.
          if (samplingEnabled && !Sampling.inProgress) {
            val est = Sampling.estimateFilteredRows(spark, rel, cond)
            History.put(key, est)
            Some(est)
          } else None
        }
      }
    case Project(_, child) => recordedRows(child)
    case rel: LogicalRelation =>
      relPath(rel).flatMap { case (p, bytes) =>
        History.lookup(History.scanKey(p, bytes, Nil)).orElse {
          if (interpolateEnabled) History.interpolateScan(p, bytes, Nil) else None
        }
      }
    // A join side that is itself an inner equi-join: its OUTPUT rows are
    // what the parent's broadcast decision needs, and static stats get
    // them wrong exactly when the key distribution is skewed. Sample the
    // join once (reference sampleJoins), memoize under the canonical
    // join key.
    case j @ Join(l, r, Inner, Some(cond), _) =>
      canonicalKey(j).flatMap { key =>
        History.lookup(key).orElse {
          if (joinSamplingEnabled && Sampling.joinSamplingAllowed && !Sampling.inProgress &&
              scanShaped(l) && scanShaped(r) && Sampling.hasEquiConjunct(cond, l, r)) {
            val est = Sampling.estimateJoinOutputRows(spark, l, r, cond)
            History.put(key, est)
            Some(est)
          } else None
        }
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    History.autoload(spark) // opt-in via graft.history.autoload
    if (History.size == 0 && !samplingEnabled && !joinSamplingEnabled) plan
    else plan.transformUp {
      // This rule runs after EliminateResolvedHint, so the hint goes on
      // the Join node itself (a ResolvedHint wrapper would no longer be
      // folded in before physical planning reads Join.hint).
      case j @ Join(left, right, _, _, hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        // A hint is only worth its cost when it ADDS information: if the
        // side's Statistics (file size, or CardinalityStatsRule's
        // installed row counts) already fall under the auto-broadcast
        // threshold, Spark broadcasts it unhinted — and keeping
        // JoinHint.NONE is what allows CostBasedJoinReorder (which only
        // fires on unhinted joins) to reorder the join tree.
        def alreadyBroadcastBySize(side: LogicalPlan): Boolean = {
          val thr = spark.sessionState.conf.autoBroadcastJoinThreshold
          thr > 0 && side.stats.sizeInBytes <= BigInt(thr)
        }
        def sideHint(side: LogicalPlan): Option[HintInfo] =
          recordedRows(side) match {
            case Some(rows) if rows <= broadcastRowLimit && !alreadyBroadcastBySize(side) =>
              Some(HintInfo(strategy = Some(BROADCAST)))
            case _ => None
          }
        j.copy(hint = JoinHint(sideHint(left), sideHint(right)))
    }
  }
}

/** spark.sql.extensions entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Statistics install must precede the hint rule within the batch:
    // a side whose installed stats already broadcast needs NO hint, and
    // leaving JoinHint.NONE is what lets CostBasedJoinReorder (the
    // reference's join-order DP analogue) run on the join.
    // reduce_agg's two-step resolution: the HOF placeholder (lambda
    // binding) lowers to the DeclarativeAggregate once resolved.
    ext.injectResolutionRule(new graft.functions.ReduceAggResolution(_))
    ext.injectOptimizerRule(new CardinalityStatsRule(_))
    ext.injectOptimizerRule(new HistoryStatsRule(_))
    ext.injectOptimizerRule(new JsonConsolidationRule(_))
    ext.injectOptimizerRule(new SubfieldDecompositionRule(_))
    // Whole-operator extension (custom-operator ladder rung (c)): the
    // native merge as-of join's logical node needs its planner strategy.
    ext.injectPlannerStrategy(_ => new graft.operators.NativeAsOfJoin.AsOfJoinStrategy)
    // Presto SQL front door (reference axiom/sql/presto): a dialect
    // parser gated on graft.sql.dialect=presto, delegating to Spark's
    // parser after PrestoDialect lowering. See graft.sql.PrestoParser.
    ext.injectParser((session, delegate) => new graft.sql.PrestoParser(session, delegate))
    // Presto functions with no honest Spark rename (SURVEY §2.5):
    // session-wide so Registry.call and Presto-dialect SQL both resolve.
    (graft.functions.PrestoCompat.builders ++ graft.functions.PrestoFns2.builders ++
      graft.functions.NetFns.builders ++ graft.functions.SetDigest.builders ++
      graft.functions.GeoFns.builders ++ graft.functions.BingTiles.builders ++
      graft.functions.GeoAgg.builders ++ graft.functions.MlFns.builders ++
      graft.functions.KHll.builders)
      .foreach { case (name, builder) =>
        ext.injectFunction((
          org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.functions.PrestoCompat", name),
          builder))
      }
  }
}
