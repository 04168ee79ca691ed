package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the custom-operator ladder's rung (c)
  * (SURVEY §7.3): a logical node + planner strategy + physical operator,
  * injected via SparkSessionExtensions. The reference's analogue is a
  * first-class plan node lowered by the optimizer into an executable
  * fragment (axiom/logical_plan/LogicalPlanNode.h node kinds;
  * axiom/runner/MultiFragmentPlan.h fragments).
  *
  * Semantics: for each left row, attach `rightValue` from the LATEST
  * right row with the same key and rightTime <= leftTime; left rows with
  * no prior right row are dropped (inner as-of) — identical to
  * [[AsOfJoin.asofJoin]]'s union+window formulation and DuckDB's
  * `ASOF JOIN ... ON l.key = r.key AND l.t >= r.t`.
  *
  * Why a physical operator when a composition exists: the union+window
  * form pays one shuffle of BOTH sides into one window partition stream
  * plus the window's buffering; this operator declares
  * `ClusteredDistribution(key)` + per-partition `(key, time)` ordering
  * and then streams BOTH sorted sides through a single O(n+m) merge with
  * O(1) state (one buffered right row) — no window buffer, no unioned
  * wide schema, and Spark's EnsureRequirements plans the minimal
  * exchanges/sorts exactly as it does for SortMergeJoin. At 100 TB both
  * sides shuffle once on the key either way, but the merge needs no
  * per-group memory and preserves the left side's partitioning for
  * downstream reuse.
  */
object NativeAsOfJoin {

  /** Logical node. `rightValue` must be an attribute of `right`;
    * `outAttr` is the fresh attribute the operator produces for it. */
  case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      rightValue: Expression, outAttr: Attribute)
      extends BinaryNode {
    override def output: Seq[Attribute] = left.output :+ outAttr
    override def producedAttributes: AttributeSet = AttributeSet(outAttr)
    override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan) =
      copy(left = l, right = r)
  }

  /** Planner strategy: 1-to-1 lowering of the logical node. */
  class AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, out) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, out) :: Nil
      case _ => Nil
    }
  }

  /** Physical merge as-of join.
    *
    * Declares the same requirements as SortMergeJoin — co-clustered
    * children, (key, time)-sorted partitions — so EnsureRequirements
    * inserts only the exchanges/sorts actually missing. Each partition
    * then runs a single forward merge: advance the right iterator while
    * its (key, time) is at or before the current left row, remembering
    * only the latest in-key right value.
    */
  case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      rightValue: Expression, outAttr: Attribute)
      extends SparkPlan with BinaryExecNode {

    override def output: Seq[Attribute] = left.output :+ outAttr
    override def producedAttributes: AttributeSet = AttributeSet(outAttr)

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

    /** The merge is 1-to-at-most-1 on an already-clustered left: both the
      * partitioning and the (key, time) order of the left side survive,
      * so downstream stages (e.g. a groupBy on the same key) plan no new
      * exchange. */
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan) =
      copy(left = l, right = r)

    override protected def doExecute(): RDD[InternalRow] = {
      val keyTypes = leftKeys.map(_.dataType)
      val timeType = leftTime.dataType
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
        val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
        val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
        val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
        val valueProj = UnsafeProjection.create(Seq(rightValue), right.output)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val outProj = UnsafeProjection.create(output, left.output :+ outAttr)
        val joined = new JoinedRow

        val rBuf = rIter.buffered
        // O(1) merge state: the latest right (key, value) consumed so far.
        var lastKey: UnsafeRow = null
        var lastValue: UnsafeRow = null

        lIter.flatMap { l =>
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          // SQL ASOF semantics: NULL keys/times never match (the oracle's
          // ON k = k AND t >= t is false on NULL). Natural ordering sorts
          // nulls first, so null rows are consumed/skipped up front.
          val lNull = lk.anyNull || lt.anyNull
          var scan = true
          while (scan && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val rt = rTimeProj(r)
            if (rk.anyNull || rt.anyNull) { rBuf.next() } // never a match
            else {
              val ck = keyOrd.compare(rk, lk)
              if (ck < 0) { rBuf.next() } // right key fully behind: discard
              else if (ck == 0 && !lNull && timeOrd.compare(rt, lt) <= 0) {
                // in-key and at-or-before: becomes the current best match
                lastKey = lk.copy(); lastValue = valueProj(r).copy(); rBuf.next()
              } else scan = false // right is ahead of this left row
            }
          }
          if (!lNull && lastKey != null && keyOrd.compare(lastKey, lk) == 0)
            Some(outProj(joined(l, lastValue)))
          else None
        }
      }
    }
  }

  /** FORWARD as-of: for each left row, the EARLIEST right row with
    * rightTime >= leftTime in the key group — DuckDB's
    * `ASOF JOIN ... ON l.t <= r.t`. Implemented by running the backward
    * merge over negated epoch-micros: max(-t) over {-rt <= -lt} is
    * min(t) over {rt >= lt}, so the same exec (and its distribution/
    * ordering contract) serves both directions. */
  def asofJoinNativeForward(left: DataFrame, right: DataFrame,
                            key: String, time: String,
                            valueCol: String, as: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val neg = "_negts"
    val l = left.withColumn(neg, expr(s"-unix_micros($time)"))
    val r = right.withColumn(neg, expr(s"-unix_micros($time)"))
    asofJoinNative(l, r, key, neg, valueCol, as).drop(neg)
  }

  /** DataFrame-level API mirroring [[AsOfJoin.asofJoin]]. Both inputs
    * must carry `key` and `time` columns; the right's `valueCol` is
    * attached to matching left rows as `as`. */
  def asofJoinNative(left: DataFrame, right: DataFrame,
                     key: String, time: String,
                     valueCol: String, as: String): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    val value = attr(rPlan, valueCol)
    val outAttr = AttributeReference(as, value.dataType, nullable = true)()
    org.apache.spark.sql.graft.Shim.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan,
        Seq(attr(lPlan, key)), Seq(attr(rPlan, key)),
        attr(lPlan, time), attr(rPlan, time),
        value, outAttr))
  }
}
