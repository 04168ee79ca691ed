package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, NullType}

/** Presto reduce_agg(inputValue, initialState, inputFunction,
  * combineFunction) as a TRUE partial aggregate (the reference registers
  * the Presto aggregate surface via AxiomSql.cpp:58-59).
  *
  * The round-9 lowering collected each group into one array and folded
  * it with the `aggregate` HOF — O(group) memory per group, the one
  * remaining operator shape that could exhaust an executor on a hot key
  * at 100 TB (round-10 ADVICE). This implementation keeps ONE value of
  * the initial-state type per group:
  *
  *  - update: `state := inputFunction(state, input)` (NULL inputs are
  *    ignored, as in Presto);
  *  - merge:  `state := combineFunction(state_left, state_right)` — the
  *    user's state combiner finally does the job Presto's contract
  *    assigns it (the collect_list lowering accepted it unused);
  *  - evaluate: `state`.
  *
  * Resolution is a two-step dance forced by the analyzer: a function
  * built from the registry may only carry lambdas if the BUILT
  * expression is itself a HigherOrderFunction (ResolveFunctions'
  * NON_HIGHER_ORDER_FUNCTION check fires even on a wrapped
  * AggregateExpression). So the builder returns [[ReduceAggCall]] — a
  * non-aggregate HOF placeholder whose lambdas ResolveLambdaVariables
  * binds — and the injected [[ReduceAggResolution]] rule rewrites the
  * RESOLVED placeholder into the real [[ReduceAgg]] DeclarativeAggregate,
  * inlining nothing yet: the bound lambda bodies are substituted into
  * update/merge expressions lazily at planning. The result is plain
  * expression code — whole-stage codegen, map-side partial aggregation,
  * O(1) state per group.
  */
case class ReduceAggCall(
    input: Expression,
    zero: Expression,
    inputFn: Expression,
    combineFn: Expression)
  extends Expression with HigherOrderFunction with Unevaluable {

  override def prettyName: String = "reduce_agg"
  override def dataType: DataType = if (zero.resolved) zero.dataType else NullType
  override def nullable: Boolean = true

  // AnyDataType is private[sql]; covariant overrides returning each
  // child's OWN type are trivially self-accepting (same effect), with a
  // NullType placeholder while a child is still unresolved.
  private def typeOf(e: Expression): DataType =
    if (e.resolved) e.dataType else NullType
  override def arguments: Seq[Expression] = Seq(input, zero)
  override def argumentTypes: Seq[DataType] = Seq(typeOf(input), typeOf(zero))
  override def functions: Seq[Expression] = Seq(inputFn, combineFn)
  override def functionTypes: Seq[DataType] = Seq(typeOf(inputFn), typeOf(combineFn))

  override def children: Seq[Expression] = Seq(input, zero, inputFn, combineFn)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReduceAggCall =
    copy(input = newChildren(0), zero = newChildren(1),
      inputFn = newChildren(2), combineFn = newChildren(3))

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction = {
    val st = zero.dataType
    copy(
      inputFn = f(inputFn, Seq((st, true), (input.dataType, input.nullable))),
      combineFn = f(combineFn, Seq((st, true), (st, true))))
  }
}

/** Injected resolution rule: once [[ReduceAggCall]]'s lambdas are bound
  * and its children resolved, lower it to the aggregate proper. */
class ReduceAggResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case p => p.transformExpressionsUp {
      case c: ReduceAggCall if c.resolved =>
        ReduceAgg(c.input, c.zero, c.inputFn, c.combineFn).toAggregateExpression()
    }
  }
}

/** The aggregate itself: state is a single value of the initial-state
  * type; the BOUND lambda bodies are inlined into the declarative
  * update/merge expressions by substituting the lambda variables with
  * the buffer attribute and input expression. */
case class ReduceAgg(
    input: Expression,
    zero: Expression,
    inputFn: Expression,
    combineFn: Expression)
  extends DeclarativeAggregate {

  override def prettyName: String = "reduce_agg"
  override def dataType: DataType = zero.dataType
  override def nullable: Boolean = true

  override def children: Seq[Expression] = Seq(input, zero, inputFn, combineFn)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReduceAgg =
    copy(input = newChildren(0), zero = newChildren(1),
      inputFn = newChildren(2), combineFn = newChildren(3))

  private lazy val stateType = zero.dataType
  private lazy val state = AttributeReference("reduce_agg_state", stateType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(state)
  override lazy val initialValues: Seq[Expression] = Seq(zero)

  /** Inline a bound lambda body, replacing its variables with the given
    * expressions; the Presto contract types the body as the state type,
    * and a residual widening (e.g. INT state + BIGINT sum) is closed
    * with a cast. */
  private def inline(fn: Expression, reps: Seq[Expression]): Expression = fn match {
    case LambdaFunction(body, args, _) =>
      val byId = args.map(_.asInstanceOf[NamedLambdaVariable].exprId).zip(reps).toMap
      val r = body.transformUp {
        case v: NamedLambdaVariable if byId.contains(v.exprId) => byId(v.exprId)
      }
      if (r.dataType == stateType) r else Cast(r, stateType)
    case other => throw new IllegalArgumentException(
      s"reduce_agg: expected a lambda function, got $other")
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(input), state, inline(inputFn, Seq(state, input))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    inline(combineFn, Seq(state.left, state.right)))
  override lazy val evaluateExpression: Expression = state
}
