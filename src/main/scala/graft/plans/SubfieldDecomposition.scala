package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.MapType

/** Decompose subfield access THROUGH path-transparent functions so the
  * extraction lands directly on stored columns — the generalized form of
  * the reference's function-subfield metadata
  * (axiom/optimizer/FunctionRegistry.h:111-178 `FunctionMetadata`:
  * `subfieldArg` says "a path over the function's result maps to a path
  * over argument N", `valuePathToArgPath` is the general translator, and
  * `element_at` is registered as the subscript function,
  * FunctionRegistry.cpp:204-207; applied by markSubfields,
  * axiom/optimizer/Subfields.cpp).
  *
  * Why it matters: Spark's nested-schema pruning (SchemaPruning) only
  * recognizes extraction chains rooted at attributes. A feature-map
  * workload that wraps the stored struct in a conditional or a value
  * transform — `coalesce(features_a, features_b).f1`,
  * `if(cond, features, fallback).f1`, `transform_values(m, …)['k']` —
  * defeats it, and the scan reads EVERY field of a wide feature struct
  * for a one-field query. Rewriting extract-over-f into f-over-extract
  * re-roots the access on the column, and the stock pruning rule (which
  * runs in a later batch than injected rules) then prunes the parquet
  * ReadSchema to the accessed keys.
  *
  * The rewrites live in [[SubfieldFunctions.table]], a per-function
  * metadata registry mirroring the reference's FunctionRegistry — each
  * entry says how a result path maps to argument paths. Entries that
  * DUPLICATE a subexpression (the Coalesce null-ladder, the map-lambda
  * lookups) are gated on determinism, matching the convention of Spark's
  * own expression-duplicating optimizer rules: a `rand()`- or UDF-bearing
  * input must not be evaluated twice with divergent results.
  *
  * Like all graft rules, injected via GraftExtensions (operator-
  * optimization batch, ahead of Early Filter and Projection Push-Down
  * where SchemaPruning lives). `transformDown` re-visits the rewritten
  * node's children, so CHAINS decompose recursively:
  * `try_element_at(transform_values(map_filter(m, p), f), 'k')` unwinds
  * to a guarded direct lookup on `m` in one pass.
  *
  * The reference's remaining FunctionMetadata fields map as follows:
  * `isArrayConstructor`/`isMapConstructor` (extraction over a
  * constructor folds to the argument) are Spark's own
  * SimplifyExtractValueOps; the `explode` translator (ONE call used at
  * several result paths decomposed into per-path expressions, e.g. a
  * map-wide array_sort read at [k1][0] and [k2][1]) falls out of this
  * rule's per-extraction rewriting — each extraction node is rewritten
  * independently, so multi-path use needs no separate mechanism here
  * (pinned by NestedPruningSpec "one call read at two paths").
  *
  * Layout note: parquet's reader cannot skip individual MAP keys, so
  * the storage half of the reference's map-as-struct optimization
  * corresponds to materializing feature maps as STRUCT columns (the
  * layout the pruning test uses); this rule supplies the access-rewrite
  * half for both layouts — struct extractions become scan-prunable,
  * map extractions avoid materializing whole transformed maps.
  */
class SubfieldDecompositionRule(spark: SparkSession) extends Rule[LogicalPlan] {
  // Function.unlift keeps step() to ONE evaluation per expression node:
  // transformDown drives the rule via applyOrElse, which unlift
  // implements without the separate isDefinedAt probe a guard would pay.
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions(Function.unlift(SubfieldFunctions.step))
}

/** The function-subfield metadata registry (FunctionRegistry analogue):
  * one [[SubfieldFunctions.Meta]] per function whose result paths map to
  * argument paths.
  */
object SubfieldFunctions {

  /** One registry entry: the function's name (diagnostic) and its
    * valuePathToArgPath analogue — a partial function from an extraction
    * over the function's result to the decomposed expression rooted on
    * the function's arguments.
    */
  final case class Meta(name: String)(val rewrite: PartialFunction[Expression, Expression])

  /** One decomposition step for extract-over-f, or None. Entries are
    * tried in registry order; `e.deterministic` gates every entry whose
    * rewrite duplicates a subexpression (coalesce, the map lambdas).
    * applyOrElse evaluates each entry's pattern once, with no per-entry
    * Option allocation — this runs for every expression of every plan.
    */
  def step(e: Expression): Option[Expression] = {
    val it = table.iterator
    while (it.hasNext) {
      val r = it.next().rewrite.applyOrElse(e, SubfieldFunctions.NoMatch)
      if (r ne NoMatchSentinel) return Some(r)
    }
    None
  }

  private val NoMatchSentinel: Expression =
    org.apache.spark.sql.catalyst.expressions.Literal(null)
  private val NoMatch: Expression => Expression = _ => NoMatchSentinel

  val table: Seq[Meta] = Seq(
    // extract(If(p, a, b)) -> If(p, extract(a), extract(b)).
    // Nothing is duplicated (each of p/a/b appears once), so no
    // determinism gate; error semantics of an ANSI element_at are
    // preserved because the SAME subscript runs on the chosen branch.
    Meta("if") {
      case ex @ ExtractOver(If(p, a, b)) =>
        If(p, reExtract(ex, a), reExtract(ex, b))
    },
    // extract(CaseWhen(...)) -> CaseWhen over extracted branch values.
    Meta("casewhen") {
      case ex @ ExtractOver(CaseWhen(branches, elseValue)) =>
        CaseWhen(branches.map { case (c, v) => (c, reExtract(ex, v)) },
          elseValue.map(reExtract(ex, _)))
    },
    // extract(Coalesce(c1..cn)) -> If(IsNotNull(c1), extract(c1), ...).
    // First-non-null semantics preserved by testing the ORIGINAL inputs
    // (NOT coalesce of the extractions — a non-null struct with a null
    // field must win). Each input appears twice (IsNotNull + extract),
    // so the inputs must be deterministic.
    Meta("coalesce") {
      case ex @ ExtractOver(Coalesce(children))
          if children.nonEmpty && children.forall(_.deterministic) =>
        children.init.foldRight(reExtract(ex, children.last)) { (c, rest) =>
          If(IsNotNull(c), reExtract(ex, c), rest)
        }
    },
    // transform_values(m, λ)['k'] -> if(m['k'] null, null, λ(k, m['k'])).
    // subfieldArg = 0 in the reference (FunctionRegistry.cpp:161): key k
    // on the result is key k on the map argument. Only when the value
    // type is non-nullable (a present-but-null value is indistinguishable
    // from an absent key after extraction). m['k'] is duplicated (guard +
    // each lambda-variable occurrence) — deterministic inputs only.
    Meta("transform_values") {
      case g @ NullSafeMapLookup(TransformValues(m, LambdaFunction(body, args, _)), key)
          if !valueNullable(m) && g.deterministic =>
        val Seq(kVar, vVar) = args
        val mk = GetMapValue(m, key)
        val substituted = body.transformUp {
          case v: NamedLambdaVariable if v.exprId == kVar.exprId => key
          case v: NamedLambdaVariable if v.exprId == vVar.exprId => mk
        }
        If(IsNull(mk), Literal.create(null, g.dataType), substituted)
    },
    // map_filter(m, λpred)['k'] -> if(m['k'] not null AND pred(k, m['k']),
    // m['k'], null). Safe even for NULLABLE value types: a present-but-
    // null value yields null from the original lookup whether or not the
    // predicate kept it, exactly like the guarded rewrite. A null
    // predicate drops the entry in map_filter and falls to the null
    // branch here. m['k'] is duplicated — deterministic inputs only.
    // ACCEPTED error-semantics divergence: And short-circuits on
    // IsNotNull(m['k']), so for a present-but-null VALUE the substituted
    // predicate is never evaluated — a runtime error the original lambda
    // would raise on that null (e.g. ANSI element_at inside the
    // predicate) is suppressed, while the RESULT is identical. This is
    // the same trade Spark's own null-intolerant rewrites make; gating on
    // !valueNullable (as transform_values/map_zip_with must for VALUE
    // correctness) would forfeit subfield pruning on every nullable-value
    // map for an error-only difference.
    Meta("map_filter") {
      case g @ NullSafeMapLookup(MapFilter(m, LambdaFunction(pred, args, _)), key)
          if g.deterministic =>
        val Seq(kVar, vVar) = args
        val mk = GetMapValue(m, key)
        val predSub = pred.transformUp {
          case v: NamedLambdaVariable if v.exprId == kVar.exprId => key
          case v: NamedLambdaVariable if v.exprId == vVar.exprId => mk
        }
        If(And(IsNotNull(mk), predSub), mk, Literal.create(null, g.dataType))
    },
    // map_zip_with(m1, m2, λ)['k'] -> if(k in either map,
    // λ(k, m1['k'], m2['k']), null). The result's key set is the UNION of
    // the inputs' keys and the lambda sees null for the missing side —
    // exactly what the direct lookups produce. Requires BOTH value types
    // non-nullable so "lookup is null" ⇔ "key absent" (a present null
    // value on both sides would wrongly fall to the null branch when
    // λ(k, null, null) is non-null). Lookups are duplicated (guard +
    // lambda occurrences) — deterministic inputs only.
    Meta("map_zip_with") {
      case g @ NullSafeMapLookup(MapZipWith(m1, m2, LambdaFunction(body, args, _)), key)
          if !valueNullable(m1) && !valueNullable(m2) && g.deterministic =>
        val Seq(kVar, v1Var, v2Var) = args
        val mk1 = GetMapValue(m1, key)
        val mk2 = GetMapValue(m2, key)
        val substituted = body.transformUp {
          case v: NamedLambdaVariable if v.exprId == kVar.exprId => key
          case v: NamedLambdaVariable if v.exprId == v1Var.exprId => mk1
          case v: NamedLambdaVariable if v.exprId == v2Var.exprId => mk2
        }
        If(Or(IsNotNull(mk1), IsNotNull(mk2)), substituted,
          Literal.create(null, g.dataType))
    }
  )

  /** Rebuild `extract` (some ExtractValue/subscript over `from`) with a
    * new child. ElementAt keeps its original error mode.
    */
  private def reExtract(extract: Expression, newChild: Expression): Expression =
    extract match {
      case g: GetStructField => g.copy(child = newChild)
      case g: GetMapValue => g.copy(child = newChild)
      case g: GetArrayItem => g.copy(child = newChild)
      case g: ElementAt => g.copy(left = newChild)
      case other => other // unreachable: callers match ExtractOver forms
    }

  private def valueNullable(m: Expression): Boolean = m.dataType match {
    case MapType(_, _, n) => n
    case _ => true
  }

  /** Extractor: an ExtractValue (or element_at subscript — the
    * reference's registerElementAt) whose child is the wrapped function.
    * Used by the branch-distributing entries, which preserve whatever
    * error mode the subscript carries.
    */
  private object ExtractOver {
    def unapply(e: Expression): Option[Expression] = e match {
      case GetStructField(child, _, _) => Some(child)
      case GetMapValue(child, _) => Some(child)
      case GetArrayItem(child, _, _) => Some(child)
      case ElementAt(child, _, _, _) => Some(child)
      case _ => None
    }
  }

  /** A MAP subscript that is null-on-missing: GetMapValue, or
    * element_at/try_element_at with ANSI erroring off. The map-lambda
    * entries rewrite to a null-guarded direct lookup, so they must NOT
    * match an ANSI element_at whose missing-key behavior is an error.
    */
  private object NullSafeMapLookup {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GetMapValue(m, k) => Some((m, k))
      case ElementAt(m, k, None, false) if m.dataType.isInstanceOf[MapType] =>
        Some((m, k))
      case _ => None
    }
  }
}
