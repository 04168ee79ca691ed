package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Decompose subfield access THROUGH path-transparent functions so the
  * extraction lands directly on stored columns — the generalized form of
  * the reference's function-subfield metadata
  * (axiom/optimizer/FunctionRegistry.h:111-178 valuePathToArgPath: "a
  * path over the function's result maps to a path over argument N";
  * applied by markSubfields, axiom/optimizer/Subfields.cpp).
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
  * The function table mirrors the reference's metadata registry — each
  * entry says how a result path maps to argument paths:
  *
  *  - If / CaseWhen: path distributes into every branch value.
  *  - Coalesce over structs/maps: first-non-null semantics preserved by
  *    an IsNotNull ladder over the ORIGINAL inputs (NOT coalesce of the
  *    extractions — a non-null struct with a null field must win).
  *  - TransformValues: result[k] = λ(k, m[k]), guarded by key presence;
  *    only when the value type is non-nullable (a present-but-null value
  *    is indistinguishable from an absent key after extraction).
  *
  * Like all graft rules, injected via GraftExtensions (operator-
  * optimization batch, ahead of Early Filter and Projection Push-Down
  * where SchemaPruning lives).
  *
  * Layout note: parquet's reader cannot skip individual MAP keys, so
  * the storage half of the reference's map-as-struct optimization
  * corresponds to materializing feature maps as STRUCT columns (the
  * layout the pruning test uses); this rule supplies the access-rewrite
  * half for both layouts — struct extractions become scan-prunable,
  * map extractions avoid materializing whole transformed maps.
  */
class SubfieldDecompositionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** Rebuild `extract` (some ExtractValue over `from`) with a new child. */
  private def reExtract(extract: Expression, newChild: Expression): Expression =
    extract match {
      case g: GetStructField => g.copy(child = newChild)
      case g: GetMapValue => g.copy(child = newChild)
      case g: GetArrayItem => g.copy(child = newChild)
      case other => other // unreachable: callers match ExtractValue forms
    }

  /** One decomposition step for extract-over-f, or None. */
  private def step(e: Expression): Option[Expression] = e match {
    // extract(If(p, a, b)) -> If(p, extract(a), extract(b))
    case ex @ ExtractOver(If(p, a, b)) =>
      Some(If(p, reExtract(ex, a), reExtract(ex, b)))
    // extract(CaseWhen(...)) -> CaseWhen over extracted branch values
    case ex @ ExtractOver(CaseWhen(branches, elseValue)) =>
      Some(CaseWhen(branches.map { case (c, v) => (c, reExtract(ex, v)) },
        elseValue.map(reExtract(ex, _))))
    // extract(Coalesce(c1..cn)) -> If(IsNotNull(c1), extract(c1), ...)
    case ex @ ExtractOver(Coalesce(children)) if children.nonEmpty =>
      Some(children.init.foldRight(reExtract(ex, children.last)) { (c, rest) =>
        If(IsNotNull(c), reExtract(ex, c), rest)
      })
    // transform_values(m, λ)['k'] -> if(m['k'] null, null, λ(k, m['k']))
    case g @ GetMapValue(tv @ TransformValues(m, LambdaFunction(body, args, _)), key)
        if !valueNullable(m) =>
      val Seq(kVar, vVar) = args
      val mk = GetMapValue(m, key)
      val substituted = body.transformUp {
        case v: NamedLambdaVariable if v.exprId == kVar.exprId => key
        case v: NamedLambdaVariable if v.exprId == vVar.exprId => mk
      }
      Some(If(IsNull(mk), Literal.create(null, g.dataType), substituted))
    case _ => None
  }

  private def valueNullable(m: Expression): Boolean = m.dataType match {
    case org.apache.spark.sql.types.MapType(_, _, n) => n
    case _ => true
  }

  /** Extractor: an ExtractValue whose child is the wrapped function. */
  private object ExtractOver {
    def unapply(e: Expression): Option[Expression] = e match {
      case GetStructField(child, _, _) => Some(child)
      case GetMapValue(child, _) => Some(child)
      case GetArrayItem(child, _, _) => Some(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e if step(e).isDefined => step(e).get
  }
}
