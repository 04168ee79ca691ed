package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Consolidate repeated `get_json_object(col, '$.k')` calls over the
  * same JSON column into ONE `from_json` parse with a pruned schema —
  * the schema-on-read analogue of the reference's map-as-struct
  * optimization (OptimizerOptions.h:40-46: when the accessed keys of a
  * map are statically known, read it as a struct of just those fields;
  * here the "map" is a JSON document and the parse is the expensive
  * part: k accesses = k full parses without this rule).
  *
  * Only single-level `$.field` paths participate; others are left
  * untouched. Injected via GraftExtensions alongside the history rule.
  */
class JsonConsolidationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val SimplePath = """\$\.([A-Za-z_][A-Za-z0-9_]*)""".r

  private def simpleField(e: GetJsonObject): Option[(Expression, String)] =
    e.path match {
      case Literal(p, StringType) if p != null =>
        p.toString match {
          case SimplePath(f) => Some((e.json, f))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case proj @ Project(exprs, child) =>
      // group the simple get_json_object calls by their json input
      val calls = exprs.flatMap(_.collect {
        case g: GetJsonObject => simpleField(g).map(fc => (g, fc._1, fc._2))
      }.flatten)
      val byInput = calls.groupBy(_._2.canonicalized)
      // ≥2 parse CALLS (even of the same field) pay ≥2 full parses
      val worthIt = byInput.filter(_._2.size >= 2)
      if (worthIt.isEmpty) proj
      else {
        var newExprs = exprs
        worthIt.foreach { case (_, group) =>
          val jsonInput = group.head._2
          val fields = group.map(_._3).distinct.sorted
          val schema = StructType(fields.map(f => StructField(f, StringType)))
          val parsed = JsonToStructs(schema, Map.empty, jsonInput,
            Some(spark.sessionState.conf.sessionLocalTimeZone))
          newExprs = newExprs.map(_.transform {
            case g: GetJsonObject if simpleField(g).exists(fc =>
              fc._1.canonicalized == jsonInput.canonicalized) =>
              val f = simpleField(g).get._2
              GetStructField(parsed, fields.indexOf(f), Some(f))
          }.asInstanceOf[NamedExpression])
        }
        Project(newExprs, child)
      }
  }
}
