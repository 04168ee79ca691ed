package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto JSON function family (json_parse / json_format / json_size /
  * json_array_contains; json_extract lowers to Spark's GetJsonObject in
  * the builder, json_extract_scalar and json_array_length are registry
  * renames/pass-throughs). Presto's JSON type is VARCHAR-backed here —
  * the same rendering its json→varchar cast produces — so json_format
  * is the identity and json_parse validates + canonicalizes.
  * Jackson (already on Spark's classpath) does the parsing. */
object JsonFns {

  private lazy val mapper = new ObjectMapper

  private def parse(s: String): JsonNode = mapper.readTree(s)

  /** json_parse(varchar) → canonical JSON text; invalid input errors
    * loudly, like Presto's INVALID_FUNCTION_ARGUMENT. */
  case class JsonParse(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "json_parse"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val node = try parse(s) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"json_parse: invalid JSON: ${s.take(80)}", e)
      }
      if (node == null) throw new IllegalArgumentException(
        s"json_parse: invalid JSON: ${s.take(80)}")
      UTF8String.fromString(mapper.writeValueAsString(node))
    }
  }

  /** json_size(json, path): number of fields of the matched object /
    * elements of the matched array; 0 for a scalar; NULL when the path
    * misses. The subtree arrives pre-extracted by GetJsonObject (which
    * unquotes string scalars — those parse-fail and count as scalars). */
  case class JsonCountable(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "json_size"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val node = try parse(s) catch { case _: Exception => null }
      if (node == null) 0
      else if (node.isObject || node.isArray) node.size()
      else 0
    }
  }

  /** is_json_scalar(json): true when the JSON text is a scalar (number,
    * string, true/false, or the null literal), false for arrays and
    * objects. Invalid JSON errors loudly like json_parse — Presto's
    * varchar→JSON cast on the way into the function does the same. */
  case class IsJsonScalar(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "is_json_scalar"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val node = try parse(s) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"is_json_scalar: invalid JSON: ${s.take(80)}", e)
      }
      if (node == null) throw new IllegalArgumentException(
        s"is_json_scalar: invalid JSON: ${s.take(80)}")
      !(node.isObject || node.isArray)
    }
  }

  /** json_array_get(json_array, index): the element at the 0-based
    * index, negative indices counting from the end; NULL for
    * non-array/invalid input or an out-of-range index, as in Presto.
    * Keeps Presto's documented (deprecated-but-kept) quirk: a string
    * element comes back RAW (unquoted); every other element renders as
    * canonical JSON text (a JSON null element renders as the text
    * 'null' — the varchar-backed analogue of Presto's JSON null). */
  case class JsonArrayGet(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "json_array_get"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(j: Any, iV: Any): Any = {
      val node = try parse(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
      if (node == null || !node.isArray) return null
      val n = node.size()
      val raw = iV.asInstanceOf[java.lang.Number].longValue()
      val idx = if (raw < 0) n + raw else raw
      if (idx < 0 || idx >= n) return null
      val e = node.get(idx.toInt)
      UTF8String.fromString(
        if (e.isTextual) e.textValue() else mapper.writeValueAsString(e))
    }
  }

  /** json_array_contains(json, value): true/false over a JSON array,
    * NULL for non-array/invalid input, as in Presto. Values compare by
    * kind (boolean / numeric / string). */
  case class JsonArrayContains(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = true
    override def prettyName: String = "json_array_contains"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(j: Any, v: Any): Any = {
      val node = try parse(j.asInstanceOf[UTF8String].toString)
      catch { case _: Exception => null }
      if (node == null || !node.isArray) return null
      val it = node.elements()
      var found = false
      while (it.hasNext && !found) {
        val e = it.next()
        found = v match {
          case b: java.lang.Boolean => e.isBoolean && e.booleanValue() == b.booleanValue()
          case s: UTF8String => e.isTextual && e.textValue() == s.toString
          case n: java.lang.Number =>
            e.isNumber && e.doubleValue() == n.doubleValue()
          case _ => false
        }
      }
      found
    }
  }
}
