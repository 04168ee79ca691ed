package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** The Presto SQL front door as an injected Catalyst parser — the Spark
  * rendering of the reference's grammar + AST lowering
  * (axiom/sql/presto/grammar/PrestoSql.g4; ast/AstBuilder.cpp;
  * PrestoParser.cpp lowering onto the logical plan).
  *
  * Installed session-wide via SparkSessionExtensions.injectParser and
  * gated on the session conf `graft.sql.dialect = presto` (set by
  * [[PrestoRewriter.sql]] for the duration of a dialect query, settable
  * by any user session). When active, statement/query/expression text is
  * lowered by [[PrestoDialect.transform]] — structural constructs Spark's
  * grammar lacks (FROM-clause UNNEST, TRY, ARRAY[..], ROW(..),
  * AT TIME ZONE, Presto type syntax) plus the function-name translation
  * table — and the result is parsed by Spark's own parser, so every
  * statement kind Spark supports (SELECT, INSERT, CTAS, CREATE/DROP,
  * EXPLAIN, SHOW, ...) flows through the same dialect door the way the
  * reference routes all of AstStatements.h through one AstBuilder.
  * Identifier/type parsing delegates untransformed: those surfaces are
  * dialect-identical.
  */
class PrestoParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private def active: Boolean =
    session.conf.getOption(PrestoParser.DialectConf).contains("presto")
  private def lower(text: String): String =
    if (active) PrestoDialect.transform(text) else text

  /** PREPARE bodies are stored in the session conf (Presto-identical
    * lifetime: per session, no cross-session leakage) under this
    * namespace, keyed by the case-normalized statement name. */
  private def prepKey(name: String): String = "graft.sql.prepared." + name

  override def parsePlan(sqlText: String): LogicalPlan = {
    if (!active) return delegate.parsePlan(sqlText)
    PrestoDialect.statementAction(sqlText) match {
      case Some(PrestoDialect.PrepareStmt(name, body)) =>
        // Validate the body NOW (Presto parses at PREPARE time), store
        // the raw dialect text, acknowledge with a one-row result.
        delegate.parsePlan(PrestoDialect.transform(
          PrestoDialect.spliceParams(body, Seq.fill(
            PrestoDialect.paramCount(body))("null"))))
        session.conf.set(prepKey(name), body)
        delegate.parsePlan(s"SELECT '$name' AS prepared")
      case Some(PrestoDialect.ExecuteStmt(name, args)) =>
        val body = session.conf.getOption(prepKey(name)).getOrElse(throw
          new IllegalArgumentException(s"prepared statement not found: $name"))
        delegate.parsePlan(PrestoDialect.transform(
          PrestoDialect.spliceParams(body, args)))
      case Some(PrestoDialect.DeallocateStmt(name)) =>
        if (session.conf.getOption(prepKey(name)).isEmpty)
          throw new IllegalArgumentException(s"prepared statement not found: $name")
        session.conf.unset(prepKey(name))
        delegate.parsePlan(s"SELECT '$name' AS deallocated")
      case Some(PrestoDialect.SetSessionStmt(rest)) =>
        // Presto quotes the value ('v'); Spark SET takes raw text after
        // `=` — strip one level of quotes and undo the '' escape.
        val unquoted = "^(.*?=\\s*)'((?:[^']|'')*)'\\s*$".r
          .replaceAllIn(rest, m => java.util.regex.Matcher.quoteReplacement(
            m.group(1) + m.group(2).replace("''", "'")))
        delegate.parsePlan("SET " + unquoted)
      case Some(PrestoDialect.ShowSessionStmt(like)) =>
        // session configuration properties as rows; LIKE evaluated by
        // Spark. Escape backslashes BEFORE quotes (conf values carry
        // regex/path strings the literal parser would reinterpret).
        def lit(s: String) = s"'${s.replace("\\", "\\\\").replace("'", "''")}'"
        val rows = session.conf.getAll.toSeq.sortBy(_._1)
          .map { case (k, v) => s"(${lit(k)}, ${lit(v)})" }
        val base = rows.mkString("SELECT * FROM VALUES ", ", ",
          " AS session(name, value)")
        delegate.parsePlan(base + like.map(p => s" WHERE name LIKE ${lit(p)}").getOrElse(""))
      case Some(PrestoDialect.ShowFunctionsStmt(like, escape)) =>
        // Registry-backed listing (the reference surfaces its function
        // metadata the same way — names, kinds, costs); the LIKE filter
        // is evaluated by Spark so %/_ and ESCAPE keep SQL semantics.
        def lit(s: String) = s"'${s.replace("'", "''")}'"
        val rows = graft.functions.Registry.fns.toSeq.sortBy(_._1).map { case (name, m) =>
          s"(${lit(name)}, ${lit(m.sparkName)}, " +
            s"${lit(if (m.isAggregate) "aggregate" else "scalar")}, " +
            s"${m.deterministic}, ${m.cost})"
        }
        val base = rows.mkString("SELECT * FROM VALUES ", ", ",
          " AS functions(function_name, spark_name, function_type, deterministic, cost)")
        val filter = like.map { p =>
          s" WHERE function_name LIKE ${lit(p)}" +
            escape.map(e => s" ESCAPE ${lit(e)}").getOrElse("")
        }.getOrElse("")
        delegate.parsePlan(base + filter)
      case Some(PrestoDialect.ShowStatsStmt(target, isQuery)) =>
        // session.sql re-enters this parser (dialect still active), so
        // the inner query gets the normal lowering exactly once.
        val df = if (isQuery) session.sql(target) else session.table(target)
        delegate.parsePlan(ShowStats.sqlFor(df))
      case Some(PrestoDialect.ExplainAnalyzeStmt(body, verbose)) =>
        delegate.parsePlan(ShowStats.explainAnalyzeSql(session.sql(body), verbose))
      case Some(PrestoDialect.DescribeStmt(name, output)) =>
        // DESCRIBE INPUT/OUTPUT over a prepared statement
        // (AstStatements.h DescribeInput/DescribeOutput): OUTPUT analyzes
        // the body (params as nulls) and lists the result columns; INPUT
        // lists `?` positions (0-based, Presto-style) — parameter types
        // are undeterminable from text, which Presto reports as unknown.
        val body = session.conf.getOption(prepKey(name)).getOrElse(throw
          new IllegalArgumentException(s"prepared statement not found: $name"))
        if (output) {
          val spliced = PrestoDialect.spliceParams(
            body, Seq.fill(PrestoDialect.paramCount(body))("null"))
          val rows = session.sql(PrestoDialect.transform(spliced)).schema.fields
            .map(f => s"('${f.name.replace("'", "''")}', '${f.dataType.sql.toLowerCase}')")
          delegate.parsePlan(rows.mkString(
            "SELECT * FROM VALUES ", ", ", " AS describe_output(column_name, type)"))
        } else {
          val n = PrestoDialect.paramCount(body)
          if (n == 0)
            delegate.parsePlan(
              "SELECT CAST(NULL AS INT) AS position, CAST(NULL AS STRING) AS type WHERE false")
          else delegate.parsePlan((0 until n).map(i => s"($i, 'unknown')").mkString(
            "SELECT * FROM VALUES ", ", ", " AS describe_input(position, type)"))
        }
      case None => delegate.parsePlan(lower(sqlText))
    }
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(lower(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(lower(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object PrestoParser {
  /** Session conf selecting the SQL dialect: "spark" (default) or
    * "presto". */
  val DialectConf = "graft.sql.dialect"
}
