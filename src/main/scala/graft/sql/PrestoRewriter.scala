package graft.sql

import graft.Catalog
import graft.functions.Registry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Presto-dialect SQL entry: a light pre-rewriter lowering Presto-isms to
  * Spark SQL, then Catalyst takes over — the Spark rendering of the
  * reference's SQL front door (axiom/sql/presto grammar +
  * PrestoParser.cpp lowering onto the logical plan; SURVEY §3.1/§7.2
  * step 4: "run through Spark SQL with a small pre-rewriter for
  * Presto-isms").
  *
  * Spark SQL already accepts most of the reference's tested subset
  * (TIMESTAMP/DATE/INTERVAL literals, EXTRACT, LIKE, BETWEEN, IN, CASE,
  * ||-concat, lambdas `x -> expr`); what differs is function NAMES — the
  * registry's translation table (graft.functions.Registry, mirroring
  * FunctionRegistry.h canonical names) — plus double-quoted identifiers.
  */
object PrestoRewriter {

  /** Function renames applied at the SQL text level. Only names that
    * differ between the dialects (identity entries skipped). Applied in
    * ONE alternation pass: sequential per-name replacement would CHAIN
    * renames whose target is itself a renamed source (format_datetime →
    * date_format → presto_date_format would route Java patterns into the
    * MySQL converter). */
  private val renameMap: Map[String, String] =
    Registry.fns.collect {
      case (presto, m) if m.sparkName != presto => presto -> m.sparkName
    }
  private val renamePattern =
    ("(?i)\\b(" + renameMap.keys.toSeq.sortBy(-_.length).mkString("|") + ")\\s*\\(").r

  /** Split SQL into string-literal and non-literal segments so rewrites
    * never touch quoted text. */
  private def segments(sql: String): Seq[(String, Boolean)] = {
    val out = Seq.newBuilder[(String, Boolean)]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr && c == '\'') {
        out += ((cur.toString, false)); cur.clear(); cur.append(c); inStr = true
      } else if (inStr && c == '\'') {
        // '' escape stays inside the literal
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') { cur.append("''"); i += 1 }
        else { cur.append(c); out += ((cur.toString, true)); cur.clear(); inStr = false }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += ((cur.toString, inStr))
    out.result()
  }

  /** Rewrite Presto SQL text into Spark SQL text. */
  def rewrite(sql: String): String = {
    // Arg-transform rewrite that must see across the quote boundary:
    // Presto date_diff('unit', a, b) → timestampdiff(UNIT, a, b). Spark's
    // PARSER owns the name `date_diff` (grammar production demanding an
    // unquoted unit), so the injected 3-arg function can never receive it
    // from SQL text — the unit literal itself has to be rewritten.
    val pre = sql.replaceAll(
      "(?i)\\bdate_diff\\s*\\(\\s*'(year|quarter|month|week|day|hour|minute|second|millisecond|microsecond)'\\s*,",
      "timestampdiff($1,")
    segments(pre).map {
      case (lit, true) => lit
      case (code, false) =>
        var s = code
        // double-quoted identifiers → backticks
        s = s.replaceAll("\"([A-Za-z_][A-Za-z0-9_]*)\"", "`$1`")
        // function renames (word boundary, immediately before a paren),
        // every name substituted exactly once
        s = renamePattern.replaceAllIn(s,
          m => java.util.regex.Matcher.quoteReplacement(
            renameMap(m.group(1).toLowerCase) + "("))
        s
    }.mkString
  }

  /** Parse-and-run a Presto-dialect statement over the catalog tables.
    *
    * The RAW Presto text goes to spark.sql: the injected dialect parser
    * ([[PrestoParser]], via spark.sql.extensions) sees
    * `graft.sql.dialect=presto` and applies the full
    * [[PrestoDialect.transform]] lowering (structural constructs + the
    * rename pass above) before delegating to Spark's parser. Parsing and
    * analysis happen eagerly inside spark.sql, so restoring the conf
    * after the call is safe. */
  def sql(spark: SparkSession, sfDir: String, prestoSql: String): DataFrame = {
    Catalog.registerAll(spark, sfDir)
    val prev = spark.conf.getOption(PrestoParser.DialectConf)
    spark.conf.set(PrestoParser.DialectConf, "presto")
    try spark.sql(prestoSql)
    finally prev match {
      case Some(v) => spark.conf.set(PrestoParser.DialectConf, v)
      case None => spark.conf.unset(PrestoParser.DialectConf)
    }
  }
}
