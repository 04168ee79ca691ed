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

  private def litStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Run plain Spark SQL with the dialect door OFF — for handlers whose
    * inner statement would otherwise re-enter this parser and recurse
    * (SHOW TABLES → ShowTablesStmt → SHOW TABLES → …). */
  private def sparkSql(text: String): org.apache.spark.sql.DataFrame = {
    session.conf.set(PrestoParser.DialectConf, "spark")
    try session.sql(text)
    finally session.conf.set(PrestoParser.DialectConf, "presto")
  }

  /** One-column VALUES listing with an optional SQL LIKE [ESCAPE]
    * filter (SHOW TABLES/SCHEMAS/CATALOGS). */
  private def listPlan(vals: Seq[String], alias: String, col: String,
      like: Option[(String, Option[String])]): LogicalPlan = {
    val filter = like.map { case (p, esc) =>
      s" WHERE $col LIKE ${litStr(p)}" +
        esc.map(e => s" ESCAPE ${litStr(e)}").getOrElse("")
    }.getOrElse("")
    if (vals.isEmpty)
      delegate.parsePlan(s"SELECT CAST(NULL AS STRING) AS $col WHERE false")
    else delegate.parsePlan(vals.map(v => s"(${litStr(v)})").mkString(
      "SELECT * FROM VALUES ", ", ", s" AS $alias($col)") + filter)
  }

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
      case Some(PrestoDialect.ShowSessionStmt(like, escape)) =>
        // session configuration properties as rows; LIKE evaluated by
        // Spark. Escape backslashes BEFORE quotes (conf values carry
        // regex/path strings the literal parser would reinterpret).
        def lit(s: String) = s"'${s.replace("\\", "\\\\").replace("'", "''")}'"
        val rows = session.conf.getAll.toSeq.sortBy(_._1)
          .map { case (k, v) => s"(${lit(k)}, ${lit(v)})" }
        val base = rows.mkString("SELECT * FROM VALUES ", ", ",
          " AS session(name, value)")
        delegate.parsePlan(base + like.map(p =>
          s" WHERE name LIKE ${lit(p)}" +
            escape.map(e => s" ESCAPE ${lit(e)}").getOrElse("")).getOrElse(""))
      case Some(PrestoDialect.ShowFunctionsStmt(like, escape)) =>
        // Registry-backed listing (the reference surfaces its function
        // metadata the same way — names, kinds, costs); the LIKE filter
        // is evaluated by Spark so %/_ and ESCAPE keep SQL semantics.
        // escape backslashes BEFORE quotes, like ShowSession above — a
        // LIKE pattern with an escape char (e.g. '%\_%') would otherwise
        // reach Spark's literal parser as a quote escape
        def lit(s: String) = s"'${s.replace("\\", "\\\\").replace("'", "''")}'"
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
          // session.sql re-enters this parser (dialect active), which
          // transforms exactly once — pre-transforming here DOUBLE
          //-rewrote (format_datetime → date_format → presto_date_format
          // chained renames, wrong analyzed schema)
          val rows = session.sql(spliced).schema.fields
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
      case Some(PrestoDialect.CreateMatViewStmt(name, ifNotExists, comment, body)) =>
        // Materialize into a graft-mem backing table (atomic DSv2
        // commit), keep the definition, expose reads via a session temp
        // view over the backing — Presto's store-and-serve-stale
        // contract (AstStatements.h:191-236). See [[MatViews]].
        if (MatViews.exists(name)) {
          if (!ifNotExists) throw new IllegalArgumentException(
            s"materialized view already exists: $name (use IF NOT EXISTS or DROP it first)")
        } else {
          val backing = MatViews.backingFor(name)
          session.sql(s"DROP TABLE IF EXISTS $backing")
          session.sql(s"CREATE TABLE $backing AS $body")
          MatViews.register(name, backing, body, comment)
        }
        // (re)install the read path in THIS session — also heals a fresh
        // session finding a registry entry created by an earlier one.
        val v0 = MatViews.get(name).get
        session.sql(s"CREATE OR REPLACE TEMPORARY VIEW ${MatViews.readName(name)} " +
          s"AS SELECT * FROM ${v0.backing}")
        delegate.parsePlan(s"SELECT '${name.replace("'", "''")}' AS created")
      case Some(PrestoDialect.RefreshMatViewStmt(name, where)) =>
        val v = MatViews.get(name).getOrElse(throw new IllegalArgumentException(
          s"materialized view not found: $name"))
        where match {
          case Some(pred) =>
            // Predicate-scoped refresh (Presto's partition refresh,
            // PrestoSql.g4:92): delete the materialized rows matching
            // pred, recompute the definition filtered to pred. Each step
            // is one atomic graft-mem commit.
            session.sql(s"DELETE FROM ${v.backing} WHERE $pred")
            session.sql(s"INSERT INTO ${v.backing} SELECT * FROM (${v.defn}) __mv WHERE $pred")
          case None =>
            session.sql(s"TRUNCATE TABLE ${v.backing}")
            session.sql(s"INSERT INTO ${v.backing} SELECT * FROM (${v.defn}) __mv")
        }
        delegate.parsePlan(s"SELECT '${name.replace("'", "''")}' AS refreshed")
      case Some(PrestoDialect.DropMatViewStmt(name, ifExists)) =>
        MatViews.get(name) match {
          case Some(v) =>
            session.sql(s"DROP TABLE IF EXISTS ${v.backing}")
            session.catalog.dropTempView(MatViews.readName(name))
            MatViews.unregister(name)
          case None if !ifExists => throw new IllegalArgumentException(
            s"materialized view not found: $name")
          case None => ()
        }
        delegate.parsePlan(s"SELECT '${name.replace("'", "''")}' AS dropped")
      case Some(PrestoDialect.StartTransactionStmt(modes)) =>
        // Session-scoped transaction over the graft-mem connector
        // (AstStatements.h:687-719): record every table's committed
        // snapshot number now; ROLLBACK restores those snapshots (and
        // drops tables created inside the transaction), COMMIT discards
        // the record. Isolation/read-mode qualifiers parse and drop.
        if (modes.nonEmpty) {
          val ok = "(?i)\\s*((isolation\\s+level\\s+(read\\s+(uncommitted|committed)|repeatable\\s+read|serializable))|read\\s+(only|write))(\\s*,\\s*((isolation\\s+level\\s+(read\\s+(uncommitted|committed)|repeatable\\s+read|serializable))|read\\s+(only|write)))*\\s*"
          if (!modes.matches(ok)) throw new IllegalArgumentException(
            s"invalid transaction mode: $modes")
        }
        if (session.conf.getOption(PrestoParser.TxnConf).isDefined)
          throw new IllegalStateException("a transaction is already in progress " +
            "(nested transactions are not supported)")
        val record = graft.sources.MemTables.names.sorted
          .map(t => s"$t=${graft.sources.MemTables.versionCount(t)}").mkString(";")
        session.conf.set(PrestoParser.TxnConf, "txn:" + record)
        delegate.parsePlan("SELECT 'started' AS transaction")
      case Some(PrestoDialect.CommitStmt()) =>
        if (session.conf.getOption(PrestoParser.TxnConf).isEmpty)
          throw new IllegalStateException("no transaction in progress")
        session.conf.unset(PrestoParser.TxnConf)
        delegate.parsePlan("SELECT 'committed' AS transaction")
      case Some(PrestoDialect.RollbackStmt()) =>
        val rec = session.conf.getOption(PrestoParser.TxnConf).getOrElse(
          throw new IllegalStateException("no transaction in progress"))
        val recorded = rec.stripPrefix("txn:").split(";").iterator
          .filter(_.nonEmpty).map { kv =>
            val i = kv.lastIndexOf('='); (kv.substring(0, i), kv.substring(i + 1).toInt)
          }.toMap
        // restore mutated tables to their recorded snapshots; drop
        // tables born inside the transaction. A recorded table that no
        // longer exists was DROPped mid-transaction — its snapshot data
        // is gone, so claiming "rolled back" would be silent data loss:
        // fail by name instead (Presto likewise restricts DDL in
        // transactions to autocommit-capable connectors).
        recorded.keys.filterNot(graft.sources.MemTables.exists).toSeq.sorted
          .headOption.foreach { t =>
            session.conf.unset(PrestoParser.TxnConf)
            throw new IllegalStateException(
              s"rollback cannot restore table $t: it was dropped inside " +
                "the transaction (DROP TABLE is not transactional — drop " +
                "after COMMIT/ROLLBACK)")
          }
        recorded.foreach { case (t, v) =>
          if (graft.sources.MemTables.versionCount(t) > v)
            graft.sources.MemTables.restore(t, v)
        }
        graft.sources.MemTables.names
          .filterNot(recorded.contains)
          .foreach(graft.sources.MemTables.drop)
        session.conf.unset(PrestoParser.TxnConf)
        delegate.parsePlan("SELECT 'rolled back' AS transaction")
      case Some(PrestoDialect.ShowTablesStmt(from, like)) =>
        // Presto's pattern is SQL LIKE; Spark's SHOW TABLES matches by
        // glob — materialize the listing, evaluate a real LIKE.
        val names = sparkSql("SHOW TABLES" + from.map(" FROM " + _).getOrElse(""))
          .select("tableName").collect().map(_.getString(0)).sorted.toSeq
        listPlan(names, "tables", "table_name", like)
      case Some(PrestoDialect.ShowSchemasStmt(from, like)) =>
        val names = sparkSql("SHOW NAMESPACES" + from.map(" IN " + _).getOrElse(""))
          .select("namespace").collect().map(_.getString(0)).sorted.toSeq
        listPlan(names, "schemas", "schema_name", like)
      case Some(PrestoDialect.ShowCatalogsStmt(like)) =>
        val names = sparkSql("SHOW CATALOGS")
          .select("catalog").collect().map(_.getString(0)).sorted.toSeq
        listPlan(names, "catalogs", "catalog_name", like)
      case Some(PrestoDialect.ShowColumnsStmt(name)) =>
        // Presto's four-column shape (Column, Type, Extra, Comment);
        // types rendered in lowercase SQL form.
        val rows = session.table(name).schema.fields.map { f =>
          val comment = f.getComment().getOrElse("")
          s"(${litStr(f.name)}, ${litStr(f.dataType.sql.toLowerCase)}, '', ${litStr(comment)})"
        }
        delegate.parsePlan(rows.mkString("SELECT * FROM VALUES ", ", ",
          " AS columns(column_name, type, extra, comment)"))
      case Some(PrestoDialect.ResetSessionStmt(rest)) =>
        delegate.parsePlan("RESET " + rest)
      case Some(PrestoDialect.ShowCreateMatViewStmt(name)) =>
        val v = MatViews.get(name).getOrElse(throw new IllegalArgumentException(
          s"materialized view not found: $name"))
        delegate.parsePlan(
          s"SELECT '${MatViews.showCreate(v).replace("'", "''")}' AS create_matview")
      case Some(PrestoDialect.RenameSchemaStmt(from, to)) =>
        // ALTER SCHEMA ... RENAME TO (PrestoSql.g4:48): namespaces are
        // key prefixes on the graft-mem connector; Spark's session
        // catalog has no database rename, so any other target errors
        // (inside renameNamespace, with the catalog named).
        val parts = from.split("\\.")
        val ns =
          if (parts.length == 2 && parts(0).equalsIgnoreCase("graft_mem")) parts(1)
          else if (parts.length == 1) parts(0)
          else throw new UnsupportedOperationException(
            s"ALTER SCHEMA RENAME is supported on the graft_mem catalog only, got: $from")
        graft.sources.MemTables.renameNamespace(ns, to)
        delegate.parsePlan(s"SELECT ${litStr(to)} AS renamed")
      case Some(PrestoDialect.AlterViewRenameStmt(from, to, ifExists)) =>
        // Spark shares the ALTER VIEW ... RENAME TO spelling; only
        // Presto's IF EXISTS (which Spark's form lacks) is resolved here.
        if (!ifExists || session.catalog.tableExists(from))
          sparkSql(s"ALTER VIEW $from RENAME TO $to")
        delegate.parsePlan(s"SELECT ${litStr(to)} AS renamed")
      case Some(PrestoDialect.AlterFunctionStmt(name, retNullOnNull)) =>
        if (Routines.get(name).isEmpty)
          throw new IllegalArgumentException(s"function not found: $name " +
            "(only routines created via CREATE FUNCTION can be altered)")
        if (retNullOnNull) throw new UnsupportedOperationException(
          "ALTER FUNCTION ... RETURNS NULL ON NULL INPUT is not supported: " +
            "Spark SQL routines evaluate with CALLED ON NULL INPUT semantics")
        delegate.parsePlan(s"SELECT ${litStr(name)} AS altered")
      case Some(PrestoDialect.ShowCreateFunctionStmt(name)) =>
        val text = Routines.get(name).getOrElse(throw new IllegalArgumentException(
          s"function not found: $name " +
            "(SHOW CREATE FUNCTION serves routines created via CREATE FUNCTION)"))
        delegate.parsePlan(s"SELECT ${litStr(text)} AS create_function")
      case Some(PrestoDialect.SetNotNullStmt(table, column)) =>
        // direct DSv2 route: the catalog validates existing rows and
        // commits the nullability change (Spark's own ALTER COLUMN
        // refuses the nullable→non-nullable direction wholesale)
        import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
        val parts = delegate.parseMultipartIdentifier(table)
        val (catName, ns, tbl) = parts match {
          case Seq(c, n, t) => (c, n, t)
          case _ => throw new UnsupportedOperationException(
            s"ALTER COLUMN SET NOT NULL needs a catalog-qualified table " +
              s"(catalog.schema.table), got: $table")
        }
        val cat = session.sessionState.catalogManager.catalog(catName) match {
          case t: TableCatalog => t
          case _ => throw new UnsupportedOperationException(
            s"catalog $catName does not support ALTER TABLE")
        }
        cat.alterTable(Identifier.of(Array(ns), tbl),
          TableChange.updateColumnNullability(Array(column), false))
        delegate.parsePlan(s"SELECT ${litStr(column)} AS altered")
      case Some(PrestoDialect.AddConstraintStmt(table, cname, spec)) =>
        // table must resolve (errors with Spark's own message if not);
        // the constraint is recorded metadata — see [[Constraints]]
        session.table(table)
        val n = Constraints.add(table, cname, spec)
        delegate.parsePlan(s"SELECT ${litStr(n)} AS added_constraint")
      case Some(PrestoDialect.DropConstraintStmt(table, cname, ifExists)) =>
        session.table(table)
        if (!Constraints.drop(table, cname) && !ifExists)
          throw new IllegalArgumentException(
            s"constraint not found: $cname on $table")
        delegate.parsePlan(s"SELECT ${litStr(cname)} AS dropped_constraint")
      case Some(PrestoDialect.ShowCreateTableStmt(name)) =>
        val base = sparkSql(s"SHOW CREATE TABLE $name").head().getString(0)
        val cons = Constraints.list(name)
        val text =
          if (cons.isEmpty) base
          else base + "\n" + cons.map { case (n, s) =>
            s"ALTER TABLE $name ADD CONSTRAINT $n $s;" }.mkString("\n")
        delegate.parsePlan(s"SELECT ${litStr(text)} AS createtab_stmt")
      case Some(PrestoDialect.CreateTypeStmt(name, typeText)) =>
        // CREATE TYPE (PrestoSql.g4:80-82): expand references to
        // already-registered named types NOW, so registry values are
        // always fully expanded and the substitution pass is one-shot.
        UserTypes.record(name, PrestoDialect.expandUserTypes(typeText))
        delegate.parsePlan(s"SELECT ${litStr(name)} AS created_type")
      case Some(PrestoDialect.CreateTableLikeStmt(prefix, elements, suffix)) =>
        // CREATE TABLE (…, LIKE s, …): each LIKE element expands to the
        // source table's column definitions (Spark DDL text), then the
        // reassembled statement takes the normal lowering.
        val expanded = elements.map { el =>
          PrestoDialect.likeElement(el) match {
            case Some(src) =>
              session.table(src).schema.fields.map(_.toDDL).mkString(", ")
            case None => el
          }
        }
        delegate.parsePlan(lower(
          s"$prefix (${expanded.mkString(", ")})" +
            (if (suffix.nonEmpty) s" $suffix" else "")))
      case None =>
        val plan = delegate.parsePlan(lower(sqlText))
        // record routine DDL for SHOW CREATE FUNCTION / ALTER FUNCTION
        PrestoDialect.createFunctionName(sqlText)
          .foreach(n => Routines.record(n, sqlText))
        PrestoDialect.dropFunctionName(sqlText).foreach(Routines.drop)
        plan
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
  /** Session conf holding the active transaction's snapshot record
    * (`txn:table=version;…`) — present iff a transaction is open. */
  val TxnConf = "graft.txn.snapshot"
}
