package graft

import graft.sql.{PrestoDialect, PrestoParser, PrestoRewriter}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The structural Presto front door: PrestoDialect token transforms +
  * the injected PrestoParser (spark.sql.extensions), checked both at the
  * text level and end-to-end against DataFrame-API equivalents. */
class PrestoDialectSpec extends SparkSpec {

  private def t(sql: String): String = PrestoDialect.transform(sql)
  private def presto(sql: String): DataFrame = PrestoRewriter.sql(spark, sfDir, sql)

  // ------------------------------------------------------------- text
  test("string literals and comments are never rewritten") {
    val in = "SELECT 'TRY(x) ARRAY[1] \"q\" AT TIME ZONE' AS s -- TRY(ARRAY[)\nFROM t"
    val out = t(in)
    assert(out.contains("'TRY(x) ARRAY[1] \"q\" AT TIME ZONE'"))
    assert(!out.contains("graft_try"))
  }

  test("TRY only rewrites call positions; try_cast untouched") {
    assert(t("SELECT TRY(1/0), try_cast('x' AS INT) FROM t")
      === "SELECT graft_try(1/0), try_cast('x' AS INT) FROM t")
    assert(t("SELECT a.try FROM t") === "SELECT a.try FROM t")
  }

  test("nested ARRAY brackets and subscripts") {
    // subscripts lower to element_at — Presto subscripts are 1-BASED on
    // arrays (Spark's bracket is 0-based) and key lookups on maps
    assert(t("SELECT ARRAY[ARRAY[1, 2], ARRAY[x[1]]] FROM t")
      === "SELECT ARRAY(ARRAY(1, 2), ARRAY(element_at(x, 1))) FROM t")
    // chained subscripts nest; postfix-call bases capture whole calls
    assert(t("SELECT a[1][2], f(x)[3] FROM t")
      === "SELECT element_at(element_at(a, 1), 2), element_at(f(x), 3) FROM t")
  }

  test("subscript semantics through the SQL door: 1-based arrays, map keys") {
    val r = presto(
      "SELECT ARRAY[10, 20, 30][1] AS first, MAP(ARRAY[5], ARRAY['v'])[5] AS mv").head()
    assert(r.getInt(0) == 10)
    assert(r.getString(1) == "v")
  }

  test("ROW constructor vs ROW type position") {
    val out = t("SELECT CAST(ROW(a, b) AS ROW(x BIGINT, y ARRAY(VARCHAR))) FROM t")
    assert(out === "SELECT CAST(struct(a, b) AS STRUCT<x: BIGINT, y: ARRAY<STRING>>) FROM t")
  }

  test("type conversion: MAP, nested ROW, varchar(n), double precision, timestamp with time zone") {
    assert(t("SELECT CAST(x AS MAP(VARCHAR, ROW(a DOUBLE PRECISION, b VARCHAR(12), c TIMESTAMP WITH TIME ZONE))) FROM t")
      === "SELECT CAST(x AS MAP<STRING, STRUCT<a: DOUBLE, b: VARCHAR(12), c: TIMESTAMP>>) FROM t")
    // already-Spark type text passes through unchanged
    assert(t("SELECT CAST(a AS STRUCT<x: INT>) FROM t")
      === "SELECT CAST(a AS STRUCT<x: INT>) FROM t")
  }

  test("AT TIME ZONE captures function-call and dotted operands") {
    assert(t("SELECT max(ts) AT TIME ZONE 'Asia/Tokyo' FROM t")
      === "SELECT convert_timezone('UTC', 'Asia/Tokyo', cast(max(ts) as timestamp_ntz)) FROM t")
    assert(t("SELECT o.ts AT TIME ZONE 'UTC' FROM t o")
      === "SELECT convert_timezone('UTC', 'UTC', cast(o.ts as timestamp_ntz)) FROM t o")
  }

  test("UNNEST join lowers to LATERAL VIEW at end of the same FROM scope") {
    val out = t("SELECT doc_id, w FROM documents CROSS JOIN UNNEST(split(text, ' ')) AS u(w) WHERE doc_id < 5")
    assert(out.contains("LATERAL VIEW EXPLODE(presto_split(text, ' ')) u AS w WHERE"))
    // subquery scoping: the lateral view stays inside the derived table
    val sub = t("SELECT n FROM (SELECT doc_id, w FROM documents CROSS JOIN UNNEST(a) u(w) GROUP BY 1, 2) z")
    assert(sub.contains("LATERAL VIEW EXPLODE(a) u AS w GROUP BY 1, 2) z"))
  }

  test("LEFT JOIN UNNEST ON TRUE becomes LATERAL VIEW OUTER") {
    val out = t("SELECT doc_id, w FROM documents LEFT JOIN UNNEST(a) AS u(w) ON TRUE")
    assert(out.contains("LATERAL VIEW OUTER EXPLODE(a) u AS w"))
  }

  // ------------------------------------------------------------ engine
  test("FROM-UNNEST equals DataFrame explode") {
    val viaSql = presto(
      "SELECT doc_id, w FROM documents CROSS JOIN UNNEST(split(trim(text), ' ')) AS u(w) WHERE doc_id < 20")
    val viaDf = tables.documents.filter(col("doc_id") < 20)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("UNNEST WITH ORDINALITY is 1-based BIGINT") {
    val df = presto(
      "SELECT doc_id, w, ord FROM documents CROSS JOIN UNNEST(split(trim(text), ' ')) WITH ORDINALITY AS u(w, ord) WHERE doc_id = 3")
    assert(df.schema("ord").dataType.typeName === "long")
    val words = df.orderBy("ord").collect()
    assert(words.head.getLong(2) === 1L)
    assert(words.map(_.getLong(2)).toSeq === (1L to words.length).toSeq)
  }

  test("multi-collection UNNEST null-pads the shorter one; empty drops row; OUTER keeps it") {
    spark.sql("SELECT 1 AS id, array(10, 20, 30) AS a, array('x') AS b")
      .createOrReplaceTempView("uz")
    val zipped = presto("SELECT id, x, y FROM uz CROSS JOIN UNNEST(a, b) AS u(x, y)")
      .orderBy("x").collect()
    assert(zipped.length === 3)
    assert(zipped.map(r => (r.getInt(1), if (r.isNullAt(2)) null else r.getString(2))).toSeq
      === Seq((10, "x"), (20, null), (30, null)))
    spark.sql("SELECT 1 AS id, array() AS a UNION ALL SELECT 2, array('k')")
      .createOrReplaceTempView("ue")
    assert(presto("SELECT id, x FROM ue CROSS JOIN UNNEST(a) AS u(x)").count() === 1)
    val outer = presto("SELECT id, x FROM ue LEFT JOIN UNNEST(a) AS u(x) ON TRUE")
    assert(outer.count() === 2)
    assert(outer.filter(col("x").isNull).select("id").head().getInt(0) === 1)
  }

  test("round-17 dialect review: map UNNEST ordinality, chained AT TIME ZONE, alias/type scoping, compound quantified operand") {
    // single map + WITH ORDINALITY: posexplode path — the positional
    // try_element_at form was a KEY lookup on maps (silently wrong)
    spark.sql("SELECT map(5, 'a', 7, 'b') AS m").createOrReplaceTempView("um_ord")
    val rows = presto(
      "SELECT k, v, ord FROM um_ord CROSS JOIN UNNEST(m) WITH ORDINALITY AS u(k, v, ord)")
      .orderBy("ord").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      === Seq((5, "a", 1L), (7, "b", 2L)))
    // chained AT TIME ZONE nests instead of producing overlapping edits
    val atz = t("SELECT ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' FROM t")
    assert(atz.contains("convert_timezone('UTC', 'America/New_York', " +
      "cast(convert_timezone('UTC', 'UTC', cast(ts as timestamp_ntz))"), atz)
    // bare-type rewrite is scoped to DDL: an alias named json/varchar
    // in a query statement keeps its name
    assert(presto("SELECT 1 AS json").schema.fieldNames.head === "json")
    assert(presto("SELECT 1 AS varchar").schema.fieldNames.head === "varchar")
    // compound quantified left operand fails by name, not silently wrong
    val e = intercept[Exception](t(
      "SELECT o_orderkey + 1 > ALL (SELECT 0) FROM orders"))
    assert(e.getMessage.contains("compound left operand"), e.getMessage)
    // parenthesized workaround transforms fine
    assert(t("SELECT (o_orderkey + 1) > ALL (SELECT 0) FROM orders")
      .contains("CASE"))
  }

  test("TRY returns null on runtime error, value otherwise") {
    val r = presto("SELECT TRY(CAST('12' AS INTEGER)) AS ok, TRY(CAST('xy' AS INTEGER)) AS bad " +
      "FROM orders WHERE o_orderkey = 1").head()
    assert(r.getInt(0) === 12)
    assert(r.isNullAt(1))
  }

  test("ROW cast + dereference and ARRAY constructor") {
    val r = presto("SELECT CAST(ROW(1, 2.5) AS ROW(a BIGINT, b DOUBLE)).b AS v, " +
      "cardinality(ARRAY[1, 2, 3]) AS n FROM orders WHERE o_orderkey = 1").head()
    assert(r.getDouble(0) === 2.5)
    assert(r.getInt(1) === 3)
  }

  test("dialect conf gates the transform: spark dialect text is untouched") {
    // TRY( would be rewritten under presto dialect; without the conf the
    // parser must pass text through (and Spark then rejects unknown TRY).
    assertThrows[Exception](spark.sql("SELECT TRY(1/0)").collect())
    assert(spark.conf.getOption(PrestoParser.DialectConf).isEmpty)
  }

  test("INSERT INTO graft_mem flows the DSv2 write lifecycle and reads back") {
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_sink")
    presto("CREATE TABLE graft_mem.default.spec_sink (k BIGINT, v VARCHAR)")
    presto("INSERT INTO graft_mem.default.spec_sink SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 10")
    val n = spark.table("graft_mem.default.spec_sink").count()
    assert(n === spark.table("orders").filter(col("o_orderkey") < 10).count())
    // append (no truncate) accumulates
    presto("INSERT INTO graft_mem.default.spec_sink SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 10")
    assert(spark.table("graft_mem.default.spec_sink").count() === 2 * n)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_sink")
  }

  test("CTAS through the presto door") {
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_ctas")
    presto("CREATE TABLE graft_mem.default.spec_ctas AS SELECT o_orderkey, ARRAY[o_orderkey] AS a FROM orders WHERE o_orderkey < 5")
    val df = spark.table("graft_mem.default.spec_ctas")
    assert(df.count() > 0)
    assert(df.schema("a").dataType.typeName === "array")
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_ctas")
  }

  test("EXPLAIN (TYPE ...) options lower to Spark explain modes") {
    def low(s: String) = graft.sql.PrestoDialect.transform(s)
    assert(low("EXPLAIN (TYPE DISTRIBUTED) SELECT 1") == "EXPLAIN FORMATTED SELECT 1")
    assert(low("EXPLAIN (TYPE LOGICAL) SELECT 1") == "EXPLAIN EXTENDED SELECT 1")
    assert(low("EXPLAIN (TYPE IO, FORMAT JSON) SELECT 1") == "EXPLAIN COST SELECT 1")
    assert(low("EXPLAIN (TYPE VALIDATE) SELECT 1") == "EXPLAIN SELECT 1")
    // a parenthesized query is NOT an options list
    assert(low("EXPLAIN (SELECT 1)") == "EXPLAIN (SELECT 1)")
    // end-to-end: the distributed form returns a formatted physical plan
    val rows = presto("EXPLAIN (TYPE DISTRIBUTED) SELECT count(*) FROM orders")
      .collect().map(_.getString(0)).mkString("\n")
    assert(rows.contains("Physical Plan"), rows.take(200))
  }

  test("DELETE/UPDATE statements compose with dialect constructs") {
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_dml")
    presto("CREATE TABLE graft_mem.default.spec_dml (k BIGINT, tag VARCHAR)")
    presto("INSERT INTO graft_mem.default.spec_dml VALUES (1,'x1'),(2,'y2'),(3,'x3'),(4,'oops')")
    // dialect TRY + cardinality(ARRAY[..]) inside a DELETE predicate
    presto("""DELETE FROM graft_mem.default.spec_dml
              WHERE TRY(CAST(substr(tag, 2, 1) AS INTEGER)) IS NULL""")
    def snap() = spark.table("graft_mem.default.spec_dml").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap() == Set((1L, "x1"), (2L, "y2"), (3L, "x3")), snap())
    // '||' concat and a dialect function in an UPDATE SET expression
    presto("""UPDATE graft_mem.default.spec_dml
              SET tag = tag || CAST(cardinality(ARRAY[k, k]) AS VARCHAR)
              WHERE k = 2""")
    assert(snap() == Set((1L, "x1"), (2L, "y22"), (3L, "x3")), snap())
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_dml")
  }

  test("ANALYZE lowers to COMPUTE STATISTICS and feeds the CBO") {
    // text level: bare, dotted + quoted, and WITH-properties forms
    assert(t("ANALYZE t") == "ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(t("""ANALYZE db."my table"""")
      == "ANALYZE TABLE db.`my table` COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(t("ANALYZE a.b WITH (partitions = ARRAY['p'])")
      == "ANALYZE TABLE a.b COMPUTE STATISTICS FOR ALL COLUMNS")
    // EXPLAIN ANALYZE must stay untouched (executes in Presto)
    assert(t("EXPLAIN ANALYZE SELECT 1") == "EXPLAIN ANALYZE SELECT 1")
    // Spark's OWN ANALYZE TABLE/TABLES forms must pass through — the
    // dialect door accepts native Spark statements too, and rewriting
    // them would corrupt valid syntax into a double-keyword parse error.
    assert(t("ANALYZE TABLE t COMPUTE STATISTICS")
      == "ANALYZE TABLE t COMPUTE STATISTICS")
    assert(t("ANALYZE TABLES IN db COMPUTE STATISTICS")
      == "ANALYZE TABLES IN db COMPUTE STATISTICS")
    // non-Analyze trailing syntax passes through for the real parser
    assert(t("ANALYZE t COMPUTE STATISTICS") == "ANALYZE t COMPUTE STATISTICS")
    // end-to-end: the gathered catalog stats reach the optimizer (CBO)
    presto("DROP TABLE IF EXISTS spec_analyze_t")
    presto("CREATE TABLE spec_analyze_t AS SELECT o_orderkey FROM orders WHERE o_orderkey < 100")
    presto("ANALYZE spec_analyze_t")
    val expected = spark.table("spec_analyze_t").count()
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("spec_analyze_t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)),
        s"CBO row count ${stats.rowCount} != analyzed $expected")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    presto("DROP TABLE IF EXISTS spec_analyze_t")
  }

  test("SHOW COLUMNS and DESCRIBE survive the dialect passes") {
    // Presto's ShowColumns (AstStatements.h:721) and DescribeTable parse
    // natively in Spark; these pin that the lowering passes leave the
    // statements untouched end-to-end. Transactions and CALL have no
    // Spark analogue and are documented out of scope (README).
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_show")
    presto("CREATE TABLE graft_mem.default.spec_show (k BIGINT, tag VARCHAR)")
    val shown = presto("SHOW COLUMNS FROM graft_mem.default.spec_show")
      .collect().map(_.getString(0)).toSet
    assert(shown == Set("k", "tag"), shown)
    val described = presto("DESCRIBE graft_mem.default.spec_show")
      .select("col_name").collect().map(_.getString(0)).toSet
    assert(Set("k", "tag").subsetOf(described), described)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_show")
  }

  test("CREATE VIEW drops the Presto SECURITY clause and lowers the body") {
    // Presto CreateView (AstStatements.h:143-189) carries a SECURITY
    // DEFINER|INVOKER mode Spark's parser rejects; the dialect drops it
    // (Spark views always run as the querying session — INVOKER
    // semantics) while the view BODY still lowers through the dialect
    // (TRY + ARRAY[..] here). DROP VIEW passes through natively.
    presto("DROP VIEW IF EXISTS spec_sec_view")
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_sec_base")
    presto("CREATE TABLE graft_mem.default.spec_sec_base (k BIGINT, tag VARCHAR)")
    presto("INSERT INTO graft_mem.default.spec_sec_base VALUES (1, 'P7'), (2, 'xx')")
    // Body constructs must lower to PERSISTENT functions: TRY would
    // lower to the session-temporary graft_try, which Spark forbids
    // inside a persistent view — ARRAY[..]/cardinality lower to
    // built-ins (array/size) and prove the body passes run.
    presto("""CREATE VIEW spec_sec_view SECURITY DEFINER AS
              SELECT k, TRY_CAST(substr(tag, 2, 1) AS INTEGER) AS d,
                     cardinality(ARRAY[k, k]) AS two
              FROM graft_mem.default.spec_sec_base""")
    val rows = presto("SELECT count(*) AS n, min(two) AS t FROM spec_sec_view").collect()
    assert(rows.head.getLong(0) == 2L && rows.head.getInt(1) == 2, rows.toSeq)
    // OR REPLACE + INVOKER variant replaces the same view.
    presto("""CREATE OR REPLACE VIEW spec_sec_view SECURITY INVOKER AS
              SELECT k FROM graft_mem.default.spec_sec_base WHERE k < 2""")
    assert(presto("SELECT * FROM spec_sec_view").columns.toSeq == Seq("k"))
    presto("DROP VIEW IF EXISTS spec_sec_view")
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_sec_base")
  }

  test("CREATE SCHEMA drops Presto WITH properties; bare form passes through") {
    assert(t("CREATE SCHEMA IF NOT EXISTS ps_x WITH (location = '/tmp/x', owner = 'a')").trim
      === "CREATE SCHEMA IF NOT EXISTS ps_x")
    assert(t("CREATE SCHEMA plain_s") === "CREATE SCHEMA plain_s")
    presto("CREATE SCHEMA IF NOT EXISTS spec_presto_schema WITH (location = '/tmp/nope')")
    assert(spark.catalog.databaseExists("spec_presto_schema"),
      "CREATE SCHEMA through the dialect door must land in the catalog")
    presto("DROP SCHEMA spec_presto_schema")
  }

  test("materialized views: create/stale-serve/refresh-where/drop lifecycle") {
    // AstStatements.h:191-236, PrestoSql.g4:88-92 — real semantics on
    // graft-mem storage, not a virtual-view degrade (sql/MatViews.scala).
    presto("DROP MATERIALIZED VIEW IF EXISTS spec_mv")
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_mv_base")
    presto("""CREATE TABLE graft_mem.default.spec_mv_base AS
              SELECT n_regionkey AS r, n_nationkey AS k FROM nation""")
    presto("""CREATE MATERIALIZED VIEW spec_mv
              COMMENT 'nations per region'
              WITH (format = 'memory') AS
              (SELECT r, CAST(count(*) AS BIGINT) AS n
               FROM graft_mem.default.spec_mv_base GROUP BY r)""")
    def rows() = presto("SELECT r, n FROM spec_mv ORDER BY r")
      .collect().map(x => (x.getAs[Number](0).longValue, x.getLong(1))).toSeq
    val fresh = rows()
    assert(fresh.map(_._2).sum == 25, s"initial build must see all 25 nations: $fresh")
    // base mutates; the MV serves the STORED (stale) result
    presto("INSERT INTO graft_mem.default.spec_mv_base VALUES (0, 100), (1, 101)")
    assert(rows() == fresh, "MV must serve stored rows until refreshed")
    // predicate-scoped refresh recomputes ONLY the matching slice
    presto("REFRESH MATERIALIZED VIEW spec_mv WHERE r = 0")
    val partial = rows()
    assert(partial.find(_._1 == 0).get._2 == fresh.find(_._1 == 0).get._2 + 1,
      s"r=0 must be recomputed: $partial")
    assert(partial.find(_._1 == 1).get._2 == fresh.find(_._1 == 1).get._2,
      s"r=1 must stay stale after a WHERE r = 0 refresh: $partial")
    // WHERE-less refresh (graft extension): full rebuild
    presto("REFRESH MATERIALIZED VIEW spec_mv")
    val full = rows()
    assert(full.map(_._2).sum == 27, s"full refresh must see 27 rows: $full")
    // SHOW CREATE round-trips the definition text
    val create = presto("SHOW CREATE MATERIALIZED VIEW spec_mv").head().getString(0)
    assert(create.contains("CREATE MATERIALIZED VIEW spec_mv") &&
      create.contains("nations per region") && create.contains("GROUP BY r"), create)
    // IF NOT EXISTS: no-op on an existing view; bare CREATE: loud error
    presto("CREATE MATERIALIZED VIEW IF NOT EXISTS spec_mv AS SELECT 1 AS x")
    assert(rows() == full, "IF NOT EXISTS on an existing MV must not rebuild")
    val dup = intercept[IllegalArgumentException] {
      presto("CREATE MATERIALIZED VIEW spec_mv AS SELECT 1 AS x")
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    // DROP removes view + backing; refresh/show/drop then fail loudly
    presto("DROP MATERIALIZED VIEW spec_mv")
    val gone = intercept[IllegalArgumentException] {
      presto("REFRESH MATERIALIZED VIEW spec_mv WHERE r = 0")
    }
    assert(gone.getMessage.contains("not found"), gone.getMessage)
    presto("DROP MATERIALIZED VIEW IF EXISTS spec_mv") // idempotent
    val dropGone = intercept[IllegalArgumentException] {
      presto("DROP MATERIALIZED VIEW spec_mv")
    }
    assert(dropGone.getMessage.contains("not found"), dropGone.getMessage)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_mv_base")
  }

  test("transactions on graft-mem: rollback restores snapshots, commit keeps") {
    // PrestoSql.g4:151-153 / AstStatements.h:687-719. Transactional
    // scope is the graft-mem connector; rollback = snapshot restore +
    // drop of tables born inside the transaction.
    spark.conf.unset(graft.sql.PrestoParser.TxnConf)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_txn")
    presto("""CREATE TABLE graft_mem.default.spec_txn AS
              SELECT n_nationkey AS k FROM nation""")
    def n() = presto("SELECT CAST(count(*) AS BIGINT) AS n FROM graft_mem.default.spec_txn")
      .head().getLong(0)
    assert(n() == 25)
    // errors: commit/rollback without a txn; nested txn; bad mode
    val noTxn = intercept[IllegalStateException] { presto("COMMIT") }
    assert(noTxn.getMessage.contains("no transaction"), noTxn.getMessage)
    val badMode = intercept[IllegalArgumentException] {
      presto("START TRANSACTION ISOLATION LEVEL SNAPSHOT")
    }
    assert(badMode.getMessage.contains("invalid transaction mode"), badMode.getMessage)
    presto("START TRANSACTION ISOLATION LEVEL SERIALIZABLE, READ WRITE")
    val nested = intercept[IllegalStateException] { presto("START TRANSACTION") }
    assert(nested.getMessage.contains("already in progress"), nested.getMessage)
    // mutations + a table born inside the transaction
    presto("INSERT INTO graft_mem.default.spec_txn VALUES (100), (101)")
    presto("DELETE FROM graft_mem.default.spec_txn WHERE k < 5")
    presto("CREATE TABLE graft_mem.default.spec_txn_born AS SELECT 1 AS x")
    assert(n() == 22, "statements inside the txn are visible (read-your-writes)")
    presto("ROLLBACK WORK")
    assert(n() == 25, "rollback must restore the pre-transaction snapshot")
    assert(!graft.sources.MemTables.exists("default.spec_txn_born"),
      "tables created inside a rolled-back transaction must be dropped")
    // and time travel still reads ACROSS the rollback (restore is a commit)
    val versions = graft.sources.MemTables.versionCount("default.spec_txn")
    val atRolledBack = presto(
      s"SELECT count(*) FROM graft_mem.default.spec_txn FOR VERSION AS OF ${versions - 1}")
      .head().getLong(0)
    assert(atRolledBack == 22, "history must retain the rolled-back state")
    // commit path
    presto("START TRANSACTION")
    presto("DELETE FROM graft_mem.default.spec_txn WHERE k >= 20")
    presto("COMMIT")
    assert(n() == 20, "committed work survives")
    val after = intercept[IllegalStateException] { presto("ROLLBACK") }
    assert(after.getMessage.contains("no transaction"), after.getMessage)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_txn")
    // DROP TABLE mid-transaction: the snapshot data is gone, so the
    // rollback fails BY NAME instead of claiming success while losing
    // the table (round-17 review)
    presto("CREATE TABLE graft_mem.default.spec_txn_drop AS SELECT 1 AS k")
    presto("START TRANSACTION")
    presto("DROP TABLE graft_mem.default.spec_txn_drop")
    val dropped = intercept[IllegalStateException] { presto("ROLLBACK") }
    assert(dropped.getMessage.contains("dropped inside the transaction"),
      dropped.getMessage)
  }

  test("SHOW TABLES/SCHEMAS/CATALOGS with SQL LIKE; SHOW COLUMNS; RESET SESSION") {
    // PrestoSql.g4:131-137,150. Presto's pattern language is SQL LIKE
    // (%, _, ESCAPE) — Spark's SHOW TABLES matches by glob, so the
    // dialect materializes the listing and evaluates a real LIKE.
    presto("DROP TABLE IF EXISTS graft_mem.default.shtb_one")
    presto("DROP TABLE IF EXISTS graft_mem.default.shtb_two")
    presto("CREATE TABLE graft_mem.default.shtb_one AS SELECT 1 AS x")
    presto("CREATE TABLE graft_mem.default.shtb_two AS SELECT 'a' AS y, 2 AS z")
    val tabs = presto("SHOW TABLES FROM graft_mem.default LIKE 'shtb!_%' ESCAPE '!'")
      .collect().map(_.getString(0)).toSet
    assert(tabs == Set("shtb_one", "shtb_two"), tabs.toString)
    // the single-char wildcard _ — inexpressible as a Spark glob
    val underscore = presto("SHOW TABLES FROM graft_mem.default LIKE 'shtb_on_'")
      .collect().map(_.getString(0)).toSeq
    assert(underscore == Seq("shtb_one"), underscore.toString)
    // Spark lists only INSTANTIATED catalogs — touch graft_tpch first
    // so the assertion is order-independent across suite runs
    spark.table("graft_tpch.tiny.region").count()
    val cats = presto("SHOW CATALOGS").collect().map(_.getString(0)).toSet
    assert(cats.contains("graft_mem") && cats.contains("spark_catalog"), cats.toString)
    assert(presto("SHOW CATALOGS LIKE 'graft%'").collect().map(_.getString(0)).toSet
      == Set("graft_mem", "graft_tpch"))
    val schemas = presto("SHOW SCHEMAS FROM graft_mem").collect().map(_.getString(0)).toSet
    assert(schemas.contains("default"), schemas.toString)
    // Presto's 4-column SHOW COLUMNS shape
    val cols = presto("SHOW COLUMNS FROM graft_mem.default.shtb_two")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq(("y", "string"), ("z", "int")), cols.toString)
    assert(presto("SHOW COLUMNS FROM graft_mem.default.shtb_two").columns.toSeq
      == Seq("column_name", "type", "extra", "comment"))
    // RESET SESSION k → Spark RESET k
    presto("SET SESSION graft.spec.reset_probe = 'v1'")
    assert(spark.conf.get("graft.spec.reset_probe") == "v1")
    presto("RESET SESSION graft.spec.reset_probe")
    assert(spark.conf.getOption("graft.spec.reset_probe").isEmpty,
      "RESET SESSION must unset the session property")
    presto("DROP TABLE IF EXISTS graft_mem.default.shtb_one")
    presto("DROP TABLE IF EXISTS graft_mem.default.shtb_two")
  }

  test("ALTER TABLE on graft-mem: add/rename/drop column, rename table, time travel across") {
    // PrestoSql.g4:50-57 — schema evolution as committed mutations;
    // history keeps the pre-alter shape readable (MemCatalog.alterTable).
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_alt")
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_alt2")
    presto("""CREATE TABLE graft_mem.default.spec_alt AS
              SELECT n_nationkey AS k, n_name AS name FROM nation""")
    presto("ALTER TABLE graft_mem.default.spec_alt ADD COLUMN score DOUBLE")
    val afterAdd = presto("SELECT k, name, score FROM graft_mem.default.spec_alt WHERE k = 0").head()
    assert(afterAdd.isNullAt(2), "added column must be null-filled")
    presto("ALTER TABLE graft_mem.default.spec_alt RENAME COLUMN name TO nation_name")
    presto("ALTER TABLE graft_mem.default.spec_alt DROP COLUMN score")
    val cols = presto("SELECT * FROM graft_mem.default.spec_alt").columns.toSeq
    assert(cols == Seq("k", "nation_name"), cols.toString)
    // the pre-alter shape is still readable via time travel (v2 = CTAS)
    val old = presto(
      "SELECT * FROM graft_mem.default.spec_alt FOR VERSION AS OF 2").columns.toSeq
    assert(old == Seq("k", "name"), old.toString)
    presto("ALTER TABLE graft_mem.default.spec_alt RENAME TO graft_mem.default.spec_alt2")
    assert(!graft.sources.MemTables.exists("default.spec_alt"))
    assert(presto("SELECT count(*) FROM graft_mem.default.spec_alt2").head().getLong(0) == 25)
    // errors: duplicate add, unknown drop
    val dup = intercept[Exception] {
      presto("ALTER TABLE graft_mem.default.spec_alt2 ADD COLUMN k INT")
    }
    assert(dup.getMessage.toLowerCase.contains("exists"), dup.getMessage)
    val missing = intercept[Exception] {
      presto("ALTER TABLE graft_mem.default.spec_alt2 DROP COLUMN nope")
    }
    assert(missing.getMessage.toLowerCase.contains("nope") ||
      missing.getMessage.toLowerCase.contains("missing") ||
      missing.getMessage.toLowerCase.contains("no such"), missing.getMessage)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_alt2")
  }

  test("CALL procedures: rollback_to_version / snapshots / expire_history") {
    // Presto CALL (PrestoSql.g4:101) through Spark 4's DSv2
    // ProcedureCatalog — snapshot maintenance over graft-mem history.
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_call")
    presto("CREATE TABLE graft_mem.default.spec_call AS SELECT n_nationkey AS k FROM nation")
    presto("INSERT INTO graft_mem.default.spec_call VALUES (100)")
    presto("DELETE FROM graft_mem.default.spec_call WHERE k < 10")
    def n() = presto("SELECT count(*) FROM graft_mem.default.spec_call").head().getLong(0)
    assert(n() == 16) // 25 + 1 - 10
    val snaps = presto("CALL graft_mem.system.snapshots('default.spec_call')").collect()
    assert(snaps.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4), snaps.mkString(";"))
    assert(snaps.map(_.getLong(2)).toSeq == Seq(0L, 25L, 26L, 16L), snaps.mkString(";"))
    // rollback to the post-CTAS state; the restore is itself a commit
    val rb = presto("CALL graft_mem.system.rollback_to_version('default.spec_call', 2)").head()
    assert(rb.getInt(0) == 2 && rb.getInt(1) == 5, rb.toString)
    assert(n() == 25, "rollback_to_version must restore the v2 row set")
    // expire all but the newest 2 snapshots; numbering stays stable
    val ex = presto("CALL graft_mem.system.expire_history('default.spec_call', 2)").head()
    assert(ex.getInt(0) == 3, ex.toString)
    val left = presto("CALL graft_mem.system.snapshots('default.spec_call')")
      .collect().map(_.getInt(0)).toSeq
    assert(left == Seq(4, 5), left.toString)
    val goneV = intercept[Exception] {
      presto("SELECT count(*) FROM graft_mem.default.spec_call FOR VERSION AS OF 2").collect()
    }
    assert(goneV.getMessage.contains("version 2 not found") ||
      goneV.getMessage.contains("not found"), goneV.getMessage)
    val badProc = intercept[Exception] { presto("CALL graft_mem.system.nope('x')") }
    assert(badProc.getMessage.contains("unknown procedure") ||
      badProc.getMessage.toLowerCase.contains("nope"), badProc.getMessage)
    presto("DROP TABLE IF EXISTS graft_mem.default.spec_call")
  }

  test("role/grant statements fail fast with clear errors") {
    // AstStatements.h:300-374 (roles): explicit rejects, not confusing
    // downstream parse errors.
    val gr = intercept[UnsupportedOperationException] {
      presto("GRANT SELECT ON nation TO alice")
    }
    assert(gr.getMessage.contains("GRANT"), gr.getMessage)
    val sr = intercept[UnsupportedOperationException] { presto("SET ROLE admin") }
    assert(sr.getMessage.contains("ROLE"), sr.getMessage)
    // the read side of the ACL layer rejects identically
    val sg = intercept[UnsupportedOperationException] { presto("SHOW GRANTS ON nation") }
    assert(sg.getMessage.contains("SHOW GRANTS"), sg.getMessage)
    val sro = intercept[UnsupportedOperationException] { presto("SHOW CURRENT ROLES") }
    assert(sro.getMessage.contains("ROLES"), sro.getMessage)
    val srg = intercept[UnsupportedOperationException] { presto("SHOW ROLE GRANTS") }
    assert(srg.getMessage.contains("SHOW ROLE"), srg.getMessage)
    // plain SET must NOT be caught by the SET ROLE reject — and must
    // not leak: restore the session's original value afterwards (the
    // shared-session ANSI flag is load-bearing for NullSemanticsSpec).
    val ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    try {
      presto("SET spark.sql.ansi.enabled = true")
      presto("SET spark.sql.ansi.enabled = false")
      assert(spark.conf.get("spark.sql.ansi.enabled") == "false",
        "SET must actually reach the session conf")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi0)
  }

  test("PREPARE/EXECUTE USING/DEALLOCATE round-trip with parameter splicing") {
    presto("""PREPARE spec_q FROM
              SELECT n_name FROM nation WHERE n_regionkey = ?
              ORDER BY n_name LIMIT ?""")
    val got = presto("EXECUTE spec_q USING 2, 3").collect().map(_.getString(0)).toSeq
    val expect = presto(
      "SELECT n_name FROM nation WHERE n_regionkey = 2 ORDER BY n_name LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    assert(got == expect && got.size == 3, s"$got != $expect")
    // parameters splice inside dialect constructs too
    presto("PREPARE spec_arr FROM SELECT element_at(ARRAY[?, 2], 1) AS a")
    assert(presto("EXECUTE spec_arr USING 5").collect().head.getInt(0) == 5)
    // count mismatches and unknown names fail loudly
    intercept[IllegalArgumentException] { presto("EXECUTE spec_q USING 2") }
    intercept[IllegalArgumentException] { presto("EXECUTE no_such_stmt") }
    presto("DEALLOCATE PREPARE spec_q")
    presto("DEALLOCATE PREPARE spec_arr")
    intercept[IllegalArgumentException] { presto("EXECUTE spec_q USING 2, 3") }
    // Spark's own EXECUTE IMMEDIATE is not intercepted by the layer
    assert(presto("EXECUTE IMMEDIATE 'SELECT 41 + 1'").collect().head.getInt(0) == 42)
  }

  test("TABLESAMPLE BERNOULLI/SYSTEM lower to PERCENT; LATERAL subqueries pass through") {
    // sampledRelation (PrestoSql.g4:333): Spark PERCENT sampling IS
    // per-row Bernoulli; SYSTEM is implementation-defined in Presto, so
    // row sampling conforms there too.
    assert(t("SELECT * FROM orders TABLESAMPLE BERNOULLI(10)")
      === "SELECT * FROM orders TABLESAMPLE (10 PERCENT)")
    assert(t("SELECT * FROM orders TABLESAMPLE SYSTEM (6.5) WHERE o_orderkey > 0")
      === "SELECT * FROM orders TABLESAMPLE (6.5 PERCENT) WHERE o_orderkey > 0")
    // a sample of ~half the table executes and lands in a sane band
    val total = presto("SELECT count(*) AS n FROM orders").head().getLong(0)
    val sampled = presto(
      "SELECT count(*) AS n FROM orders TABLESAMPLE BERNOULLI(50)").head().getLong(0)
    assert(sampled > total / 5 && sampled < total * 4 / 5,
      s"BERNOULLI(50) of $total rows sampled $sampled")
    // LATERAL (query) (PrestoSql.g4:354) is grammar-shared with Spark:
    // a correlated lateral subquery passes through and executes
    val r = presto(
      """SELECT r_name, t.cnt FROM region, LATERAL (
           SELECT count(*) AS cnt FROM nation WHERE n_regionkey = r_regionkey) t
         ORDER BY r_name""").collect()
    assert(r.length == 5 && r.forall(_.getLong(1) == 5), r.mkString(";"))
  }

  test("SHOW STATS FOR reports the CBO's view of ANALYZE stats, table and query forms") {
    import graft.plans.History
    try {
      History.clear(); graft.plans.TableStats.clear()
      graft.plans.Analyze.table(spark, graft.Catalog.load(spark, sfDir, "nation"))
      val st = presto("SHOW STATS FOR nation").collect()
      // one row per column + the summary row
      assert(st.length == tables.nation.schema.length + 1, st.mkString(";"))
      val byCol = st.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r).toMap
      // n_nationkey: 25 distinct keys 0..24, no nulls — NDV is an HLL
      // sketch (±5%), min/max strings exact
      val nk = byCol("n_nationkey")
      assert(math.abs(nk.getDouble(2) - 25.0) <= 2 && nk.getDouble(3) == 0.0, nk.toString)
      assert(nk.getString(5) == "0" && nk.getString(6) == "24", nk.toString)
      val summary = st.filter(_.isNullAt(0))
      assert(summary.length == 1 && summary.head.getDouble(4) == 25.0)
      // query form: the optimizer's estimate for a filtered projection
      val q = presto("SHOW STATS FOR (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)")
        .collect()
      assert(q.length == 2, q.mkString(";"))
      val qSummary = q.filter(_.isNullAt(0)).head
      // FilterEstimation prices the equality at rows/ndv(n_regionkey) ≈ 25/5
      assert(qSummary.getDouble(4) >= 3.0 && qSummary.getDouble(4) <= 7.0, qSummary.toString)
    } finally { History.clear(); graft.plans.TableStats.clear() }
  }

  test("DESCRIBE INPUT/OUTPUT report a prepared statement's params and result columns") {
    presto("""PREPARE spec_desc FROM
              SELECT n_name, CAST(n_regionkey + ? AS BIGINT) AS rk
              FROM nation WHERE n_nationkey < ?""")
    try {
      val out = presto("DESCRIBE OUTPUT spec_desc").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(out == Seq(("n_name", "string"), ("rk", "bigint")), out.toString)
      // 0-based positions, type undeterminable from text (Presto: unknown)
      val in = presto("DESCRIBE INPUT spec_desc").collect()
      assert(in.map(_.getInt(0)).toSeq == Seq(0, 1), in.mkString(";"))
      assert(in.forall(_.getString(1) == "unknown"))
      // zero-parameter body → empty DESCRIBE INPUT, not an error
      presto("PREPARE spec_desc0 FROM SELECT 1 AS one")
      assert(presto("DESCRIBE INPUT spec_desc0").collect().isEmpty)
      presto("DEALLOCATE PREPARE spec_desc0")
      // unknown name fails loudly
      intercept[IllegalArgumentException] { presto("DESCRIBE OUTPUT no_such") }
      // DESCRIBE table stays Spark's path
      assert(presto("DESCRIBE nation").collect().nonEmpty)
    } finally presto("DEALLOCATE PREPARE spec_desc")
  }

  test("EXPLAIN ANALYZE executes the query and annotates measured metrics") {
    val rows = presto(
      "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey")
      .collect().map(_.getString(0))
    // the plan tree is there, with REAL observed metrics from execution
    assert(rows.exists(_.contains("Scan")), rows.mkString("\n"))
    assert(rows.exists(_.contains("numOutputRows=")), rows.mkString("\n"))
    assert(rows.last.startsWith("Total wall time:"), rows.last)
    // VERBOSE prints full node strings (operator arguments visible)
    val v = presto("EXPLAIN ANALYZE VERBOSE SELECT count(*) AS n FROM region")
      .collect().map(_.getString(0))
    assert(v.exists(l => l.contains("count(") || l.contains("Aggregate")), v.mkString("\n"))
    // plain EXPLAIN stays Spark's compile-only path
    val plain = presto("EXPLAIN SELECT 1").collect().map(_.getString(0))
    assert(!plain.exists(_.contains("Total wall time")), plain.mkString("\n"))
    // subquery plans are rendered too, with their own metrics
    val sq = presto(
      """EXPLAIN ANALYZE SELECT count(*) AS n FROM nation
         WHERE n_regionkey = (SELECT min(n_regionkey) FROM nation)""")
      .collect().map(_.getString(0))
    assert(sq.exists(_.trim.startsWith("Subquery:")), sq.mkString("\n"))
  }

  test("WITH RECURSIVE passes through the dialect and executes iteratively") {
    // grammar-shared (PrestoSql.g4:169): the recursion form is untouched...
    val out = t("WITH RECURSIVE t (n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT * FROM t")
    assert(out.startsWith("WITH RECURSIVE"))
    // ...and genuinely recurses (10! needs 10 loop steps)
    val fact = presto(
      """WITH RECURSIVE f (n, fact) AS (
           SELECT 1, CAST(1 AS BIGINT)
           UNION ALL
           SELECT n + 1, fact * (n + 1) FROM f WHERE n < 10
         )
         SELECT max(fact) AS f10 FROM f""").head()
    assert(fact.getLong(0) == 3628800L)
    // dialect lowerings still apply INSIDE the recursive body
    // (ARRAY[..] constructor, cardinality); concat-grow an array per step
    val r = presto(
      """WITH RECURSIVE s (n, a) AS (
           SELECT 1, ARRAY[1]
           UNION ALL
           SELECT n + 1, concat(a, ARRAY[n + 1]) FROM s WHERE n < 4
         )
         SELECT max(n) AS steps, max(cardinality(a)) AS width FROM s""").head()
    assert(r.get(0).toString.toInt == 4 && r.get(1).toString.toInt == 4)
  }

  test("IS [NOT] DISTINCT FROM is null-safe comparison (reference NYIs it: PrestoParser.cpp:239)") {
    val r = presto(
      """SELECT CAST(NULL AS INTEGER) IS DISTINCT FROM 1 AS a,
                CAST(NULL AS INTEGER) IS NOT DISTINCT FROM CAST(NULL AS INTEGER) AS b,
                1 IS DISTINCT FROM 1 AS c,
                1 IS NOT DISTINCT FROM 2 AS d""").head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2) && !r.getBoolean(3), r.toString)
    // as a join condition it stays an EQUI key (null-safe <=>), so the
    // null bucket joins hash-style, never via a cartesian residual
    val plan = presto(
      """SELECT count(*) AS n FROM
           (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) a
           JOIN (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) b
           ON a.k IS NOT DISTINCT FROM b.k""").queryExecution.executedPlan
    val hasCartesian = plan.exists {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    assert(!hasCartesian, "IS NOT DISTINCT FROM join must plan as an equi join")
  }

  test("quantified comparisons ANY/SOME/ALL lower with exact three-valued semantics") {
    // The reference's grammar parses these (AstExpressions.h:404
    // QuantifiedComparisonExpression) but its lowering NYIs them; Spark
    // has no native syntax. Every branch of the CASE lowering is pinned:
    // witness, counterexample, empty set, NULL elements, NULL operand.
    def b(expr: String): Any = presto(s"SELECT $expr AS r").head().get(0)
    assert(b("3 > ANY (SELECT * FROM (VALUES (2), (9)) t(v))") == true)
    assert(b("3 > SOME (SELECT * FROM (VALUES (5), (9)) t(v))") == false)
    assert(b("3 <= ALL (SELECT * FROM (VALUES (3), (9)) t(v))") == true)
    assert(b("3 = ANY (SELECT * FROM (VALUES (1), (3)) t(v))") == true)
    assert(b("3 <> ALL (SELECT * FROM (VALUES (1), (2)) t(v))") == true)
    assert(b("3 = ALL (SELECT * FROM (VALUES (3), (3)) t(v))") == true)
    assert(b("3 = ALL (SELECT * FROM (VALUES (3), (4)) t(v))") == false)
    assert(b("3 <> ANY (SELECT * FROM (VALUES (3), (4)) t(v))") == true)
    assert(b("3 <> ANY (SELECT * FROM (VALUES (3), (3)) t(v))") == false)
    // empty set: the quantifier identities
    assert(b("1 > ALL (SELECT 2 WHERE false)") == true)
    assert(b("1 > ANY (SELECT 0 WHERE false)") == false)
    // NULL elements: a definite witness/counterexample wins, else NULL
    assert(b("5 > ANY (SELECT * FROM (VALUES (CAST(NULL AS INT)), (2)) t(v))") == true)
    assert(b("5 > ANY (SELECT * FROM (VALUES (CAST(NULL AS INT)), (7)) t(v))") == null)
    assert(b("5 > ALL (SELECT * FROM (VALUES (CAST(NULL AS INT)), (7)) t(v))") == false)
    assert(b("5 > ALL (SELECT * FROM (VALUES (CAST(NULL AS INT)), (3)) t(v))") == null)
    assert(b("5 = ALL (SELECT * FROM (VALUES (CAST(NULL AS INT)), (5)) t(v))") == null)
    assert(b("5 <> ANY (SELECT * FROM (VALUES (CAST(NULL AS INT)), (5)) t(v))") == null)
    // NULL operand over a non-empty set
    assert(b("CAST(NULL AS INT) > ANY (SELECT * FROM (VALUES (2)) t(v))") == null)
    // postfix-primary operand capture: function call on the left
    assert(b("abs(-9) > ALL (SELECT * FROM (VALUES (3), (8)) t(v))") == true)
  }

  test("SHOW FUNCTIONS lists the registry; LIKE/ESCAPE filter applies (round 11)") {
    // Reference grammar PrestoSql.g4:145-146. Registry-backed: Presto
    // name, Spark lowering, scalar/aggregate kind, determinism, cost.
    val all = presto("SHOW FUNCTIONS").collect()
    assert(all.length > 100, s"registry listing too small: ${all.length}")
    val byName = all.map(r => r.getString(0) -> r).toMap
    assert(byName("qdigest_agg").getString(2) == "aggregate")
    assert(byName("word_stem").getString(2) == "scalar")
    assert(byName("strpos").getString(1) == "presto_strpos")
    val q = presto("SHOW FUNCTIONS LIKE 'qdigest%'").collect()
    assert(q.map(_.getString(0)).toSet == Set("qdigest_agg"), q.mkString(","))
    val esc = presto("SHOW FUNCTIONS LIKE '%reduce!_agg' ESCAPE '!'").collect()
    assert(esc.map(_.getString(0)).toSet == Set("reduce_agg"), esc.mkString(","))
  }

  test("table-version text lowers: FOR VERSION/TIMESTAMP AS OF, VERSION BEFORE (round 11)") {
    assert(t("SELECT * FROM t FOR VERSION AS OF 3")
      === "SELECT * FROM t VERSION AS OF 3")
    assert(t("SELECT * FROM t FOR SYSTEM_VERSION AS OF 3")
      === "SELECT * FROM t VERSION AS OF 3")
    assert(t("SELECT * FROM t FOR TIMESTAMP AS OF '2024-01-01'")
      === "SELECT * FROM t TIMESTAMP AS OF '2024-01-01'")
    assert(t("SELECT * FROM t FOR SYSTEM_TIME AS OF '2024-01-01'")
      === "SELECT * FROM t TIMESTAMP AS OF '2024-01-01'")
    assert(t("SELECT * FROM t FOR VERSION BEFORE 3")
      === "SELECT * FROM t VERSION AS OF 2")
    val e = intercept[UnsupportedOperationException] {
      t("SELECT * FROM t FOR TIMESTAMP BEFORE '2024-01-01'")
    }
    assert(e.getMessage.contains("TIMESTAMP BEFORE"), e.getMessage)
  }

  test("SQL routines: CREATE FUNCTION with Presto characteristics; SET/SHOW SESSION (round 11)") {
    // Presto routine DDL (#createFunction): Spark runs the SQL UDF; the
    // null-call characteristic (no Spark spelling) is dropped, LANGUAGE
    // SQL / DETERMINISTIC are shared syntax. Matching stops at the
    // body's RETURN so the clause words inside expressions are safe.
    presto("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(p DOUBLE, d DOUBLE)
              RETURNS DOUBLE LANGUAGE SQL DETERMINISTIC RETURNS NULL ON NULL INPUT
              RETURN p * (1 - d)""").collect()
    val r = presto("SELECT round(graft_margin(100.0, 0.25), 2) AS m").head()
    assert(r.getDouble(0) == 75.0, r.toString)
    presto("DROP TEMPORARY FUNCTION graft_margin").collect()
    // the pass only fires on CREATE ... FUNCTION statements
    val untouched = "SELECT 'returns null on null input' AS s FROM t"
    assert(t(untouched) === untouched)
    // SET SESSION → Spark SET; SHOW SESSION lists it back (LIKE filter)
    presto("SET SESSION graft.test.prop = 'hello'").collect()
    val s = presto("SHOW SESSION LIKE 'graft.test.%'").collect()
    assert(s.length == 1 && s.head.getString(0) == "graft.test.prop" &&
      s.head.getString(1) == "hello", s.mkString(","))
  }

  test("CORRELATED quantified comparisons decorrelate with exact semantics (round 11)") {
    // The reference NYIs all quantified comparisons; Spark has no native
    // syntax; the CASE lowering carries the correlation inside the
    // spliced scalar aggregates. Pins: per-row witness/counterexample,
    // EMPTY correlated set (count-bug correctness → quantifier
    // identity), NULL inner elements.
    val df = presto(
      """SELECT k,
           k > ALL (SELECT v FROM (VALUES (1, 1), (1, 2), (3, 9)) s(g, v) WHERE s.g = t.k) AS gt_all,
           k = ANY (SELECT v FROM (VALUES (1, 1), (1, 2), (3, 9)) s(g, v) WHERE s.g = t.k) AS eq_any
         FROM (VALUES (1), (2), (3)) t(k) ORDER BY k""")
    val rows = df.collect().map(r => (r.getInt(0), r.get(1), r.get(2)))
    // k=1: inner {1,2} → 1 > ALL false; 1 = ANY true
    // k=2: inner EMPTY → > ALL TRUE (identity), = ANY FALSE (identity)
    // k=3: inner {9} → 3 > ALL false; 3 = ANY false
    assert(rows.toSeq == Seq((1, false, true), (2, true, false), (3, false, false)), rows.mkString(","))
    // NULL inner element in a correlated set: definite counterexample
    // still wins; otherwise NULL
    val n = presto(
      """SELECT k,
           k > ALL (SELECT v FROM (VALUES (1, CAST(NULL AS INT)), (1, 9), (2, CAST(NULL AS INT)), (2, 1)) s(g, v)
                    WHERE s.g = t.k) AS r
         FROM (VALUES (1), (2)) t(k) ORDER BY k""")
    val nr = n.collect().map(r => (r.getInt(0), r.get(1)))
    assert(nr.toSeq == Seq((1, false), (2, null)), nr.mkString(","))
  }

  test("TRY composes with quantified comparisons: operand errors become NULL") {
    def b(expr: String): Any = presto(s"SELECT $expr AS r").head().get(0)
    // ANSI mod-by-zero inside the operand is caught by TryEval → NULL
    assert(b("TRY(mod(1, 0) > ALL (SELECT * FROM (VALUES (1)) t(v)))") == null)
    assert(b("TRY(mod(1, 0) < ANY (SELECT * FROM (VALUES (1)) t(v)))") == null)
    // clean rows keep the exact quantified semantics through TRY
    assert(b("TRY(4 > ALL (SELECT * FROM (VALUES (1), (3)) t(v)))") == true)
    assert(b("TRY(4 > ANY (SELECT * FROM (VALUES (9)) t(v)))") == false)
    // empty set: the CASE lowering short-circuits on count()=0, so the
    // operand is never evaluated and the quantifier identity wins —
    // documented stance (lazy operand, like CASE itself).
    assert(b("TRY(mod(1, 0) > ALL (SELECT 1 WHERE false))") == true)
    assert(b("TRY(mod(1, 0) > ANY (SELECT 1 WHERE false))") == false)
  }

  test("GROUPING SETS / ROLLUP / CUBE text survives the rewriter untouched") {
    // Reference grammar parses all three (PrestoSql.g4:284-290); Spark's
    // syntax is compatible, so the dialect must pass them through with
    // no token damage (GROUPING is also a function name — must not be
    // treated as a call to rename).
    val in = """SELECT a, grouping(a) AS g, count(*) AS n FROM t
                GROUP BY GROUPING SETS ((a, b), (a), ())"""
    assert(t(in) === in)
    val ru = "SELECT a, b, sum(x) FROM t GROUP BY ROLLUP (a, b)"
    assert(t(ru) === ru)
    val cu = "SELECT a, b, sum(x) FROM t GROUP BY CUBE (a, b)"
    assert(t(cu) === cu)
    // end-to-end: rollup super-aggregate row appears with grouping flag
    val df = presto(
      """SELECT source, CAST(grouping(source) AS INT) AS g, count(*) AS n
         FROM documents GROUP BY ROLLUP (source)""")
    val rows = df.collect()
    assert(rows.count(_.getInt(1) == 1) == 1, "exactly one grand-total row")
    val total = rows.filter(_.getInt(1) == 1).head.getLong(2)
    assert(total == rows.filter(_.getInt(1) == 0).map(_.getLong(2)).sum)
  }

  test("USE and DROP SCHEMA CASCADE/RESTRICT pass through the dialect (PrestoSql.g4:43-48)") {
    // Presto USE schema / USE catalog.schema is spelled identically in
    // Spark (SetCatalogAndNamespace); DROP SCHEMA's CASCADE/RESTRICT
    // qualifiers are shared syntax too — the rewriter must not touch
    // either.
    assert(t("USE graft_mem.default") === "USE graft_mem.default")
    assert(t("DROP SCHEMA IF EXISTS s CASCADE") === "DROP SCHEMA IF EXISTS s CASCADE")
    // end-to-end: switch into graft_mem.default, resolve a bare name
    presto("DROP TABLE IF EXISTS graft_mem.default.use_spec").collect()
    presto("CREATE TABLE graft_mem.default.use_spec (k BIGINT)").collect()
    presto("INSERT INTO graft_mem.default.use_spec VALUES (7)").collect()
    try {
      presto("USE graft_mem.default").collect()
      assert(presto("SELECT k FROM use_spec").head().getLong(0) == 7L)
    } finally {
      spark.sql("USE spark_catalog.default")
      presto("DROP TABLE IF EXISTS graft_mem.default.use_spec").collect()
    }
    // and CASCADE against the session catalog end-to-end
    spark.sql("CREATE SCHEMA IF NOT EXISTS drop_spec_ns")
    spark.sql("CREATE OR REPLACE VIEW drop_spec_ns.v AS SELECT 1 AS x")
    presto("DROP SCHEMA drop_spec_ns CASCADE").collect()
    assert(!spark.catalog.databaseExists("drop_spec_ns"))
  }

  test("ALTER SCHEMA RENAME moves a graft-mem namespace; error paths (PrestoSql.g4:48)") {
    import graft.sources.MemTables
    presto("DROP TABLE IF EXISTS graft_mem.ns_a.t1").collect()
    presto("DROP TABLE IF EXISTS graft_mem.ns_b.t1").collect()
    presto("CREATE TABLE graft_mem.ns_a.t1 (k BIGINT)").collect()
    presto("INSERT INTO graft_mem.ns_a.t1 VALUES (11), (12)").collect()
    presto("ALTER SCHEMA graft_mem.ns_a RENAME TO ns_b").collect()
    assert(spark.table("graft_mem.ns_b.t1").count() == 2)
    assert(!MemTables.exists("ns_a.t1"))
    // unknown schema fails with the catalog named
    val e1 = intercept[IllegalArgumentException] {
      presto("ALTER SCHEMA graft_mem.no_such_ns RENAME TO x").collect()
    }
    assert(e1.getMessage.contains("schema not found"))
    // collision is checked before any move (all-or-nothing)
    presto("CREATE TABLE graft_mem.ns_c.t1 (k BIGINT)").collect()
    val e2 = intercept[IllegalArgumentException] {
      presto("ALTER SCHEMA graft_mem.ns_c RENAME TO ns_b").collect()
    }
    assert(e2.getMessage.contains("already exists"))
    assert(MemTables.exists("ns_c.t1"), "failed rename must not move tables")
    presto("DROP TABLE IF EXISTS graft_mem.ns_b.t1").collect()
    presto("DROP TABLE IF EXISTS graft_mem.ns_c.t1").collect()
  }

  test("ALTER VIEW RENAME TO and SHOW CREATE VIEW (PrestoSql.g4:85-86,129)") {
    assert(t("SHOW CREATE VIEW v") === "SHOW CREATE TABLE v")
    spark.sql("DROP VIEW IF EXISTS avr_old")
    spark.sql("DROP VIEW IF EXISTS avr_new")
    spark.sql("CREATE VIEW avr_old AS SELECT 42 AS x")
    try {
      presto("ALTER VIEW avr_old RENAME TO avr_new").collect()
      assert(spark.table("avr_new").head().getInt(0) == 42)
      assert(!spark.catalog.tableExists("avr_old"))
      val show = presto("SHOW CREATE VIEW avr_new").head().getString(0)
      assert(show.toUpperCase.contains("CREATE VIEW"), show)
      // IF EXISTS on a missing view is a no-op, not an error
      presto("ALTER VIEW IF EXISTS avr_missing RENAME TO avr_other").collect()
    } finally {
      spark.sql("DROP VIEW IF EXISTS avr_new")
      spark.sql("DROP VIEW IF EXISTS avr_old")
    }
  }

  test("DROP FUNCTION signature strip, SHOW CREATE FUNCTION, ALTER FUNCTION null-call (PrestoSql.g4:98-100,131)") {
    // Presto disambiguates overloads by parameter types; Spark functions
    // are name-keyed — the signature is stripped by the rewriter.
    assert(t("DROP FUNCTION IF EXISTS f(int, varchar)") === "DROP FUNCTION IF EXISTS f")
    assert(t("DROP TEMPORARY FUNCTION g(bigint)") === "DROP TEMPORARY FUNCTION g")
    // a call named drop... in query position is untouched
    assert(t("SELECT drop_function(x) FROM t") === "SELECT drop_function(x) FROM t")
    val ddl = """CREATE OR REPLACE TEMPORARY FUNCTION scf_double(x DOUBLE)
              RETURNS DOUBLE RETURN x * 2"""
    presto(ddl).collect()
    assert(presto("SELECT scf_double(21.0) AS v").head().getDouble(0) == 42.0)
    // SHOW CREATE FUNCTION serves the recorded text (signature ignored)
    val shown = presto("SHOW CREATE FUNCTION scf_double(double)").head().getString(0)
    assert(shown == ddl.trim, shown)
    // ALTER FUNCTION: CALLED ON NULL INPUT matches Spark semantics →
    // acknowledged; RETURNS NULL ON NULL INPUT cannot be honored → loud
    presto("ALTER FUNCTION scf_double CALLED ON NULL INPUT").collect()
    val e = intercept[UnsupportedOperationException] {
      presto("ALTER FUNCTION scf_double(double) RETURNS NULL ON NULL INPUT").collect()
    }
    assert(e.getMessage.contains("CALLED ON NULL INPUT"))
    // DROP unregisters: SHOW CREATE FUNCTION and ALTER now fail
    presto("DROP TEMPORARY FUNCTION scf_double(double)").collect()
    val e2 = intercept[IllegalArgumentException] {
      presto("SHOW CREATE FUNCTION scf_double").collect()
    }
    assert(e2.getMessage.contains("function not found"))
  }

  test("CREATE TYPE: row form, alias form, nesting, CAST and column-def substitution (PrestoSql.g4:80-82)") {
    presto("CREATE TYPE spec_point AS (x DOUBLE, y DOUBLE)").collect()
    presto("CREATE TYPE spec_name AS VARCHAR").collect()
    // nested reference expands at record time (registry values are flat)
    presto("CREATE TYPE spec_seg AS (a spec_point, b spec_point)").collect()
    // CAST target substitution, row + alias
    val r = presto(
      """SELECT CAST(ROW(1.0, 2.0) AS spec_point).y AS y,
                CAST('abc' AS spec_name) AS nm,
                CAST(ROW(ROW(0.0, 0.0), ROW(3.0, 4.0)) AS spec_seg).b.x AS bx""").head()
    assert(r.getDouble(0) == 2.0 && r.getString(1) == "abc" && r.getDouble(2) == 3.0)
    // column-definition substitution in CREATE TABLE on graft-mem
    presto("DROP TABLE IF EXISTS graft_mem.default.typed_t").collect()
    presto("CREATE TABLE graft_mem.default.typed_t (id BIGINT, pos spec_point)").collect()
    presto("INSERT INTO graft_mem.default.typed_t VALUES (1, ROW(5.0, 6.0))").collect()
    val row = presto("SELECT pos.x AS px FROM graft_mem.default.typed_t").head()
    assert(row.getDouble(0) == 5.0)
    presto("DROP TABLE IF EXISTS graft_mem.default.typed_t").collect()
    // a same-named column alias is NOT a type position — untouched
    assert(t("SELECT a AS spec_point FROM t") === "SELECT a AS spec_point FROM t")
  }

  test("CREATE TABLE LIKE expands the source's columns (PrestoSql.g4:182-184)") {
    presto("DROP TABLE IF EXISTS graft_mem.default.like_spec").collect()
    presto("""CREATE TABLE graft_mem.default.like_spec
              (LIKE region EXCLUDING PROPERTIES, note VARCHAR)""").collect()
    val schema = spark.table("graft_mem.default.like_spec").schema
    assert(schema.fieldNames.toSeq == Seq("r_regionkey", "r_name", "note"), schema.treeString)
    presto("INSERT INTO graft_mem.default.like_spec SELECT r_regionkey, r_name, 'n' FROM region").collect()
    assert(spark.table("graft_mem.default.like_spec").count() == 5)
    presto("DROP TABLE IF EXISTS graft_mem.default.like_spec").collect()
    // a column merely named like... is a plain definition → no statement
    // action (only the ordinary type lowering applies)
    val plain = "CREATE TABLE t (likely_col INT, liker VARCHAR)"
    assert(t(plain) === "CREATE TABLE t (likely_col INT, liker STRING)")
    assert(PrestoDialect.statementAction(plain).isEmpty)
  }

  test("the Presto dialect queries the generator catalog (TpchConnectorMetadata analogue)") {
    // the reference resolves tpch.<schema>.<table> through its connector
    // metadata; the same three-part names work as Presto SQL text here
    val r = presto(
      """SELECT r.r_name AS region, count(*) AS n
         FROM graft_tpch.tiny.nation n
         JOIN graft_tpch.tiny.region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name ORDER BY r.r_name""").collect()
    assert(r.length == 5 && r.map(_.getLong(1)).sum == 25, r.mkString(","))
    // and dialect-only syntax lowers over generated tables too
    val q = presto(
      """SELECT count(*) AS n FROM graft_tpch.tiny.orders
         WHERE o_orderpriority = ANY (SELECT v FROM (VALUES ('1-URGENT')) t(v))""").head()
    assert(q.getLong(0) > 0, q.toString)
  }

  test("ALTER TABLE constraint family: SET/DROP NOT NULL, ADD/DROP CONSTRAINT, SET PROPERTIES (PrestoSql.g4:69-78)") {
    graft.sql.Constraints.clear()
    presto("DROP TABLE IF EXISTS graft_mem.default.con_t")
    presto("CREATE TABLE graft_mem.default.con_t AS SELECT 1 AS a, 'x' AS b")
    // SET NOT NULL commits; a NULL insert is rejected and nothing lands
    presto("ALTER TABLE graft_mem.default.con_t ALTER COLUMN b SET NOT NULL")
    val e1 = intercept[Exception] {
      presto("INSERT INTO graft_mem.default.con_t VALUES (2, CAST(NULL AS VARCHAR))") }
    assert(e1.getMessage.toLowerCase.contains("null"), e1.getMessage)
    assert(presto("SELECT count(*) AS n FROM graft_mem.default.con_t").head().getLong(0) == 1)
    // SET NOT NULL on a column with existing NULLs must refuse
    presto("INSERT INTO graft_mem.default.con_t VALUES (3, 'y')")
    presto("ALTER TABLE graft_mem.default.con_t ADD COLUMN c INT")
    val e2 = intercept[Exception] {
      presto("ALTER TABLE graft_mem.default.con_t ALTER COLUMN c SET NOT NULL") }
    assert(e2.getMessage.contains("existing rows contain NULL"), e2.getMessage)
    // DROP NOT NULL re-admits NULLs
    presto("ALTER TABLE graft_mem.default.con_t ALTER COLUMN b DROP NOT NULL")
    presto("INSERT INTO graft_mem.default.con_t VALUES (4, CAST(NULL AS VARCHAR), 7)")
    assert(presto("SELECT count(*) AS n FROM graft_mem.default.con_t").head().getLong(0) == 3)
    // constraints: named, unnamed (system name), SHOW CREATE surface
    presto("ALTER TABLE graft_mem.default.con_t ADD CONSTRAINT con_pk PRIMARY KEY (a)")
    presto("ALTER TABLE graft_mem.default.con_t ADD UNIQUE (b) NOT ENFORCED")
    val ddl = presto("SHOW CREATE TABLE graft_mem.default.con_t").head().getString(0)
    assert(ddl.contains("CREATE TABLE") && ddl.contains("con_pk") &&
      ddl.contains("PRIMARY KEY (a)") && ddl.contains("UNIQUE (b)"), ddl)
    val e3 = intercept[Exception] {
      presto("ALTER TABLE graft_mem.default.con_t ADD CONSTRAINT con_pk UNIQUE (a)") }
    assert(e3.getMessage.contains("already exists"), e3.getMessage)
    // drop: named works, missing errors, IF EXISTS is quiet
    presto("ALTER TABLE graft_mem.default.con_t DROP CONSTRAINT con_pk")
    assert(!presto("SHOW CREATE TABLE graft_mem.default.con_t").head().getString(0)
      .contains("con_pk"))
    val e4 = intercept[Exception] {
      presto("ALTER TABLE graft_mem.default.con_t DROP CONSTRAINT nope") }
    assert(e4.getMessage.contains("constraint not found"), e4.getMessage)
    presto("ALTER TABLE graft_mem.default.con_t DROP CONSTRAINT IF EXISTS nope")
    // SET PROPERTIES fails fast with the actionable alternative
    val e5 = intercept[UnsupportedOperationException] {
      presto("ALTER TABLE graft_mem.default.con_t SET PROPERTIES (a = 'b')") }
    assert(e5.getMessage.contains("SET TBLPROPERTIES"), e5.getMessage)
    // constraints die with the table: a recreate starts clean
    presto("DROP TABLE graft_mem.default.con_t")
    presto("CREATE TABLE graft_mem.default.con_t AS SELECT 1 AS a")
    assert(!presto("SHOW CREATE TABLE graft_mem.default.con_t")
      .head().getString(0).contains("UNIQUE"))
    presto("DROP TABLE graft_mem.default.con_t")
  }

  test("GROUPS frames as SQL text lower to dense_rank→RANGE; unsupported shapes fail fast (PrestoSql.g4:514-517)") {
    // identity vs the explicit two-pass spelling
    val got = presto(
      """SELECT o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority
             ORDER BY date_trunc('day', o_orderdate)
             GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS gsum
         FROM orders WHERE o_orderkey < 500""")
    val want = presto(
      """WITH r AS (
           SELECT o_orderkey, o_orderpriority, o_totalprice,
                  dense_rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY date_trunc('day', o_orderdate)) AS dr
           FROM orders WHERE o_orderkey < 500)
         SELECT o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS gsum
         FROM r""")
    assert(got.orderBy("o_orderkey").collect().toSeq ==
      want.orderBy("o_orderkey").collect().toSeq)
    // single-bound form, no partition, trailing ORDER BY/LIMIT survive
    val single = presto(
      """SELECT o_orderkey,
           CAST(count(*) OVER (ORDER BY o_orderpriority GROUPS 1 PRECEDING) AS BIGINT) AS c
         FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey LIMIT 5""")
    assert(single.count() == 5)
    // unsupported shapes name the DataFrame alternative
    val e1 = intercept[UnsupportedOperationException] { presto(
      """SELECT max(o_orderkey) OVER (ORDER BY o_orderpriority GROUPS 1 PRECEDING)
         FROM orders GROUP BY o_orderpriority""") }
    assert(e1.getMessage.contains("WindowOps.groupsFrame"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException] { presto(
      "SELECT count(*) OVER (GROUPS 1 PRECEDING) FROM orders") }
    assert(e2.getMessage.contains("ORDER BY"), e2.getMessage)
  }

  test("U&'…' unicode literals: 4/6-digit escapes, UESCAPE, edges (PrestoSql.g4:434,906)") {
    // default \ escape: BMP (4 hex) and astral (\+ 6 hex) forms
    assert(presto("SELECT U&'A\\0042\\+01F600' AS s").head.getString(0) == "AB😀")
    // doubled escape char = the char itself; doubled quote = quote
    assert(presto("SELECT U&'back\\\\slash it''s' AS s").head.getString(0) == "back\\slash it's")
    // UESCAPE picks a custom escape char; \ becomes an ordinary char then
    assert(presto("SELECT U&'x!0041 y!! z\\' UESCAPE '!' AS s").head.getString(0) == "xA y! z\\")
    // the literal composes with string functions downstream
    assert(presto("SELECT length(U&'\\2603\\2603') AS n").head.getInt(0) == 2)
    // malformed escapes fail fast with the literal named, not a Spark ParseException
    val e1 = intercept[IllegalArgumentException] { PrestoDialect.transform("SELECT U&'\\00ZZ'") }
    assert(e1.getMessage.contains("hex digits"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PrestoDialect.transform("SELECT U&'a' UESCAPE 'ab'") }
    assert(e2.getMessage.contains("single character"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      PrestoDialect.transform("SELECT U&'a' UESCAPE 'f'") }
    assert(e3.getMessage.contains("hex digit"), e3.getMessage)
    // out-of-range code point rejected
    val e4 = intercept[IllegalArgumentException] { PrestoDialect.transform("SELECT U&'\\+FFFFFF'") }
    assert(e4.getMessage.contains("code point"), e4.getMessage)
    // a plain identifier starting with u is untouched
    assert(t("SELECT u.a FROM users u") == "SELECT u.a FROM users u")
    // ADJACENCY: the pass runs on the raw token stream (Space tokens
    // included), so only a true U&'…' lexer token matches. A bitwise-and
    // on a column named u — any whitespace split — must ride through.
    assert(t("SELECT u & 'x' FROM t1") == "SELECT u & 'x' FROM t1")
    assert(t("SELECT u &'x' FROM t1") == "SELECT u &'x' FROM t1")
    assert(t("SELECT u& 'x' FROM t1") == "SELECT u& 'x' FROM t1")
    // lone surrogate code points rejected (Presto does; isValidCodePoint alone would not)
    val e5 = intercept[IllegalArgumentException] { PrestoDialect.transform("SELECT U&'\\+00D800'") }
    assert(e5.getMessage.contains("code point"), e5.getMessage)
    val e6 = intercept[IllegalArgumentException] { PrestoDialect.transform("SELECT U&'\\DFFF'") }
    assert(e6.getMessage.contains("code point"), e6.getMessage)
  }

  test("window functions as SQL text: OVER, named WINDOW, frames, IGNORE NULLS") {
    // Reference grammar PrestoSql.g4:504 (`OVER '('`). The rewriter must
    // leave the whole window surface untouched...
    val in = """SELECT rank() OVER (PARTITION BY a ORDER BY b
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) FROM t"""
    assert(t(in) === in)
    // ...and the postfix IGNORE NULLS form must execute through spark.sql:
    // lag skips the NULLed-out 'O' statuses.
    val df = presto(
      """SELECT o_orderkey,
           lag(nullif(o_orderstatus, 'O')) IGNORE NULLS OVER
             (ORDER BY o_orderkey) AS prev_nonopen
         FROM orders WHERE o_orderkey < 100""")
    val vals = df.collect().flatMap(r => Option(r.getString(1)))
    assert(vals.nonEmpty && vals.forall(_ != "O"))
  }
}
