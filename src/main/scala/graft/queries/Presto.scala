package graft.queries

import graft.sql.PrestoRewriter
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries accepted in PRESTO dialect (the reference's SQL front door)
  * and executed through the rewriter → spark.sql. Each oracle is the
  * equivalent DuckDB SQL, so these check the translation, not just the
  * engine.
  */
object Presto {

  /** Presto-isms: strpos, cardinality, approx_distinct, arbitrary,
    * double-quoted identifiers, || concat. */
  val tokenStatsPresto: String =
    """SELECT "lang",
         cardinality(split(trim(text), ' ')) AS n_tok,
         strpos(text, 'data') AS first_data,
         substr(text, 1, 3) || '…' AS head
       FROM documents WHERE doc_id < 50"""
  val tokenStatsOracle: String =
    """SELECT lang,
         len(string_split(trim(text), ' ')) AS n_tok,
         strpos(text, 'data') AS first_data,
         substr(text, 1, 3) || '…' AS head
       FROM documents WHERE doc_id < 50"""

  /** Aggregate renames: approx_distinct → approx_count_distinct is NOT
    * exactly comparable (different sketches), so the checked entry uses
    * exact aggregates with renamed scalar functions; the approx variant
    * is covered in tests. */
  val aggPresto: String =
    """SELECT o_orderpriority,
         count(*) AS n,
         round(avg(o_totalprice), 2) AS avg_price,
         cardinality(array_agg(DISTINCT o_orderstatus)) AS n_status
       FROM orders GROUP BY o_orderpriority"""
  val aggOracle: String =
    """SELECT o_orderpriority,
         count(*) AS n,
         round(avg(o_totalprice), 2) AS avg_price,
         len(list(DISTINCT o_orderstatus)) AS n_status
       FROM orders GROUP BY o_orderpriority"""

  /** The reference's own TPC-H q6 text (tpch.queries/q6.sql shape) in
    * Presto dialect — date arithmetic via interval, verbatim predicate
    * structure, constants adapted to the synthetic data window. */
  val q6Presto: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= timestamp '1996-01-01'
         AND l_shipdate < timestamp '1996-01-01' + interval '1' year
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""
  val q6Oracle: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1996-01-01' + INTERVAL 1 YEAR
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""

  /** MySQL-pattern datetime surface: date_format / date_parse roundtrip
    * plus unit-form date_diff — the three functions whose naive rename
    * silently corrupts results (see PrestoCompat). DuckDB's strftime/
    * strptime speak the same %-patterns, so the oracle checks the
    * PATTERN CONVERSION, not just the plumbing. */
  val datetimePresto: String =
    """SELECT o_orderpriority,
         date_format(min(o_orderdate), '%Y-%m-%d') AS first_day,
         min(date_parse(date_format(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS first_day_ts,
         max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS max_days_since
       FROM orders GROUP BY o_orderpriority"""
  val datetimeOracle: String =
    """SELECT o_orderpriority,
         strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
         min(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS first_day_ts,
         max(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS max_days_since
       FROM orders GROUP BY o_orderpriority"""

  /** String-distance parity: hamming_distance (graft's native expression
    * — Presto has no Spark twin) and levenshtein_distance, both checked
    * against DuckDB's native hamming()/levenshtein(). Equal-length
    * operands by construction (Presto/DuckDB hamming both error
    * otherwise). */
  val stringsPresto: String =
    """SELECT doc_id,
         hamming_distance(substr(text, 1, 8), substr(reverse(text), 1, 8)) AS hd,
         CAST(levenshtein_distance(substr(text, 1, 12), substr(text, 3, 12)) AS BIGINT) AS ld
       FROM documents WHERE length(text) >= 16 AND doc_id < 200"""
  val stringsOracle: String =
    """SELECT doc_id,
         hamming(substr(text, 1, 8), substr(reverse(text), 1, 8)) AS hd,
         CAST(levenshtein(substr(text, 1, 12), substr(text, 3, 12)) AS BIGINT) AS ld
       FROM documents WHERE length(text) >= 16 AND doc_id < 200"""

  // ------------------------------------------------------------------
  // Round-6 parser-breadth entries: constructs Spark's grammar does NOT
  // share, lowered structurally by the injected PrestoParser/
  // PrestoDialect (reference: axiom/sql/presto/ast/AstBuilder.cpp).

  /** FROM-clause UNNEST WITH ORDINALITY (AstBuilder.cpp UNNEST relation).
    * Ordinality is 1-based BIGINT, as in Presto. */
  val unnestFromPresto: String =
    """SELECT doc_id, tok, ord
       FROM documents CROSS JOIN UNNEST(split(trim(text), ' ')) WITH ORDINALITY AS u(tok, ord)
       WHERE doc_id < 40"""
  val unnestFromOracle: String =
    """SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok,
         unnest(generate_series(1, len(string_split(trim(text), ' ')))) AS ord
       FROM documents WHERE doc_id < 40"""

  /** Multi-collection UNNEST: Presto zips collections of unequal length
    * null-padded — same contract as DuckDB's zipped unnest()s. */
  val unnestMultiPresto: String =
    """SELECT doc_id, w, x
       FROM documents CROSS JOIN UNNEST(split(trim(text), ' '), slice(split(trim(text), ' '), 2, 3)) AS u(w, x)
       WHERE doc_id < 30"""
  val unnestMultiOracle: String =
    """SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w,
         unnest(string_split(trim(text), ' ')[2:4]) AS x
       FROM documents WHERE doc_id < 30"""

  /** TRY(expr) special form (AstFunctions.h:190; Expr.h:292-299): null on
    * runtime failure — bad cast, numeric overflow — per row. */
  val tryPresto: String =
    """SELECT o_orderkey,
         TRY(CAST(substr(o_orderpriority, 1, 1) AS INTEGER)) AS maybe_int,
         TRY(CAST(substr(o_orderpriority, 3, 3) AS INTEGER)) AS bad_int,
         TRY(CAST(o_orderkey AS TINYINT)) AS small_key
       FROM orders WHERE o_orderkey < 400"""
  val tryOracle: String =
    """SELECT o_orderkey,
         TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS maybe_int,
         TRY_CAST(substr(o_orderpriority, 3, 3) AS INTEGER) AS bad_int,
         TRY_CAST(o_orderkey AS TINYINT) AS small_key
       FROM orders WHERE o_orderkey < 400"""

  /** ARRAY[..] / ROW(..) constructors + ROW type syntax in CAST
    * (AstFunctions.h:279,396). The array column is compared as its
    * canonical string form; row fields are projected out through the
    * Presto `CAST(.. AS ROW(..)).field` dereference. */
  val rowArrayPresto: String =
    """SELECT o_orderkey,
         CAST(ARRAY[o_orderkey, o_custkey, 7] AS VARCHAR) AS arr_str,
         CAST(ROW(o_orderkey, round(o_totalprice, 2)) AS ROW(k BIGINT, v DOUBLE)).v AS rv,
         element_at(ARRAY[o_orderkey, o_custkey], 2) AS second_elem
       FROM orders WHERE o_orderkey < 200"""
  val rowArrayOracle: String =
    """SELECT o_orderkey,
         CAST([o_orderkey, o_custkey, 7] AS VARCHAR) AS arr_str,
         round(o_totalprice, 2) AS rv,
         [o_orderkey, o_custkey][2] AS second_elem
       FROM orders WHERE o_orderkey < 200"""

  /** AT TIME ZONE (AstFunctions.h:355): the wall-clock in the target zone
    * of the same instant. Session zone is UTC on both engines; the DuckDB
    * twin is the double application naive→instant→target-zone naive. */
  val atTimezonePresto: String =
    """SELECT o_orderkey,
         o_orderdate AT TIME ZONE 'America/New_York' AS ny_wallclock,
         hour(o_orderdate AT TIME ZONE 'Asia/Tokyo') AS tokyo_hour
       FROM orders WHERE o_orderkey < 300"""
  val atTimezoneOracle: String =
    """SELECT o_orderkey,
         (o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ny_wallclock,
         hour((o_orderdate AT TIME ZONE 'UTC') AT TIME ZONE 'Asia/Tokyo') AS tokyo_hour
       FROM orders WHERE o_orderkey < 300"""

  private def run(presto: String)(s: SparkSession, d: String): DataFrame =
    PrestoRewriter.sql(s, d, presto)

  /** Presto INSERT INTO lowered onto the DSv2 write lifecycle: CREATE via
    * MemCatalog.createTable, INSERT through MemTable's all-or-nothing
    * BatchWrite, result read back from the committed table
    * (AstStatements.h:44-721 Insert; ConnectorMetadata.h:569-627). */
  def insertSelect(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_sink")
    PrestoRewriter.sql(s, d,
      "CREATE TABLE graft_mem.default.presto_sink (o_orderpriority VARCHAR, n BIGINT, total DOUBLE)")
    PrestoRewriter.sql(s, d,
      """INSERT INTO graft_mem.default.presto_sink
         SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderpriority""")
    s.table("graft_mem.default.presto_sink")
  }
  val insertSelectOracle: String =
    """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderpriority"""

  /** Presto CTAS (CreateTableAsSelect) with dialect constructs in the
    * SELECT — catalog createTable + write in one statement. */
  def ctas(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_ctas")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.presto_ctas AS
         SELECT o_orderpriority,
           CAST(cardinality(ARRAY[o_orderkey, o_custkey]) AS BIGINT) AS two,
           TRY(CAST(substr(o_orderpriority, 3, 1) AS INTEGER)) AS lead_digit
         FROM orders WHERE o_orderkey < 500""")
    s.table("graft_mem.default.presto_ctas")
  }
  val ctasOracle: String =
    """SELECT o_orderpriority, CAST(2 AS BIGINT) AS two,
         TRY_CAST(substr(o_orderpriority, 3, 1) AS INTEGER) AS lead_digit
       FROM orders WHERE o_orderkey < 500"""

  /** Presto DELETE statement (AstStatements.h:573 Delete) through the
    * dialect door onto the row-level copy-on-write path
    * (MemTable.newRowLevelOperationBuilder): Catalyst rewrites the
    * statement as scan → filter-out → ReplaceData on the DSv2 commit
    * protocol. The oracle replays the surviving-row predicate. */
  def deleteStmt(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_del")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.presto_del AS
         SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey < 2000""")
    PrestoRewriter.sql(s, d,
      """DELETE FROM graft_mem.default.presto_del
         WHERE o_orderpriority = '1-URGENT' OR o_totalprice > 200000.0""")
    s.table("graft_mem.default.presto_del")
  }
  val deleteOracle: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
       WHERE o_orderkey < 2000
         AND NOT (o_orderpriority = '1-URGENT' OR o_totalprice > 200000.0)"""

  /** Presto UPDATE statement (AstStatements.h:541 Update) through the
    * dialect door: same row-level rewrite, SET expressions evaluated
    * per matched row ('||' concat is a dialect-exercised operator). The
    * additive SET expression keeps both engines bit-identical (no
    * rounding seams). */
  def updateStmt(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_upd")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.presto_upd AS
         SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey < 2000""")
    PrestoRewriter.sql(s, d,
      """UPDATE graft_mem.default.presto_upd
         SET o_totalprice = o_totalprice + 1000.0,
             o_orderpriority = 'X-' || o_orderpriority
         WHERE o_orderkey % 3 = 0""")
    s.table("graft_mem.default.presto_upd")
  }
  val updateOracle: String =
    """SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'X-' || o_orderpriority
              ELSE o_orderpriority END AS o_orderpriority,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS o_totalprice
       FROM orders WHERE o_orderkey < 2000"""

  /** MERGE INTO — upsert through the same row-level rewrite (matched →
    * update, not-matched → insert). The reference's AST stops at
    * Update/Delete (AstStatements.h:541,573); MERGE is the lakehouse
    * upsert a training-data pipeline needs for canonical-record tables,
    * so it is included as an extension on the identical machinery. */
  def mergeStmt(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_merge")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.presto_merge AS
         SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey < 1000""")
    PrestoRewriter.sql(s, d,
      """MERGE INTO graft_mem.default.presto_merge t
         USING (SELECT o_orderkey, o_orderpriority, o_totalprice
                FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 1500) s
         ON t.o_orderkey = s.o_orderkey
         WHEN MATCHED THEN UPDATE SET o_totalprice = t.o_totalprice + 5000.0
         WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderpriority, o_totalprice)
           VALUES (s.o_orderkey, s.o_orderpriority, s.o_totalprice)""")
    s.table("graft_mem.default.presto_merge")
  }
  val mergeOracle: String =
    """SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey >= 500 AND o_orderkey < 1000
              THEN o_totalprice + 5000.0 ELSE o_totalprice END AS o_totalprice
       FROM orders WHERE o_orderkey < 1500"""

  /** Presto ANALYZE statement (AstStatements.h:636-659 Analyze) through
    * the dialect door: lowered to Spark `ANALYZE TABLE t COMPUTE
    * STATISTICS FOR ALL COLUMNS` — the stats-collection entry the
    * reference pairs with its sampling/history machinery. The entry
    * surfaces what the statement gathered (catalog row count + exact
    * per-column min/max) as a result row the DuckDB oracle recomputes
    * from the same data; the CBO reads the identical catalog stats at
    * plan time (plan-stats assertion in PrestoDialectSpec). */
  def analyzeStmt(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS presto_analyze_t")
    // ANALYZE needs a spark_catalog (V1) table for catalog stats, and the
    // default catalog is JVM-scoped while its managed LOCATION is not: a
    // table created in a previous JVM leaves its warehouse directory
    // behind, the DROP above no-ops (empty catalog), and CTAS refuses to
    // reuse the location. Clear the stale directory explicitly.
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.conf.warehousePath, "presto_analyze_t")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    PrestoRewriter.sql(s, d,
      """CREATE TABLE presto_analyze_t AS
         SELECT o_orderkey, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderkey < 2000""")
    PrestoRewriter.sql(s, d, "ANALYZE presto_analyze_t")
    val meta = s.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("presto_analyze_t"))
    val st = meta.stats.getOrElse(sys.error("ANALYZE gathered no table stats"))
    val nRows = st.rowCount.map(_.toLong)
      .getOrElse(sys.error("ANALYZE gathered no row count"))
    val price = st.colStats.getOrElse("o_totalprice",
      sys.error("ANALYZE FOR ALL COLUMNS gathered no o_totalprice stats"))
    import org.apache.spark.sql.functions.{col, round => sround}
    import s.implicits._
    Seq((nRows, price.min.get.toDouble, price.max.get.toDouble))
      .toDF("n_rows", "min_price", "max_price")
      .select(col("n_rows"), sround(col("min_price"), 2).as("min_price"),
        sround(col("max_price"), 2).as("max_price"))
  }
  val analyzeOracle: String =
    """SELECT count(*) AS n_rows,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price
       FROM orders WHERE o_orderkey < 2000"""

  /** Presto PREPARE / EXECUTE USING / DEALLOCATE PREPARE
    * (AstStatements.h:340-374) through the dialect door: PREPARE
    * validates and stores the parameterized body per session, EXECUTE
    * splices the USING arguments into the `?` slots token-wise and runs
    * the result through the normal lowering. The oracle runs the
    * equivalent bound query directly. */
  def prepareStmt(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d,
      """PREPARE graft_prep FROM
         SELECT n_regionkey, count(*) AS n FROM nation
         WHERE n_regionkey <= ? GROUP BY n_regionkey""")
    try PrestoRewriter.sql(s, d, "EXECUTE graft_prep USING 2")
    finally PrestoRewriter.sql(s, d, "DEALLOCATE PREPARE graft_prep")
  }
  val prepareOracle: String =
    """SELECT n_regionkey, count(*) AS n FROM nation
       WHERE n_regionkey <= 2 GROUP BY n_regionkey"""

  /** Presto `WITH RECURSIVE` (PrestoSql.g4:169 `WITH RECURSIVE?
    * namedQuery`): Spark 4 shares the syntax and executes it as an
    * iterative UnionLoop, so the dialect's job is only the usual
    * in-body lowering — the recursion form passes through. The
    * recursive relation here is a bounded month sequence that then
    * drives a real equi-join + aggregate over orders: the recursive
    * side stays tiny (12 rows, broadcastable), the fact side scans
    * once — the scale-safe way to use recursion as a dimension
    * generator. */
  val recursivePresto: String =
    """WITH RECURSIVE seq (m) AS (
         SELECT 1
         UNION ALL
         SELECT m + 1 FROM seq WHERE m < 12
       )
       SELECT m, count(o_orderkey) AS n_orders
       FROM seq LEFT JOIN orders ON month(o_orderdate) = m
       GROUP BY m"""
  val recursiveOracle: String =
    """WITH RECURSIVE seq (m) AS (
         SELECT 1
         UNION ALL
         SELECT m + 1 FROM seq WHERE m < 12
       )
       SELECT m, count(o_orderkey) AS n_orders
       FROM seq LEFT JOIN orders ON month(o_orderdate) = m
       GROUP BY m"""

  /** Presto `SHOW STATS FOR t` (PrestoSql.g4:139) — reports the
    * optimizer's estimated statistics (the ANALYZE artifact as the CBO
    * sees it). The checked projection keeps the exactly-reproducible
    * fields (null fraction, row count, min/max); NDV and data_size are
    * approximate sketches and are pinned by spec instead. */
  def showStatsStmt(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, round => sround}
    graft.plans.Analyze.table(s, graft.Catalog.load(s, d, "orders"))
    PrestoRewriter.sql(s, d, "SHOW STATS FOR orders")
      .filter(col("column_name").isin("o_orderkey", "o_custkey", "o_totalprice") ||
        col("column_name").isNull)
      .select(col("column_name"),
        sround(col("nulls_fraction"), 4).as("nulls_fraction"),
        col("row_count"),
        sround(expr("CAST(low_value AS DOUBLE)"), 2).as("low_v"),
        sround(expr("CAST(high_value AS DOUBLE)"), 2).as("high_v"))
  }
  val showStatsOracle: String =
    """SELECT 'o_orderkey' AS column_name,
         round(1.0 - CAST(count(o_orderkey) AS DOUBLE) / count(*), 4) AS nulls_fraction,
         CAST(NULL AS DOUBLE) AS row_count,
         round(CAST(min(o_orderkey) AS DOUBLE), 2) AS low_v,
         round(CAST(max(o_orderkey) AS DOUBLE), 2) AS high_v FROM orders
       UNION ALL
       SELECT 'o_custkey',
         round(1.0 - CAST(count(o_custkey) AS DOUBLE) / count(*), 4),
         CAST(NULL AS DOUBLE),
         round(CAST(min(o_custkey) AS DOUBLE), 2),
         round(CAST(max(o_custkey) AS DOUBLE), 2) FROM orders
       UNION ALL
       SELECT 'o_totalprice',
         round(1.0 - CAST(count(o_totalprice) AS DOUBLE) / count(*), 4),
         CAST(NULL AS DOUBLE),
         round(CAST(min(o_totalprice) AS DOUBLE), 2),
         round(CAST(max(o_totalprice) AS DOUBLE), 2) FROM orders
       UNION ALL
       SELECT NULL, CAST(NULL AS DOUBLE), CAST(count(*) AS DOUBLE),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM orders"""

  /** The round-9 url_extract_* family end-to-end: URLs are synthesized
    * from key columns, so the DuckDB oracle derives every expected part
    * directly from the same columns — an independent implementation, not
    * a replay of the parsing. */
  val urlFnsPresto: String =
    """SELECT o_orderkey AS k,
         url_extract_host('https://ex' || CAST(o_orderkey % 3 AS VARCHAR)
           || '.com:8080/p/' || CAST(o_orderkey AS VARCHAR)
           || '?q=' || CAST(o_custkey AS VARCHAR)) AS host,
         url_extract_port('https://ex.com:' || CAST(8000 + o_orderkey % 100 AS VARCHAR) || '/x') AS port,
         url_extract_path('https://ex.com/p/' || CAST(o_orderkey AS VARCHAR)) AS path,
         url_extract_parameter('https://ex.com/p?q=' || CAST(o_custkey AS VARCHAR) || '&r=2', 'q') AS q
       FROM orders WHERE o_orderkey < 100"""
  val urlFnsOracle: String =
    """SELECT o_orderkey AS k,
         'ex' || CAST(o_orderkey % 3 AS VARCHAR) || '.com' AS host,
         8000 + o_orderkey % 100 AS port,
         '/p/' || CAST(o_orderkey AS VARCHAR) AS path,
         CAST(o_custkey AS VARCHAR) AS q
       FROM orders WHERE o_orderkey < 100"""

  /** `IS [NOT] DISTINCT FROM` — the everyday Presto null-safe comparison
    * (the reference's grammar parses it — AstExpressions.h comparison
    * quantifiers — but its optimizer NYIs it: PrestoParser.cpp:239; this
    * engine runs it). Spark's parser accepts the operator natively and
    * lowers it to null-safe equality (`<=>`), which stays a hash-joinable
    * equi-key — so the null-bucket join below is a real shuffled-hash/
    * broadcast join, not a cartesian. Keys are NULL-bearing by
    * construction (nullif) and the filter exercises both polarities. */
  val isDistinctPresto: String =
    """SELECT a.k AS k, count(*) AS n_pairs
       FROM (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) a
       JOIN (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) b
         ON a.k IS NOT DISTINCT FROM b.k
       WHERE a.k IS DISTINCT FROM 3
       GROUP BY a.k"""
  val isDistinctOracle: String =
    """SELECT a.k AS k, count(*) AS n_pairs
       FROM (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) a
       JOIN (SELECT nullif(mod(o_orderkey, 7), 0) AS k FROM orders WHERE o_orderkey < 500) b
         ON a.k IS NOT DISTINCT FROM b.k
       WHERE a.k IS DISTINCT FROM 3
       GROUP BY a.k"""

  /** Quantified comparisons over real tables — `ANY`/`SOME`/`ALL`
    * subquery predicates (the reference parses them,
    * AstExpressions.h:404, but NYIs the lowering; Spark has no native
    * syntax — the dialect lowers them, PrestoDialect.rewriteQuantifiedCmp).
    * The inner projection computes each quantified predicate per row
    * (witness, counterexample, NULL-element via nullif, empty-set
    * identity); the outer aggregate folds them into oracle-stable
    * counts. DuckDB evaluates the same text natively. */
  val quantifiedPresto: String =
    """SELECT
         CAST(sum(CASE WHEN gt_any THEN 1 ELSE 0 END) AS BIGINT) AS n_gt_any,
         CAST(sum(CASE WHEN le_all THEN 1 ELSE 0 END) AS BIGINT) AS n_le_all,
         CAST(sum(CASE WHEN eq_any THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_any,
         CAST(sum(CASE WHEN ne_all THEN 1 WHEN ne_all IS NULL THEN 10000 ELSE 0 END) AS BIGINT) AS ne_all_mix,
         CAST(sum(CASE WHEN empty_all THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_all
       FROM (
         SELECT
           o_totalprice > ANY (SELECT o_totalprice FROM orders WHERE o_orderkey < 100) AS gt_any,
           o_totalprice <= ALL (SELECT o_totalprice FROM orders WHERE o_orderkey < 100) AS le_all,
           o_custkey = ANY (SELECT o_custkey FROM orders WHERE o_orderkey < 50) AS eq_any,
           o_custkey <> ALL (SELECT nullif(o_custkey, o_custkey % 7) FROM orders WHERE o_orderkey < 50) AS ne_all,
           o_totalprice > ALL (SELECT o_totalprice FROM orders WHERE o_orderkey < 0) AS empty_all
         FROM orders) t"""

  /** cosine_similarity (dense array form) against DuckDB's native
    * list_cosine_similarity — each embedding scored against its own
    * reversal (deterministic, needs no join). Rounded to 6 digits to
    * absorb summation-order difference between the implementations. */
  val cosinePresto: String =
    """SELECT vec_id, round(cosine_similarity(embedding, reverse(embedding)), 6) AS cos_rev
       FROM embeddings WHERE vec_id < 200"""
  val cosineOracle: String =
    """SELECT vec_id,
         round(list_cosine_similarity(embedding::DOUBLE[], list_reverse(embedding)::DOUBLE[]), 6) AS cos_rev
       FROM embeddings WHERE vec_id < 200"""

  /** The Presto HLL workflow — approx_set per group, merge across
    * groups, cardinality as the estimate reader. At these cardinalities
    * (5 langs, 20 sources) the datasketches HLL is still in exact
    * (coupon) mode, so the estimates equal DuckDB's exact distinct
    * counts and the entry is hash-checkable; the approximate regime is
    * pinned in FunctionParitySpec instead. */
  val hllPresto: String =
    """SELECT source AS grp, cardinality(approx_set(lang)) AS n_langs
       FROM documents GROUP BY source
       UNION ALL
       SELECT 'ALL', cardinality(merge(s))
       FROM (SELECT approx_set(lang) AS s FROM documents GROUP BY source)"""
  val hllOracle: String =
    """SELECT source AS grp, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       FROM documents GROUP BY source
       UNION ALL
       SELECT 'ALL', CAST(count(DISTINCT lang) AS BIGINT) FROM documents"""

  /** Set aggregates + reduce_agg + split_to_map in one pass: set_agg /
    * set_union return the sorted-distinct refinement (Presto leaves
    * order unspecified), reduce_agg folds through the dialect's lambda
    * syntax, split_to_map parses k=v text. Array outputs are joined to
    * strings and the map is read back through element_at, because the
    * driver compare hashes scalar columns. */
  val setOpsPresto: String =
    """SELECT source,
         array_join(set_agg(lang), ',') AS langs,
         array_join(set_union(split(lang || '-' || lang || 'x', '-')), ',') AS lang_parts,
         reduce_agg(n_chars, CAST(0 AS BIGINT), (s, x) -> s + x, (a, b) -> a + b) AS total_chars,
         element_at(split_to_map('src=' || min(source) || ',n=' || CAST(count(*) AS VARCHAR), ',', '='), 'n') AS n_str
       FROM documents GROUP BY source"""
  val setOpsOracle: String =
    """SELECT source,
         array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
         array_to_string(list_sort(list_distinct(flatten(list(string_split(lang || '-' || lang || 'x', '-'))))), ',') AS lang_parts,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(count(*) AS VARCHAR) AS n_str
       FROM documents GROUP BY source"""

  /** GROUPING SETS / ROLLUP / CUBE through the dialect (reference
    * grammar PrestoSql.g4:284-290): Spark's syntax is compatible so the
    * rewriter passes all three through untouched; grouping(col) flags
    * disambiguate the NULL-filled super-aggregate rows on both sides. */
  val groupingSetsPresto: String =
    """SELECT 'gs' AS tier, source, lang,
         CAST(grouping(source) AS INT) AS g_source, CAST(grouping(lang) AS INT) AS g_lang,
         count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
       FROM documents GROUP BY GROUPING SETS ((source, lang), (source), ())
       UNION ALL
       SELECT 'rollup' AS tier, source, lang,
         CAST(grouping(source) AS INT), CAST(grouping(lang) AS INT),
         count(*), CAST(sum(n_chars) AS BIGINT)
       FROM documents GROUP BY ROLLUP (source, lang)
       UNION ALL
       SELECT 'cube' AS tier, source, lang,
         CAST(grouping(source) AS INT), CAST(grouping(lang) AS INT),
         count(*), CAST(sum(n_chars) AS BIGINT)
       FROM documents GROUP BY CUBE (source, lang)"""
  val groupingSetsOracle: String = groupingSetsPresto

  /** Window functions through the dialect as SQL TEXT (reference grammar
    * PrestoSql.g4:504 `OVER '('`): ranking, ROWS and RANGE frames, a
    * named WINDOW clause, and IGNORE NULLS. Presto/Spark spell
    * ignore-nulls postfix (`lag(x) IGNORE NULLS OVER`); DuckDB spells it
    * inside the call (`lag(x IGNORE NULLS) OVER`) — the oracle adapts.
    * o_orderkey is unique, so every window is deterministic. */
  val windowPresto: String =
    """SELECT o_orderkey, o_orderpriority,
         rank() OVER w AS rnk,
         row_number() OVER w AS rn,
         round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS run_sum,
         CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cnt,
         lag(nullif(o_orderstatus, 'O')) IGNORE NULLS OVER w AS prev_nonopen
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)"""
  val windowOracle: String =
    """SELECT o_orderkey, o_orderpriority,
         rank() OVER w AS rnk,
         row_number() OVER w AS rn,
         round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS run_sum,
         CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_cnt,
         lag(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER w AS prev_nonopen
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)"""

  /** GROUPS window frame as dialect TEXT (round 12, PrestoSql.g4:
    * 514-517): the rewriter routes `OVER (… GROUPS BETWEEN …)` to the
    * dense_rank→RANGE lowering inside a wrapped subquery
    * ([[graft.sql.PrestoDialect.rewriteGroupsFrame]]). Neither Spark
    * nor DuckDB parses GROUPS, so the oracle spells the identity out
    * explicitly — still an independent engine check of the values. */
  val windowGroupsPresto: String =
    """SELECT o_orderkey, o_orderpriority,
         round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority
           ORDER BY date_trunc('day', o_orderdate)
           GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS gsum,
         CAST(count(*) OVER (PARTITION BY o_orderpriority
           ORDER BY date_trunc('day', o_orderdate)
           GROUPS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS BIGINT) AS gcnt
       FROM orders
       WHERE o_orderkey < 2000"""
  val windowGroupsOracle: String =
    """WITH r AS (
         SELECT o_orderkey, o_orderpriority, o_totalprice,
                dense_rank() OVER (PARTITION BY o_orderpriority
                  ORDER BY date_trunc('day', o_orderdate)) AS dr
         FROM orders WHERE o_orderkey < 2000)
       SELECT o_orderkey, o_orderpriority,
         round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY dr
           RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS gsum,
         CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY dr
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS BIGINT) AS gcnt
       FROM r"""

  /** TRY around quantified comparisons (round-10 VERDICT #7): the CASE
    * lowering's operand evaluates inside TryEval, so a runtime error
    * (ANSI mod-by-zero here) yields NULL per row while clean rows get
    * the exact quantified semantics. DuckDB runs ANY/ALL natively and
    * its mod(x, 0) is NULL, which propagates to the same NULLs. */
  val tryQuantifiedPresto: String =
    """SELECT o_orderkey,
         CAST(TRY(mod(100, o_orderkey % 7) > ALL (SELECT v FROM (VALUES (1), (2), (3)) t(v))) AS VARCHAR) AS all_gt,
         CAST(TRY(mod(100, o_orderkey % 7) < ANY (SELECT v FROM (VALUES (5), (50)) t(v))) AS VARCHAR) AS any_lt
       FROM orders WHERE o_orderkey < 300"""
  // booleans travel as VARCHAR so a NULL (caught error) stays distinct
  // from FALSE under the driver's canonicalized hash compare
  val tryQuantifiedOracle: String =
    """SELECT o_orderkey,
         CAST(mod(100, o_orderkey % 7) > ALL (SELECT v FROM (VALUES (1), (2), (3)) t(v)) AS VARCHAR) AS all_gt,
         CAST(mod(100, o_orderkey % 7) < ANY (SELECT v FROM (VALUES (5), (50)) t(v)) AS VARCHAR) AS any_lt
       FROM orders WHERE o_orderkey < 300"""

  /** Quantile sketches (round 11): qdigest_agg / value_at_quantile /
    * quantile_at_value, KLL-backed. Groups of ~155 rows at sf0.01 stay
    * under the sketch's k=200, so the sketch is in EXACT mode and the
    * inclusive-rank semantics equal `min(v) where cume_dist >= q` — the
    * DuckDB oracle computes exactly that. */
  val qdigestPresto: String =
    """SELECT o_custkey % 97 AS g,
         round(value_at_quantile(qdigest_agg(o_totalprice), 0.5), 2) AS p50,
         round(value_at_quantile(qdigest_agg(o_totalprice), 0.95), 2) AS p95,
         round(quantile_at_value(qdigest_agg(o_totalprice), 10000.0), 4) AS r10k,
         CAST(count(*) AS BIGINT) AS n
       FROM orders GROUP BY o_custkey % 97"""
  val qdigestOracle: String =
    """WITH r AS (SELECT o_custkey % 97 AS g, o_totalprice AS v,
                  cume_dist() OVER (PARTITION BY o_custkey % 97 ORDER BY o_totalprice) AS cd
           FROM orders)
       SELECT g,
         round(min(CASE WHEN cd >= 0.5 THEN v END), 2) AS p50,
         round(min(CASE WHEN cd >= 0.95 THEN v END), 2) AS p95,
         round(CAST(sum(CASE WHEN v <= 10000.0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS r10k,
         CAST(count(*) AS BIGINT) AS n
       FROM r GROUP BY g"""

  /** merge() over quantile sketches (the overload the reference's Presto
    * registry carries): sub-aggregate per bucket, union the sketches,
    * read the merged quantiles. 180 total rows <= k keeps the merged
    * sketch exact. merge() over HLL stays covered by presto_hll_distinct
    * — same function, runtime family dispatch. */
  val qdigestMergePresto: String =
    """SELECT round(value_at_quantile(merge(s), 0.5), 2) AS p50m,
              round(value_at_quantile(merge(s), 0.9), 2) AS p90m
       FROM (SELECT qdigest_agg(o_totalprice) AS s FROM orders
             WHERE o_orderkey < 180 GROUP BY o_orderkey % 4) t"""
  val qdigestMergeOracle: String =
    """WITH r AS (SELECT o_totalprice AS v, cume_dist() OVER (ORDER BY o_totalprice) AS cd
           FROM orders WHERE o_orderkey < 180)
       SELECT round(min(CASE WHEN cd >= 0.5 THEN v END), 2) AS p50m,
              round(min(CASE WHEN cd >= 0.9 THEN v END), 2) AS p90m
       FROM r"""

  /** Real t-digest (round 12, Dunning & Ertl): min/max are EXACT
    * (getQuantile(0)/(1) return the tracked extremes), interior
    * quantiles are interpolated — oracled as closed-form exactness plus
    * tolerance booleans over a deterministic 1..1000 sequence; the
    * merge() path unions per-group partials back to the exact max. */
  val tdigestPresto: String =
    """WITH src AS (SELECT CAST(o_orderkey AS DOUBLE) AS x FROM orders
                    WHERE o_orderkey BETWEEN 1 AND 1000),
         parts AS (SELECT CAST(x AS BIGINT) % 4 AS g, tdigest_agg(x) AS td
                   FROM src GROUP BY CAST(x AS BIGINT) % 4)
       SELECT round(value_at_quantile(td, 0.0), 2) AS q_min,
              round(value_at_quantile(td, 1.0), 2) AS q_max,
              abs(value_at_quantile(td, 0.5) - 500.5) < 25.0 AS median_ok,
              abs(value_at_quantile(td, 0.999) - 999.0) < 2.0 AS tail_ok,
              abs(quantile_at_value(td, 100.0) - 0.1) < 0.005 AS rank_ok,
              (SELECT round(value_at_quantile(merge(td), 1.0), 2)
               FROM parts) AS merged_max
       FROM (SELECT tdigest_agg(x) AS td FROM src) s"""
  val tdigestOracle: String =
    """SELECT 1.0 AS q_min, 1000.0 AS q_max, true AS median_ok,
              true AS tail_ok, true AS rank_ok, 1000.0 AS merged_max"""

  /** CORRELATED quantified comparisons (round 11): the same CASE-over-
    * scalar-aggregates lowering, with the correlation left inside the
    * spliced subqueries — Spark's subquery decorrelation turns each into
    * an aggregated outer join (count-bug-correct: an outer row with no
    * matches sees count 0 and hits the quantifier identity). The
    * reference NYIs ALL quantified comparisons; DuckDB runs the
    * correlated forms natively as the oracle. The l_quantity > 30 filter
    * makes some inner sets EMPTY so the identity branch is exercised. */
  val quantifiedCorrPresto: String =
    """SELECT o_orderkey,
         CAST(o_totalprice > ALL (SELECT l_extendedprice * 20 FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 30) AS VARCHAR) AS gt_all,
         CAST(o_totalprice < ANY (SELECT l_extendedprice FROM lineitem l
                                  WHERE l.l_orderkey = o.o_orderkey) AS VARCHAR) AS lt_any
       FROM orders o WHERE o_orderkey < 300"""

  /** SQL routine through the dialect (round 11, PrestoSql.g4
    * #createFunction): CREATE FUNCTION with Presto characteristics runs
    * as a Spark SQL UDF (null-call clause dropped by the dialect); the
    * oracle inlines the routine body. */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d,
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(p DOUBLE, disc DOUBLE)
         RETURNS DOUBLE LANGUAGE SQL DETERMINISTIC RETURNS NULL ON NULL INPUT
         RETURN p * (1 - disc)""").collect()
    PrestoRewriter.sql(s, d,
      """SELECT l_orderkey, round(sum(graft_margin(l_extendedprice, l_discount)), 2) AS rev
         FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey""")
  }
  val sqlUdfOracle: String =
    """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
       FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey"""

  /** Time travel (round 11, PrestoSql.g4:561-568): every committed
    * mutation on a graft-mem table is a numbered snapshot; Presto's
    * FOR VERSION AS OF / FOR VERSION BEFORE read them back through
    * Spark's DSv2 loadTable(ident, version). Version numbering is
    * deterministic: v1 = CREATE (empty), v2 = CTAS rows, v3 = INSERT,
    * v4 = DELETE's copy-on-write replacement. */
  def timeTravel(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.presto_tv")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.presto_tv AS
         SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey < 50""")
    PrestoRewriter.sql(s, d,
      """INSERT INTO graft_mem.default.presto_tv
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey >= 50 AND o_orderkey < 80""")
    PrestoRewriter.sql(s, d,
      "DELETE FROM graft_mem.default.presto_tv WHERE k < 10")
    PrestoRewriter.sql(s, d,
      """SELECT 'ctas' AS tag, CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total
         FROM graft_mem.default.presto_tv FOR VERSION AS OF 2
         UNION ALL
         SELECT 'ins', CAST(count(*) AS BIGINT), round(sum(v), 2)
         FROM graft_mem.default.presto_tv FOR SYSTEM_VERSION AS OF 3
         UNION ALL
         SELECT 'del', CAST(count(*) AS BIGINT), round(sum(v), 2)
         FROM graft_mem.default.presto_tv
         UNION ALL
         SELECT 'before', CAST(count(*) AS BIGINT), round(sum(v), 2)
         FROM graft_mem.default.presto_tv FOR VERSION BEFORE 3""")
  }
  val timeTravelOracle: String =
    """SELECT 'ctas' AS tag, CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders WHERE o_orderkey < 50
       UNION ALL
       SELECT 'ins', CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
       FROM orders WHERE o_orderkey < 80
       UNION ALL
       SELECT 'del', CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
       FROM orders WHERE o_orderkey >= 10 AND o_orderkey < 80
       UNION ALL
       SELECT 'before', CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
       FROM orders WHERE o_orderkey < 50"""

  /** approx_most_frequent through the SQL surface (round 11): the
    * Misra–Gries aggregator called by its Presto signature, the map
    * result exploded Presto-style via CROSS JOIN UNNEST. Capacity 64 >
    * distinct langs → exact regime → hash-checkable against the exact
    * top-3 (count desc, value asc tie-break). */
  val approxFrequentPresto: String =
    """SELECT source, lang, cnt
       FROM (SELECT source, approx_most_frequent(3, lang, 64) AS top
             FROM documents GROUP BY source) t
       CROSS JOIN UNNEST(top) AS u(lang, cnt)"""
  val approxFrequentOracle: String =
    """SELECT source, lang, cnt FROM (
         SELECT source, lang, count(*) AS cnt,
                row_number() OVER (PARTITION BY source
                                   ORDER BY count(*) DESC, lang) AS rk
         FROM documents GROUP BY source, lang) t
       WHERE rk <= 3"""

  /** Presto JSON family (round 11, tail widened round 17) over the
    * events props column: json_extract (subtree text),
    * json_extract_scalar, json_size (field/element counts),
    * json_parse→json_format canonicalization, json_array_contains,
    * is_json_scalar (props is an object → false; its $.k subtree is a
    * number → true), json_array_get (negative index, raw-string quirk).
    * DuckDB's bundled json extension is the oracle (json_keys length ≡
    * json_size('$')). */
  val jsonFnsPresto: String =
    """SELECT event_type,
         count(json_extract(props, '$.k')) AS n_k,
         max(CAST(json_extract_scalar(props, '$.k') AS INTEGER)) AS max_k,
         CAST(sum(json_size(props, '$')) AS BIGINT) AS total_fields,
         min(json_format(json_parse(props))) AS first_canon,
         sum(CASE WHEN json_array_contains('[1, 2, 3]', 2) THEN 1 ELSE 0 END) AS arr_hits,
         sum(CASE WHEN is_json_scalar(json_extract(props, '$.k'))
                   AND NOT is_json_scalar(props) THEN 1 ELSE 0 END) AS scalar_hits,
         min(json_array_get('[10, {"a": 1}, "text"]', -1)) AS arr_last,
         min(json_array_get('[10, {"a": 1}, "text"]', 1)) AS arr_obj,
         count(json_array_get('[10]', 5)) AS arr_oob
       FROM events GROUP BY event_type"""
  val jsonFnsOracle: String =
    """SELECT event_type,
         count(json_extract(props, '$.k')) AS n_k,
         max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
         CAST(sum(len(json_keys(props))) AS BIGINT) AS total_fields,
         min(CAST(json_extract(props, '$') AS VARCHAR)) AS first_canon,
         CAST(count(*) AS BIGINT) AS arr_hits,
         CAST(count(*) AS BIGINT) AS scalar_hits,
         'text' AS arr_last,
         '{"a":1}' AS arr_obj,
         CAST(0 AS BIGINT) AS arr_oob
       FROM events GROUP BY event_type"""

  /** Materialized views (round 11, PrestoSql.g4:88-92): CREATE
    * materializes into a graft-mem backing table; the view then serves
    * STORED data — the base-table INSERT after the build must NOT show
    * up — until `REFRESH ... WHERE pred` recomputes exactly the
    * predicate's slice (Presto's partition-scoped refresh). Final
    * state: status 'O' groups reflect base < 2000, every other status
    * still reflects base < 1000 — the oracle computes that split
    * directly from parquet. */
  def matView(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP MATERIALIZED VIEW IF EXISTS graft_mv_rev")
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.mv_orders")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.mv_orders AS
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey < 1000""")
    PrestoRewriter.sql(s, d,
      """CREATE MATERIALIZED VIEW graft_mv_rev
         COMMENT 'revenue by status' AS
         SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM graft_mem.default.mv_orders GROUP BY o_orderstatus""")
    // mutate the base AFTER materialization: the view keeps serving the
    // stored rows (staleness is the contract)
    PrestoRewriter.sql(s, d,
      """INSERT INTO graft_mem.default.mv_orders
         SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE o_orderkey >= 1000 AND o_orderkey < 2000""")
    PrestoRewriter.sql(s, d, "REFRESH MATERIALIZED VIEW graft_mv_rev WHERE st = 'O'")
    PrestoRewriter.sql(s, d, "SELECT st, n, total FROM graft_mv_rev ORDER BY st")
  }
  val matViewOracle: String =
    """SELECT st, n, total FROM (
         SELECT o_orderstatus AS st, CAST(count(*) AS BIGINT) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders WHERE o_orderkey < 2000 AND o_orderstatus = 'O' GROUP BY 1
         UNION ALL
         SELECT o_orderstatus, CAST(count(*) AS BIGINT), round(sum(o_totalprice), 2)
         FROM orders WHERE o_orderkey < 1000 AND o_orderstatus <> 'O' GROUP BY 1
       ) ORDER BY st"""

  /** Transactions over the graft-mem connector (round 11,
    * PrestoSql.g4:151-153): START TRANSACTION records every table's
    * committed snapshot; the INSERT/UPDATE/CTAS inside the first
    * transaction are wiped by ROLLBACK (snapshot restore + born-in-txn
    * drop), the DELETE inside the second survives COMMIT. Final state =
    * orders < 100 minus k >= 50 — the oracle computes it directly. */
  def transaction(s: SparkSession, d: String): DataFrame = {
    s.conf.unset(graft.sql.PrestoParser.TxnConf) // no txn leaks between runs
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.txn_acct")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.txn_acct AS
         SELECT o_orderkey AS k, o_totalprice AS bal FROM orders
         WHERE o_orderkey < 100""")
    PrestoRewriter.sql(s, d,
      "START TRANSACTION ISOLATION LEVEL READ COMMITTED, READ WRITE")
    PrestoRewriter.sql(s, d,
      """INSERT INTO graft_mem.default.txn_acct
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey >= 100 AND o_orderkey < 200""")
    PrestoRewriter.sql(s, d,
      "UPDATE graft_mem.default.txn_acct SET bal = bal * 2 WHERE k < 50")
    PrestoRewriter.sql(s, d,
      "CREATE TABLE graft_mem.default.txn_scratch AS SELECT 1 AS x")
    PrestoRewriter.sql(s, d, "ROLLBACK")
    PrestoRewriter.sql(s, d, "START TRANSACTION")
    PrestoRewriter.sql(s, d, "DELETE FROM graft_mem.default.txn_acct WHERE k >= 50")
    PrestoRewriter.sql(s, d, "COMMIT WORK")
    PrestoRewriter.sql(s, d,
      """SELECT CAST(count(*) AS BIGINT) AS n, round(sum(bal), 2) AS total
         FROM graft_mem.default.txn_acct""")
  }
  val transactionOracle: String =
    """SELECT CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders WHERE o_orderkey < 50"""

  /** ALTER TABLE constraint family (round 12, PrestoSql.g4:69-78):
    * ALTER COLUMN SET NOT NULL enforced on the write path (a NULL
    * insert is rejected and nothing commits), DROP NOT NULL re-admits
    * NULLs, and ADD CONSTRAINT surfaces through SHOW CREATE TABLE. */
  def notNull(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.nn_t")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.nn_t AS
         SELECT o_orderkey AS k, o_orderpriority AS p FROM orders
         WHERE o_orderkey < 20""")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.nn_t ALTER COLUMN p SET NOT NULL")
    val rejected =
      try {
        PrestoRewriter.sql(s, d,
          "INSERT INTO graft_mem.default.nn_t VALUES (100, CAST(NULL AS VARCHAR))")
        false
      } catch { case _: Throwable => true }
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.nn_t ALTER COLUMN p DROP NOT NULL")
    PrestoRewriter.sql(s, d,
      "INSERT INTO graft_mem.default.nn_t VALUES (100, CAST(NULL AS VARCHAR))")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.nn_t ADD CONSTRAINT nn_pk PRIMARY KEY (k)")
    val ddl = PrestoRewriter.sql(s, d,
      "SHOW CREATE TABLE graft_mem.default.nn_t").head().getString(0)
    PrestoRewriter.sql(s, d,
      s"""SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count_if(p IS NULL) AS BIGINT) AS nulls,
                 $rejected AS rejected,
                 ${ddl.contains("nn_pk")} AS ddl_has_constraint
          FROM graft_mem.default.nn_t""")
  }
  val notNullOracle: String =
    """SELECT CAST(count(*) + 1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS nulls,
              true AS rejected, true AS ddl_has_constraint
       FROM orders WHERE o_orderkey < 20"""

  /** Catalog browsing (round 11, PrestoSql.g4:131-137): SHOW TABLES
    * with Presto's SQL-LIKE pattern (ESCAPE included — Spark's native
    * SHOW TABLES is glob-based and cannot express an escaped `_`), and
    * SHOW COLUMNS in Presto's four-column shape, stitched into one
    * deterministic result. */
  def showTables(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.shl_alpha")
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.shl_beta")
    PrestoRewriter.sql(s, d,
      "CREATE TABLE graft_mem.default.shl_alpha AS SELECT 1 AS a")
    PrestoRewriter.sql(s, d,
      "CREATE TABLE graft_mem.default.shl_beta AS SELECT 'x' AS s, CAST(2 AS BIGINT) AS v")
    val tables = PrestoRewriter.sql(s, d,
      "SHOW TABLES FROM graft_mem.default LIKE 'shl!_%' ESCAPE '!'")
    val cols = PrestoRewriter.sql(s, d,
      "SHOW COLUMNS FROM graft_mem.default.shl_beta")
    tables.selectExpr("table_name AS item", "'table' AS kind")
      .unionAll(cols.selectExpr("column_name AS item", "type AS kind"))
  }
  val showTablesOracle: String =
    """SELECT * FROM (VALUES ('shl_alpha', 'table'), ('shl_beta', 'table'),
                             ('s', 'string'), ('v', 'bigint')) AS t(item, kind)"""

  /** Digest + byte-order family (round 11, PrestoFns2): Presto digests
    * return VARBINARY — rendered via to_hex against DuckDB's hex-text
    * digests — and the big-endian/IEEE-754 conversions round-trip. */
  val digestFnsPresto: String =
    """SELECT o_orderkey,
         lower(to_hex(md5(to_utf8(o_orderpriority)))) AS md5h,
         lower(to_hex(sha256(to_utf8(o_orderpriority)))) AS sha256h,
         from_big_endian_64(to_big_endian_64(o_orderkey)) AS be_rt,
         round(from_ieee754_64(to_ieee754_64(o_totalprice)), 2) AS ie_rt
       FROM orders WHERE o_orderkey < 200"""
  val digestFnsOracle: String =
    """SELECT o_orderkey, md5(o_orderpriority) AS md5h,
         lower(sha256(o_orderpriority)) AS sha256h,
         o_orderkey AS be_rt, round(o_totalprice, 2) AS ie_rt
       FROM orders WHERE o_orderkey < 200"""

  /** Regexp family (round 11): Presto regexp_extract defaults to group
    * 0 with NULL on no-match; regexp_split keeps empty fields. DuckDB
    * runs its native RE2 twins (nullif models the no-match NULL). */
  val regexpFnsPresto: String =
    """SELECT doc_id,
         CAST(cardinality(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
         regexp_extract(text, '[A-Za-z]{7,}') AS first_long,
         CAST(cardinality(regexp_split(text, '\\s+')) AS BIGINT) AS n_parts
       FROM documents WHERE doc_id < 200"""
  val regexpFnsOracle: String =
    """SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
         nullif(regexp_extract(text, '[A-Za-z]{7,}'), '') AS first_long,
         len(string_split_regex(text, '\s+')) AS n_parts
       FROM documents WHERE doc_id < 200"""

  /** Array utility tail (round 11): sum/average/cum_sum/duplicates/
    * normalize over small constructed arrays — the oracle replays the
    * closed-form arithmetic (and DuckDB list lambdas for duplicates). */
  val arrayFnsPresto: String =
    """SELECT l_orderkey, l_linenumber,
         round(array_sum(ARRAY[l_quantity, l_discount]), 4) AS s,
         round(array_average(ARRAY[l_quantity, l_discount]), 4) AS av,
         round(element_at(array_cum_sum(ARRAY[l_quantity, l_discount, l_tax]), 2), 4) AS cs2,
         round(element_at(array_cum_sum(ARRAY[l_quantity, l_discount, l_tax]), 3), 4) AS cs3,
         array_join(array_sort(array_duplicates(ARRAY[l_returnflag, l_linestatus, 'N'])), ',') AS dup,
         array_has_duplicates(ARRAY[l_returnflag, l_linestatus]) AS hd,
         round(element_at(array_normalize(ARRAY[l_quantity, l_discount], 1), 2), 6) AS an2,
         array_join(trim_array(ARRAY[l_returnflag, l_linestatus, 'X'], 1), ',') AS ta
       FROM lineitem WHERE l_orderkey < 100"""
  val arrayFnsOracle: String =
    """SELECT l_orderkey, l_linenumber,
         round(l_quantity + l_discount, 4) AS s,
         round((l_quantity + l_discount) / 2, 4) AS av,
         round(l_quantity + l_discount, 4) AS cs2,
         round(l_quantity + l_discount + l_tax, 4) AS cs3,
         coalesce(list_aggregate(list_sort(list_distinct(list_filter([l_returnflag, l_linestatus, 'N'],
           x -> len(list_filter([l_returnflag, l_linestatus, 'N'], y -> y = x)) > 1))),
           'string_agg', ','), '') AS dup,
         l_returnflag = l_linestatus AS hd,
         round(l_discount / (l_quantity + l_discount), 6) AS an2,
         l_returnflag || ',' || l_linestatus AS ta
       FROM lineitem WHERE l_orderkey < 100"""

  /** Distribution CDFs + Wilson intervals (round 11, commons-math3
    * behind DistFn): DuckDB recomputes the Poisson/binomial CDFs as
    * explicit lgamma sums and Wilson in closed form. */
  val distFnsPresto: String =
    """SELECT o_orderkey,
         round(poisson_cdf(3.0, CAST(o_orderkey % 5 AS INTEGER)), 8) AS pc,
         round(binomial_cdf(10, 0.5, CAST(o_orderkey % 11 AS INTEGER)), 7) AS bc,
         round(wilson_interval_lower(o_orderkey % 50, 50, 1.96), 8) AS wl,
         round(wilson_interval_upper(o_orderkey % 50, 50, 1.96), 8) AS wu
       FROM orders WHERE o_orderkey < 300"""
  val distFnsOracle: String =
    """SELECT o_orderkey,
         round(sum(CASE WHEN i <= o_orderkey % 5
                        THEN exp(-3.0 + i * ln(3.0) - lgamma(i + 1.0)) ELSE 0 END), 8) AS pc,
         round(sum(CASE WHEN i <= o_orderkey % 11
                        THEN exp(lgamma(11.0) - lgamma(i + 1.0) - lgamma(11.0 - i)
                                 + 10 * ln(0.5)) ELSE 0 END), 7) AS bc,
         round(min(((o_orderkey % 50) / 50.0 + 1.96 * 1.96 / 100
                - 1.96 * sqrt(((o_orderkey % 50) / 50.0) * (1 - (o_orderkey % 50) / 50.0) / 50
                              + 1.96 * 1.96 / 10000)) / (1 + 1.96 * 1.96 / 50)), 8) AS wl,
         round(min(((o_orderkey % 50) / 50.0 + 1.96 * 1.96 / 100
                + 1.96 * sqrt(((o_orderkey % 50) / 50.0) * (1 - (o_orderkey % 50) / 50.0) / 50
                              + 1.96 * 1.96 / 10000)) / (1 + 1.96 * 1.96 / 50)), 8) AS wu
       FROM orders, generate_series(0, 10) t(i)
       WHERE o_orderkey < 300 GROUP BY o_orderkey"""

  /** Map utility tail (round 11): top-n selection, subsetting, null
    * scrubbing, normalization, and the scalar multimap constructor —
    * DuckDB replays each with explicit logic. Presto's MAP(keys,
    * values) constructor itself is under test (Spark's map() takes
    * interleaved pairs). */
  val mapFnsPresto: String =
    """SELECT l_orderkey, l_linenumber,
         array_join(array_sort(map_keys(map_top_n(
           MAP(ARRAY['q', 'd', 't'], ARRAY[l_quantity, l_discount, l_tax]), 2))), ',') AS top2,
         CAST(cardinality(map_remove_null_values(
           MAP(ARRAY['a', 'b'], ARRAY[l_quantity, NULL]))) AS BIGINT) AS n_nonnull,
         array_join(array_sort(map_keys(map_subset(
           MAP(ARRAY['q', 'd', 't'], ARRAY[1, 2, 3]), ARRAY['q', 't', 'zz']))), ',') AS sub,
         round(element_at(map_normalize(
           MAP(ARRAY['q', 'd'], ARRAY[l_quantity, l_discount])), 'd'), 6) AS nd,
         array_join(transform(element_at(multimap_from_entries(
           ARRAY[ROW('k', l_linenumber + 0), ROW('k', 7)]), 'k'),
           x -> CAST(x AS VARCHAR)), ',') AS mm
       FROM lineitem WHERE l_orderkey < 100"""
  val mapFnsOracle: String =
    """SELECT l_orderkey, l_linenumber,
         list_aggregate(list_sort(['q', CASE WHEN l_discount > l_tax THEN 'd' ELSE 't' END]),
           'string_agg', ',') AS top2,
         CAST(1 AS BIGINT) AS n_nonnull,
         'q,t' AS sub,
         round(l_discount / (l_quantity + l_discount), 6) AS nd,
         CAST(l_linenumber AS VARCHAR) || ',7' AS mm
       FROM lineitem WHERE l_orderkey < 100"""

  /** Unicode tail (round 11): normalize (NFC/NFD), code-point chr
    * (Spark's char is byte-valued — PrestoFns2.CodePointChar), and the
    * to_utf8/from_utf8 round-trip; DuckDB nfc_normalize is the oracle. */
  val unicodeFnsPresto: String =
    """SELECT o_orderkey,
         normalize(o_orderpriority || 'e' || chr(769)) AS nfc_s,
         CAST(length(normalize(o_orderpriority || 'e' || chr(769))) AS BIGINT) AS nfc_len,
         from_utf8(to_utf8(o_orderpriority)) AS rt
       FROM orders WHERE o_orderkey < 200"""
  val unicodeFnsOracle: String =
    """SELECT o_orderkey,
         nfc_normalize(o_orderpriority || 'e' || chr(769)) AS nfc_s,
         length(nfc_normalize(o_orderpriority || 'e' || chr(769))) AS nfc_len,
         o_orderpriority AS rt
       FROM orders WHERE o_orderkey < 200"""

  /** `U&'…'` unicode string literals (round 13, PrestoSql.g4:434,906-907):
    * default `\` escape in 4-digit (BMP) and 6-digit (`\+`, astral) forms,
    * the doubled-escape and doubled-quote edges, and a custom `UESCAPE`
    * escape char — all decoded by the dialect into plain Spark literals.
    * The oracle spells the decoded strings directly. */
  val unicodeLiteralPresto: String =
    """SELECT o_orderkey,
         U&'Hej \0041\0042!' AS s1,
         U&'snow \2603 smile \+01F600' AS s2,
         U&'it''s a \\ backslash' AS s3,
         U&'bang !0043 pair !+01F601 self !!' UESCAPE '!' AS s4
       FROM orders WHERE o_orderkey < 50"""
  val unicodeLiteralOracle: String =
    """SELECT o_orderkey,
         'Hej AB!' AS s1,
         'snow ' || chr(9731) || ' smile ' || chr(128512) AS s2,
         'it''s a \ backslash' AS s3,
         'bang C pair ' || chr(128513) || ' self !' AS s4
       FROM orders WHERE o_orderkey < 50"""

  /** ALTER TABLE family on graft-mem (round 11, PrestoSql.g4:50-57):
    * ADD COLUMN (null-filled), RENAME COLUMN, DROP COLUMN, RENAME TO —
    * schema evolution as committed mutations on the DSv2 store, with
    * an UPDATE through the copy-on-write path between alters. */
  def alterTable(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.alt_t")
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.alt_renamed")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.alt_t AS
         SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
         FROM orders WHERE o_orderkey < 100""")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.alt_t ADD COLUMN note VARCHAR")
    PrestoRewriter.sql(s, d,
      "UPDATE graft_mem.default.alt_t SET note = 'big' WHERE price > 100000")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.alt_t RENAME COLUMN price TO total")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.alt_t DROP COLUMN st")
    PrestoRewriter.sql(s, d,
      "ALTER TABLE graft_mem.default.alt_t RENAME TO graft_mem.default.alt_renamed")
    PrestoRewriter.sql(s, d,
      """SELECT k, round(total, 2) AS total, coalesce(note, '-') AS note
         FROM graft_mem.default.alt_renamed""")
  }
  val alterTableOracle: String =
    """SELECT o_orderkey AS k, round(o_totalprice, 2) AS total,
         CASE WHEN o_totalprice > 100000 THEN 'big' ELSE '-' END AS note
       FROM orders WHERE o_orderkey < 100"""

  /** IP-address family (round 11, NetFns): IPv4 strings built from order
    * keys; the DuckDB oracle replays the /20 mask as integer arithmetic
    * on the dotted quads. */
  val ipFnsPresto: String =
    """SELECT o_orderkey,
         ip_prefix(ip, 20) AS pfx,
         ip_subnet_min(ip_prefix(ip, 20)) AS mn,
         ip_subnet_max(ip_prefix(ip, 20)) AS mx,
         is_subnet_of('10.0.0.0/8', ip) AS inside
       FROM (SELECT o_orderkey,
               '10.' || CAST(o_orderkey % 200 AS VARCHAR) || '.' ||
               CAST(o_orderkey % 251 AS VARCHAR) || '.' ||
               CAST((o_orderkey % 17) * 3 AS VARCHAR) AS ip
             FROM orders WHERE o_orderkey < 500) t"""
  val ipFnsOracle: String =
    """SELECT o_orderkey,
         '10.' || (o_orderkey % 200) || '.' || ((o_orderkey % 251) // 16 * 16) || '.0/20' AS pfx,
         '10.' || (o_orderkey % 200) || '.' || ((o_orderkey % 251) // 16 * 16) || '.0' AS mn,
         '10.' || (o_orderkey % 200) || '.' || ((o_orderkey % 251) // 16 * 16 + 15) || '.255' AS mx,
         true AS inside
       FROM orders WHERE o_orderkey < 500"""

  /** numeric_histogram in its EXACT regime (NDV 7 <= 16 buckets — no
    * bin ever merges, deterministic under any partitioning; the same
    * exact-regime trick as agg_approx_frequent). DuckDB replays as a
    * grouped count. */
  val numericHistogramPresto: String =
    """SELECT o_orderpriority,
         array_join(transform(array_sort(map_keys(h)),
           k -> CAST(k AS VARCHAR) || ':' ||
                CAST(CAST(element_at(h, k) AS BIGINT) AS VARCHAR)), ',') AS hist
       FROM (SELECT o_orderpriority,
               numeric_histogram(16, CAST(o_orderkey % 7 AS DOUBLE) * 0.5) AS h
             FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderpriority) t"""
  val numericHistogramOracle: String =
    """SELECT o_orderpriority,
         string_agg(CAST(v AS VARCHAR) || ':' || CAST(c AS VARCHAR), ',' ORDER BY v) AS hist
       FROM (SELECT o_orderpriority, (o_orderkey % 7) * 0.5 AS v, count(*) AS c
             FROM orders WHERE o_orderkey < 5000 GROUP BY 1, 2) t
       GROUP BY o_orderpriority"""

  /** SetDigest family in the exact regime: per-priority digests of
    * customer-key sets, pairwise overlap vs the urgent set — DuckDB
    * replays with exact distinct-set arithmetic. */
  val setDigestPresto: String =
    """SELECT t.o_orderpriority,
         cardinality(t.d) AS card,
         intersection_cardinality(t.d, u.d) AS inter,
         round(jaccard_index(t.d, u.d), 9) AS jac
       FROM (SELECT o_orderpriority, make_set_digest(o_custkey) AS d
             FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderpriority) t
       CROSS JOIN (SELECT make_set_digest(o_custkey) AS d
                   FROM orders WHERE o_orderkey < 2000
                     AND o_orderpriority = '1-URGENT') u"""
  val setDigestOracle: String =
    """WITH sets AS (SELECT DISTINCT o_orderpriority, o_custkey
                     FROM orders WHERE o_orderkey < 2000),
         urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderkey < 2000 AND o_orderpriority = '1-URGENT'),
         stats AS (SELECT s.o_orderpriority, count(*) AS card,
                          count(u.o_custkey) AS inter
                   FROM sets s LEFT JOIN urgent u ON s.o_custkey = u.o_custkey
                   GROUP BY s.o_orderpriority)
       SELECT o_orderpriority, card, inter,
         round(inter / CAST(card + (SELECT count(*) FROM urgent) - inter AS DOUBLE), 9) AS jac
       FROM stats"""

  /** hash_counts (round 12): the MinHash register dump is
    * hash-valued (implementation-specific keys), so the oracle pins the
    * value-side invariants — register count = distinct values, total
    * count = row count, max count = the hottest value's multiplicity —
    * and that merge_set_digest SUMS counts across partials. */
  val hashCountsPresto: String =
    """WITH d AS (SELECT make_set_digest(o_custkey) AS sd
                  FROM orders WHERE o_orderkey < 500),
         m AS (SELECT merge_set_digest(sd) AS sd FROM (
                 SELECT make_set_digest(o_custkey) AS sd FROM orders
                 WHERE o_orderkey < 500 GROUP BY o_orderkey % 3) p)
       SELECT CAST(cardinality(hash_counts(d.sd)) AS BIGINT) AS nh,
              CAST(reduce(map_values(hash_counts(d.sd)), 0,
                          (s, x) -> s + x, s -> s) AS BIGINT) AS total,
              CAST(array_max(map_values(hash_counts(d.sd))) AS BIGINT) AS maxc,
              CAST(reduce(map_values(hash_counts(m.sd)), 0,
                          (s, x) -> s + x, s -> s) AS BIGINT) AS total_merged
       FROM d CROSS JOIN m"""
  val hashCountsOracle: String =
    """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS nh,
              CAST(count(*) AS BIGINT) AS total,
              CAST(max(c) AS BIGINT) AS maxc,
              CAST(count(*) AS BIGINT) AS total_merged
       FROM orders, (SELECT max(cnt) AS c FROM (
              SELECT count(*) AS cnt FROM orders WHERE o_orderkey < 500
              GROUP BY o_custkey) g) mx
       WHERE o_orderkey < 500"""

  /** KHyperLogLog family (round 17) in its EXACT regime: distinct
    * custkeys under K=2048 (every key hash retained → cardinality,
    * jaccard and intersection are exact set arithmetic) and distinct
    * orderkeys per custkey under SparseMax=64 (per-key y-sets exact →
    * uniqueness histogram and reidentification potential exact). The
    * histogram is rendered as 'uniqueness:count' with counts recovered
    * via fraction × cardinality (integers, so no double formatting in
    * the compare); DuckDB replays everything with count(DISTINCT). The
    * merged leg re-aggregates partials split by custkey%3 through the
    * generic merge() and must reproduce the global distinct count. */
  val khllPresto: String =
    """SELECT t.o_orderpriority,
         cardinality(t.k) AS card,
         round(reidentification_potential(t.k, 2), 9) AS reident,
         array_join(transform(
           filter(array_sort(map_keys(t.ud)), x -> element_at(t.ud, x) > 0),
           x -> CAST(x AS VARCHAR) || ':' ||
                CAST(CAST(round(element_at(t.ud, x) * cardinality(t.k))
                     AS BIGINT) AS VARCHAR)), ',') AS uniq_hist,
         intersection_cardinality(t.k, u.k) AS inter,
         round(jaccard_index(t.k, u.k), 9) AS jac,
         cardinality(m.k) AS card_merged
       FROM (SELECT o_orderpriority, khyperloglog_agg(o_custkey, o_orderkey) AS k,
                    uniqueness_distribution(
                      khyperloglog_agg(o_custkey, o_orderkey), 8) AS ud
             FROM orders WHERE o_orderkey < 2000 GROUP BY o_orderpriority) t
       CROSS JOIN (SELECT khyperloglog_agg(o_custkey, o_orderkey) AS k
                   FROM orders WHERE o_orderkey < 2000
                     AND o_orderpriority = '1-URGENT') u
       CROSS JOIN (SELECT merge(k) AS k FROM (
                     SELECT khyperloglog_agg(o_custkey, o_orderkey) AS k
                     FROM orders WHERE o_orderkey < 2000
                     GROUP BY o_custkey % 3) p) m"""
  val khllOracle: String =
    """WITH uniq AS (SELECT o_orderpriority, o_custkey,
                            count(DISTINCT o_orderkey) AS u
                     FROM orders WHERE o_orderkey < 2000 GROUP BY 1, 2),
         base AS (SELECT o_orderpriority, count(*) AS card,
                         count(*) FILTER (WHERE u <= 2) AS low
                  FROM uniq GROUP BY 1),
         hist AS (SELECT o_orderpriority,
                         string_agg(CAST(ub AS VARCHAR) || ':' || CAST(c AS VARCHAR),
                                    ',' ORDER BY ub) AS uniq_hist
                  FROM (SELECT o_orderpriority, LEAST(u, 8) AS ub, count(*) AS c
                        FROM uniq GROUP BY 1, 2) g GROUP BY 1),
         urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderkey < 2000 AND o_orderpriority = '1-URGENT'),
         inter AS (SELECT q.o_orderpriority, count(ur.o_custkey) AS i
                   FROM (SELECT DISTINCT o_orderpriority, o_custkey FROM orders
                         WHERE o_orderkey < 2000) q
                   LEFT JOIN urgent ur ON q.o_custkey = ur.o_custkey
                   GROUP BY 1)
       SELECT b.o_orderpriority, b.card,
              round(b.low / CAST(b.card AS DOUBLE), 9) AS reident,
              h.uniq_hist,
              i.i AS inter,
              round(i.i / CAST(b.card + (SELECT count(*) FROM urgent) - i.i
                    AS DOUBLE), 9) AS jac,
              (SELECT count(DISTINCT o_custkey) FROM orders
               WHERE o_orderkey < 2000) AS card_merged
       FROM base b JOIN hist h USING (o_orderpriority)
       JOIN inter i USING (o_orderpriority)"""

  /** URL-safe base64 round-trip and the 3-arg date_add (round 11):
    * DuckDB replays base64url by character-mapping its padded to_base64
    * and day addition as date arithmetic. */
  val codecFnsPresto: String =
    """SELECT o_orderkey,
         to_base64url(to_utf8(o_orderpriority)) AS b64u,
         CAST(from_utf8(from_base64url(to_base64url(to_utf8(o_orderpriority)))) AS VARCHAR) AS rt,
         CAST(CAST(date_add('day', 5, o_orderdate) AS DATE) AS VARCHAR) AS d5
       FROM orders WHERE o_orderkey < 300"""
  val codecFnsOracle: String =
    """SELECT o_orderkey,
         replace(replace(to_base64(encode(o_orderpriority)), '+', '-'), '/', '_') AS b64u,
         o_orderpriority AS rt,
         CAST(CAST(o_orderdate AS DATE) + 5 AS VARCHAR) AS d5
       FROM orders WHERE o_orderkey < 300"""

  /** CREATE TYPE (PrestoSql.g4:80-82, AstStatements.h:348 CreateType):
    * a named row type substitutes into the CAST target; field access
    * flattens it back for the oracle compare. */
  def createType(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d,
      "CREATE TYPE order_amount AS (k BIGINT, total DOUBLE)")
    PrestoRewriter.sql(s, d,
      """SELECT oa.k AS k, round(oa.total, 2) AS total
         FROM (SELECT CAST(ROW(o_orderkey, o_totalprice) AS order_amount) AS oa
               FROM orders WHERE o_orderkey < 200) t""")
  }
  val createTypeOracle: String =
    """SELECT o_orderkey AS k, round(o_totalprice, 2) AS total
       FROM orders WHERE o_orderkey < 200"""

  /** CREATE TABLE with a likeClause element (PrestoSql.g4:182-184): the
    * LIKE expands to region's column definitions, mixed with an extra
    * column, on the graft-mem DSv2 connector. */
  def tableLike(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.like_t")
    PrestoRewriter.sql(s, d,
      "CREATE TABLE graft_mem.default.like_t (LIKE region INCLUDING PROPERTIES, batch VARCHAR)")
    PrestoRewriter.sql(s, d,
      "INSERT INTO graft_mem.default.like_t SELECT r_regionkey, r_name, 'b0' FROM region")
    PrestoRewriter.sql(s, d,
      "SELECT r_regionkey, r_name, batch FROM graft_mem.default.like_t")
  }
  val tableLikeOracle: String =
    "SELECT r_regionkey, r_name, 'b0' AS batch FROM region"

  /** Datetime tail (round 11): ISO-week functions, last-day, quarter,
    * and to_iso8601 over real dates; DuckDB's ISO week/isoyear are the
    * oracle. */
  val datetimeFnsPresto: String =
    """SELECT o_orderkey,
         CAST(last_day_of_month(o_orderdate) AS VARCHAR) AS ld,
         CAST(week(o_orderdate) AS INTEGER) AS wk,
         CAST(year_of_week(o_orderdate) AS INTEGER) AS yw,
         CAST(quarter(o_orderdate) AS INTEGER) AS q,
         to_iso8601(date(o_orderdate)) AS iso
       FROM orders WHERE o_orderkey < 300"""
  val datetimeFnsOracle: String =
    """SELECT o_orderkey,
         strftime(last_day(o_orderdate), '%Y-%m-%d') AS ld,
         CAST(week(o_orderdate) AS INTEGER) AS wk,
         CAST(isoyear(o_orderdate) AS INTEGER) AS yw,
         CAST(quarter(o_orderdate) AS INTEGER) AS q,
         strftime(o_orderdate, '%Y-%m-%d') AS iso
       FROM orders WHERE o_orderkey < 300"""

  /** entropy() aggregate (round 11): Shannon entropy of a count column
    * per group — the oracle recomputes the closed form in DuckDB. */
  val entropyPresto: String =
    """SELECT o_orderstatus AS st,
         round(entropy(CAST(o_custkey % 10 AS DOUBLE)), 8) AS ent,
         CAST(count(*) AS BIGINT) AS n
       FROM orders GROUP BY o_orderstatus"""
  val entropyOracle: String =
    """SELECT o_orderstatus AS st,
         round(log2(sum(CASE WHEN c > 0 THEN c ELSE 0 END))
               - sum(CASE WHEN c > 0 THEN c * log2(c) ELSE 0 END)
                 / sum(CASE WHEN c > 0 THEN c ELSE 0 END), 8) AS ent,
         CAST(count(*) AS BIGINT) AS n
       FROM (SELECT o_orderstatus, CAST(o_custkey % 10 AS DOUBLE) AS c FROM orders)
       GROUP BY o_orderstatus"""

  /** CALL procedures (round 11, PrestoSql.g4:101) via Spark 4's DSv2
    * ProcedureCatalog: snapshot maintenance over graft-mem history —
    * rollback_to_version restores the post-CTAS state after a DELETE,
    * and the snapshots listing records the whole trail (create=0 rows,
    * CTAS=n, delete=d, rollback=n). */
  def callProc(s: SparkSession, d: String): DataFrame = {
    PrestoRewriter.sql(s, d, "DROP TABLE IF EXISTS graft_mem.default.call_t")
    PrestoRewriter.sql(s, d,
      """CREATE TABLE graft_mem.default.call_t AS
         SELECT o_orderkey AS k, o_totalprice AS v FROM orders
         WHERE o_orderkey < 100""")
    PrestoRewriter.sql(s, d, "DELETE FROM graft_mem.default.call_t WHERE k >= 50")
    PrestoRewriter.sql(s, d,
      "CALL graft_mem.system.rollback_to_version('default.call_t', 2)")
    val trail = PrestoRewriter.sql(s, d,
      "CALL graft_mem.system.snapshots('default.call_t')")
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(2)}").mkString(",")
    PrestoRewriter.sql(s, d,
      s"""SELECT CAST(count(*) AS BIGINT) AS n, round(sum(v), 2) AS total,
            '$trail' AS snapshots
          FROM graft_mem.default.call_t""")
  }
  val callProcOracle: String =
    """WITH base AS (SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
                     FROM orders WHERE o_orderkey < 100),
            del AS (SELECT count(*) AS dn FROM orders WHERE o_orderkey < 50)
       SELECT CAST(n AS BIGINT) AS n, total,
              '1:0,2:' || CAST(n AS VARCHAR) || ',3:' || CAST(dn AS VARCHAR)
                || ',4:' || CAST(n AS VARCHAR) AS snapshots
       FROM base, del"""

  /** Geospatial functions through the Presto dialect front door
    * (round 15; overlay columns round 17): Presto SQL spells them
    * ST_CamelCase — resolution is case-insensitive onto the GeoFns
    * registrations. The polygon's 0.5 offsets keep every doc point off
    * the boundary, so the strict interior test and the oracle's
    * open-interval comparison agree everywhere. Overlay closed forms:
    * rect A = [0, a+2]×[0, 2] (a = doc_id % 10) against the fixed
    * rect B = [1, 5]×[0, 2] — intersection 2·(min(a+2, 5) − 1), union
    * by inclusion–exclusion; the point buffer is the inscribed regular
    * 32-gon, area (1/2)·32·r²·sin(2π/32) = 64·sin(π/16) at r = 2. */
  val geoPresto: String =
    """SELECT doc_id,
         ST_AsText(ST_Point(doc_id * 37 % 100, doc_id * 61 % 100)) AS wkt,
         round(ST_Distance(ST_Point(doc_id * 37 % 100, 0),
                           ST_Point(0, doc_id * 61 % 100)), 6) AS d,
         ST_Contains(ST_GeometryFromText('POLYGON ((10 10, 90 10, 90 90, 10 90, 10 10))'),
                     ST_Point(doc_id * 37 % 100 + 0.5, doc_id * 61 % 100 + 0.5)) AS inside,
         round(ST_Area(ST_Intersection(
           ST_GeometryFromText('POLYGON ((0 0, ' || (doc_id % 10 + 2) || ' 0, '
             || (doc_id % 10 + 2) || ' 2, 0 2, 0 0))'),
           ST_GeometryFromText('POLYGON ((1 0, 5 0, 5 2, 1 2, 1 0))'))), 6) AS ia,
         round(ST_Area(ST_Union(
           ST_GeometryFromText('POLYGON ((0 0, ' || (doc_id % 10 + 2) || ' 0, '
             || (doc_id % 10 + 2) || ' 2, 0 2, 0 0))'),
           ST_GeometryFromText('POLYGON ((1 0, 5 0, 5 2, 1 2, 1 0))'))), 6) AS ua,
         round(ST_Area(ST_Buffer(ST_Point(doc_id % 10, 0), 2)), 4) AS ba
       FROM documents WHERE doc_id < 200"""
  val geoOracle: String =
    """SELECT doc_id,
         'POINT (' || (doc_id * 37 % 100) || ' ' || (doc_id * 61 % 100) || ')' AS wkt,
         round(sqrt(CAST((doc_id * 37 % 100) * (doc_id * 37 % 100) +
                         (doc_id * 61 % 100) * (doc_id * 61 % 100) AS DOUBLE)), 6) AS d,
         (doc_id * 37 % 100 + 0.5 > 10 AND doc_id * 37 % 100 + 0.5 < 90 AND
          doc_id * 61 % 100 + 0.5 > 10 AND doc_id * 61 % 100 + 0.5 < 90) AS inside,
         round(2.0 * (least(doc_id % 10 + 2, 5) - 1), 6) AS ia,
         round(2.0 * (doc_id % 10 + 2) + 8 - 2.0 * (least(doc_id % 10 + 2, 5) - 1), 6) AS ua,
         round(64 * sin(pi() / 16), 4) AS ba
       FROM documents WHERE doc_id < 200"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("presto_geo", run(geoPresto) _, geoOracle),
    ("presto_matview", matView _, matViewOracle),
    ("presto_call", callProc _, callProcOracle),
    ("presto_datetime_fns", run(datetimeFnsPresto) _, datetimeFnsOracle),
    ("presto_entropy", run(entropyPresto) _, entropyOracle),
    ("presto_alter_table", alterTable _, alterTableOracle),
    ("presto_create_type", createType _, createTypeOracle),
    ("presto_ip_fns", run(ipFnsPresto) _, ipFnsOracle),
    ("presto_numeric_histogram", run(numericHistogramPresto) _, numericHistogramOracle),
    ("presto_set_digest", run(setDigestPresto) _, setDigestOracle),
    ("presto_hash_counts", run(hashCountsPresto) _, hashCountsOracle),
    ("presto_khll", run(khllPresto) _, khllOracle),
    ("presto_codec_fns", run(codecFnsPresto) _, codecFnsOracle),
    ("presto_table_like", tableLike _, tableLikeOracle),
    ("presto_digest_fns", run(digestFnsPresto) _, digestFnsOracle),
    ("presto_regexp_fns", run(regexpFnsPresto) _, regexpFnsOracle),
    ("presto_array_fns", run(arrayFnsPresto) _, arrayFnsOracle),
    ("presto_dist_fns", run(distFnsPresto) _, distFnsOracle),
    ("presto_map_fns", run(mapFnsPresto) _, mapFnsOracle),
    ("presto_unicode_fns", run(unicodeFnsPresto) _, unicodeFnsOracle),
    ("presto_unicode_literal", run(unicodeLiteralPresto) _, unicodeLiteralOracle),
    ("presto_transaction", transaction _, transactionOracle),
    ("presto_show_tables", showTables _, showTablesOracle),
    ("presto_token_stats", run(tokenStatsPresto) _, tokenStatsOracle),
    ("presto_agg", run(aggPresto) _, aggOracle),
    ("presto_q6", run(q6Presto) _, q6Oracle),
    ("presto_datetime", run(datetimePresto) _, datetimeOracle),
    ("presto_strings", run(stringsPresto) _, stringsOracle),
    ("presto_unnest_from", run(unnestFromPresto) _, unnestFromOracle),
    ("presto_unnest_multi", run(unnestMultiPresto) _, unnestMultiOracle),
    ("presto_try", run(tryPresto) _, tryOracle),
    ("presto_row_array", run(rowArrayPresto) _, rowArrayOracle),
    ("presto_at_timezone", run(atTimezonePresto) _, atTimezoneOracle),
    ("presto_insert_select", insertSelect _, insertSelectOracle),
    ("presto_ctas", ctas _, ctasOracle),
    ("presto_delete", deleteStmt _, deleteOracle),
    ("presto_update", updateStmt _, updateOracle),
    ("presto_merge", mergeStmt _, mergeOracle),
    ("presto_analyze", analyzeStmt _, analyzeOracle),
    ("presto_prepare", prepareStmt _, prepareOracle),
    ("presto_recursive_cte", run(recursivePresto) _, recursiveOracle),
    ("presto_show_stats", showStatsStmt _, showStatsOracle),
    ("presto_url_fns", run(urlFnsPresto) _, urlFnsOracle),
    ("presto_is_distinct", run(isDistinctPresto) _, isDistinctOracle),
    ("presto_quantified", run(quantifiedPresto) _, quantifiedPresto),
    ("presto_cosine", run(cosinePresto) _, cosineOracle),
    ("presto_hll_distinct", run(hllPresto) _, hllOracle),
    ("presto_set_ops", run(setOpsPresto) _, setOpsOracle),
    ("presto_grouping_sets", run(groupingSetsPresto) _, groupingSetsOracle),
    ("presto_window", run(windowPresto) _, windowOracle),
    ("presto_window_groups", run(windowGroupsPresto) _, windowGroupsOracle),
    ("presto_try_quantified", run(tryQuantifiedPresto) _, tryQuantifiedOracle),
    ("presto_qdigest", run(qdigestPresto) _, qdigestOracle),
    ("presto_qdigest_merge", run(qdigestMergePresto) _, qdigestMergeOracle),
    ("presto_tdigest", run(tdigestPresto) _, tdigestOracle),
    ("presto_quantified_corr", run(quantifiedCorrPresto) _, quantifiedCorrPresto),
    ("presto_sql_udf", sqlUdf _, sqlUdfOracle),
    ("presto_time_travel", timeTravel _, timeTravelOracle),
    ("presto_not_null", notNull _, notNullOracle),
    ("presto_approx_frequent", run(approxFrequentPresto) _, approxFrequentOracle),
    ("presto_json_fns", run(jsonFnsPresto) _, jsonFnsOracle))
}
