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

  private def run(presto: String)(s: SparkSession, d: String): DataFrame =
    PrestoRewriter.sql(s, d, presto)

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("presto_token_stats", run(tokenStatsPresto) _, tokenStatsOracle),
    ("presto_agg", run(aggPresto) _, aggOracle),
    ("presto_q6", run(q6Presto) _, q6Oracle),
    ("presto_datetime", run(datetimePresto) _, datetimeOracle),
    ("presto_strings", run(stringsPresto) _, stringsOracle))
}
