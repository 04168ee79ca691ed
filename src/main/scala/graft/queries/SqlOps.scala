package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface executed through Spark's OWN subquery rewriter —
  * the correct rendering of the reference's derived join types
  * (QueryGraph.h:445-464): EXISTS → kLeftSemiFilter, NOT EXISTS/NOT IN →
  * kAnti, `EXISTS(..) OR ..` → kLeftSemiProject (mark join; Catalyst's
  * ExistenceJoin), scalar subqueries → single-row derived tables
  * (DerivedTable.cpp:182 findSingleRowDts). Rather than pre-lowering
  * these patterns by hand (as TPC-H q2/q11/q17 do on the DataFrame side),
  * each runs as SQL so Catalyst's RewritePredicateSubquery /
  * PullupCorrelatedPredicates produce the semi/anti/existence joins —
  * Spark is a superset of the reference here (SURVEY §4.10).
  *
  * The same text is the DuckDB oracle, so the dialect is the common ANSI
  * subset — a three-way check (Spark plan, DuckDB plan, same rows).
  */
object SqlOps {

  private def run(sql: String)(spark: SparkSession, sfDir: String): DataFrame = {
    Catalog.registerAll(spark, sfDir)
    spark.sql(sql)
  }

  val subqExistsSql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_totalprice > 400000)"""

  val subqNotExistsSql: String =
    """SELECT s_suppkey, s_name FROM supplier
       WHERE NOT EXISTS (SELECT 1 FROM lineitem
                         WHERE l_suppkey = s_suppkey AND l_quantity > 49)"""

  val subqInSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
       WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"""

  val subqNotInSql: String =
    """SELECT c_custkey, c_acctbal FROM customer
       WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"""

  /** Uncorrelated scalar subquery → single-row cross join
    * (Optimization.cpp:1280 placeSingleRowDt). */
  val subqScalarSql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
       WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)"""

  /** Correlated scalar subquery in the projection. */
  val subqScalarCorrSql: String =
    """SELECT c_custkey,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
       FROM customer WHERE c_custkey < 200"""

  /** Disjunctive EXISTS — forces a mark join (kLeftSemiProject,
    * QueryGraph.h:702-705 markColumn; Catalyst ExistenceJoin). */
  val subqMarkJoinSql: String =
    """SELECT c_custkey FROM customer
       WHERE c_acctbal < 0
          OR EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""

  /** IN + correlated EXISTS combined over three tables. */
  val subqNestedSql: String =
    """SELECT p_partkey, p_name FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                             AND EXISTS (SELECT 1 FROM orders
                                         WHERE o_orderkey = l_orderkey
                                           AND o_orderpriority = '1-URGENT'))"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("subq_exists", run(subqExistsSql) _, subqExistsSql),
    ("subq_not_exists", run(subqNotExistsSql) _, subqNotExistsSql),
    ("subq_in", run(subqInSql) _, subqInSql),
    ("subq_not_in", run(subqNotInSql) _, subqNotInSql),
    ("subq_scalar", run(subqScalarSql) _, subqScalarSql),
    ("subq_scalar_corr", run(subqScalarCorrSql) _, subqScalarCorrSql),
    ("subq_mark_join", run(subqMarkJoinSql) _, subqMarkJoinSql),
    ("subq_nested", run(subqNestedSql) _, subqNestedSql))
}
