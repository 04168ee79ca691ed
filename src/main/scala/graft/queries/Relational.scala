package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage of the reference's relational operator algebra beyond what the
  * TPC-H set exercises — one registered query per §2.1 NodeKind.
  *
  * Reference: axiom/logical_plan/LogicalPlanNode.h:25-37 (the 11 node
  * kinds). Values :121-157, Join :368-445, Sort :447-471 (4 order types),
  * Limit/offset :473-518, Set :520-569, TableWrite :659-745.
  *
  * Scale notes: set ops and joins are declarative (Catalyst plans
  * distributed union/hash-join; AQE picks broadcast vs shuffle at
  * runtime); the TableWrite delete/update path is a copy-on-write
  * rewrite, which is exactly how table formats do it on immutable
  * parquet — the rewrite is a distributed filter/project, never a
  * driver-side loop.
  */
object Relational {

  /** ValuesNode: in-plan literal table (LogicalPlanNode.h:121-157).
    * Spark's LocalRelation — driver-embedded, broadcast to executors. */
  def valuesTable(t: Tables): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false)))
    t.spark.createDataFrame(
      java.util.List.of(Row(1, "alpha"), Row(2, "beta"), Row(3, "gamma")),
      schema)
  }
  val valuesSql = "SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma')) t(id, name)"

  // ------------------------------------------------------------- set ops
  // SetNode kUnion/kUnionAll/kIntersect/kExcept (LogicalPlanNode.h:520-569)
  // + the ALL variants Spark adds. INTERSECT/EXCEPT lower to semi/anti
  // joins in both engines (reference: ToGraph.cpp:1478-1526).
  private def custNk(t: Tables) = t.customer.select(col("c_nationkey").as("nk"))
  private def suppNk(t: Tables) = t.supplier.select(col("s_nationkey").as("nk"))

  def setUnion(t: Tables): DataFrame = custNk(t).union(suppNk(t)).distinct()
  val setUnionSql = "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier"

  def setUnionAll(t: Tables): DataFrame = custNk(t).union(suppNk(t))
  val setUnionAllSql = "SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey AS nk FROM supplier"

  def setIntersect(t: Tables): DataFrame = custNk(t).intersect(suppNk(t))
  val setIntersectSql = "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier"

  def setIntersectAll(t: Tables): DataFrame = custNk(t).intersectAll(suppNk(t))
  val setIntersectAllSql = "SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey AS nk FROM supplier"

  def setExcept(t: Tables): DataFrame = custNk(t).except(suppNk(t))
  val setExceptSql = "SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier"

  def setExceptAll(t: Tables): DataFrame = custNk(t).exceptAll(suppNk(t))
  val setExceptAllSql = "SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey AS nk FROM supplier"

  // --------------------------------------------------------------- joins
  // JoinNode inner/left/right/full (LogicalPlanNode.h:368-445) plus the
  // optimizer-derived kinds (QueryGraph.h:445-464): semi, anti, cross.
  // Inner and left are covered by TPC-H (q3, q13).

  /** Right outer: parts with no lineitems survive with count 0. */
  def joinRight(t: Tables): DataFrame =
    t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"), "right")
      .groupBy(col("p_partkey"))
      .agg(count(col("l_orderkey")).as("n_items"))
  val joinRightSql =
    """SELECT p_partkey, count(l_orderkey) AS n_items
       FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
       GROUP BY p_partkey"""

  /** Full outer with unmatched rows on BOTH sides (filters applied to each
    * input first), digested by null-pattern so output is deterministic. */
  def joinFull(t: Tables): DataFrame =
    t.customer.filter(col("c_acctbal") > 0)
      .join(t.orders.filter(col("o_totalprice") > 100000),
        col("c_custkey") === col("o_custkey"), "full")
      .groupBy(col("c_custkey").isNull.as("no_cust"), col("o_orderkey").isNull.as("no_order"))
      .agg(count(lit(1)).as("n"))
  val joinFullSql =
    """SELECT c_custkey IS NULL AS no_cust, o_orderkey IS NULL AS no_order, count(*) AS n
       FROM (SELECT * FROM customer WHERE c_acctbal > 0) c
       FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 100000) o
         ON c_custkey = o_custkey
       GROUP BY 1, 2"""

  /** Left semi (reference kLeftSemiFilter, QueryGraph.h:445-464). */
  def joinSemi(t: Tables): DataFrame =
    t.customer.join(
      t.orders.filter(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  val joinSemiSql =
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""

  /** Left anti (reference kAnti — NOT EXISTS, QueryGraph.h:505-513). */
  def joinAnti(t: Tables): DataFrame =
    t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""

  /** Cross product (JoinNode with null condition, LogicalPlanNode.h:392).
    * 5×25 rows — constant-size, a BroadcastNestedLoopJoin. */
  def joinCross(t: Tables): DataFrame =
    t.region.crossJoin(t.nation).select(col("r_name"), col("n_name"))
  val joinCrossSql = "SELECT r_name, n_name FROM region CROSS JOIN nation"

  // ---------------------------------------------------------- sort/limit
  // SortNode's 4 order types (Expr.h:416-446: asc/desc × nulls
  // first/last). A limit makes the order observable in the output SET,
  // which is what the driver compares (it sorts rows before hashing).
  private def withNulls(t: Tables) =
    t.customer.join(t.orders.filter(col("o_totalprice") > 250000),
      col("c_custkey") === col("o_custkey"), "left")

  def sortNullsFirst(t: Tables): DataFrame =
    withNulls(t)
      .orderBy(col("o_totalprice").asc_nulls_first, col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .limit(50)
  val sortNullsFirstSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
       FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
         ON c_custkey = o_custkey
       ORDER BY o_totalprice ASC NULLS FIRST, c_custkey ASC, o_orderkey ASC NULLS FIRST
       LIMIT 50"""

  def sortNullsLast(t: Tables): DataFrame =
    withNulls(t)
      .orderBy(col("o_totalprice").desc_nulls_last, col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .limit(50)
  val sortNullsLastSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
       FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) o
         ON c_custkey = o_custkey
       ORDER BY o_totalprice DESC NULLS LAST, c_custkey ASC, o_orderkey ASC NULLS FIRST
       LIMIT 50"""

  /** LimitNode offset+count (LogicalPlanNode.h:473-518). Spark splits
    * into Local/GlobalLimit with the offset applied at the final stage —
    * same partial/final split as the reference (ToVelox.cpp:712,739). */
  def limitOffset(t: Tables): DataFrame =
    t.orders.orderBy(col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"))
      .offset(100).limit(25)
  val limitOffsetSql =
    "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 100"

  // ----------------------------------------------------------- tablewrite
  // TableWriteNode kInsert/kDelete/kUpdate (LogicalPlanNode.h:659-745).
  // Parquet is immutable, so delete/update are copy-on-write rewrites —
  // the same model the reference's connector write API implies
  // (ConnectorMetadata.h:569-627 createTable/beginWrite/finishWrite).
  // Each query writes, reads back, and returns an aggregate digest that
  // the oracle recomputes directly from the source table.
  private val twBase = "/root/repo/target/tablewrite"

  private def roundTrip(df: DataFrame, dir: String): DataFrame = {
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  def tableWriteInsert(t: Tables): DataFrame = {
    val out = roundTrip(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
      s"$twBase/insert")
    out.agg(count(lit(1)).as("n_rows"), round(sum(col("o_totalprice")), 2).as("total"))
  }
  val tableWriteInsertSql =
    "SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total FROM orders WHERE o_orderpriority = '1-URGENT'"

  def tableWriteDelete(t: Tables): DataFrame = {
    val out = roundTrip(t.orders.filter(col("o_orderstatus") =!= "F"), s"$twBase/delete")
    out.agg(count(lit(1)).as("n_rows"), round(sum(col("o_totalprice")), 2).as("total"))
  }
  val tableWriteDeleteSql =
    "SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total FROM orders WHERE o_orderstatus <> 'F'"

  def tableWriteUpdate(t: Tables): DataFrame = {
    val updated = t.orders.withColumn("o_totalprice",
      when(col("o_orderstatus") === "O", col("o_totalprice") * 1.1)
        .otherwise(col("o_totalprice")))
    val out = roundTrip(updated, s"$twBase/update")
    out.agg(count(lit(1)).as("n_rows"), round(sum(col("o_totalprice")), 2).as("total"))
  }
  val tableWriteUpdateSql =
    """SELECT count(*) AS n_rows,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END), 2) AS total
       FROM orders"""

  /** Partitioned table write: Hive-style directory layout + read-back
    * through a partition-pruned filter — the write side of §2.7's
    * partitioning story (the read-side pruning is plan-asserted in
    * PartitionedLayoutSpec). */
  def tableWritePartitioned(t: Tables): DataFrame = {
    val dir = s"$twBase/partitioned"
    t.orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    t.spark.read.parquet(dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)).as("n_rows"), round(sum(col("o_totalprice")), 2).as("total"))
  }
  val tableWritePartitionedSql: String =
    """SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total
       FROM orders WHERE o_orderpriority = '1-URGENT'"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("values_table", valuesTable _, valuesSql),
    ("set_union", setUnion _, setUnionSql),
    ("set_union_all", setUnionAll _, setUnionAllSql),
    ("set_intersect", setIntersect _, setIntersectSql),
    ("set_intersect_all", setIntersectAll _, setIntersectAllSql),
    ("set_except", setExcept _, setExceptSql),
    ("set_except_all", setExceptAll _, setExceptAllSql),
    ("join_right", joinRight _, joinRightSql),
    ("join_full", joinFull _, joinFullSql),
    ("join_semi", joinSemi _, joinSemiSql),
    ("join_anti", joinAnti _, joinAntiSql),
    ("join_cross", joinCross _, joinCrossSql),
    ("sort_nulls_first", sortNullsFirst _, sortNullsFirstSql),
    ("sort_nulls_last", sortNullsLast _, sortNullsLastSql),
    ("limit_offset", limitOffset _, limitOffsetSql),
    ("table_write_insert", tableWriteInsert _, tableWriteInsertSql),
    ("table_write_delete", tableWriteDelete _, tableWriteDeleteSql),
    ("table_write_update", tableWriteUpdate _, tableWriteUpdateSql),
    ("table_write_partitioned", tableWritePartitioned _, tableWritePartitionedSql))
}
