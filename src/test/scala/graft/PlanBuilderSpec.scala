package graft

import graft.plans.PlanBuilder
import graft.functions.Registry
import graft.queries.Tpch
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The builder surface must produce the same results as the hand-written
  * queries — mirroring the reference's PlanBuilder-vs-SQL dual-path tests
  * (TpchPlanTest.cpp:31-60). */
class PlanBuilderSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("q1 via PlanBuilder equals hand-written q1") {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val built = PlanBuilder.tableScan(tables, "lineitem")
      .filter(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
      .aggregate(
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(rev), 2).as("sum_disc_price"),
          round(sum(rev * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order")))
      .sort(col("l_returnflag"), col("l_linestatus"))
      .build
    assert(rowsOf(built) == rowsOf(Tpch.q1(tables)))
  }

  test("q3 via PlanBuilder (join + agg + topk) equals hand-written q3") {
    val built = PlanBuilder.tableScan(tables, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(PlanBuilder.tableScan(tables, "orders")
        .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(PlanBuilder.tableScan(tables, "lineitem")
        .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .aggregate(
        Seq(col("l_orderkey"), col("o_orderdate")),
        Seq(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue")))
      .sort(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
      .build
    assert(rowsOf(built) == rowsOf(Tpch.q3(tables)))
  }

  test("values → unnest(ordinality) → setop → offset pipeline") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("xs", ArrayType(IntegerType, containsNull = false), nullable = false)))
    val b = PlanBuilder.values(spark, schema,
      Seq(Row(1, Seq(10, 20)), Row(2, Seq(30)), Row(3, Seq.empty[Int])))
      .unnest(col("xs"), "x", withOrdinality = true)
      .project(col("id"), col("x"), col("ordinality"))
    val got = b.build.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    // id=3's empty array drops the row (LogicalPlanNode.h:571-657)
    assert(got == Set((1, 10, 1), (1, 20, 2), (2, 30, 1)))

    val u = b.project(col("id")).union(
      PlanBuilder.values(spark,
        StructType(Seq(StructField("id", IntegerType, nullable = false))),
        Seq(Row(7))))
      .sortSql("id").offset(1).limit(2).build
    assert(u.collect().map(_.getInt(0)).toSeq == Seq(2, 7))
  }

  test("Registry resolves Presto names with metadata") {
    Catalog.registerAll(spark, sfDir)
    val df = spark.table("documents").select(
      Registry.call("cardinality", split(col("text"), " ")).as("n"),
      Registry.call("strpos", col("text"), lit("the")).as("p"))
    val r = df.collect().head
    assert(r.getInt(0) > 0 && r.getInt(1) >= 0)
    assert(Registry.isAggregate("approx_distinct"))
    assert(!Registry.isDeterministic("random"))
    assert(Registry.reversible("<") == ">")
  }

  test("typed per-agg FILTER through the builder mirrors agg_filter") {
    // Builder twin of the agg_filter oracle entry (SQL FILTER (WHERE …)).
    val got = PlanBuilder.tableScan(tables, "lineitem")
      .aggregate(Seq(col("l_returnflag")), Seq(
        PlanBuilder.agg(count(lit(1)), filter = Some(col("l_quantity") > 25)).as("big_cnt"),
        round(PlanBuilder.agg(sum(col("l_extendedprice")),
          filter = Some(col("l_discount") > 0.05)), 2).as("disc_rev")))
      .build
    val want = graft.queries.Exprs.aggFilter(spark, sfDir)
    assert(got.orderBy("l_returnflag").collect().toSeq ==
      want.orderBy("l_returnflag").collect().toSeq)
  }

  test("typed per-agg DISTINCT through the builder mirrors agg_distinct") {
    val got = PlanBuilder.tableScan(tables, "orders")
      .aggregate(Seq(col("o_orderpriority")), Seq(
        PlanBuilder.agg(count(col("o_custkey")), distinct = true).as("n_cust"),
        round(PlanBuilder.agg(sum(col("o_totalprice")), distinct = true), 2)
          .as("sum_distinct_price")))
      .build
    val want = graft.queries.Exprs.aggDistinct(tables)
    assert(got.orderBy("o_orderpriority").collect().toSeq ==
      want.orderBy("o_orderpriority").collect().toSeq)
  }

  test("typed per-agg ORDER BY through the builder mirrors agg_ordered") {
    // listagg(x) WITHIN GROUP (ORDER BY …) — the ordered-aggregate form
    // the reference models as AggregateExpr.ordering.
    val got = PlanBuilder.tableScan(tables, "orders")
      .filter(col("o_custkey") < 100)
      .aggregate(Seq(col("o_custkey")), Seq(
        PlanBuilder.agg(
          call_function("listagg", col("o_orderkey").cast("string"), lit(",")),
          orderBy = Seq(col("o_orderdate").asc, col("o_orderkey").asc)).as("keys")))
      .build
    val want = graft.queries.Exprs.aggOrdered(tables)
    assert(got.orderBy("o_custkey").collect().toSeq ==
      want.orderBy("o_custkey").collect().toSeq)
    // Non-order-sensitive aggregates must reject ORDER BY loudly.
    intercept[Exception] {
      PlanBuilder.tableScan(tables, "orders")
        .aggregate(Seq(col("o_custkey")), Seq(
          PlanBuilder.agg(sum(col("o_totalprice")),
            orderBy = Seq(col("o_orderdate"))).as("x")))
        .build.collect()
    }
  }

  test("builder exists/notExists mirror the subq_exists/subq_not_exists SQL entries") {
    Catalog.registerAll(spark, sfDir)
    val ex = PlanBuilder.tableScan(tables, "customer")
      .exists(PlanBuilder.tableScan(tables, "orders")
        .filter(col("o_custkey") === col("c_custkey").outer() &&
          col("o_totalprice") > 400000))
      .project(col("c_custkey"), col("c_name"))
      .build
    assert(rowsOf(ex) == rowsOf(spark.sql(graft.queries.SqlOps.subqExistsSql)))
    val exPlan = ex.queryExecution.executedPlan.toString
    assert(exPlan.contains("LeftSemi"), s"EXISTS did not lower to a semi join:\n$exPlan")

    val nex = PlanBuilder.tableScan(tables, "supplier")
      .notExists(PlanBuilder.tableScan(tables, "lineitem")
        .filter(col("l_suppkey") === col("s_suppkey").outer() && col("l_quantity") > 49))
      .project(col("s_suppkey"), col("s_name"))
      .build
    assert(rowsOf(nex) == rowsOf(spark.sql(graft.queries.SqlOps.subqNotExistsSql)))
    assert(nex.queryExecution.executedPlan.toString.contains("LeftAnti"))
  }

  test("builder inSubquery/notInSubquery mirror the subq_in/subq_not_in SQL entries") {
    Catalog.registerAll(spark, sfDir)
    def natKeys = PlanBuilder.tableScan(tables, "nation")
      .filter(col("n_regionkey") === 2)
      .project(col("n_nationkey"))
    val in = PlanBuilder.tableScan(tables, "customer")
      .inSubquery(col("c_nationkey"), natKeys)
      .project(col("c_custkey"), col("c_acctbal"))
      .build
    assert(rowsOf(in) == rowsOf(spark.sql(graft.queries.SqlOps.subqInSql)))
    assert(in.queryExecution.executedPlan.toString.contains("LeftSemi"))

    val notIn = PlanBuilder.tableScan(tables, "customer")
      .notInSubquery(col("c_nationkey"), natKeys)
      .project(col("c_custkey"), col("c_acctbal"))
      .build
    assert(rowsOf(notIn) == rowsOf(spark.sql(graft.queries.SqlOps.subqNotInSql)))
  }

  test("builder scalarSubquery mirrors the subq_scalar SQL entry") {
    Catalog.registerAll(spark, sfDir)
    val sc = PlanBuilder.tableScan(tables, "orders")
      .filter(col("o_totalprice") > lit(2) * PlanBuilder.scalarSubquery(
        PlanBuilder.tableScan(tables, "orders")
          .aggregate(Nil, Seq(avg(col("o_totalprice")).as("a")))))
      .project(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .build
    assert(rowsOf(sc) == rowsOf(spark.sql(graft.queries.SqlOps.subqScalarSql)))
    // the scalar column composes inside arithmetic anywhere a Column is
    val ratio = PlanBuilder.tableScan(tables, "orders")
      .project(col("o_orderkey"),
        round(col("o_totalprice") / PlanBuilder.scalarSubquery(
          PlanBuilder.tableScan(tables, "orders")
            .aggregate(Nil, Seq(max(col("o_totalprice")).as("m")))), 4).as("frac"))
      .build
    assert(ratio.agg(max(col("frac"))).head().getDouble(0) == 1.0)
  }

  test("builder tableWrite round-trips") {
    val out = PlanBuilder.tableScan(tables, "nation", Seq("n_nationkey", "n_name"))
      .tableWrite("/root/repo/target/tablewrite/builder_nation")
      .build
    assert(out.count() == tables.nation.count())
  }
}
