package graft

import graft.queries.{Tpch, Tpch2}

/** DataFrame-vs-SQL twin equality for every TPC-H entry: the fluent form
  * (Tpch/Tpch2) and its ANSI SQL text must produce identical rows on the
  * same session. This is the local, fast half of the driver's three-way
  * check (DataFrame vs Spark-SQL vs DuckDB) — it catches a plan rewrite
  * that drifts from the declared semantics before the oracle gate runs.
  * Mirrors the reference's dual-surface discipline: PlanBuilder plans and
  * parsed SQL feed one logical layer and must agree
  * (axiom/optimizer/tests/PrestoParser.cpp:1094).
  */
class TpchTwinSpec extends SparkSpec {

  Catalog.registerAll(spark, SparkSpec.SfDir)

  (Tpch.all ++ Tpch2.all).foreach { case (name, fn, sql) =>
    test(s"$name: DataFrame rows == SQL-twin rows") {
      val df = fn(tables).collect().map(_.mkString("|")).sorted
      val viaSql = spark.sql(sql).collect().map(_.mkString("|")).sorted
      assert(df.sameElements(viaSql),
        s"$name diverged: df=${df.take(3).mkString(";")} sql=${viaSql.take(3).mkString(";")}")
    }
  }
}
