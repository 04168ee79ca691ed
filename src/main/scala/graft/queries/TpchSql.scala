package graft.queries

import graft.{Catalog, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry surface: the same 16 TPC-H queries executed through
  * `spark.sql` over catalog-registered temp views — the dual-surface
  * design of the reference, where the Presto SQL frontend
  * (axiom/optimizer/tests/PrestoParser.cpp:1094) and the fluent
  * PlanBuilder (axiom/logical_plan/PlanBuilder.h:152-384) both feed one
  * logical-plan layer. Here Catalyst is that layer: the DataFrame form
  * (Tpch.scala) and this SQL form must optimize to equivalent plans and
  * identical results.
  *
  * The SQL text is the same ANSI dialect the DuckDB oracle runs, so each
  * entry is checked three ways: Spark-DataFrame vs Spark-SQL vs DuckDB.
  */
object TpchSql {
  /** name → (query, oracle) for every TPC-H entry, suffixed _sql. */
  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    (Tpch.all ++ Tpch2.all).map { case (name, _, sql) =>
      (s"${name}_sql",
        (spark: SparkSession, sfDir: String) => {
          Catalog.registerAll(spark, sfDir)
          spark.sql(sql)
        },
        sql)
    }
}
