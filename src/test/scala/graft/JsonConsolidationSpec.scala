package graft

import graft.plans.JsonConsolidationRule
import org.apache.spark.sql.functions._

/** The JSON-consolidation rule must collapse k parses into one
  * from_json and preserve results exactly. */
class JsonConsolidationSpec extends SparkSpec {

  test("multiple get_json_object over one column become a single from_json") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(new JsonConsolidationRule(s))
    val t = Tables(s, sfDir)
    val q = t.events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k1"),
      (get_json_object(col("props"), "$.k").cast("int") * 2).as("k2"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("from_json"), s"expected from_json, got:\n$optimized")
    assert(!optimized.contains("get_json_object"), s"unconsolidated parse left:\n$optimized")

    // results identical to the un-ruled session
    val plain = tables.events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k1"),
      (get_json_object(col("props"), "$.k").cast("int") * 2).as("k2"))
    assert(q.collect().map(_.mkString("|")).toSet ==
      plain.collect().map(_.mkString("|")).toSet)
  }

  test("single access and complex paths are left untouched") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(new JsonConsolidationRule(s))
    val t = Tables(s, sfDir)
    val q = t.events.select(get_json_object(col("props"), "$.k").as("only"))
    assert(!q.queryExecution.optimizedPlan.toString.contains("from_json"))
    val q2 = t.events.select(
      get_json_object(col("props"), "$.a.b").as("deep1"),
      get_json_object(col("props"), "$.a.c").as("deep2"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("from_json"))
  }
}
