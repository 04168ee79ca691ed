package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

/** The bounded-buffer top-k aggregator must agree with the window-rank
  * formulation and aggregate partially (map-side) like any agg. */
class TopKSpec extends SparkSpec {

  test("aggregator top-k equals window-rank top-k") {
    val orders = tables.orders
      .select(col("o_custkey").as("key"), col("o_totalprice").as("score"),
        col("o_orderkey").as("id"))
    val viaAgg = TopK.perKey(orders, "key", "score", "id", k = 3)
      .select("key", "rk", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("key", "rk", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("aggregation splits partial/final (map-side k-buffers)") {
    val orders = tables.orders
      .select(col("o_custkey").as("key"), col("o_totalprice").as("score"),
        col("o_orderkey").as("id"))
    val plan = TopK.perKey(orders, "key", "score", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert("Aggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
