package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Co-bucketed layouts must join without any shuffle exchange — the
  * distribution-aware planning the reference models via TableLayout
  * (Schema.h:190 isSamePartition → no Repartition inserted). */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans with zero shuffle exchanges") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val t = Tables(s, sfDir)

    val joined = Bucketing.coLocatedJoin(
      s,
      t.orders.select(col("o_orderkey"), col("o_totalprice")), "o_orderkey",
      t.lineitem.select(col("l_orderkey"), col("l_quantity")), "l_orderkey")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")
    // and the join still returns the right number of rows
    assert(joined.count() == t.lineitem.count())
  }

  test("bucketed sorted layout enables sort-merge without explicit Sort on both sides") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val t = Tables(s, sfDir)
    Bucketing.writeBucketed(
      t.customer.select(col("c_custkey"), col("c_acctbal")), "graft_bkt_cust", 8, "c_custkey")
    Bucketing.writeBucketed(
      t.orders.select(col("o_custkey"), col("o_totalprice")), "graft_bkt_ord", 8, "o_custkey")
    val j = s.table("graft_bkt_cust").join(
      s.table("graft_bkt_ord"), col("c_custkey") === col("o_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
