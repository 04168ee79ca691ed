package graft

import graft.plans.History
import org.apache.spark.sql.functions._

/** The history loop end-to-end: run → record actuals → re-plan →
  * history-hinted broadcast. Mirrors the reference's recorded-cardinality
  * replan (VeloxHistory.cpp:32-70; TpchPlanTest.cpp:33-38 persists
  * history so later runs plan with recorded cardinalities). */
class HistoryStatsSpec extends SparkSpec {

  test("recorded scan actuals turn a shuffle join into a broadcast join") {
    // Fresh session with the extension and WITHOUT size-based broadcast
    // (threshold -1) or AQE, so only the history rule can broadcast.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val t = Tables(s, sfDir)

    def query = {
      val dim = t.part.filter(col("p_brand") === "Brand#3")
      t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    }

    History.clear()
    val rule = new graft.plans.HistoryStatsRule(s)
    s.experimental.extraOptimizations = Seq(rule)

    val before = query.queryExecution.executedPlan.toString
    assert(before.contains("SortMergeJoin") || before.contains("ShuffledHashJoin"),
      s"expected a shuffle join before history, got:\n$before")

    // Run once, recording per-scan actual output rows.
    History.record(query)
    assert(History.size > 0)

    val after = query.queryExecution.executedPlan.toString
    assert(after.contains("BroadcastHashJoin"),
      s"expected history-hinted broadcast, got:\n$after")
  }

  test("history persists and reloads across stores") {
    val path = "/root/repo/target/history_test.json"
    History.save(path)
    val sizeBefore = History.size
    History.clear()
    assert(History.size == 0)
    History.load(path)
    assert(History.size == sizeBefore)
  }
}
