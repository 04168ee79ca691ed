package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.History

/** History-driven replanning exercised END-TO-END in the driver flow
  * (round 19, r18 verdict next-step #6): the optimizer-feedback loop —
  * run, record per-subtree actual rows, replan with history-derived
  * stats — previously had in-suite pins only (HistoryStatsSpec). This
  * entry runs the loop inside Verify/the DuckDB gate: the returned
  * frame is planned AFTER one recorded execution, its join flipped to
  * broadcast purely by history actuals (size-based broadcast and AQE
  * are disabled), and the oracle checks the ANSWER through that
  * replanned plan. The plan-shape flip itself is require()-pinned, so
  * a silent loss of the feedback loop turns this correctness row red
  * rather than quietly reverting to the shuffle plan.
  *
  * Reference analogue: the history-based optimizer feedback loop
  * (axiom's history stats provider; SURVEY.md §2 optimizer-parity row).
  */
object HistoryFlow {

  private def historyReplan(spark: SparkSession, dir: String): DataFrame = {
    // Fresh session: the flip must be attributable to the history rule
    // alone, and the confs must not leak into sibling entries.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val t = Tables(s, dir)
    def query = {
      val dim = t.part.filter(col("p_brand") === "Brand#13")
      t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }
    History.clear()
    s.experimental.extraOptimizations = Seq(new graft.plans.HistoryStatsRule(s))
    val before = query.queryExecution.executedPlan.toString
    require(!before.contains("BroadcastHashJoin"),
      s"history_replan: pre-history plan must shuffle-join, got:\n$before")
    History.record(query) // executes once, records per-scan actuals
    val replanned = query
    require(replanned.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "history_replan: recorded actuals must flip the join to broadcast")
    // Pin the result computed THROUGH the replanned plan (eager
    // checkpoint), then clear the global store: sibling entries in the
    // same Verify/Bench process must not inherit this entry's actuals —
    // order-dependent plan changes would make bench times unstable.
    val out = replanned.localCheckpoint(true)
    History.clear()
    out
  }

  private val historyReplanSql =
    """SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand = 'Brand#13'
       GROUP BY p_brand ORDER BY p_brand"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("history_replan", historyReplan _, historyReplanSql))
}
