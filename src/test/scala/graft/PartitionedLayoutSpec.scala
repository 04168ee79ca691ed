package graft

import org.apache.spark.sql.functions._

/** Hive-style partitioned directory layouts (§2.7 — the reference's
  * local hive connector requires "Data layout must follow Hive-style
  * partitioning", AxiomSql.cpp): a partition-column predicate must prune
  * directories at planning time, not filter rows after reading. */
class PartitionedLayoutSpec extends SparkSpec {

  test("partition-column filter prunes directories (PartitionFilters, fewer files)") {
    val dir = "/root/repo/target/partitioned/events_by_type"
    tables.events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val part = spark.read.parquet(dir).filter(col("event_type") === "click")

    val scan = part.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "no partition filters pushed")
    // only the click partition's files are selected
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.values.toString.contains("click")))

    val expected = tables.events.filter(col("event_type") === "click").count()
    assert(part.count() == expected)
  }

  test("extensions are active in the default session factory") {
    // Sessions.builder wires graft.plans.GraftExtensions; the shared test
    // session was built through it, so its optimizer must carry our rules.
    val rules = spark.sessionState.optimizer.extendedOperatorOptimizationRules
      .map(_.ruleName)
    assert(rules.exists(_.contains("HistoryStatsRule")), rules.mkString(","))
    assert(rules.exists(_.contains("JsonConsolidationRule")), rules.mkString(","))
  }
}
