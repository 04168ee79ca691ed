package graft

import graft.plans.{History, HistoryStatsRule}
import org.apache.spark.sql.functions._

/** Plan-time sampling: with no prior history, a filtered-dimension join
  * must broadcast on the FIRST planning, from a sampled selectivity
  * estimate (reference sampleFilters path). */
class SamplingSpec extends SparkSpec {

  test("sampled selectivity broadcasts a filtered dim with no prior history") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("graft.sampling.enabled", "true")
    val t = Tables(s, sfDir)
    History.clear()
    s.experimental.extraOptimizations = Seq(new HistoryStatsRule(s))

    val dim = t.part.filter(col("p_brand") === "Brand#5")
    val q = t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))

    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected sampling-estimated broadcast on first plan, got:\n$plan")
    assert(History.size > 0, "sampling estimate was not memoized")

    // the part-side estimate is in the right ballpark of the true count
    val est = History.asMap.collectFirst {
      case (k, v) if k.contains("part.parquet") && k.contains("Brand#5") => v
    }.getOrElse(fail(s"no part-side sample recorded: ${History.asMap.keys}"))
    val actual = dim.count()
    assert(est <= actual * 3 + 50 && est >= actual / 3 - 1,
      s"estimate $est far from actual $actual")
  }
}
