package graft

import graft.queries.Tpch
import org.apache.spark.sql.SparkSession

/** Multi-config differential execution — the Spark rendering of the
  * reference's parallelism matrix (HiveQueriesTestBase.cpp:75-114: the
  * optimized multi-fragment plan must produce the same rows under
  * workers×drivers ∈ {1,4}×{1,4}). Here the axes that can change Spark's
  * physical plan are AQE and whole-stage codegen; parallelism is the
  * shuffle-partition count. Every config must agree with the default
  * session's answer. */
class DifferentialSpec extends SparkSpec {

  private val queries: Seq[(String, Tables => org.apache.spark.sql.DataFrame)] = Seq(
    ("q1", Tpch.q1 _), ("q3", Tpch.q3 _), ("q13", Tpch.q13 _), ("q16", Tpch.q16 _),
    // round-14 (verdict Next #6): the four round-13 rewrites are
    // partitioning-adjacent by construction — q2's partial-aggregated
    // collect_set min+tie-set, q16's broadcast semi-shrink under the
    // pair-distinct, q18's filter-first broadcast chain, q21's
    // collect_set windows over the join's own hash(l_orderkey)
    // distribution. The reference's four-config discipline
    // (HiveQueriesTestBase.cpp:83-106) exists precisely to shake such
    // shapes; q16 was already on the grid, the other three join it.
    ("q2", Tpch.q2 _),
    ("q18", graft.queries.Tpch2.q18 _), ("q21", graft.queries.Tpch2.q21 _),
    ("minhash", graft.llm.Dedup.neardupMinhash _),
    ("asof", graft.queries.Events.asof _),
    ("asof-native", graft.queries.Events.asofNative _),
    // exercises the injected JsonConsolidationRule, so the rules-off
    // config below actually changes its plan
    ("json-extract", graft.queries.Events.jsonExtract _),
    // exercises SubfieldDecompositionRule (map_filter / transform_values /
    // map_zip_with lookups): rules-off must produce identical rows from
    // the undecomposed plan
    ("subfield-maps", graft.queries.Exprs.subfieldMapFns _),
    // window-heavy gaps-and-islands over hashed anchors: partition count
    // and AQE must not change island boundaries
    ("dup-span-excise", graft.llm.TextStats.dupSpanExcise _),
    // per-doc substring stitch over the excision islands: the emitted
    // cleaned text must be byte-identical under every config
    ("dup-span-cut", graft.llm.TextStats.dupSpanCut _),
    // iterative UnionLoop execution (recursive CTE) joined to a fact
    // table: loop-step results must not depend on AQE/codegen/partitions
    ("recursive-cte", (t: Tables) => graft.sql.PrestoRewriter.sql(
      t.spark, t.sfDir, graft.queries.Presto.recursivePresto)),
    // round-10: manifest-pruned temporal z-order read — the FileIndex
    // prune decision must never change the row set under any config
    ("zorder-date-read", graft.sources.ZOrder.zorderDateIndexedRead _),
    // round-11: real-codec multimodal decode (mapPartitions + ImageIO):
    // codec output must be bit-identical under every engine config
    ("mm-decode", graft.llm.Multimodal.mmDecodeFeatures _),
    // round-11: KLL sketch aggregate — merge order varies with
    // partitioning, but exact-mode quantiles must not
    ("qdigest", (t: Tables) => graft.sql.PrestoRewriter.sql(
      t.spark, t.sfDir, graft.queries.Presto.qdigestPresto)),
    // round-11: correlated quantified comparison (decorrelation path)
    ("quantified-corr", (t: Tables) => graft.sql.PrestoRewriter.sql(
      t.spark, t.sfDir, graft.queries.Presto.quantifiedCorrPresto)))

  private def rows(s: SparkSession, fn: Tables => org.apache.spark.sql.DataFrame): Set[String] =
    fn(Tables(s, sfDir)).collect().map(_.mkString("|")).toSet

  private val configs: Seq[(String, Map[String, String])] = Seq(
    ("aqe-off", Map("spark.sql.adaptive.enabled" -> "false")),
    ("codegen-off", Map("spark.sql.codegen.wholeStage" -> "false")),
    ("partitions-1", Map("spark.sql.shuffle.partitions" -> "1")),
    ("aqe-off-codegen-off-p1", Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.shuffle.partitions" -> "1")),
    // cost-based optimization off: join reorder / stats-driven choices
    // must never change answers, only plans
    ("cbo-off", Map(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.joinReorder.enabled" -> "false")),
    // every graft-injected optimizer rule excluded: the rewrites must be
    // pure optimizations — identical rows with and without them
    ("graft-rules-off", Map(
      "spark.sql.optimizer.excludedRules" ->
        Seq("graft.plans.CardinalityStatsRule", "graft.plans.HistoryStatsRule",
          "graft.plans.JsonConsolidationRule",
          "graft.plans.SubfieldDecompositionRule").mkString(","))))

  queries.foreach { case (qname, fn) =>
    test(s"$qname: identical rows under all engine configs") {
      val expected = rows(spark, fn)
      configs.foreach { case (cname, conf) =>
        val s = spark.newSession()
        conf.foreach { case (k, v) => s.conf.set(k, v) }
        assert(rows(s, fn) == expected, s"config $cname diverged for $qname")
      }
    }
  }

  test("q5 under ANALYZE stats (the bench flow): re-planned joins, identical rows everywhere") {
    // Round-10: the bench warmup installs Analyze stats, and the
    // join-order DP re-plans q5. Statistics must only ever change the
    // PLAN — the same row set must come back under every config,
    // including cbo-off (which ignores the stats) and rules-off (which
    // never installs them).
    try {
      Catalog.tableNames.foreach(t =>
        graft.plans.Analyze.table(spark, Catalog.load(spark, sfDir, t)))
      val expected = rows(spark, Tpch.q5 _)
      configs.foreach { case (cname, conf) =>
        val s = spark.newSession()
        conf.foreach { case (k, v) => s.conf.set(k, v) }
        assert(rows(s, Tpch.q5 _) == expected, s"config $cname diverged for analyzed q5")
      }
    } finally { graft.plans.History.clear(); graft.plans.TableStats.clear() }
  }
}
