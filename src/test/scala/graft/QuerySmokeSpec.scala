package graft

/** Every registered query must execute at sf0.001; queries that cannot be
  * empty there must return rows. Mirrors the reference's differential
  * harness running every TPC-H file per configuration
  * (HiveQueriesTestBase.cpp:75-114). */
class QuerySmokeSpec extends SparkSpec {

  /** Queries allowed to be empty at the smallest scale factor. */
  private val mayBeEmpty = Set(
    "join_anti", "subq_not_exists", "neardup_embedding",
    // selective constant filters with no qualifying rows at sf0.001
    // (non-empty at sf0.01, where the oracle gate runs):
    "tpch_q2", "tpch_q2_sql", "tpch_q7", "tpch_q7_sql",
    "tpch_q22", "tpch_q22_sql", "text_cross_source_leak")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (no rows-only entries remain)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected rows-only entries: $noOracle")
  }
}
