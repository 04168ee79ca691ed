package graft

import graft.sql.PrestoRewriter

/** The Presto→Spark SQL text rewriter: renames must not touch string
  * literals or partial identifier matches. */
class PrestoRewriterSpec extends SparkSpec {

  test("renames functions outside string literals only") {
    // cardinality is NOT renamed: it resolves to the native overloaded
    // PrestoCardinality (container size OR HLL estimate) at analysis time.
    // strpos routes to the graft builder (instance-arg dispatch).
    val in = "SELECT strpos(text, 'strpos(x)'), cardinality(a) FROM t"
    val out = PrestoRewriter.rewrite(in)
    assert(out == "SELECT presto_strpos(text, 'strpos(x)'), cardinality(a) FROM t")
  }

  test("double-quoted identifiers become backticks; '' escape preserved") {
    assert(PrestoRewriter.rewrite("""SELECT "lang" FROM t WHERE x = 'it''s'""")
      == "SELECT `lang` FROM t WHERE x = 'it''s'")
  }

  test("does not rewrite inside longer identifiers") {
    assert(PrestoRewriter.rewrite("SELECT array_contains(a, 1), power(x, 2) FROM t")
      == "SELECT array_contains(a, 1), power(x, 2) FROM t")
  }

  test("approx_distinct executes via approx_count_distinct") {
    val df = PrestoRewriter.sql(spark, sfDir,
      "SELECT approx_distinct(o_custkey) AS ad FROM orders")
    val ad = df.collect().head.getLong(0)
    val exact = Tables(spark, sfDir).orders.select("o_custkey").distinct().count()
    assert(math.abs(ad - exact).toDouble / exact < 0.1, s"approx=$ad exact=$exact")
  }

  test("all 22 TPC-H SQL texts run through the Presto dialect entry unchanged") {
    (queries.Tpch.all ++ queries.Tpch2.all).foreach { case (name, _, sqlText) =>
      Catalog.registerAll(spark, sfDir)
      val direct = spark.sql(sqlText).collect().map(_.mkString("|")).sorted.toSeq
      val presto = PrestoRewriter.sql(spark, sfDir, sqlText)
        .collect().map(_.mkString("|")).sorted.toSeq
      assert(direct == presto, s"$name diverged under the Presto rewriter")
    }
  }

  test("presto q6 text equals DataFrame q6 result") {
    val presto = PrestoRewriter.sql(spark, sfDir, queries.Presto.q6Presto)
      .collect().map(_.mkString("|")).toSet
    val df = queries.Tpch.q6(Tables(spark, sfDir))
      .collect().map(_.mkString("|")).toSet
    assert(presto == df)
  }
}
