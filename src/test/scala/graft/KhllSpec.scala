package graft

import org.scalatest.funsuite.AnyFunSuite

/** KHyperLogLog family pins (functions/KHll): exact-regime answers on
  * hand-derived fixtures, KMV estimation accuracy above K, dense-mode
  * degradation above SparseMax distinct y per key, merge associativity
  * across the generic merge() aggregate and the merge_khll scalar, and
  * the foreign-bytes / mixed-family fail-fast surface. */
class KhllSpec extends AnyFunSuite with SparkSpec {

  private def one(sql: String) = spark.sql(sql).head()

  test("exact regime: cardinality, uniqueness, reidentification on a hand fixture") {
    // x=1 pairs with 3 distinct y, x=2 with 2, x=3 with 1, x=4 with 1
    // (duplicate (x,y) rows collapse)
    val r = one(
      """SELECT cardinality(k) AS card,
                uniqueness_distribution(k, 4) AS ud,
                reidentification_potential(k, 1) AS r1,
                reidentification_potential(k, 2) AS r2
         FROM (SELECT khyperloglog_agg(x, y) AS k FROM VALUES
                 (1, 10), (1, 11), (1, 12), (1, 10),
                 (2, 10), (2, 20),
                 (3, 30), (4, 30) t(x, y))""")
    assert(r.getLong(0) == 4L)
    val ud = r.getMap[Long, Double](1)
    assert(ud.size == 4) // full 1..size histogram, zeros included
    assert(ud(1L) == 0.5 && ud(2L) == 0.25 && ud(3L) == 0.25 && ud(4L) == 0.0, ud.toString)
    assert(r.getDouble(2) == 0.5) // x=3, x=4 have exactly 1 distinct y
    assert(r.getDouble(3) == 0.75) // plus x=2
  }

  test("exact regime: jaccard and intersection against hand-computed sets") {
    // A keys {1,2,3,4}, B keys {3,4,5}: |A∩B|=2, |A∪B|=5
    val r = one(
      """SELECT jaccard_index(a.k, b.k) AS jac,
                intersection_cardinality(a.k, b.k) AS inter
         FROM (SELECT khyperloglog_agg(x, x) AS k
               FROM VALUES (1), (2), (3), (4) t(x)) a
         CROSS JOIN (SELECT khyperloglog_agg(x, x) AS k
                     FROM VALUES (3), (4), (5) t(x)) b""")
    assert(r.getDouble(0) == 0.4, r.getDouble(0).toString)
    assert(r.getLong(1) == 2L)
  }

  test("merge aggregate and merge_khll scalar reproduce the single-pass sketch") {
    val r = one(
      """WITH whole AS (SELECT khyperloglog_agg(x, y) AS k
                        FROM (SELECT id AS x, id % 7 AS y FROM range(500))),
            parts AS (SELECT khyperloglog_agg(x, y) AS k
                      FROM (SELECT id AS x, id % 7 AS y, id % 3 AS g FROM range(500))
                      GROUP BY g),
            merged AS (SELECT merge(k) AS k FROM parts),
            arrayed AS (SELECT merge_khll(array_agg(k)) AS k FROM parts)
       SELECT cardinality(whole.k) AS c0, cardinality(merged.k) AS c1,
              cardinality(arrayed.k) AS c2,
              reidentification_potential(whole.k, 1) AS r0,
              reidentification_potential(merged.k, 1) AS r1
       FROM whole CROSS JOIN merged CROSS JOIN arrayed""")
    assert(r.getLong(0) == 500L && r.getLong(1) == 500L && r.getLong(2) == 500L)
    // every id has exactly 1 distinct y, pre- and post-merge
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("KMV estimate above K and dense y-HLL above SparseMax stay within tolerance") {
    // 20000 distinct x >> K=2048: KMV relative error ~1/sqrt(K) ≈ 2.2%
    val est = one(
      """SELECT cardinality(khyperloglog_agg(x, y))
         FROM (SELECT id AS x, id % 3 AS y FROM range(20000))""").getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.1, est.toString)
    // one key with 500 distinct y (> SparseMax=64 → dense m=64 HLL):
    // uniqueness histogram capped at the last bucket; estimate ±25%
    val ud = one(
      """SELECT uniqueness_distribution(khyperloglog_agg(x, y), 1000) AS ud
         FROM (SELECT 1 AS x, id AS y FROM range(500))""").getMap[Long, Double](0)
    val bucket = ud.collectFirst { case (u, f) if f > 0 => u }.get
    assert(math.abs(bucket - 500.0) / 500.0 < 0.25, bucket.toString)
    assert(ud.values.sum == 1.0)
  }

  test("randomized exact-regime differential: 50 set pairs vs Scala set arithmetic") {
    import spark.implicits._
    // deterministic LCG (public Knuth constants) — no Math.random in specs
    var seed = 0x12345678L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % bound).toInt
    }
    val trials = (0 until 50).map { t =>
      val a = Seq.fill(1 + nextInt(300))(nextInt(500).toLong)
      val b = Seq.fill(1 + nextInt(300))(nextInt(500).toLong)
      (t, a, b)
    }
    (trials.flatMap { case (t, a, _) => a.map(v => (t, "a", v)) } ++
      trials.flatMap { case (t, _, b) => b.map(v => (t, "b", v)) })
      .toDF("trial", "side", "v").createOrReplaceTempView("khll_rand")
    val got = spark.sql(
      """SELECT a.trial,
                cardinality(a.k) AS ca, cardinality(b.k) AS cb,
                jaccard_index(a.k, b.k) AS jac,
                intersection_cardinality(a.k, b.k) AS inter
         FROM (SELECT trial, khyperloglog_agg(v, v) AS k FROM khll_rand
               WHERE side = 'a' GROUP BY trial) a
         JOIN (SELECT trial, khyperloglog_agg(v, v) AS k FROM khll_rand
               WHERE side = 'b' GROUP BY trial) b
         USING (trial)""").collect()
    assert(got.length == 50)
    got.foreach { r =>
      val t = r.getInt(0)
      val sa = trials(t)._2.toSet; val sb = trials(t)._3.toSet
      assert(r.getLong(1) == sa.size && r.getLong(2) == sb.size, s"trial $t cardinality")
      val inter = (sa & sb).size; val uni = (sa | sb).size
      assert(math.abs(r.getDouble(3) - inter.toDouble / uni) < 1e-12,
        s"trial $t jaccard ${r.getDouble(3)} want ${inter.toDouble / uni}")
      assert(r.getLong(4) == inter, s"trial $t intersection ${r.getLong(4)} want $inter")
    }
  }

  test("null handling: null x or y skipped; empty aggregate is NULL") {
    val r = one(
      """SELECT cardinality(khyperloglog_agg(x, y)) AS c
         FROM VALUES (1, 10), (CAST(NULL AS INT), 20), (2, CAST(NULL AS INT)) t(x, y)""")
    assert(r.getLong(0) == 1L)
    assert(one("SELECT khyperloglog_agg(x, y) FROM (SELECT 1 AS x, 1 AS y) WHERE false").isNullAt(0))
  }

  test("merge rejects a KHLL-then-HLL family mix in BOTH orders") {
    // the one-directional guard would silently drop the KHLL partial
    // when the 'GK' frame arrived first; a single-partition local Seq
    // pins the update order (SQL ORDER BY cannot)
    import spark.implicits._
    val khll = one("SELECT khyperloglog_agg(x, x) FROM VALUES (1) t(x)")
      .getAs[Array[Byte]](0)
    val hll = one("SELECT approx_set(x) FROM VALUES (1) t(x)")
      .getAs[Array[Byte]](0)
    def mixed(order: Seq[Array[Byte]]) = intercept[Exception] {
      order.toDF("k").coalesce(1).createOrReplaceTempView("mix_sketches")
      spark.sql("SELECT merge(k) FROM mix_sketches").collect()
    }
    Seq(mixed(Seq(khll, hll)), mixed(Seq(hll, khll))).foreach { e =>
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("mixed sketch families"), msg)
    }
  }

  test("uniqueness_distribution histogram size is range-checked by name") {
    val e = intercept[Exception](one(
      """SELECT uniqueness_distribution(
           (SELECT khyperloglog_agg(x, x) FROM VALUES (1) t(x)), 4294967297)"""))
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("[1, 65536]"), msg)
  }

  test("foreign bytes and mixed families fail by name") {
    val e1 = intercept[Exception](one(
      "SELECT uniqueness_distribution(CAST('junk' AS BINARY), 4)"))
    assert(e1.getMessage.contains("KHyperLogLog") ||
      e1.getCause.getMessage.contains("KHyperLogLog"))
    // a SetDigest on one side of a KHLL comparison is a family mix
    val e2 = intercept[Exception](one(
      """SELECT intersection_cardinality(
           (SELECT khyperloglog_agg(x, x) FROM VALUES (1) t(x)),
           (SELECT make_set_digest(x) FROM VALUES (1) t(x)))"""))
    assert(e2.getMessage.contains("mix") || e2.getCause.getMessage.contains("mix"))
    // cardinality dispatches the 'GK' preamble to the KHLL kernel
    val c = one(
      "SELECT cardinality((SELECT khyperloglog_agg(x, x) FROM VALUES (1), (2) t(x)))")
    assert(c.getLong(0) == 2L)
  }
}
