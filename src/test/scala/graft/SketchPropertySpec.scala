package graft

import org.scalatest.funsuite.AnyFunSuite

/** Distribution-swept properties for the quantile sketches (round 19
  * hardening): the parity suite pins one heavy-tailed fixture; this
  * sweeps five qualitatively different input shapes and checks the
  * invariants that hold for ANY input — monotone quantile vectors,
  * rank-error envelopes, and merge-of-partials consistency — each
  * against the DATA itself (exact rank recount), not against another
  * sketch (the round-19 deflake lesson: never compare two stochastic
  * quantities; KLL's compaction is randomized regardless of input
  * order, so A-vs-B signs are coin flips on healthy code). */
class SketchPropertySpec extends AnyFunSuite with SparkSpec {

  // deterministic generators over 100k rows, all driven by hash(id)
  private val dists: Seq[(String, String)] = Seq(
    ("uniform", "abs(hash(id)) / 2147483647.0 * 1000"),
    ("heavy_tail", "pow(abs(hash(id)) / 2147483647.0, 8) * 1e6"),
    ("lognormalish", "exp(6.0 * abs(hash(id, 7)) / 2147483647.0)"),
    ("discrete", "CAST(pmod(hash(id, 11), 5) AS DOUBLE)"),
    ("bimodal", "CASE WHEN pmod(hash(id, 13), 2) = 0 " +
      "THEN abs(hash(id, 17)) / 2147483647.0 " +
      "ELSE 1000 + abs(hash(id, 19)) / 2147483647.0 END"))

  private val n = 100000L

  for ((name, expr) <- dists) test(s"quantile sketch invariants on $name") {
    import graft.sql.PrestoRewriter
    val df = spark.range(1, n + 1).selectExpr(s"$expr AS x")
    df.createOrReplaceTempView("sk_src")
    def p(sql: String) = PrestoRewriter.sql(spark, sfDir, sql).head()
    def rankOf(v: Double): Double = df.filter(s"x <= $v").count().toDouble / n

    // 1. the quantile vector is non-decreasing for both sketches
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val r = p(s"""SELECT values_at_quantiles(qdigest_agg(x), ARRAY[${qs.mkString(",")}]) AS kll,
                         values_at_quantiles(tdigest_agg(x), ARRAY[${qs.mkString(",")}]) AS td
                  FROM sk_src""")
    val kll = r.getSeq[Double](0); val td = r.getSeq[Double](1)
    assert(kll == kll.sorted, s"$name KLL quantile vector not monotone: $kll")
    assert(td == td.sorted, s"$name tdigest quantile vector not monotone: $td")

    // 2. rank-error envelope vs the data's own exact ranks. For a
    // value v returned at target q, SOME rank in [rank(v-), rank(v)]
    // must be within eps of q (discrete data makes rank(v) jump, so
    // point-rank distance is the wrong measure on atoms).
    def rankErr(v: Double, q: Double): Double = {
      val hi = rankOf(v)
      val lo = hi - df.filter(s"x = $v").count().toDouble / n
      if (q < lo) lo - q else if (q > hi) q - hi else 0.0
    }
    // KLL promises a uniform rank-error envelope; t-digest promises a
    // TAIL-concentrated one (centroids spend where q(1-q) is small), so
    // its pin is per-quantile: tight at the tails, looser mid-quantile
    // (measured 1.1-1.8% mid-q across these distributions with the
    // datasketches default compression — inside Dunning & Ertl's
    // ~q(1-q)-shaped bound, and exactly the trade the parity suite's
    // tail fixture exists to demonstrate).
    // band edges measured (deterministic on these fixed corpora):
    // q=0.9 errs 0.70%, q=0.99 errs <0.5% — the envelope tightens only
    // in the DEEP tail, which is where t-digest spends its centroids
    def tdEps(q: Double): Double = if (q <= 0.01 || q >= 0.99) 0.005 else 0.025
    for ((q, i) <- qs.zipWithIndex) {
      assert(rankErr(kll(i), q) < 0.01, s"$name KLL rank err at q=$q: v=${kll(i)}")
      assert(rankErr(td(i), q) < tdEps(q), s"$name tdigest rank err at q=$q: v=${td(i)}")
    }

    // 3. merge of grouped partials stays inside the same envelope
    val m = p("""SELECT value_at_quantile(merge(s), 0.5) AS med FROM (
                   SELECT qdigest_agg(x) AS s FROM sk_src
                   GROUP BY pmod(hash(CAST(x AS VARCHAR)), 7)) t""")
    assert(rankErr(m.getDouble(0), 0.5) < 0.02,
      s"$name merged-partials median drifted: ${m.getDouble(0)}")
  }
}
