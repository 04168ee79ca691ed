package graft

import graft.plans.{History, HistoryStatsRule, Sampling}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Plan-time sampling: with no prior history, a filtered-dimension join
  * must broadcast on the FIRST planning, from a sampled selectivity
  * estimate (reference sampleFilters path); join OUTPUT fanout is
  * estimated by sampled execution (reference sampleJoins path,
  * JoinSample.cpp:217) where static per-side stats are blind to key
  * skew. */
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

  /** Two tables, 100 keys with 100 rows each, plus one heavy key (7)
    * with 5000 extra rows on BOTH sides. True inner-join output is
    * 99·100² + 5100² ≈ 27M; the textbook static estimate |L|·|R|/ndv
    * ≈ 2.3M is ~12× under — the skew is invisible per side (both sides
    * are a 15.1k-row table any row-count heuristic calls broadcastable). */
  private def writeSkewed(s: org.apache.spark.sql.SparkSession): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_joinsample").toString
    import s.implicits._
    val rows = (0 until 100).flatMap(k => Seq.fill(100)(k)) ++ Seq.fill(5000)(7)
    rows.zipWithIndex.toDF("k", "payload").write.mode("overwrite").parquet(s"$dir/L")
    rows.zipWithIndex.toDF("k", "payload").write.mode("overwrite").parquet(s"$dir/R")
    dir
  }

  test("sampled join fanout is accurate under one-key skew where static stats are ~12x off") {
    val s = spark.newSession()
    s.conf.set("graft.sampling.targetRows", "500") // force a real (non-degenerate) sample
    val dir = writeSkewed(s)
    val l = s.read.parquet(s"$dir/L")
    val r = s.read.parquet(s"$dir/R").withColumnRenamed("payload", "payload_r")
    val joined = l.join(r, "k")
    val jn = joined.queryExecution.optimizedPlan.collect { case j: Join => j }.head
    val t0 = System.nanoTime()
    val est = Sampling.estimateJoinOutputRows(s, jn.left, jn.right, jn.condition.get)
    val sampleMs = (System.nanoTime() - t0) / 1e6
    val actual = joined.count() // 990_000 + 5100² = 27_000_000
    val naive = (l.count() * r.count()) / 100 // |L|·|R| / ndv(k)
    assert(naive * 5 < actual, s"fixture lost its skew: naive=$naive actual=$actual")
    assert(est >= actual / 5 && est <= actual * 5,
      s"sampled estimate $est far from actual $actual (naive static: $naive, ${sampleMs}ms)")
  }

  test("join-fanout sampling blocks a skew-exploded broadcast and enables a tiny-output one") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("graft.sampling.joins", "true")
    s.conf.set("graft.sampling.targetRows", "500")
    History.clear()
    Sampling.resetJoinSamplingBreaker() // a slow prior suite must not gate this one
    s.experimental.extraOptimizations = Seq(new HistoryStatsRule(s))
    val dir = writeSkewed(s)
    import s.implicits._
    (0 until 200).map(k => (k, s"c$k")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$dir/C")

    val l = s.read.parquet(s"$dir/L")
    val r = s.read.parquet(s"$dir/R").withColumnRenamed("payload", "payload_r")
    val c = s.read.parquet(s"$dir/C")

    // Skewed child join: 27M output rows from two 15.1k-row inputs. A
    // per-side row-count heuristic says "broadcast"; the sampled fanout
    // says 27M >> broadcastRowLimit, so NO hint may appear.
    val skewParent = l.join(r, "k").join(c, "k")
    val skewPlan = skewParent.queryExecution.executedPlan.toString
    assert(!skewPlan.contains("BroadcastHashJoin"),
      s"skew-exploded join side must not broadcast:\n$skewPlan")
    val skewEst = History.asMap.collectFirst { case (k, v) if k.startsWith("join[") => v }
      .getOrElse(fail(s"no join fanout memoized: ${History.asMap.keys}"))
    assert(skewEst > 500000L, s"sampled fanout $skewEst missed the 27M-row explosion")

    // Tiny-output child join: filters cut the key intersection to ~5
    // keys → ~50k output rows. Static join stats (product of sizes)
    // would never broadcast it; the sampled fanout must.
    History.clear()
    val lf = l.filter(col("k") < 5)
    val rf = r.filter(col("k") < 5)
    val tinyParent = lf.join(rf, "k").join(c, "k")
    val tinyPlan = tinyParent.queryExecution.executedPlan.toString
    assert(tinyPlan.contains("BroadcastHashJoin"),
      s"tiny sampled fanout must broadcast the child join in the parent:\n$tinyPlan")

    // Memoization: re-planning the same query must hit History, not
    // re-sample. (No wall-clock assertion — a loaded box would flake it;
    // the unchanged History size already proves the cached path did not
    // re-sample.)
    val sizeBefore = History.size
    val replanned = lf.join(rf, "k").join(c, "k").queryExecution.executedPlan.toString
    assert(replanned.contains("BroadcastHashJoin"))
    assert(History.size == sizeBefore, "re-planning re-sampled instead of hitting History")
  }

  test("a column-vs-literal equality is not a cross-side equi-conjunct") {
    val s = spark.newSession()
    val dir = writeSkewed(s)
    val l = s.read.parquet(s"$dir/L")
    val r = s.read.parquet(s"$dir/R").withColumnRenamed("payload", "payload_r")
      .withColumnRenamed("k", "k_r")
    // Theta join whose only equality is l.k = 5: sampling it would run a
    // plan-time nested-loop product — hasEquiConjunct must say no.
    // Analyzed (not optimized) plan: the optimizer would push k = 5
    // below the join, which is exactly why the raw condition shape must
    // not fool the guard.
    val theta = l.join(r, col("k") === 5 && col("payload") < col("payload_r"))
    val jn = theta.queryExecution.analyzed.collect { case j: Join => j }.head
    assert(!Sampling.hasEquiConjunct(jn.condition.get, jn.left, jn.right),
      "literal equality treated as an equi-conjunct")
    // ...while a genuine cross-side equality still qualifies.
    val equi = l.join(r, col("k") === col("k_r"))
    val jn2 = equi.queryExecution.optimizedPlan.collect { case j: Join => j }.head
    assert(Sampling.hasEquiConjunct(jn2.condition.get, jn2.left, jn2.right))
  }

  test("the sampled-join output cap bounds a near-cross-product estimate") {
    val s = spark.newSession()
    s.conf.set("graft.sampling.targetRows", "2000")
    s.conf.set("graft.sampling.joinOutputCap", "5000")
    val dir = writeSkewed(s)
    import s.implicits._
    // Constant join key on both sides -> the join is a disguised cross
    // product: 15.1k x 15.1k = 228M true output rows. The sampled join
    // must stop at the cap and return the floor cap*f, not execute an
    // unbounded plan-time job.
    s.read.parquet(s"$dir/L").select(lit(1).as("k"), col("payload"))
      .write.mode("overwrite").parquet(s"$dir/L1")
    s.read.parquet(s"$dir/R").select(lit(1).as("k"), col("payload").as("payload_r"))
      .write.mode("overwrite").parquet(s"$dir/R1")
    val l = s.read.parquet(s"$dir/L1")
    val r = s.read.parquet(s"$dir/R1")
    val joined = l.join(r, "k")
    val jn = joined.queryExecution.optimizedPlan.collect { case j: Join => j }.head
    val est = Sampling.estimateJoinOutputRows(s, jn.left, jn.right, jn.condition.get)
    // f = 15100/2000 = 7.55 -> floor = 5000 * 7.55 = 37750; any capped
    // estimate is far above the 500k broadcast limit's "tiny" range and
    // far below running the 228M-row sampled product to completion.
    assert(est >= 5000L, s"capped estimate $est below the cap floor")
    assert(est <= 300000L, s"estimate $est suggests the cap did not truncate the sampled join")
  }

  test("the wall-clock circuit breaker stops join sampling after a slow estimate") {
    val s = spark.newSession()
    s.conf.set("graft.sampling.joins", "true")
    s.conf.set("graft.sampling.targetRows", "500")
    s.conf.set("graft.sampling.joinTimeBudgetMs", "0") // any estimate breaches
    History.clear()
    Sampling.resetJoinSamplingBreaker()
    s.experimental.extraOptimizations = Seq(new HistoryStatsRule(s))
    val dir = writeSkewed(s)
    import s.implicits._
    (0 until 200).map(k => (k, s"c$k")).toDF("k", "name")
      .write.mode("overwrite").parquet(s"$dir/C")
    val l = s.read.parquet(s"$dir/L")
    val r = s.read.parquet(s"$dir/R").withColumnRenamed("payload", "payload_r")
    val c = s.read.parquet(s"$dir/C")

    // First child join gets sampled (and trips the zero budget)...
    l.join(r, "k").join(c, "k").queryExecution.executedPlan
    assert(!Sampling.joinSamplingAllowed, "zero budget did not trip the breaker")
    val sampled = History.asMap.keys.count(_.startsWith("join["))
    assert(sampled == 1, s"expected exactly one sampled join, got $sampled")

    // ...a DIFFERENT join shape must now skip sampling (static fallback).
    val lf = l.filter(col("k") < 5)
    val rf = r.filter(col("k") < 5)
    lf.join(rf, "k").join(c, "k").queryExecution.executedPlan
    assert(History.asMap.keys.count(_.startsWith("join[")) == sampled,
      "breaker tripped but a new join was still sampled")
    Sampling.resetJoinSamplingBreaker()
  }
}
