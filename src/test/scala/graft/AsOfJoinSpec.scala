package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asof join picks the latest prior value per key (hand oracle)") {
    import spark.implicits._
    val quotes = Seq( // key, time, price
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 50.0)).toDF("user_id", "ts", "price")
    val trades = Seq( // key, time, qty
      (1L, 25L, 5), (1L, 10L, 7), (1L, 5L, 9), (2L, 15L, 3), (3L, 40L, 1))
      .toDF("user_id", "ts", "qty")
    val got = AsOfJoin.asofJoin(trades, quotes, "user_id", "ts", "price", "last_price")
      .select("user_id", "ts", "qty", "last_price")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 25L, 5, 110.0), // latest quote <= 25 is t=20
      (1L, 10L, 7, 100.0), // inclusive: quote at exactly t=10
      (2L, 15L, 3, 50.0)))
    // trade at t=5 (no prior quote) and user 3 (no quotes) are dropped
  }

  test("native as-of exec matches the hand oracle and the composed form") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 50.0)).toDF("user_id", "ts", "price")
    val trades = Seq(
      (1L, 25L, 5), (1L, 10L, 7), (1L, 5L, 9), (2L, 15L, 3), (3L, 40L, 1))
      .toDF("user_id", "ts", "qty")
    val native = graft.operators.NativeAsOfJoin.asofJoinNative(
      trades, quotes, "user_id", "ts", "price", "last_price")
    val got = native.select("user_id", "ts", "qty", "last_price")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 25L, 5, 110.0), (1L, 10L, 7, 100.0), (2L, 15L, 3, 50.0)))
    val composed = AsOfJoin.asofJoin(trades, quotes, "user_id", "ts", "price", "last_price")
      .select("user_id", "ts", "qty", "last_price")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == composed)
  }

  test("forward as-of picks the earliest at-or-after value per key") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:10"), 100.0), (1L, ts("2024-01-01 00:00:20"), 110.0),
      (1L, ts("2024-01-01 00:00:30"), 120.0), (2L, ts("2024-01-01 00:00:15"), 50.0))
      .toDF("user_id", "ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 00:00:25"), 5), (1L, ts("2024-01-01 00:00:10"), 7),
      (1L, ts("2024-01-01 00:00:35"), 9), (2L, ts("2024-01-01 00:00:15"), 3))
      .toDF("user_id", "ts", "qty")
    val got = graft.operators.NativeAsOfJoin.asofJoinNativeForward(
      trades, quotes, "user_id", "ts", "price", "next_price")
      .select("user_id", "qty", "next_price")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == Set(
      (1L, 5, 120.0),  // earliest quote >= 00:25 is 00:30
      (1L, 7, 100.0),  // inclusive: quote at exactly 00:10
      (2L, 3, 50.0)))
    // trade at 00:35 (no later quote) is dropped
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of plans via AsOfJoinExec with planner-inserted exchanges, no cartesian") {
    import spark.implicits._
    val quotes = (1 to 200).map(i => (i.toLong % 10, i.toLong, i * 1.0)).toDF("user_id", "ts", "price")
    val trades = (1 to 300).map(i => (i.toLong % 10, i.toLong + 3, i)).toDF("user_id", "ts", "qty")
    val df = graft.operators.NativeAsOfJoin.asofJoinNative(
      trades, quotes, "user_id", "ts", "price", "last_price")
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan rendering
    assert(plan.contains("AsOfJoin "), s"expected AsOfJoin exec node in:\n$plan")
    assert(plan.contains("Exchange"), "EnsureRequirements should cluster both sides")
    assert(plan.contains("Sort"), "EnsureRequirements should sort both sides")
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"))
    // result sanity at a size where multiple partitions are exercised
    assert(df.count() > 250)
  }

  test("binned range join equals naive range join") {
    import spark.implicits._
    val points = (1 to 500).map(i => (i.toLong, i * 0.37)).toDF("pid", "v")
    val intervals = Seq((0.0, 25.0, "low"), (25.0, 90.0, "mid"),
      (90.0, 200.0, "high"), (10.0, 30.0, "overlap")).toDF("lo", "hi", "band")
    val binned = AsOfJoin.binnedRangeJoin(points, "v", intervals, "lo", "hi", binWidth = 20.0)
      .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }
}
