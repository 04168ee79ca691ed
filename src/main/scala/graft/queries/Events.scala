package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch form of the
  * streaming extension, SURVEY §2.8): JSON property extraction,
  * gap-based sessionization, and CDC-style latest-per-key dedup.
  *
  * Scale notes: sessionization is ONE window shuffle on user_id (the
  * state key a streaming session_window would partition by); the
  * latest-per-key dedup is the row_number pattern that AQE handles under
  * skewed hot keys.
  */
object Events {

  /** JSON subfield extraction — schema-on-read pruning of semi-structured
    * payloads (the map-as-struct motivation in the reference,
    * OptimizerOptions.h:40-46: known keys read as struct fields). */
  def jsonExtract(t: Tables): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))
  val jsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
       round(avg(json_extract_string(props, '$.k')::INT), 4) AS avg_k,
       max(json_extract_string(props, '$.k')::INT) AS max_k
       FROM events GROUP BY event_type"""

  /** Gap-based sessionization: a new session starts after >30 min of
    * inactivity; one window pass (lag + running sum of boundaries). */
  def sessionize(t: Tables): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    t.events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }
  val sessionizeSql: String =
    """WITH g AS (
         SELECT user_id, ts,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
         FROM events)
       SELECT user_id,
              CAST(sum(CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
              count(*) AS n_events
       FROM g GROUP BY user_id"""

  /** CDC-style dedup: keep only the latest event per (user, type). */
  def latestPerKey(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
  }
  val latestPerKeySql: String =
    """SELECT user_id, event_type, event_id, value
       FROM (SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) s
       WHERE rn = 1"""

  /** As-of join: each purchase finds the user's most recent prior click
    * (graft.operators.AsOfJoin — union+window formulation, one shuffle).
    * Oracle: DuckDB's native ASOF JOIN. */
  def asof(t: Tables): DataFrame = {
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.operators.AsOfJoin.asofJoin(
      purchases, clicks, key = "user_id", time = "ts",
      valueCol = "click_id", as = "last_click_id")
      .select(col("event_id"), col("user_id"), col("last_click_id"))
  }
  val asofSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS last_click_id
       FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
       ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts >= c.ts"""

  /** Same as-of query through the NATIVE whole-operator path
    * (graft.operators.NativeAsOfJoin: logical node + strategy + merge
    * exec) — dual-surface proof against the same DuckDB ASOF oracle. */
  def asofNative(t: Tables): DataFrame = {
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.operators.NativeAsOfJoin.asofJoinNative(
      purchases, clicks, key = "user_id", time = "ts",
      valueCol = "click_id", as = "last_click_id")
      .select(col("event_id"), col("user_id"), col("last_click_id"))
  }

  /** FORWARD as-of through the native operator: each purchase finds the
    * user's next click at-or-after it. Time negation reuses the same
    * backward merge exec; oracle is DuckDB's forward ASOF. */
  def asofForward(t: Tables): DataFrame = {
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.operators.NativeAsOfJoin.asofJoinNativeForward(
      purchases, clicks, key = "user_id", time = "ts",
      valueCol = "click_id", as = "next_click_id")
      .select(col("event_id"), col("user_id"), col("next_click_id"))
  }
  val asofForwardSql: String =
    """SELECT p.event_id, p.user_id, c.event_id AS next_click_id
       FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
       ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') c
         ON p.user_id = c.user_id AND p.ts <= c.ts"""

  // ------------------------------------------------------------ gap fill
  /** Time-series gap fill: hourly per-type averages on a COMPLETE hour
    * grid (missing buckets forward-filled with the last observation) —
    * the resample/interpolate step before any windowed model sees the
    * series. The grid is generated per group with sequence+explode (no
    * driver-side loop, no calendar table); the fill is one window shuffle
    * on event_type with an ignore-nulls running last. At 100 TB the
    * grid's size is bounded by (groups × buckets), independent of event
    * volume — the aggregation before it is what touches the raw data. */
  def gapfill(t: Tables): DataFrame = {
    val b = t.events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(round(avg(col("value")), 4).as("v"))
      .select(col("event_type"), col("w.start").as("m"), col("v"))
    val grid = b.groupBy(col("event_type"))
      .agg(min(col("m")).as("lo"), max(col("m")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("m"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq("event_type", "m"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v").isNull.cast("long"))
      .select(col("event_type"), col("m"), col("filled"), col("is_gap"))
  }
  val gapfillSql: String =
    """WITH b AS (
         SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS m,
                round(avg(value), 4) AS v
         FROM events GROUP BY 1, 2
       ), ext AS (
         SELECT event_type, min(m) AS lo, max(m) AS hi FROM b GROUP BY 1
       ), grid AS (
         SELECT event_type,
                unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS m
         FROM ext
       ), j AS (
         SELECT g.event_type, g.m, b.v
         FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.m = g.m)
       SELECT event_type, m,
              last_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY m
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
              CAST(v IS NULL AS BIGINT) AS is_gap
       FROM j"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("events_json_extract", jsonExtract _, jsonExtractSql),
    ("events_gapfill", gapfill _, gapfillSql),
    ("events_sessionize", sessionize _, sessionizeSql),
    ("events_latest_per_key", latestPerKey _, latestPerKeySql),
    ("events_asof", asof _, asofSql),
    ("events_asof_native", asofNative _, asofSql),
    ("events_asof_forward", asofForward _, asofForwardSql))
}
