package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming over the events shape (SURVEY §2.8 — an
  * extension beyond the batch-only reference): the SAME windowed
  * aggregation plan as the batch `events_tumbling` query, run
  * incrementally from a MemoryStream, must produce the batch answer. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling-window agg matches batch on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0),
      (Timestamp.valueOf("2024-01-01 11:15:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 12:00:00"), "view", 5.0))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total"))

    val stream = MemoryStream[(Timestamp, String, Double)]
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = agg(sdf).writeStream
      .format("memory").queryName("ev_agg").outputMode("complete").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ev_agg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = agg(rows.toDF("ts", "event_type", "value")).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(streamed.size == 4) // 10h:click(2), 11h:view, 11h:click, 12h:view
    } finally q.stop()
  }
}
