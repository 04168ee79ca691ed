package graft

import org.apache.spark.sql.streaming.OutputMode

/** The graft-stream micro-batch source: exactly-once delivery of the
  * bounded id space across multiple micro-batches, deterministic
  * replayable content, and correct offset-range partitioning. */
class StreamSourceSpec extends SparkSpec {

  test("bounded stream drains exactly once across multiple micro-batches") {
    val df = spark.readStream.format("graft-stream")
      .option("maxrows", "1000").option("batchrows", "128").load()
    val q = df.writeStream.format("memory").queryName("s_src")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("s_src").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // every id exactly once — no batch boundary dropped or duplicated a row
      assert(rows.length == 1000, s"got ${rows.length} rows")
      assert(rows.map(_._1).sorted.toSeq == (0L until 1000L))
      // content is the pure function of the id (replay-safe)
      assert(rows.forall { case (i, v) => v == (i * 37) % 1000 })
      // and it actually took multiple micro-batches (1000/128 → 8)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        s"batches: ${q.recentProgress.map(_.numInputRows).mkString(",")}")
    } finally q.stop()
  }

  test("streaming aggregation over the source matches the closed form") {
    val df = spark.readStream.format("graft-stream")
      .option("maxrows", "500").option("batchrows", "200").load()
    import org.apache.spark.sql.functions._
    val q = df.groupBy((col("id") % 5).as("g")).agg(sum(col("val")).as("s"))
      .writeStream.format("memory").queryName("s_agg")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("s_agg").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (0L until 500L).groupBy(_ % 5)
        .map { case (g, ids) => g -> ids.map(i => (i * 37) % 1000).sum }
      assert(got == expected)
    } finally q.stop()
  }
}
