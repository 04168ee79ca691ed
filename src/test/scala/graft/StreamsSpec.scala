package graft

import java.sql.Timestamp
import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The streaming module's three stateful patterns, each checked for
  * batch/stream equivalence on the same rows. */
class StreamsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
    Event(ts("2024-01-01 10:10:00"), 1, "click", 2.0),
    Event(ts("2024-01-01 10:20:00"), 1, "view", 3.0),
    Event(ts("2024-01-01 11:30:00"), 1, "click", 4.0), // >30m gap → new session for user 1
    Event(ts("2024-01-01 10:05:00"), 2, "view", 5.0),
    Event(ts("2024-01-01 12:00:00"), 2, "view", 6.0),  // new session for user 2
    // far-future event advances the watermark past every session gap
    Event(ts("2024-01-02 09:00:00"), 3, "click", 7.0))

  test("watermarked tumbling agg: stream (append) equals batch on closed windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = Streams.tumbling(stream.toDF())
      .writeStream.format("memory").queryName("s_tumble")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      // advance watermark in a second microbatch so earlier windows close
      stream.addData(Event(ts("2024-01-03 00:00:00"), 9, "noop", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("s_tumble")
        .collect().map(_.mkString("|")).toSet
      val batch = Streams.tumbling(events.toDF())
        .collect().map(_.mkString("|")).toSet
      // every closed (emitted) window matches its batch counterpart
      assert(streamed.subsetOf(batch))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates, keeps first arrivals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    final case class Doc(ts: Timestamp, doc_id: Long, text: String)
    val stream = MemoryStream[(Timestamp, Long, String)]
    val docs = stream.toDF().toDF("ts", "doc_id", "text")
    val q = Streams.streamingDedup(docs)
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(
        (ts("2024-01-01 10:00:00"), 1L, "alpha"),
        (ts("2024-01-01 10:01:00"), 2L, "beta"),
        (ts("2024-01-01 10:02:00"), 3L, "alpha"), // dup of doc 1 within watermark
        (ts("2024-01-01 10:03:00"), 4L, "gamma"))
      q.processAllAvailable()
      stream.addData((ts("2024-01-01 10:04:00"), 5L, "beta")) // dup of doc 2
      q.processAllAvailable()
      val kept = spark.table("s_dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 2L, 4L), s"got $kept")
    } finally q.stop()
  }

  test("session windows via flatMapGroupsWithState equal the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = Streams.sessions(stream.toDS())
      .writeStream.format("memory").queryName("s_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      stream.addData(Event(ts("2024-01-03 00:00:00"), 9, "noop", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("s_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2), r.getLong(3))).toSet
      val batch = Streams.sessionsBatch(spark, events.toDF())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2), r.getLong(3))).toSet
      // sessions for users 1 and 2 are closed by the watermark; the
      // far-future rows' own sessions may still be open in the stream
      val closed = batch.filter(_._2.before(ts("2024-01-02 00:00:00")))
      assert(closed.subsetOf(streamed), s"missing: ${closed -- streamed}; got $streamed")
      assert(streamed.subsetOf(batch), s"extra: ${streamed -- batch}")
    } finally q.stop()
  }

  test("sessions absorb late-but-within-watermark events correctly across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = Streams.sessions(stream.toDS())
      .writeStream.format("memory").queryName("s_sessions_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 has two gap-separated sessions; user 2 one.
      // the 11:00 event sets the watermark to 09:00 (2h delay), so the
      // batch-2 stragglers below are late but NOT watermark-dropped
      stream.addData(
        Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 11:00:00"), 1, "click", 2.0),
        Event(ts("2024-01-01 10:00:00"), 2, "view", 3.0))
      q.processAllAvailable()
      // batch 2: a late 10:15 event must merge FORWARD into user 1's
      // 10:00 session (not the open 11:00 one — the old eager form
      // absorbed any earlier event into the open session); a late 09:50
      // event must extend user 2's session BACKWARD (start moves)
      stream.addData(
        Event(ts("2024-01-01 10:15:00"), 1, "late", 4.0),
        Event(ts("2024-01-01 09:50:00"), 2, "late", 5.0))
      q.processAllAvailable()
      // flush: advance the watermark past every close
      stream.addData(Event(ts("2024-01-03 00:00:00"), 9, "noop", 0.0))
      q.processAllAvailable()
      val got = spark.table("s_sessions_late")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2), r.getLong(3)))
        .filter(_._1 < 9).toSet
      val want = Set(
        (1L, ts("2024-01-01 10:00:00"), 2, 900L),
        (1L, ts("2024-01-01 11:00:00"), 1, 0L),
        (2L, ts("2024-01-01 09:50:00"), 2, 600L))
      assert(got == want, s"got $got")
    } finally q.stop()
  }

  test("built-in session_window stream equals the custom-state sessionizer on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Event]
    val q = Streams.sessionsBuiltin(stream.toDF())
      .writeStream.format("memory").queryName("s_sessions_builtin")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      stream.addData(Event(ts("2024-01-03 00:00:00"), 9, "noop", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("s_sessions_builtin")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSet
      // the custom-state sessionizer emits the same (user, start, n) facts
      val batch = Streams.sessionsBatch(spark, events.toDF())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getInt(2))).toSet
      val closed = batch.filter(_._2.before(ts("2024-01-02 00:00:00")))
      assert(closed.subsetOf(streamed), s"missing: ${closed -- streamed}; got $streamed")
      assert(streamed.subsetOf(batch), s"extra: ${streamed -- batch}")
    } finally q.stop()
  }

  test("sliding windows emit multiple windows per event") {
    import spark.implicits._
    val batch = Streams.sliding(events.toDF()).collect()
    // 1h window sliding by 15m → each event appears in 4 windows
    val clickWindows = batch.filter(_.getString(1) == "click")
    assert(clickWindows.map(_.getLong(2)).sum == events.count(_.event_type == "click") * 4)
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clickStream = MemoryStream[Event]
    val purchaseStream = MemoryStream[Event]
    val joined = Streams.purchaseAttribution(
      clickStream.toDF(), purchaseStream.toDF())
    val q = joined.writeStream.format("memory").queryName("s_attr")
      .outputMode(OutputMode.Append()).start()
    try {
      val clicks = events.filter(_.event_type == "click")
      val purchases = Seq(
        Event(ts("2024-01-01 10:30:00"), 1, "purchase", 10.0),
        Event(ts("2024-01-01 12:00:00"), 1, "purchase", 20.0),
        Event(ts("2024-01-01 10:30:00"), 2, "purchase", 30.0))
      clickStream.addData(clicks: _*)
      purchaseStream.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = spark.table("s_attr").collect().map(_.mkString("|")).toSet
      val batch = Streams.purchaseAttribution(
        clicks.toDF(), purchases.toDF()).collect().map(_.mkString("|")).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // user 1's 10:30 purchase attributes to the 10:00 and 10:10 clicks
      assert(streamed.count(_.startsWith("1|2024-01-01 10:30")) == 2)
    } finally q.stop()
  }
}
