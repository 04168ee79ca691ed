package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events shape — the extension
  * beyond the batch-only reference (SURVEY §2.8: no streaming exists in
  * the tree; the `events` table and this module are north-star scope).
  *
  * Three canonical stateful patterns, each written so the SAME logic runs
  * on the batch table (tested for equivalence in StreamingSpec):
  *  - watermarked tumbling-window aggregation (append mode — late data
  *    beyond the watermark is dropped, windows close and emit once);
  *  - sliding-window aggregation;
  *  - session windows via flatMapGroupsWithState (processing-time-free,
  *    event-time gap sessionization with explicit state).
  *
  * Scale notes: state is partitioned by the grouping key (user_id /
  * event_type) — the same shuffle a batch groupBy does, but long-lived;
  * watermarks bound state size, which is what makes 100 TB/day streams
  * feasible (state holds only open windows, not history).
  */
object Streams {

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class SessionOut(user_id: Long, start: Timestamp, n_events: Int, duration_sec: Long)

  /** Watermarked tumbling 1h window — append mode compatible. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total"))

  /** Sliding window: 1h length, 15m slide. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Built-in session windows (30-minute gap): the declarative
    * counterpart of [[sessions]] — `session_window` merges events whose
    * gaps stay under 30m and lets Spark manage the merging state. Same
    * watermark bound; the custom-state version exists for policies the
    * built-in can't express (per-session caps, carried aggregates).
    * Boundary nuance vs [[sessionsBatch]]: the built-in closes a session
    * when gap >= 30m (window is [ts, ts+gap)), the batch window version
    * when gap > 30m — equal only when no inter-event gap is exactly 30m. */
  def sessionsBuiltin(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).cast("int").as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"), col("n_events"))

  /** Event-time session windows (30-minute gap) with explicit state via
    * flatMapGroupsWithState — the custom-state escape hatch
    * (KeyValueGroupedDataset, SURVEY operator list (d)).
    *
    * A session is emitted only once the WATERMARK passes its close
    * (end + gap): any event at or under the watermark has already
    * arrived, so nothing can extend or merge the session after emission
    * — the append-mode contract. (The round-17 review killed the
    * previous eager form, which emitted a session as soon as a newer
    * in-batch event closed the gap and absorbed arbitrarily-early late
    * events into the OPEN session without moving its start: a late-but-
    * within-watermark event in a later micro-batch produced sessions
    * that diverged permanently from the batch oracle.) Open sessions
    * and new events are merged as INTERVALS — sort by start, coalesce
    * any pair within the gap — so a late event extends a session
    * backward (min start) as naturally as forward. EventTimeTimeout at
    * the earliest open close keeps emission latency at one watermark
    * advance; the watermark GCs state. */
  def sessions(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    // State in MICROSECONDS (java.sql.Timestamp carries micros in its
    // nanos field; getTime would truncate to ms and skew start/duration
    // vs a full-precision batch oracle). Timeouts are set in ms — the
    // watermark's clock.
    val gapUs = 30L * 60 * 1000 * 1000
    def us(t: Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def fromUs(u: Long): Timestamp = Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(u, 1000000L),
        Math.floorMod(u, 1000000L) * 1000L))
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // merge open sessions and new events as intervals: sort by
          // start, coalesce any pair within the gap (handles both the
          // data and the timeout invocation — rows is empty on timeout)
          val pts = rows.map { e => val t = us(e.ts); SessionState(t, t, 1) }.toList
          val all = (state.getOption.getOrElse(Nil) ++ pts).sortBy(_.start)
          val merged = all.foldLeft(List.empty[SessionState]) { (acc, s) =>
            acc match {
              case h :: rest if s.start - h.end <= gapUs =>
                h.copy(end = math.max(h.end, s.end), n = h.n + s.n) :: rest
              case _ => s :: acc
            }
          }
          // final once the watermark passes the close: no event <=
          // watermark can reach it, and later events are > watermark
          val (open, ripe) = merged.partition(s => s.end + gapUs > wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // next flush candidate: the earliest open close (strictly
            // above the current watermark, as the API requires)
            state.setTimeoutTimestamp(
              math.max(wmUs / 1000 + 1, open.map(s => (s.end + gapUs) / 1000).min))
          }
          ripe.sortBy(_.start).map(s =>
            SessionOut(userId, fromUs(s.start), s.n, (s.end - s.start) / 1000000)).iterator
      }
  }

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding hour. Both sides carry watermarks so
    * Spark can bound the join state (clicks older than the interval +
    * watermark are evicted) — the state-bounding contract that makes
    * stream-stream joins feasible at scale. */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("click_value"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("p_ts"), col("c_ts"),
        col("purchase_value"), col("click_value"))
  }

  /** Streaming ingest DEDUP — the streaming half of the corpus-build
    * pipeline (llm.Dedup.dedupExact is the batch half): documents arrive
    * as (ts, doc_id, text); exact duplicates (same content digest) within
    * the watermark horizon are dropped, keeping the first arrival. State
    * holds one digest per distinct doc bounded by the watermark — the
    * dropDuplicatesWithinWatermark contract that keeps state finite on an
    * unbounded 100 TB/day feed (a plain dropDuplicates would accrete
    * state forever). */
  def streamingDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", sha2(col("text"), 256))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("digest")

  /** Drained-replay oracle entry for [[streamingDedup]] (round 14 —
    * the operator existed without a driver-gate entry): documents
    * replay as a stream with a deterministic synthetic arrival time
    * (epoch + doc_id seconds — the corpus has no native timestamp),
    * the stateful dedup drops repeat digests, and the drained output
    * projects the DIGEST ONLY, because WHICH duplicate row survives
    * depends on arrival order across partitions while the distinct
    * digest set does not. [[streamingDedup]]'s 2-hour watermark delay
    * exceeds the synthetic time span at the verify scales (one second
    * per doc: 1.4 h even at sf0.1), so state never evicts mid-replay
    * and the drained set equals a global distinct — at production
    * scale the delay is the admission horizon and state stays bounded
    * by distinct-docs-per-horizon, which is the operator's contract.
    * The testdata corpus carries no exact duplicates, so the DROP path
    * is pinned non-vacuously by StreamsSpec's MemoryStream test (dups
    * within and across microbatches) and by the DedupScale lane's
    * planted clusters on the batch half. */
  /** Materializes a drained memory-sink result DISTRIBUTED (eager
    * localCheckpoint into executor block storage) so the sink view can
    * be dropped — repeated gate/lane invocations must not accrete
    * memory-sink tables. The round-17 collect-and-rewrap version of
    * this was a scale bug: the join's matches and the sessions' row
    * counts grow WITH the corpus (tools/StreamScale runs these entries
    * at 100× = ~3M join matches), so "bounded at gate scale" did not
    * hold on the measured path and every scaled row was bottlenecking
    * through the driver. Checkpoint blocks are released by the lane's
    * unpersist sweep (or the ContextCleaner once the result is
    * unreachable). The result is re-bound to the OUTER session like
    * before, via the checkpointed RDD — no driver materialization. */
  private def detachSink(outer: SparkSession, spark: SparkSession,
                         name: String, df: DataFrame): DataFrame = {
    val ckpt = df.localCheckpoint(true)
    spark.catalog.dropTempView(name)
    outer.createDataFrame(ckpt.rdd, ckpt.schema)
  }

  def dedupStreamedEntry(outer: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // state keys = distinct digests, upper-bounded by the doc count
    // (parquet metadata count — zero-column scan)
    val spark = streamingSession(outer,
      outer.read.parquet(s"$sfDir/documents.parquet").count())
    // Optimization round 19: stream the corpus file ITSELF (the
    // tumbling entry's glob-pinned file-source shape — documents.parquet
    // is a single file by the fixture contract) instead of re-writing a
    // full corpus copy to a staging directory per invocation. The
    // arrival-time column and the (doc_id, text) projection move INSIDE
    // the stream, so the drained result is row-identical; what
    // disappears is a corpus-sized parquet write + delete per run —
    // at the 100× replay volume that staging write was a full extra
    // pass over the data.
    val rawSchema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = streamingDedup(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir)
        .select(col("doc_id"), col("text"))
        .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id"))))
      .select(col("digest"))
    val name = "graft_stream_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one row per distinct digest — still distributed-materialized:
    // digests scale with the corpus, and detachSink frees the sink
    detachSink(outer, spark, name, spark.table(name))
  }

  /** Batch reference implementation of the same sessionization (for the
    * equivalence test and as the backfill path of a lambda-free
    * batch/stream dual deployment). */
  def sessionsBatch(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // MICROSECOND arithmetic throughout — unix_timestamp() truncates to
    // seconds, which disagreed with both the streaming state machine and
    // the DuckDB oracle (epoch_us) on sub-second gaps and durations
    // (the fixture's TIMESTAMP(NANOS) encoding allows them); duration is
    // the same floor-division the streaming side computes
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("boundary")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start"), count(lit(1)).cast("int").as("n_events"),
        floor((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1000000L))
          .as("duration_sec"))
      .select(col("user_id"), col("start"), col("n_events"), col("duration_sec"))
  }

  /** Session clone for the drained-replay entries. Streaming state-store
    * count follows spark.sql.shuffle.partitions, and every store pays
    * checkpoint+commit machinery per micro-batch — so partitions must
    * track STATE VOLUME, not core count (the round-10→11 3× wall cut
    * came from exactly this). Round 12: the count is DERIVED at query
    * build from the entry's estimated distinct state keys — one
    * partition per ~[[KeysPerStatePartition]] keys (~1 MB of store at a
    * ~128 B/key state row), clamped to [[[MinStatePartitions]], session
    * shuffle partitions] so tiny states don't collapse below task
    * parallelism and huge states still spread across the cluster's
    * configured width. SPARK_GRAFT_STREAM_PARTITIONS overrides
    * (DifferentialSpec pins partition-independence of the OUTPUT). */
  private val KeysPerStatePartition = 8192L // ~1 MB of store at ~128 B/key
  private val MinStatePartitions = 8 // task-parallelism floor (r11's tuned value)
  private def streamingSession(spark: SparkSession,
      estimatedStateKeys: => Long): SparkSession = {
    val s = spark.newSession()
    val n = sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS").map(_.toInt).getOrElse {
      val cap = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val keys = math.max(1L, estimatedStateKeys)
      val derived = ((keys + KeysPerStatePartition - 1) / KeysPerStatePartition).toInt
      math.max(math.min(MinStatePartitions, cap), math.min(cap, derived))
    }
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    s
  }

  /** State-key estimate with a cheap short-circuit: the parquet
    * metadata ROW count upper-bounds distinct keys, so when it already
    * sits under the floor×target product the distinct scan is skipped
    * entirely — the estimate only pays a real scan when it can change
    * the answer. */
  private val keysCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def eventsStateKeys(outer: SparkSession, sfDir: String, kind: String)(
      distinctEst: DataFrame => Long): Long =
    keysCache.getOrElseUpdate(s"$sfDir#$kind", {
      val rows = outer.read.parquet(s"$sfDir/events.parquet").count()
      if (rows <= MinStatePartitions * KeysPerStatePartition) rows
      else distinctEst(graft.Catalog.load(outer, sfDir, "events"))
    })

  /** End-to-end Structured Streaming execution of the tumbling
    * aggregation, oracle-checkable: replay the events parquet as a
    * file-source micro-batch stream, aggregate in COMPLETE mode into a
    * memory sink with `Trigger.AvailableNow`, and return the final
    * table. Complete mode makes the drained stream's answer definitionally
    * equal to the batch groupBy(window) result, so `events_tumbling`'s
    * DuckDB SQL checks the STREAMING engine — watermark/append-mode
    * emission (which drops the unclosed tail window by design) is pinned
    * separately in StreamsSpec.
    *
    * Scale note: complete mode re-emits all windows per trigger, which is
    * right for a bounded replay/backfill; an unbounded deployment uses
    * the append-mode [[tumbling]] whose watermark bounds state. */
  def tumblingStreamedEntry(outer: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // state keys = live (window × event_type) groups
    val spark = streamingSession(outer, eventsStateKeys(outer, sfDir, "tumbling")(ev =>
      ev.select(approx_count_distinct(
        struct(date_trunc("hour", col("ts")), col("event_type")))).head().getLong(0)))
    // The file source streams a DIRECTORY; events.parquet is a single
    // file, so stream the sf dir with a glob pinned to it. Same
    // ts normalization Catalog.load applies (schema-only dispatch, so it
    // works on the streaming DataFrame).
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = graft.Catalog.normalizeEventsTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total"))
    val name = "graft_stream_tumbling_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // one row per window × event_type (720 h × 5 types) — but still
    // distributed-materialized for uniformity with the scaled entries
    detachSink(outer, spark, name, spark.table(name))
  }

  /** End-to-end Structured Streaming SESSIONIZATION, oracle-checkable —
    * the custom-state path ([[sessions]]: flatMapGroupsWithState +
    * EventTimeTimeout) drained to completion. Append mode only emits a
    * session once the gap (new data) or the watermark (timeout) closes
    * it, and at end-of-stream each user's LAST session would sit open in
    * state forever — so the replay stages the events file plus two
    * far-future sentinel micro-batches (one file per trigger, mtime-
    * ordered): sentinel 1 advances the watermark past every real
    * timeout, sentinel 2's batch then processes those timeouts and
    * flushes the remaining open sessions through the state store. The
    * sentinel user's own rows are filtered from the result, leaving
    * exactly the batch gaps-and-islands answer — hash-checked by the
    * DuckDB oracle at session granularity (user, start, n, duration).
    *
    * Scale note: this is the bounded-replay/backfill shape; state per
    * trigger holds only OPEN sessions (watermark GCs closed ones), the
    * same bound an unbounded deployment relies on.
    */
  def sessionsStreamedEntry(outer: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // state keys = open sessions, bounded by distinct users
    val spark = streamingSession(outer, eventsStateKeys(outer, sfDir, "sessions")(ev =>
      ev.select(approx_count_distinct(col("user_id"))).head().getLong(0)))
    import spark.implicits._
    val ev = graft.Catalog.load(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    // checkout-relative staging + full cleanup in the finally, the
    // dedupStreamedEntry discipline: repeated gate/lane invocations must
    // not accrete staging copies or memory-sink tables
    val stage = new java.io.File(
      s"target/stream_sessions/${java.util.UUID.randomUUID().toString.take(8)}")
    val inDir = new java.io.File(stage, "in")
    inDir.mkdirs()
    try {
      val base = System.currentTimeMillis()
      // Stage the source file ITSELF: events.parquet is a single file by
      // the fixture contract (the tumbling entry's file-source glob relies
      // on the same), so staging the corpus is one file COPY. The previous
      // coalesce(1) rewrite was a single-task pass over the whole corpus —
      // at 100x replay volume (tools/StreamScale) it dominated the replay
      // wall clock. The stream applies the same schema-dispatched ts
      // normalization the batch reader uses; sentinels are built against
      // the RAW schema (ts may be a nanos long under the fixture's
      // TIMESTAMP(NANOS) encoding).
      val src = new java.io.File(sfDir, "events.parquet")
      val evDst = new java.io.File(inDir, "000_events.parquet")
      java.nio.file.Files.copy(src.toPath, evDst.toPath)
      evDst.setLastModified(base)
      val rawSchema = spark.read.parquet(src.getPath).schema
      def sentinelRow(daysAhead: Int): org.apache.spark.sql.Row = {
        val sentinelMs = maxTs.getTime + daysAhead * 86400000L
        val tsRaw: Any = rawSchema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => sentinelMs * 1000000L // ms -> ns
          case org.apache.spark.sql.types.TimestampNTZType =>
            java.time.LocalDateTime.ofInstant(
              java.time.Instant.ofEpochMilli(sentinelMs), java.time.ZoneOffset.UTC)
          case _ => new Timestamp(sentinelMs)
        }
        org.apache.spark.sql.Row.fromSeq(rawSchema.fields.toSeq.map(_.name match {
          case "ts" => tsRaw
          case "user_id" => -1L
          case "event_type" => "sentinel"
          case "value" => 0.0
          case "event_id" => -1L
          case _ => null
        }))
      }
      // Both sentinels staged by ONE write job (round 20, verdict ask
      // #8 — was two single-row write jobs): a 2-slice parallelize puts
      // one row in each partition BY CONSTRUCTION (a union of local
      // 1-row frames does not survive — ConvertToLocalRelation folds it
      // into one 2-row partition, caught by the require below), so
      // part-00000/part-00001 are sentinel 1/2 and each lands in its
      // own file = its own micro-batch after the mtime-ordered copy.
      val w = new java.io.File(stage, "w_flush")
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(sentinelRow(3), sentinelRow(4)), 2),
        rawSchema).write.mode("overwrite").parquet(w.getPath)
      val parts = w.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      require(parts.length == 2, s"expected 2 sentinel part files, got ${parts.length}")
      def place(part: java.io.File, name: String, mtime: Long): Unit = {
        val dst = new java.io.File(inDir, s"$name.parquet")
        java.nio.file.Files.copy(part.toPath, dst.toPath)
        dst.setLastModified(mtime)
      }
      place(parts(0), "001_flush", base + 10000)
      place(parts(1), "002_flush", base + 20000)
      val stream = graft.Catalog.normalizeEventsTs(
        spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .parquet(inDir.getPath))
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Event]
      val out = sessions(stream)
      val name = "graft_stream_sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = out.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val result = spark.table(name).filter(col("user_id") >= 0)
        .select(col("user_id"), col("start"), col("n_events"), col("duration_sec"))
      // one row per closed session — sessions scale with the corpus
      // (~1.2M at the lane's 100×), so distributed materialization only
      detachSink(outer, spark, name, result)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(stage)
  }

  /** End-to-end stream-stream INTERVAL JOIN, oracle-checkable — the
    * [[purchaseAttribution]] join replayed from two file-source streams
    * (clicks and purchases split out of the events table). An inner
    * stream-stream join emits a match as soon as both rows have arrived
    * — no watermark-close needed for emission (the watermarks exist to
    * bound join STATE) — so a drained AvailableNow replay yields exactly
    * the batch interval join, which DuckDB replays as SQL. */
  def joinStreamedEntry(outer: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // interval joins buffer ROWS inside the watermark bound, not keyed
    // aggregates — the build side's row count is the state estimate
    val spark = streamingSession(outer, eventsStateKeys(outer, sfDir, "join")(ev =>
      ev.filter(col("event_type") === "click").count()))
    // Optimization round 19: stream the events file ITSELF twice (the
    // tumbling entry's glob-pinned file-source shape — events.parquet is
    // one file by the fixture contract) with the click/purchase filters
    // INSIDE each stream, instead of materializing filtered click and
    // purchase parquet copies per invocation. The join input rows are
    // identical (same filters, same projection, same ts normalization);
    // what disappears is two corpus-derived parquet writes + a staging
    // delete per run — at the 100× replay volume those writes were a
    // full extra pass over the events table.
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def rs(eventType: String) = graft.Catalog.normalizeEventsTs(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .filter(col("event_type") === eventType)
    val joined = purchaseAttribution(rs("click"), rs("purchase"))
    val name = "graft_stream_join_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the interval join's matches scale with the corpus (~3M at the
    // lane's 100×) — distributed materialization only
    detachSink(outer, spark, name, spark.table(name))
  }

  /** Driver-contract entries (SparkSession, sfDir) — streaming runs whose
    * drained output is deterministic and SQL-expressible. */
  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("stream_tumbling", tumblingStreamedEntry _,
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY 1, 2"""),
    ("stream_sessions", sessionsStreamedEntry _,
      """WITH g AS (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events),
         b AS (
           SELECT user_id, ts,
                  CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                       THEN 1 ELSE 0 END AS boundary
           FROM g),
         sess AS (
           SELECT user_id, ts,
                  sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
           FROM b)
         SELECT user_id, min(ts) AS start, CAST(count(*) AS INT) AS n_events,
                CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS BIGINT)
                  AS duration_sec
         FROM sess GROUP BY user_id, sid"""),
    ("stream_dedup", dedupStreamedEntry _,
      "SELECT DISTINCT sha256(text) AS digest FROM documents"),
    ("stream_join", joinStreamedEntry _,
      """SELECT p.user_id AS user_id, p.ts AS p_ts, c.ts AS c_ts,
                p.value AS purchase_value, c.value AS click_value
         FROM events p JOIN events c
           ON p.user_id = c.user_id
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
         WHERE p.event_type = 'purchase' AND c.event_type = 'click'"""))
}
