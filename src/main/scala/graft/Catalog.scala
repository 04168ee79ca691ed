package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated Parquet directories.
  *
  * Mirrors the reference's connector/catalog layer
  * (axiom/connectors/ConnectorMetadata.h:171-285 `TableLayout`,
  * axiom/optimizer/Schema.h:365-401 `SchemaTable`): tables are
  * catalog-resolved with fixed schemas, not inferred per query. Here the
  * "connector" is Spark's Parquet source, which already provides split
  * enumeration, filter pushdown and column pruning (SURVEY.md §2.7).
  *
  * Scale note: each table is one parquet file/dir; at 100 TB these become
  * partitioned directories — `spark.read.parquet` handles both, and all
  * downstream code only sees the logical table name.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to always broadcast in joins at any scale factor:
    * region (5 rows) and nation (25 rows) are fixed-size dimension tables
    * in TPC-H regardless of sf.
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(raw) else raw
  }

  /** events.ts has arrived in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS), which Spark's vectorized reader only
    * accepts as nanos-since-epoch LONG (spark.sql.legacy.parquet
    * .nanosAsLong, set in Sessions.builder), and plain µs TIMESTAMP_NTZ.
    * Both normalize to a session-zone (UTC) TIMESTAMP at micros
    * precision so every consumer — batch, streaming replays, the DuckDB
    * oracle — sees one type. The nanos→micros step needs integer floor
    * division: `/` on Columns is double division, and nanos ~1.7e18
    * exceed double's 53-bit mantissa, which truncated ~1.6% of rows a
    * microsecond early. Works on streaming DataFrames too (schema-only
    * dispatch). */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` works alongside
    * the DataFrame API (same dual surface as the reference: PlanBuilder
    * and the Presto SQL frontend feed one logical-plan layer).
    *
    * Memoized per (session, sfDir): each registration re-reads 10
    * parquet footers for schemas, which dominated every SQL-surface
    * query's latency when paid per call. Re-registering only happens
    * when the same session switches scale factors.
    */
  // Weak keys: sessions must stay collectable (differential tests spin
  // up many short-lived ones). All access synchronized — WeakHashMap is
  // not thread-safe.
  private val registeredDir = new java.util.WeakHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (registeredDir.get(spark) != sfDir) {
      tableNames.foreach { t =>
        load(spark, sfDir, t).createOrReplaceTempView(t)
      }
      registeredDir.put(spark, sfDir)
    }
  }
}

/** Convenience accessors for one scale-factor directory. */
final case class Tables(spark: SparkSession, sfDir: String) {
  /** `sfDir` is normally a parquet directory; the magic form
    * `graft_tpch:<schema>` resolves tables from the TPC-H generator
    * catalog instead (its schemas are a strict superset of the driver
    * parquet's), so every registered query runs storage-free against
    * generated data — the reference runs its TPC-H plan tests on the
    * generator connector the same way (TpchPlanTest). */
  def apply(name: String): DataFrame =
    if (sfDir.startsWith("graft_tpch:"))
      spark.table(s"graft_tpch.${sfDir.stripPrefix("graft_tpch:")}.$name")
    else Catalog.load(spark, sfDir, name)
  def region: DataFrame = apply("region")
  def nation: DataFrame = apply("nation")
  def customer: DataFrame = apply("customer")
  def supplier: DataFrame = apply("supplier")
  def part: DataFrame = apply("part")
  def orders: DataFrame = apply("orders")
  def lineitem: DataFrame = apply("lineitem")
  def events: DataFrame = apply("events")
  def documents: DataFrame = apply("documents")
  def embeddings: DataFrame = apply("embeddings")
}

/** SparkSession factory with the engine's standard configuration.
  * local[*] testing stands in for a multi-executor cluster; all sizing
  * knobs (shuffle partitions, AQE) are set so the same plans scale.
  */
object Sessions {
  def builder(master: String = "local[*]", appName: String = "graft") =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.queryExecutionListeners", "graft.plans.HistoryListener")
      .config("spark.sql.catalog.graft_mem", "graft.sources.MemCatalog")
      .config("spark.sql.catalog.graft_tpch", "graft.sources.TpchCatalog")
      // storage-partitioned joins: DSv2 scans reporting
      // KeyGroupedPartitioning (graft-tpch range buckets) join
      // exchange-free when both sides cluster by the same transform
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.shuffle.partitions", "32")
      // Cost-based optimization incl. the join-order DP — the analogue
      // of the reference's makeJoins memo search (axiom/optimizer/
      // Optimization.cpp:1555-1616). Inert until cardinalities exist:
      // graft's path-backed scans have no row counts until
      // CardinalityStatsRule installs them from History/Analyze, and
      // CostBasedJoinReorder requires a row count on every join input.
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
