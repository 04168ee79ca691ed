package graft.sources

import java.util
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** A complete DataSource V2 connector — the Spark rendering of the
  * reference's connector surface (ConnectorMetadata table resolution,
  * ConnectorSplitManager split enumeration, TableLayout pruning;
  * reference `axiom/connectors/ConnectorMetadata.h`,
  * `ConnectorSplitManager.h`, `connectors/tpch/TpchConnectorMetadata.cpp`
  * — the dbgen-style generator connector whose rows are a pure function
  * of the row id, which is exactly what makes this one oracle-checkable).
  *
  * The scan planning demonstrates the three contracts a 100 TB connector
  * must honor:
  *  - column pruning: `pruneColumns` narrows the reader's schema, so a
  *    2-column projection never materializes the rest;
  *  - filter pushdown: id-range predicates are absorbed COMPLETELY
  *    (returned as non-residual), bounding generation at the source;
  *  - split pruning: the id space is enumerated as `splits` contiguous
  *    ranges and splits wholly outside the pushed bounds are never
  *    planned — the connector-side analogue of partition pruning (fewer
  *    tasks, not just fewer rows).
  */
class RangeDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeDocSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeDocTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("splits", "8").toInt)
}

object RangeDocSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
  /** Deterministic row content: pure integer functions of the id, so any
    * engine (the DuckDB oracle uses `range()`) regenerates identical rows. */
  def valOf(id: Long): Long = (id * 37) % 1000
  def tagOf(id: Long): String = "t" + (id % 7)
}

final class RangeDocTable(rows: Long, splits: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeDocSource.Schema
  override def capabilities(): util.Set[TableCapability] = Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeDocScanBuilder(rows, splits)
}

final class RangeDocScanBuilder(rows: Long, splits: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeDocSource.Schema
  private var idLo = 0L
  private var idHi = rows - 1
  private var pushed = Array.empty[Filter]

  private def bound(f: Filter): Boolean = f match {
    case GreaterThan("id", v: Number)        => idLo = math.max(idLo, v.longValue + 1); true
    case GreaterThanOrEqual("id", v: Number) => idLo = math.max(idLo, v.longValue); true
    case LessThan("id", v: Number)           => idHi = math.min(idHi, v.longValue - 1); true
    case LessThanOrEqual("id", v: Number)    => idHi = math.min(idHi, v.longValue); true
    case EqualTo("id", v: Number) =>
      idLo = math.max(idLo, v.longValue); idHi = math.min(idHi, v.longValue); true
    case _ => false
  }

  /** Absorb id-range conjuncts into the scan bounds; everything else is
    * residual (Spark re-evaluates it above the scan). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (absorbed, residual) = filters.partition(bound)
    pushed = absorbed
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new RangeDocScan(rows, splits, idLo, idHi, required)
}

final class RangeDocScan(rows: Long, splits: Int, idLo0: Long, idHi0: Long,
    required: StructType) extends Scan with Batch with SupportsRuntimeFiltering {
  private var idLo = idLo0
  private var idHi = idHi0
  // Runtime IN-set from a dynamic filter (null = none). Kept alongside the
  // range bounds: bounds prune whole splits, the set prunes rows.
  private var idSet: Set[Long] = null

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-range rows=$rows splits=$splits bounds=[$idLo,$idHi]"

  /** Runtime (dynamic) filtering — the Spark-idiomatic analogue of the
    * reference's index-lookup join (TableScan with lookupKeys,
    * RelationOp.h:271-318): when this scan sits under a join, Spark ships
    * the build side's observed id set here BEFORE planning input
    * partitions, and splits outside the set's range are never started —
    * point-lookup behavior from a plain scan + join plan. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // a projection that pruned id out must opt out — Spark resolves
    // these refs against the scan's output (same guard as TpchScan)
    if (!required.fieldNames.contains("id")) Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val ids = vs.collect { case n: Number => n.longValue() }
      if (ids.nonEmpty) {
        idSet = if (idSet == null) ids.toSet else idSet intersect ids.toSet
        idLo = math.max(idLo, ids.min)
        idHi = math.min(idHi, ids.max)
      }
    case GreaterThan("id", v: Number)        => idLo = math.max(idLo, v.longValue + 1)
    case GreaterThanOrEqual("id", v: Number) => idLo = math.max(idLo, v.longValue)
    case LessThan("id", v: Number)           => idHi = math.min(idHi, v.longValue - 1)
    case LessThanOrEqual("id", v: Number)    => idHi = math.min(idHi, v.longValue)
    case _ => ()
  }

  /** Enumerate the full id space as `splits` contiguous ranges, then DROP
    * splits wholly outside the pushed bounds (split pruning). */
  override def planInputPartitions(): Array[InputPartition] = {
    if (idHi < idLo) return Array.empty
    val per = math.max(1L, (rows + splits - 1) / splits)
    (0 until splits).iterator
      .map { i => (i * per, math.min((i + 1) * per - 1, rows - 1)) }
      .filter { case (lo, hi) => lo <= hi && hi >= idLo && lo <= idHi }
      .map { case (lo, hi) =>
        RangeDocPartition(math.max(lo, idLo), math.min(hi, idHi), idSet) }
      .filter(p => p.members == null || p.members.exists(i => i >= p.lo && i <= p.hi))
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = RangeDocReaderFactory(required)
}

/** `members == null` means "all ids in [lo, hi]"; a non-null set narrows
  * the range to its members (runtime point lookups). */
final case class RangeDocPartition(lo: Long, hi: Long, members: Set[Long] = null)
    extends InputPartition

final case class RangeDocReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangeDocPartition]
    new PartitionReader[InternalRow] {
      private var cur = rp.lo - 1
      override def next(): Boolean = {
        cur += 1
        while (cur <= rp.hi && rp.members != null && !rp.members.contains(cur)) cur += 1
        cur <= rp.hi
      }
      override def get(): InternalRow = InternalRow.fromSeq(schema.fieldNames.toSeq.map {
        case "id"  => cur
        case "val" => RangeDocSource.valOf(cur)
        case "tag" => UTF8String.fromString(RangeDocSource.tagOf(cur))
      })
      override def close(): Unit = ()
    }
  }
}

/** Registered query over the connector (independent of the driver's
  * parquet tables — the oracle regenerates the rows with `range()`). */
object CustomSource {
  def pushdownQuery(spark: SparkSession): DataFrame =
    spark.read.format("graft-range")
      .option("rows", "10000").option("splits", "16").load()
      .filter(col("id") >= 2000 && col("id") < 8000)
      .groupBy(col("tag"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  val pushdownQuerySql: String =
    """SELECT 't' || (i % 7) AS tag, count(*) AS n,
              CAST(sum((i * 37) % 1000) AS BIGINT) AS sum_val,
              min(i) AS min_id, max(i) AS max_id
       FROM range(2000, 8000) t(i) GROUP BY 1"""

  /** TableWrite through the graft-mem connector's atomic commit protocol:
    * write a projection, read it back, digest — the connector-backed
    * counterpart of the copy-on-write parquet table_write_* entries. */
  def memWriteRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val t = graft.Tables(spark, sfDir)
    t.nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.format("graft-mem").option("table", "nation_rt").mode("overwrite").save()
    spark.read.format("graft-mem").option("table", "nation_rt").load()
      .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("key_sum"),
        min(col("n_name")).as("first_name"), max(col("n_regionkey")).as("max_region"))
  }
  val memWriteRoundtripSql: String =
    """SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
              min(n_name) AS first_name, max(n_regionkey) AS max_region
       FROM nation"""

  /** Cross-connector join — one query spanning two connectors, the
    * reference's multi-connector planning shape
    * (axiom/optimizer/tests/PlanTest.cpp:444): the graft-mem DSv2 table
    * (written through the atomic commit protocol) is the dimension, the
    * parquet-backed customer table the fact. The 25-row mem side is
    * explicitly broadcast — at 100 TB the fact side streams and the
    * join never shuffles (PlanAuditSpec keeps every entry
    * cartesian-free). The oracle replays the same join in DuckDB from
    * the nation parquet the mem table was loaded from. */
  def crossConnectorJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val t = graft.Tables(spark, sfDir)
    t.nation.select(col("n_nationkey"), col("n_name"))
      .write.format("graft-mem").option("table", "nation_dim").mode("overwrite").save()
    val dim = spark.read.format("graft-mem").option("table", "nation_dim").load()
    t.customer
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }
  val crossConnectorJoinSql: String =
    """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("source_custom_pushdown", (s, _) => pushdownQuery(s), pushdownQuerySql),
    ("source_cross_connector", crossConnectorJoin _, crossConnectorJoinSql),
    ("table_write_connector", memWriteRoundtrip _, memWriteRoundtripSql))
}
