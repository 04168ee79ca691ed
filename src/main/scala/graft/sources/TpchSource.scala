package graft.sources

import java.util
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** The TPC-H generator connector — the Spark rendering of the
  * reference's dbgen-backed connector
  * (axiom/connectors/tpch/TpchConnectorMetadata.{h,cpp}: schema-as-scale
  * catalog resolution `TpchConnectorMetadata::findTable`
  * TpchConnectorMetadata.cpp:238-263, split enumeration by row ranges
  * `TpchSplitSource::getSplits` :93-127, sampling by generation :187).
  *
  * `graft_tpch.<schema>.<table>` resolves the eight TPC-H tables at the
  * scale the schema names — `tiny` = SF 0.01, `sfN` = SF N — exactly the
  * reference's `getScaleFactor` (TpchConnectorMetadata.cpp:61-67). Rows
  * are a pure function of the global row index (counter-based splitmix64
  * hashing), so:
  *  - splits are contiguous row ranges and ANY split count yields the
  *    same table (split-count independence, spec-pinned);
  *  - generation happens inside each task — a 100 TB benchmark table
  *    needs zero storage and scales with executors, which is the point
  *    of a generator connector;
  *  - primary-key range predicates prune whole splits (keys are dense
  *    `1..N`, so key ranges ARE row ranges); lineitem prunes on
  *    l_orderkey the same way (lines are generated per order).
  *
  * The generator follows the public TPC-H specification's schemas,
  * cardinalities (10k suppliers / 200k parts / 150k customers / 1.5M
  * orders per SF; partsupp = 4 per part; 1..7 lines per order), value
  * domains, the retail-price formula, and the part→supplier assignment
  * formula, and keeps cross-table arithmetic consistent (o_totalprice
  * is the sum over the order's generated lines; l_extendedprice =
  * l_quantity × the part's retail price). It is NOT bit-compatible with
  * dbgen's RNG streams: order keys are dense (dbgen's are sparse),
  * comments are synthetic text, and string columns hash-pick from the
  * spec's value lists — documented divergences; the reference links the
  * actual dbgen library, which is not portable here.
  */
class TpchCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog {
  private var catalogName: String = "graft_tpch"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  // ---- FunctionCatalog: the range_bucket partition transform behind
  // storage-partitioned joins (both sides of orders ⋈ lineitem report
  // KeyGroupedPartitioning over range_bucket(per, key) — Spark's SPJ
  // then plans the fact×fact join with NO exchange).
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "range_bucket_200000"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name().toLowerCase match {
      // the range size is part of the NAME: Spark's key-grouped
      // partitioning only supports single-argument transforms over a
      // column reference, and differently-sized ranges must compare
      // incompatible (canonicalName inequality)
      case s if s.startsWith("range_bucket_") && s.drop(13).nonEmpty &&
          s.drop(13).forall(_.isDigit) =>
        TpchGen.RangeBucketUnbound(s.drop(13).toLong)
      case _ => throw new IllegalArgumentException(
        "graft_tpch function not found: " +
          (ident.namespace() :+ ident.name()).mkString("."))
    }

  private def scaleOf(ns: Array[String]): Option[Double] = ns match {
    case Array(s) => TpchGen.scaleOf(s)
    case _ => None
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (scaleOf(namespace).isEmpty) throw new NoSuchNamespaceException(namespace.toSeq)
    TpchGen.TableNames.map(t => Identifier.of(namespace, t)).toArray
  }
  override def loadTable(ident: Identifier): Table = {
    val sf = scaleOf(ident.namespace()).getOrElse(
      throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq))
    if (!TpchGen.TableNames.contains(ident.name().toLowerCase))
      throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
    new TpchTable(ident.name().toLowerCase, sf)
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft_tpch tables are generated, not created")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft_tpch tables are generated, not alterable")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft_tpch tables are generated, not renameable")

  override def listNamespaces(): Array[Array[String]] =
    Array(Array("tiny"), Array("sf0_1"), Array("sf1"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace.toSeq)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    scaleOf(namespace) match {
      case Some(sf) => Map("scaleFactor" -> sf.toString).asJava
      case None => throw new NoSuchNamespaceException(namespace.toSeq)
    }
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft_tpch schemas are scales, not creatable")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft_tpch schemas are scales, not alterable")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

final class TpchTable(table: String, sf: Double) extends Table with SupportsRead {
  override def name(): String = s"graft_tpch.$table(sf=$sf)"
  override def schema(): StructType = TpchGen.schemaOf(table)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TpchScanBuilder(table, sf)
}

/** Key-range pushdown: the table's dense primary key (orders/customer/
  * part/supplier: first column; lineitem: l_orderkey) maps 1:1 onto the
  * generator's row/order index, so absorbed key bounds prune splits. */
final class TpchScanBuilder(table: String, sf: Double) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val keyCol = TpchGen.keyColumnOf(table)
  private var required: StructType = TpchGen.schemaOf(table)
  // bounds in KEY units (for partsupp: ps_partkey, 4 rows per key —
  // build() translates to row units)
  private var keyLo = 1L
  private var keyHi =
    if (table == "partsupp") TpchGen.parts(sf) else TpchGen.keySpan(table, sf)
  private var pushed = Array.empty[Filter]

  // region/nation EMIT 0-based keys (r_regionkey = k-1) while the
  // generator's internal key index is 1-based: a filter value v on the
  // emitted column names internal key v+1
  private val off = TpchGen.keyOffsetOf(table)

  private def bound(f: Filter): Boolean = f match {
    case GreaterThan(c, v: Number) if c == keyCol =>
      keyLo = math.max(keyLo, v.longValue + off + 1); true
    case GreaterThanOrEqual(c, v: Number) if c == keyCol =>
      keyLo = math.max(keyLo, v.longValue + off); true
    case LessThan(c, v: Number) if c == keyCol =>
      keyHi = math.min(keyHi, v.longValue + off - 1); true
    case LessThanOrEqual(c, v: Number) if c == keyCol =>
      keyHi = math.min(keyHi, v.longValue + off); true
    case EqualTo(c, v: Number) if c == keyCol =>
      keyLo = math.max(keyLo, v.longValue + off)
      keyHi = math.min(keyHi, v.longValue + off); true
    // IN-list point lookups: narrow the planned split range to
    // [min, max] like the runtime filter() path already does, but stay
    // RESIDUAL (return false) — the range is necessary, not sufficient,
    // so Spark must still evaluate exact membership (round-17 review:
    // a 2-key IN planned every split while the same filter arriving at
    // runtime pruned).
    case In(c, vs) if c == keyCol && vs.nonEmpty &&
        vs.forall(_.isInstanceOf[Number]) =>
      val ids = vs.map(_.asInstanceOf[Number].longValue + off)
      keyLo = math.max(keyLo, ids.min)
      keyHi = math.min(keyHi, ids.max)
      false
    case _ => false
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // lineitem's key bounds stay residual-evaluated too (a key range
    // bounds ORDERS, but Spark must still see the filter for lines)
    val (absorbed, residual) = filters.partition(bound)
    pushed = absorbed
    if (table == "lineitem") filters else residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = {
    // partsupp rows are (partkey, supplier-slot) pairs: key bounds on
    // ps_partkey translate exactly to row ranges (4 rows per part)
    val (lo, hi) =
      if (table == "partsupp") ((keyLo - 1) * 4 + 1, keyHi * 4) else (keyLo, keyHi)
    new TpchScan(table, sf, lo, hi, required)
  }
}

final class TpchScan(table: String, sf: Double, keyLo0: Long, keyHi0: Long,
    required: StructType) extends Scan with Batch
    with SupportsReportPartitioning with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportOrdering {
  private var keyLo = keyLo0
  private var keyHi = keyHi0
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tpch $table sf=$sf keys=[$keyLo,$keyHi]"

  /** Statistics by generation math — the reference's
    * `TpchTableLayout::sample` answers row counts the same way
    * (TpchConnectorMetadata.cpp:187-198): the CBO sees generated-table
    * sizes with no ANALYZE, so nation/region broadcast automatically. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows: Long = {
      val span = TpchGen.keySpan(table, sf)
      val inRange = math.max(0L, math.min(keyHi, span) - math.max(keyLo, 1L) + 1L)
      if (table == "lineitem") inRange * 4 else inRange
    }
    // ~64 bytes per projected column is plenty for relative sizing
    override def sizeInBytes: java.util.OptionalLong =
      java.util.OptionalLong.of(rows * math.max(1, required.length) * 64L)
    override def numRows: java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  /** Runtime (dynamic) filtering: a build-side key set observed by a
    * join narrows the planned key range BEFORE partitions are created —
    * the generator-side index-lookup analogue (same contract as
    * graft-range, CustomSource.scala). */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // partsupp's scan bounds are in ROW units (4 per ps_partkey) — its
    // key values don't compare against them, so it opts out; a scan
    // whose projection PRUNED the key out must opt out too (Spark
    // resolves these refs against the scan's output)
    if (table == "partsupp" || !required.fieldNames.contains(TpchGen.keyColumnOf(table)))
      Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      TpchGen.keyColumnOf(table)))
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val keyCol = TpchGen.keyColumnOf(table)
    // emitted-key → internal-key offset (region/nation emit 0-based)
    val off = TpchGen.keyOffsetOf(table)
    filters.foreach {
      case org.apache.spark.sql.sources.In(c, vs) if c == keyCol =>
        val ids = vs.collect { case n: java.lang.Number => n.longValue() + off }
        if (ids.nonEmpty) {
          keyLo = math.max(keyLo, ids.min)
          keyHi = math.min(keyHi, ids.max)
        }
      case org.apache.spark.sql.sources.GreaterThan(c, v: java.lang.Number) if c == keyCol =>
        keyLo = math.max(keyLo, v.longValue + off + 1)
      case org.apache.spark.sql.sources.GreaterThanOrEqual(c, v: java.lang.Number) if c == keyCol =>
        keyLo = math.max(keyLo, v.longValue + off)
      case org.apache.spark.sql.sources.LessThan(c, v: java.lang.Number) if c == keyCol =>
        keyHi = math.min(keyHi, v.longValue + off - 1)
      case org.apache.spark.sql.sources.LessThanOrEqual(c, v: java.lang.Number) if c == keyCol =>
        keyHi = math.min(keyHi, v.longValue + off)
      case _ => ()
    }
  }

  // resolved ONCE at scan build so partition keys, the reported
  // transform, and the split layout all agree
  private val perConf = math.max(1L, SQLConf.get.getConfString(
    "graft.tpch.rowsPerSplit", "200000").toLong)
  /** Custkey-axis storage partitioning (round 14): with
    * `graft.tpch.ordersAxis=custkey`, orders and customer both split
    * and report KeyGroupedPartitioning in CUSTOMER-KEY units, so
    * customer ⋈ orders co-locates with zero exchange the way
    * orders ⋈ lineitem does on the default orderkey axis. Possible
    * because o_custkey is block-local ([[TpchGen.custOf]]): orderkey
    * block i holds exactly custkey block i, so a custkey bucket IS a
    * contiguous orderkey range — split enumeration and orderkey
    * pruning are unchanged, only the reported transform and the split
    * alignment differ. The axis is a per-session layout choice, the
    * same call a deployment makes when it lays a fact table out by
    * its most-joined foreign key. Guarded on the exact 10:1
    * orders:customers ratio the block mapping rests on. */
  /** Per-TABLE layout axis (round 15): the reference models
    * distribution per table layout, not per session
    * (`axiom/connectors/ConnectorMetadata.h:171-285` — each layout
    * carries its own partitioning), and a real deployment mixes axes
    * (orders laid out by customer while lineitem stays on orderkey).
    * `graft.tpch.layout.<table>=<axis>` assigns an axis to ONE table;
    * unset tables fall back to the session-wide
    * `graft.tpch.ordersAxis` (which keeps meaning "orders AND customer
    * together", the round-14 knob) and then to the native row-index
    * axis. "orderkey" names the native axis on every table (it IS the
    * order key on orders/lineitem; on customer it means native-width
    * c_custkey buckets, un-aligned with orders' custkey buckets).
    * Unknown values throw — a typo must not silently measure the
    * wrong layout. Each table's KeyGroupedPartitioning report is true
    * of its own splits regardless of what any OTHER table chose, so
    * mixed assignments are always planned correctly: matching
    * transforms co-locate, mismatched ones get an exchange. */
  private val layoutAxis: String = {
    val default =
      if (table == "orders" || table == "customer")
        SQLConf.get.getConfString("graft.tpch.ordersAxis", "orderkey")
      else "orderkey"
    val v = SQLConf.get.getConfString(s"graft.tpch.layout.$table", default)
    val allowed: Set[String] =
      if (table == "orders" || table == "customer") Set("orderkey", "custkey")
      else Set("orderkey")
    require(allowed(v),
      s"graft.tpch.layout.$table='$v' - allowed: ${allowed.mkString("|")} " +
      "(orderkey = the table's native row-index axis)")
    v
  }
  private val custAxis = layoutAxis == "custkey" &&
    TpchGen.orders(sf) == 10 * TpchGen.customers(sf)
  /** custkeys per bucket under the custkey axis: rowsPerSplit/10 (so
    * orders splits keep ~rowsPerSplit orderkeys) rounded UP to whole
    * generation blocks — the alignment the SPJ guarantee rests on. */
  private val custBucket = {
    val cb = TpchGen.CustPerBlock
    ((math.max(perConf / 10, cb) + cb - 1) / cb) * cb
  }
  private val per =
    if (!custAxis) perConf
    else if (table == "customer") custBucket
    else custBucket * 10

  /** Contiguous key ranges of `rowsPerSplit` keys (reference:
    * `rowsPerSplit = fileBytesPerSplit / rowSize`,
    * TpchConnectorMetadata.cpp:106); splits wholly outside the pushed
    * key bounds are never planned. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (keyHi < keyLo) return Array.empty
    val span = TpchGen.keySpan(table, sf)
    val n = ((span + per - 1) / per).toInt
    (0 until n).iterator
      .map(i => (i * per + 1, math.min((i + 1) * per, span)))
      .filter { case (lo, hi) => hi >= keyLo && lo <= keyHi }
      .map { case (lo, hi) =>
        TpchPartition(table, sf, math.max(lo, keyLo), math.min(hi, keyHi), per) }
      .toArray
  }

  /** Storage-partitioned joins: every table whose primary key IS the
    * row/order index (all but partsupp, whose rows are
    * 4-per-ps_partkey) reports KeyGroupedPartitioning over
    * `range_bucket(per, key)`. orders and lineitem split by the SAME
    * order-key ranges, so their buckets line up and Spark plans
    * orders ⋈ lineitem with no exchange — the connector-level
    * co-located join (the parquet-side analogue is
    * [[Bucketing]]). */
  override def outputPartitioning(): Partitioning =
    // partsupp's rows aren't keyed by the row index; region/nation emit
    // 0-based keys, for which range_bucket(emitted) ≠ the split index
    // (emitted key 0 → bucket -1) — and at 5/25 rows they broadcast
    // anyway, so they opt out of SPJ rather than mis-report
    if (table == "partsupp" || TpchGen.keyOffsetOf(table) != 0L)
      new UnknownPartitioning(0)
    else if (custAxis && table == "orders") {
      // report clustering by o_custkey at custBucket width: every split
      // (10·custBucket orderkeys = custBucket custkeys, block-aligned)
      // holds exactly one range_bucket_custBucket(o_custkey) value. The
      // partitioning expression must resolve against the scan OUTPUT, so
      // a projection that pruned o_custkey opts out.
      if (!required.fieldNames.contains("o_custkey")) new UnknownPartitioning(0)
      else new KeyGroupedPartitioning(
        Array(Expressions.apply(s"range_bucket_$custBucket",
          Expressions.column("o_custkey"))),
        planInputPartitions().length)
    }
    else new KeyGroupedPartitioning(
      Array(Expressions.apply(s"range_bucket_$per",
        Expressions.column(TpchGen.keyColumnOf(table)))),
      planInputPartitions().length)

  /** Rows are GENERATED in ascending key order within every split, so
    * the scan reports that ordering (DSv2 SupportsReportOrdering) — the
    * reference's interesting-order property of a clustered layout. With
    * `spark.sql.execution.replaceHashWithSortAgg`, a per-key
    * aggregation directly over the scan (q18's 15M-group sum per
    * l_orderkey, q13's per-custkey counts on the custkey axis) becomes
    * a STREAMING sort aggregate: zero sort inserted, O(1) aggregation
    * state instead of a multi-hundred-MB hash map per task — the shape
    * a 100 TB clustered table hands its reader. The keyCol ordering is
    * truthful under BOTH layout axes: the custkey axis changes which
    * o_custkey VALUES a split holds (block-shuffled mapping), but rows
    * are still generated in ascending native-key order within every
    * split — the round-17 review removed a custAxis opt-out here that
    * was reasoning about o_custkey, a column this method never reports
    * on. (partsupp's key repeats are fine for ordering, and 0-based
    * tables' emitted keys still ascend — only the projection matters). */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    val keyCol = TpchGen.keyColumnOf(table)
    if (!required.fieldNames.contains(keyCol))
      Array.empty
    else Array(Expressions.sort(Expressions.column(keyCol),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TpchReaderFactory(required)
}

/** Keys in [lo, hi] — for lineitem these are ORDER keys; the reader
  * expands each order's generated lines. partitionKey is the
  * range-bucket index (lo and hi always share a split, so the bucket is
  * well-defined even after bound pruning). */
final case class TpchPartition(table: String, sf: Double, lo: Long, hi: Long,
    per: Long = Long.MaxValue)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(Math.floorDiv(lo - 1, per))
}

final case class TpchReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val tp = p.asInstanceOf[TpchPartition]
    val gen = TpchGen.rowGen(tp.table, tp.sf, schema)
    if (tp.table == "lineitem") new PartitionReader[InternalRow] {
      private var order = tp.lo - 1
      private var line = 0
      private var lines = 0
      override def next(): Boolean = {
        line += 1
        while (line > lines) {
          order += 1
          if (order > tp.hi) return false
          lines = TpchGen.linesOf(order); line = 1
        }
        true
      }
      override def get(): InternalRow = gen(order, line)
      override def close(): Unit = ()
    } else new PartitionReader[InternalRow] {
      private var key = tp.lo - 1
      override def next(): Boolean = { key += 1; key <= tp.hi }
      override def get(): InternalRow = gen(key, 0)
      override def close(): Unit = ()
    }
  }
}

/** The deterministic generator: every value is a pure function of
  * (table, key, column) through splitmix64 — no state, no files, no
  * split-boundary dependence. */
object TpchGen {
  val TableNames: Seq[String] = Seq("region", "nation", "supplier", "part",
    "partsupp", "customer", "orders", "lineitem")

  /** The partition transform behind the connector's storage-partitioned
    * joins: range_bucket(per, key) = floor((key-1) / per) — the split
    * index of a dense 1-based key under `per`-sized ranges. Registered
    * through the catalog's FunctionCatalog so Spark can verify both join
    * sides cluster by the SAME function (canonicalName equality). */
  case class RangeBucketUnbound(per: Long) extends UnboundFunction {
    override def name(): String = s"range_bucket_$per"
    override def description(): String =
      s"range_bucket_$per(key): split index of a dense 1-based key"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1, s"${name()} takes (key)")
      RangeBucketFn(per)
    }
  }
  case class RangeBucketFn(per: Long) extends ScalarFunction[java.lang.Long] {
    override def name(): String = s"range_bucket_$per"
    override def canonicalName(): String = s"graft_tpch.range_bucket_$per"
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): java.lang.Long =
      Math.floorDiv(input.getLong(0) - 1, per)
  }

  /** Block-local customer assignment (round 14): orderkey blocks of
    * [[OrdersPerBlock]] map 1:1 to custkey blocks of [[CustPerBlock]]
    * (the spec's exact 10-orders-per-customer ratio), and the customer
    * is drawn uniformly WITHIN the block. Per-customer order counts stay
    * Binomial(15000, 1/1500) ≈ Poisson(10) — the same statistical
    * profile as a global draw (q13's count histogram and q22's
    * no-order customers, P ≈ e^-10, are unchanged) — while making every
    * custkey bucket a contiguous orderkey range, which is what lets the
    * scan report custkey-axis KeyGroupedPartitioning (customer ⋈ orders
    * with no exchange; the reference models the same choice as one
    * Distribution per table layout, axiom/optimizer/Schema.h:122-230).
    * At `tiny` (1500 customers) there is exactly one block, i.e. a
    * global draw. */
  val CustPerBlock = 1500L
  val OrdersPerBlock = 15000L
  def custOf(k: Long, sf: Double): Long = {
    val c = customers(sf)
    val b = math.min((k - 1) / OrdersPerBlock, (c - 1) / CustPerBlock)
    val base = b * CustPerBlock
    base + h(7L, k, 1) % math.min(CustPerBlock, c - base) + 1
  }

  /** Reference getScaleFactor (TpchConnectorMetadata.cpp:61-67):
    * `tiny` = 0.01, `sfN` = N (digits only). Fractional scales spell
    * the decimal point as an underscore (`sf0_1` = 0.1) so the schema
    * stays a plain SQL identifier — the bench's scale lane uses the
    * exact-10× pair sf0_1 → sf1 to measure scaling inside one
    * connector. */
  def scaleOf(schema: String): Option[Double] = schema.toLowerCase match {
    case "tiny" => Some(0.01)
    case s if s.length > 2 && s.startsWith("sf") && s.drop(2).forall(_.isDigit) =>
      Some(s.drop(2).toDouble)
    case s if s.length > 2 && s.startsWith("sf") && {
        // split with limit -1 keeps trailing empties: 'sf1_' must throw
        // NoSuchNamespace, not silently measure SF 1 (a typo must not
        // measure the wrong layout)
        val parts = s.drop(2).split("_", -1)
        parts.length == 2 && parts.forall(p => p.nonEmpty && p.forall(_.isDigit))
      } =>
      Some(s.drop(2).replace('_', '.').toDouble)
    case _ => None
  }

  // ---------------------------------------------------------- scaling
  def suppliers(sf: Double): Long = math.max(1L, (10000 * sf).toLong)
  def parts(sf: Double): Long = math.max(1L, (200000 * sf).toLong)
  def customers(sf: Double): Long = math.max(1L, (150000 * sf).toLong)
  def orders(sf: Double): Long = math.max(1L, (1500000 * sf).toLong)
  def clerks(sf: Double): Long = math.max(1L, (1000 * sf).toLong)

  /** Primary-key span = generated row count for all tables except
    * lineitem, where keys are ORDER keys (1..7 lines each). */
  def keySpan(table: String, sf: Double): Long = table match {
    case "region" => 5
    case "nation" => 25
    case "supplier" => suppliers(sf)
    case "part" => parts(sf)
    case "partsupp" => parts(sf) * 4
    case "customer" => customers(sf)
    case "orders" | "lineitem" => orders(sf)
    case t => throw new IllegalArgumentException(s"unknown TPC-H table: $t")
  }
  /** Emitted-key minus internal-key: region/nation emit 0-based keys
    * (r_regionkey/n_nationkey = k-1) while the generator index is
    * 1-based; all other key columns emit the index itself. Pushdown and
    * runtime filters add this before comparing against key bounds. */
  def keyOffsetOf(table: String): Long =
    if (table == "region" || table == "nation") 1L else 0L
  def keyColumnOf(table: String): String = table match {
    case "region" => "r_regionkey"
    case "nation" => "n_nationkey"
    case "supplier" => "s_suppkey"
    case "part" => "p_partkey"
    case "partsupp" => "ps_partkey"
    case "customer" => "c_custkey"
    case "orders" => "o_orderkey"
    case "lineitem" => "l_orderkey"
    case t => throw new IllegalArgumentException(s"unknown TPC-H table: $t")
  }

  // ---------------------------------------------------------- schemas
  private def f(n: String, t: DataType) = StructField(n, t, nullable = false)
  private val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(f("r_regionkey", LongType), f("r_name", StringType),
      f("r_comment", StringType))),
    "nation" -> StructType(Seq(f("n_nationkey", LongType), f("n_name", StringType),
      f("n_regionkey", LongType), f("n_comment", StringType))),
    "supplier" -> StructType(Seq(f("s_suppkey", LongType), f("s_name", StringType),
      f("s_address", StringType), f("s_nationkey", LongType), f("s_phone", StringType),
      f("s_acctbal", DoubleType), f("s_comment", StringType))),
    "part" -> StructType(Seq(f("p_partkey", LongType), f("p_name", StringType),
      f("p_mfgr", StringType), f("p_brand", StringType), f("p_type", StringType),
      f("p_size", IntegerType), f("p_container", StringType),
      f("p_retailprice", DoubleType), f("p_comment", StringType))),
    "partsupp" -> StructType(Seq(f("ps_partkey", LongType), f("ps_suppkey", LongType),
      f("ps_availqty", IntegerType), f("ps_supplycost", DoubleType),
      f("ps_comment", StringType))),
    "customer" -> StructType(Seq(f("c_custkey", LongType), f("c_name", StringType),
      f("c_address", StringType), f("c_nationkey", LongType), f("c_phone", StringType),
      f("c_acctbal", DoubleType), f("c_mktsegment", StringType),
      f("c_comment", StringType))),
    "orders" -> StructType(Seq(f("o_orderkey", LongType), f("o_custkey", LongType),
      f("o_orderstatus", StringType), f("o_totalprice", DoubleType),
      f("o_orderdate", DateType), f("o_orderpriority", StringType),
      f("o_clerk", StringType), f("o_shippriority", IntegerType),
      f("o_comment", StringType))),
    "lineitem" -> StructType(Seq(f("l_orderkey", LongType), f("l_partkey", LongType),
      f("l_suppkey", LongType), f("l_linenumber", IntegerType),
      f("l_quantity", DoubleType), f("l_extendedprice", DoubleType),
      f("l_discount", DoubleType), f("l_tax", DoubleType),
      f("l_returnflag", StringType), f("l_linestatus", StringType),
      f("l_shipdate", DateType), f("l_commitdate", DateType),
      f("l_receiptdate", DateType), f("l_shipinstruct", StringType),
      f("l_shipmode", StringType), f("l_comment", StringType))))
  def schemaOf(table: String): StructType = schemas(table)

  // ------------------------------------------------------ value lists
  // Public TPC-H specification value lists (clause 4.2.2/4.2.3).
  private val Regions = Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val Nations: Array[(String, Int)] = Array(
    "ALGERIA" -> 0, "ARGENTINA" -> 1, "BRAZIL" -> 1, "CANADA" -> 1,
    "EGYPT" -> 4, "ETHIOPIA" -> 0, "FRANCE" -> 3, "GERMANY" -> 3,
    "INDIA" -> 2, "INDONESIA" -> 2, "IRAN" -> 4, "IRAQ" -> 4,
    "JAPAN" -> 2, "JORDAN" -> 4, "KENYA" -> 0, "MOROCCO" -> 0,
    "MOZAMBIQUE" -> 0, "PERU" -> 1, "CHINA" -> 2, "ROMANIA" -> 3,
    "SAUDI ARABIA" -> 4, "VIETNAM" -> 2, "RUSSIA" -> 3,
    "UNITED KINGDOM" -> 3, "UNITED STATES" -> 1)
  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val ShipModes = Array("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
  private val Instructs = Array("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
  private val ContainerA = Array("SM", "LG", "MED", "JUMBO", "WRAP")
  private val ContainerB = Array("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
  private val TypeA = Array("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
  private val TypeB = Array("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
  private val TypeC = Array("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
  /** The spec's full 92-word P_NAME vocabulary (clause 4.2.3 "colors"
    * distribution) — p_name must draw from ALL of it or the LIKE-driven
    * queries (q9 '%green%', q17/q20 'forest%') select nothing and
    * measure nothing. */
  private val Colors = Array("almond", "antique", "aquamarine", "azure", "beige",
    "bisque", "black", "blanched", "blue", "blush", "brown", "burlywood",
    "burnished", "chartreuse", "chiffon", "chocolate", "coral", "cornflower",
    "cornsilk", "cream", "cyan", "dark", "deep", "dim", "dodger", "drab",
    "firebrick", "floral", "forest", "frosted", "gainsboro", "ghost",
    "goldenrod", "green", "grey", "honeydew", "hot", "indian", "ivory",
    "khaki", "lace", "lavender", "lawn", "lemon", "light", "lime", "linen",
    "magenta", "maroon", "medium", "metallic", "midnight", "mint", "misty",
    "moccasin", "navajo", "navy", "olive", "orange", "orchid", "pale",
    "papaya", "peach", "peru", "pink", "plum", "powder", "puff", "purple",
    "red", "rose", "rosy", "royal", "saddle", "salmon", "sandy", "seashell",
    "sienna", "sky", "slate", "smoke", "snow", "spring", "steel", "tan",
    "thistle", "tomato", "turquoise", "violet", "wheat", "white", "yellow")

  private val StartDate = java.time.LocalDate.of(1992, 1, 1).toEpochDay.toInt
  private val EndOrderDate = java.time.LocalDate.of(1998, 8, 2).toEpochDay.toInt
  private val CurrentDate = java.time.LocalDate.of(1995, 6, 17).toEpochDay.toInt

  // ------------------------------------------------------------- rng
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private val tableIds: Map[String, Long] = TableNames.zipWithIndex.toMap
    .map { case (k, v) => (k, v.toLong + 1) }
  // the order/line helper streams below hard-code these ids
  require(tableIds("orders") == 7L && tableIds("lineitem") == 8L)
  /** Non-negative hash for (table, key, column-stream, line). */
  private def h(t: Long, key: Long, col: Int, line: Int = 0): Long =
    mix(t * 0x2545F4914F6CDD1DL ^ key * 0x9E3779B97F4A7C15L ^
      (col.toLong << 32) ^ line.toLong) >>> 1
  private def hd(t: Long, key: Long, col: Int, line: Int = 0): Double =
    (h(t, key, col, line) >>> 10).toDouble / (1L << 53).toDouble

  /** 1..7 lines per order (spec clause 4.2.5), independent of splits. */
  def linesOf(orderKey: Long): Int = (h(8L, orderKey, 0) % 7).toInt + 1

  /** Spec 4.2.3 retail-price formula. */
  def retailPrice(partkey: Long): Double =
    (90000 + ((partkey / 10) % 20001) + 100 * (partkey % 1000)) / 100.0
  /** Spec 4.2.3 part→supplier assignment: the i-th (0..3) supplier for
    * part p over S suppliers. */
  def psSupplier(p: Long, i: Int, s: Long): Long =
    (p + i * (s / 4 + (p - 1) / s)) % s + 1

  private def phone(nationKey: Long, t: Long, key: Long): String = {
    def seg(c: Int, w: Int) = {
      val v = h(t, key, c) % math.round(math.pow(10, w)).toInt
      ("%0" + w + "d").format(v)
    }
    s"${nationKey + 10}-${seg(101, 3)}-${seg(102, 3)}-${seg(103, 4)}"
  }
  private def comment(t: Long, key: Long, col: Int): String = {
    val a = Colors((h(t, key, col) % Colors.length).toInt)
    val b = Colors((h(t, key, col + 1) % Colors.length).toInt)
    s"$a $b requests sleep furiously ${h(t, key, col + 2) % 1000}"
  }

  // line-level values shared by lineitem and the orders aggregates
  private def lineQty(o: Long, l: Int): Double = (h(8L, o, 1, l) % 50).toInt + 1.0
  private def linePart(o: Long, l: Int, sf: Double): Long =
    h(8L, o, 2, l) % parts(sf) + 1
  private def lineDiscount(o: Long, l: Int): Double = (h(8L, o, 3, l) % 11).toInt / 100.0
  private def lineTax(o: Long, l: Int): Double = (h(8L, o, 4, l) % 9).toInt / 100.0
  private def lineExtPrice(o: Long, l: Int, sf: Double): Double =
    math.round(lineQty(o, l) * retailPrice(linePart(o, l, sf)) * 100.0) / 100.0
  private def orderDate(o: Long): Int =
    StartDate + (h(7L, o, 4) % (EndOrderDate - StartDate + 1)).toInt
  private def lineShip(o: Long, l: Int): Int = orderDate(o) + (h(8L, o, 5, l) % 121).toInt + 1
  private def lineCommit(o: Long, l: Int): Int = orderDate(o) + (h(8L, o, 6, l) % 61).toInt + 30
  private def lineReceipt(o: Long, l: Int): Int = lineShip(o, l) + (h(8L, o, 7, l) % 30).toInt + 1
  /** o_totalprice = Σ extendedprice × (1 − discount) × (1 + tax), the
    * spec's definition — cross-table consistency is generator-enforced. */
  def orderTotal(o: Long, sf: Double): Double = {
    var sum = 0.0
    var l = 1
    val n = linesOf(o)
    while (l <= n) {
      sum += lineExtPrice(o, l, sf) * (1 - lineDiscount(o, l)) * (1 + lineTax(o, l))
      l += 1
    }
    math.round(sum * 100.0) / 100.0
  }
  private def orderStatus(o: Long): String = {
    val n = linesOf(o)
    var open = 0
    var l = 1
    while (l <= n) { if (lineShip(o, l) > CurrentDate) open += 1; l += 1 }
    if (open == 0) "F" else if (open == n) "O" else "P"
  }

  /** Column generator for one (key [, line]) of `table` at `sf`,
    * projected to `required` — unrequested columns are never computed
    * (generator-side column pruning). */
  def rowGen(table: String, sf: Double, required: StructType): (Long, Int) => InternalRow = {
    val t = tableIds(table)
    def s(v: String) = UTF8String.fromString(v)
    val gens: Array[(Long, Int) => Any] = required.fieldNames.map { col =>
      val g: (Long, Int) => Any = (table, col) match {
        case ("region", "r_regionkey") => (k, _) => k - 1
        case ("region", "r_name") => (k, _) => s(Regions((k - 1).toInt))
        case ("region", "r_comment") => (k, _) => s(comment(t, k, 2))
        case ("nation", "n_nationkey") => (k, _) => k - 1
        case ("nation", "n_name") => (k, _) => s(Nations((k - 1).toInt)._1)
        case ("nation", "n_regionkey") => (k, _) => Nations((k - 1).toInt)._2.toLong
        case ("nation", "n_comment") => (k, _) => s(comment(t, k, 3))
        case ("supplier", "s_suppkey") => (k, _) => k
        case ("supplier", "s_name") => (k, _) => s("Supplier#%09d".format(k))
        case ("supplier", "s_address") => (k, _) => s(comment(t, k, 2).take(20))
        case ("supplier", "s_nationkey") => (k, _) => h(t, k, 3) % 25
        case ("supplier", "s_phone") => (k, _) => s(phone(h(t, k, 3) % 25, t, k))
        case ("supplier", "s_acctbal") => (k, _) =>
          math.round((hd(t, k, 5) * 10999.98 - 999.99) * 100) / 100.0
        case ("supplier", "s_comment") => (k, _) => s(comment(t, k, 6))
        case ("part", "p_partkey") => (k, _) => k
        case ("part", "p_name") => (k, _) =>
          // spec: 5 distinct-position draws from the 92-word list
          s((1 to 5).map(i => Colors((h(t, k, 20 + i) % Colors.length).toInt))
            .mkString(" "))
        case ("part", "p_mfgr") => (k, _) => s("Manufacturer#" + (h(t, k, 2) % 5 + 1))
        case ("part", "p_brand") => (k, _) =>
          s("Brand#" + (h(t, k, 2) % 5 + 1) + (h(t, k, 3) % 5 + 1))
        case ("part", "p_type") => (k, _) =>
          s(TypeA((h(t, k, 4) % 6).toInt) + " " + TypeB((h(t, k, 5) % 5).toInt) +
            " " + TypeC((h(t, k, 6) % 5).toInt))
        case ("part", "p_size") => (k, _) => (h(t, k, 7) % 50).toInt + 1
        case ("part", "p_container") => (k, _) =>
          s(ContainerA((h(t, k, 8) % 5).toInt) + " " + ContainerB((h(t, k, 9) % 8).toInt))
        case ("part", "p_retailprice") => (k, _) => retailPrice(k)
        case ("part", "p_comment") => (k, _) => s(comment(t, k, 10))
        case ("partsupp", "ps_partkey") => (k, _) => (k - 1) / 4 + 1
        case ("partsupp", "ps_suppkey") => (k, _) =>
          psSupplier((k - 1) / 4 + 1, ((k - 1) % 4).toInt, suppliers(sf))
        case ("partsupp", "ps_availqty") => (k, _) => (h(t, k, 3) % 9999).toInt + 1
        case ("partsupp", "ps_supplycost") => (k, _) =>
          math.round((hd(t, k, 4) * 999.0 + 1.0) * 100) / 100.0
        case ("partsupp", "ps_comment") => (k, _) => s(comment(t, k, 5))
        case ("customer", "c_custkey") => (k, _) => k
        case ("customer", "c_name") => (k, _) => s("Customer#%09d".format(k))
        case ("customer", "c_address") => (k, _) => s(comment(t, k, 2).take(20))
        case ("customer", "c_nationkey") => (k, _) => h(t, k, 3) % 25
        case ("customer", "c_phone") => (k, _) => s(phone(h(t, k, 3) % 25, t, k))
        case ("customer", "c_acctbal") => (k, _) =>
          math.round((hd(t, k, 5) * 10999.98 - 999.99) * 100) / 100.0
        case ("customer", "c_mktsegment") => (k, _) => s(Segments((h(t, k, 6) % 5).toInt))
        case ("customer", "c_comment") => (k, _) => s(comment(t, k, 7))
        case ("orders", "o_orderkey") => (k, _) => k
        case ("orders", "o_custkey") => (k, _) => custOf(k, sf)
        case ("orders", "o_orderstatus") => (k, _) => s(orderStatus(k))
        case ("orders", "o_totalprice") => (k, _) => orderTotal(k, sf)
        case ("orders", "o_orderdate") => (k, _) => orderDate(k)
        case ("orders", "o_orderpriority") => (k, _) => s(Priorities((h(t, k, 5) % 5).toInt))
        case ("orders", "o_clerk") => (k, _) =>
          s("Clerk#%09d".format(h(t, k, 6) % clerks(sf) + 1))
        case ("orders", "o_shippriority") => (_, _) => 0
        case ("orders", "o_comment") => (k, _) => s(comment(t, k, 7))
        case ("lineitem", "l_orderkey") => (o, _) => o
        case ("lineitem", "l_partkey") => (o, l) => linePart(o, l, sf)
        case ("lineitem", "l_suppkey") => (o, l) =>
          psSupplier(linePart(o, l, sf), (h(t, o, 8, l) % 4).toInt, suppliers(sf))
        case ("lineitem", "l_linenumber") => (_, l) => l
        case ("lineitem", "l_quantity") => (o, l) => lineQty(o, l)
        case ("lineitem", "l_extendedprice") => (o, l) => lineExtPrice(o, l, sf)
        case ("lineitem", "l_discount") => (o, l) => lineDiscount(o, l)
        case ("lineitem", "l_tax") => (o, l) => lineTax(o, l)
        case ("lineitem", "l_returnflag") => (o, l) =>
          s(if (lineReceipt(o, l) > CurrentDate) "N"
            else if (h(t, o, 9, l) % 2 == 0) "R" else "A")
        case ("lineitem", "l_linestatus") => (o, l) =>
          s(if (lineShip(o, l) > CurrentDate) "O" else "F")
        case ("lineitem", "l_shipdate") => (o, l) => lineShip(o, l)
        case ("lineitem", "l_commitdate") => (o, l) => lineCommit(o, l)
        case ("lineitem", "l_receiptdate") => (o, l) => lineReceipt(o, l)
        case ("lineitem", "l_shipinstruct") => (o, l) =>
          s(Instructs((h(t, o, 10, l) % 4).toInt))
        case ("lineitem", "l_shipmode") => (o, l) => s(ShipModes((h(t, o, 11, l) % 7).toInt))
        case ("lineitem", "l_comment") => (o, l) => s(comment(t, o * 8 + l, 12))
        case (tb, c) => throw new IllegalArgumentException(s"unknown column $tb.$c")
      }
      g
    }
    // hot loop: this closure runs once per generated row (billions per
    // executor at 100 TB) — fill a preallocated array, no per-row
    // collection copies (round-17 review: gens.toSeq copied the
    // generator array per row)
    (key, line) => {
      val vals = new Array[Any](gens.length)
      var i = 0
      while (i < gens.length) { vals(i) = gens(i)(key, line); i += 1 }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    }
  }
}

/** Oracle-registered queries over the generator (DuckDB replays the
  * closed forms; the generated values themselves are the property under
  * test for the consistency entries). */
object TpchSource {
  /** The spec-fixed nation/region content is exactly reproducible as a
    * VALUES list — a hash-checkable oracle for generated (not stored)
    * tables. */
  def nationRegion(spark: SparkSession): DataFrame =
    spark.table("graft_tpch.tiny.nation")
      .join(spark.table("graft_tpch.tiny.region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
  val nationRegionSql: String = {
    val nations = Seq(
      ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
      ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
      ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
      ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
      ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
      ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
      ("UNITED KINGDOM", 3), ("UNITED STATES", 1))
    val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    nations.zipWithIndex.map { case ((n, r), i) =>
      s"($i, '$n', '${regions(r)}')"
    }.mkString(
      "SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name " +
        "FROM (VALUES ", ", ", ") t(n_nationkey, n_name, r_name)")
  }

  /** Cardinality and domain contract at tiny (SF 0.01): exact spec
    * scaling, priority domain, date window, and referential integrity
    * (no orphan custkeys) — all closed-form. */
  def domains(spark: SparkSession): DataFrame = {
    val o = spark.table("graft_tpch.tiny.orders")
    val c = spark.table("graft_tpch.tiny.customer")
    val orphans = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti").count()
    o.agg(
      count(lit(1)).as("cnt"),
      countDistinct(col("o_orderpriority")).as("priorities"),
      sum(when(col("o_orderdate") < lit("1992-01-01").cast("date") ||
        col("o_orderdate") > lit("1998-08-02").cast("date"), 1L).otherwise(0L)).as("bad_dates"))
      .withColumn("orphans", lit(orphans))
  }
  val domainsSql: String =
    "SELECT CAST(15000 AS BIGINT) AS cnt, CAST(5 AS BIGINT) AS priorities, " +
      "CAST(0 AS BIGINT) AS bad_dates, CAST(0 AS BIGINT) AS orphans"

  /** Cross-table arithmetic consistency: o_totalprice equals the sum
    * over the order's lines, and l_extendedprice equals quantity × the
    * part's retail price — the generator coheres the way dbgen's output
    * does. Computed distributed (joins + grouped sums), verified exact. */
  def consistency(spark: SparkSession): DataFrame = {
    val l = spark.table("graft_tpch.tiny.lineitem")
    val o = spark.table("graft_tpch.tiny.orders")
    val p = spark.table("graft_tpch.tiny.part")
    val perOrder = l.groupBy(col("l_orderkey")).agg(
      round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        (lit(1) + col("l_tax"))), 2).as("line_total"))
    val totalMismatch = o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .filter(abs(col("o_totalprice") - col("line_total")) > 0.011).count()
    val priceMismatch = l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(abs(col("l_extendedprice") -
        round(col("l_quantity") * col("p_retailprice"), 2)) > 0.001).count()
    val lineCount = l.count()
    spark.range(1).select(
      lit(totalMismatch).as("total_mismatches"),
      lit(priceMismatch).as("price_mismatches"),
      lit(lineCount >= 15000 && lineCount <= 105000).as("lines_in_range"))
  }
  val consistencySql: String =
    "SELECT CAST(0 AS BIGINT) AS total_mismatches, " +
      "CAST(0 AS BIGINT) AS price_mismatches, true AS lines_in_range"

  val all: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
    ("source_tpch_nation", (s, _) => nationRegion(s), nationRegionSql),
    ("source_tpch_domains", (s, _) => domains(s), domainsSql),
    ("source_tpch_consistency", (s, _) => consistency(s), consistencySql))
}
