package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level statistics store for path-backed tables — the engine's
  * ANALYZE artifact. The reference trains its cost model from history
  * and sampling (History::setLeafSelectivity, axiom/optimizer/Cost.h:
  * 52-57); Spark's cost-based optimizer consumes `CatalogStatistics`
  * (row count + per-column NDV/min/max/null/width). [[Analyze]] computes
  * those in one distributed pass and this store keeps them keyed by
  * (path, size fingerprint) — the same fingerprint [[History]] uses, so
  * stats recorded against one data size can never describe grown data.
  */
object TableStats {
  private val store = TrieMap.empty[(String, Long), Map[String, CatalogColumnStat]]
  @volatile private var loadedFrom: Option[String] = None

  def put(path: String, bytes: Long, cols: Map[String, CatalogColumnStat]): Unit =
    store.put((path, bytes), cols)
  def get(path: String, bytes: Long): Map[String, CatalogColumnStat] =
    store.getOrElse((path, bytes), Map.empty)
  def clear(): Unit = { store.clear(); loadedFrom = None }
  def size: Int = store.size

  def defaultPath = "/root/repo/target/table_stats.json"
  // Flat-key separator: path ␁ bytes ␁ <colName>.<statKey>. Spark's own
  // CatalogColumnStat.toMap/fromMap does the per-column serialization
  // (including base64 histograms), so the file round-trips everything the
  // join-order DP's selectivity estimation consumes.
  private val Sep = "\u0001"

  /** Persist alongside History.save() — the reference's
    * --history_save_path artifact (TpchPlanTest.cpp:33-38) carries enough
    * to re-plan in a later process; row counts alone do not (column NDVs
    * drive join selectivity), so the two files travel together. */
  def save(path: String = defaultPath): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val flat = store.toSeq.flatMap { case ((p, b), cols) =>
      cols.toSeq.flatMap { case (col, st) =>
        st.toMap(col).map { case (k, v) => s"$p$Sep$b$Sep$k" -> v }
      }
    }.sortBy(_._1)
    val json = flat.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",", "}")
    val f = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f, json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def load(path: String = defaultPath): Unit = {
    val f = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(f) && loadedFrom != Some(path)) {
      val txt = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      def unesc(s: String) = {
        val sb = new StringBuilder; var i = 0
        while (i < s.length) s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
              case c => sb.append(c); i += 2
            }
          case c => sb.append(c); i += 1
        }
        sb.toString
      }
      val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      val flat = entry.findAllMatchIn(txt)
        .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toSeq
      flat.groupBy(_._1.split(Sep, 3) match { case Array(p, b, _) => (p, b.toLong) })
        .foreach { case ((p, b), pairs) =>
          val props = pairs.map { case (k, v) => k.split(Sep, 3)(2) -> v }.toMap
          val colNames = props.keys.map(k => k.substring(0, k.lastIndexOf('.'))).toSet
          val cols = colNames.flatMap { c =>
            CatalogColumnStat.fromMap("graft_stats", c, props).map(c -> _)
          }.toMap
          if (cols.nonEmpty) store.put((p, b), cols)
        }
      loadedFrom = Some(path)
    }
  }
}

/** ANALYZE for path-backed tables: one aggregate job computes row count
  * and per-column stats, feeding [[History]] (row count under the bare
  * scan key) and [[TableStats]] (column stats). The Spark-catalog
  * ANALYZE TABLE path covers catalog tables; graft's tables are
  * path-registered temp views, which Spark's ANALYZE cannot target —
  * this is their equivalent, and [[CardinalityStatsRule]] is the seam
  * that feeds both back into optimizer [[Statistics]].
  *
  * When `spark.sql.statistics.histogram.enabled` is true (Spark's own
  * gate for its catalog ANALYZE), a second aggregate pass adds an
  * equi-height histogram per numeric column: pass 1's approximate
  * percentiles fix the bin endpoints, pass 2 computes per-bin NDV with
  * one `ApproxCountDistinctForIntervals` sketch per column — the same
  * two-job shape as Spark's ANALYZE, so skewed columns get real
  * range-predicate selectivity instead of the uniform min/max
  * assumption (the reference folds exactly this into leaf selectivity,
  * History::setLeafSelectivity / axiom/optimizer/Cost.h:52-57).
  *
  * Scale note: each pass is a single full-scan aggregate (count, HLL
  * NDV, min/max, lengths; interval sketches) with map-side partial
  * aggregation — one row ever reaches the driver, so ANALYZE behaves
  * at 100 TB exactly like any other full-table aggregate.
  */
object Analyze {

  /** Equi-height bin count (Spark's spark.sql.statistics.histogram.numBins
    * default). */
  private val numBins = 254

  /** Atomic types whose min/max round-trip through
    * CatalogColumnStat.fromExternalString as plain numeric text. */
  private def numericLike(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def varLen(dt: DataType): Boolean = dt match {
    case _: StringType | _: BinaryType => true
    case _ => false
  }

  /** Analyze a bare path-backed table (the DataFrame must be a plain
    * scan — filters would skew the stats it claims for the whole table).
    * Returns the row count. */
  def table(spark: SparkSession, df: DataFrame): Long = {
    val rels = df.queryExecution.analyzed.collect { case r: LogicalRelation => r }
    require(rels.size == 1, s"Analyze.table expects one base relation, got ${rels.size}")
    val fs = rels.head.relation match {
      case h: HadoopFsRelation => h
      case other => throw new IllegalArgumentException(s"not a file relation: $other")
    }
    val path = fs.location.rootPaths.map(_.toString).sorted.mkString(";")
    val bytes = fs.location.sizeInBytes

    // Stats only for atomic columns: NDV sketches over arrays/structs are
    // both expensive and useless to the join estimator.
    val cols = df.schema.fields.filter(f => numericLike(f.dataType) || varLen(f.dataType) ||
      f.dataType.isInstanceOf[BooleanType] || f.dataType.isInstanceOf[DateType])
    val withHist = spark.conf.getOption("spark.sql.statistics.histogram.enabled")
      .exists(_.toBoolean)
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.zipWithIndex.flatMap { case (f, i) =>
      val c = col(f.name)
      val base = Seq(
        approx_count_distinct(c).as(s"_ndv$i"),
        count(c).as(s"_nn$i"))
      val mm =
        if (numericLike(f.dataType))
          Seq(min(c).cast(StringType).as(s"_min$i"), max(c).cast(StringType).as(s"_max$i"))
        else Seq(lit(null).cast(StringType).as(s"_min$i"), lit(null).cast(StringType).as(s"_max$i"))
      val len =
        if (varLen(f.dataType))
          Seq(avg(length(c)).as(s"_avg$i"), max(length(c)).cast(LongType).as(s"_maxl$i"))
        else Seq(lit(null).cast(DoubleType).as(s"_avg$i"), lit(null).cast(LongType).as(s"_maxl$i"))
      val pct =
        if (withHist && numericLike(f.dataType))
          Seq(percentile_approx(c.cast(DoubleType),
            array((0 to numBins).map(j => lit(j.toDouble / numBins)): _*),
            lit(10000)).as(s"_pct$i"))
        else Seq.empty
      base ++ mm ++ len ++ pct
    }.toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val n = row.getAs[Long]("_n")

    // Second pass (histogram gate only): per-bin NDV for every numeric
    // column in ONE aggregate — ApproxCountDistinctForIntervals keeps an
    // HLL sketch per bin, exactly Spark's catalog-ANALYZE second job.
    val histograms: Map[Int, logical.Histogram] =
      if (!withHist) Map.empty
      else {
        val eps: Seq[(Int, Seq[Double])] = cols.zipWithIndex.flatMap { case (f, i) =>
          if (!numericLike(f.dataType)) None
          else Option(row.getAs[collection.Seq[Double]](s"_pct$i"))
            .filter(_.nonEmpty).map(e => i -> e.toSeq)
        }.toSeq
        if (eps.isEmpty) Map.empty
        else {
          spark.sessionState.functionRegistry.createOrReplaceTempFunction(
            "graft_ndv_intervals",
            es => new org.apache.spark.sql.catalyst.expressions.aggregate
              .ApproxCountDistinctForIntervals(es(0), es(1),
                org.apache.spark.sql.catalyst.expressions.Literal(0.05)),
            "built-in")
          val hAggs = eps.map { case (i, e) =>
            call_function("graft_ndv_intervals",
              col(cols(i).name).cast(DoubleType),
              array(e.map(lit): _*)).as(s"_h$i")
          }
          val hRow = df.agg(hAggs.head, hAggs.tail: _*).head()
          eps.map { case (i, e) =>
            val ndvs = hRow.getAs[collection.Seq[Long]](s"_h$i")
            val bins = e.sliding(2).zip(ndvs.iterator)
              .map { case (Seq(lo, hi), ndv) => logical.HistogramBin(lo, hi, ndv) }
              .toArray
            val nonNull = row.getAs[Long](s"_nn$i")
            i -> logical.Histogram(nonNull.toDouble / numBins, bins)
          }.toMap
        }
      }

    val colStats = cols.zipWithIndex.map { case (f, i) =>
      val ndv = row.getAs[Long](s"_ndv$i")
      val nulls = n - row.getAs[Long](s"_nn$i")
      val (avgLen, maxLen) =
        if (varLen(f.dataType))
          (Option(row.getAs[java.lang.Double](s"_avg$i")).map(d => math.round(d)),
           Option(row.getAs[java.lang.Long](s"_maxl$i")).map(Long.unbox))
        else (Some(f.dataType.defaultSize.toLong), Some(f.dataType.defaultSize.toLong))
      f.name -> CatalogColumnStat(
        distinctCount = Some(BigInt(ndv)),
        min = Option(row.getAs[String](s"_min$i")),
        max = Option(row.getAs[String](s"_max$i")),
        nullCount = Some(BigInt(nulls)),
        avgLen = avgLen,
        maxLen = maxLen,
        histogram = histograms.get(i))
    }.toMap

    History.put(History.scanKey(path, bytes, Nil), n)
    TableStats.put(path, bytes, colStats)
    n
  }
}

/** Feeds recorded/analyzed cardinalities into Catalyst [[Statistics]] so
  * Spark's cost-based optimizer — including the join-order DP
  * (CostBasedJoinReorder, the analogue of the reference's makeJoins memo
  * search, axiom/optimizer/Optimization.cpp:1555-1616 over the memo at
  * Plan.h:317-340) — costs plans from real row counts instead of file
  * sizes.
  *
  * A path-backed `LogicalRelation` carries no catalog entry, so its
  * static `Statistics` is the raw file size with no row count, and the
  * DP (which requires every join input to have a row count) never fires.
  * This rule installs a synthetic catalog-table entry whose
  * `CatalogStatistics` hold:
  *   - row count: the bare-scan actual recorded by [[History]] (execution
  *     feedback or [[Analyze]]), or the Model.h-style interpolation at an
  *     unseen data-size fingerprint;
  *   - column stats: [[TableStats]] from the last ANALYZE at this exact
  *     fingerprint (NDV/min/max/nulls — what Filter/Join estimation use).
  *
  * Runs in the operator-optimization batch, before Spark's "Join Reorder"
  * batch, so the DP sees the installed stats. Fixpoint-stable: relations
  * that already carry a catalog entry (real catalog tables, or a prior
  * iteration's install) are left untouched.
  */
class CardinalityStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    !spark.conf.getOption("graft.history.statistics").contains("false")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    History.autoload(spark) // opt-in via graft.history.autoload
    if (History.size == 0) return plan
    plan.transformUp {
      case rel: LogicalRelation if rel.catalogTable.isEmpty =>
        rel.relation match {
          case fs: HadoopFsRelation =>
            val path = fs.location.rootPaths.map(_.toString).sorted.mkString(";")
            val bytes = fs.location.sizeInBytes
            History.lookup(History.scanKey(path, bytes, Nil))
              .orElse(History.interpolateScan(path, bytes, Nil)) match {
              case Some(rows) =>
                val entry = CatalogTable(
                  identifier = TableIdentifier("graft_stats"),
                  tableType = CatalogTableType.EXTERNAL,
                  storage = CatalogStorageFormat.empty,
                  schema = fs.schema,
                  provider = Some("parquet"),
                  stats = Some(CatalogStatistics(
                    sizeInBytes = BigInt(bytes),
                    rowCount = Some(BigInt(rows)),
                    colStats = TableStats.get(path, bytes))))
                rel.copy(catalogTable = Some(entry))
              case None => rel
            }
          case _ => rel
        }
    }
  }
}
