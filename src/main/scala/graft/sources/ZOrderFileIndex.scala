package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Manifest-driven [[FileIndex]] over a z-ordered layout: Spark's scan
  * planner hands `listFiles` the pushed data filters, and the index
  * answers with ONLY the files whose write-time bounding boxes can
  * match — so a plain `read.filter(band)` skips files with no caller
  * cooperation. This is the Iceberg `planFiles` / Delta data-skipping
  * integration point (the reference's connector layer exposes layout
  * metadata for the same purpose: axiom/connectors/ConnectorMetadata.h
  * TableLayout), expressed through Spark's own scan machinery instead of
  * a pre-computed path list ([[ZOrder.pruneFilesByManifest]] remains the
  * explicit-call twin).
  *
  * Scale shape: the driver holds the file LISTING (paths + sizes — any
  * FileIndex must, to plan splits), never the stats. The skip decision
  * is a filtered scan of the manifest parquet with the translated bounds
  * predicate PUSHED DOWN, streamed back as O(survivors). At 100 TB /
  * ~10⁶ files the manifest is a few MB of parquet and the prune is one
  * executor-side metadata query, Iceberg-style.
  */
final class ZOrderFileIndex(
    spark: SparkSession,
    dir: String,
    statCols: Seq[String]) extends FileIndex {

  private val root = new Path(dir)
  private def fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())

  // Listing keyed by file NAME (part-*.parquet is unique within the
  // layout dir); the manifest records input_file_name() URIs whose
  // scheme/slash form differs from FileStatus.getPath, so the name is
  // the stable join key.
  @volatile private var byName: Map[String, FileStatus] = listNow()

  private def listNow(): Map[String, FileStatus] =
    fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => s.getPath.getName -> s).toMap

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = byName.values.map(_.getLen).sum
  override def inputFiles: Array[String] = byName.values.map(_.getPath.toString).toArray
  override def refresh(): Unit = byName = listNow()

  /** Translate one pushed predicate leaf on stat column `c` into the
    * equivalent test on the manifest's `[c_lo, c_hi]` box: a file can
    * hold `v >= L` only if its hi reaches L, `v <= U` only if its lo is
    * under U, `v = k` only if the box straddles k. Conjunctions recurse;
    * anything else (IsNotNull, disjunctions, non-stat columns, null or
    * non-numeric literals) prunes nothing — the residual filter still
    * runs on every surviving row, so under-translation is always sound,
    * never wrong. */
  private def toManifestPred(e: Expression): Option[Column] = e match {
    case And(l, r) =>
      (toManifestPred(l), toManifestPred(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (a, b) => a.orElse(b)
      }
    case GreaterThanOrEqual(a: Attribute, Lit(v)) if stat(a) => Some(col(s"${a.name}_hi") >= dn(v))
    case GreaterThan(a: Attribute, Lit(v)) if stat(a) => Some(col(s"${a.name}_hi") > dn(v))
    case LessThanOrEqual(a: Attribute, Lit(v)) if stat(a) => Some(col(s"${a.name}_lo") <= up(v))
    case LessThan(a: Attribute, Lit(v)) if stat(a) => Some(col(s"${a.name}_lo") < up(v))
    case EqualTo(a: Attribute, Lit(v)) if stat(a) =>
      Some(col(s"${a.name}_lo") <= up(v) && col(s"${a.name}_hi") >= dn(v))
    case EqualNullSafe(a: Attribute, Lit(v)) if stat(a) =>
      Some(col(s"${a.name}_lo") <= up(v) && col(s"${a.name}_hi") >= dn(v))
    // IN-list: a file can match only if SOME value lands in its box.
    // Translate only when every element is a readable numeric literal —
    // a partially-translated IN would wrongly prune files holding the
    // untranslated values.
    case In(a: Attribute, vs) if stat(a) && vs.nonEmpty =>
      val ds = vs.map { case Lit(v) => Some(v); case _ => None }
      if (ds.exists(_.isEmpty)) None
      else Some(ds.flatten
        .map(v => col(s"${a.name}_lo") <= up(v) && col(s"${a.name}_hi") >= dn(v))
        .reduce(_ || _))
    case InSet(a: Attribute, vs) if stat(a) && vs.nonEmpty =>
      val ds = vs.toSeq.map(v => scala.util.Try(String.valueOf(v).toDouble).toOption)
      if (ds.exists(_.isEmpty)) None
      else Some(ds.flatten
        .map(v => col(s"${a.name}_lo") <= up(v) && col(s"${a.name}_hi") >= dn(v))
        .reduce(_ || _))
    case GreaterThanOrEqual(l @ Lit(_), a: Attribute) if stat(a) => toManifestPred(LessThanOrEqual(a, l))
    case GreaterThan(l @ Lit(_), a: Attribute) if stat(a) => toManifestPred(LessThan(a, l))
    case LessThanOrEqual(l @ Lit(_), a: Attribute) if stat(a) => toManifestPred(GreaterThanOrEqual(a, l))
    case LessThan(l @ Lit(_), a: Attribute) if stat(a) => toManifestPred(GreaterThan(a, l))
    case EqualTo(l @ Lit(_), a: Attribute) if stat(a) => toManifestPred(EqualTo(a, l))
    case _ => None
  }

  /** Matches only literals whose value reads as a number — the manifest
    * records numeric boxes, so anything else must fall through to
    * no-prune rather than throw inside scan planning. Catalyst's INTERNAL
    * forms line up with the manifest encoding by construction: DateType
    * literals are Int day counts and TimestampType literals Long micros,
    * exactly what [[ZOrder.numify]] wrote into the boxes. */
  private object Lit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, _) if v != null => scala.util.Try(v.toString.toDouble).toOption
      case _ => None
    }
  }

  // The manifest stores boxes as DOUBLE; for 64-bit values beyond 2^53
  // both the box and the literal may round (≤0.5 ulp each). Widening
  // every comparison by 1 ulp makes the prune sound under that rounding
  // — over-inclusion only costs the residual filter a few extra files.
  private def dn(v: Double): Double = Math.nextDown(v)
  private def up(v: Double): Double = Math.nextUp(v)

  private def stat(a: Attribute): Boolean = statCols.contains(a.name)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val pred = dataFilters.flatMap(toManifestPred).reduceOption(_ && _)
    val survivors: Seq[FileStatus] = pred match {
      case None => byName.values.toSeq
      case Some(p) =>
        import scala.jdk.CollectionConverters._
        // One manifest pass yields both the keep verdicts and the
        // manifest's file-name coverage. A NULL verdict (null box values)
        // means "unknown" → keep. Soundness gate: a listed data file
        // ABSENT from the manifest (appended/compacted after
        // zorderWrite) must not be silently pruned — the stats for it
        // simply don't exist — so stale coverage falls back to the
        // unpruned listing. Driver memory stays O(#files) names, which
        // `byName` already holds to plan splits.
        val verdicts = spark.read.parquet(ZOrder.manifestDir(dir))
          .select(col("f"), p.as("__keep"))
          .toLocalIterator().asScala
          .map(r => new Path(r.getString(0)).getName ->
            (r.isNullAt(1) || r.getBoolean(1)))
          .toMap
        if (!byName.keySet.subsetOf(verdicts.keySet)) byName.values.toSeq
        else byName.collect { case (n, st) if verdicts(n) => st }.toSeq
    }
    Seq(PartitionDirectory(InternalRow.empty, survivors.toArray))
  }
}

object ZOrderFileIndex {

  /** A DataFrame over the z-ordered layout whose scan plans its file list
    * through [[ZOrderFileIndex]] — filters the user writes on `statCols`
    * become manifest prunes automatically. Public-API wiring: a
    * [[HadoopFsRelation]] (a `BaseRelation`) handed to
    * `baseRelationToDataFrame`, so FileSourceStrategy produces a normal
    * parquet `FileSourceScanExec` with pushdown, codegen and column
    * pruning intact. */
  def read(spark: SparkSession, dir: String, statCols: Seq[String]): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val rel = HadoopFsRelation(
      location = new ZOrderFileIndex(spark, dir, statCols),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
