package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-interleaved) data layout: files clustered so EVERY
  * participating dimension has bounded min/max extent per file, not just
  * the leading sort column. A layout sorted on `a` alone leaves each
  * file spanning the full range of `b`, so a predicate on `b` can skip
  * nothing; interleaving the bits of order-preserving bucket codes keeps
  * each file's bounding box tight in both dimensions, which is what
  * makes footer/row-group min-max stats (and any file-stats catalog)
  * able to prune on either column.
  *
  * The reference's connector layer exposes layout metadata for exactly
  * this purpose (axiom/connectors/ConnectorMetadata.h — TableLayout
  * order/partition columns); z-order is the multi-dimensional completion
  * of that idea, standard in lakehouse engines.
  *
  * Everything is declarative and codegen'd: bucket codes via arithmetic,
  * bit interleave via a 16-step shift/or fold, the final clustering via
  * `repartitionByRange` + `sortWithinPartitions` on the z-value — one
  * range shuffle at write time, zero driver-side data beyond a 4-value
  * bounds row.
  */
object ZOrder {

  /** 16-bit order-preserving bucket of `c` within [lo, hi]. Constant
    * columns (hi == lo) all map to bucket 0 — guarded so the double
    * division cannot produce Infinity and trip the ANSI long cast. */
  private def bucket16(c: Column, lo: Double, hi: Double): Column =
    if (hi == lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0)).cast("long")))

  /** Morton-interleave two 16-bit codes into one 32-bit z-value: bit i of
    * `x` lands at 2i, bit i of `y` at 2i+1. */
  private[graft] def interleave(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Write `df` to `dir` as `nFiles` parquet files clustered by the
    * z-value of (a, b). Bounds come from one tiny agg pass; the range
    * repartition gives contiguous, balanced z-slices per file. */
  def zorderWrite(df: DataFrame, a: String, b: String, dir: String, nFiles: Int): Unit = {
    val r = df.agg(
      min(col(a)).cast("double"), max(col(a)).cast("double"),
      min(col(b)).cast("double"), max(col(b)).cast("double")).head()
    val z = interleave(
      bucket16(col(a), r.getDouble(0), r.getDouble(1)),
      bucket16(col(b), r.getDouble(2), r.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  // ------------------------------------------------------------ registry
  private val base = "/root/repo/target/zorder"

  /** Round-trip digest entry: z-order-write orders by (o_custkey,
    * o_totalprice), read back, aggregate — the oracle recomputes the
    * digest from the original parquet, proving the relayout is lossless.
    * The layout QUALITY property (bounded per-file extents in both
    * dimensions) is asserted by ZOrderSpec. */
  def zorderRoundtrip(t: Tables): DataFrame = {
    val dir = s"$base/orders_zorder"
    zorderWrite(
      t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "o_custkey", "o_totalprice", dir, nFiles = 16)
    t.spark.read.parquet(dir).agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("o_totalprice")), 2).as("total"),
      countDistinct(col("o_custkey")).as("n_cust"))
  }

  val zorderRoundtripSql: String =
    """SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total,
       count(DISTINCT o_custkey) AS n_cust FROM orders"""

  /** Per-file min/max of `c` — the manifest a production writer records
    * at write time (Iceberg/Delta-style); recomputed here with one
    * group-by on input_file_name since local parquet has no stats
    * catalog. Pruning = keep files whose [lo, hi] intersects the
    * predicate range. */
  private[graft] def fileStats(df: DataFrame, c: String): Array[(String, Double, Double)] =
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))

  /** Stats-pruned read over the z-ordered layout: a band predicate on the
    * NON-leading layout column skips every file whose bounding box misses
    * the band (possible only because z-order bounded that column per
    * file), then the exact residual filter runs on the survivors — sound
    * regardless of pruning, fast because of it. */
  def zorderPrunedRead(t: Tables): DataFrame = {
    val dir = s"$base/orders_zorder"
    zorderWrite(
      t.orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "o_custkey", "o_totalprice", dir, nFiles = 16)
    val (pLo, pHi) = (100000.0, 150000.0)
    val keep = fileStats(t.spark.read.parquet(dir), "o_totalprice")
      .collect { case (f, lo, hi) if hi >= pLo && lo <= pHi => f }
    require(keep.nonEmpty, "band predicate pruned every file — widen the band")
    t.spark.read.parquet(keep: _*)
      .filter(col("o_totalprice").between(pLo, pHi))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")), 2).as("total"),
        countDistinct(col("o_custkey")).as("n_cust"))
  }

  val zorderPrunedReadSql: String =
    """SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total,
       count(DISTINCT o_custkey) AS n_cust FROM orders
       WHERE o_totalprice BETWEEN 100000 AND 150000"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("layout_zorder", zorderRoundtrip _, zorderRoundtripSql),
    ("layout_zorder_pruned_read", zorderPrunedRead _, zorderPrunedReadSql))
}
