package graft

import graft.sources.{CustomSource, RangeDocPartition, RangeDocScan}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The graft-range DataSource V2 connector: split pruning, column
  * pruning, complete id-predicate absorption, and value correctness
  * (mirrors the reference's connector tests: metadata resolution +
  * split enumeration, TpchConnectorMetadata/ConnectorSplitManager). */
class CustomSourceSpec extends SparkSpec {

  private def read = spark.read.format("graft-range")
    .option("rows", "10000").option("splits", "16").load()

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("id predicates prune whole splits, not just rows") {
    val scan = batchScan(read.filter(col("id") < 2500)).scan.asInstanceOf[RangeDocScan]
    val parts = scan.planInputPartitions().map(_.asInstanceOf[RangeDocPartition])
    // 16 splits of 625 ids; id<2500 covers splits 0..3 only
    assert(parts.length == 4, s"got ${parts.toSeq}")
    assert(parts.map(_.lo).min == 0 && parts.map(_.hi).max == 2499)
  }

  test("projection narrows the reader schema to the required columns") {
    val scan = batchScan(read.select("tag").filter(col("tag") === "t3"))
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("tag"))
  }

  test("id bounds are absorbed (non-residual): no Filter over the scan for pure id ranges") {
    val df = read.filter(col("id") >= 100 && col("id") <= 200)
    val residual = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f }
    assert(residual.isEmpty, s"residual filter left in plan:\n$residual")
    assert(df.count() == 101)
  }

  test("non-id predicates stay residual and still evaluate correctly") {
    val n = read.filter(col("id") < 1000 && col("tag") === "t3").count()
    assert(n == (0L until 1000L).count(_ % 7 == 3))
  }

  test("generated values match the pure-function definition") {
    val rows = read.filter(col("id").isin(0L, 1L, 123L, 9999L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected = Set(0L, 1L, 123L, 9999L).map(i => (i, (i * 37) % 1000, "t" + (i % 7)))
    assert(rows == expected)
  }

  test("runtime IN-filter narrows splits and rows (index-lookup analogue)") {
    val scan = batchScan(read).scan.asInstanceOf[graft.sources.RangeDocScan]
    assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("id"))
    // simulate the dynamic filter Spark ships from a join's build side
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array[Any](17L, 4242L, 9001L))))
    val parts = scan.planInputPartitions().map(_.asInstanceOf[RangeDocPartition]).toSeq
    // 16 splits of 625: ids 17, 4242, 9001 live in splits 0, 6, 14
    assert(parts.length == 3, s"got $parts")
    val factory = scan.createReaderFactory()
    val delivered = parts.flatMap { p =>
      val r = factory.createReader(p)
      Iterator.continually(r).takeWhile(_.next()).map(_.get().getLong(0)).toList
    }
    assert(delivered.toSet == Set(17L, 4242L, 9001L), s"got $delivered")
  }

  test("join against a small id list is correct under runtime filtering") {
    import spark.implicits._
    val keys = Seq(5L, 625L, 1250L, 9999L).toDF("k")
    val joined = read.join(keys, col("id") === col("k"))
      .select(col("id"), col("val")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(joined == Set(5L, 625L, 1250L, 9999L).map(i => (i, (i * 37) % 1000)))
  }

  test("registered pushdown query returns the oracle's aggregate") {
    val got = CustomSource.pushdownQuery(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = (2000L until 8000L).groupBy(i => "t" + (i % 7))
      .map { case (t, ids) => t -> (ids.size.toLong, ids.map(i => (i * 37) % 1000).sum) }
    assert(got == expected)
  }
}
