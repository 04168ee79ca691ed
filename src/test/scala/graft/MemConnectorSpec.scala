package graft

import graft.sources.MemTables
import org.apache.spark.sql.functions._

/** The graft-mem connector's write lifecycle: append/overwrite
  * visibility, atomic commit (a failed job installs nothing), and
  * read-back fidelity — mirrors the reference's createTable/beginWrite/
  * finishWrite/abortWrite contract (ConnectorMetadata.h:569-627). */
class MemConnectorSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def mem(name: String): DataFrame =
    spark.read.format("graft-mem").option("table", name).load()

  test("write then read back returns identical rows") {
    MemTables.drop("t_rt")
    val src = spark.range(0, 100).select(col("id"), (col("id") * 3).as("v"))
    src.write.format("graft-mem").option("table", "t_rt").mode("overwrite").save()
    val got = mem("t_rt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 100L).map(i => (i, i * 3)).toSet)
  }

  test("append accumulates, overwrite truncates atomically") {
    MemTables.drop("t_app")
    val d = spark.range(0, 10).toDF("id")
    d.write.format("graft-mem").option("table", "t_app").mode("append").save()
    d.write.format("graft-mem").option("table", "t_app").mode("append").save()
    assert(mem("t_app").count() == 20)
    d.write.format("graft-mem").option("table", "t_app").mode("overwrite").save()
    assert(mem("t_app").count() == 10)
  }

  test("a failing job installs nothing (all-or-nothing commit)") {
    MemTables.drop("t_fail")
    spark.range(0, 5).toDF("id")
      .write.format("graft-mem").option("table", "t_fail").mode("overwrite").save()
    val bad = spark.range(0, 100).repartition(4)
      .select(expr("assert_true(id < 50)"), col("id"))
    intercept[Exception] {
      bad.write.format("graft-mem").option("table", "t_fail").mode("overwrite").save()
    }
    // the failed overwrite must not have truncated or appended anything
    assert(mem("t_fail").count() == 5)
  }

  test("streaming write: micro-batch epochs land exactly-once end to end") {
    MemTables.drop("t_stream")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val dir = java.nio.file.Files.createTempDirectory("graft-mem-ckpt").toString
    val q = in.toDF().withColumnRenamed("value", "id")
      .writeStream.format("graft-mem")
      .option("table", "t_stream")
      .option("checkpointLocation", dir)
      .start()
    try {
      in.addData(0L until 10L: _*); q.processAllAvailable()
      assert(mem("t_stream").count() == 10)
      in.addData(10L until 25L: _*); q.processAllAvailable()
      val got = mem("t_stream").collect().map(_.getLong(0)).toSet
      assert(got == (0L until 25L).toSet)
      assert(MemTables.committedEpochsAll("t_stream").size >= 2)
    } finally q.stop()
  }

  test("streaming commit is idempotent under epoch re-delivery (failure replay)") {
    MemTables.drop("t_replay")
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("id", LongType)))
    val sw = new graft.sources.MemStreamingWrite("t_replay", schema)
    val msg = graft.sources.MemCommit(Array(InternalRow(1L), InternalRow(2L)))
    sw.commit(7L, Array(msg))
    // after a failure the engine re-runs the batch and re-delivers epoch 7
    sw.commit(7L, Array(msg))
    assert(MemTables.rowsOf("t_replay").size == 2, "epoch 7 must install at most once")
    sw.commit(8L, Array(msg))
    assert(MemTables.rowsOf("t_replay").size == 4)
    assert(MemTables.committedEpochs("t_replay", "") == Set(7L, 8L))
    // a DIFFERENT query's epoch 7 is NOT a replay: a fresh checkpoint
    // restarts epochIds at 0, and a table-wide ledger would silently
    // drop the second query's batches (round-17 review)
    val sw2 = new graft.sources.MemStreamingWrite("t_replay", schema, "other-query")
    sw2.commit(7L, Array(msg))
    assert(MemTables.rowsOf("t_replay").size == 6,
      "a second query's epoch ids must not be mistaken for replays")
  }

  test("reading a missing table fails with a clear error") {
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", "nope_missing").load()
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("SQL DELETE and UPDATE rewrite through the row-level operation") {
    spark.sql("DROP TABLE IF EXISTS graft_mem.default.t_dml")
    spark.sql("CREATE TABLE graft_mem.default.t_dml (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_mem.default.t_dml VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    spark.sql("DELETE FROM graft_mem.default.t_dml WHERE k % 2 = 0")
    def snap() = spark.table("graft_mem.default.t_dml").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap() == Set((1L, "a"), (3L, "c")))
    spark.sql("UPDATE graft_mem.default.t_dml SET v = concat(v, '!') WHERE k = 3")
    assert(snap() == Set((1L, "a"), (3L, "c!")))
    // Deleting everything leaves an empty, still-readable table.
    spark.sql("DELETE FROM graft_mem.default.t_dml WHERE true")
    assert(snap().isEmpty)
  }

  test("time travel: every commit is a numbered snapshot; old versions are immutable (round 11)") {
    spark.sql("DROP TABLE IF EXISTS graft_mem.default.t_tt")
    spark.sql("CREATE TABLE graft_mem.default.t_tt (k BIGINT, v STRING)") // v1: empty
    spark.sql("INSERT INTO graft_mem.default.t_tt VALUES (1,'a'),(2,'b')") // v2
    spark.sql("INSERT INTO graft_mem.default.t_tt VALUES (3,'c')")         // v3
    spark.sql("DELETE FROM graft_mem.default.t_tt WHERE k = 1")            // v4
    def at(v: Int): Set[Long] =
      spark.sql(s"SELECT k FROM graft_mem.default.t_tt VERSION AS OF $v")
        .collect().map(_.getLong(0)).toSet
    assert(at(1) == Set.empty[Long])
    assert(at(2) == Set(1L, 2L))
    assert(at(3) == Set(1L, 2L, 3L))
    assert(at(4) == Set(2L, 3L))
    // current == latest version
    assert(spark.table("graft_mem.default.t_tt").collect().map(_.getLong(0)).toSet == at(4))
    // snapshot isolation: reading v2 after later writes is unchanged
    spark.sql("INSERT INTO graft_mem.default.t_tt VALUES (9,'z')")         // v5
    assert(at(2) == Set(1L, 2L))
    // TIMESTAMP AS OF far future = latest; unknown version errors clearly
    val now = spark.sql(
      s"SELECT k FROM graft_mem.default.t_tt TIMESTAMP AS OF '2999-01-01'")
      .collect().map(_.getLong(0)).toSet
    assert(now == Set(2L, 3L, 9L))
    val err = intercept[Exception] { at(99) }
    assert(err.getMessage.contains("version 99 not found"), err.getMessage)
  }

  test("TRUNCATE TABLE: atomic empty replacement, visible to time travel (round 11)") {
    spark.sql("DROP TABLE IF EXISTS graft_mem.default.t_trunc")
    spark.sql("CREATE TABLE graft_mem.default.t_trunc (k BIGINT)")       // v1
    spark.sql("INSERT INTO graft_mem.default.t_trunc VALUES (1),(2)")    // v2
    spark.sql("TRUNCATE TABLE graft_mem.default.t_trunc")                // v3
    assert(spark.table("graft_mem.default.t_trunc").count() == 0)
    // the pre-truncate snapshot is still readable
    val v2 = spark.sql("SELECT k FROM graft_mem.default.t_trunc VERSION AS OF 2")
      .collect().map(_.getLong(0)).toSet
    assert(v2 == Set(1L, 2L))
  }

  test("SQL MERGE INTO upserts through the row-level operation") {
    spark.sql("DROP TABLE IF EXISTS graft_mem.default.t_merge")
    spark.sql("CREATE TABLE graft_mem.default.t_merge (k BIGINT, v STRING)")
    spark.sql("INSERT INTO graft_mem.default.t_merge VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("""MERGE INTO graft_mem.default.t_merge t
                 USING (SELECT * FROM VALUES (2,'B2'),(4,'D4') AS src(k, v)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val got = spark.table("graft_mem.default.t_merge").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D4")))
  }
}
