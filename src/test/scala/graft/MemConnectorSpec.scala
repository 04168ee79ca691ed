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

  test("reading a missing table fails with a clear error") {
    val e = intercept[Exception] {
      spark.read.format("graft-mem").option("table", "nope_missing").load()
    }
    assert(e.getMessage.contains("does not exist"))
  }
}
