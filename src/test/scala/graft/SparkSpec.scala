package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local[4] JVM-wide SparkSession over
  * the sf0.001 fixtures (the reference's analogue: LocalRunnerTestBase
  * with generated tables, HiveQueriesTestBase parallelism matrix). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sfDir: String = SparkSpec.SfDir
  lazy val tables: Tables = Tables(spark, sfDir)
}

object SparkSpec {
  val SfDir = "/root/testdata/sf0.001"
  lazy val session: SparkSession = {
    val s = Sessions.builder("local[4]", "graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
