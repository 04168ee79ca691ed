package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. Results are written to the `noop` sink so the
  * full plan executes — a bare `.count()` lets Catalyst prune away the
  * aggregate/projection work being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(master = s"local[$cpus]", appName = "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: parquet footers/file indexes, the
    // OS page cache, and first-query codegen otherwise land entirely on
    // the alphabetically first entry (measured +2-3 s on agg_cube).
    Catalog.tableNames.foreach { t =>
      Catalog.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    // Optional name filter (regex) for iterating on a subset locally.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
