package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for every registered query to one file
  * per query — the audit artifact for optimization rounds (plan shape
  * claims in OPTIMIZATION_*.md are checked against these files).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [nameRegex] [sfDir]
  * Defaults: sfDir = /root/testdata/sf0.01 (plan SHAPE is scale-free for
  * everything except AQE runtime decisions, which explain-before-run
  * doesn't show anyway), all queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val only = args.lift(1).map(_.r)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(master = s"local[$cpus]", appName = "graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Stats-fed plans, same as the bench (CBO warmup): plan shapes must
    // match what the bench measures.
    if (!sys.env.get("SPARK_GRAFT_ANALYZE").contains("false")) {
      graft.Catalog.tableNames.foreach { t =>
        graft.plans.Analyze.table(spark, graft.Catalog.load(spark, sfDir, t))
      }
    }
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    var failed = 0
    qs.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$name.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    System.err.println(s"[plandump] wrote ${qs.size - failed}/${qs.size} to $outDir")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
