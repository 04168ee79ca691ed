package graft.tools

import graft.{Catalog, Sessions}
import org.apache.spark.sql.SparkSession

/** Where does grp_presto's ~0.2 s/entry go? (r19 verdict Next #6.)
  * Splits a sample of presto entries into build (dialect rewrite +
  * analysis + optimization) vs execution (noop write of the built
  * frame), min-of-N each, warm JVM — the split that says whether the
  * cost is plan-side (driver, fixed) or data-side.
  *
  * Usage: runMain graft.tools.ProfilePresto [sfDir] [reps] [nameRegex]
  */
object ProfilePresto {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).getOrElse("^presto_").r
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      Sessions.builder(master = s"local[$cpus]", appName = "graft-profile-presto")
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Catalog.tableNames.foreach(n =>
      Catalog.load(spark, sfDir, n).write.format("noop").mode("overwrite").save())
    if (!sys.env.get("SPARK_GRAFT_ANALYZE").contains("false")) {
      Catalog.tableNames.foreach(n =>
        graft.plans.Analyze.table(spark, Catalog.load(spark, sfDir, n)))
    }
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.findFirstIn(n).isDefined }
    var sumB = 0.0; var sumE = 0.0
    qs.foreach { case (name, fn) =>
      def minOf(f: () => Unit): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }.min
      try {
        val tBuild = minOf { () =>
          fn(spark, sfDir).queryExecution.optimizedPlan // rewrite+analyze+optimize
        }
        val df = fn(spark, sfDir)
        val tExec = minOf { () =>
          df.write.format("noop").mode("overwrite").save()
        }
        sumB += tBuild; sumE += tExec
        println(f"[presto-prof] $name%-28s build=$tBuild%6.3f exec=$tExec%6.3f")
      } catch { case e: Throwable =>
        println(s"[presto-prof] $name FAILED: ${e.getMessage}")
      }
    }
    println(f"[presto-prof] TOTAL over ${qs.size} entries: build=$sumB%.2f exec=$sumE%.2f")
    spark.stop()
  }
}
