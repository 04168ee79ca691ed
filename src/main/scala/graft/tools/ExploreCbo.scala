package graft.tools

import graft.{Catalog, Sessions, Tables}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.plans.logical.Join

/** Dev probe: which TPC-H queries change their optimized join tree when
  * the bench warmup's Analyze installs row counts? (A-B of the round-10
  * bench flow.) */
object ExploreCbo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder("local[8]", "explore-cbo").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def joinTree(name: String): Seq[Set[String]] = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.optimizedPlan.collect {
        case j: Join => j.collect {
          case r: LogicalRelation =>
            r.relation.asInstanceOf[HadoopFsRelation].location.rootPaths.map(_.getName).mkString
        }.toSet
      }
    }
    val qs = (1 to 22).map(i => s"tpch_q$i")
    graft.plans.History.clear(); graft.plans.TableStats.clear()
    val before = qs.map(q => q -> scala.util.Try(joinTree(q))).toMap
    Catalog.tableNames.foreach(tn => graft.plans.Analyze.table(spark, Catalog.load(spark, sfDir, tn)))
    val after = qs.map(q => q -> scala.util.Try(joinTree(q))).toMap
    qs.foreach { q =>
      val changed = before(q).toOption != after(q).toOption
      println(s"[cbo] $q changed=$changed")
      if (changed) {
        println(s"  before: ${before(q).toOption}")
        println(s"  after:  ${after(q).toOption}")
      }
    }
    spark.stop()
  }
}
