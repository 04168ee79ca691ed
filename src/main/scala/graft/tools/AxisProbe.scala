package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Sessions, Tables}

/** Diagnostic: print operator fingerprints of selected TPC-H queries on
  * the generator under both storage-partitioning axes (round 14's
  * custkey-axis A/B). Not part of any artifact — a lane debugging aid.
  *
  * Usage: runMain graft.tools.AxisProbe [schema] [queryRegex]
  */
object AxisProbe {
  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf1")
    val re = args.lift(1).getOrElse("q5$|q10$|q13$|q18$").r
    val spark = Sessions.builder(master = "local[32]", appName = "graft-axis-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val qs = (graft.queries.Tpch.all ++ graft.queries.Tpch2.all)
      .map { case (n, q, _) => (n, q) }
      .filter { case (n, _) => re.findFirstIn(n).isDefined }
    def fp(p: org.apache.spark.sql.execution.SparkPlan): String = {
      def flat(x: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = x match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        x +: kids.flatMap(flat)
      }
      val ns = flat(p)
      def c(f: org.apache.spark.sql.execution.SparkPlan => Boolean) = ns.count(f)
      s"scan=${c(_.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec])}," +
        s"exchange=${c(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])}," +
        s"bcast=${c(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])}," +
        s"smj=${c(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])}," +
        s"shj=${c(_.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec])}"
    }
    for (axis <- Seq("orderkey", "custkey")) {
      spark.conf.set("graft.tpch.ordersAxis", axis)
      val t = Tables(spark, s"graft_tpch:$schema")
      qs.foreach { case (n, q) =>
        val df = q(t)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val planned = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        println(f"[axis-probe] $schema%-6s $axis%-9s $n%-10s $dt%7.2f s  ${fp(planned)}")
      }
    }
    spark.stop()
  }
}
