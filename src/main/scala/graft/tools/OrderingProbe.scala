package graft.tools

import org.apache.spark.sql.DataFrame
import graft.{Sessions, Tables}

/** Round-15 scan-ordering probe: the generator emits rows in ascending
  * key order and the scan now reports it (SupportsReportOrdering), so
  * `spark.sql.execution.replaceHashWithSortAgg` can turn the
  * big per-key aggregations (q18's 15M-group sum per l_orderkey) into
  * streaming sort aggregates with no inserted sort. A/B the conf on
  * the queries whose first aggregate sits directly on the scan, with
  * row equality asserted.
  *
  * Usage: runMain graft.tools.OrderingProbe [schema]
  */
object OrderingProbe {
  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf1")
    val spark = Sessions.builder(master = "local[32]", appName = "graft-ordering-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val t = Tables(spark, s"graft_tpch:$schema")
    val qs: Seq[(String, Tables => DataFrame)] = Seq(
      ("q18", graft.queries.Tpch2.q18 _),
      ("q13", graft.queries.Tpch.q13 _),
      ("q1", graft.queries.Tpch.q1 _))
    // equality first
    for ((n, q) <- qs) {
      val a = q(t).collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
      val b = try q(t).collect().map(_.toString).sorted.toSeq
        finally spark.conf.unset("spark.sql.execution.replaceHashWithSortAgg")
      require(a == b, s"$n diverged under sort-agg replacement")
    }
    println(s"[ordering-probe] $schema results EQUAL")
    for (rep <- 1 to 2; (n, q) <- qs; mode <- Seq("hash", "sortagg")) {
      if (mode == "sortagg")
        spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
      val t0 = System.nanoTime()
      try q(t).write.format("noop").mode("overwrite").save()
      finally spark.conf.unset("spark.sql.execution.replaceHashWithSortAgg")
      println(f"[ordering-probe] $schema%-6s $n%-4s $mode%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s (rep $rep)")
    }
    spark.stop()
  }
}
