package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Round-15 q21 headroom probe: the shipped round-13 shape answers both
  * correlations with collect_set WINDOWS over l_orderkey — one pass,
  * but WindowExec sorts every partition and buffers per-order frames.
  * The same per-order facts are a plain hash AGGREGATE: distinct
  * supplier count, the late-supplier set, and the number of late lines
  * (which all belong to the single late supplier exactly when the
  * late-set size is 1). HashAggregate replaces the sort entirely, keeps
  * map-side partials, and its ClusteredDistribution(l_orderkey) is
  * satisfied by the storage-partitioned join's KeyGroupedPartitioning —
  * zero added exchange, same as the window reuse.
  *
  * Row accounting: the query counts qualifying LINEITEM rows per
  * supplier; for a qualifying order every late line is by the one late
  * supplier, so count(late lines) per order, summed per supplier,
  * equals the row count.
  *
  * Usage: runMain graft.tools.Q21Probe [schema]
  */
object Q21Probe {

  /** The r13/r14-shipped window shape, kept for A/B reproducibility. */
  def q21Window(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val w = Window.partitionBy(col("l_orderkey"))
    t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("is_late"), col("l_suppkey"))).over(w)))
      .filter(col("is_late") && col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  def q21Agg(t: Tables): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
      .groupBy(col("l_orderkey"))
      .agg(
        size(collect_set(col("l_suppkey"))).as("n_supp"),
        collect_set(when(col("is_late"), col("l_suppkey"))).as("late_set"),
        count(when(col("is_late"), 1)).as("late_lines"))
      .filter(col("n_supp") >= 2 && size(col("late_set")) === 1)
      .select(element_at(col("late_set"), 1).as("w_suppkey"), col("late_lines"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("w_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Declarative-only candidate: the set questions collapse to min/max —
    * "≥2 distinct suppliers" ⇔ min ≠ max; "late set is exactly {s}" ⇔
    * min(late supp) = max(late supp) ≠ null, and that value IS s. No
    * collect_set objects (whose ObjectHashAggregate falls back to
    * sort-based at 128 distinct groups), just codegen'd min/max/count
    * with constant-width partials. */
  def q21MinMax(t: Tables): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    t.lineitem
      .join(t.orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), late.as("is_late"))
      .groupBy(col("l_orderkey"))
      .agg(
        min(col("l_suppkey")).as("supp_min"),
        max(col("l_suppkey")).as("supp_max"),
        min(when(col("is_late"), col("l_suppkey"))).as("late_min"),
        max(when(col("is_late"), col("l_suppkey"))).as("late_max"),
        count(when(col("is_late"), 1)).as("late_lines"))
      .filter(col("supp_min") =!= col("supp_max") &&
        col("late_min").isNotNull && col("late_min") === col("late_max"))
      .select(col("late_min").as("w_suppkey"), col("late_lines"))
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
        col("s_suppkey") === col("w_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_lines")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf1")
    val spark = Sessions.builder(master = "local[32]", appName = "graft-q21-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val t = Tables(spark, s"graft_tpch:$schema")
    def norm(df: DataFrame) = df.collect().map(_.toString).toSeq // ordered output
    val a = norm(graft.queries.Tpch2.q21(t))
    val w = norm(q21Window(t))
    require(a == w, s"q21 window variant diverged:\n$a\nvs\n$w")
    val b = norm(q21Agg(t))
    require(a == b, s"q21 agg variant diverged:\n$a\nvs\n$b")
    val c = norm(q21MinMax(t))
    require(a == c, s"q21 minmax variant diverged:\n$a\nvs\n$c")
    println(s"[q21-probe] $schema results EQUAL (${a.length} rows)")
    for (rep <- 1 to 2; (name, q) <- Seq(
        ("shipped", () => graft.queries.Tpch2.q21(t)),
        ("window", () => q21Window(t)),
        ("agg", () => q21Agg(t)),
        ("minmax", () => q21MinMax(t)))) {
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      println(f"[q21-probe] $schema%-6s $name%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s (rep $rep)")
    }
    spark.stop()
  }
}
