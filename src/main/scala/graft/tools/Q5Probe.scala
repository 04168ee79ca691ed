package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Round-14 q5 headroom probe: A/B the shipped q5 against an
  * eager-aggregation variant that sums revenue per (o_custkey,
  * n_name) BEFORE the customer join, so the big exchange carries
  * bounded partial sums instead of the full joined fact stream.
  * Result equality is asserted (same rounded rows) before timing.
  *
  * Usage: runMain graft.tools.Q5Probe [schema]
  */
object Q5Probe {
  private def ts(s: String) = lit(s).cast("timestamp")
  private def revenue(c: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
    c * (lit(1.0) - d)

  /** Eager-agg candidate: orders(date-filtered) SPJ lineitem, broadcast
    * supplier/nation/region (ASIA) to tag each line with the supplier
    * nation, partial-sum per (custkey, nation), then join customer only
    * to enforce c_nationkey = s_nationkey, re-aggregate per nation. */
  def q5Eager(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("o_custkey"), col("s_nationkey"), col("n_name"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("pr"))
      .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("pr")), 2).as("revenue"))
      .orderBy(col("revenue").desc)

  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf1")
    val spark = Sessions.builder(master = "local[32]", appName = "graft-q5-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val t = Tables(spark, s"graft_tpch:$schema")
    // result equality first (rounded rows must match exactly)
    val a = graft.queries.Tpch.q5(t).collect().map(_.toString).sorted.toSeq
    val b = q5Eager(t).collect().map(_.toString).sorted.toSeq
    require(a == b, s"q5 eager variant diverged:\n$a\nvs\n$b")
    println(s"[q5-probe] $schema results EQUAL (${a.length} rows)")
    // "shipped" is whatever Tpch.q5 currently is; "eager" is this
    // file's candidate (identical to the promoted round-14 shape except
    // the explicit supplier broadcast hint, dropped on promotion so
    // extreme-SF suppliers shuffle instead of flooding the driver).
    for (rep <- 1 to 2; (name, q) <- Seq(
        ("shipped", () => graft.queries.Tpch.q5(t)),
        ("eager", () => q5Eager(t)))) {
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      println(f"[q5-probe] $schema%-6s $name%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s (rep $rep)")
    }
    spark.stop()
  }
}
