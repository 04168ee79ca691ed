package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Round-15 q16 headroom probe (verdict Next #3): the shipped q16 pays
  * an explicit pair-distinct exchange keyed on (l_partkey, l_suppkey,
  * brand, type, size) BEFORE the count-distinct aggregation, which then
  * pays its own two-level distinct expansion — three exchanges over
  * partsupp-density data. `count(DISTINCT s)` is idempotent to
  * duplicate rows, so the pair-distinct is semantically redundant: the
  * candidate drops it and lets Spark's distinct-aggregate expansion do
  * the dedup in ONE wide exchange keyed directly on (brand, type, size,
  * l_suppkey) — the map-side partial dedups before the shuffle exactly
  * like the pair-distinct did, but the key drops l_partkey, so the
  * exchange carries distinct (group, suppkey) tuples: strictly fewer
  * rows AND narrower than distinct (partkey, suppkey) pairs. The
  * second exchange of the expansion carries one partial count per
  * (group, map-partition) — noise. A collect_set single-exchange
  * variant was considered and rejected for scale: its final merge
  * materializes the full per-group supplier set in one task (~8 MB per
  * group at sf100, unbounded at 100 TB), where the expansion's final
  * count holds a counter.
  *
  * Usage: runMain graft.tools.Q16Probe [schema]
  */
object Q16Probe {

  /** The r14-shipped shape, kept for A/B reproducibility: explicit
    * pair-distinct, then grouped count-distinct over it. */
  def q16PairDist(t: Tables): DataFrame = {
    val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
      .select(col("s_suppkey").as("ex_suppkey"))
    val goodParts = t.part
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
        && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(goodParts, col("p_partkey") === col("l_partkey"))
      .distinct()
      .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Candidate: anti join + direct grouped count-distinct, no explicit
    * pair-distinct stage. */
  def q16Direct(t: Tables): DataFrame = {
    val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
      .select(col("s_suppkey").as("ex_suppkey"))
    val goodParts = t.part
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
        && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(goodParts, col("p_partkey") === col("l_partkey"))
      .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Single-exchange candidate: hash-repartition the raw joined stream
    * on the GROUP columns only — HashPartitioning(brand,type,size) is a
    * subset of the (brand,type,size,suppkey) clustering the dedup
    * aggregate requires, so EnsureRequirements inserts no further
    * exchange for either aggregation level. The diag numbers motivate
    * it: 8M joined rows dedup to 1.06M distinct (group,supp) tuples,
    * but spread over 32 map partitions each pair repeats only ~0.23×
    * per partition, so the expansion's map-side partial dedup removes
    * almost nothing — it pays a full 8M-row hash pass to shrink the
    * exchange ~10%. This shape skips the useless partial and ships the
    * narrow raw rows once, keyed on the 25k well-spread groups. */
  def q16Repart(t: Tables): DataFrame = {
    val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
      .select(col("s_suppkey").as("ex_suppkey"))
    val goodParts = t.part
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
        && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(goodParts, col("p_partkey") === col("l_partkey"))
      .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .repartition(col("p_brand"), col("p_type"), col("p_size"))
      .dropDuplicates("p_brand", "p_type", "p_size", "l_suppkey")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** collect_set candidate (for the record): one exchange, but the
    * final merge materializes each group's full supplier set in one
    * task — unbounded state per group at 100 TB. */
  def q16Cset(t: Tables): DataFrame = {
    val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
      .select(col("s_suppkey").as("ex_suppkey"))
    val goodParts = t.part
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
        && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(goodParts, col("p_partkey") === col("l_partkey"))
      .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(size(collect_set(col("l_suppkey"))).cast("long").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Narrow-key candidate: the group key (brand, type, size) is ~50 B
    * of strings per row through the wide exchange; the distinct (b,t,s)
    * dim is combinatorially bounded (brands × types × sizes — constant
    * in SF), so assign each group a dense int gid dim-side, push gid
    * onto the fact rows through the existing part broadcast, dedup and
    * count on (gid, suppkey) = 12 B, and restore the strings with a
    * broadcast join on the 25k-row result. */
  def q16Gid(t: Tables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
      .select(col("s_suppkey").as("ex_suppkey"))
    val goodParts = t.part
      .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
        && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val dim = goodParts.select(col("p_brand"), col("p_type"), col("p_size")).distinct()
      .withColumn("gid",
        row_number().over(Window.orderBy(col("p_brand"), col("p_type"), col("p_size"))))
    val partGid = goodParts
      .join(broadcast(dim), Seq("p_brand", "p_type", "p_size"))
      .select(col("p_partkey"), col("gid"))
    t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(partGid), col("p_partkey") === col("l_partkey"))
      .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      .groupBy(col("gid"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .join(broadcast(dim), "gid")
      .select(col("p_brand"), col("p_type"), col("p_size"), col("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf1")
    val spark = Sessions.builder(master = "local[32]", appName = "graft-q16-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val t = Tables(spark, s"graft_tpch:$schema")
    val a = graft.queries.Tpch.q16(t).collect().map(_.toString).sorted.toSeq
    val b = q16Direct(t).collect().map(_.toString).sorted.toSeq
    require(a == b, s"q16 direct variant diverged: ${a.length} vs ${b.length} rows")
    println(s"[q16-probe] $schema results EQUAL (${a.length} rows)")
    // floor: the scan+broadcast-join+anti stream with a plain ungrouped
    // count — everything q16 must pay before any distinct machinery.
    def floor(): DataFrame = {
      val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
        .select(col("s_suppkey").as("ex_suppkey"))
      val goodParts = t.part
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
          && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      t.lineitem.select(col("l_partkey"), col("l_suppkey"))
        .join(goodParts, col("p_partkey") === col("l_partkey"))
        .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
    }
    if (args.lift(1).contains("diag")) {
      // Cardinalities that size the wide exchanges — which dedup level
      // actually shrinks the stream decides which shape can win.
      val excluded = t.supplier.filter(col("s_name").like("%000000009%"))
        .select(col("s_suppkey").as("ex_suppkey"))
      val goodParts = t.part
        .filter(col("p_brand") =!= "Brand#1" && !col("p_type").like("MEDIUM%")
          && col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val joined = t.lineitem.select(col("l_partkey"), col("l_suppkey"))
        .join(goodParts, col("p_partkey") === col("l_partkey"))
        .join(excluded, col("l_suppkey") === col("ex_suppkey"), "left_anti")
      val r = joined.agg(count(lit(1)),
        countDistinct(col("l_partkey"), col("l_suppkey")),
        countDistinct(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey")),
        countDistinct(col("p_brand"), col("p_type"), col("p_size"))).head()
      println(s"[q16-probe] $schema rows=${r.getLong(0)} distinctPairs=${r.getLong(1)} " +
        s"distinctGroupSupp=${r.getLong(2)} groups=${r.getLong(3)}")
    }
    val c = q16Repart(t).collect().map(_.toString).sorted.toSeq
    require(a == c, s"q16 repart variant diverged: ${a.length} vs ${c.length} rows")
    val d = q16Cset(t).collect().map(_.toString).sorted.toSeq
    require(a == d, s"q16 cset variant diverged: ${a.length} vs ${d.length} rows")
    val e = q16Gid(t).collect().map(_.toString).sorted.toSeq
    require(a == e, s"q16 gid variant diverged: ${a.length} vs ${e.length} rows")
    println(s"[q16-probe] $schema repart/cset/gid results EQUAL")
    for (rep <- 1 to 2; (name, q) <- Seq(
        ("shipped", () => graft.queries.Tpch.q16(t)),
        ("pairdist", () => q16PairDist(t)),
        ("direct", () => q16Direct(t)),
        ("repart", () => q16Repart(t)),
        ("cset", () => q16Cset(t)),
        ("gid", () => q16Gid(t)),
        ("floor", () => floor()))) {
      val t0 = System.nanoTime()
      q().write.format("noop").mode("overwrite").save()
      println(f"[q16-probe] $schema%-6s $name%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s (rep $rep)")
    }
    spark.stop()
  }
}
