package graft.sql

import org.apache.spark.sql.DataFrame

/** `SHOW STATS FOR t` / `SHOW STATS FOR (query)` renderer
  * (PrestoSql.g4:139-140): Presto reports the optimizer's ESTIMATED
  * statistics for the target's output — so the honest Spark rendering
  * reads the optimized plan's [[org.apache.spark.sql.catalyst.plans.logical.Statistics]],
  * which is exactly what the CBO costs plans with (rowCount +
  * per-attribute stats installed by ANALYZE / History through
  * CardinalityStatsRule). Columns with no recorded stats print NULLs,
  * Presto-identically.
  *
  * Output schema matches Presto's: column_name, data_size,
  * distinct_values_count, nulls_fraction, row_count, low_value,
  * high_value — one row per output column plus the table-level summary
  * row (null column_name, row_count set). The result is rendered as a
  * VALUES statement handed back to the delegate parser, so the SHOW
  * statement stays a normal one-shot local query.
  */
object ShowStats {

  /** `EXPLAIN ANALYZE [VERBOSE]` (PrestoSql.g4:126): Presto executes the
    * query and prints the plan annotated with MEASURED per-operator
    * statistics. Spark rendering: execute this DataFrame's own physical
    * plan (`queryExecution.toRdd` — the same plan object, so its SQL
    * metrics accumulate), then walk the final AQE plan printing each
    * node with its observed metric values (numOutputRows etc.). Returned
    * as Presto does it: rows of text in one `query_plan` column, with a
    * summary line carrying total wall time. VERBOSE prints each node's
    * full simpleString instead of the bare name. */
  def explainAnalyzeSql(df: DataFrame, verbose: Boolean): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count() // executes THIS plan; metrics fill
    val wallMs = (System.nanoTime() - t0) / 1e6

    def lines(p: SparkPlan, depth: Int): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => lines(a.executedPlan, depth)
      case q: QueryStageExec => lines(q.plan, depth) // stages hide their subtree from children
      case _ =>
        val shown = p.metrics.toSeq.sortBy(_._1)
          .filter(_._2.value > 0)
          .map { case (k, m) => s"$k=${m.value}" }
          .mkString(", ")
        val head = if (verbose) p.simpleString(120) else p.nodeName
        val sub = p.subqueries.flatMap(s =>
          (("  " * (depth + 1)) + "Subquery:") +: lines(s, depth + 2))
        (("  " * depth) + head + (if (shown.nonEmpty) s" [$shown]" else "")) +:
          (sub ++ p.children.flatMap(lines(_, depth + 1)))
    }
    val all = lines(df.queryExecution.executedPlan, 0) :+
      f"Total wall time: $wallMs%.1f ms"
    // Escape backslashes BEFORE quotes: verbose plan strings carry regex
    // patterns ('\d+') that Spark's string-literal parser would otherwise
    // reinterpret as escapes and garble the generated statement.
    all.map(l =>
      s"('${l.replace("\\", "\\\\").replace("'", "''")}')").mkString(
      "SELECT * FROM VALUES ", ", ", " AS explain_analyze(query_plan)")
  }

  def sqlFor(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    val stats = plan.stats
    val rowCount = stats.rowCount

    def dbl(o: Option[Double]): String =
      o.filter(d => !d.isNaN && !d.isInfinite)
        .map(d => s"CAST($d AS DOUBLE)").getOrElse("CAST(NULL AS DOUBLE)")
    def str(o: Option[String]): String =
      o.map(v => "'" + v.replace("'", "''") + "'").getOrElse("CAST(NULL AS STRING)")

    val colRows = plan.output.map { a =>
      val cs = stats.attributeStats.get(a)
      val ndv = cs.flatMap(_.distinctCount).map(_.toDouble)
      val nullsFrac = for {
        c <- cs; nc <- c.nullCount; n <- rowCount if n > 0
      } yield nc.toDouble / n.toDouble
      val dataSize = for {
        c <- cs; al <- c.avgLen; n <- rowCount
      } yield al.toDouble * (n - c.nullCount.getOrElse(BigInt(0))).toDouble
      val lo = cs.flatMap(_.min).map(_.toString)
      val hi = cs.flatMap(_.max).map(_.toString)
      s"(${str(Some(a.name))}, ${dbl(dataSize)}, ${dbl(ndv)}, ${dbl(nullsFrac)}, " +
        s"CAST(NULL AS DOUBLE), ${str(lo)}, ${str(hi)})"
    }
    val summary =
      s"(CAST(NULL AS STRING), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
        s"CAST(NULL AS DOUBLE), ${dbl(rowCount.map(_.toDouble))}, " +
        "CAST(NULL AS STRING), CAST(NULL AS STRING))"
    (colRows :+ summary).mkString(
      "SELECT * FROM VALUES ", ", ",
      " AS show_stats(column_name, data_size, distinct_values_count, " +
        "nulls_fraction, row_count, low_value, high_value)")
  }
}
