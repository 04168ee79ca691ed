package graft.tools

import graft.{Catalog, Sessions, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stage breakdown of the two entries the r19 ledger called
  * "inherent-looking" without proof (r19 verdict Next #7):
  * tfidf_top_terms and agg_percentiles. Times each prefix of the plan
  * to the noop sink (min-of-N, warm JVM) so the marginal cost of every
  * stage is a subtraction — the evidence needed to either optimize the
  * top stage or close the item as genuinely priced.
  *
  * Usage: runMain graft.tools.ProfileInherent [sfDir] [reps]
  */
object ProfileInherent {
  private def time(df: DataFrame, reps: Int): Double =
    (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession =
      Sessions.builder(master = s"local[$cpus]", appName = "graft-profile-inherent")
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    // warm footers/page cache like the bench does
    Catalog.tableNames.foreach(n =>
      Catalog.load(spark, sfDir, n).write.format("noop").mode("overwrite").save())

    // ---- tfidf_top_terms: scan+tokenize -> tf groupBy -> df agg ->
    // join+score -> window topk (mirrors graft.llm.Corpus.tfidfTopTerms)
    val toks = split(trim(col("text")), "\\s+")
    val spread = t.documents.select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val tokens = spread.select(col("doc_id"), explode(toks).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = t.documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score_q",
        floor(col("tf") * (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + 1.0) * 10000))
    val full = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score_q").desc, col("term"))).cast("bigint"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("score_q"))
    val tTok = time(tokens, reps)
    val tTf = time(tf, reps)
    val tDf = time(df, reps)
    val tScore = time(scored, reps)
    val tFull = time(full, reps)
    println(f"[tfidf] tokenize=$tTok%.3f tf_groupBy=$tTf%.3f df_agg=$tDf%.3f " +
      f"join_score=$tScore%.3f full_with_window=$tFull%.3f")
    println(f"[tfidf] marginal: tf=${tTf - tTok}%.3f df=${tDf - tTf}%.3f " +
      f"join=${tScore - tDf}%.3f window=${tFull - tScore}%.3f")
    val reused = full.queryExecution.executedPlan.toString.contains("ReusedExchange")
    println(s"[tfidf] plan reuses the tf exchange: $reused")

    // ---- agg_percentiles: scan -> exact percentile agg
    val scan = t.lineitem.select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    val perc = t.lineitem.groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.5)).as("q_p50"),
        percentile(col("l_quantity"), lit(0.9)).as("q_p90"),
        percentile(col("l_extendedprice"), lit(0.99)).as("p_p99"),
        min(col("l_quantity")).as("q_min"),
        max(col("l_quantity")).as("q_max"))
    val minmax = t.lineitem.groupBy(col("l_returnflag"))
      .agg(min(col("l_quantity")).as("q_min"), max(col("l_quantity")).as("q_max"))
    val tScan = time(scan, reps)
    val tMinmax = time(minmax, reps)
    val tPerc = time(perc, reps)
    println(f"[percentiles] scan3cols=$tScan%.3f hash_minmax_agg=$tMinmax%.3f " +
      f"exact_percentile_agg=$tPerc%.3f (marginal percentile cost=${tPerc - tMinmax}%.3f)")
    spark.stop()
  }
}
