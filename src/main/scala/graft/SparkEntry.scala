package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Events, Exprs, Geo, HistoryFlow, Ml, Presto, Relational, SqlOps, Tpch, Tpch2, TpchSql}
import graft.llm.{Ann, Corpus, Dedup, Multimodal, TextStats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query over the
  * driver's parquet tables plus (when SQL-expressible) an equivalent
  * ANSI SQL string the DuckDB oracle runs on the same data. Column names
  * are aliased identically on both sides: the driver sorts columns by
  * name before hashing values.
  */
object SparkEntry {
  private def adapt(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => f(Tables(s, d))

  /** Central registry: (name, query fn, oracle SQL — "" when the op is
    * not SQL-expressible and the driver should do a rows-only check). */
  private def allEntries: Seq[(String, (SparkSession, String) => DataFrame, String)] =
    Tpch.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Tpch2.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      TpchSql.all ++
      Relational.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Exprs.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Exprs.sqlDriven ++
      SqlOps.all ++
      HistoryFlow.all ++
      Presto.all ++
      Geo.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Ml.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Events.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Dedup.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Ann.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      TextStats.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Corpus.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      Multimodal.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      graft.sources.Formats.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      graft.sources.ZOrder.all.map { case (n, f, sql) => (n, adapt(f), sql) } ++
      graft.sources.CustomSource.all ++
      graft.sources.TpchSource.all ++
      graft.streaming.Streams.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.collect { case (n, _, sql) if sql.nonEmpty => n -> sql }.toMap
}
