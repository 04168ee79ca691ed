package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink format breadth — the reference's connector layer reads
  * DWRF or Parquet (LocalHiveConnectorMetadata.cpp:152-156
  * hive.local.file.format); Spark's source API gives Parquet, ORC, CSV
  * and JSON for free. Each query round-trips a table through a format
  * and returns an aggregate digest the oracle recomputes from the
  * original parquet — proving write+read fidelity, not just read.
  *
  * CSV/JSON carry no column types, so the round-trip re-applies an
  * explicit schema on read (the production posture for text formats:
  * schema-on-read is declared, never inferred twice).
  */
object Formats {

  private val base = "/root/repo/target/formats"

  private def digest(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      round(sum(col("o_totalprice")), 2).as("total"),
      countDistinct(col("o_orderpriority")).as("n_prio"))

  val digestOracleSql: String =
    """SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS total,
       count(DISTINCT o_orderpriority) AS n_prio FROM orders"""

  private def subset(t: Tables): DataFrame =
    t.orders.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))

  def orcRoundtrip(t: Tables): DataFrame = {
    val dir = s"$base/orders_orc"
    subset(t).write.mode("overwrite").orc(dir)
    digest(t.spark.read.orc(dir))
  }

  def csvRoundtrip(t: Tables): DataFrame = {
    val dir = s"$base/orders_csv"
    subset(t).write.mode("overwrite").option("header", "true").csv(dir)
    digest(t.spark.read
      .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
      .option("header", "true").csv(dir))
  }

  def jsonRoundtrip(t: Tables): DataFrame = {
    val dir = s"$base/orders_json"
    subset(t).write.mode("overwrite").json(dir)
    digest(t.spark.read
      .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
      .json(dir))
  }

  /** Avro (row-oriented, the common ingest/interchange format alongside
    * columnar parquet/ORC). The implementation classes ship inside Spark
    * 4's sql jar but the short name "avro" is service-registered only by
    * the external module, so the format is addressed by class name. */
  def avroRoundtrip(t: Tables): DataFrame = {
    val dir = s"$base/orders_avro"
    val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
    subset(t).write.mode("overwrite").format(fmt).save(dir)
    digest(t.spark.read.format(fmt).load(dir))
  }

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("format_orc_roundtrip", orcRoundtrip _, digestOracleSql),
    ("format_csv_roundtrip", csvRoundtrip _, digestOracleSql),
    ("format_json_roundtrip", jsonRoundtrip _, digestOracleSql),
    ("format_avro_roundtrip", avroRoundtrip _, digestOracleSql))
}
