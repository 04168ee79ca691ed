package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layouts — the Spark rendering of the reference's
  * TableLayout partitioning metadata (ConnectorMetadata.h:171-285:
  * partitionColumns()/orderColumns()/sortOrder(); Distribution
  * co-partitioning test Schema.h:190 isSamePartition).
  *
  * A table bucketed (and sorted) on its join key carries its
  * distribution in catalog metadata: joins between co-bucketed tables
  * need NO exchange — at 100 TB this removes the dominant shuffle of
  * every fact-to-fact join, which is exactly why the reference models
  * distributions on layouts. Bucket counts must match (or divide) for
  * co-location; pick them from target data volume / executor count, not
  * from sf-local convenience.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", s"/root/repo/target/warehouse/$table")
      .saveAsTable(table)

  /** Materialize co-bucketed copies of two tables on their join keys and
    * return the exchange-free join. */
  def coLocatedJoin(spark: SparkSession, left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String, buckets: Int = 8): DataFrame = {
    writeBucketed(left, "graft_bkt_left", buckets, leftKey)
    writeBucketed(right, "graft_bkt_right", buckets, rightKey)
    spark.table("graft_bkt_left")
      .join(spark.table("graft_bkt_right"),
        spark.table("graft_bkt_left")(leftKey) === spark.table("graft_bkt_right")(rightKey))
  }
}
