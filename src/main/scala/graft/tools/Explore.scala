package graft.tools

import graft.{Sessions, Tables}
import org.apache.spark.sql.functions._

/** Ad-hoc exploration main used while tuning operators (kept in-tree so
  * parameter choices in scaladocs are reproducible). */
object Explore {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val t = Tables(spark, args.headOption.getOrElse("/root/testdata/sf0.01"))
    // Hamming distance distribution of token-SimHash over ground-truth
    // near-dup pairs (shingle Jaccard >= 0.8).
    val docs = t.documents.select(col("doc_id"),
      expr("transform(array_distinct(split(trim(text), '\\\\s+')), tk -> xxhash64(tk))").as("th"))
    val bits = docs.withColumn("bits",
      expr("""transform(sequence(0, 63), k ->
                IF(aggregate(th, 0L, (acc, h) -> acc + IF(((h >> k) & 1) = 1, 1L, -1L)) > 0, 1L, 0L))"""))
    val truth = graft.llm.Dedup.neardupJaccard(t).select("doc_a", "doc_b")
    val hd = truth
      .join(bits.select(col("doc_id").as("doc_a"), col("bits").as("ba")), "doc_a")
      .join(bits.select(col("doc_id").as("doc_b"), col("bits").as("bb")), "doc_b")
      .withColumn("hd", expr("aggregate(zip_with(ba, bb, (p, q) -> abs(p - q)), 0L, (acc, v) -> acc + v)"))
    hd.groupBy("hd").count().orderBy("hd").show(100)
    spark.stop()
  }
}
