package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** Nested-schema pruning on STORED nested parquet — the subfield
  * pushdown of SURVEY §4.3 (reference markSubfields/Subfields.cpp): a
  * metadata-only query over a struct column must read only the accessed
  * subfield, leaving the huge payload unread on disk. */
class NestedPruningSpec extends SparkSpec {

  test("subfield access through path-transparent functions prunes the scan") {
    // Feature-backfill pattern over a WIDE feature struct: without the
    // decomposition rule, coalesce(features_a, features_b).f1 defeats
    // SchemaPruning (extraction is not rooted at an attribute) and the
    // scan reads every field; with it, ReadSchema keeps only f1.
    val dir = "/root/repo/target/nested/features"
    val wide = struct((1 to 8).map(i => (col("doc_id") * i).cast("double").as(s"f$i")): _*)
    tables.documents.select(col("doc_id"), wide.as("features_a"),
      when(col("doc_id") % 2 === 0, wide).as("features_b"), col("text").as("payload"))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)

    val q = stored.select(col("doc_id"),
      coalesce(col("features_b"), col("features_a")).getField("f1").as("f1"))
    val scan = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val read = scan.requiredSchema.catalogString
    assert(read.contains("f1"), read)
    assert(!read.contains("f2") && !read.contains("payload"),
      s"wide feature struct not pruned through coalesce: $read")

    // Semantics preserved: a non-null struct with a null-valued field
    // must still win the coalesce (extraction happens after choice).
    val got = q.orderBy("doc_id").limit(10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = stored.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("features_b").getField("f1"))
        .otherwise(col("features_a").getField("f1")).as("f1"))
      .orderBy("doc_id").limit(10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.sameElements(want))
  }

  test("map value-transform access decomposes to a direct key lookup") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 2.0, "b" -> 3.0)), (2L, Map("b" -> 5.0)))
      .toDF("id", "m")
    val q = df.select(col("id"),
      expr("transform_values(m, (k, v) -> v * 10.0)['a']").as("va"))
    // Decomposed: no TransformValues left in the optimized plan — the
    // per-key lookup replaces materializing the whole transformed map.
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("transform_values"), optimized)
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq == Seq((1L, Some(20.0)), (2L, None)))
  }

  test("struct subfield access prunes the parquet ReadSchema to that field") {
    val dir = "/root/repo/target/nested/mm"
    Multimodal.mmTable(tables).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q = stored.select(col("doc_id"), col("meta.origin").as("origin"))
    val scan = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val read = scan.requiredSchema.catalogString
    assert(read.contains("origin"), read)
    assert(!read.contains("payload"), s"payload not pruned: $read")
    assert(!read.contains("modality_tag"), s"sibling subfield not pruned: $read")
    assert(q.count() == tables.documents.count())
  }
}
