package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** Nested-schema pruning on STORED nested parquet — the subfield
  * pushdown of SURVEY §4.3 (reference markSubfields/Subfields.cpp): a
  * metadata-only query over a struct column must read only the accessed
  * subfield, leaving the huge payload unread on disk. */
class NestedPruningSpec extends SparkSpec {

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
