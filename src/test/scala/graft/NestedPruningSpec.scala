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

  test("map_filter access decomposes to a guarded direct key lookup") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 2.0, "b" -> 9.0)), (2L, Map("a" -> 7.0)),
      (3L, Map("b" -> 1.0))).toDF("id", "m")
    val q = df.select(col("id"),
      expr("map_filter(m, (k, v) -> v > 3.0)['a']").as("va"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("map_filter"), optimized)
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    // id=1: a->2.0 filtered out; id=2: a->7.0 kept; id=3: no 'a' key.
    assert(got.toSeq == Seq((1L, None), (2L, Some(7.0)), (3L, None)))
  }

  test("map_zip_with access decomposes to direct lookups on both maps") {
    import spark.implicits._
    val df = Seq(
      (1L, Map("a" -> 2.0), Map("a" -> 3.0)), // key in both
      (2L, Map("a" -> 5.0), Map("b" -> 1.0)), // key in left only
      (3L, Map("b" -> 4.0), Map("a" -> 6.0)), // key in right only
      (4L, Map("b" -> 1.0), Map("c" -> 2.0))) // key in neither
      .toDF("id", "m1", "m2")
    val q = df.select(col("id"),
      expr("map_zip_with(m1, m2, (k, x, y) -> coalesce(x, 0.0) + coalesce(y, 0.0))['a']")
        .as("va"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("map_zip_with"), optimized)
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq == Seq(
      (1L, Some(5.0)), (2L, Some(5.0)), (3L, Some(6.0)), (4L, None)))
  }

  test("element_at chains decompose through stacked map functions") {
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 2.0, "b" -> 9.0)), (2L, Map("b" -> 5.0)))
      .toDF("id", "m")
    // try_element_at is the null-on-missing subscript (ANSI element_at
    // must keep its missing-key error, so only the null-safe form may
    // rewrite to a guarded lookup). Two stacked functions unwind in one
    // optimizer pass.
    val q = df.select(col("id"),
      expr("try_element_at(transform_values(map_filter(m, (k, v) -> v < 5.0)," +
        " (k, v) -> v * 10.0), 'a')").as("va"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("transform_values"), optimized)
    assert(!optimized.contains("map_filter"), optimized)
    val got = q.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(got.toSeq == Seq((1L, Some(20.0)), (2L, None)))
  }

  test("nondeterministic inputs are not duplicated by the decomposition") {
    import spark.implicits._
    val dir = "/root/repo/target/nested/nondet"
    Seq((1L, Map("a" -> 2.0))).toDF("id", "m")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    // The coalesce rewrite would evaluate each input twice (IsNotNull +
    // extract); with a rand()-bearing branch that changes semantics, so
    // the rule must leave the expression alone.
    val q = df.select(col("id"),
      expr("coalesce(if(rand() > 0.5, m, null), m)['a']").as("va"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("coalesce"),
      s"nondeterministic coalesce was rewritten: $optimized")
    val got = q.collect().map(r => Option(r.get(1)))
    assert(got.toSeq == Seq(Some(2.0)))
  }

  test("one call read at two paths decomposes per path (explode translator analogue)") {
    // Reference FunctionRegistry.h:152-166: the `explode` translator
    // lets ONE call used at several result paths decompose into per-path
    // expressions. Here that falls out of per-extraction rewriting —
    // each extraction node rewrites independently.
    // (a) map: one transform_values call subscripted at TWO keys becomes
    //     two direct guarded lookups; no transformed map materializes.
    import spark.implicits._
    val df = Seq((1L, Map("a" -> 2.0, "b" -> 3.0)), (2L, Map("b" -> 5.0))).toDF("id", "m")
    val q = df.select(col("id"),
      expr("transform_values(m, (k, v) -> v * 10.0)['a']").as("va"),
      expr("transform_values(m, (k, v) -> v * 10.0)['b']").as("vb"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("transform_values"), optimized)
    val got = q.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(got.toSeq == Seq((1L, Some(20.0), Some(30.0)), (2L, None, Some(50.0))))

    // (b) stored wide struct: one coalesce call read at TWO fields —
    //     ReadSchema prunes to exactly those two, not the rest.
    val dir = "/root/repo/target/nested/features_multi"
    val wide = struct((1 to 8).map(i => (col("doc_id") * i).cast("double").as(s"f$i")): _*)
    tables.documents.select(col("doc_id"), wide.as("features_a"),
      when(col("doc_id") % 2 === 0, wide).as("features_b"), col("text").as("payload"))
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val q2 = stored.select(col("doc_id"),
      coalesce(col("features_b"), col("features_a")).getField("f1").as("v1"),
      coalesce(col("features_b"), col("features_a")).getField("f3").as("v3"))
    val scan = q2.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val read = scan.requiredSchema.catalogString
    assert(read.contains("f1") && read.contains("f3"), read)
    assert(!read.contains("f2") && !read.contains("f4") && !read.contains("payload"),
      s"one call read at two paths must prune to exactly those paths: $read")
    // both structs hold identical values, so v1 = id*1 and v3 = id*3
    q2.orderBy("doc_id").limit(10).collect().foreach { r =>
      assert(r.getDouble(1) == r.getLong(0) * 1.0 && r.getDouble(2) == r.getLong(0) * 3.0, r)
    }
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
