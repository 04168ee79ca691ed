package graft.tools

import graft.{Sessions, Tables}
import graft.functions.NativeExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc exploration for the bucketed mid-threshold embedding-similarity
  * design (neardup_embedding at cos >= 0.45): measures recall + candidate
  * volume of IVF multi-assign blocking and sign-LSH banding against the
  * exact all-pairs ground truth, at a given sf dir. */
object ExploreEmb {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val t = Tables(spark, sfDir)
    NativeExprs.ensureRegistered(spark)

    val v = t.embeddings.select(col("vec_id"), col("embedding").as("e"))
      .withColumn("norm", sqrt(call_function("graft_vecdot", col("e"), col("e"))))
      .localCheckpoint(true)
    val n = v.count()
    println(s"== corpus $sfDir: $n vectors")

    // Ground truth: all pairs cos >= 0.45 (test-only all-pairs).
    val truth = v.as("a").crossJoin(v.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        call_function("graft_vecdot", col("a.e"), col("b.e")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= 0.45)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos"))
      .localCheckpoint(true)
    val nTruth = truth.count()
    println(s"== true pairs at 0.45: $nTruth")
    truth.orderBy(col("cos").desc).show(50, false)

    def evalCands(name: String, cands: DataFrame): Unit = {
      val c = cands.dropDuplicates("vec_a", "vec_b").localCheckpoint(true)
      val nc = c.count()
      val hit = truth.join(c, Seq("vec_a", "vec_b"), "left_semi").count()
      println(f"== $name%-40s cands=$nc%9d recall=${hit.toDouble / math.max(1, nTruth)}%.4f ($hit/$nTruth)")
    }

    // Scheme A: IVF multi-assign. Centroids = every-31st-id vectors.
    for (nAssign <- Seq(2, 3, 4, 6, 8)) {
      val cents = v.filter(pmod(col("vec_id"), lit(31)) === 0)
        .select(col("vec_id").as("c_id"), col("e").as("ce"), col("norm").as("cnorm"))
      val wA = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))
      val assigned = v.crossJoin(broadcast(cents))
        .withColumn("csim", call_function("graft_vecdot", col("e"), col("ce")) / (col("norm") * col("cnorm")))
        .withColumn("arank", row_number().over(wA))
        .filter(col("arank") <= nAssign)
        .select(col("c_id").as("list_id"), col("vec_id"))
      val cands = assigned.as("x").join(assigned.as("y"),
        col("x.list_id") === col("y.list_id") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      evalCands(s"ivf stride31 assign=$nAssign", cands)
    }

    // The shipped tiered union (IVF assign=4 ∪ sign-LSH 32x6 + verify):
    // must EQUAL ground truth exactly.
    val got = graft.llm.Dedup.neardupEmbedding(t)
      .select(col("vec_a"), col("vec_b")).localCheckpoint(true)
    val gotN = got.count()
    val missed = truth.join(got, Seq("vec_a", "vec_b"), "left_anti").count()
    println(s"== shipped union: rows=$gotN (truth=$nTruth) missed=$missed")
    val plan = graft.llm.Dedup.neardupEmbedding(t).queryExecution.executedPlan.toString
    println(s"== shipped union plan has product: ${plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")}")

    // Scheme B: sign-LSH (tables x bits).
    for ((tbl, bits) <- Seq((16, 8), (32, 6), (64, 6), (32, 4), (64, 8), (128, 8))) {
      val buckets = v.select(col("vec_id"),
        explode(call_function("graft_signlsh", col("e"), lit(tbl), lit(bits))).as("bucket"))
      val cands = buckets.as("x").join(buckets.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      evalCands(s"signlsh T=$tbl b=$bits", cands)
    }

    spark.stop()
  }
}
