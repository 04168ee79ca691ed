package graft.tools

import graft.{Sessions, Tables}

/** Wall-clock check of the near-dup/ANN tier at a given scale factor. */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("warmup")(t.documents.count())
    time("neardup_jaccard")(
      graft.llm.Dedup.neardupJaccard(t).write.format("noop").mode("overwrite").save())
    time("neardup_minhash")(
      graft.llm.Dedup.neardupMinhash(t).write.format("noop").mode("overwrite").save())
    time("neardup_simhash")(
      graft.llm.Dedup.neardupSimhash(t).write.format("noop").mode("overwrite").save())
    time("neardup_embedding")(
      graft.llm.Dedup.neardupEmbedding(t).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
