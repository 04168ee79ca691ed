package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.llm.TextStats

/** Diagnostic for the dedup lane's steepest entry (`text_dup_span_cut`,
  * 8.8× on the 10→100 decade in round 13): decompose the pipeline into
  * cumulative stages and A/B the big-corpus anchor strategy, at the
  * lane's own corpora.
  *
  * Stages (each is a prefix of the full op, so deltas attribute cost):
  *  1. extract  — the anchor stream alone (ascii prefilter + xxhash64)
  *  2. census   — dupSpans: + hash census shuffle + join-back + doc agg
  *  3. excise   — dupSpanExcise: + per-doc window islands
  *  4. cut      — dupSpanCut: + text join + HOF stitch + full-corpus out
  *
  * Usage: runMain graft.tools.SpanProfile [scales] [strategies]
  *   e.g. runMain graft.tools.SpanProfile 10,100 persist,recompute
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("10,100").split(',').map(_.trim.toLong).toSeq
    val strategies = args.lift(1).getOrElse("persist,recompute").split(',').map(_.trim).toSeq
    val stageRe = args.lift(2).getOrElse(".").r
    val spark = Sessions.builder(master = "local[32]", appName = "graft-span-profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- scales) {
      val dir = new java.io.File(s"target/dedup_scale/x$n")
      DedupScale.genDocs(spark, n, dir)
      // the lane's partition discipline: scale shuffle width with data
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(256L, 32 * math.max(1L, n / 4)).toString)
      val t = Tables(spark, dir.getPath)
      val docs = t.documents
      def time(tag: String)(body: => Unit): Unit =
        if (stageRe.findFirstIn(tag).isDefined) {
          val t0 = System.nanoTime()
          body
          println(f"[span-profile] x$n%-4d $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      for (s <- strategies) {
        spark.conf.set("graft.text.anchorStrategy", s)
        time(s"extract ($s)") {
          TextStats.anchorsOver(docs).select(count(lit(1))).head() }
        time(s"census=dupSpans ($s)") {
          TextStats.dupSpans(t).write.format("noop").mode("overwrite").save() }
        time(s"excise ($s)") {
          TextStats.dupSpanExcise(t).write.format("noop").mode("overwrite").save() }
        time(s"cut ($s)") {
          TextStats.dupSpanCut(t).write.format("noop").mode("overwrite").save() }
      }
      spark.conf.unset("graft.text.anchorStrategy")
      spark.conf.unset("spark.sql.shuffle.partitions")
    }
    spark.stop()
  }
}
