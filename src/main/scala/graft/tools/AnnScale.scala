package graft.tools

import graft.{Sessions, Tables}
import graft.llm.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN scale-evidence harness — the embedding tier's analogue of the
  * TPC-H generator lane and tools/StreamScale: MEASURE the IVF claims
  * (bounded probes, constant-size codebook training) against brute
  * force at 1×/10×/100× the sf0.1 embeddings volume (2k → 200k
  * vectors), and CHECK that recall@5 vs the exact answer holds as the
  * corpus grows — a probe fraction that was enough at 2k vectors is a
  * claim, not a given, at 200k.
  *
  * The synthetic corpus mirrors the real `embeddings` table (vec_id,
  * 64-float embedding, int label) with planted cluster structure: each
  * vector = one of 32 hash-chosen centers + per-coordinate noise, so
  * IVF's k-means codebook has real structure to find (uniform noise
  * would make every list a random slice and measure nothing but
  * throughput). All values derive from hash(vec_id) — deterministic,
  * cached under target/ann_scale/.
  *
  * Recall is computed exactly: both entries' (q_id, neighbor_id) top-5
  * sets are NQueries×K rows, collected and intersected.
  */
object AnnScale {

  private val BaseVecs = 2000L // sf0.1 embeddings volume
  private val Dims = 64
  private val Centers = 32

  private def genEmbeddings(spark: SparkSession, n: Long, dir: java.io.File): Unit = {
    val f = new java.io.File(dir, "embeddings.parquet")
    if (f.exists()) return
    dir.mkdirs()
    val df = spark.range(BaseVecs * n).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${Dims - 1}), i -> cast(
                 pmod(hash(pmod(hash(id), $Centers), i), 1000) / 500.0 - 1.0
                   + pmod(hash(id, i + 100), 200) / 1000.0 - 0.1 AS float))""")
        .as("embedding"),
      pmod(hash(col("id"), lit(5)), lit(10)).cast("int").as("label"))
    df.write.mode("overwrite").parquet(f.getPath)
  }

  private def topk(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(master = "local[32]", appName = "graft-ann-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // calibration probe (round 19, uniform with the bench lanes):
    // start/end samples; a >1.5x worst ratio marks over-committed legs
    // environment-suspect in the printed summary
    val calibs = Seq.newBuilder[Double]
    calibs += LaneDiscipline.calibrationRatio(spark, "ann-scale")
    val scales = Seq(1L, 10L, 100L)
    val rows = scales.map { n =>
      val d = new java.io.File(s"/root/repo/target/ann_scale/x$n")
      genEmbeddings(spark, n, d)
      val t = Tables(spark, d.getPath)
      // The production ANN workload scales QUERIES with the corpus
      // (index-everything: every new vector queries the index), and
      // production IVF sizes the codebook with the corpus (~sqrt N
      // lists, FAISS guidance), probing a fixed fraction of them. The
      // 1x row keeps the registered entries' exact sizing (16 lists,
      // probe 6, 20 queries).
      val vecs = BaseVecs * n
      val nq = 20L * n
      val nLists = math.max(16, math.min(128, math.sqrt(vecs.toDouble).toInt))
      // Probe count stays FIXED as lists grow (the FAISS pattern: nprobe
      // grows much slower than nlist), so the probed fraction — and with
      // it the candidate volume per query — SHRINKS with corpus size:
      // 6·3/44 = 41% at 1x, 6·3/128 = 14% at 10x/100x.
      val nProbe = 6
      val reps = if (n == 100L) 1 else 2
      // min time paired with ITS OWN rep's result set, so the recall
      // printed for the kept time is computed from the kept run's answer
      def time(fn: Tables => DataFrame, label: String, nReps: Int,
               tag: String = ""): (Double, Set[(Long, Long)]) = {
        var best = Double.MaxValue
        var bestOut: Set[(Long, Long)] = Set.empty
        (1 to nReps).foreach { _ =>
          val jiff0 = LaneDiscipline.cpuJiffies
          val t0 = System.nanoTime()
          val out = topk(fn(t))
          val s = (System.nanoTime() - t0) / 1e9
          val load = LaneDiscipline.loadavg
          val steal = LaneDiscipline.stealPct(jiff0, LaneDiscipline.cpuJiffies)
          System.err.println(f"[ann-scale] x$n%-4d $label%-6s $s%7.2f s " +
            f"(q=$nq lists=$nLists probe=$nProbe, load $load%.1f, steal $steal%.1f%%)$tag")
          if (s < best) { best = s; bestOut = out }
        }
        (best, bestOut)
      }
      // Committed-reference heal (round 17, uniform lane discipline): a
      // leg over 2x bench/ann_scale.json re-runs ONCE (min-of-measured)
      // so a transient can't ship as a regression. Recall stays judged
      // on the kept (fastest) rep's result set.
      val (commScales, comm) = LaneDiscipline.committed("bench/ann_scale.json", "ann-scale")
      def timedHealed(fn: Tables => DataFrame, label: String,
                      commName: String): (Double, Set[(Long, Long)]) = {
        var (sec, out) = time(fn, label, reps)
        val ci = commScales.indexOf(n)
        val over = ci >= 0 && comm.get(commName).flatMap(_.lift(ci))
          .exists(c => c >= 0.5 && sec > 2.0 * c)
        if (over) {
          val (s2, o2) = time(fn, label, 1, " (heal)")
          if (s2 < sec) { sec = s2; out = o2 }
        }
        (sec, out)
      }
      val (bSec, exact) = timedHealed(Ann.annBruteforce(_, nq), "brute", "ann_brute")
      val (iSec, approx) = timedHealed(Ann.annIvf(_, nProbe, nq, nLists), "ivf", "ann_ivf")
      val recall = (exact & approx).size.toDouble / exact.size
      (n, vecs, nq, nLists, nProbe, bSec, iSec, recall)
    }
    calibs += LaneDiscipline.calibrationRatio(spark, "ann-scale")
    val calibration = calibs.result()
    val calibMax = calibration.filterNot(_.isNaN)
      .foldLeft(Double.NaN)((a, b) => if (a.isNaN || b > a) b else a)
    println("| scale | vectors | queries | lists/probe | brute top-5 (s) | IVF top-5 (s) | IVF recall@5 vs brute |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (n, v, nq, nl, np, b, i, r) =>
      println(f"| ${n}x | $v | $nq | $nl/$np | $b%.2f | $i%.2f | $r%.3f |")
    }
    println(s"[ann-scale] calibration ratios: " +
      calibration.map(c => if (c.isNaN) "n/a" else f"$c%.2f").mkString("/") +
      (if (!calibMax.isNaN && calibMax > LaneDiscipline.CalibrationSuspectGate)
        " - ENV-SUSPECT: over-committed legs in this run may be box degradation, not regression"
       else ""))
    spark.stop()
  }
}
