package graft.tools

import graft.{Catalog, Sessions, SparkEntry}

/** Scaling-evidence harness: times a set of scale-critical operators at
  * sf0.001 / sf0.01 / sf0.1 in ONE warm JVM (min of 2 runs each) and
  * prints a markdown table with the observed wall-time ratio across the
  * largest decade next to each operator's DESIGNED asymptotic shape.
  *
  * Caveat printed with the table: at these corpus sizes per-query fixed
  * overhead (plan + codegen + task dispatch, ~0.1-0.3 s) is a large
  * fraction of wall time, so observed ratios UNDER-state asymptotic
  * growth for fast queries; the point of the table is catching
  * super-linear blowups (a quadratic operator shows a ~100x decade
  * ratio long before overhead can hide it), not certifying constants.
  */
object ScalingReport {

  private val ops: Seq[(String, String)] = Seq(
    ("tpch_q10", "~linear (scan + broadcast dims + agg)"),
    ("dedup_exact", "linear (digest shuffle)"),
    ("dedup_incremental", "linear: digest semi-join + delta-vs-base LSH buckets"),
    ("neardup_minhash", "~linear (banded buckets + verify)"),
    ("neardup_jaccard", "documented naive exact tier (ground truth)"),
    ("neardup_jaccard_prefix", "~linear (prefix-filtered index)"),
    ("dedup_cluster_keep_best", "near-dup + O(log d) CC rounds + window"),
    ("dedup_cluster_cc", "O(log d) hash-min CC rounds, checkpoints released"),
    ("dedup_cluster_cc_star", "large/small-star CC, O(log d) rounds"),
    ("pipeline_corpus_build", "linear, I/O-bound (write + read-back)"),
    ("pipeline_shard_build", "linear, I/O-bound (partitioned write)"),
    ("neardup_embedding", "bounded: IVF lists linear + capped LSH"),
    ("ann_ivf_topk", "sublinear probes over linear lists"),
    ("text_token_stats", "linear (expression-only)"),
    ("text_pii_scrub", "linear (regex projection)"),
    ("events_asof_native", "~n log n (range-partitioned merge)"),
    ("sample_mixture", "linear (broadcast fractions, map-side filter)"),
    ("ann_pq_adc", "linear code scan + constant rerank/query"),
    ("ann_ivfpq_topk", "IVF-pruned code scan + constant rerank/query"),
    ("text_dup_spans", "linear gram stream, hash-keyed shuffles"),
    ("text_dup_span_excise", "same anchors + per-doc window"),
    ("text_dup_span_cut", "excision islands + per-doc stitch join"),
    ("stream_tumbling", "bounded replay: micro-batch stream, complete-mode agg"),
    ("stream_sessions", "replay + sentinel flush; state = open sessions only"),
    ("stream_join", "stream-stream join; state bounded by watermark ranges"),
    ("layout_zorder_indexed_read", "write: range shuffle; read: manifest-pruned scan"),
    ("mm_decode_features", "linear (per-row PNG codec, no shuffle)"),
    ("mm_frame_sample", "linear in sampled frames (positions exploded first)"),
    ("presto_qdigest", "linear scan + bounded KLL state per group"))

  def main(args: Array[String]): Unit = {
    val sfs = Seq("0.001", "0.01", "0.1")
    val spark = Sessions.builder(master = "local[32]", appName = "graft-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm every (sf, table) so first-touch parquet footers/page cache
    // don't land on the first op
    sfs.foreach { sf =>
      Catalog.tableNames.foreach { t =>
        Catalog.load(spark, s"/root/testdata/sf$sf", t)
          .write.format("noop").mode("overwrite").save()
      }
    }
    val qs = SparkEntry.queries
    val rows = ops.map { case (name, shape) =>
      val times = sfs.map { sf =>
        val dir = s"/root/testdata/sf$sf"
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          qs(name)(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val decade = times(2) / times(1) // sf0.01 -> sf0.1 = 10x data
      (name, shape, times, decade)
    }
    println("| operator | sf0.001 s | sf0.01 s | sf0.1 s | last-decade ratio | designed shape |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, shape, ts, d) =>
      println(f"| $n | ${ts(0)}%.2f | ${ts(1)}%.2f | ${ts(2)}%.2f | $d%.1fx | $shape |")
    }
    spark.stop()
  }
}
