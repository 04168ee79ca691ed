package graft

/** Global plan audit: NO registered query may plan an unintended
  * cartesian product. The whitelist names the queries whose semantics
  * ARE a (bounded) product: explicit cross joins, single-row scalar
  * subquery joins, broadcast probe×corpus scans, and pairwise similarity
  * over the whole corpus. Everything else planning a CartesianProduct or
  * unconditioned BroadcastNestedLoopJoin is a scale bug. */
class PlanAuditSpec extends SparkSpec {

  private val intendedProducts = Set(
    "join_cross",             // region × nation, constant size
    "tpch_q11", "tpch_q11_sql", // single-row grand-total theta join
    "tpch_q15", "tpch_q15_sql", // single-row max-revenue theta join
    "tpch_q22", "tpch_q22_sql", // single-row avg-balance theta join
    "subq_scalar",            // single-row scalar subquery
    "ml_regress", "ml_classify", // single-row trained-model broadcast × scoring scan
    "presto_set_digest",      // single-row urgent-set digest broadcast × 5 priorities
    "presto_khll",            // single-row urgent/merged sketches broadcast × 5 priorities
    "ann_bruteforce_topk",    // broadcast probes × corpus (map-side scan)
    "ann_ivf_topk",           // broadcast centroids × corpus assignment
    "ann_ivf_fullprobe",      // same centroid-assignment product, all lists probed
    "ann_ivfpq_topk",         // same broadcast(16-centroid codebook) × corpus assignment
    "emb_quantize_int8",
    "emb_kmeans_step",        // broadcast seeds × corpus assignment scan
    "tfidf_top_terms",        // single-row doc-count broadcast join
    "text_unigram_logprob",   // single-row corpus-total broadcast join
    // `<> ALL` (NOT IN) as a PROJECTED value: Spark's null-aware
    // existence join in a projection is a broadcast nested loop over
    // the quantifier's subquery — bounded here (≤50-row broadcast
    // side); the filter-position NOT IN (subq_not_in) stays a
    // null-aware broadcast HASH join and is deliberately unlisted.
    "presto_quantified",
    "presto_hash_counts")     // 1×1 cross of two single-row digest aggregates

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no unintended cartesian") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val hasProduct = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      assert(!hasProduct || intendedProducts(name),
        s"$name plans a product join:\n${plan.linesIterator.filter(l =>
          l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin")).mkString("\n")}")
    }
  }
}
