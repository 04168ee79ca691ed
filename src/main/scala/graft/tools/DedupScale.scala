package graft.tools

import graft.{Sessions, Tables}
import graft.llm.{Corpus, Dedup, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup/text-tier scale-evidence harness — the LAST tier whose 100×
  * claim was argued from the sf0.01→sf0.1 decade alone (SCALING.md)
  * while TPC-H, ANN and streaming all have measured lanes. Generates a
  * deterministic synthetic document corpus at 1×/10×/100× the sf0.1
  * volume (5k → 500k docs) with PLANTED structure, so every banded join
  * does real work AND every result is checkable against closed-form
  * ground truth. The TIMED ACTION of every entry IS the validating
  * aggregate (the AnnScale recall discipline): each rep executes the
  * full operator plan plus a one-row invariant aggregate, so a wrong
  * answer at any scale fails the lane instead of timing beautifully —
  * the round-12 verdict's "validate results AT scale" ask.
  *
  * Corpus (all content from hash(id) — no RNG state, bit-identical
  * re-runs; vocabulary 30k words with a quadratic skew so shingle
  * frequencies are non-uniform like real text, docs 150 words so a
  * single-word mutation keeps Jaccard = 142/154 ≈ 0.922, comfortably
  * above the τ=0.8 near-dup threshold with LSH recall ≈ 1−1e-9):
  * per 100-doc block —
  *  - ids 0–79: unique docs (content seed = doc id);
  *  - ids 80–84: an exact-duplicate cluster (5 identical texts);
  *  - ids 85–89: a near-duplicate cluster (shared seed, each member
  *    mutates ONE word at its own interior position);
  *  - ids 90–99: unique bodies + a BLOCK-LOCAL 30-word boilerplate
  *    suffix (shared 64-char grams for the span ops; block-local so
  *    boilerplate pairs stay O(corpus), never O(corpus²)).
  *
  * Ground truth per block (B = #blocks = 50·scale): 20 near-dup pairs
  * (10 exact-cluster at J=1, 10 near-cluster at J≈0.92), 2 CC
  * components of size 5, incremental parity-split rejections
  * {exact: 2 (ids 81,83), near: 3 (ids 85,87,89)}, and 20 docs whose
  * span-cut text shrinks (the two clusters + the 10 boilerplated).
  * Random cross-doc collisions are negligible by construction (a chance
  * J ≥ 0.8 needs 80% of 148 skew-drawn shingles to coincide; a chance
  * shared 64-char gram needs ~9 identical consecutive words).
  *
  * The asymmetric incremental leg holds the DELTA FIXED (odd docs of
  * every scale-th block ≈ 2.5k docs) while the base grows with the
  * corpus — the production crawl shape; its planted rejections
  * (100 exact / 150 near) are scale-invariant.
  *
  * Running this lane at 100× found and fixed two real scale cliffs
  * (bench/SCALING_DEDUP.md): AQE's compressed-size heuristic flipping
  * the digest/band/shingle joins to driver-killing runtime broadcasts
  * (now size-aware merge-pinned in llm/Dedup), and the 8 GB fork heap
  * starving 32 concurrent aggregation tasks (now 16 GB default).
  */
object DedupScale {

  private val BaseDocs = 5000L // sf0.1 documents volume

  private[graft] def genDocs(spark: SparkSession, n: Long, dir: java.io.File): Unit = {
    val f = new java.io.File(dir, "documents.parquet")
    // Cache key = a fingerprint of the generator itself (the planted-
    // structure SQL + the row count), not mere existence: a reused stale
    // corpus would make the lane's closed-form checks judge the WRONG
    // data. On any generator change the marker mismatches and the corpus
    // regenerates; hand-rolled marker beats a version constant someone
    // forgets to bump.
    val marker = new java.io.File(dir, "_gen_fingerprint")
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$GenSql|${BaseDocs * n}|v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val have =
      if (marker.exists()) new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      else ""
    if (f.exists() && have == want) return
    dir.mkdirs()
    val df = spark.range(BaseDocs * n).select(
      col("id").as("doc_id"),
      expr(GenSql).as("text"))
      .withColumn("lang", lit("en"))
      .withColumn("source", concat(lit("crawl"), col("doc_id") % 7))
      .withColumn("n_chars", length(col("text")).cast("long"))
    df.repartition(32).write.mode("overwrite").parquet(f.getPath)
    java.nio.file.Files.write(marker.toPath, want.getBytes("UTF-8"))
  }

  /** The planted-structure generator expression; hashed into the corpus
    * cache marker so any edit regenerates. */
  private val GenSql =
        """CASE WHEN id % 100 >= 90 THEN
             concat(
               concat_ws(' ', transform(sequence(0, 149), i ->
                 concat('w', CAST(floor(30000 * pow(
                   pmod(hash(id, i, 11), 1000000) / 1000000.0, 2)) AS INT)))),
               ' ',
               concat_ws(' ', transform(sequence(0, 29), i ->
                 concat('b', pmod(hash(id DIV 100, i, 17), 1000000)))))
           ELSE
             concat_ws(' ', transform(sequence(0, 149), i ->
               CASE WHEN id % 100 BETWEEN 85 AND 89 AND i = 10 + 30 * (id % 100 - 85)
                    THEN concat('mut', id)
                    ELSE concat('w', CAST(floor(30000 * pow(
                      pmod(hash(CASE WHEN id % 100 BETWEEN 80 AND 84
                                     THEN id - id % 100 + 80
                                     WHEN id % 100 BETWEEN 85 AND 89
                                     THEN id - id % 100 + 85
                                     ELSE id END, i, 11), 1000000) / 1000000.0,
                      2)) AS INT)) END))
           END"""

  /** Planted-structure embeddings mirroring the document clusters
    * (round 14, verdict Next #5): dim 64, coordinates U(−1, 1) from
    * hash(seed, i). The exact-duplicate cluster (ids 80–84) shares ONE
    * seed — identical vectors, pairwise cos = 1 exactly; the near
    * cluster (85–89) shares a base seed plus a per-doc perturbation
    * U(−0.025, 0.025) per coordinate — pairwise cos ≈ 0.9994 (two
    * perturbations of RMS 0.0144 against a base of RMS 0.577), safely
    * above the probe's τ = 0.95 and below its exact-pair gate 0.9999;
    * everything else is fully per-id random, where a chance cos ≥ 0.95
    * needs ~7.6σ of the 1/√64 cosine spread — ≪ 1 expected false pair
    * even over the 100× corpus's 1.25e11 possible pairs. */
  private val VecDims = 64
  private val VecSql =
    s"""transform(sequence(0, ${VecDims - 1}), i -> cast(
          pmod(hash(CASE WHEN id % 100 BETWEEN 80 AND 84
                         THEN id - id % 100 + 80
                         WHEN id % 100 BETWEEN 85 AND 89
                         THEN id - id % 100 + 85
                         ELSE id END, i, 7), 1000) / 500.0 - 1.0
          + CASE WHEN id % 100 BETWEEN 85 AND 89
                 THEN pmod(hash(id, i, 19), 50) / 1000.0 - 0.025
                 ELSE 0.0 END AS double))"""

  private[graft] def genVecs(spark: SparkSession, n: Long, dir: java.io.File): Unit = {
    val f = new java.io.File(dir, "embeddings.parquet")
    val marker = new java.io.File(dir, "_vec_fingerprint")
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$VecSql|${BaseDocs * n}|v1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val have =
      if (marker.exists()) new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      else ""
    if (f.exists() && have == want) return
    dir.mkdirs()
    spark.range(BaseDocs * n)
      .select(col("id").as("vec_id"), expr(VecSql).as("e"))
      .repartition(32).write.mode("overwrite").parquet(f.getPath)
    java.nio.file.Files.write(marker.toPath, want.getBytes("UTF-8"))
  }

  /** One lane entry: `probe` runs the operator AND returns invariant
    * failures — the probe's single action is what gets timed. */
  private[graft] final case class Probe(name: String, probe: (Tables, Long) => Seq[String])

  private def fails(n: Long, checks: (String, Long, Long)*): Seq[String] =
    checks.collect { case (what, got, want) if got != want =>
      s"x$n $what: got $got want $want" }

  private[graft] val probes: Seq[Probe] = Seq(
    Probe("neardup_minhash", (t, n) => {
      val b = 50 * n
      val r = Dedup.neardupMinhash(t).agg(
        count(lit(1)), count(when(col("jacc") >= 0.999, 1)),
        count(when(col("jacc") < 0.8, 1))).head()
      fails(n, ("minhash pairs", r.getLong(0), 20 * b),
        ("minhash J=1 pairs", r.getLong(1), 10 * b),
        ("minhash sub-threshold rows", r.getLong(2), 0))
    }),
    Probe("neardup_jaccard_prefix", (t, n) => {
      val b = 50 * n
      val r = Dedup.neardupJaccardPrefix(t).agg(
        count(lit(1)), count(when(col("jacc") < 0.8, 1))).head()
      fails(n, ("prefix pairs", r.getLong(0), 20 * b),
        ("prefix sub-threshold rows", r.getLong(1), 0))
    }),
    Probe("neardup_simhash", (t, n) => {
      // same planted truth as minhash: the two-level (simhash chunk,
      // MinHash band) bucket key must recover every J ≥ 0.8 pair —
      // exact clusters at J = 1, near clusters at J ≈ 0.92 (hd ≤ 15
      // covers the measured token-simhash noise) — with the exact
      // Jaccard verification keeping precision 1.
      val b = 50 * n
      val r = Dedup.neardupSimhash(t).agg(
        count(lit(1)), count(when(col("jacc") >= 0.999, 1)),
        count(when(col("jacc") < 0.8, 1))).head()
      fails(n, ("simhash pairs", r.getLong(0), 20 * b),
        ("simhash J=1 pairs", r.getLong(1), 10 * b),
        ("simhash sub-threshold rows", r.getLong(2), 0))
    }),
    Probe("neardup_embedding", (t, n) => {
      // the embedding tier's scale path (sign-LSH with log2(N)-scaled
      // bits, IVF off — Dedup.neardupEmbeddingAtScale documents why the
      // fixed-16-list IVF union cannot survive 100×): per block, the 5
      // identical vectors give 10 pairs at cos = 1 and the 5 perturbed
      // ones 10 pairs at cos ≈ 0.9994 — recovered exactly, nothing
      // below τ.
      val b = 50 * n
      val vecs = t.embeddings.select(col("vec_id"), col("e"))
      val r = Dedup.neardupEmbeddingAtScale(t.spark, vecs, 0.95, BaseDocs * n)
        .agg(count(lit(1)), count(when(col("cos") >= 0.9999, 1)),
          count(when(col("cos") < 0.95, 1))).head()
      fails(n, ("embedding pairs", r.getLong(0), 20 * b),
        ("embedding identical pairs", r.getLong(1), 10 * b),
        ("embedding sub-threshold rows", r.getLong(2), 0))
    }),
    Probe("dedup_incremental", (t, n) => {
      val b = 50 * n
      val m = Dedup.dedupIncremental(t)
        .groupBy(col("reason")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fails(n, ("incremental exact rejects", m.getOrElse("exact", 0L), 2 * b),
        ("incremental near rejects", m.getOrElse("near", 0L), 3 * b))
    }),
    Probe("dedup_incremental_asym", (t, n) => {
      // fixed delta (odd docs of every n-th block), base grows with the
      // corpus: rejections are scale-INVARIANT — 50 delta blocks × (2
      // exact + 3 near)
      val m = Dedup.dedupIncrementalSplit(t,
          (expr("doc_id DIV 100") % n === 0) && col("doc_id") % 2 === 1,
          col("doc_id") % 2 === 0)
        .groupBy(col("reason")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      fails(n, ("asym exact rejects", m.getOrElse("exact", 0L), 100),
        ("asym near rejects", m.getOrElse("near", 0L), 150))
    }),
    Probe("decontaminate_asym", (t, n) => {
      // the decontamination production shape: a FIXED eval suite (one
      // block-0 boilerplated doc) against a corpus growing 10×/leg.
      // Boilerplate is block-local, so ground truth is scale-invariant:
      // exactly the other 9 boilerplated docs of block 0 match, each on
      // exactly the 28 word-3-grams of the 30-word shared suffix
      // (junction grams carry doc-specific body words and never match;
      // a chance cross-block triple over the 10⁶ b-vocabulary is
      // ~1e-18 per position — widened from 10³ in round 16, where the
      // 100-block eval axis measured ONE real cross-block collision).
      val r = TextStats.decontaminateAgainst(
          t.documents.filter(col("doc_id") =!= 90),
          t.documents.filter(col("doc_id") === 90))
        .agg(count(lit(1)), count(when(col("n_contaminated") === 28, 1))).head()
      fails(n, ("decontaminated docs", r.getLong(0), 9),
        ("docs at 28 shared grams", r.getLong(1), 9))
    }),
    Probe("dedup_cluster_cc", (t, n) => {
      val b = 50 * n
      val r = Corpus.dedupClusterCC(t).agg(
        count(lit(1)), countDistinct(col("component")),
        count(when(col("cluster_n") =!= 5, 1))).head()
      fails(n, ("cc nodes", r.getLong(0), 10 * b),
        ("cc components", r.getLong(1), 2 * b),
        ("cc wrong-size clusters", r.getLong(2), 0))
    }),
    Probe("text_dup_span_cut", (t, n) => {
      val b = 50 * n
      val r = TextStats.dupSpanCut(t)
        .join(t.documents.select(col("doc_id"), col("n_chars")), "doc_id")
        .agg(count(lit(1)),
          count(when(length(col("cleaned_text")) < col("n_chars"), 1))).head()
      fails(n, ("span-cut corpus rows", r.getLong(0), BaseDocs * n),
        ("span-cut shrunken docs", r.getLong(1), 20 * b))
    }))

  final case class LaneEntry(name: String, times: Seq[Double])
  final case class LaneResult(entries: Seq[LaneEntry], superlinear: Seq[String],
                              validationFailures: Seq[String], scales: Seq[Long],
                              loads: Seq[LaneEntry] = Nil, healed: Seq[String] = Nil,
                              steals: Seq[LaneEntry] = Nil,
                              skipped: Map[String, String] = Map.empty,
                              contended: Map[String, String] = Map.empty,
                              calibration: Seq[Double] = Nil,
                              envSuspect: Map[String, String] = Map.empty)

  /** Committed lane reference (bench/dedup_scale.json — the
    * machine-readable twin of SCALING_DEDUP.md's results table, the
    * exact analogue of bench/tpch_sweep.json for the TPC-H spots).
    * BENCH_r16 shipped a superlinear flag for a leg the box weather
    * almost certainly caused, and it was unfalsifiable from the
    * artifact because the lane healed against nothing committed and
    * journaled no loads — this file is what the heal now compares to. */
  private def committedLane(): (Seq[Long], Map[String, Seq[Double]]) =
    LaneDiscipline.committed("bench/dedup_scale.json", "dedup-scale")

  /** Runs the lane; shared by the standalone main and the Bench artifact
    * emitter. `budgetSecs` bounds total lane wall (>1× legs are skipped
    * once exceeded, like the TPC-H lane — skipped legs record NaN). */
  def run(spark: SparkSession, budgetSecs: Double,
          scales: Seq[Long] = Seq(1L, 10L, 100L),
          reps: Map[Long, Int] = Map(1L -> 2, 10L -> 2).withDefaultValue(1),
          only: Option[String] = None): LaneResult = {
    val lane0 = System.nanoTime()
    def spent = (System.nanoTime() - lane0) / 1e9
    // calibration probe (round 19): sampled at lane start / pre-heal /
    // lane end; the WORST ratio adjudicates quiet-steal over-2× legs
    val calibs = Seq.newBuilder[Double]
    calibs += LaneDiscipline.calibrationRatio(spark, "dedup-scale")
    val dirs = scales.map { n =>
      val d = new java.io.File(s"target/dedup_scale/x$n")
      genDocs(spark, n, d)
      genVecs(spark, n, d)
      n -> d.getPath
    }
    // Probe filter for local iteration (the TPCH lane's _ONLY analogue):
    // SPARK_GRAFT_DEDUP_ONLY='span' runs just the matching probes; the
    // `only` parameter is the same filter for in-process callers (the
    // ScaleLaneSpec ledger test runs ONE probe — r18 advice: the comment
    // claimed a bound the code didn't implement).
    val onlyRe = only.orElse(sys.env.get("SPARK_GRAFT_DEDUP_ONLY")).map(_.r)
    val probes = DedupScale.probes.filter(p =>
      onlyRe.forall(_.findFirstIn(p.name).isDefined))
    val allFails = Seq.newBuilder[String]
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // Lane-local load floor (round 18): the calmest 1-min load any rep
    // of THIS lane run observed — the lane's own ~32-thread imprint is
    // in every observation, so load > floor + 16 means half the box is
    // doing foreign work on top (the Bench spot trigger, ported). Gives
    // the contended verdict a second signal for bursts whose steal%
    // sits just under the gate (observed: a jaccard_prefix 100x leg at
    // 2.9x committed, load 28, steal 1.2 - visible co-tenant load, not
    // hypervisor steal).
    var laneLoadFloor = Double.NaN
    def noteLoad(l: Double): Unit =
      if (!l.isNaN && (laneLoadFloor.isNaN || l < laneLoadFloor)) laneLoadFloor = l
    // returns (seconds, 1-min loadavg at leg end) — the load is the
    // TPC-H spot journal discipline ported here (round-17 verdict ask
    // #1): a slow leg with a high journaled load is contention, a slow
    // leg at quiet load is a regression, and the artifact can now tell
    // them apart
    def runLeg(p: Probe, n: Long, dir: String, tag: String): (Double, Double, Double) = {
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(256L, 32L * math.max(1L, n / 4)).toString)
      val t = Tables(spark, dir)
      val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val jiff0 = LaneDiscipline.cpuJiffies
      val t0 = System.nanoTime()
      allFails ++= p.probe(t, n)
      val dt = (System.nanoTime() - t0) / 1e9
      val load = osBean.getSystemLoadAverage
      // steal% = hypervisor-stolen cycles during THIS leg — the signal
      // that separates a noisy VM neighbor from a real regression when
      // the loadavg (largely the lane's own 32-thread imprint) cannot
      (spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore)
        .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(blocking = false)))
      val steal = LaneDiscipline.stealPct(jiff0, LaneDiscipline.cpuJiffies)
      noteLoad(load)
      System.err.println(
        f"[dedup-scale] x$n%-4d ${p.name}%-24s $dt%7.2f s ($tag, load $load%.1f, steal $steal%.1f%%)")
      (dt, load, steal)
    }
    try {
    // Shuffle partitions sized to the corpus (inside runLeg — the
    // brief's "partitions must fit executor memory at the target SF"
    // discipline): 32 is right for 5k docs, but at 500k docs the
    // 135M-row anchor aggregation would hand every one of 32
    // concurrent tasks a multi-hundred-MB hash map simultaneously —
    // the lane OOM'd before this derivation. AQE coalesces the stages
    // that end up small, so oversizing costs nothing. Every probe
    // fully consumes its result (one collected aggregate row), so
    // whatever it persisted — CC loop checkpoints, span anchor
    // blocks, minhash signatures — is dead weight afterwards; runLeg
    // releases it eagerly rather than waiting on the GC-driven
    // ContextCleaner (at 100× the residue of earlier probes OOM'd
    // later ones).
    // per-(probe, scale) 1-min loadavg journal at the KEPT (fastest)
    // rep — heals below keep it consistent with whichever rep ships
    val loadAt = scala.collection.mutable.LinkedHashMap(
      probes.map(p => p.name -> Array.fill(scales.length)(Double.NaN)): _*)
    val stealAt = scala.collection.mutable.LinkedHashMap(
      probes.map(p => p.name -> Array.fill(scales.length)(Double.NaN)): _*)
    // Explicit skip ledger (round 18, verdict ask #3): a configured leg
    // that never ran records WHY instead of shipping a bare null.
    val skipped = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def legBest(p: Probe, i: Int, graceSecs: Double = 0.0, extraReps: Int = 0): Double = {
      val (n, dir) = dirs(i)
      var best = Double.NaN
      for (r <- 1 to reps(n) + extraReps if !(spent > budgetSecs + graceSecs && n > 1)) {
        val (dt, ld, st) = runLeg(p, n, dir, s"rep $r")
        if (best.isNaN || dt < best) {
          best = dt; loadAt(p.name)(i) = ld; stealAt(p.name)(i) = st
        }
      }
      if (best.isNaN) skipped(s"${p.name}@${n}x") = "budget"
      best
    }
    // Two-phase schedule (round-15 ask): BENCH_r14's budget ran out
    // before text_dup_span_cut's ~105 s 100× leg — the lane's STEEPEST
    // entry was exactly the one that recorded null. Phase 1 runs every
    // probe's sub-max legs (cheap; they seed the ordering); phase 2
    // runs the max-scale legs most-expensive-first, using each probe's
    // measured second-largest-scale time as the cost proxy, so when a
    // budget does run out it starves the cheapest legs, not the one
    // the lane exists to re-evidence.
    val times = scala.collection.mutable.LinkedHashMap(
      probes.map(p => p.name -> Array.fill(scales.length)(Double.NaN)): _*)
    val maxIdx = scales.length - 1
    for (p <- probes; i <- 0 until maxIdx) times(p.name)(i) = legBest(p, i)
    // Previously starved legs first (round 19, verdict ask #5): a leg
    // skipped/contended in the LAST run jumps the max-scale queue, so
    // the same leg cannot land in the ledger twice in a row merely
    // because the schedule always reaches it after the budget dies.
    val pending = LaneDiscipline.pendingLegs("dedup")
    val steepestFirst = probes.sortBy { p =>
      val t = if (maxIdx == 0) 0.0 else times(p.name)(maxIdx - 1)
      (if (pending.contains(s"${p.name}@${scales(maxIdx)}x")) 0 else 1,
       if (t.isNaN) 0.0 else -t) // unmeasured sorts last within its tier
    }
    // Grace pool (round 17): on a contended box ONE expensive leg can
    // blow the whole budget (observed: simhash@100× at 168 s vs its
    // committed 62 under loadavg 28 consumed it, and the cheap
    // trailing legs — including neardup_embedding@100×, exactly the
    // leg the round-17 re-evidence ask cares about — recorded null).
    // A cheap remaining leg still runs, bounded: legs whose committed
    // max-scale value is ≤ 20 s draw from a one-shot overshoot pool of
    // min(120 s, 25% of budget), so the worst case stays bounded while
    // a contended expensive leg can no longer starve the cheap tail.
    val (commScales0, committed0) = committedLane()
    var gracePool = math.min(120.0, budgetSecs * 0.25)
    val commMaxIdx = commScales0.indexOf(scales(maxIdx))
    for (p <- steepestFirst) {
      val commCost = if (commMaxIdx < 0) Double.NaN
        else committed0.get(p.name).flatMap(_.lift(commMaxIdx)).getOrElse(Double.NaN)
      // A cheap leg is admitted while the pool covers its committed
      // cost; the pool is then charged the leg's ACTUAL wall (round-18
      // advice fix: charging commCost while granting 2× commCost of
      // headroom let real overshoot reach ~2× the documented bound).
      // The pool going negative stops further admissions, so overshoot
      // is bounded by pool + one contended leg's overrun — the overrun
      // itself is unavoidable (a running Spark job can't be preempted).
      val admit = spent > budgetSecs && !commCost.isNaN && commCost <= 20.0 &&
        gracePool >= commCost
      val spentBefore = spent
      val grace = if (admit) spentBefore - budgetSecs + commCost * 2 else 0.0
      // Cheap max-scale legs run min-of-2 (round 18): the flag-prone
      // entries are exactly the CHEAP shuffle-heavy ones whose
      // committed decade already flirts with the 12× threshold
      // (neardup_embedding: committed decade 7.1×, single burst rep at
      // steal just under the gate shipped a 20.6× flag) — a second rep
      // costs ~10-15 s quiet and gives the min three samples with the
      // heal. Expensive legs keep single-rep for budget.
      val extra = if (!commCost.isNaN && commCost <= 15.0 && spent <= budgetSecs) 1 else 0
      times(p.name)(maxIdx) = legBest(p, maxIdx, grace, extra)
      if (admit) gracePool -= (spent - spentBefore)
    }
    val rows = probes.map(p => LaneEntry(p.name, times(p.name).toSeq))
    // Super-linear flag: a decade (10× docs; planted structure and pair
    // counts scale exactly 10×) through 32 fixed cores should cost well
    // under 12×; sub-0.5 s legs are noise-floored. (Tightened 15× → 12×
    // in round 14 after profiling the worst entry: span_cut's steepest
    // decade is 8.8× and every stage of it is accounted linear —
    // SCALING_DEDUP.md — so a 12× decade now means something is wrong,
    // not merely saturated.)
    def flag(es: Seq[LaneEntry]): Seq[String] =
      es.flatMap(e => LaneDiscipline.superlinearFlags(e.name, e.times, scales))
    // Self-heal (round 13, extended round 17): the >1× legs are
    // single-rep for budget, so a transient — a cold page cache on the
    // first 100× leg, a GC wall inherited from whatever the shared
    // bench JVM ran before the lane — can print one slow number and cry
    // super-linear where the committed reference run is comfortably
    // sub-linear. A scaling claim should not flip on one sample: re-run
    // ONLY the offending leg of each flagged entry once (min-of-2, same
    // as the bench's over_gate heal) and let the flag survive only if
    // it reproduces. Round 17 adds the TPC-H spots' committed-reference
    // trigger: a leg over 2× its bench/dedup_scale.json value is
    // suspect even when the decade ratio stays under the 12× flag
    // (BENCH_r16's neardup_embedding@100× shipped at 2.9× committed and
    // 26× decade with no committed heal to catch it). Capped extra
    // spend; a genuinely slow entry stays flagged — twice as credibly.
    calibs += LaneDiscipline.calibrationRatio(spark, "dedup-scale")
    val (commScales, committed) = committedLane()
    val healCap = spent + math.min(240.0, budgetSecs * 0.5)
    val healEvents = Seq.newBuilder[String]
    val contendedM = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val t2m = scala.collection.mutable.LinkedHashMap(
      rows.map(e => e.name -> e.times.toArray): _*)
    // Collect every suspect leg up front and heal WORST-RATIO-FIRST
    // (round 18): the heal cap is a shared wallet, and iterating in
    // probe-declaration order let early moderate suspects drain it
    // before a later, worse leg got its re-run (observed: three ~100 s
    // heals consumed the 240 s cap and dedup_incremental@100× at 2.25×
    // committed shipped unhealed). Severity = ratio over the committed
    // reference (decade-only suspects rank by decade-ratio/12).
    val suspects = (for {
      e <- rows
      t2 = t2m(e.name)
      i <- t2.indices if !t2(i).isNaN
    } yield {
      val decadeRatio =
        if (i > 0 && !t2(i - 1).isNaN && t2(i - 1) >= 0.5) t2(i) / t2(i - 1) else 0.0
      val commIdx = commScales.indexOf(scales(i))
      val commRatio = (for {
        c <- committed.get(e.name).flatMap(_.lift(commIdx)) if commIdx >= 0 && c >= 0.5
      } yield t2(i) / c).getOrElse(0.0)
      (e.name, i, math.max(commRatio / 2.0, decadeRatio / 12.0))
    }).filter(_._3 > 1.0).sortBy(-_._3)
    for ((name, i, _) <- suspects if spent < healCap) {
      val t2 = t2m(name)
      val p = probes.find(_.name == name).get
      val (n, dir) = dirs(i)
      healEvents += s"$name@${n}x"
      // a contended kept rep waits out a bounded backoff first, so a
      // short co-tenant burst can't land on both reps (round 18)
      if (LaneDiscipline.contendedRep(stealAt(name)(i), loadAt(name)(i), laneLoadFloor))
        LaneDiscipline.backoff("dedup-scale")
      val (dt, ld, st) = runLeg(p, n, dir, "heal")
      if (dt < t2(i)) {
        t2(i) = dt; loadAt(name)(i) = ld; stealAt(name)(i) = st
      }
    }
    val healed = rows.map { e =>
      val t2 = t2m(e.name)
      // Contended-leg conversion (round 18): a leg still over 2× its
      // committed reference whose kept rep journaled contention ships
      // as a named non-number, never as a measurement — and can no
      // longer fire a super-linear flag (r17's dedup_superlinear was
      // contention-attributed but shipped flagged in the artifact).
      for ((i, reason) <- LaneDiscipline.contendedLegs(t2, loadAt(e.name),
          stealAt(e.name), scales, commScales, committed.get(e.name))) {
        contendedM(s"${e.name}@${scales(i)}x") = reason
        t2(i) = Double.NaN
      }
      LaneEntry(e.name, t2.toSeq)
    }
    val loadRows = probes.map(p => LaneEntry(p.name, loadAt(p.name).toSeq))
    val stealRows = probes.map(p => LaneEntry(p.name, stealAt(p.name).toSeq))
    calibs += LaneDiscipline.calibrationRatio(spark, "dedup-scale")
    val calibration = calibs.result()
    val calibMax = calibration.filterNot(_.isNaN)
      .foldLeft(Double.NaN)((a, b) => if (a.isNaN || b > a) b else a)
    val envSuspect = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (e <- healed;
         (i, reason) <- LaneDiscipline.envSuspectLegs(t2m(e.name), stealAt(e.name),
           scales, commScales, committed.get(e.name), calibMax))
      envSuspect(s"${e.name}@${scales(i)}x") = reason
    LaneDiscipline.writePendingLegs("dedup", skipped.keys ++ contendedM.keys)
    LaneResult(healed, flag(healed), allFails.result().distinct, scales,
      loadRows, healEvents.result(), stealRows, skipped.toMap, contendedM.toMap,
      calibration, envSuspect.toMap)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  // ------------------------------------------- decontamination eval axis
  final case class EvalAxisLeg(name: String, evalDocs: Long, path: String,
                               sec: Double, load: Double = Double.NaN)

  /** Eval-SUITE-size axis for decontamination (round-14 verdict Next
    * #5): the `decontaminate_asym` probe holds the eval suite at ONE
    * doc, but real suites run 10³–10⁵ docs and the broadcast gram set
    * grows with them. Against the lane's 100× corpus (500k docs) this
    * measures suites of 1 / 100 / 10,000 docs through BOTH physical
    * paths — the exact-gram broadcast and the bloom-prefilter fallback
    * (TextStats.decontaminateAgainst) — with closed-form ground truth:
    * each eval "benchmark doc" is the 30-word block-local boilerplate
    * SUFFIX of a boilerplated id (90, and 91 for the 10k suite) of the
    * first E blocks — the realistic suite shape (short benchmark texts,
    * not full documents), and the reason the truth is exact: pure-b
    * eval grams can only match the pure-b suffix grams of the blocks'
    * boilerplated docs, so exactly the REMAINING boilerplated docs of
    * those blocks match, each on exactly the suffix's 28 word-3-grams
    * (over the 10⁶ b-vocabulary a cross-block gram collision is ~4e-10
    * per axis — the 10³ vocabulary this replaced measurably collided
    * once in 100 blocks). The timed action is the validating aggregate,
    * lane discipline. Numbers + the broadcast-fit threshold they
    * calibrate land in bench/SCALING_DEDUP.md. */
  def decontaminateEvalAxis(spark: SparkSession, budgetSecs: Double,
                            scale: Long = 100L): (Seq[EvalAxisLeg], Seq[String]) = {
    val d = new java.io.File(s"target/dedup_scale/x$scale")
    genDocs(spark, scale, d)
    val blocks = BaseDocs * scale / 100
    // the e100/e10000 suite expectations are closed forms over >=5000
    // blocks; a smaller corpus would fail validation on a CORRECT run
    require(blocks >= 5000,
      s"eval axis needs >=5000 blocks (scale >= 100 at the default corpus), got $blocks")
    val t0 = System.nanoTime(); def spent = (System.nanoTime() - t0) / 1e9
    val legs = Seq.newBuilder[EvalAxisLeg]
    val failsB = Seq.newBuilder[String]
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.min(256L, 32L * math.max(1L, scale / 4)).toString)
    try {
      val t = Tables(spark, d.getPath)
      val block = expr("doc_id DIV 100")
      // eval text = the 30-word boilerplate suffix (words 151..180)
      val suffixText = concat_ws(" ", slice(split(trim(col("text")), "\\s+"), 151, 30))
      // untimed warmup: one full corpus-gram pass (page cache + codegen
      // JIT) so the FIRST timed leg doesn't read 2× slow and skew the
      // broadcast-vs-bloom comparison (the GeoScale discipline)
      TextStats.decontaminateAgainst(
          t.documents.filter(col("doc_id") =!= 90),
          t.documents.filter(col("doc_id") === 90).select(col("doc_id"), suffixText.as("text")),
          forcePath = Some("broadcast"))
        .agg(count(lit(1))).head()
      // (tag, eval predicate, #eval docs, expected contaminated docs)
      val suites = Seq(
        ("e1", col("doc_id") === 90, 1L, 9L),
        ("e100", col("doc_id") % 100 === 90 && block < 100, 100L, 900L),
        ("e10000", (col("doc_id") % 100).isin(90, 91) && block < 5000, 10000L, 8L * 5000))
      // Sized legs run min-of-2 (budget-permitting) with a per-rep
      // loadavg journal (round-17 ask #6): these numbers feed the
      // committed broadcast-to-bloom threshold claim (~2M grams), so a
      // contended single rep must not be the shipped evidence — the
      // same discipline as the TPC-H spots and the dedup lane.
      val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      for ((tag, isEval, nEval, expect) <- suites; path <- Seq("broadcast", "bloom")) {
        var best = Double.NaN
        var bestLoad = Double.NaN
        for (rep <- 1 to 2 if spent <= budgetSecs && (rep == 1 || !best.isNaN)) {
          val tA = System.nanoTime()
          val r = TextStats.decontaminateAgainst(
              t.documents.filter(!isEval),
              t.documents.filter(isEval).select(col("doc_id"), suffixText.as("text")),
              forcePath = Some(path))
            .agg(count(lit(1)), count(when(col("n_contaminated") === 28, 1))).head()
          val dt = (System.nanoTime() - tA) / 1e9
          val ld = osBean.getSystemLoadAverage
          if (r.getLong(0) != expect) failsB +=
            s"decon $tag/$path: got ${r.getLong(0)} contaminated want $expect"
          if (r.getLong(1) != expect) failsB +=
            s"decon $tag/$path: got ${r.getLong(1)} at 28 grams want $expect"
          if (best.isNaN || dt < best) { best = dt; bestLoad = ld }
          System.err.println(
            f"[decon-eval] x$scale $tag%-7s $path%-9s $dt%7.2f s (rep $rep, load $ld%.1f)")
        }
        if (!best.isNaN) legs += EvalAxisLeg(tag, nEval, path, best, bestLoad)
      }
      // Cap-crossing leg (round 16): a FULL-TEXT 20k-doc suite (~2.7M
      // distinct grams from the skewed body vocabulary) sits PAST the
      // 256 MB broadcast cap — assert `auto` actually flips to bloom at
      // a measured size, and pin PATH EQUIVALENCE there: at a suite
      // size where chance body-gram matches are expected behavior there
      // is no closed form, but the two physical paths must produce
      // IDENTICAL (doc, count) sets — exact, oracle-free.
      if (spent <= budgetSecs) {
        val isEval = col("doc_id") % 100 < 4 && block < 5000
        val evalDf = t.documents.filter(isEval)
        val trainDf = t.documents.filter(!isEval)
        val chosen = TextStats.decontaminateAutoPath(evalDf)
        if (chosen != "bloom")
          failsB += s"decon e20k_fulltext: auto chose '$chosen', want bloom past the cap"
        val tA = System.nanoTime()
        // localCheckpoint: one corpus pass per path; the count and the
        // two exceptAll comparisons then reuse the materialized results
        val bcast = TextStats.decontaminateAgainst(trainDf, evalDf,
          forcePath = Some("broadcast")).localCheckpoint(true)
        val bloom = TextStats.decontaminateAgainst(trainDf, evalDf,
          forcePath = Some("bloom")).localCheckpoint(true)
        val nB = bloom.count()
        val diff = bloom.exceptAll(bcast).count() + bcast.exceptAll(bloom).count()
        val dt = (System.nanoTime() - tA) / 1e9
        val ld = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        if (nB == 0) failsB += "decon e20k_fulltext: zero contaminated docs (vacuous)"
        if (diff != 0) failsB += s"decon e20k_fulltext: paths diverge on $diff rows"
        legs += EvalAxisLeg("e20k_fulltext", 20000L, "both+equiv", dt, ld)
        System.err.println(
          f"[decon-eval] x$scale e20k_fulltext both-paths+equivalence $dt%7.2f s " +
          s"(auto=$chosen, contaminated=$nB)")
      }
      (legs.result(), failsB.result())
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder(master = "local[32]", appName = "graft-dedup-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--eval-axis-only")) {
      val (legs, fails) = decontaminateEvalAxis(spark, budgetSecs = 1e9)
      legs.foreach(l => println(f"${l.name}%-8s ${l.evalDocs}%6d docs ${l.path}%-9s ${l.sec}%7.2f s"))
      println(s"eval-axis validation: ${if (fails.isEmpty) "ALL PASS" else fails.mkString("; ")}")
      spark.stop(); return
    }
    val scales = if (args.contains("--small")) Seq(1L, 10L) else Seq(1L, 10L, 100L)
    val r = run(spark, budgetSecs = 1e9, scales = scales)
    println("| entry | " + scales.map(n => s"${n}x (${BaseDocs * n / 1000}k docs)")
      .mkString(" | ") + " | " + scales.sliding(2).map(p => s"${p(0)}->${p(1)} ratio")
      .mkString(" | ") + " |")
    println("|---" * (scales.size * 2) + "|")
    r.entries.foreach { e =>
      val ratios = e.times.sliding(2).map {
        case Seq(a, b) => f"${b / a}%.1fx"
        case _ => "-"
      }.mkString(" | ")
      println(s"| ${e.name} | " + e.times.map(t => f"$t%.2f").mkString(" | ") +
        s" | $ratios |")
    }
    println(s"superlinear: ${if (r.superlinear.isEmpty) "NONE" else r.superlinear.mkString(", ")}")
    println(s"calibration ratios: " +
      r.calibration.map(c => if (c.isNaN) "n/a" else f"$c%.2f").mkString("/"))
    if (r.envSuspect.nonEmpty)
      println(s"ENV-SUSPECT (number kept): ${r.envSuspect.mkString(", ")}")
    if (r.contended.nonEmpty)
      println(s"CONTENDED (unmeasured): ${r.contended.mkString(", ")}")
    if (r.skipped.nonEmpty) println(s"skipped: ${r.skipped.mkString(", ")}")
    println(s"validation: ${if (r.validationFailures.isEmpty) "ALL PASS"
      else r.validationFailures.mkString("; ")}")
    // --no-eval-axis: a targeted probe re-run (SPARK_GRAFT_DEDUP_ONLY)
    // doesn't need the decontamination eval-suite axis sweep
    if (!args.contains("--small") && !args.contains("--no-eval-axis")) {
      val (legs, fails) = decontaminateEvalAxis(spark, budgetSecs = 1e9)
      println("| eval suite | docs | broadcast s | bloom s |")
      println("|---|---|---|---|")
      legs.groupBy(_.name).toSeq.sortBy(_._2.head.evalDocs).foreach { case (tag, ls) =>
        def of(p: String) = ls.find(_.path == p).map(l => f"${l.sec}%.2f").getOrElse("-")
        println(s"| $tag | ${ls.head.evalDocs} | ${of("broadcast")} | ${of("bloom")} |")
      }
      println(s"eval-axis validation: ${if (fails.isEmpty) "ALL PASS" else fails.mkString("; ")}")
    }
    spark.stop()
  }
}
