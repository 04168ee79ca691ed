package graft.tools

/** Shared pieces of the scale-lane spot discipline (round 17): every
  * lane that ships numbers in the official artifact journals a 1-min
  * loadavg per kept leg and heals legs that exceed 2× their committed
  * reference (bench/<lane>_scale.json), so a slow artifact leg is
  * auditable as contention-vs-regression from the artifact alone —
  * the policy BENCH_r16's unfalsifiable `neardup_embedding@100×` flag
  * forced onto the dedup lane, now uniform across lanes.
  */
object LaneDiscipline {

  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean

  /** 1-minute system loadavg (NaN where the platform can't report —
    * the MXBean signals that as -1.0, which would otherwise sail past
    * every downstream isNaN guard and journal as a concrete load). */
  def loadavg: Double = {
    val l = osBean.getSystemLoadAverage
    if (l < 0) Double.NaN else l
  }

  /** 5-minute system loadavg (/proc/loadavg field 2; NaN off-Linux).
    * Journaled alongside the 1-min value because the two together
    * distinguish contention SHAPES the 1-min value alone cannot: a
    * sustained co-tenant burst that ended a minute before a rep leaves
    * the 1-min average looking quiet while the 5-min average still
    * carries it (the r17 preview shipped a 2.8x entry at 1-min loads
    * 1.3-4.3 on a box whose 15-min load was 15.5). */
  def loadavg5: Double =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      txt.split("\\s+")(1).toDouble
    } catch { case _: Exception => Double.NaN }

  /** (steal, total) CPU jiffies since boot (/proc/stat cpu line).
    * Steal is the hypervisor-level signal loadavg CANNOT see: this box
    * measurably runs as a VM with a noisy neighbor (round-17
    * investigation: shuffle-heavy dedup legs swung 94–184 s across a
    * day whose committed values minhash reproduced EXACTLY — classic
    * stolen-cycles shape, invisible in 1-min/5-min loads). The total
    * sums only the first 8 fields (user..steal): guest/guest_nice are
    * already folded into user/nice by the kernel, so including them
    * would double-count guest time and understate steal%. */
  def cpuJiffies: Option[(Long, Long)] =
    try {
      val cols = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")), "UTF-8")
        .linesIterator.next().split("\\s+").drop(1).map(_.toLong)
      Some((if (cols.length > 7) cols(7) else 0L, cols.take(8).sum))
    } catch { case _: Exception => None }

  /** Percent of CPU time stolen by the hypervisor between two
    * [[cpuJiffies]] snapshots; NaN when unavailable. */
  def stealPct(before: Option[(Long, Long)], after: Option[(Long, Long)]): Double =
    (before, after) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        100.0 * (s1 - s0) / (t1 - t0)
      case _ => Double.NaN
    }

  /** Steal% above which a kept rep counts as CONTENDED (round 18 — the
    * verdict's "make the steal journal a gate, not just a record"): the
    * r17 differential investigation measured quiet-box steal ≈ 0–0.5%
    * and burst steal 3–16.6%, so 1.5 splits the two regimes with margin
    * on both sides. SPARK_GRAFT_STEAL_GATE tunes; <= 0 disables gating
    * (the journals always ship regardless). */
  val StealGate: Double =
    sys.env.get("SPARK_GRAFT_STEAL_GATE").map(_.toDouble).getOrElse(1.5)

  /** Contention verdict for a kept rep: hypervisor steal above the gate,
    * or a 1-min loadavg more than half the box's 32 cores above the
    * run's own floor (foreign work on top of the lane's imprint — the
    * r15-calibrated spot-heal trigger). Either alone marks the rep.
    * `gate` defaults to [[StealGate]]; explicit in specs. */
  def contendedRep(steal: Double, load: Double, loadFloor: Double,
                   gate: Double = StealGate): Boolean =
    (gate > 0 && !steal.isNaN && steal > gate) ||
      (!load.isNaN && !loadFloor.isNaN && load > loadFloor + 16.0)

  /** Human/JSON-safe reason string for a contended-leg record. */
  def contendedReason(sec: Double, load: Double, steal: Double): String =
    f"contended sec=$sec%.2f load=$load%.1f steal=$steal%.1f%%"

  /** Bounded sleep before a contention retry, so a short co-tenant
    * burst can pass instead of landing on both reps (the r17 failure
    * mode: min-of-2 is no defense when both reps sit inside one
    * multi-minute burst). Logged so the artifact's wall time is
    * accountable. SPARK_GRAFT_BACKOFF=0 disables (CI/spec runs). */
  def backoff(tag: String, secs: Double = 15.0): Unit = {
    val s = sys.env.get("SPARK_GRAFT_BACKOFF").map(_.toDouble).getOrElse(secs)
    if (s > 0) {
      System.err.println(f"[$tag] contended rep - backing off $s%.0f s before retry")
      Thread.sleep((s * 1000).toLong)
    }
  }

  /** Bench over-gate SOFT breach rule (round 18, verdict ask #2): over
    * 2× the per-query baseline AND more than 0.25 s above it in
    * absolute terms — mirrors the superlinear flags' noise floor.
    * r17's artifact went rc=1 on a 61 ms excess over a 60 ms baseline;
    * a genuine 2× regression on a ≥0.25 s entry still trips. Soft
    * breaches target heal re-runs and are journaled
    * (`over_gate_soft`); the artifact's exit code gates on
    * [[overGateBreachNorm]] below. */
  def overGateBreach(best: Double, baseline: Double): Boolean =
    best > 2.0 * baseline && best - baseline > 0.25

  /** Bench over-gate HARD breach rule (round 18, second calibration):
    * the soft rule normalized by the RUN's median baseline ratio `m`,
    * with the lanes' 0.5 s absolute noise floor. Motivation, measured
    * the same day the soft rule shipped: the box has a degraded mode —
    * run-wide median ratio 1.32 over 241 entries, sub-0.3 s entries
    * inflated to 3.3×, while kept-rep steal stayed under 0.9% and
    * loads under 6 — that no per-rep journal can flag and min-of-7
    * cannot ride out. A CODE regression is differential (one entry
    * moves against the run's own distribution); uniform inflation is
    * environment. So: breach iff best > 2×baseline×m AND
    * best − baseline×m > 0.5 s (the superlinearFlags floor). `m` is
    * clamped to ≥ 1 so a fast run never tightens the gate, and the
    * caller journals it (`ratio_median`) so the normalization is
    * auditable from the artifact.
    *
    * Round 19 (r18 advice, medium): `m` is also clamped ABOVE at
    * [[RatioMedianCap]]. Unbounded, a UNIFORM code regression (a global
    * codegen/planner regression inflating most entries ~equally) raises
    * the run median itself and the gate could never fire at any
    * magnitude. The cap is calibrated to the measured degraded-box band
    * (run-median 1.12–1.32 across the round-18 calibration days, see
    * BASELINE.md round 18): environment inflation observed on this box
    * stays under it; a uniform ≥2× code regression lands far above it
    * and now breaches. [[ratioMedianAlarm]] below backstops the band in
    * between. */
  def overGateBreachNorm(best: Double, baseline: Double, m: Double): Boolean = {
    val mm = math.min(RatioMedianCap, math.max(1.0, m))
    best > 2.0 * baseline * mm && best - baseline * mm > 0.5
  }

  /** Upper clamp for the run-median normalization `m` — the top of the
    * measured degraded-box band plus margin. */
  val RatioMedianCap = 1.5

  /** Uniform-regression alarm (round 19, r18 advice): a run whose MEDIAN
    * baseline ratio exceeds the degraded band while its kept-rep steal
    * journal is quiet is either a uniform code regression or an
    * environment mode this box has never exhibited — both must be
    * visible, not normalized away. Steal-gated like the contended-leg
    * conversion: a loud-steal run's inflation is weather by the same
    * policy that converts its legs. `gate` defaults to [[StealGate]];
    * explicit in specs (the test env pins the gate off). */
  def ratioMedianAlarm(m: Double, medianStealPct: Double,
                       gate: Double = StealGate): Boolean =
    !m.isNaN && m > 2.0 &&
      (medianStealPct.isNaN || gate <= 0 || medianStealPct <= gate)

  /** Median of a non-empty sequence (even-size: mean of the middle
    * pair); NaN on empty. Used for the run-median ratio `m`. */
  def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) Double.NaN
    else {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }

  /** Super-linear decade flags for one lane entry: legs over maxDecade×
    * their previous scale (≥0.5 s noise floor), formatted `name@Nx->Mx`.
    * Shared so the lanes' flag policy cannot drift apart. */
  def superlinearFlags(name: String, times: Seq[Double], scales: Seq[Long],
                       maxDecade: Double = 12.0): Seq[String] =
    times.sliding(2).zipWithIndex.collect {
      case (Seq(a, b), i) if !a.isNaN && !b.isNaN && a >= 0.5 && b / a > maxDecade =>
        s"$name@${scales(i)}x->${scales(i + 1)}x"
    }.toSeq

  /** Committed lane reference: parses `{"scales":[...],"entries":{name:
    * [...]}}` from the given bench json (the machine-readable twin of
    * the lane's SCALING_*.md results table). Values tolerate a
    * pretty-printer splitting arrays across lines; a file that exists
    * but parses empty warns loudly — a silently lost heal reference is
    * how r16's flag shipped unfalsifiable.
    */
  def committed(path: String, laneTag: String): (Seq[Long], Map[String, Seq[Double]]) = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return (Nil, Map.empty)
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val scales = """"scales"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1).split(",").map(_.trim.toLong).toSeq).getOrElse(Nil)
    // Anchored to the "entries" object (values are flat arrays, so the
    // object body holds no '}'): a future top-level numeric array — a
    // journaled loads row, say — must not be silently absorbed as a
    // heal reference entry.
    val body = """"entries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
    val named = """"([a-z_0-9]+)"\s*:""".r.findAllMatchIn(body)
      .map(_.group(1)).toSeq
    val entries = """"([a-z_0-9]+)"\s*:\s*\[([0-9.,\s]+)\]""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).split(",").map(_.trim.toDouble).toSeq)
      .toMap
    // a named entry whose value row failed the numeric-array shape
    // (e.g. a null crept in) must warn, not vanish: a silently dropped
    // entry is an un-healable leg, r16's unfalsifiable-flag mode
    named.filterNot(entries.contains).foreach(n => System.err.println(
      s"[$laneTag] WARNING: $path entry '$n' failed to parse as a flat " +
      "numeric array - its committed self-heal reference is lost"))
    if (entries.isEmpty) System.err.println(
      s"[$laneTag] WARNING: $path exists but parsed empty - " +
      "committed self-heal reference lost (format drift?)")
    (scales, entries)
  }

  /** Post-heal contended-leg verdict (round 18): a leg still over 2× its
    * committed reference whose KEPT rep ran under hypervisor steal above
    * the gate is UNMEASURED, not slow — r17 shipped q6@sf10 = 124.77 s
    * against a committed 1.23 s as if it were a measurement. Returns
    * (index, reason) pairs; the caller NaNs those legs and records the
    * reasons, so no downstream flag or reader treats them as numbers.
    *
    * The conversion is deliberately STEAL-ONLY. Loadavg cannot be a
    * conversion signal here: a scale leg's own 32-thread imprint drives
    * the 1-min load toward 30 on a perfectly quiet box (measured: dedup
    * 10×/100× legs reproducing their committed values exactly at loads
    * 20–31, steal 0.1–0.5%), so "load above the floor" would reclassify
    * a genuine quiet regression on a big leg as weather — masking the
    * exact signal the gates exist to catch. Load still drives heal
    * re-runs and backoffs (cheap extra measurement, never
    * reclassification). A leg over 2× at a quiet-steal journal is NOT
    * returned: that is a real regression and must stay visible. */
  def contendedLegs(times: Array[Double], loads: Array[Double], steals: Array[Double],
                    scales: Seq[Long], commScales: Seq[Long], comm: Option[Seq[Double]],
                    gate: Double = StealGate): Seq[(Int, String)] =
    times.indices.flatMap { i =>
      val commIdx = commScales.indexOf(scales(i))
      val over = commIdx >= 0 && !times(i).isNaN && comm
        .flatMap(_.lift(commIdx)).exists(c => c >= 0.5 && times(i) > 2.0 * c)
      if (over && gate > 0 && !steals(i).isNaN && steals(i) > gate)
        Some(i -> contendedReason(times(i), loads(i), steals(i)))
      else None
    }

  /** True when a measured leg warrants a heal re-run: either its decade
    * ratio flags super-linear (prev ≥ noise floor and ratio > maxDecade)
    * or it exceeds 2× its committed reference value (when one exists for
    * this scale). The 0.5 s floor keeps sub-noise legs from healing. */
  def suspect(times: Array[Double], i: Int, scales: Seq[Long],
              commScales: Seq[Long], comm: Option[Seq[Double]],
              maxDecade: Double): Boolean = {
    val decadeSl = i > 0 && !times(i - 1).isNaN && !times(i).isNaN &&
      times(i - 1) >= 0.5 && times(i) / times(i - 1) > maxDecade
    val commIdx = commScales.indexOf(scales(i))
    val overCommitted = commIdx >= 0 && !times(i).isNaN && comm
      .flatMap(_.lift(commIdx)).exists(c => c >= 0.5 && times(i) > 2.0 * c)
    decadeSl || overCommitted
  }

  // ---- Lane calibration probe (round 19, verdict ask #3) ----
  //
  // The sf0.1 bench can tell environment from regression via its
  // run-median baseline ratio; the scale lanes could not, and round 18
  // shipped 2.4–5.8×-committed legs with QUIET steal journals as bare
  // numbers — the box's measured low-steal degraded mode (BASELINE.md
  // round 18: run-median 1.3× at steal < 0.9%, loads < 6) is invisible
  // to the steal-only conversion. The probe is the lanes' analogue: one
  // fixed, compute-only, ground-truth-checked leg with a committed
  // quiet-box time (bench/calibration.json), run interleaved with each
  // lane. Its ratio measures the box's CURRENT compute mode with zero
  // dependence on lane code, so an over-2× lane leg at quiet steal can
  // be adjudicated: calibration also inflated → environment-suspect
  // (annotated, number kept); calibration quiet → real regression,
  // stays loud.

  /** Fixed calibration workload: xor-fold of xxhash64 over a constant
    * range. Pure whole-stage-codegen compute — no I/O, no shuffle, no
    * lane state — sized to ~1 s on a quiet 32-thread box so the ratio
    * is measurable but the probe costs nothing. XOR is order-independent
    * and overflow-free, so the checksum is exactly reproducible under
    * any partitioning (a planted ground truth: a wrong checksum means
    * the probe itself is broken and its timing means nothing). */
  val CalibrationRows: Long = 4000000000L
  private val CalibrationParts = 128
  private var calibrationWarmed = false

  /** Run the calibration leg: (wall seconds, checksum). */
  def calibrationLeg(spark: org.apache.spark.sql.SparkSession): (Double, Long) = {
    val t0 = System.nanoTime()
    val cs = spark.range(0L, CalibrationRows, 1L, CalibrationParts)
      .selectExpr("bit_xor(xxhash64(id, 42L)) AS c").head().getLong(0)
    ((System.nanoTime() - t0) / 1e9, cs)
  }

  /** Committed quiet-box seconds for the calibration leg. NaN (probe
    * disabled, never adjudicates) when the file is absent. */
  lazy val committedCalibrationSecs: Double =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench/calibration.json")), "UTF-8")
      """"calibration_secs"\s*:\s*([0-9.]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble).getOrElse(Double.NaN)
    } catch { case _: Exception => Double.NaN }

  /** Pinned checksum from bench/calibration.json (same file as the
    * committed time, so the pin and the reference refresh together). */
  lazy val committedCalibrationChecksum: Option[Long] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench/calibration.json")), "UTF-8")
      """"calibration_checksum"\s*:\s*(-?[0-9]+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
    } catch { case _: Exception => None }

  /** Measure one calibration ratio (measured / committed); journals to
    * stderr under `tag`. NaN when no committed reference exists or the
    * checksum fails (loud warning — a broken probe must not adjudicate). */
  def calibrationRatio(spark: org.apache.spark.sql.SparkSession, tag: String): Double = {
    // SPARK_GRAFT_CALIBRATION=off (set for `sbt test`): specs pin the
    // lanes' ledger machinery, not the box weather, and must not pay
    // ~1 s per sample; the pure adjudication logic has its own pins
    if (sys.env.get("SPARK_GRAFT_CALIBRATION").contains("off")) return Double.NaN
    // one untimed warmup per JVM: the first run of the probe's codegen
    // pipeline carries ~2x JIT/compile cost (measured 6.5 s cold vs
    // 3.3 s warm) — a cold first sample would mark a healthy lane
    // env-suspect all by itself
    if (!calibrationWarmed) { calibrationLeg(spark); calibrationWarmed = true }
    val (secs, cs) = calibrationLeg(spark)
    if (committedCalibrationChecksum.exists(_ != cs)) {
      System.err.println(s"[$tag] WARNING: calibration checksum $cs != committed " +
        s"${committedCalibrationChecksum.get} - probe broken, ratio withheld")
      return Double.NaN
    }
    val c = committedCalibrationSecs
    val r = if (c.isNaN || c <= 0) Double.NaN else secs / c
    System.err.println(f"[$tag] calibration $secs%.2f s" +
      (if (!r.isNaN) f" = $r%.2fx committed" else " (no committed reference)"))
    r
  }

  /** Calibration ratio above which a lane run's compute mode counts as
    * degraded: the measured degraded band ran 1.3–3.3× on sub-second
    * entries with run-median ~1.32, so 1.5 splits quiet from degraded
    * with the same margin logic as [[StealGate]]. */
  val CalibrationSuspectGate = 1.5

  // ---- Persistent starved-leg ledger (round 19, verdict ask #5) ----
  //
  // A leg that shipped as `budget`-skipped or contended-converted in one
  // artifact must not land in the same ledger twice in a row just
  // because the lane's schedule always reaches it last:
  // dedup_cluster_cc@100× was null in r17 and budget-skipped in r18.
  // Each lane persists its unmeasured max-scale legs after a run; the
  // next run schedules those FIRST (like the stream lane's rotation
  // state, target/-local so a clean build simply forgets — the ledger
  // is scheduling advice, never evidence).

  /** Read the pending (previously unmeasured) leg names for a lane. */
  def pendingLegs(lane: String): Set[String] =
    try {
      val p = java.nio.file.Paths.get(s"target/${lane}_pending")
      if (!java.nio.file.Files.exists(p)) Set.empty
      else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .linesIterator.map(_.trim).filter(_.nonEmpty).toSet
    } catch { case _: Exception => Set.empty }

  /** Persist this run's unmeasured legs (skipped + contended keys).
    * Disabled under SPARK_GRAFT_LANE_LEDGER=off (spec runs starve legs
    * on purpose and must not steer the next real bench's schedule). */
  def writePendingLegs(lane: String, legs: Iterable[String]): Unit = {
    if (sys.env.get("SPARK_GRAFT_LANE_LEDGER").contains("off")) return
    try {
      val p = java.nio.file.Paths.get(s"target/${lane}_pending")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, legs.mkString("\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[$lane] WARNING: pending-leg ledger write failed: ${e.getMessage}")
    }
  }

  /** Environment-suspect annotation (round 19): legs over 2× committed
    * at QUIET steal — the ones [[contendedLegs]] deliberately keeps
    * visible — in a lane run whose worst observed calibration ratio
    * exceeds [[CalibrationSuspectGate]]. Returns (index, reason); the
    * caller ANNOTATES (the number stays in the entries array — an
    * annotation can be audited, a silently converted number cannot be
    * un-converted if the calibration reference itself drifts). */
  def envSuspectLegs(times: Array[Double], steals: Array[Double],
                     scales: Seq[Long], commScales: Seq[Long],
                     comm: Option[Seq[Double]], calibMax: Double,
                     gate: Double = StealGate): Seq[(Int, String)] =
    if (calibMax.isNaN || calibMax <= CalibrationSuspectGate) Nil
    else times.indices.flatMap { i =>
      val commIdx = commScales.indexOf(scales(i))
      val over = commIdx >= 0 && !times(i).isNaN && comm
        .flatMap(_.lift(commIdx)).exists(c => c >= 0.5 && times(i) > 2.0 * c)
      val quietSteal = steals(i).isNaN || gate <= 0 || steals(i) <= gate
      if (over && quietSteal)
        Some(i -> f"env-suspect sec=${times(i)}%.2f quiet-steal but lane calibration ran $calibMax%.2fx committed")
      else None
    }
}
