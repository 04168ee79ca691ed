package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Sessions

/** Scale lane for the geospatial operators (round 15) — the DedupScale
  * discipline applied to the spatial join: deterministic
  * planted-structure point clouds at 1×/10×/100×, where the timed
  * action IS a closed-form validation aggregate, so a wrong answer at
  * any scale fails the lane rather than timing beautifully.
  *
  * Corpus: n grid points with 8-unit spacing (side = ⌈√n⌉ columns), so
  * the domain GROWS with n and density stays constant — the join's
  * per-cell candidate load is scale-invariant, which is exactly the
  * 100 TB claim being tested (work linear in points, never all-pairs).
  * Every 10th point gets a twin offset by (2.1, 2.1): with radius 5,
  * spacing 8 keeps every non-twin pair ≥ 8−2·2.97 > 5 apart EXCEPT the
  * planted twins at exactly √(2·2.1²) = 2.9698…, so the join must
  * return exactly n/10 pairs, every one at that distance.
  *
  * A second probe times the scalar-kernel throughput: st_contains of
  * each point against a fixed 21-vertex polygon, whose accepted count
  * has a closed form from the grid geometry.
  *
  * Usage: runMain graft.tools.GeoScale [baseN]
  */
object GeoScale {

  private val Radius = 5.0
  private val Spacing = 8.0
  private val TwinOff = 2.1
  val TwinDist: Double = math.sqrt(2 * TwinOff * TwinOff)

  /** n base points + n/10 twins, deterministic from the index. */
  def cloud(spark: SparkSession, n: Long): DataFrame = {
    val side = math.ceil(math.sqrt(n.toDouble)).toLong
    // Spark's `/` on longs is DOUBLE division — the row index needs floor
    val base = spark.range(n).select(
      col("id"),
      (col("id") % side).cast("double") * Spacing,
      floor(col("id") / side).cast("double") * Spacing)
      .toDF("id", "x", "y")
    val twins = spark.range(0, n, 10).select(
      (col("id") + n).as("id"),
      ((col("id") % side).cast("double") * Spacing + TwinOff).as("x"),
      (floor(col("id") / side).cast("double") * Spacing + TwinOff).as("y"))
    base.union(twins)
  }

  final case class LaneEntry(name: String, times: Seq[Double])
  final case class LaneResult(entries: Seq[LaneEntry], validationFailures: Seq[String],
                              superlinear: Seq[String] = Nil, scales: Seq[Long] = Nil,
                              loads: Seq[LaneEntry] = Nil, healed: Seq[String] = Nil,
                              steals: Seq[LaneEntry] = Nil,
                              contended: Map[String, String] = Map.empty,
                              calibration: Seq[Double] = Nil,
                              envSuspect: Map[String, String] = Map.empty)

  def run(spark: SparkSession, baseN: Long,
      scales: Seq[Long] = Seq(1L, 10L, 100L)): LaneResult = {
    val lane0 = System.nanoTime()
    def spent = (System.nanoTime() - lane0) / 1e9
    // The closed forms assume exactly n/10 twins (spark.range(0, n, 10)
    // has ceil(n/10) elements) and ≥13 grid columns for the contains
    // cut — reject configurations where a CORRECT run would fail
    // validation instead of emitting confusing lane failures.
    require(baseN % 10 == 0 && baseN >= 1000,
      s"GeoScale baseN must be a multiple of 10 and >= 1000 (got $baseN): " +
      "the planted-pair and contains closed forms assume it")
    val fails = Seq.newBuilder[String]
    // calibration probe (round 19): sampled at lane start / pre-heal /
    // lane end; the WORST ratio adjudicates quiet-steal over-2× legs
    val calibs = Seq.newBuilder[Double]
    calibs += LaneDiscipline.calibrationRatio(spark, "geo-scale")
    // (seconds, 1-min loadavg at leg end) — the TPC-H/dedup spot journal
    // discipline, uniform across lanes as of round 17
    // lane-local load floor (round 18): calmest load any rep saw —
    // load > floor + 16 marks foreign work the steal gate can miss
    var laneLoadFloor = Double.NaN
    def leg(name: String, n: Long, tag: String = "")(probe: Long => Seq[String]): (Double, Double, Double) = {
      val jiff0 = LaneDiscipline.cpuJiffies
      val t0 = System.nanoTime()
      fails ++= probe(n)
      val dt = (System.nanoTime() - t0) / 1e9
      val load = LaneDiscipline.loadavg
      if (!load.isNaN && (laneLoadFloor.isNaN || load < laneLoadFloor))
        laneLoadFloor = load
      val steal = LaneDiscipline.stealPct(jiff0, LaneDiscipline.cpuJiffies)
      val t = if (tag.isEmpty) "" else s" ($tag)"
      System.err.println(
        f"[geo-scale] x${n / baseN}%-4d $name%-16s $dt%7.2f s (load $load%.1f, steal $steal%.1f%%)$t")
      (dt, load, steal)
    }
    // untimed warmup of BOTH probe pipelines: codegen + join machinery
    // JIT, else the 1× legs carry ~4 s of first-query cost and the
    // decade ratios read <1
    graft.queries.Geo.distanceJoinPoints(cloud(spark, baseN), Radius)
      .agg(count(lit(1))).head()
    cloud(spark, baseN)
      .filter(call_function("st_contains",
        call_function("st_geometryfromtext",
          lit("POLYGON ((0 -1, 50 -1, 50 50, 0 50, 0 -1))")),
        call_function("st_point", col("x"), col("y"))))
      .count()
    cloud(spark, baseN)
      .filter(call_function("st_relate",
        call_function("st_geometryfromtext",
          lit("POLYGON ((0 -1, 50 -1, 50 50, 0 50, 0 -1))")),
        call_function("st_point", col("x"), col("y")), lit("T*****FF*")))
      .count()
    spark.range(100).select((col("id") % 2).as("g"),
      call_function("st_geometryfromtext", concat(
        lit("POLYGON (("), col("id") * 2, lit(" 0, "), col("id") * 2 + 3,
        lit(" 0, "), col("id") * 2 + 3, lit(" 2, "), col("id") * 2,
        lit(" 2, "), col("id") * 2, lit(" 0))"))).as("t"))
      .groupBy(col("g"))
      .agg(call_function("st_area", call_function("geometry_union_agg", col("t"))))
      .head()
    def joinProbe(n: Long): Seq[String] = {
      val r = graft.queries.Geo.distanceJoinPoints(cloud(spark, n), Radius)
        .agg(count(lit(1)), min(col("dist")), max(col("dist"))).head()
      val bad = Seq.newBuilder[String]
      if (r.getLong(0) != n / 10)
        bad += s"join@x${n / baseN}: pairs ${r.getLong(0)} want ${n / 10}"
      if (math.abs(r.getDouble(1) - TwinDist) > 1e-9 ||
          math.abs(r.getDouble(2) - TwinDist) > 1e-9)
        bad += s"join@x${n / baseN}: dist range [${r.getDouble(1)}, ${r.getDouble(2)}] " +
          s"want $TwinDist"
      bad.result()
    }
    // Scalar-kernel throughput: points inside x < cut (as a convex
    // polygon contains test, exercising the WKT parse once per call
    // site and the PIP kernel per row). Base points with x = (id %
    // side)·8 < cut ⇔ id % side ≤ ⌊(cut−ε)/8⌋; twins shift by 2.1.
    val cut = 100.0
    val polyWkt = s"POLYGON ((0 -1, $cut -1, $cut 1000000, 0 1000000, 0 -1))"
    def pipProbe(n: Long): Seq[String] = {
      val side = math.ceil(math.sqrt(n.toDouble)).toLong
      val got = cloud(spark, n)
        .filter(call_function("st_contains",
          call_function("st_geometryfromtext", lit(polyWkt)),
          call_function("st_point", col("x"), col("y"))))
        .count()
      // strict interior: base x in (0, cut) ⇔ 1 ≤ id%side ≤ 12
      // (x = 8·k < 100, k ≥ 1); twins at 8·k + 2.1 < 100 ⇔ k ≤ 12,
      // incl. k = 0 (x = 2.1 interior)
      def baseRows(colMax: Long): Long = {
        val full = n / side
        val rem = n % side
        (1L to colMax).map(k => full + (if (k < rem) 1L else 0L)).sum
      }
      def twinRows(colMax: Long): Long = {
        // twin hosts: every 10th id; host column k = id % side
        (0L until n by 10).count(id => id % side <= colMax)
      }
      val want = baseRows(12) + twinRows(12)
      if (got != want) Seq(s"contains@x${n / baseN}: got $got want $want") else Nil
    }
    // DE-9IM kernel throughput (round 16): the same grid closed forms
    // through the relate matrix — st_relate with the contains pattern
    // (T*****FF*) must count exactly what the contains leg counts, and
    // st_touches counts exactly the k = 0 column sitting ON the
    // polygon's left edge (twins at 8k + 2.1 never hit a boundary, and
    // the y-range [-1, 1e6] swallows every grid row).
    def relProbe(n: Long): Seq[String] = {
      val side = math.ceil(math.sqrt(n.toDouble)).toLong
      val poly = call_function("st_geometryfromtext", lit(polyWkt))
      val pt = call_function("st_point", col("x"), col("y"))
      val r = cloud(spark, n).agg(
        count(when(call_function("st_relate", poly, pt, lit("T*****FF*")), 1)),
        count(when(call_function("st_touches", poly, pt), 1))).head()
      def colCount(k: Long): Long = n / side + (if (k < n % side) 1L else 0L)
      val wantIn = (1L to 12L).map(colCount).sum +
        (0L until n by 10).count(id => id % side <= 12)
      val wantTouch = colCount(0)
      val bad = Seq.newBuilder[String]
      if (r.getLong(0) != wantIn)
        bad += s"relate@x${n / baseN}: contains-pattern ${r.getLong(0)} want $wantIn"
      if (r.getLong(1) != wantTouch)
        bad += s"relate@x${n / baseN}: touches ${r.getLong(1)} want $wantTouch"
      bad.result()
    }
    // Constructive-aggregate throughput (round 17): geometry_union_agg
    // over overlapping tile chains — 50 tiles [2i, 2i+3]×[0, 2] per
    // group, group count scaling with n, so per-group state stays
    // bounded while total work grows linearly (the 100 TB claim for a
    // union aggregate: map-side partials tree-compact, never a
    // quadratic re-noding of the accumulation). The timed action is
    // the validating aggregate: every group's union must collapse to
    // the single slab whose area is the exact integer closed form
    // 2·(2·max_i + 3). Sized at n/10 — the per-row cost is a full
    // overlay union, ~50× a PIP probe.
    def uaProbe(nDisp: Long): Seq[String] = {
      val n = nDisp / 10
      val s = nDisp / baseN
      val groups = math.max(1L, n / 50)
      val i = floor(col("id") / groups).cast("long")
      val tiles = spark.range(n).select(
        (col("id") % groups).as("g"),
        call_function("st_geometryfromtext", concat(
          lit("POLYGON (("), i * 2, lit(" 0, "), i * 2 + 3, lit(" 0, "),
          i * 2 + 3, lit(" 2, "), i * 2, lit(" 2, "), i * 2, lit(" 0))")))
          .as("t"))
      val r = tiles.groupBy(col("g"))
        .agg(call_function("st_area",
          call_function("geometry_union_agg", col("t"))).as("a"))
        .agg(sum(col("a")), count(lit(1))).head()
      val want = (0L until groups).map(gi => 2.0 * (2 * ((n - 1 - gi) / groups) + 3)).sum
      val bad = Seq.newBuilder[String]
      if (r.getLong(1) != groups)
        bad += s"union_agg@x$s: groups ${r.getLong(1)} want $groups"
      if (math.abs(r.getDouble(0) - want) > 1e-6)
        bad += s"union_agg@x$s: slab-area sum ${r.getDouble(0)} want $want"
      bad.result()
    }
    // Uniform probe table: every leg re-runnable by name, so the heal
    // below can target exactly the suspect (probe, scale) pair.
    val probes: Seq[(String, String, Long => Seq[String])] = Seq(
      ("geo_distance_join", "distance_join", joinProbe _),
      ("geo_contains_scan", "contains_scan", pipProbe _),
      ("geo_relate_scan", "relate_scan", relProbe _),
      ("geo_union_agg", "union_agg", uaProbe _))
    val times = probes.map { case (name, disp, f) =>
      name -> scales.map { s =>
        leg(disp, baseN * s)(f)
      }.toArray
    }
    val loadAt = scala.collection.mutable.LinkedHashMap(
      times.map { case (n, ts) => n -> ts.map(_._2) }: _*)
    val stealAt = scala.collection.mutable.LinkedHashMap(
      times.map { case (n, ts) => n -> ts.map(_._3) }: _*)
    val secs = scala.collection.mutable.LinkedHashMap(
      times.map { case (n, ts) => n -> ts.map(_._1) }: _*)
    // Committed-reference heal + super-linear flag (round 17, uniform
    // with DedupScale): a leg over 2× bench/geo_scale.json or a >12×
    // decade re-runs once (min-of-2, load re-journaled at the kept rep);
    // the flag survives only if it reproduces. Round 18: heal spend is
    // wall-capped like StreamScale's (a persistently contended box can
    // trip every probe/scale pair — unbounded heals would roughly
    // double the lane inside Bench's artifact run), and a contended
    // kept rep gets a bounded backoff before its retry.
    calibs += LaneDiscipline.calibrationRatio(spark, "geo-scale")
    val (commScales, comm) = LaneDiscipline.committed("bench/geo_scale.json", "geo-scale")
    val healCap = spent + math.max(120.0, spent * 0.5)
    val healEvents = Seq.newBuilder[String]
    for ((name, disp, f) <- probes; i <- scales.indices if spent < healCap) {
      if (LaneDiscipline.suspect(secs(name), i, scales, commScales, comm.get(name), 12.0)) {
        healEvents += s"$name@${scales(i)}x"
        if (LaneDiscipline.contendedRep(stealAt(name)(i), loadAt(name)(i), laneLoadFloor))
          LaneDiscipline.backoff("geo-scale")
        val (dt, ld, st) = leg(disp, baseN * scales(i), "heal")(f)
        if (dt < secs(name)(i)) {
          secs(name)(i) = dt; loadAt(name)(i) = ld; stealAt(name)(i) = st
        }
      }
    }
    // Contended-leg conversion (round 18): still over 2× committed with
    // a contention journal at the kept rep → named non-number.
    val contended = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((name, _, _) <- probes) {
      for ((i, reason) <- LaneDiscipline.contendedLegs(secs(name), loadAt(name),
          stealAt(name), scales, commScales, comm.get(name))) {
        contended(s"$name@${scales(i)}x") = reason
        secs(name)(i) = Double.NaN
      }
    }
    val entries = probes.map { case (name, _, _) => LaneEntry(name, secs(name).toSeq) }
    val superlinear = entries.flatMap(e =>
      LaneDiscipline.superlinearFlags(e.name, e.times, scales))
    // distinct: a heal rep re-runs the probe's validating aggregate, so
    // a persistently wrong answer would otherwise report twice (a wrong
    // answer in ANY rep still fails the lane — nondeterministic
    // wrongness is a bug, not noise)
    calibs += LaneDiscipline.calibrationRatio(spark, "geo-scale")
    val calibration = calibs.result()
    val calibMax = calibration.filterNot(_.isNaN)
      .foldLeft(Double.NaN)((a, b) => if (a.isNaN || b > a) b else a)
    val envSuspect = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for ((name, _, _) <- probes;
         (i, reason) <- LaneDiscipline.envSuspectLegs(secs(name), stealAt(name),
           scales, commScales, comm.get(name), calibMax))
      envSuspect(s"$name@${scales(i)}x") = reason
    LaneResult(entries, fails.result().distinct, superlinear, scales,
      probes.map { case (name, _, _) => LaneEntry(name, loadAt(name).toSeq) },
      healEvents.result(),
      probes.map { case (name, _, _) => LaneEntry(name, stealAt(name).toSeq) },
      contended.toMap, calibration, envSuspect.toMap)
  }

  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = Sessions.builder(master = "local[32]", appName = "graft-geo-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, baseN)
    r.entries.zip(r.loads).foreach { case (e, l) =>
      val dec = e.times.sliding(2).map { case Seq(a, b) => f"${b / a}%.1f×" }.mkString(", ")
      println(f"[geo-scale] ${e.name}%-18s ${e.times.map(t => f"$t%.2f").mkString(" / ")} s " +
        s"(decades $dec; loads ${l.times.map(t => f"$t%.1f").mkString("/")})")
    }
    if (r.healed.nonEmpty) println(s"[geo-scale] healed: ${r.healed.mkString(", ")}")
    println(s"[geo-scale] calibration ratios: " +
      r.calibration.map(c => if (c.isNaN) "n/a" else f"$c%.2f").mkString("/"))
    if (r.envSuspect.nonEmpty)
      println(s"[geo-scale] ENV-SUSPECT (number kept): ${r.envSuspect.mkString(", ")}")
    if (r.contended.nonEmpty)
      println(s"[geo-scale] CONTENDED (unmeasured): ${r.contended.mkString(", ")}")
    if (r.superlinear.nonEmpty)
      println(s"[geo-scale] SUPERLINEAR: ${r.superlinear.mkString(", ")}")
    if (r.validationFailures.nonEmpty) {
      System.err.println(s"[geo-scale] VALIDATION FAILED: ${r.validationFailures.mkString("; ")}")
      spark.stop(); sys.exit(1)
    }
    println("[geo-scale] validation ALL PASS")
    spark.stop()
  }
}
