package graft.tools

import graft.Sessions

/** Measures the committed reference for the lane calibration probe
  * (round 19): min-of-N of [[LaneDiscipline.calibrationLeg]] on a box
  * verified quiet (prints per-rep load/steal so the refresh decision is
  * auditable), plus the deterministic checksum to pin. The output is
  * pasted into bench/calibration.json — refresh only with a named cause,
  * like every other committed table (BASELINE.md policy).
  *
  * Usage: runMain graft.tools.CalibrationInit [reps]
  */
object CalibrationInit {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = Sessions.builder(master = "local[32]", appName = "graft-calibration-init")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var best = Double.MaxValue
    var checksum = 0L
    for (r <- 1 to reps) {
      val jiff0 = LaneDiscipline.cpuJiffies
      val (secs, cs) = LaneDiscipline.calibrationLeg(spark)
      val steal = LaneDiscipline.stealPct(jiff0, LaneDiscipline.cpuJiffies)
      println(f"[calibration-init] rep $r: $secs%.3f s (load ${LaneDiscipline.loadavg}%.1f, " +
        f"steal $steal%.2f%%) checksum $cs")
      require(r == 1 || cs == checksum, s"checksum drift: $cs != $checksum")
      checksum = cs
      if (secs < best) best = secs
    }
    println(f"""{"calibration_secs": $best%.3f, "calibration_checksum": $checksum}""")
    spark.stop()
  }
}
