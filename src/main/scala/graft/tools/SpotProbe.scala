package graft.tools

import graft.{Sessions, Tables}

/** Targeted TPC-H spot-leg probe: run selected queries at one generator
  * schema for N reps with the EXACT lane configuration (rowsPerSplit,
  * broadcast threshold) and a per-rep load/steal journal, so a suspect
  * committed-vs-shipped gap can be adjudicated on a quiet day without
  * paying for a full bench run (round-18 verdict ask #4: the
  * q16/q22@sf10 "re-verify on a clean day" item). Prints min-of-N per
  * query plus each rep's journal; compares against the committed sweep
  * table when one exists. Not part of any artifact — evidence for
  * SCALING_TPCH.md refresh decisions.
  *
  * Usage: runMain graft.tools.SpotProbe [schema] [queryRegex] [reps]
  */
object SpotProbe {
  def main(args: Array[String]): Unit = {
    val schema = args.headOption.getOrElse("sf10")
    val re = args.lift(1).getOrElse("q16$|q22$").r
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Sessions.builder(master = "local[32]", appName = "graft-spot-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = graft.sources.TpchGen.scaleOf(schema).get
    spark.conf.set("graft.tpch.rowsPerSplit",
      math.max(25000L, graft.sources.TpchGen.orders(sf) / 64).toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    val qs = (graft.queries.Tpch.all ++ graft.queries.Tpch2.all)
      .map { case (n, q, _) => (n, q) }
      .filter { case (n, _) => re.findFirstIn(n).isDefined }
    require(qs.nonEmpty, s"no query matches '$re'")
    // committed sweep: per-schema flat blocks (Bench's parser convention)
    val comm: Map[String, Double] = {
      val p = java.nio.file.Paths.get("bench/tpch_sweep.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        ("\"" + schema + "\"\\s*:\\s*\\{([^}]*)\\}").r.findFirstMatchIn(txt)
          .map(m => """"(tpch_q\d+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(m.group(1))
            .map(q => q.group(1) -> q.group(2).toDouble).toMap)
          .getOrElse(Map.empty)
      }
    }
    val t = Tables(spark, s"graft_tpch:$schema")
    qs.foreach { case (n, q) =>
      var best = Double.MaxValue
      var bestSteal = Double.NaN
      for (r <- 1 to reps) {
        val jiff0 = LaneDiscipline.cpuJiffies
        val t0 = System.nanoTime()
        q(t).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val load = LaneDiscipline.loadavg
        val steal = LaneDiscipline.stealPct(jiff0, LaneDiscipline.cpuJiffies)
        if (dt < best) { best = dt; bestSteal = steal }
        println(f"[spot-probe] $schema%-6s $n%-10s rep $r: $dt%7.2f s (load $load%.1f, steal $steal%.2f%%)")
      }
      val vs = comm.get(n).map(c => f" vs committed $c%.2f (${best / c}%.2fx)").getOrElse("")
      println(f"[spot-probe] $schema $n min-of-$reps%d = $best%.2f s (kept-rep steal $bestSteal%.2f%%)$vs")
    }
    spark.stop()
  }
}
