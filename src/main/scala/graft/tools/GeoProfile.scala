package graft.tools

import graft.functions.{GeoFns, GeoOverlay, GeoAgg}
import graft.functions.GeoFns._

/** Kernel-level profile of the geo_buffer / geo_union_agg workloads —
  * times the exact per-row GeoOverlay calls the two bench entries make,
  * without Spark in the loop, so the overlay kernel's share of the
  * entry cost (vs expression/scan overhead) is measurable and each
  * optimization can be A/B'd in milliseconds instead of bench minutes.
  *
  * Usage: runMain graft.tools.GeoProfile [nDocs] [reps]
  */
object GeoProfile {
  private def rectPoly(w: Double, h: Double): Geom =
    GPolygon(Array(Array(0.0, 0.0, w, 0.0, w, h, 0.0, h, 0.0, 0.0)))

  private def tile(x1: Double, y1: Double, x2: Double, y2: Double): Geom =
    GPolygon(Array(Array(x1, y1, x2, y1, x2, y2, x1, y2, x1, y1)))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    for (rep <- 1 to reps) {
      // --- geo_buffer's four columns -------------------------------
      var tPt = 0L; var tSeg = 0L; var tErode = 0L; var tDil = 0L
      var sink = 0.0
      var id = 0
      while (id < n) {
        val r = (1 + id % 3).toDouble
        val l = (5 + id % 7).toDouble
        val w = (10 + id % 6).toDouble
        val h = (8 + id % 5).toDouble
        val px = (id * 37 % 100).toDouble
        val py = (id * 61 % 100).toDouble
        var t0 = System.nanoTime()
        sink += GeoFns.area(GeoOverlay.buffer(GPoint(px, py), r))
        tPt += System.nanoTime() - t0
        t0 = System.nanoTime()
        sink += GeoFns.area(GeoOverlay.buffer(GLineString(Array(0.0, 0.0, l, 0.0)), r))
        tSeg += System.nanoTime() - t0
        t0 = System.nanoTime()
        sink += GeoFns.area(GeoOverlay.buffer(rectPoly(w, h), -r))
        tErode += System.nanoTime() - t0
        if (id % 11 == 0) {
          t0 = System.nanoTime()
          sink += GeoFns.area(GeoOverlay.buffer(rectPoly(w, h), r))
          tDil += System.nanoTime() - t0
        }
        id += 1
      }
      println(f"[rep $rep] buffer: pt ${tPt / 1e9}%.3f s  seg ${tSeg / 1e9}%.3f s  " +
        f"erode ${tErode / 1e9}%.3f s  dil ${tDil / 1e9}%.3f s  " +
        f"total ${(tPt + tSeg + tErode + tDil) / 1e9}%.3f s")
      if (GeoOverlay.Prof.on) {
        println(s"[rep $rep] buffer phases: ${GeoOverlay.Prof.report()}")
        GeoOverlay.Prof.reset()
      }

      // --- geo_union_agg: 25 groups, chain + sparse ---------------
      // Model the aggregate path: rows land round-robin over 32
      // partitions (update-side states), then partials merge.
      val parts = 32
      var tChain = 0L; var tSparse = 0L
      var g = 0
      while (g < 25) {
        var t0 = System.nanoTime()
        for (fam <- 0 to 1) {
          val states = Array.fill(parts)(new GeoAgg.UnionState)
          var idd = g
          while (idd < n) {
            val i = (idd / 25).toDouble
            val geom =
              if (fam == 0) tile(i * 2, 0, i * 2 + 3, 2)
              else tile(i * 5, 10, i * 5 + 2, 12)
            states(idd % parts).add(geom)
            idd += 25
          }
          val tot = new GeoAgg.UnionState
          states.foreach { s =>
            tot.pending ++= s.pending
            if (tot.pending.length > GeoAgg.UnionCompactAt) tot.compact()
          }
          tot.compact()
          sink += GeoFns.area(tot.pending.head)
          val t1 = System.nanoTime()
          if (fam == 0) tChain += t1 - t0 else tSparse += t1 - t0
          t0 = t1
        }
        g += 1
      }
      println(f"[rep $rep] union_agg: chain ${tChain / 1e9}%.3f s  sparse ${tSparse / 1e9}%.3f s  " +
        f"(sink $sink%.1f)")
      if (GeoOverlay.Prof.on) {
        println(s"[rep $rep] union_agg phases: ${GeoOverlay.Prof.report()}")
        GeoOverlay.Prof.reset()
      }
    }
  }
}
