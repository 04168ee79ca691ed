package graft.functions

import graft.functions.GeoFns._

/** Constructive planar overlay — `st_intersection`, `st_union`,
  * `st_difference`, `st_symdifference` — on the round-16 relate
  * kernel's exact primitives (reference nominal capability:
  * axiom/optimizer/tests/AxiomSql.cpp:58-59 registers the Presto geo
  * plugin; no reference test exercises overlay, so semantics follow
  * OGC/Presto).
  *
  * Method (polygon×polygon): mutual CANONICAL noding — every
  * intersection event between an A-edge and a B-edge is computed once
  * and the same coordinate pair cuts both edges, so the two operands'
  * sub-segment decompositions share bit-identical vertices and ring
  * stitching never has to match nearly-equal points. Each sub-segment
  * is then classified by its midpoint against the other operand
  * (inside / outside / on-boundary with direction agreement — the same
  * discipline `relateCells` uses), the per-operator selection table
  * picks the sub-segments that bound the result with the interior on
  * their LEFT (shells CCW, holes CW), and the selected edges are
  * stitched into rings by walking clockwise-first at each node (the
  * DCEL face-walk rule), with holes assigned to their smallest
  * containing shell.
  *
  * Scale: the kernel is a per-row scalar (O(E_A·E_B) noding per pair,
  * like the relate matrix) — geometries of the usual handful-to-
  * hundreds of vertices cost microseconds, and the operator
  * distributes exactly like every other geo expression: no shuffle, no
  * state, codegen'd callers. Mixed-dimension results (e.g. two
  * polygons intersecting in a line AND a point) come back as a
  * GEOMETRYCOLLECTION (round 17 — the ADT models it now), and
  * collection OPERANDS distribute through every operator; an area
  * result still drops lower-dimensional contact pieces, matching GEOS
  * overlay's polygon-output convention. */
object GeoOverlay {

  /** Phase counters for tools.GeoProfile (-Dgraft.geo.prof=true).
    * `on` is a constant after class init, so the JIT removes the
    * disabled branches from the hot paths entirely. */
  private[graft] object Prof {
    val on: Boolean = java.lang.Boolean.getBoolean("graft.geo.prof") ||
      sys.env.get("GRAFT_GEO_PROF").contains("1")
    var tOrient, tNode, tSplit, tIdx, tKeys, tClassA, tClassB, tStitch,
        tAssemble, nOverlay = 0L
    def reset(): Unit = {
      tOrient = 0; tNode = 0; tSplit = 0; tIdx = 0; tKeys = 0
      tClassA = 0; tClassB = 0; tStitch = 0; tAssemble = 0; nOverlay = 0
    }
    def report(): String =
      f"overlay n=$nOverlay orient=${tOrient / 1e9}%.3f node=${tNode / 1e9}%.3f " +
        f"split=${tSplit / 1e9}%.3f idx=${tIdx / 1e9}%.3f keys=${tKeys / 1e9}%.3f " +
        f"classA=${tClassA / 1e9}%.3f classB=${tClassB / 1e9}%.3f " +
        f"stitch=${tStitch / 1e9}%.3f assemble=${tAssemble / 1e9}%.3f"
  }

  // ----------------------------------------------------------- rings
  // (ring signed area shares GeoFns.ringSignedArea — the two sides'
  // orientation decisions must agree, so there is exactly one shoelace)

  private def reverseRing(r: Coords): Coords = {
    val n = r.length / 2
    val out = new Array[Double](r.length)
    var i = 0
    while (i < n) {
      out(2 * i) = r(2 * (n - 1 - i))
      out(2 * i + 1) = r(2 * (n - 1 - i) + 1)
      i += 1
    }
    out
  }

  /** Shells CCW, holes CW — interior strictly LEFT of travel
    * everywhere, the invariant the selection table and the stitcher
    * rely on. */
  private def orientPolys(polys: Array[Array[Coords]]): Array[Array[Coords]] =
    polys.map { rings =>
      rings.zipWithIndex.map { case (r, i) =>
        val a = ringSignedArea(r)
        if (i == 0) { if (a < 0) reverseRing(r) else r }
        else { if (a > 0) reverseRing(r) else r }
      }
    }

  // ---------------------------------------------------------- noding
  /** One directed input edge plus the cut points other-operand edges
    * put on it. Cut coords are exact vertices or ONE canonically
    * computed crossing shared by both edges. */
  private final class Edge(val sx: Double, val sy: Double,
                           val ex: Double, val ey: Double) {
    val cuts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
  }

  private def edgesOf(rings: Array[Coords]): Array[Edge] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Edge]
    rings.foreach { c =>
      var i = 0
      while (i + 3 < c.length) {
        if (!(c(i) == c(i + 2) && c(i + 1) == c(i + 3)))
          out += new Edge(c(i), c(i + 1), c(i + 2), c(i + 3))
        i += 2
      }
    }
    out.toArray
  }

  /** Mutually node two edge sets: every A×B intersection event lands
    * on BOTH edges with identical coordinates. Edge-pair bounding
    * boxes prune the quadratic scan — disjoint tiles through
    * geometry_union_agg otherwise pay full O(E_A·E_B) orient tests for
    * pairs that cannot meet (round-17 bench finding: together with the
    * RingIndex below, the sf0.1 geo_union_agg oracle entry dropped
    * 28.1 s → 4.2 s). */
  private def node(ea: Array[Edge], eb: Array[Edge]): Unit = {
    // hoist B-edge boxes out of the A loop: recomputing 4 min/max per
    // (A,B) pair doubles the cost of the prune test that dominates the
    // disjoint-tile workloads the prune exists for
    val bBox = new Array[Double](4 * eb.length)
    var j0 = 0
    while (j0 < eb.length) {
      val b = eb(j0)
      bBox(4 * j0) = math.min(b.sx, b.ex); bBox(4 * j0 + 1) = math.max(b.sx, b.ex)
      bBox(4 * j0 + 2) = math.min(b.sy, b.ey); bBox(4 * j0 + 3) = math.max(b.sy, b.ey)
      j0 += 1
    }
    var i = 0
    while (i < ea.length) {
      val a = ea(i)
      val aMinX = math.min(a.sx, a.ex); val aMaxX = math.max(a.sx, a.ex)
      val aMinY = math.min(a.sy, a.ey); val aMaxY = math.max(a.sy, a.ey)
      var j = 0
      while (j < eb.length) {
        val b = eb(j)
        if (bBox(4 * j) > aMaxX || bBox(4 * j + 1) < aMinX ||
            bBox(4 * j + 2) > aMaxY || bBox(4 * j + 3) < aMinY) {
          j += 1
        } else {
        val o1 = orient(a.sx, a.sy, a.ex, a.ey, b.sx, b.sy)
        val o2 = orient(a.sx, a.sy, a.ex, a.ey, b.ex, b.ey)
        val o3 = orient(b.sx, b.sy, b.ex, b.ey, a.sx, a.sy)
        val o4 = orient(b.sx, b.sy, b.ex, b.ey, a.ex, a.ey)
        if (o1 == 0 && o2 == 0) {
          // collinear: cut each edge at the other's endpoints (exact
          // vertices); overlap interiors need no further events
          if (onSegment(b.sx, b.sy, a.sx, a.sy, a.ex, a.ey)) a.cuts += ((b.sx, b.sy))
          if (onSegment(b.ex, b.ey, a.sx, a.sy, a.ex, a.ey)) a.cuts += ((b.ex, b.ey))
          if (onSegment(a.sx, a.sy, b.sx, b.sy, b.ex, b.ey)) b.cuts += ((a.sx, a.sy))
          if (onSegment(a.ex, a.ey, b.sx, b.sy, b.ex, b.ey)) b.cuts += ((a.ex, a.ey))
        } else if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
                   ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) {
          // proper cross: ONE canonical point, shared by both edges
          val t = o3 / (o3 - o4)
          val px = a.sx + t * (a.ex - a.sx)
          val py = a.sy + t * (a.ey - a.sy)
          a.cuts += ((px, py))
          b.cuts += ((px, py))
        } else {
          // endpoint touches (exact vertices)
          if (o1 == 0 && onSegment(b.sx, b.sy, a.sx, a.sy, a.ex, a.ey)) a.cuts += ((b.sx, b.sy))
          if (o2 == 0 && onSegment(b.ex, b.ey, a.sx, a.sy, a.ex, a.ey)) a.cuts += ((b.ex, b.ey))
          if (o3 == 0 && onSegment(a.sx, a.sy, b.sx, b.sy, b.ex, b.ey)) b.cuts += ((a.sx, a.sy))
          if (o4 == 0 && onSegment(a.ex, a.ey, b.sx, b.sy, b.ex, b.ey)) b.cuts += ((a.ex, a.ey))
        }
        j += 1
        }
      }
      i += 1
    }
  }

  /** Ring set with per-ring bounding boxes: even-odd point location
    * that skips rings whose box cannot affect the crossing count (a
    * ring entirely left of, above, or below the probe contributes
    * nothing to a +x ray). */
  private final class RingIndex(val rings: Array[Coords]) {
    // pre-wrapped single-ring arrays: locate() probes once per
    // sub-segment per overlay, and a fresh Array per ring per probe on
    // that path is pure allocation churn
    private val singles: Array[Array[Coords]] = rings.map(Array(_))
    val boxes: Array[Array[Double]] = rings.map { c =>
      var minX = Double.MaxValue; var maxX = Double.MinValue
      var minY = Double.MaxValue; var maxY = Double.MinValue
      var i = 0
      while (i + 1 < c.length) {
        if (c(i) < minX) minX = c(i)
        if (c(i) > maxX) maxX = c(i)
        if (c(i + 1) < minY) minY = c(i + 1)
        if (c(i + 1) > maxY) maxY = c(i + 1)
        i += 2
      }
      Array(minX, minY, maxX, maxY)
    }
    def locate(px: Double, py: Double): Int = {
      var crossings = 0
      var r = 0
      while (r < rings.length) {
        val b = boxes(r)
        if (px <= b(2) && py >= b(1) && py <= b(3)) {
          pointInRings(px, py, singles(r)) match {
            case 2 => return 2
            case 1 => crossings += 1
            case _ =>
          }
        }
        r += 1
      }
      if ((crossings & 1) == 1) 1 else 0
    }
  }

  /** A directed sub-segment of one operand's boundary after noding. */
  private final case class Sub(sx: Double, sy: Double, ex: Double, ey: Double) {
    def mx: Double = (sx + ex) / 2
    def my: Double = (sy + ey) / 2
    def rev: Sub = Sub(ex, ey, sx, sy)
  }

  private val NoSubs = Array.empty[Sub]

  private def split(e: Edge): Array[Sub] = {
    // edgesOf never emits a degenerate edge, so the common uncut edge
    // is exactly one sub — the profiled hot path (tools/GeoProfile:
    // the Seq/sliding machinery here was ~30% of the whole overlay)
    if (e.cuts.isEmpty) return Array(Sub(e.sx, e.sy, e.ex, e.ey))
    def param(x: Double, y: Double): Double =
      if (math.abs(e.ex - e.sx) >= math.abs(e.ey - e.sy)) {
        if (e.ex == e.sx) 0.0 else (x - e.sx) / (e.ex - e.sx)
      } else (y - e.sy) / (e.ey - e.sy)
    val inner = e.cuts.distinct.sortBy(p => param(p._1, p._2))
      .filterNot(p => p == ((e.ex, e.ey)))
    // walk start -> inner cuts -> end, skipping zero-length pieces (the
    // same subs the old sliding(2)-with-skip emitted)
    val out = new scala.collection.mutable.ArrayBuffer[Sub](inner.length + 1)
    var px = e.sx; var py = e.sy
    inner.foreach { case (x, y) =>
      if (!(x == px && y == py)) { out += Sub(px, py, x, y); px = x; py = y }
    }
    if (!(e.ex == px && e.ey == py)) out += Sub(px, py, e.ex, e.ey)
    if (out.isEmpty) NoSubs else out.toArray
  }

  // -------------------------------------------------- classification
  /** Direction-insensitive endpoint key: coincident subs from the two
    * operands have EXACTLY equal coordinate doubles after mutual noding
    * (collinear cuts reuse exact vertices; proper crossings share one
    * canonical point), so shared boundary is an exact-match lookup —
    * not a float midpoint-on-line test, which only ever held for dyadic
    * coordinates. The round-19 property sweep's first shrunk
    * counterexample was precisely union(a, a) on a circle-built
    * triangle: the midpoint (sx+ex)/2 rounds off the line, locate()
    * said interior-or-exterior instead of boundary, the two sides
    * selected inconsistent edge sets, and stitching dead-ended. */
  private final case class SubKey(ax: Double, ay: Double, bx: Double, by: Double)

  private def subKey(s: Sub): SubKey =
    if (s.sx < s.ex || (s.sx == s.ex && s.sy <= s.ey)) SubKey(s.sx, s.sy, s.ex, s.ey)
    else SubKey(s.ex, s.ey, s.sx, s.sy)

  /** Exact coincident-twin index (hand-built: groupBy over boxed tuples
    * was a profiled hot spot — tools/GeoProfile). */
  private def twinIndex(subs: Array[Sub])
      : scala.collection.mutable.HashMap[SubKey, List[Sub]] = {
    val m = scala.collection.mutable.HashMap.empty[SubKey, List[Sub]]
    var i = 0
    while (i < subs.length) {
      val s = subs(i)
      val k = subKey(s)
      m.updateWith(k) {
        case Some(l) => Some(s :: l)
        case None => Some(s :: Nil)
      }
      i += 1
    }
    m
  }

  /** Midpoint class of a sub against the other operand: 0 exterior,
    * 1 interior, 2 on-boundary; for 2, `sameDir` tells whether the
    * collinear twin runs the same way (interiors on the same side).
    * `otherKeys` is the exact coincident-twin index over `otherSubs`. */
  private def classify(s: Sub, otherRings: RingIndex, otherSubs: Array[Sub],
                       otherKeys: scala.collection.mutable.HashMap[SubKey, List[Sub]])
      : (Int, Boolean) = {
    otherKeys.get(subKey(s)) match {
      case Some(twins) =>
        val same = twins.exists(o =>
          (o.ex - o.sx) * (s.ex - s.sx) + (o.ey - o.sy) * (s.ey - s.sy) > 0)
        return (2, same)
      case None =>
    }
    otherRings.locate(s.mx, s.my) match {
      case 2 =>
        val twin = otherSubs.find(o =>
          onSegment(s.mx, s.my, o.sx, o.sy, o.ex, o.ey) &&
            orient(o.sx, o.sy, o.ex, o.ey, s.sx, s.sy) == 0 &&
            orient(o.sx, o.sy, o.ex, o.ey, s.ex, s.ey) == 0)
        val same = twin.exists(o =>
          (o.ex - o.sx) * (s.ex - s.sx) + (o.ey - o.sy) * (s.ey - s.sy) > 0)
        (2, same)
      case c => (c, false)
    }
  }

  /** Midpoint class only — skips the collinear-twin DIRECTION scan for
    * callers that discard the `sameDir` bit (the B-side loop: every
    * operator keys B subs on loc alone). The exact twin lookup still
    * applies: a B sub coinciding with an A sub must report boundary, or
    * self-union would re-select the same edge from both sides. */
  private def classifyLoc(s: Sub, otherRings: RingIndex,
      otherKeys: scala.collection.mutable.HashMap[SubKey, List[Sub]]): Int =
    if (otherKeys.contains(subKey(s))) 2 else otherRings.locate(s.mx, s.my)

  // ---------------------------------------------------------- stitch
  /** Walk selected interior-left edges into closed rings. At a node
    * the continuation is the first unused outgoing edge CLOCKWISE from
    * the reversed incoming direction (the DCEL face-walk rule), which
    * keeps the face to the left connected through degree>2 nodes
    * (e.g. the symdifference of two overlapping squares pinching at
    * the overlap corners). */
  private final case class Pt(x: Double, y: Double)

  private def stitch(selected: scala.collection.IndexedSeq[Sub]): Array[Coords] = {
    val n = selected.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Coords]
    val used = new Array[Boolean](n)
    // hand-built start index (zipWithIndex.groupBy over boxed tuples was
    // a profiled hot spot); lists are prepended from the high index down
    // so each bucket iterates in ascending selection order — the same
    // order groupBy preserved, keeping minBy's tie-break identical
    val byStart = scala.collection.mutable.HashMap.empty[Pt, List[Int]]
    var bi = n - 1
    while (bi >= 0) {
      val s = selected(bi)
      val k = Pt(s.sx, s.sy)
      byStart.updateWith(k) {
        case Some(l) => Some(bi :: l)
        case None => Some(bi :: Nil)
      }
      bi -= 1
    }
    def nextFrom(atX: Double, atY: Double, inDx: Double, inDy: Double): Int = {
      // clockwise angular distance from the reversed incoming
      // direction; the exact reverse itself sorts last (2π) so a
      // spike back along the incoming edge is the last resort
      val back = math.atan2(-inDy, -inDx)
      var bestI = -1
      var bestM = Double.MaxValue
      var l = byStart.getOrElse(Pt(atX, atY), Nil)
      while (l.nonEmpty) {
        val i = l.head
        l = l.tail
        if (!used(i)) {
          val s = selected(i)
          val a = math.atan2(s.ey - s.sy, s.ex - s.sx)
          val d = back - a // clockwise = decreasing angle
          val m0 = d - 2 * math.Pi * math.floor(d / (2 * math.Pi))
          val m = if (m0 == 0.0) 2 * math.Pi else m0
          if (m < bestM) { bestM = m; bestI = i }
        }
      }
      bestI
    }
    var start = 0
    while (start < n) {
      if (!used(start)) {
        val first = selected(start)
        val ring = scala.collection.mutable.ArrayBuffer(first.sx, first.sy)
        var cur = first
        used(start) = true
        ring += cur.ex; ring += cur.ey
        var steps = 0
        while (!(cur.ex == first.sx && cur.ey == first.sy)) {
          steps += 1
          if (steps > n) throw new IllegalArgumentException(
            "geometry overlay: stitching did not close a ring (inconsistent " +
            "selection — likely invalid input geometry)")
          nextFrom(cur.ex, cur.ey, cur.ex - cur.sx, cur.ey - cur.sy) match {
            case i if i >= 0 =>
              used(i) = true
              cur = selected(i)
              ring += cur.ex; ring += cur.ey
            case _ => throw new IllegalArgumentException(
              "geometry overlay: stitching dead-ended at an open vertex " +
              "(inconsistent selection — likely invalid input geometry)")
          }
        }
        out += ring.toArray
      }
      start += 1
    }
    out.toArray
  }

  /** Group stitched rings into polygons: CCW rings are shells, CW
    * rings are holes of their smallest containing shell. */
  private def assemble(rings: Array[Coords]): Geom = {
    val live = rings.filter(r => ringSignedArea(r) != 0.0)
    val shells = live.filter(ringSignedArea(_) > 0)
    val holes = live.filter(ringSignedArea(_) < 0)
    if (shells.isEmpty) return GPolygon(Array.empty)
    val polys = shells.map(s => scala.collection.mutable.ArrayBuffer(s))
    holes.foreach { h =>
      val inside = interiorPointOf(Array(reverseRing(h)))
      val owner = inside.flatMap { case (x, y) =>
        // the owner must contain the hole RING, not merely the hole's
        // interior point: an ISLAND shell nested inside the hole also
        // contains that point (and, being smaller, would win minBy) —
        // every hole vertex must sit in the candidate's closure
        def holdsRing(s: Coords): Boolean = {
          var k = 0
          while (k + 1 < h.length) {
            if (pointInRings(h(k), h(k + 1), Array(s)) == 0) return false
            k += 2
          }
          true
        }
        val owners = shells.zipWithIndex.filter { case (s, _) =>
          pointInRings(x, y, Array(s)) == 1 && holdsRing(s)
        }
        if (owners.isEmpty) None
        else Some(owners.minBy { case (s, _) => ringSignedArea(s) }._2)
      }
      owner match {
        case Some(i) => polys(i) += h
        case None => throw new IllegalArgumentException(
          "geometry overlay: hole ring has no containing shell " +
          "(inconsistent stitch — likely invalid input geometry)")
      }
    }
    if (polys.length == 1) GPolygon(polys(0).toArray)
    else GMultiPolygon(polys.map(_.toArray).toArray)
  }

  // --------------------------------------------------------- overlay
  private def requireValid(g: Geom, fn: String): Unit =
    invalidReason(g).foreach(r => throw new IllegalArgumentException(
      s"$fn: invalid geometry operand ($r)"))

  /** Polygon×polygon boolean op. `op` ∈ intersection | union |
    * difference | symdifference. */
  private def polyOverlay(op: String, pa: Array[Array[Coords]],
                          pb: Array[Array[Coords]]): Geom = {
    var t0 = if (Prof.on) System.nanoTime() else 0L
    def lap(): Long =
      if (Prof.on) { val t1 = System.nanoTime(); val d = t1 - t0; t0 = t1; d }
      else 0L
    if (Prof.on) Prof.nOverlay += 1
    val a = orientPolys(pa)
    val b = orientPolys(pb)
    val ringsA = a.flatten
    val ringsB = b.flatten
    val ea = edgesOf(ringsA)
    val eb = edgesOf(ringsB)
    if (Prof.on) Prof.tOrient += lap()
    node(ea, eb)
    if (Prof.on) Prof.tNode += lap()
    val subsA = ea.flatMap(split)
    val subsB = eb.flatMap(split)
    if (Prof.on) Prof.tSplit += lap()
    val idxA = new RingIndex(ringsA)
    val idxB = new RingIndex(ringsB)
    if (Prof.on) Prof.tIdx += lap()
    // exact coincident-twin indexes (see subKey): shared boundary must
    // never depend on a float midpoint-on-line test
    val keysA = twinIndex(subsA)
    val keysB = twinIndex(subsB)
    if (Prof.on) Prof.tKeys += lap()
    val sel = scala.collection.mutable.ArrayBuffer.empty[Sub]
    val sharedLines = scala.collection.mutable.ArrayBuffer.empty[Sub]
    subsA.foreach { s =>
      val (loc, same) = classify(s, idxB, subsB, keysB)
      op match {
        case "intersection" =>
          if (loc == 1) sel += s
          else if (loc == 2) { if (same) sel += s else sharedLines += s }
        case "union" =>
          if (loc == 0) sel += s
          else if (loc == 2 && same) sel += s
        case "difference" =>
          if (loc == 0) sel += s
          else if (loc == 2 && !same) sel += s
        case "symdifference" =>
          if (loc == 0) sel += s
          else if (loc == 1) sel += s.rev
      }
    }
    if (Prof.on) Prof.tClassA += lap()
    subsB.foreach { s =>
      val loc = classifyLoc(s, idxA, keysA)
      op match {
        case "intersection" => if (loc == 1) sel += s
        case "union" => if (loc == 0) sel += s
        case "difference" => if (loc == 1) sel += s.rev
        case "symdifference" =>
          if (loc == 0) sel += s
          else if (loc == 1) sel += s.rev
      }
    }
    if (Prof.on) Prof.tClassB += lap()
    if (sel.isEmpty && op == "intersection") {
      // no area: the operands may still meet in shared edges (dim 1)
      // AND/OR isolated corner touches (dim 0) — OGC intersection
      // returns all of them (a collection when both exist), not EMPTY.
      // A touch point that is an endpoint of the shared linework is
      // part of a LINESTRING already, not an isolated touch — the
      // canonical noding makes the coordinates identical, so exact
      // endpoint-set membership filters them.
      val chains = mergeChains(sharedLines.toSeq)
      val lineEnds = sharedLines.iterator
        .flatMap(s => Iterator((s.sx, s.sy), (s.ex, s.ey))).toSet
      val pts = touchPoints(ea, ringsA, ringsB).filterNot(lineEnds.contains)
      return mixed("intersection", chains, pts)
    }
    if (sel.isEmpty) return GPolygon(Array.empty)
    val rings = stitch(sel)
    if (Prof.on) Prof.tStitch += lap()
    val out = assemble(rings)
    if (Prof.on) Prof.tAssemble += lap()
    out
  }

  /** Isolated boundary∩boundary points (corner touches) for the
    * zero-area intersection fallback: noding event points on both
    * boundaries. */
  private def touchPoints(ea: Array[Edge], ringsA: Array[Coords],
                          ringsB: Array[Coords]): Seq[(Double, Double)] = {
    val pts = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
    ea.foreach { e =>
      e.cuts.foreach { case (x, y) =>
        if (pointInRings(x, y, ringsA) == 2 && pointInRings(x, y, ringsB) == 2)
          pts += ((x, y))
      }
      // an A VERTEX sitting on B's boundary is a touch the cut lists
      // do not record (it cuts B's edge, not A's)
      Seq((e.sx, e.sy), (e.ex, e.ey)).foreach { case (x, y) =>
        if (pointInRings(x, y, ringsB) == 2) pts += ((x, y))
      }
    }
    pts.toSeq
  }

  private def pointsGeom(pts: Seq[(Double, Double)]): Geom =
    if (pts.isEmpty) GPolygon(Array.empty)
    else if (pts.length == 1) GPoint(pts.head._1, pts.head._2)
    else GMultiPoint(pts.flatMap(p => Seq(p._1, p._2)).toArray)

  /** Merge subs into maximal chains (undirected linework). */
  private def mergeChains(subs: Seq[Sub]): Array[Coords] = {
    // dedup undirected duplicates (a shared edge appears once per side)
    val uniq = subs.map { s =>
      if (s.sx < s.ex || (s.sx == s.ex && s.sy <= s.ey)) s else s.rev
    }.distinct
    val used = Array.fill(uniq.length)(false)
    val adj = scala.collection.mutable.HashMap
      .empty[(Double, Double), List[Int]].withDefaultValue(Nil)
    uniq.zipWithIndex.foreach { case (s, i) =>
      adj((s.sx, s.sy)) = i :: adj((s.sx, s.sy))
      adj((s.ex, s.ey)) = i :: adj((s.ex, s.ey))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Coords]
    uniq.indices.foreach { start =>
      if (!used(start)) {
        used(start) = true
        val s0 = uniq(start)
        val chain = scala.collection.mutable.ArrayBuffer(s0.sx, s0.sy, s0.ex, s0.ey)
        var cont = true
        while (cont) {
          val tail = (chain(chain.length - 2), chain(chain.length - 1))
          adj(tail).find(!used(_)) match {
            case Some(i) =>
              used(i) = true
              val n = uniq(i)
              if ((n.sx, n.sy) == tail) { chain += n.ex; chain += n.ey }
              else { chain += n.sx; chain += n.sy }
            case None => cont = false
          }
        }
        // the walk above only grows the tail; a chain whose list-order
        // first sub sits mid-chain (e.g. shared linework wrapping a
        // ring's start vertex) still has unused subs hanging off the
        // HEAD — grow backwards too, or "maximal chains" splits
        cont = true
        while (cont) {
          val head = (chain(0), chain(1))
          adj(head).find(!used(_)) match {
            case Some(i) =>
              used(i) = true
              val n = uniq(i)
              if ((n.ex, n.ey) == head) chain.insertAll(0, Seq(n.sx, n.sy))
              else chain.insertAll(0, Seq(n.ex, n.ey))
            case None => cont = false
          }
        }
        out += chain.toArray
      }
    }
    out.toArray
  }

  private def linesGeom(runs: Array[Coords]): Geom =
    if (runs.isEmpty) GPolygon(Array.empty)
    else if (runs.length == 1) GLineString(runs(0))
    else GMultiLineString(runs)

  // ------------------------------------------- family dispatch (API)
  /** Per-family decomposition (unlike Prims, polygon rings do NOT leak
    * into the line runs) — the basis for cross-family and collection
    * overlay. */
  private def split3(g: Geom): (Array[Double], Array[Coords], Array[Array[Coords]]) =
    g match {
      case p: GPoint =>
        (if (p.isEmpty) Array.empty[Double] else Array(p.x, p.y),
          Array.empty[Coords], Array.empty[Array[Coords]])
      case GMultiPoint(p) => (p, Array.empty[Coords], Array.empty[Array[Coords]])
      case GLineString(p) => (Array.empty[Double], Array(p), Array.empty[Array[Coords]])
      case GMultiLineString(ls) => (Array.empty[Double], ls, Array.empty[Array[Coords]])
      case GPolygon(rs) => (Array.empty[Double], Array.empty[Coords], Array(rs))
      case GMultiPolygon(ps) => (Array.empty[Double], Array.empty[Coords], ps)
      case GGeometryCollection(gs) =>
        val parts = gs.map(split3)
        (parts.flatMap(_._1), parts.flatMap(_._2), parts.flatMap(_._3))
    }

  /** Pairwise tree-union of polygon operands through polyOverlay
    * directly (no per-step validation — for KERNEL-INTERNAL pieces
    * whose validity is by construction): O(log n) depth instead of a
    * linear fold's O(n) re-noding of the whole accumulation. */
  private[functions] def polyUnionTree(ps: Seq[Array[Coords]]): Array[Array[Coords]] = {
    if (ps.isEmpty) return Array.empty
    def merge(a: Array[Array[Coords]], b: Array[Array[Coords]]): Array[Array[Coords]] =
      polyOverlay("union", a, b) match {
        case GPolygon(rs) => if (rs.isEmpty) Array.empty else Array(rs)
        case GMultiPolygon(pp) => pp
        case other => throw new IllegalStateException(
          s"polygon union produced a ${typeName(other)}")
      }
    var level: Seq[Array[Array[Coords]]] = ps.map(rs => Array(rs))
    while (level.length > 1)
      level = level.grouped(2).map {
        case Seq(a, b) => merge(a, b)
        case Seq(a) => a
      }.toSeq
    level.head
  }

  private def packPolys(ps: Array[Array[Coords]]): Geom =
    if (ps.isEmpty) GPolygon(Array.empty)
    else if (ps.length == 1) GPolygon(ps(0))
    else GMultiPolygon(ps)

  /** Cross-family / collection union: polygons union pairwise, lines
    * node mutually then drop pieces covered by the polygon area, points
    * dedup then drop those covered by lines or polygons — the GEOS
    * union semantics. The result is the single surviving family, or a
    * GEOMETRYCOLLECTION of the (at most three) family geometries. */
  private def genericUnion(g1: Geom, g2: Geom, validate: Boolean = true): Geom = {
    val (pts1, runs1, polys1) = split3(g1)
    val (pts2, runs2, polys2) = split3(g2)
    val allPolys = polys1 ++ polys2
    // validate USER polygon pieces here — the direct polygon×polygon
    // path validates its operands, and a collection must not smuggle a
    // self-intersecting ring past that surface (round-17 review)
    if (validate) allPolys.foreach(rs => requireValid(GPolygon(rs), "st_union"))
    val polyU: Array[Array[Coords]] = polyUnionTree(allPolys.toSeq)
    val allRuns = runs1 ++ runs2
    val lineU: Array[Coords] =
      if (allRuns.isEmpty) Array.empty
      else {
        val noded = allRuns.map(r => Array(r)).reduce { (a, b) =>
          lineLineUnion(a, b) match {
            case GLineString(p) => Array(p)
            case GMultiLineString(ls) => ls
            case _ => Array.empty[Coords]
          }
        }
        if (polyU.isEmpty) noded
        else clipLine(noded, polyU, loc => loc == 0)._1
      }
    val ptsU: Array[Double] = {
      val set = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      var i = 0
      while (i < pts1.length) { set += ((pts1(i), pts1(i + 1))); i += 2 }
      i = 0
      while (i < pts2.length) { set += ((pts2(i), pts2(i + 1))); i += 2 }
      val polyGeomOpt = if (polyU.isEmpty) None else Some(packPolys(polyU))
      val polyPrims = polyGeomOpt.map(prims)
      def onLines(x: Double, y: Double): Boolean = lineU.exists { c =>
        var k = 0
        while (k + 3 < c.length) {
          if (onSegment(x, y, c(k), c(k + 1), c(k + 2), c(k + 3))) return true
          k += 2
        }
        false
      }
      set.toArray.filterNot { case (x, y) =>
        polyGeomOpt.zip(polyPrims).exists { case (pg, pp) =>
          locOf(x, y, pg, pp, Array.empty) != 0 } || onLines(x, y)
      }.flatMap(p => Array(p._1, p._2))
    }
    val members = Seq.newBuilder[Geom]
    if (polyU.nonEmpty) members += packPolys(polyU)
    if (lineU.nonEmpty) members += linesGeomStrict(lineU)
    if (ptsU.nonEmpty) members += pointsGeomStrict(ptsU)
    members.result() match {
      case Seq() => GPolygon(Array.empty)
      case Seq(one) => one
      case many => GGeometryCollection(many.toArray)
    }
  }

  private def linesGeomStrict(runs: Array[Coords]): Geom =
    if (runs.length == 1) GLineString(runs(0)) else GMultiLineString(runs)
  private def pointsGeomStrict(pts: Array[Double]): Geom =
    if (pts.length == 2) GPoint(pts(0), pts(1)) else GMultiPoint(pts)

  private def isColl(g: Geom): Boolean = g.isInstanceOf[GGeometryCollection]

  private def polysOf(g: Geom): Option[Array[Array[Coords]]] = g match {
    case GPolygon(rs) => Some(Array(rs))
    case GMultiPolygon(ps) => Some(ps)
    case _ => None
  }
  private def runsOf(g: Geom): Option[Array[Coords]] = g match {
    case GLineString(p) => Some(Array(p))
    case GMultiLineString(ls) => Some(ls)
    case _ => None
  }
  private def ptsOf(g: Geom): Option[Coords] = g match {
    case p: GPoint => Some(if (p.isEmpty) Array.empty else Array(p.x, p.y))
    case GMultiPoint(p) => Some(p)
    case _ => None
  }
  private def famName(g: Geom): String = typeName(g)

  /** Clip a line family against a polygon family: keep the sub-
    * segments whose midpoint class is in `keep`. */
  private def clipLine(runs: Array[Coords], polys: Array[Array[Coords]],
                       keep: Int => Boolean): (Array[Coords], Seq[(Double, Double)]) = {
    val rings = polys.flatten
    val el = edgesOf(runs) // open runs cut the same way closed rings do
    val ep = edgesOf(rings)
    node(el, ep)
    val idx = new RingIndex(rings)
    val subs = el.flatMap(split).toSeq
    val kept = subs.filter(s => keep(idx.locate(s.mx, s.my)))
    // isolated touch points: line vertices / cut points ON the polygon
    // boundary not covered by a kept sub
    val touched = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
    el.foreach { e =>
      (e.cuts.toSeq ++ Seq((e.sx, e.sy), (e.ex, e.ey))).foreach { case (x, y) =>
        if (pointInRings(x, y, rings) == 2 &&
            !kept.exists(s => onSegment(x, y, s.sx, s.sy, s.ex, s.ey)))
          touched += ((x, y))
      }
    }
    (mergeChains(kept), touched.toSeq)
  }

  def intersection(g1: Geom, g2: Geom): Geom = {
    if (g1.isEmpty || g2.isEmpty) return GPolygon(Array.empty)
    // collections distribute: A ∩ (∪ Bi) = ∪ (A ∩ Bi)
    (g1, g2) match {
      case (GGeometryCollection(gs), _) =>
        return gs.map(intersection(_, g2)).filterNot(_.isEmpty)
          .foldLeft(GPolygon(Array.empty): Geom)(union)
      case (_, GGeometryCollection(gs)) =>
        return gs.map(intersection(g1, _)).filterNot(_.isEmpty)
          .foldLeft(GPolygon(Array.empty): Geom)(union)
      case _ =>
    }
    (ptsOf(g1), ptsOf(g2)) match {
      case (Some(pa), _) => return filterPts(pa, g2, in = true)
      case (_, Some(pb)) => return filterPts(pb, g1, in = true)
      case _ =>
    }
    (polysOf(g1), polysOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        requireValid(g1, "st_intersection"); requireValid(g2, "st_intersection")
        return polyOverlay("intersection", pa, pb)
      case _ =>
    }
    (runsOf(g1), polysOf(g2)) match {
      case (Some(rs), Some(pb)) =>
        requireValid(g2, "st_intersection")
        val (lines, pts) = clipLine(rs, pb, loc => loc == 1 || loc == 2)
        return mixed("st_intersection", lines, pts)
      case _ =>
    }
    (polysOf(g1), runsOf(g2)) match {
      case (Some(_), Some(_)) => return intersection(g2, g1)
      case _ =>
    }
    (runsOf(g1), runsOf(g2)) match {
      case (Some(ra), Some(rb)) => return lineLineIntersection(ra, rb)
      case _ =>
    }
    throw new IllegalArgumentException(
      s"st_intersection: unsupported operand families ${famName(g1)} × ${famName(g2)}")
  }

  /** Line×line: collinear overlap stretches (dim 1) + isolated
    * crossing/touch points (dim 0); a result mixing both returns a
    * GEOMETRYCOLLECTION via [[mixed]] (collections landed round 17 —
    * this doc predated them and claimed a by-name failure). */
  private def lineLineIntersection(ra: Array[Coords], rb: Array[Coords]): Geom = {
    val ea = edgesOf(ra)
    val eb = edgesOf(rb)
    node(ea, eb)
    val subsB = eb.flatMap(split).toSeq
    val overlap = ea.flatMap(split).filter { s =>
      subsB.exists(o =>
        orient(o.sx, o.sy, o.ex, o.ey, s.sx, s.sy) == 0 &&
          orient(o.sx, o.sy, o.ex, o.ey, s.ex, s.ey) == 0 &&
          onSegment(s.mx, s.my, o.sx, o.sy, o.ex, o.ey))
    }.toSeq
    val pts = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
    def onRuns(x: Double, y: Double, runs: Array[Coords]): Boolean = {
      var r = 0
      while (r < runs.length) {
        val c = runs(r)
        var i = 0
        while (i + 3 < c.length) {
          if (onSegment(x, y, c(i), c(i + 1), c(i + 2), c(i + 3))) return true
          i += 2
        }
        r += 1
      }
      false
    }
    ea.foreach { e =>
      // cut points ARE intersection events by construction — an
      // interpolated proper crossing is generally NOT exactly collinear
      // with the other segment, so re-verifying it with the exact
      // onSegment test would drop it (round-17 review finding)
      e.cuts.foreach { case (x, y) =>
        if (!overlap.exists(s => onSegment(x, y, s.sx, s.sy, s.ex, s.ey)))
          pts += ((x, y))
      }
      // raw endpoints still need the membership check
      Seq((e.sx, e.sy), (e.ex, e.ey)).foreach { case (x, y) =>
        if (onRuns(x, y, rb) &&
            !overlap.exists(s => onSegment(x, y, s.sx, s.sy, s.ex, s.ey)))
          pts += ((x, y))
      }
    }
    mixed("st_intersection", mergeChains(overlap), pts.toSeq)
  }

  private def mixed(fn: String, lines: Array[Coords],
                    pts: Seq[(Double, Double)]): Geom =
    if (lines.nonEmpty && pts.nonEmpty) GGeometryCollection(Array(
      linesGeomStrict(lines), pointsGeomStrict(pts.flatMap(p => Seq(p._1, p._2)).toArray)))
    else if (lines.nonEmpty) linesGeom(lines)
    else pointsGeom(pts)

  private def filterPts(pts: Coords, other: Geom, in: Boolean): Geom = {
    val p = prims(other)
    val bnd = other match {
      case _: GLineString | _: GMultiLineString => lineBoundaryPts(p.runs)
      case _ => Array.empty[Double]
    }
    val kept = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < pts.length) {
      val inside = locOf(pts(i), pts(i + 1), other, p, bnd) != 0
      if (inside == in) { kept += pts(i); kept += pts(i + 1) }
      i += 2
    }
    if (kept.isEmpty) GPolygon(Array.empty)
    else if (kept.length == 2) GPoint(kept(0), kept(1))
    else GMultiPoint(kept.toArray)
  }

  def union(g1: Geom, g2: Geom): Geom = unionImpl(g1, g2, validate = true)

  /** Union for KERNEL-INTERNAL callers whose operands are already
    * validated (aggregate partials, prior overlay outputs): skips the
    * per-step O(E²) operand re-validation, which otherwise re-runs at
    * every level of a tree union over geometry the kernel itself
    * produced (tools/GeoProfile: the validation was most of
    * geometry_union_agg's cost, not the overlay). Semantics on valid
    * input are identical to [[union]]. */
  private[functions] def unionTrusted(g1: Geom, g2: Geom): Geom =
    unionImpl(g1, g2, validate = false)

  /** Operand validation, exposed for aggregate buffers that validate
    * each USER input once on entry and then merge via
    * [[unionTrusted]]. Only polygonal pieces are checked — the same
    * surface [[union]]/[[genericUnion]] validate. */
  private[functions] def requireValidPolys(g: Geom, fn: String): Unit = g match {
    case _: GPolygon | _: GMultiPolygon => requireValid(g, fn)
    case GGeometryCollection(gs) => gs.foreach(requireValidPolys(_, fn))
    case _ =>
  }

  private def unionImpl(g1: Geom, g2: Geom, validate: Boolean): Geom = {
    if (g1.isEmpty) return g2
    if (g2.isEmpty) return g1
    (ptsOf(g1), ptsOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        val set = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
        var i = 0
        while (i < pa.length) { set += ((pa(i), pa(i + 1))); i += 2 }
        i = 0
        while (i < pb.length) { set += ((pb(i), pb(i + 1))); i += 2 }
        return pointsGeom(set.toSeq)
      case _ =>
    }
    (polysOf(g1), polysOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        if (validate) { requireValid(g1, "st_union"); requireValid(g2, "st_union") }
        return polyOverlay("union", pa, pb)
      case _ =>
    }
    (runsOf(g1), runsOf(g2)) match {
      case (Some(ra), Some(rb)) => return lineLineUnion(ra, rb)
      case _ =>
    }
    // cross-family or collection operands: family-wise union; a
    // lower-dimensional piece covered by a higher one is absorbed, an
    // uncovered one survives into a GEOMETRYCOLLECTION (round 17 —
    // previously a named error)
    genericUnion(g1, g2, validate)
  }

  private def famOrder(g: Geom): Int = g match {
    case _: GPoint | _: GMultiPoint => 0
    case _: GLineString | _: GMultiLineString => 1
    case _ => 2
  }

  /** Line ∪ line: the mutually noded sub-segments, deduped — exact
    * union linework (collinear overlaps collapse to one copy). */
  private def lineLineUnion(ra: Array[Coords], rb: Array[Coords]): Geom = {
    val ea = edgesOf(ra)
    val eb = edgesOf(rb)
    node(ea, eb)
    linesGeom(mergeChains((ea.flatMap(split) ++ eb.flatMap(split)).toSeq))
  }

  def difference(g1: Geom, g2: Geom): Geom = {
    if (g1.isEmpty) return g1
    if (g2.isEmpty) return g1
    // collections distribute: (∪ Ai) − B = ∪ (Ai − B); A − (∪ Bi)
    // folds the subtractions
    (g1, g2) match {
      case (GGeometryCollection(gs), _) =>
        return gs.map(difference(_, g2)).filterNot(_.isEmpty)
          .foldLeft(GPolygon(Array.empty): Geom)(union)
      case (_, GGeometryCollection(gs)) =>
        return gs.foldLeft(g1)((acc, b) => if (acc.isEmpty) acc else difference(acc, b))
      case _ =>
    }
    // subtracting a LOWER-dimensional geometry removes nothing
    if (famOrder(g2) < famOrder(g1)) return g1
    (ptsOf(g1), g2) match {
      case (Some(pa), _) => return filterPts(pa, g2, in = false)
      case _ =>
    }
    (polysOf(g1), polysOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        requireValid(g1, "st_difference"); requireValid(g2, "st_difference")
        return polyOverlay("difference", pa, pb)
      case _ =>
    }
    (runsOf(g1), polysOf(g2)) match {
      case (Some(rs), Some(pb)) =>
        requireValid(g2, "st_difference")
        val (lines, _) = clipLine(rs, pb, loc => loc == 0)
        return linesGeom(lines)
      case _ =>
    }
    (runsOf(g1), runsOf(g2)) match {
      case (Some(ra), Some(rb)) =>
        val ea = edgesOf(ra)
        val eb = edgesOf(rb)
        node(ea, eb)
        val subsB = eb.flatMap(split).toSeq
        val kept = ea.flatMap(split).filterNot { s =>
          subsB.exists(o =>
            orient(o.sx, o.sy, o.ex, o.ey, s.sx, s.sy) == 0 &&
              orient(o.sx, o.sy, o.ex, o.ey, s.ex, s.ey) == 0 &&
              onSegment(s.mx, s.my, o.sx, o.sy, o.ex, o.ey))
        }.toSeq
        return linesGeom(mergeChains(kept))
      case _ =>
    }
    throw new IllegalArgumentException(
      s"st_difference: unsupported operand families ${famName(g1)} − ${famName(g2)}")
  }

  def symDifference(g1: Geom, g2: Geom): Geom = {
    if (g1.isEmpty) return g2
    if (g2.isEmpty) return g1
    // mixed families and collections go through the identity
    // A △ B = (A − B) ∪ (B − A); same-family pairs keep their direct
    // kernels below
    if (isColl(g1) || isColl(g2) || famOrder(g1) != famOrder(g2))
      return union(difference(g1, g2), difference(g2, g1))
    (ptsOf(g1), ptsOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        def key(c: Coords) = {
          val s = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
          var i = 0
          while (i < c.length) { s += ((c(i), c(i + 1))); i += 2 }
          s
        }
        val (sa, sb) = (key(pa), key(pb))
        return pointsGeom(((sa diff sb) ++ (sb diff sa)).toSeq)
      case _ =>
    }
    (polysOf(g1), polysOf(g2)) match {
      case (Some(pa), Some(pb)) =>
        requireValid(g1, "st_symdifference"); requireValid(g2, "st_symdifference")
        return polyOverlay("symdifference", pa, pb)
      case _ =>
    }
    (runsOf(g1), runsOf(g2)) match {
      case (Some(ra), Some(rb)) =>
        val d1 = difference(GMultiLineString(ra), GMultiLineString(rb))
        val d2 = difference(GMultiLineString(rb), GMultiLineString(ra))
        (runsOf(d1).getOrElse(Array.empty[Coords]),
         runsOf(d2).getOrElse(Array.empty[Coords])) match {
          case (a, b) => return linesGeom(mergeChains(
            (edgesOf(a) ++ edgesOf(b)).map(e => Sub(e.sx, e.sy, e.ex, e.ey)).toSeq))
        }
      case _ =>
    }
    throw new IllegalArgumentException(
      s"st_symdifference: unsupported operand families ${famName(g1)} △ ${famName(g2)}")
  }

  // ---------------------------------------------------------- buffer
  /** Tessellated-arc buffer (the standard GEOS approach): circular
    * arcs are approximated by `quadSegs` chords per quarter circle
    * (default 8, Presto/GEOS default), so a point buffers to a regular
    * 4·quadSegs-gon INSCRIBED in the true circle — area converges to
    * πr² from below as quadSegs grows; the divergence from exact arcs
    * is the standard published one. Positive distance = dilate
    * (union of the geometry with per-segment capsules), negative =
    * erode (polygon minus the capsules along its boundary), zero =
    * identity. */
  def buffer(g: Geom, dist: Double, quadSegs: Int = 8): Geom = {
    if (dist == 0.0) return g
    if (g.isEmpty) return GPolygon(Array.empty)
    require(quadSegs >= 1, "st_buffer: quadrant segments must be >= 1")
    val r = math.abs(dist)
    // Snap-round every generated arc vertex (and the running result
    // between union/difference steps) to a dyadic grid ~2⁻³⁰ of the
    // radius: caps of adjacent capsules sample the SAME circle at
    // angles like 0 vs 2π, whose cos/sin differ by ~1e-16 — without
    // snapping those near-identical vertices, the overlay's exact
    // orient tests see phantom micro-crossings and stitching falls
    // apart. The snap perturbs areas by O(perimeter·r·2⁻³⁰), far under
    // the tessellation error the function already documents; exact
    // dyadic inputs (integer test fixtures, the radius itself) snap to
    // themselves.
    val grid = java.lang.Math.scalb(1.0, java.lang.Math.getExponent(r) - 30)
    def snap(v: Double): Double = {
      val s = math.rint(v / grid) * grid
      if (s.isNaN || s.isInfinite) v else s
    }
    def snapGeom(gm: Geom): Geom = gm match {
      case GPolygon(rs) => GPolygon(rs.map(_.map(snap)))
      case GMultiPolygon(ps) => GMultiPolygon(ps.map(_.map(_.map(snap))))
      case other => other
    }
    def circle(cx: Double, cy: Double): Array[Coords] = {
      val n = 4 * quadSegs
      val c = new Array[Double](2 * (n + 1))
      var i = 0
      while (i <= n) {
        val a = 2 * math.Pi * i / n
        c(2 * i) = snap(cx + r * math.cos(a))
        c(2 * i + 1) = snap(cy + r * math.sin(a))
        i += 1
      }
      // exact closure (cos/sin of 2π are not bit-exactly cos/sin of 0)
      c(2 * n) = c(0); c(2 * n + 1) = c(1)
      Array(c)
    }
    def capsule(x1: Double, y1: Double, x2: Double, y2: Double): Array[Coords] = {
      if (x1 == x2 && y1 == y2) return circle(x1, y1)
      val dx = x2 - x1; val dy = y2 - y1
      val len = math.hypot(dx, dy)
      val base = math.atan2(dy, dx)
      val pts = scala.collection.mutable.ArrayBuffer.empty[Double]
      val n = 2 * quadSegs // half-circle per cap
      // cap around (x2,y2): from base-π/2 sweeping CCW to base+π/2
      var i = 0
      while (i <= n) {
        val a = base - math.Pi / 2 + math.Pi * i / n
        pts += snap(x2 + r * math.cos(a)); pts += snap(y2 + r * math.sin(a))
        i += 1
      }
      // cap around (x1,y1): from base+π/2 CCW to base+3π/2
      i = 0
      while (i <= n) {
        val a = base + math.Pi / 2 + math.Pi * i / n
        pts += snap(x1 + r * math.cos(a)); pts += snap(y1 + r * math.sin(a))
        i += 1
      }
      pts += pts(0); pts += pts(1)
      Array(pts.toArray)
    }
    val p = prims(g)
    def capsFrom(runs: Array[Coords]): Seq[Array[Coords]] = {
      val pieces = scala.collection.mutable.ArrayBuffer.empty[Array[Coords]]
      runs.foreach { c =>
        var k = 0
        while (k + 3 < c.length) {
          if (!(c(k) == c(k + 2) && c(k + 1) == c(k + 3)))
            pieces += capsule(c(k), c(k + 1), c(k + 2), c(k + 3))
          k += 2
        }
        if (c.length == 2) pieces += circle(c(0), c(1))
      }
      pieces.toSeq
    }
    // the INPUT is validated once; the capsules/circles and every
    // intermediate are kernel-made and valid by construction, so the
    // combination runs as an O(log n)-depth tree union of snapped
    // pieces rather than a linear fold that re-validates and re-nodes
    // the whole accumulation per piece (round-17 review)
    if (p.polys.nonEmpty) requireValid(g, "st_buffer")
    if (dist > 0) {
      val circles = scala.collection.mutable.ArrayBuffer.empty[Array[Coords]]
      var i = 0
      while (i < p.points.length) {
        circles += circle(p.points(i), p.points(i + 1))
        i += 2
      }
      val all = p.polys.toSeq ++ circles.toSeq ++ capsFrom(p.runs)
      snapGeom(packPolys(polyUnionTree(all)))
    } else {
      if (p.polys.isEmpty) throw new IllegalArgumentException(
        "st_buffer: negative distance requires a polygonal geometry")
      // erosion subtracts the r-neighbourhood of the POLYGONAL boundary
      // only: a collection's point/line members have an empty negative
      // buffer and must not punch holes in the polygon members (their
      // measure-zero area adds nothing to the eroded set either)
      val capsU = polyUnionTree(capsFrom(p.polys.flatten))
      if (capsU.isEmpty) packPolys(p.polys)
      else snapGeom(polyOverlay("difference", p.polys, capsU))
    }
  }
}
