package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planar geospatial function family (Presto's `ST_*` surface).
  *
  * The reference registers the entire Presto scalar library in one line
  * (`axiom/optimizer/tests/AxiomSql.cpp:149`), which pulls in Velox's
  * geospatial functions; no reference test exercises them, so semantics
  * here follow the published Presto/OGC behavior: planar 2-D Euclidean
  * geometry, WKT/WKB interchange, strict-interior `ST_Contains`,
  * closure-touching `ST_Intersects`.
  *
  * Geometry values travel as standard little-endian WKB in a
  * BinaryType column — a compact, shuffle-friendly encoding any OGC
  * tool can read back. All seven geometry types are supported (POINT,
  * MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON, MULTIPOLYGON,
  * and — as of round 17 — GEOMETRYCOLLECTION); the constructive ops
  * (ST_Union, ST_Intersection, ST_Difference, ST_SymDifference,
  * ST_Buffer) live in [[GeoOverlay]], and the geometry aggregates
  * (convex_hull_agg, geometry_union_agg) in [[GeoAgg]]. The DE-9IM
  * relate family rejects collections by name (no single family-row
  * mapping); everything else — accessors, measures, closure
  * predicates, overlay — takes them.
  *
  * Expressions are CodegenFallback like [[NativeExprs]]: each row's
  * work is a geometry-kernel loop (point-in-polygon, segment pair
  * scans), so the one interpreted virtual call per row is noise against
  * the kernel itself, and everything around these calls stays inside
  * whole-stage codegen.
  *
  * == Geography capability table (round 18) ==
  *
  * Geography values (SRID-4326-flagged EWKB from `to_spherical_geography`)
  * are a distinct family: spherical kernels on the 6371.01 km sphere
  * Presto's great_circle_distance documents. What they CAN and CANNOT do:
  *
  * | surface | geography | where |
  * |---|---|---|
  * | to_spherical_geography / to_geometry | yes (round-trip) | [[toSphericalGeography]] / [[geographyToGeom]] |
  * | st_distance | yes — geodesic meters, any type pair | [[geographyDistance]] |
  * | st_area | yes — spherical excess, m² | [[geographyArea]] |
  * | st_length | yes — geodesic segment sums, m | [[geographyLength]] |
  * | great_circle_distance (lat/lon doubles) | yes — km | registry |
  * | relate/predicates (contains, intersects, relate, …) | NO — rejected by name | [[fromWkb]] |
  * | constructive overlay (union, intersection, difference, buffer) | NO — rejected by name | [[fromWkb]] via [[GeoOverlay]] |
  * | aggregates (convex_hull_agg, geometry_union_agg) | NO — rejected by name | [[fromWkb]] via [[GeoAgg]] |
  * | accessors/transforms (st_x, st_centroid, st_simplify, …) | NO — rejected by name | [[fromWkb]] |
  *
  * The single choke point is [[fromWkb]]: every planar kernel decodes
  * through it, and it rejects the SRID flag with an error naming the
  * geography-capable set — so "geography can't do X" is one invariant,
  * not N scattered checks (GeoSpec pins the error surface). Presto's
  * geography type has the same shape (a small spherical function set;
  * planar functions reject), with ellipsoidal rather than spherical
  * kernels — that divergence is documented at [[geographyDistance]].
  */
object GeoFns {

  // ---------------------------------------------------------------- model

  /** Packed coordinate sequence: (x0,y0,x1,y1,…). */
  type Coords = Array[Double]

  sealed trait Geom { def isEmpty: Boolean }
  /** x = NaN encodes POINT EMPTY (the usual WKB convention). */
  final case class GPoint(x: Double, y: Double) extends Geom {
    def isEmpty: Boolean = x.isNaN
  }
  final case class GMultiPoint(pts: Coords) extends Geom {
    def isEmpty: Boolean = pts.isEmpty
  }
  final case class GLineString(pts: Coords) extends Geom {
    def isEmpty: Boolean = pts.isEmpty
  }
  final case class GMultiLineString(lines: Array[Coords]) extends Geom {
    def isEmpty: Boolean = lines.isEmpty
  }
  /** rings(0) is the shell; the rest are holes. Rings are closed
    * (first point repeated last). */
  final case class GPolygon(rings: Array[Coords]) extends Geom {
    def isEmpty: Boolean = rings.isEmpty
  }
  final case class GMultiPolygon(polys: Array[Array[Coords]]) extends Geom {
    def isEmpty: Boolean = polys.isEmpty
  }
  /** Heterogeneous collection (round 17). Nested collections are kept
    * as parsed (OGC allows them); an all-empty collection IS empty. */
  final case class GGeometryCollection(geoms: Array[Geom]) extends Geom {
    def isEmpty: Boolean = geoms.forall(_.isEmpty)
  }

  def typeName(g: Geom): String = g match {
    case _: GPoint => "Point"
    case _: GLineString => "LineString"
    case _: GPolygon => "Polygon"
    case _: GMultiPoint => "MultiPoint"
    case _: GMultiLineString => "MultiLineString"
    case _: GMultiPolygon => "MultiPolygon"
    case _: GGeometryCollection => "GeometryCollection"
  }

  // ---------------------------------------------------------------- WKB

  import java.nio.{ByteBuffer, ByteOrder}

  private def putCoords(b: ByteBuffer, c: Coords): Unit = {
    b.putInt(c.length / 2)
    var i = 0
    while (i < c.length) { b.putDouble(c(i)); i += 1 }
  }

  private def wkbSize(g: Geom): Int = g match {
    case _: GPoint => 5 + 16
    case GMultiPoint(p) => 9 + (p.length / 2) * 21
    case GLineString(p) => 9 + p.length * 8
    case GMultiLineString(ls) => 9 + ls.map(l => 9 + l.length * 8).sum
    case GPolygon(rs) => 9 + rs.map(r => 4 + r.length * 8).sum
    case GMultiPolygon(ps) => 9 + ps.map(rs => 9 + rs.map(r => 4 + r.length * 8).sum).sum
    case GGeometryCollection(gs) => 9 + gs.map(wkbSize).sum
  }

  def toWkb(g: Geom): Array[Byte] = {
    val b = ByteBuffer.allocate(wkbSize(g)).order(ByteOrder.LITTLE_ENDIAN)
    def header(code: Int): Unit = { b.put(1.toByte); b.putInt(code) }
    g match {
      case GPoint(x, y) => header(1); b.putDouble(x); b.putDouble(y)
      case GLineString(p) => header(2); putCoords(b, p)
      case GPolygon(rs) =>
        header(3); b.putInt(rs.length); rs.foreach(putCoords(b, _))
      case GMultiPoint(p) =>
        header(4); b.putInt(p.length / 2)
        var i = 0
        while (i < p.length) { header(1); b.putDouble(p(i)); b.putDouble(p(i + 1)); i += 2 }
      case GMultiLineString(ls) =>
        header(5); b.putInt(ls.length)
        ls.foreach { l => header(2); putCoords(b, l) }
      case GMultiPolygon(ps) =>
        header(6); b.putInt(ps.length)
        ps.foreach { rs => header(3); b.putInt(rs.length); rs.foreach(putCoords(b, _)) }
      case GGeometryCollection(gs) =>
        header(7); b.putInt(gs.length)
        gs.foreach(g2 => b.put(toWkb(g2)))
    }
    b.array()
  }

  /** EWKB SRID flag: a geography value (to_spherical_geography) is the
    * geometry's WKB with this bit set on the top-level type and SRID
    * 4326 following it. Plain-geometry functions reject it by name. */
  private val SridFlag = 0x20000000
  private val Wgs84 = 4326

  def isGeography(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 5) return false
    val b = ByteBuffer.wrap(bytes)
    val order = b.get()
    b.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    (b.getInt() & SridFlag) != 0
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    if (isGeography(bytes))
      throw new IllegalArgumentException(
        "geography value (SRID-flagged EWKB): only the geography-capable " +
        "functions (st_distance, st_area, st_length, to_geometry) accept it " +
        "- convert with to_geometry for relate/overlay/buffer (planar-only; " +
        "see the geography capability table in GeoFns' scaladoc)")
    try fromWkbInner(bytes)
    catch {
      case _: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(
          s"not WKB: truncated geometry (${bytes.length} bytes)")
    }
  }

  /** Strip the EWKB geography tag back to a plain geometry. */
  def geographyToGeom(bytes: Array[Byte]): Geom = {
    if (!isGeography(bytes)) throw new IllegalArgumentException(
      "to_geometry expects a geography value (use st_geometryfromtext for WKT)")
    val b = ByteBuffer.wrap(bytes)
    val order = b.get()
    b.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val typ = b.getInt() & ~SridFlag
    val srid = b.getInt()
    if (srid != Wgs84) throw new IllegalArgumentException(
      s"geography SRID must be $Wgs84, got $srid")
    val rest = new Array[Byte](b.remaining())
    b.get(rest)
    val out = ByteBuffer.allocate(5 + rest.length).order(b.order())
    out.put(if (order == 0) 0.toByte else 1.toByte)
    out.putInt(typ)
    out.put(rest)
    fromWkb(out.array())
  }

  /** Tag a lon/lat geometry as spherical geography (EWKB SRID 4326),
    * validating coordinate ranges like Presto does. */
  def toSphericalGeography(bytes: Array[Byte]): Array[Byte] = {
    if (isGeography(bytes)) throw new IllegalArgumentException(
      "to_spherical_geography: input is already a geography value")
    val g = fromWkb(bytes)
    val vs = vertsOf(g)
    var i = 0
    while (i < vs.length) {
      if (vs(i) < -180 || vs(i) > 180 || vs(i + 1) < -90 || vs(i + 1) > 90)
        throw new IllegalArgumentException(
          s"to_spherical_geography: (${vs(i)}, ${vs(i + 1)}) is not a valid " +
          "longitude/latitude pair")
      i += 2
    }
    val plain = toWkb(g) // canonical little-endian
    val b = ByteBuffer.wrap(plain).order(ByteOrder.LITTLE_ENDIAN)
    b.get()
    val typ = b.getInt()
    val rest = new Array[Byte](b.remaining())
    b.get(rest)
    val out = ByteBuffer.allocate(9 + rest.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(1.toByte)
    out.putInt(typ | SridFlag)
    out.putInt(Wgs84)
    out.put(rest)
    out.array()
  }

  // ------------------------------------------------ spherical measures
  // All geography math runs on the same 6371.01 km sphere Presto's
  // great_circle_distance documents (not the WGS84 ellipsoid — the
  // divergence from Presto's ellipsoidal geography kernels is the same
  // one geographyDistance already documents for points). Shapes are
  // lon/lat with great-circle edges; rings are assumed smaller than a
  // hemisphere (the area normalization picks the smaller cap).
  private val EarthKm = 6371.01

  private def geoVec(lon: Double, lat: Double): Array[Double] = {
    val phi = math.toRadians(lat); val lam = math.toRadians(lon)
    Array(math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam), math.sin(phi))
  }
  private def vCross(a: Array[Double], b: Array[Double]): Array[Double] =
    Array(a(1) * b(2) - a(2) * b(1), a(2) * b(0) - a(0) * b(2), a(0) * b(1) - a(1) * b(0))
  private def vDot(a: Array[Double], b: Array[Double]): Double =
    a(0) * b(0) + a(1) * b(1) + a(2) * b(2)
  private def vNorm(a: Array[Double]): Double = math.sqrt(vDot(a, a))
  private def vUnit(a: Array[Double]): Array[Double] = {
    val n = vNorm(a)
    if (n == 0) a else Array(a(0) / n, a(1) / n, a(2) / n)
  }
  /** Central angle between unit vectors — atan2 form, stable near 0/π. */
  private def vAngle(a: Array[Double], b: Array[Double]): Double =
    math.atan2(vNorm(vCross(a, b)), vDot(a, b))

  /** Signed spherical excess of a closed ring (radians² on the unit
    * sphere) via Gauss–Bonnet: Σ signed turning angles = 2π − A for a
    * CCW ring; the result is normalized to the smaller cap. */
  private def ringSphericalArea(ring: Coords): Double = {
    // drop the closing duplicate and consecutive duplicates
    val vsB = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var i = 0
    while (i + 1 < ring.length - 2) {
      val v = geoVec(ring(i), ring(i + 1))
      if (vsB.isEmpty || vNorm(vCross(vsB.last, v)) > 0) vsB += v
      i += 2
    }
    if (vsB.length >= 2 && vNorm(vCross(vsB.head, vsB.last)) == 0) vsB.remove(vsB.length - 1)
    val vs = vsB.toArray
    val n = vs.length
    if (n < 3) return 0.0
    var turn = 0.0
    i = 0
    while (i < n) {
      val prev = vs((i + n - 1) % n); val v = vs(i); val nxt = vs((i + 1) % n)
      def toward(a: Array[Double]) =
        vUnit(Array(a(0) - vDot(v, a) * v(0), a(1) - vDot(v, a) * v(1),
          a(2) - vDot(v, a) * v(2)))
      val tIn = { val t = toward(prev); Array(-t(0), -t(1), -t(2)) }
      val tOut = toward(nxt)
      turn += math.atan2(vDot(vCross(tIn, tOut), v), vDot(tIn, tOut))
      i += 1
    }
    val a = 2 * math.Pi - turn
    val full = 4 * math.Pi
    val aNorm = ((a % full) + full) % full
    math.min(aNorm, full - aNorm)
  }

  /** Geography ST_Area in m² (spherical excess × R²); non-polygonal
    * geographies are 0, matching the planar convention. */
  def geographyArea(bytes: Array[Byte]): Double = {
    def polyArea(rings: Array[Coords]): Double =
      if (rings.isEmpty) 0.0
      else ringSphericalArea(rings(0)) - rings.drop(1).map(ringSphericalArea).sum
    def of(g: Geom): Double = g match {
      case GPolygon(rs) => polyArea(rs)
      case GMultiPolygon(ps) => ps.map(polyArea).sum
      case GGeometryCollection(gs) => gs.map(of).sum // like planar area()
      case _ => 0.0
    }
    of(geographyToGeom(bytes)) * EarthKm * EarthKm * 1e6
  }

  /** Geography ST_Length in METERS: geodesic segment sums. */
  def geographyLength(bytes: Array[Byte]): Double = {
    def runLen(c: Coords): Double = {
      var s = 0.0
      var i = 0
      while (i + 3 < c.length) {
        s += greatCircleDistance(c(i + 1), c(i), c(i + 3), c(i + 2))
        i += 2
      }
      s
    }
    geographyToGeom(bytes) match {
      case GLineString(p) => runLen(p) * 1000.0
      case GMultiLineString(ls) => ls.map(runLen).sum * 1000.0
      case other => throw new IllegalArgumentException(
        s"ST_Length requires a LineString or MultiLineString, got ${typeName(other)}")
    }
  }

  /** Geodesic distance (radians) from point p to the great-circle arc
    * a→b: the in-arc perpendicular foot when it exists (sign tests
    * against the circle normal), else the nearer endpoint. */
  private def pointToArc(p: Array[Double], a: Array[Double],
                         b: Array[Double]): Double = {
    val nrm = vCross(a, b)
    if (vNorm(nrm) < 1e-15) return math.min(vAngle(p, a), vAngle(p, b))
    val f = vUnit(vCross(vCross(nrm, p), nrm)) // nearest point on the full circle
    val inArc = vDot(vCross(a, f), nrm) >= 0 && vDot(vCross(f, b), nrm) >= 0
    if (inArc && vNorm(vCross(vCross(nrm, p), nrm)) > 0) vAngle(p, f)
    else math.min(vAngle(p, a), vAngle(p, b))
  }

  /** Do two great-circle arcs (each < half circle) intersect? Both
    * candidate circle intersections are tested for arc membership. */
  private def arcsCross(a: Array[Double], b: Array[Double],
                        c: Array[Double], d: Array[Double]): Boolean = {
    val n1 = vCross(a, b); val n2 = vCross(c, d)
    // a degenerate (zero-length) arc has no great circle of its own; it
    // cannot "cross" anything — without this guard n1 = 0 makes the
    // same-circle branch vacuously true against EVERY arc and a
    // consecutive duplicate vertex would report distance 0 to anywhere
    // (the endpoint-to-arc candidates in arcToArc still handle the
    // point-on-arc = 0 case exactly)
    if (vNorm(n1) < 1e-15 || vNorm(n2) < 1e-15) return false
    val ix = vCross(n1, n2)
    if (vNorm(ix) < 1e-15) {
      // same great circle: overlap iff some endpoint lies on the other arc
      def on(p: Array[Double], s: Array[Double], e: Array[Double], nn: Array[Double]) =
        vDot(vCross(s, p), nn) >= 0 && vDot(vCross(p, e), nn) >= 0
      return on(c, a, b, n1) || on(d, a, b, n1) || on(a, c, d, n2) || on(b, c, d, n2)
    }
    val i1 = vUnit(ix)
    Seq(i1, Array(-i1(0), -i1(1), -i1(2))).exists { p =>
      vDot(vCross(a, p), n1) >= 0 && vDot(vCross(p, b), n1) >= 0 &&
        vDot(vCross(c, p), n2) >= 0 && vDot(vCross(p, d), n2) >= 0
    }
  }

  /** Min geodesic distance (radians) between two arcs: 0 on crossing,
    * else endpoint-to-arc feet plus the closest-approach points of the
    * two circles (where one circle is nearest the other's plane). */
  private def arcToArc(a: Array[Double], b: Array[Double],
                       c: Array[Double], d: Array[Double]): Double = {
    if (arcsCross(a, b, c, d)) return 0.0
    var best = math.min(
      math.min(pointToArc(a, c, d), pointToArc(b, c, d)),
      math.min(pointToArc(c, a, b), pointToArc(d, a, b)))
    val n1 = vCross(a, b); val n2 = vCross(c, d)
    // skip for degenerate or COPLANAR circles (n2 ∥ n1 makes the
    // candidate the zero vector, whose vAngle to anything is 0 — the
    // endpoint candidates above already cover the same-circle case)
    val m = vCross(n2, n1)
    if (vNorm(n1) > 1e-15 && vNorm(n2) > 1e-15 && vNorm(m) > 1e-15) {
      // points on circle 1 extremizing distance to circle 2's plane
      val p = vCross(vUnit(n1), vUnit(m))
      Seq(vUnit(p), vUnit(Array(-p(0), -p(1), -p(2)))).foreach { cand =>
        if (vDot(vCross(a, cand), n1) >= 0 && vDot(vCross(cand, b), n1) >= 0)
          best = math.min(best, pointToArc(cand, c, d))
      }
    }
    best
  }

  /** Spherical winding point-in-ring-set: the total signed angle swept
    * at p by each ring's vertices is ±2π per enclosing ring, ~0
    * otherwise (p assumed not ON an edge — callers check boundary
    * distance first). Even-odd over all rings, like the planar kernel. */
  private def sphericalPointInRings(p: Array[Double], rings: Array[Coords]): Boolean = {
    var crossings = 0
    rings.foreach { ring =>
      var sweep = 0.0
      var i = 0
      while (i + 3 < ring.length) {
        val v1 = geoVec(ring(i), ring(i + 1))
        val v2 = geoVec(ring(i + 2), ring(i + 3))
        def toward(a: Array[Double]) =
          vUnit(Array(a(0) - vDot(p, a) * p(0), a(1) - vDot(p, a) * p(1),
            a(2) - vDot(p, a) * p(2)))
        val t1 = toward(v1); val t2 = toward(v2)
        sweep += math.atan2(vDot(vCross(t1, t2), p), vDot(t1, t2))
        i += 2
      }
      if (math.abs(sweep) > math.Pi) crossings += 1
    }
    (crossings & 1) == 1
  }

  /** Geodesic ST_Distance in METERS between geography values of any
    * family pair: segment-to-segment candidate minimization with
    * crossing/containment zero checks. */
  def geographyDistance(a: Array[Byte], b: Array[Byte]): Any = {
    val ga = geographyToGeom(a); val gb = geographyToGeom(b)
    if (ga.isEmpty || gb.isEmpty) return null
    (ga, gb) match {
      // keep the haversine formula for the point pair (bit-compatible
      // with great_circle_distance and the committed oracle rounding)
      case (p: GPoint, q: GPoint) =>
        return greatCircleDistance(p.y, p.x, q.y, q.x) * 1000.0
      case _ =>
    }
    val pa = prims(ga); val pb = prims(gb)
    def vecsOfPts(c: Coords): Array[Array[Double]] =
      Array.tabulate(c.length / 2)(i => geoVec(c(2 * i), c(2 * i + 1)))
    def segs(p: Prims): (Array[(Array[Double], Array[Double])], Array[Array[Double]]) = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Array[Double])]
      val orphans = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      p.runs.foreach { c =>
        var i = 0
        var emitted = false
        while (i + 3 < c.length) {
          // skip zero-length arcs (consecutive duplicate vertices) —
          // they carry no great circle and their endpoint is already
          // probed by the shared-vertex neighbour segments
          if (c(i) != c(i + 2) || c(i + 1) != c(i + 3)) {
            out += ((geoVec(c(i), c(i + 1)), geoVec(c(i + 2), c(i + 3))))
            emitted = true
          }
          i += 2
        }
        // a run that is ALL duplicate vertices degenerates to a point;
        // keep it as a point probe so it still participates in
        // containment and distance
        if (!emitted && c.length >= 2) orphans += geoVec(c(0), c(1))
      }
      (out.toArray, orphans.toArray)
    }
    val (segA, orphanA) = segs(pa); val (segB, orphanB) = segs(pb)
    val ptsA = vecsOfPts(pa.points) ++ orphanA
    val ptsB = vecsOfPts(pb.points) ++ orphanB
    // containment: ANY vertex of one operand inside the other's polygon
    // area zeroes the distance (every standalone point and every
    // segment endpoint is probed — a component wholly inside has all
    // its vertices inside, and one only partially inside crosses the
    // boundary, which the arc-to-arc pass below already zeroes)
    def probes(pts: Array[Array[Double]],
               ss: Array[(Array[Double], Array[Double])]): Iterator[Array[Double]] =
      pts.iterator ++ ss.iterator.flatMap(s => Iterator(s._1, s._2))
    def insidePoly(p: Prims, vs: Iterator[Array[Double]]): Boolean =
      p.polys.nonEmpty && vs.exists(v =>
        p.polys.exists(rings => sphericalPointInRings(v, rings)))
    if (insidePoly(pa, probes(ptsB, segB)) ||
        insidePoly(pb, probes(ptsA, segA))) return 0.0
    var best = Double.MaxValue
    ptsA.foreach { p => ptsB.foreach(q => best = math.min(best, vAngle(p, q))) }
    ptsA.foreach { p => segB.foreach { case (c, d) =>
      best = math.min(best, pointToArc(p, c, d)) } }
    ptsB.foreach { p => segA.foreach { case (c, d) =>
      best = math.min(best, pointToArc(p, c, d)) } }
    segA.foreach { case (s1, e1) => segB.foreach { case (s2, e2) =>
      best = math.min(best, arcToArc(s1, e1, s2, e2)) } }
    if (best == Double.MaxValue) throw new IllegalArgumentException(
      "geography st_distance: empty primitive decomposition")
    best * EarthKm * 1000.0
  }

  private def fromWkbInner(bytes: Array[Byte]): Geom = {
    val b = ByteBuffer.wrap(bytes)
    // a declared count must be non-negative and fit the remaining bytes
    // (perUnit = the MINIMUM bytes one unit needs), else a corrupt
    // header would silently parse as EMPTY (negative → Array.fill = 0
    // elements) or attempt a multi-GB allocation
    def checkedCount(perUnit: Int): Int = {
      val n = b.getInt()
      if (n < 0 || n.toLong * perUnit > b.remaining())
        throw new IllegalArgumentException(
          s"not WKB: implausible element count $n with ${b.remaining()} bytes left")
      n
    }
    def geom(): Geom = {
      val order = b.get()
      b.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      def coords(): Coords = {
        val n = checkedCount(16)
        val c = new Array[Double](n * 2)
        var i = 0
        while (i < c.length) { c(i) = b.getDouble(); i += 1 }
        c
      }
      b.getInt() match {
        case 1 => GPoint(b.getDouble(), b.getDouble())
        case 2 => GLineString(coords())
        case 3 => GPolygon(Array.fill(checkedCount(4))(coords()))
        case 4 =>
          val n = checkedCount(21)
          val c = new Array[Double](n * 2)
          var i = 0
          while (i < n) {
            geom() match {
              case GPoint(x, y) => c(2 * i) = x; c(2 * i + 1) = y
              case other => throw new IllegalArgumentException(
                s"WKB MultiPoint member is a ${typeName(other)}")
            }
            i += 1
          }
          GMultiPoint(c)
        case 5 => GMultiLineString(Array.fill(checkedCount(9)) {
          geom() match {
            case GLineString(p) => p
            case other => throw new IllegalArgumentException(
              s"WKB MultiLineString member is a ${typeName(other)}")
          }
        })
        case 6 => GMultiPolygon(Array.fill(checkedCount(9)) {
          geom() match {
            case GPolygon(rs) => rs
            case other => throw new IllegalArgumentException(
              s"WKB MultiPolygon member is a ${typeName(other)}")
          }
        })
        case 7 => GGeometryCollection(Array.fill(checkedCount(5))(geom()))
        case t => throw new IllegalArgumentException(s"unsupported WKB geometry type $t")
      }
    }
    geom()
  }

  // ---------------------------------------------------------------- WKT

  /** Integral coordinates print without a decimal point ("POINT (1 2)"),
    * the Presto rendering; everything else uses Double.toString. */
  private def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def coordsText(c: Coords): String = {
    val sb = new StringBuilder("(")
    var i = 0
    while (i < c.length) {
      if (i > 0) sb.append(", ")
      sb.append(fmt(c(i))).append(' ').append(fmt(c(i + 1)))
      i += 2
    }
    sb.append(')').toString
  }

  def toWkt(g: Geom): String = {
    val name = typeName(g).toUpperCase
    if (g.isEmpty) return s"$name EMPTY"
    g match {
      case GPoint(x, y) => s"POINT (${fmt(x)} ${fmt(y)})"
      case GLineString(p) => s"LINESTRING ${coordsText(p)}"
      case GMultiPoint(p) =>
        // Presto emits the parenthesized per-point form
        val items = (0 until p.length / 2)
          .map(i => s"(${fmt(p(2 * i))} ${fmt(p(2 * i + 1))})")
        s"MULTIPOINT (${items.mkString(", ")})"
      case GPolygon(rs) => s"POLYGON (${rs.map(coordsText).mkString(", ")})"
      case GMultiLineString(ls) =>
        s"MULTILINESTRING (${ls.map(coordsText).mkString(", ")})"
      case GMultiPolygon(ps) =>
        s"MULTIPOLYGON (${ps.map(rs => s"(${rs.map(coordsText).mkString(", ")})").mkString(", ")})"
      case GGeometryCollection(gs) =>
        s"GEOMETRYCOLLECTION (${gs.map(toWkt).mkString(", ")})"
    }
  }

  def parseWkt(s: String): Geom = {
    val t = new WktTokens(s)
    val g = t.geometry()
    t.end()
    g
  }

  private final class WktTokens(s: String) {
    private var i = 0
    private def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def word(): String = {
      skipWs()
      val start = i
      while (i < s.length && (s.charAt(i).isLetter)) i += 1
      if (i == start) throw new IllegalArgumentException(
        s"WKT: expected a geometry keyword at offset $start in '$s'")
      s.substring(start, i).toUpperCase
    }
    private def expect(c: Char): Unit = {
      skipWs()
      if (i >= s.length || s.charAt(i) != c)
        throw new IllegalArgumentException(s"WKT: expected '$c' at offset $i in '$s'")
      i += 1
    }
    private def peek(): Char = { skipWs(); if (i < s.length) s.charAt(i) else '\u0000' }
    private def number(): Double = {
      skipWs()
      val start = i
      while (i < s.length && "+-.0123456789eE".indexOf(s.charAt(i)) >= 0) i += 1
      if (i == start) throw new IllegalArgumentException(
        s"WKT: expected a number at offset $start in '$s'")
      s.substring(start, i).toDouble
    }
    private def isEmptyTag(): Boolean = {
      skipWs()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; true } else false
    }
    private def pointPair(): (Double, Double) = { val x = number(); val y = number(); (x, y) }
    private def coordList(): Coords = {
      expect('(')
      val buf = Array.newBuilder[Double]
      var done = false
      while (!done) {
        val (x, y) = pointPair()
        buf += x; buf += y
        if (peek() == ',') expect(',') else { expect(')'); done = true }
      }
      buf.result()
    }
    private def ringList(): Array[Coords] = {
      expect('(')
      val rings = Array.newBuilder[Coords]
      var done = false
      while (!done) {
        rings += coordList()
        if (peek() == ',') expect(',') else { expect(')'); done = true }
      }
      rings.result()
    }
    def geometry(): Geom = word() match {
      case "POINT" =>
        if (isEmptyTag()) GPoint(Double.NaN, Double.NaN)
        else { expect('('); val (x, y) = pointPair(); expect(')'); GPoint(x, y) }
      case "LINESTRING" =>
        if (isEmptyTag()) GLineString(Array.empty) else GLineString(coordList())
      case "POLYGON" =>
        if (isEmptyTag()) GPolygon(Array.empty)
        else GPolygon(ringList().map(closeRing))
      case "MULTIPOINT" =>
        if (isEmptyTag()) GMultiPoint(Array.empty)
        else {
          // both MULTIPOINT (1 2, 3 4) and MULTIPOINT ((1 2), (3 4))
          expect('(')
          val buf = Array.newBuilder[Double]
          var done = false
          while (!done) {
            if (peek() == '(') { expect('('); val (x, y) = pointPair(); expect(')'); buf += x; buf += y }
            else { val (x, y) = pointPair(); buf += x; buf += y }
            if (peek() == ',') expect(',') else { expect(')'); done = true }
          }
          GMultiPoint(buf.result())
        }
      case "MULTILINESTRING" =>
        if (isEmptyTag()) GMultiLineString(Array.empty) else GMultiLineString(ringList())
      case "MULTIPOLYGON" =>
        if (isEmptyTag()) GMultiPolygon(Array.empty)
        else {
          expect('(')
          val polys = Array.newBuilder[Array[Coords]]
          var done = false
          while (!done) {
            polys += ringList().map(closeRing)
            if (peek() == ',') expect(',') else { expect(')'); done = true }
          }
          GMultiPolygon(polys.result())
        }
      case "GEOMETRYCOLLECTION" =>
        if (isEmptyTag()) GGeometryCollection(Array.empty)
        else {
          expect('(')
          val gs = Array.newBuilder[Geom]
          var done = false
          while (!done) {
            gs += geometry()
            if (peek() == ',') expect(',') else { expect(')'); done = true }
          }
          GGeometryCollection(gs.result())
        }
      case other => throw new IllegalArgumentException(s"WKT: unknown geometry type '$other'")
    }
    def end(): Unit = {
      skipWs()
      if (i != s.length)
        throw new IllegalArgumentException(s"WKT: trailing content at offset $i in '$s'")
    }
  }

  /** Rings must be closed; tolerate WKT that omits the closing point. */
  private def closeRing(c: Coords): Coords = {
    if (c.length < 6) throw new IllegalArgumentException(
      s"WKT: a polygon ring needs at least 3 distinct points, got ${c.length / 2}")
    if (c(0) == c(c.length - 2) && c(1) == c(c.length - 1)) c
    else c ++ Array(c(0), c(1))
  }

  // ------------------------------------------------------------- kernels

  /** 2-D cross product sign: >0 counter-clockwise, <0 clockwise, 0 collinear. */
  private[functions] def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  private[functions] def onSegment(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Boolean =
    orient(ax, ay, bx, by, px, py) == 0.0 &&
      px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)

  /** Closed-segment intersection (touching counts), incl. collinear overlap. */
  private[functions] def segIntersects(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
        ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))) return true
    (o1 == 0 && onSegment(cx, cy, ax, ay, bx, by)) ||
      (o2 == 0 && onSegment(dx, dy, ax, ay, bx, by)) ||
      (o3 == 0 && onSegment(ax, ay, cx, cy, dx, dy)) ||
      (o4 == 0 && onSegment(bx, by, cx, cy, dx, dy))
  }

  /** Proper crossing only: interior-interior, non-collinear. */
  private[functions] def segProperCross(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    ((o1 > 0 && o2 < 0) || (o1 < 0 && o2 > 0)) &&
      ((o3 > 0 && o4 < 0) || (o3 < 0 && o4 > 0))
  }

  /** 0 = outside, 1 = inside, 2 = on boundary. Even-odd over ALL rings,
    * so holes come out as outside and islands-in-holes would nest. */
  private[functions] def pointInRings(px: Double, py: Double, rings: Array[Coords]): Int = {
    var crossings = 0
    var r = 0
    while (r < rings.length) {
      val c = rings(r)
      var i = 0
      while (i + 3 < c.length) {
        val ax = c(i); val ay = c(i + 1); val bx = c(i + 2); val by = c(i + 3)
        if (onSegment(px, py, ax, ay, bx, by)) return 2
        // ray to +x: count edges straddling the horizontal line through p
        if ((ay > py) != (by > py)) {
          val xAt = ax + (py - ay) * (bx - ax) / (by - ay)
          if (xAt > px) crossings += 1
        }
        i += 2
      }
      r += 1
    }
    if ((crossings & 1) == 1) 1 else 0
  }

  private def distPointPoint(ax: Double, ay: Double, bx: Double, by: Double): Double =
    math.hypot(ax - bx, ay - by)

  private def distPointSeg(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    if (len2 == 0) return distPointPoint(px, py, ax, ay)
    val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    distPointPoint(px, py, ax + t * dx, ay + t * dy)
  }

  private def distSegSeg(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Double = {
    if (segIntersects(ax, ay, bx, by, cx, cy, dx, dy)) 0.0
    else math.min(
      math.min(distPointSeg(ax, ay, cx, cy, dx, dy), distPointSeg(bx, by, cx, cy, dx, dy)),
      math.min(distPointSeg(cx, cy, ax, ay, bx, by), distPointSeg(dx, dy, ax, ay, bx, by)))
  }

  /** Decomposition for the pairwise predicates/distance: standalone
    * points, line/ring segments (as packed coord runs), polygons. */
  private[functions] final case class Prims(points: Coords, runs: Array[Coords],
      polys: Array[Array[Coords]])

  private[functions] def prims(g: Geom): Prims = g match {
    case p: GPoint =>
      Prims(if (p.isEmpty) Array.empty else Array(p.x, p.y), Array.empty, Array.empty)
    case GMultiPoint(p) => Prims(p, Array.empty, Array.empty)
    case GLineString(p) => Prims(Array.empty, Array(p), Array.empty)
    case GMultiLineString(ls) => Prims(Array.empty, ls, Array.empty)
    case GPolygon(rs) => Prims(Array.empty, rs, Array(rs))
    case GMultiPolygon(ps) => Prims(Array.empty, ps.flatten, ps)
    case GGeometryCollection(gs) =>
      val parts = gs.map(prims)
      Prims(parts.flatMap(_.points), parts.flatMap(_.runs), parts.flatMap(_.polys))
  }

  private def eachSeg(runs: Array[Coords])(f: (Double, Double, Double, Double) => Boolean): Boolean = {
    var r = 0
    while (r < runs.length) {
      val c = runs(r)
      var i = 0
      while (i + 3 < c.length) {
        if (f(c(i), c(i + 1), c(i + 2), c(i + 3))) return true
        i += 2
      }
      r += 1
    }
    false
  }

  private def allVerts(p: Prims): Coords = p.points ++ p.runs.flatten

  /** Every vertex of the geometry as packed (x,y) coords — the
    * convex-hull aggregate's input view. */
  def vertsOf(g: Geom): Coords = allVerts(prims(g))

  def intersects(g1: Geom, g2: Geom): Boolean = {
    if (g1.isEmpty || g2.isEmpty) return false
    val a = prims(g1); val b = prims(g2)
    // any segment pair touching
    if (eachSeg(a.runs)((ax, ay, bx, by) =>
      eachSeg(b.runs)((cx, cy, dx, dy) => segIntersects(ax, ay, bx, by, cx, cy, dx, dy))))
      return true
    // point-on-segment / point-point across sides
    def ptsTouch(pts: Coords, other: Prims): Boolean = {
      var i = 0
      while (i < pts.length) {
        val px = pts(i); val py = pts(i + 1)
        var j = 0
        while (j < other.points.length) {
          if (px == other.points(j) && py == other.points(j + 1)) return true
          j += 2
        }
        if (eachSeg(other.runs)((ax, ay, bx, by) => onSegment(px, py, ax, ay, bx, by)))
          return true
        i += 2
      }
      false
    }
    if (ptsTouch(a.points, b) || ptsTouch(b.points, a)) return true
    // containment without boundary contact: any vertex of one inside a
    // polygon of the other (closure form — boundary already handled)
    def anyVertexIn(verts: Coords, polys: Array[Array[Coords]]): Boolean = {
      var p = 0
      while (p < polys.length) {
        var i = 0
        while (i < verts.length) {
          if (pointInRings(verts(i), verts(i + 1), polys(p)) != 0) return true
          i += 2
        }
        p += 1
      }
      false
    }
    anyVertexIn(allVerts(a), b.polys) || anyVertexIn(allVerts(b), a.polys)
  }

  /** OGC/Presto ST_Contains: no point of g2 in the exterior of g1, and
    * the interiors intersect. Exact for simple (non-self-intersecting)
    * inputs: all of g2's vertices must be in g1's closure, no edge of
    * g2 may properly cross a ring of g1, and at least one vertex or
    * edge midpoint of g2 must be strictly interior (a g2 lying entirely
    * ON g1's boundary is not contained). Only polygonal g1 can contain. */
  /** Parameters t ∈ [0,1] along segment P→Q at which it meets any ring
    * edge — proper crossings, endpoint touches, and both ends of
    * collinear overlaps. 0 and 1 are always included, so consecutive
    * values bound sub-segments that are entirely on one side of the
    * boundary (a straight segment cannot cross a boundary between two
    * recorded hits). */
  private def boundaryTs(px: Double, py: Double, qx: Double, qy: Double,
      rings: Array[Coords]): Array[Double] = {
    val ts = scala.collection.mutable.ArrayBuffer(0.0, 1.0)
    def tOf(x: Double, y: Double): Double =
      if (math.abs(qx - px) >= math.abs(qy - py)) {
        if (qx == px) 0.0 else (x - px) / (qx - px)
      } else (y - py) / (qy - py)
    def add(t: Double): Unit = if (t > 0.0 && t < 1.0) ts += t
    var r = 0
    while (r < rings.length) {
      val c = rings(r)
      var i = 0
      while (i + 3 < c.length) {
        val ax = c(i); val ay = c(i + 1); val bx = c(i + 2); val by = c(i + 3)
        val o1 = orient(px, py, qx, qy, ax, ay)
        val o2 = orient(px, py, qx, qy, bx, by)
        if (o1 == 0 && o2 == 0) {
          // collinear edge: both projected endpoints bound an on-boundary stretch
          if (onSegment(ax, ay, px, py, qx, qy) || onSegment(bx, by, px, py, qx, qy) ||
              onSegment(px, py, ax, ay, bx, by)) {
            add(math.max(0.0, math.min(1.0, tOf(ax, ay))))
            add(math.max(0.0, math.min(1.0, tOf(bx, by))))
          }
        } else if (segProperCross(px, py, qx, qy, ax, ay, bx, by)) {
          val o3 = orient(ax, ay, bx, by, px, py)
          val o4 = orient(ax, ay, bx, by, qx, qy)
          add(o3 / (o3 - o4))
        } else {
          if (o1 == 0 && onSegment(ax, ay, px, py, qx, qy)) add(tOf(ax, ay))
          if (o2 == 0 && onSegment(bx, by, px, py, qx, qy)) add(tOf(bx, by))
        }
        i += 2
      }
      r += 1
    }
    ts.toArray.sorted
  }

  /** An interior point of a simple closed ring set (shell + holes).
    * Fast path: the centroid of some shell-vertex "ear" triangle that
    * lands strictly inside. When holes crowd every ear centroid (all
    * candidates land in a hole or outside a concave shell), fall back
    * to exact scanline bisection: sweep a horizontal line at the
    * midpoint between consecutive distinct vertex y-levels of ALL
    * rings — such a line hits no vertex, so every edge crossing is a
    * proper straddle, the crossings partition the line into uniform
    * in/out intervals, and any positive-area polygon has a band whose
    * gap midpoint is interior. None only for genuinely zero-area
    * rings. */
  private[functions] def interiorPointOf(rings: Array[Coords]): Option[(Double, Double)] = {
    if (rings.isEmpty) return None
    val shell = rings(0)
    val n = shell.length / 2 - 1 // closed: last == first
    var i = 0
    while (i < n) {
      val p = (i + n - 1) % n
      val q = (i + 1) % n
      val cx = (shell(2 * p) + shell(2 * i) + shell(2 * q)) / 3
      val cy = (shell(2 * p + 1) + shell(2 * i + 1) + shell(2 * q + 1)) / 3
      if (pointInRings(cx, cy, rings) == 1) return Some((cx, cy))
      i += 1
    }
    // scanline fallback
    val ys = {
      val b = Array.newBuilder[Double]
      rings.foreach { r => var k = 1; while (k < r.length) { b += r(k); k += 2 } }
      b.result().distinct.sorted
    }
    var lvl = 0
    while (lvl + 1 < ys.length) {
      val sy = (ys(lvl) + ys(lvl + 1)) / 2
      if (sy > ys(lvl) && sy < ys(lvl + 1)) { // adjacent doubles can collapse the band
        val xs = Array.newBuilder[Double]
        rings.foreach { r =>
          var k = 0
          while (k + 3 < r.length) {
            val ay = r(k + 1); val by = r(k + 3)
            if ((ay < sy) != (by < sy))
              xs += r(k) + (sy - ay) / (by - ay) * (r(k + 2) - r(k))
            k += 2
          }
        }
        val sorted = xs.result().sorted
        var j = 0
        while (j + 1 < sorted.length) {
          if (sorted(j + 1) > sorted(j)) {
            val cx = (sorted(j) + sorted(j + 1)) / 2
            if (pointInRings(cx, sy, rings) == 1) return Some((cx, sy))
          }
          j += 1
        }
      }
      lvl += 1
    }
    None
  }

  /** OGC/Presto ST_Contains: no point of g2 in the exterior of g1, and
    * the interiors intersect. Polygonal g1: every g2 segment is cut at
    * ALL its boundary hits ([[boundaryTs]]) and each sub-segment's
    * midpoint is located exactly — no vertex/midpoint sampling, so
    * concave shells, notch traversals, and boundary-only geometries
    * classify correctly; a polygonal g2 additionally must not swallow a
    * hole of g1, and its interior witness ([[interiorPointOf]]) decides
    * the equal/boundary-aligned cases. Linear g1 contains Point/
    * MultiPoint (on a segment, not solely at the line's boundary
    * endpoints); linear-vs-linear containment routes through the DE-9IM
    * matrix (round 16 — T*****FF*). Point g1 contains exactly its own
    * point set. */
  def contains(g1: Geom, g2: Geom): Boolean = {
    if (g1.isEmpty || g2.isEmpty) return false
    val a = prims(g1)
    val b = prims(g2)
    if (a.polys.isEmpty && a.runs.nonEmpty && (b.runs.nonEmpty || b.polys.nonEmpty)) {
      if (b.polys.nonEmpty) return false // a 1-dim set cannot contain a 2-dim one
      val m = relateCells(g1, g2)
      return m(0) >= 0 && m(6) == -1 && m(7) == -1 // T*****FF*
    }
    if (a.polys.isEmpty) return containsNonPolygonal(a, b)
    def locate(px: Double, py: Double): Int = {
      var best = 0
      var p = 0
      while (p < a.polys.length) {
        val loc = pointInRings(px, py, a.polys(p))
        if (loc == 1) return 1
        if (loc == 2) best = math.max(best, 2)
        p += 1
      }
      best
    }
    var interiorSeen = false
    var i = 0
    while (i < b.points.length) {
      val loc = locate(b.points(i), b.points(i + 1))
      if (loc == 0) return false
      if (loc == 1) interiorSeen = true
      i += 2
    }
    val aRings = a.polys.flatten
    // exact per-segment classification: every sub-segment between
    // boundary hits is uniformly outside / inside / on-boundary
    var run = 0
    while (run < b.runs.length) {
      val c = b.runs(run)
      var s = 0
      while (s + 3 < c.length) {
        val px = c(s); val py = c(s + 1); val qx = c(s + 2); val qy = c(s + 3)
        if (px == qx && py == qy) {
          val loc = locate(px, py)
          if (loc == 0) return false
          if (loc == 1) interiorSeen = true
        } else {
          val ts = boundaryTs(px, py, qx, qy, aRings)
          var k = 0
          while (k + 1 < ts.length) {
            if (ts(k + 1) - ts(k) > 1e-12) {
              val tm = (ts(k) + ts(k + 1)) / 2
              val loc = locate(px + tm * (qx - px), py + tm * (qy - py))
              if (loc == 0) return false
              if (loc == 1) interiorSeen = true
            }
            k += 1
          }
        }
        s += 2
      }
      run += 1
    }
    if (b.polys.nonEmpty) {
      // a hole of g1 strictly inside g2 leaks g1's exterior into g2
      var p = 0
      while (p < a.polys.length) {
        val rings = a.polys(p)
        var h = 1
        while (h < rings.length) {
          val hx = rings(h)(0); val hy = rings(h)(1)
          if (b.polys.exists(r2 => pointInRings(hx, hy, r2) == 1)) return false
          h += 1
        }
        p += 1
      }
      if (!interiorSeen) {
        // boundary-aligned polygon (e.g. g2 == g1, or g2 filling a
        // hole): the witness point decides exactly
        b.polys.foreach { r2 =>
          interiorPointOf(r2).foreach { case (x, y) =>
            locate(x, y) match {
              case 0 => return false
              case 1 => interiorSeen = true
              case _ => ()
            }
          }
        }
      }
    }
    interiorSeen
  }

  private def containsNonPolygonal(a: Prims, b: Prims): Boolean = {
    if (a.runs.isEmpty) {
      // point-ish g1: contains exactly its own point set
      if (b.runs.nonEmpty || b.polys.nonEmpty) return false
      var i = 0
      while (i < b.points.length) {
        var found = false
        var j = 0
        while (j < a.points.length && !found) {
          found = a.points(j) == b.points(i) && a.points(j + 1) == b.points(i + 1)
          j += 2
        }
        if (!found) return false
        i += 2
      }
      b.points.nonEmpty
    } else {
      // linear-vs-linear was routed to the relate matrix by the caller
      // line boundary = endpoints of its OPEN runs; a point solely at
      // the boundary is not contained (matches ST_Contains semantics)
      val bnd = a.runs.iterator
        .filter(r => !(r(0) == r(r.length - 2) && r(1) == r(r.length - 1)))
        .flatMap(r => Iterator((r(0), r(1)), (r(r.length - 2), r(r.length - 1))))
        .toSet
      var interior = false
      var i = 0
      while (i < b.points.length) {
        val px = b.points(i); val py = b.points(i + 1)
        if (!eachSeg(a.runs)((ax, ay, bx, by) => onSegment(px, py, ax, ay, bx, by)))
          return false
        if (!bnd.contains((px, py))) interior = true
        i += 2
      }
      b.points.nonEmpty && interior
    }
  }

  // ------------------------------------------------------------- DE-9IM
  /** Exact DE-9IM relate kernel (round 16 — closes the last
    * named-unsupported predicate tail: st_touches / st_crosses /
    * st_overlaps / st_equals / st_relate all derive from this matrix).
    *
    * The matrix is computed by exhaustive boundary-cut classification,
    * the same discipline as [[contains]]: every segment of one
    * geometry's boundary is cut at ALL hits against the other's
    * ([[boundaryTs]]) and each sub-segment's midpoint located exactly,
    * so equal polygons, boundary-riding lines, and hole-filling cases
    * classify without heuristics. Line interiors use the OGC mod-2
    * boundary rule (odd-degree run endpoints are boundary; a closed
    * ring has none). Cells are dimensions (-1 = F); EE is always 2.
    *
    * Supported operand families are the six homogeneous Geom types;
    * GEOMETRYCOLLECTION (in the ADT since round 17) is rejected by
    * name in [[famOf]] — a heterogeneous collection has no single
    * family-row mapping, and Presto's relate surface rejects it too.
    * Order: II IB IE / BI BB BE / EI EB EE. */
  def relateMatrix(g1: Geom, g2: Geom): String = {
    val m = relateCells(g1, g2)
    m.map { case -1 => 'F'; case d => ('0' + d).toChar }.mkString
  }

  private def famOf(g: Geom): Int = g match {
    case _: GPoint | _: GMultiPoint => 0
    case _: GLineString | _: GMultiLineString => 1
    case _: GPolygon | _: GMultiPolygon => 2
    // DE-9IM over a heterogeneous collection has no single family row
    // mapping; Presto's relate surface rejects collections too
    case _: GGeometryCollection => throw new IllegalArgumentException(
      "GEOMETRYCOLLECTION is not supported in relate/predicate kernels " +
      "(accessors, measures, and the overlay ops accept it)")
  }

  /** Odd-degree run endpoints — the OGC mod-2 boundary of a line. */
  private[functions] def lineBoundaryPts(runs: Array[Coords]): Coords = {
    val deg = scala.collection.mutable.LinkedHashMap.empty[(Double, Double), Int]
    runs.foreach { r =>
      if (r.length >= 4) {
        val s = (r(0), r(1)); val e = (r(r.length - 2), r(r.length - 1))
        deg(s) = deg.getOrElse(s, 0) + 1
        deg(e) = deg.getOrElse(e, 0) + 1
      }
    }
    val b = Array.newBuilder[Double]
    deg.foreach { case ((x, y), d) => if ((d & 1) == 1) { b += x; b += y } }
    b.result()
  }

  private def isAt(pts: Coords, x: Double, y: Double): Boolean = {
    var i = 0
    while (i < pts.length) {
      if (pts(i) == x && pts(i + 1) == y) return true
      i += 2
    }
    false
  }

  /** Point class vs a geometry: 0 = exterior, 1 = interior, 2 = boundary. */
  private[functions] def locOf(px: Double, py: Double, g: Geom, p: Prims, lineBnd: Coords): Int =
    famOf(g) match {
      case 0 => if (isAt(p.points, px, py)) 1 else 0
      case 1 =>
        if (isAt(lineBnd, px, py)) 2
        else if (eachSeg(p.runs)((ax, ay, bx, by) => onSegment(px, py, ax, ay, bx, by))) 1
        else 0
      case _ =>
        var best = 0
        var i = 0
        while (i < p.polys.length) {
          val l = pointInRings(px, py, p.polys(i))
          if (l == 1) return 1
          if (l == 2) best = 2
          i += 1
        }
        best
    }

  /** Merged-interval coverage: is every sub-segment of `runs` collinear-
    * covered by some segment of `by`? (Exactness: an uncovered stretch
    * has positive parameter measure; hit parameters are computed the
    * same way [[boundaryTs]] computes them.) */
  private def coveredBy(runs: Array[Coords], by: Array[Coords]): Boolean = {
    var r = 0
    while (r < runs.length) {
      val c = runs(r)
      var i = 0
      while (i + 3 < c.length) {
        val px = c(i); val py = c(i + 1); val qx = c(i + 2); val qy = c(i + 3)
        if (!(px == qx && py == qy)) {
          def tOf(x: Double, y: Double): Double =
            if (math.abs(qx - px) >= math.abs(qy - py)) (x - px) / (qx - px)
            else (y - py) / (qy - py)
          val iv = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
          eachSeg(by) { (ax, ay, bx, by2) =>
            if (orient(px, py, qx, qy, ax, ay) == 0 &&
                orient(px, py, qx, qy, bx, by2) == 0) {
              val t1 = tOf(ax, ay); val t2 = tOf(bx, by2)
              val lo = math.max(0.0, math.min(t1, t2))
              val hi = math.min(1.0, math.max(t1, t2))
              if (hi > lo) iv += ((lo, hi))
            }
            false
          }
          val sorted = iv.sortBy(_._1)
          var cover = 0.0
          var ok = true
          sorted.foreach { case (lo, hi) =>
            if (ok) {
              if (lo > cover) ok = false else cover = math.max(cover, hi)
            }
          }
          if (!ok || cover < 1.0) return false
        }
        i += 2
      }
      r += 1
    }
    true
  }

  /** The nine DE-9IM cells as dims (-1 = F), row-major
    * (int/bnd/ext of g1) × (int/bnd/ext of g2). */
  private def relateCells(g1: Geom, g2: Geom): Array[Int] = {
    val m = Array.fill(9)(-1)
    m(8) = 2 // exteriors always meet (geometries are bounded)
    def up(cell: Int, d: Int): Unit = if (d > m(cell)) m(cell) = d
    val a = prims(g1); val b = prims(g2)
    val fa = famOf(g1); val fb = famOf(g2)
    val aBnd = if (fa == 1) lineBoundaryPts(a.runs) else Array.empty[Double]
    val bBnd = if (fb == 1) lineBoundaryPts(b.runs) else Array.empty[Double]
    def dimInt(f: Int) = f
    def dimBnd(f: Int, bnd: Coords): Int =
      if (f == 2) 1 else if (f == 1 && bnd.nonEmpty) 0 else -1
    if (g1.isEmpty || g2.isEmpty) {
      if (!g2.isEmpty) { up(6, dimInt(fb)); up(7, dimBnd(fb, bBnd)) }
      if (!g1.isEmpty) { up(2, dimInt(fa)); up(5, dimBnd(fa, aBnd)) }
      return m
    }
    // class-of-point helpers (0 ext, 1 int, 2 bnd) and the cell index
    // for a (classA, classB) pair: row = 2 - ... mapping int→0 bnd→1 ext→2
    def row(cls: Int) = if (cls == 1) 0 else if (cls == 2) 1 else 2
    def cell(ca: Int, cb: Int) = row(ca) * 3 + row(cb)
    def locA(x: Double, y: Double) = locOf(x, y, g1, a, aBnd)
    def locB(x: Double, y: Double) = locOf(x, y, g2, b, bBnd)
    // ---- standalone points of each side, located in the other
    def scanPts(pts: Coords, mine: Boolean): Unit = {
      var i = 0
      while (i < pts.length) {
        val c = if (mine) locB(pts(i), pts(i + 1)) else locA(pts(i), pts(i + 1))
        // a standalone point is its own interior
        if (mine) up(cell(1, c), 0) else up(cell(c, 1), 0)
        i += 2
      }
    }
    scanPts(a.points, mine = true)
    scanPts(b.points, mine = false)
    // point-family fills: a LINE/POLYGON side's interior/boundary minus
    // a finite point set keeps its dimension (point-vs-point EI/IE come
    // from the scans above instead)
    if (fa == 0 && fb > 0) {
      up(6, dimInt(fb))
      if (fb == 2) up(7, 1)
      else if (fb == 1) { // any B endpoint not in A's point set
        var i = 0
        while (i < bBnd.length) {
          if (!isAt(a.points, bBnd(i), bBnd(i + 1))) up(7, 0)
          i += 2
        }
      }
    }
    if (fb == 0 && fa > 0) {
      up(2, dimInt(fa))
      if (fa == 2) up(5, 1)
      else if (fa == 1) {
        var i = 0
        while (i < aBnd.length) {
          if (!isAt(b.points, aBnd(i), aBnd(i + 1))) up(5, 0)
          i += 2
        }
      }
    }
    // ---- line boundaries of each side, located in the other
    var i = 0
    while (i < aBnd.length) {
      up(cell(2, locB(aBnd(i), aBnd(i + 1))), 0); i += 2
    }
    i = 0
    while (i < bBnd.length) {
      up(cell(locA(bBnd(i), bBnd(i + 1)), 2), 0); i += 2
    }
    // ---- segment families
    (fa, fb) match {
      case (1, 1) => relateLineLine(a, b, aBnd, bBnd, up, cell, locA, locB)
      case (1, 2) =>
        relateLinePoly(a, aBnd, b, transpose = false, up, locB)
        up(6, 2) // polygon interior minus a line keeps dim 2
        if (!coveredBy(b.polys.flatten.toArray, a.runs)) up(7, 1)
      case (2, 1) =>
        relateLinePoly(b, bBnd, a, transpose = true, up, locA)
        up(2, 2)
        if (!coveredBy(a.polys.flatten.toArray, b.runs)) up(5, 1)
      case (2, 2) => relatePolyPoly(m, a, b, up, locA, locB)
      case _ => () // point families fully handled above
    }
    m
  }

  /** Line×line cells: collinear overlaps give dim-1 II; every isolated
    * meeting point is classified on BOTH lines (interior vs mod-2
    * boundary) into its exact cell; IE/EI by interval coverage. */
  private def relateLineLine(a: Prims, b: Prims, locABnd: Coords, locBBnd: Coords,
      up: (Int, Int) => Unit, cell: (Int, Int) => Int,
      locA: (Double, Double) => Int, locB: (Double, Double) => Int): Unit = {
    val pts = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
    eachSeg(a.runs) { (ax, ay, bx, by) =>
      eachSeg(b.runs) { (cx, cy, dx, dy) =>
        val col = orient(ax, ay, bx, by, cx, cy) == 0 &&
          orient(ax, ay, bx, by, dx, dy) == 0
        if (col) {
          // positive-length overlap ⇒ II = 1 (boundary sets are finite,
          // so the overlap's interior is interior of both lines)
          def tOf(x: Double, y: Double): Double =
            if (math.abs(bx - ax) >= math.abs(by - ay)) {
              if (bx == ax) 0.0 else (x - ax) / (bx - ax)
            } else if (by == ay) 0.0 else (y - ay) / (by - ay)
          val t1 = tOf(cx, cy); val t2 = tOf(dx, dy)
          if (math.min(1.0, math.max(t1, t2)) > math.max(0.0, math.min(t1, t2)))
            up(cell(1, 1), 1)
        } else if (segProperCross(ax, ay, bx, by, cx, cy, dx, dy)) {
          // The crossing point is strictly inside both SEGMENTS, but a
          // multilinestring's mod-2 boundary endpoint from ANOTHER run
          // can sit exactly there (its coordinates are exact vertex
          // coordinates, so the coincidence is decidable): a proper
          // cross has ONE intersection point, so if some boundary point
          // lies on both segments it IS the crossing — classify it
          // exactly instead of claiming interior×interior.
          var bndHit = false
          def scanBnd(bnd: Coords): Unit = {
            var k = 0
            while (k < bnd.length && !bndHit) {
              if (onSegment(bnd(k), bnd(k + 1), ax, ay, bx, by) &&
                  onSegment(bnd(k), bnd(k + 1), cx, cy, dx, dy)) {
                pts += ((bnd(k), bnd(k + 1)))
                bndHit = true
              }
              k += 2
            }
          }
          scanBnd(locABnd); scanBnd(locBBnd)
          if (!bndHit) up(cell(1, 1), 0)
        }
        // endpoint/vertex touches (incl. both ends of collinear
        // overlaps, which are always among the 4 segment endpoints) —
        // EXACT points, classified by location on each line
        if (onSegment(ax, ay, cx, cy, dx, dy)) pts += ((ax, ay))
        if (onSegment(bx, by, cx, cy, dx, dy)) pts += ((bx, by))
        if (onSegment(cx, cy, ax, ay, bx, by)) pts += ((cx, cy))
        if (onSegment(dx, dy, ax, ay, bx, by)) pts += ((dx, dy))
        false
      }
      false
    }
    pts.foreach { case (x, y) =>
      val ca = locA(x, y); val cb = locB(x, y)
      if (ca != 0 && cb != 0) up(cell(ca, cb), 0)
    }
    up(2, if (coveredBy(a.runs, b.runs)) -1 else 1)
    up(6, if (coveredBy(b.runs, a.runs)) -1 else 1)
  }

  /** Line×polygon cells (line side = `p`/`lBnd`; polygon side located
    * with `locPolySide`). `transpose` swaps rows/cols so the same body
    * serves the (2,1) orientation. */
  private def relateLinePoly(p: Prims, lBnd: Coords, poly: Prims,
      transpose: Boolean, up0: (Int, Int) => Unit,
      locPolySide: (Double, Double) => Int): Unit = {
    def row(cls: Int) = if (cls == 1) 0 else if (cls == 2) 1 else 2
    def up(clsLine: Int, clsPoly: Int, d: Int): Unit = {
      val c = if (transpose) row(clsPoly) * 3 + row(clsLine)
              else row(clsLine) * 3 + row(clsPoly)
      up0(c, d)
    }
    val rings = poly.polys.flatten.toArray
    var r = 0
    while (r < p.runs.length) {
      val c = p.runs(r)
      var i = 0
      while (i + 3 < c.length) {
        val px = c(i); val py = c(i + 1); val qx = c(i + 2); val qy = c(i + 3)
        if (!(px == qx && py == qy)) {
          val ts = boundaryTs(px, py, qx, qy, rings)
          var k = 0
          while (k + 1 < ts.length) {
            if (ts(k + 1) - ts(k) > 1e-12) {
              val tm = (ts(k) + ts(k + 1)) / 2
              val loc = locPolySide(px + tm * (qx - px), py + tm * (qy - py))
              // sub-segment interiors are line-interior points; a class-2
              // sub-segment RIDES the polygon boundary (dim 1)
              up(1, loc, 1)
            }
            k += 1
          }
          // Each internal cut point sits ON the polygon boundary. A cut
          // that coincides with a line VERTEX (mod-2 boundary endpoint
          // or interior path vertex) is classified EXACTLY by the vertex
          // loop below, so this loop's only remaining job is proving
          // that some cut is NOT a boundary endpoint. That is decidable
          // without comparing an interpolated cut against a vertex: a
          // boundary endpoint strictly inside this segment and on the
          // polygon boundary (all exact coordinate tests) IS one of the
          // distinct cut params, so a surplus of distinct internal cuts
          // over such endpoints proves a line-interior cut. (Distinct
          // at boundaryTs's own resolution — it records one hit per
          // incident ring edge, deduped here at the span loop's 1e-12.)
          var cuts = 0
          var lastT = -1.0
          k = 0
          while (k < ts.length) {
            val t = ts(k)
            if (t > 0.0 && t < 1.0 && t - lastT > 1e-12) { cuts += 1; lastT = t }
            k += 1
          }
          if (cuts > 0) {
            var nb = 0
            var bi = 0
            while (bi < lBnd.length) {
              val bx0 = lBnd(bi); val by0 = lBnd(bi + 1)
              if (!(bx0 == px && by0 == py) && !(bx0 == qx && by0 == qy) &&
                  onSegment(bx0, by0, px, py, qx, qy) &&
                  locPolySide(bx0, by0) == 2) nb += 1
              bi += 2
            }
            if (nb > 0) up(2, 2, 0)
            if (cuts > nb) up(1, 2, 0)
          }
        }
        i += 2
      }
      r += 1
    }
    // line vertices exactly on the polygon boundary (segment-end touches
    // that boundaryTs only records as t = 0/1)
    p.runs.foreach { c =>
      var i = 0
      while (i + 1 < c.length) {
        if (locPolySide(c(i), c(i + 1)) == 2)
          up(if (isAt(lBnd, c(i), c(i + 1))) 2 else 1, 2, 0)
        i += 2
      }
    }
  }

  /** Polygon×polygon cells by mutual boundary cutting + interior
    * witnesses (scanline-backed, so hole-crowded shells still produce a
    * witness). Needs the live matrix: the interior cells (II/IE/EI)
    * read the boundary rows the cuts just filled. */
  private def relatePolyPoly(m: Array[Int], a: Prims, b: Prims,
      up: (Int, Int) => Unit,
      locA: (Double, Double) => Int, locB: (Double, Double) => Int): Unit = {
    val aRings = a.polys.flatten.toArray
    val bRings = b.polys.flatten.toArray
    // Exact coincident-edge index (round 19, property-sweep find): an
    // edge of one operand that IS an edge of the other (identical
    // coordinate doubles — the self-relate / shared-boundary case) must
    // classify as boundary by exact lookup, not by locating its float
    // midpoint, which for non-dyadic coordinates rounds off the line
    // and read "exterior" — relateMatrix(a, a) on an irrational-coord
    // star returned 2F2F11212 instead of 2FFF1FFF2.
    def ekey(x1: Double, y1: Double, x2: Double, y2: Double) =
      if (x1 < x2 || (x1 == x2 && y1 <= y2)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
    def edgeSet(rings: Array[Coords]): Set[(Double, Double, Double, Double)] = {
      val bld = Set.newBuilder[(Double, Double, Double, Double)]
      rings.foreach { c =>
        var i = 0
        while (i + 3 < c.length) {
          if (!(c(i) == c(i + 2) && c(i + 1) == c(i + 3)))
            bld += ekey(c(i), c(i + 1), c(i + 2), c(i + 3))
          i += 2
        }
      }
      bld.result()
    }
    val aEdges = edgeSet(aRings)
    val bEdges = edgeSet(bRings)
    // cut one boundary at the other: rowBase=3 fills A's boundary row
    // (BI=3, BB=4, BE=5); rowBase=1 fills B's boundary column (IB=1,
    // BB=4, EB=7)
    def cutRows(rings: Array[Coords], other: Array[Coords],
                twins: Set[(Double, Double, Double, Double)],
                loc: (Double, Double) => Int, aSide: Boolean): Unit = {
      var r = 0
      while (r < rings.length) {
        val c = rings(r)
        var i = 0
        while (i + 3 < c.length) {
          val px = c(i); val py = c(i + 1); val qx = c(i + 2); val qy = c(i + 3)
          if (!(px == qx && py == qy)) {
            val ts = boundaryTs(px, py, qx, qy, other)
            var k = 0
            while (k + 1 < ts.length) {
              if (ts(k + 1) - ts(k) > 1e-12) {
                // whole-edge span with an exact twin in the other
                // boundary → boundary∩boundary, no float location
                val l =
                  if (ts(k) == 0.0 && ts(k + 1) == 1.0 && twins(ekey(px, py, qx, qy))) 2
                  else {
                    val tm = (ts(k) + ts(k + 1)) / 2
                    loc(px + tm * (qx - px), py + tm * (qy - py))
                  }
                val cellIdx =
                  if (aSide) (if (l == 1) 3 else if (l == 2) 4 else 5)
                  else (if (l == 1) 1 else if (l == 2) 4 else 7)
                up(cellIdx, 1)
              }
              if (ts(k) > 0.0 && ts(k) < 1.0) up(4, 0) // isolated ∂∩∂ point
              k += 1
            }
          }
          i += 2
        }
        r += 1
      }
    }
    cutRows(aRings, bRings, bEdges, locB, aSide = true)
    cutRows(bRings, aRings, aEdges, locA, aSide = false)
    // ring vertices: corner-to-corner touches are dim-0 BB
    def vertsBB(rings: Array[Coords], loc: (Double, Double) => Int): Unit =
      rings.foreach { c =>
        var i = 0
        while (i + 1 < c.length) {
          if (loc(c(i), c(i + 1)) == 2) up(4, 0)
          i += 2
        }
      }
    vertsBB(aRings, locB)
    vertsBB(bRings, locA)
    // Interior witnesses of every component, class in the other geometry
    // (loc 2 — a witness ON the other boundary — still implies interior
    // contact: a valid boundary has interior on one side).
    def wit(polys: Array[Array[Coords]], loc: (Double, Double) => Int): Seq[Int] =
      polys.toSeq.flatMap(r => interiorPointOf(r).map { case (x, y) => loc(x, y) })
    val wA = wit(a.polys, locB)
    val wB = wit(b.polys, locA)
    // A polygon operand whose EVERY component is zero-area yields no
    // interior witness at all; the IE/EI rules below would then claim a
    // dim-2 interior for a geometry that has no interior. That operand
    // is invalid input (zero-area polygon) — fail fast by name instead
    // of emitting a wrong matrix. Mixed operands (some components
    // degenerate) keep the witnesses of the valid components, which is
    // exact: a degenerate component contributes no interior anyway.
    if (wA.isEmpty) throw new IllegalArgumentException(
      "st_relate: first polygon operand has zero area (no component yields an interior witness); DE-9IM interior cells are undefined for degenerate polygons")
    if (wB.isEmpty) throw new IllegalArgumentException(
      "st_relate: second polygon operand has zero area (no component yields an interior witness); DE-9IM interior cells are undefined for degenerate polygons")
    // II: a boundary stretch inside the other's interior forces overlap;
    // otherwise nesting decides via witnesses
    if (m(3) == 1 || m(1) == 1 || wA.exists(_ >= 1) || wB.exists(_ >= 1)) up(0, 2)
    // IE (int A ∩ ext B): empty iff A ⊆ closure(B) — ∂A never outside B,
    // ∂B never through int(A) (a hole of B inside A would put ext(B)
    // there), and every A-component witness inside closure(B)
    if (!(m(5) == -1 && m(1) == -1 && wA.nonEmpty && wA.forall(_ >= 1))) up(2, 2)
    // EI symmetric
    if (!(m(7) == -1 && m(3) == -1 && wB.nonEmpty && wB.forall(_ >= 1))) up(6, 2)
  }

  /** DE-9IM pattern match: T = any dim, F = empty, 0/1/2 exact, * = any. */
  def relate(g1: Geom, g2: Geom, pattern: String): Boolean = {
    if (pattern.length != 9) throw new IllegalArgumentException(
      s"st_relate: DE-9IM pattern must be 9 characters, got '$pattern'")
    val m = relateCells(g1, g2)
    (0 until 9).forall { i =>
      pattern.charAt(i) match {
        case '*' => true
        case 'T' | 't' => m(i) >= 0
        case 'F' | 'f' => m(i) == -1
        case d @ ('0' | '1' | '2') => m(i) == d - '0'
        case other => throw new IllegalArgumentException(
          s"st_relate: invalid DE-9IM pattern character '$other' in '$pattern'")
      }
    }
  }

  /** OGC Touches: boundaries meet, interiors don't. */
  def touches(g1: Geom, g2: Geom): Boolean = {
    val m = relateCells(g1, g2)
    m(0) == -1 && (m(1) >= 0 || m(3) >= 0 || m(4) >= 0)
  }

  /** OGC Crosses: T*T****** (dimA<dimB), T*****T** (dimA>dimB),
    * 0******** for two lines; false for equal non-line dims. */
  def crosses(g1: Geom, g2: Geom): Boolean = {
    val fa = famOf(g1); val fb = famOf(g2)
    val m = relateCells(g1, g2)
    if (fa < fb) m(0) >= 0 && m(2) >= 0
    else if (fa > fb) m(0) >= 0 && m(6) >= 0
    else if (fa == 1) m(0) == 0
    else false
  }

  /** OGC Overlaps: same dimension, interiors intersect in that
    * dimension, and neither covers the other. */
  def overlaps(g1: Geom, g2: Geom): Boolean = {
    val fa = famOf(g1); val fb = famOf(g2)
    if (fa != fb) return false
    val m = relateCells(g1, g2)
    val ii = if (fa == 1) m(0) == 1 else m(0) >= 0
    ii && m(2) >= 0 && m(6) >= 0
  }

  /** OGC topological equality: T*F**FFF* (same point set); two empty
    * geometries are equal. */
  def equalsTopo(g1: Geom, g2: Geom): Boolean = {
    if (g1.isEmpty && g2.isEmpty) return true
    val m = relateCells(g1, g2)
    m(0) >= 0 && m(2) == -1 && m(5) == -1 && m(6) == -1 && m(7) == -1
  }

  def distance(g1: Geom, g2: Geom): Double = {
    if (intersects(g1, g2)) return 0.0
    // disjoint ⇒ neither is inside the other, so boundary distance is
    // the geometry distance
    val a = prims(g1); val b = prims(g2)
    var best = Double.PositiveInfinity
    def pts(p: Prims): Coords = allVerts(p)
    // point-to-point
    val pa = pts(a); val pb = pts(b)
    var i = 0
    while (i < a.points.length) {
      var j = 0
      while (j < pb.length) {
        best = math.min(best, distPointPoint(a.points(i), a.points(i + 1), pb(j), pb(j + 1)))
        j += 2
      }
      i += 2
    }
    // every vertex of one side against every segment of the other
    i = 0
    while (i < pa.length) {
      val px = pa(i); val py = pa(i + 1)
      eachSeg(b.runs) { (ax, ay, bx, by) =>
        best = math.min(best, distPointSeg(px, py, ax, ay, bx, by)); false }
      i += 2
    }
    i = 0
    while (i < pb.length) {
      val px = pb(i); val py = pb(i + 1)
      eachSeg(a.runs) { (ax, ay, bx, by) =>
        best = math.min(best, distPointSeg(px, py, ax, ay, bx, by)); false }
      i += 2
    }
    // point-geometry vs point-geometry with no segments anywhere
    i = 0
    while (i < b.points.length) {
      var j = 0
      while (j < pa.length) {
        best = math.min(best, distPointPoint(b.points(i), b.points(i + 1), pa(j), pa(j + 1)))
        j += 2
      }
      i += 2
    }
    best
  }

  private[functions] def ringSignedArea(c: Coords): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < c.length) {
      s += c(i) * c(i + 3) - c(i + 2) * c(i + 1)
      i += 2
    }
    s / 2.0
  }

  def area(g: Geom): Double = g match {
    case GGeometryCollection(gs) => gs.map(area).sum
    case GPolygon(rs) =>
      if (rs.isEmpty) 0.0
      else math.abs(ringSignedArea(rs(0))) - rs.drop(1).map(r => math.abs(ringSignedArea(r))).sum
    case GMultiPolygon(ps) => ps.map(rs => area(GPolygon(rs))).sum
    case _ => 0.0
  }

  private def runLength(c: Coords): Double = {
    var s = 0.0
    var i = 0
    while (i + 3 < c.length) {
      s += distPointPoint(c(i), c(i + 1), c(i + 2), c(i + 3))
      i += 2
    }
    s
  }

  /** Presto ST_Length: LineString / MultiLineString only. */
  def length(g: Geom): Double = g match {
    case GLineString(p) => runLength(p)
    case GMultiLineString(ls) => ls.map(runLength).sum
    case other => throw new IllegalArgumentException(
      s"ST_Length requires a LineString or MultiLineString, got ${typeName(other)}")
  }

  def centroid(g: Geom): Geom = {
    if (g.isEmpty) return GPoint(Double.NaN, Double.NaN)
    g match {
      case p: GPoint => p
      case GMultiPoint(p) =>
        var sx = 0.0; var sy = 0.0
        var i = 0
        while (i < p.length) { sx += p(i); sy += p(i + 1); i += 2 }
        GPoint(sx / (p.length / 2), sy / (p.length / 2))
      case GLineString(p) => lineCentroid(Array(p))
      case GMultiLineString(ls) => lineCentroid(ls)
      case GPolygon(rs) => polyCentroid(Array(rs))
      case GMultiPolygon(ps) => polyCentroid(ps)
      case c: GGeometryCollection => throw new IllegalArgumentException(
        "ST_Centroid does not support GEOMETRYCOLLECTION (mixed-dimension " +
        "weighting is undefined; take geometryn components)")
    }
  }

  private def lineCentroid(runs: Array[Coords]): GPoint = {
    var sx = 0.0; var sy = 0.0; var len = 0.0
    runs.foreach { c =>
      var i = 0
      while (i + 3 < c.length) {
        val l = distPointPoint(c(i), c(i + 1), c(i + 2), c(i + 3))
        sx += l * (c(i) + c(i + 2)) / 2; sy += l * (c(i + 1) + c(i + 3)) / 2
        len += l
        i += 2
      }
    }
    if (len == 0) {
      // degenerate zero-length line: average the vertices
      val all = runs.flatten
      var sx2 = 0.0; var sy2 = 0.0
      var i = 0
      while (i < all.length) { sx2 += all(i); sy2 += all(i + 1); i += 2 }
      GPoint(sx2 / (all.length / 2), sy2 / (all.length / 2))
    } else GPoint(sx / len, sy / len)
  }

  private def polyCentroid(ps: Array[Array[Coords]]): GPoint = {
    var sx = 0.0; var sy = 0.0; var sa = 0.0
    ps.foreach { rings =>
      rings.zipWithIndex.foreach { case (c, idx) =>
        var cx = 0.0; var cy = 0.0
        var i = 0
        while (i + 3 < c.length) {
          val cross = c(i) * c(i + 3) - c(i + 2) * c(i + 1)
          cx += (c(i) + c(i + 2)) * cross
          cy += (c(i + 1) + c(i + 3)) * cross
          i += 2
        }
        val a = ringSignedArea(c)
        // shell contributes +|A|, holes −|A|, independent of winding
        val sign = if (idx == 0) 1.0 else -1.0
        val aAbs = math.abs(a)
        if (a != 0) {
          sx += sign * (cx / (6 * a)) * aAbs
          sy += sign * (cy / (6 * a)) * aAbs
          sa += sign * aAbs
        }
      }
    }
    if (sa == 0) GPoint(Double.NaN, Double.NaN) else GPoint(sx / sa, sy / sa)
  }

  def envelopeBounds(g: Geom): Option[(Double, Double, Double, Double)] = {
    if (g.isEmpty) return None
    var xmin = Double.PositiveInfinity; var ymin = Double.PositiveInfinity
    var xmax = Double.NegativeInfinity; var ymax = Double.NegativeInfinity
    val p = prims(g)
    val all = allVerts(p)
    var i = 0
    while (i < all.length) {
      xmin = math.min(xmin, all(i)); xmax = math.max(xmax, all(i))
      ymin = math.min(ymin, all(i + 1)); ymax = math.max(ymax, all(i + 1))
      i += 2
    }
    Some((xmin, ymin, xmax, ymax))
  }

  def envelope(g: Geom): Geom = envelopeBounds(g) match {
    case None => GPolygon(Array.empty)
    case Some((xmin, ymin, xmax, ymax)) =>
      GPolygon(Array(Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin)))
  }

  def numPoints(g: Geom): Int = {
    val p = prims(g)
    (p.points.length + p.runs.map(_.length).sum) / 2
  }

  /** Topological dimension by type (points 0, lines 1, polygons 2;
    * a collection takes its highest member, 0 when empty). */
  def dimension(g: Geom): Int = g match {
    case _: GPoint | _: GMultiPoint => 0
    case _: GLineString | _: GMultiLineString => 1
    case _: GPolygon | _: GMultiPolygon => 2
    case GGeometryCollection(gs) => if (gs.isEmpty) 0 else gs.map(dimension).max
  }

  def numGeometries(g: Geom): Int = g match {
    case p: GPoint => if (p.isEmpty) 0 else 1
    case GMultiPoint(p) => p.length / 2
    case GLineString(p) => if (p.isEmpty) 0 else 1
    case GMultiLineString(ls) => ls.length
    case GPolygon(rs) => if (rs.isEmpty) 0 else 1
    case GMultiPolygon(ps) => ps.length
    case GGeometryCollection(gs) => gs.length
  }

  /** 1-based component accessor; None out of range. Simple geometries
    * are their own single component (the Presto behavior). */
  def geometryN(g: Geom, n: Int): Option[Geom] = {
    if (n < 1 || n > numGeometries(g)) return None
    Some(g match {
      case GMultiPoint(p) => GPoint(p(2 * (n - 1)), p(2 * (n - 1) + 1))
      case GMultiLineString(ls) => GLineString(ls(n - 1))
      case GMultiPolygon(ps) => GPolygon(ps(n - 1))
      case GGeometryCollection(gs) => gs(n - 1)
      case simple => simple
    })
  }

  /** 1-based vertex accessor on a LineString; None out of range. */
  def pointN(g: Geom, n: Int): Option[GPoint] = g match {
    case GLineString(p) =>
      if (n < 1 || n > p.length / 2) None
      else Some(GPoint(p(2 * (n - 1)), p(2 * (n - 1) + 1)))
    case other => throw new IllegalArgumentException(
      s"ST_PointN requires a LineString, got ${typeName(other)}")
  }

  def isClosed(g: Geom): Boolean = g match {
    // a line needs at least two points before "ends coincide" means
    // anything — a 1-point degenerate trivially compares with itself
    case GLineString(p) =>
      p.length >= 4 && p(0) == p(p.length - 2) && p(1) == p(p.length - 1)
    case GMultiLineString(ls) =>
      ls.nonEmpty && ls.forall(p =>
        p.length >= 4 && p(0) == p(p.length - 2) && p(1) == p(p.length - 1))
    case other => throw new IllegalArgumentException(
      s"ST_IsClosed requires a LineString or MultiLineString, got ${typeName(other)}")
  }

  /** No self-intersection except consecutive-segment endpoints (and the
    * closing touch of a closed run). O(n²) pairwise — geometries are
    * row-sized. */
  private def runIsSimple(c: Coords): Boolean = {
    val nSeg = c.length / 2 - 1
    val closed = nSeg > 0 && c(0) == c(c.length - 2) && c(1) == c(c.length - 1)
    var i = 0
    while (i < nSeg) {
      var j = i + 2
      while (j < nSeg) {
        // the closing segment legitimately touches the first at the
        // shared start/end vertex
        val wrapAdjacent = closed && i == 0 && j == nSeg - 1
        if (segIntersects(c(2 * i), c(2 * i + 1), c(2 * i + 2), c(2 * i + 3),
            c(2 * j), c(2 * j + 1), c(2 * j + 2), c(2 * j + 3))) {
          if (!wrapAdjacent) return false
          // even when wrap-adjacent, only the single shared vertex may touch
          if (segProperCross(c(2 * i), c(2 * i + 1), c(2 * i + 2), c(2 * i + 3),
              c(2 * j), c(2 * j + 1), c(2 * j + 2), c(2 * j + 3))) return false
        }
        j += 1
      }
      i += 1
    }
    // adjacent segments share a vertex by construction, but a collinear
    // BACKTRACK (…, 2 0, 1 0 retracing the previous segment) overlaps
    var k = 0
    while (k < nSeg - 1) {
      if (orient(c(2 * k), c(2 * k + 1), c(2 * k + 2), c(2 * k + 3),
            c(2 * k + 4), c(2 * k + 5)) == 0 &&
          (c(2 * k + 4) - c(2 * k + 2)) * (c(2 * k + 2) - c(2 * k)) +
            (c(2 * k + 5) - c(2 * k + 3)) * (c(2 * k + 3) - c(2 * k + 1)) < 0)
        return false
      k += 1
    }
    if (closed && nSeg >= 2) {
      // wrap-adjacent pair: the closing segment backtracking into the first
      val lx = c(c.length - 4); val ly = c(c.length - 3) // last segment start
      if (orient(lx, ly, c(0), c(1), c(2), c(3)) == 0 &&
          (c(2) - c(0)) * (c(0) - lx) + (c(3) - c(1)) * (c(1) - ly) < 0)
        return false
    }
    true
  }

  def isSimple(g: Geom): Boolean = g match {
    case GGeometryCollection(gs) => gs.forall(isSimple)
    case _: GPoint => true
    case GMultiPoint(p) =>
      val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
      var i = 0
      while (i < p.length) {
        if (!seen.add((p(i), p(i + 1)))) return false
        i += 2
      }
      true
    case GLineString(p) => runIsSimple(p)
    // OGC MultiCurve: every element simple AND elements may intersect
    // only at points on the boundaries of both (shared free endpoints)
    case GMultiLineString(ls) =>
      ls.forall(runIsSimple) && {
        def bndPts(r: Coords): Set[(Double, Double)] =
          if (r.length >= 4 && r(0) == r(r.length - 2) && r(1) == r(r.length - 1))
            Set.empty // a closed element has no boundary
          else Set((r(0), r(1)), (r(r.length - 2), r(r.length - 1)))
        val pairs = for { i <- ls.indices; j <- (i + 1) until ls.length } yield (i, j)
        pairs.forall { case (i, j) =>
          !runsCrossBeyond(ls(i), ls(j), bndPts(ls(i)) intersect bndPts(ls(j)))
        }
      }
    case GPolygon(rs) => rs.forall(runIsSimple)
    case GMultiPolygon(ps) => ps.forall(_.forall(runIsSimple))
  }

  /** True when two runs intersect anywhere beyond the `allowed` point
    * set: proper crossings and collinear overlaps always count; point
    * touches count unless the touch point is allowed. A non-crossing
    * touch can only happen at a vertex of one run lying on the other,
    * so checking the four zero-orient endpoints is exhaustive. */
  private def runsCrossBeyond(r1: Coords, r2: Coords,
      allowed: Set[(Double, Double)]): Boolean = {
    var i = 0
    while (i + 3 < r1.length) {
      val ax = r1(i); val ay = r1(i + 1); val bx = r1(i + 2); val by = r1(i + 3)
      var j = 0
      while (j + 3 < r2.length) {
        val cx = r2(j); val cy = r2(j + 1); val dx = r2(j + 2); val dy = r2(j + 3)
        if (segIntersects(ax, ay, bx, by, cx, cy, dx, dy)) {
          if (segProperCross(ax, ay, bx, by, cx, cy, dx, dy)) return true
          val o1 = orient(ax, ay, bx, by, cx, cy)
          val o2 = orient(ax, ay, bx, by, dx, dy)
          if (o1 == 0 && o2 == 0) {
            // collinear: an overlap longer than a point is never simple;
            // a single shared point falls through to the touch check
            val touching = Seq(
              (cx, cy, onSegment(cx, cy, ax, ay, bx, by)),
              (dx, dy, onSegment(dx, dy, ax, ay, bx, by)),
              (ax, ay, onSegment(ax, ay, cx, cy, dx, dy)),
              (bx, by, onSegment(bx, by, cx, cy, dx, dy)))
              .collect { case (x, y, true) => (x, y) }.distinct
            if (touching.size > 1) return true
            if (touching.exists(p => !allowed.contains(p))) return true
          } else {
            val touches = Seq(
              (cx, cy, o1 == 0 && onSegment(cx, cy, ax, ay, bx, by)),
              (dx, dy, o2 == 0 && onSegment(dx, dy, ax, ay, bx, by)),
              (ax, ay, orient(cx, cy, dx, dy, ax, ay) == 0 && onSegment(ax, ay, cx, cy, dx, dy)),
              (bx, by, orient(cx, cy, dx, dy, bx, by) == 0 && onSegment(bx, by, cx, cy, dx, dy)))
              .collect { case (x, y, true) => (x, y) }.distinct
            if (touches.exists(p => !allowed.contains(p))) return true
          }
        }
        j += 2
      }
      i += 2
    }
    false
  }

  def isRing(g: Geom): Boolean = g match {
    // a ring is a closed SIMPLE line with at least 3 distinct points
    // (4 vertices with the closure) — a doubled-back 2-pointer is not
    case l: GLineString =>
      l.pts.length >= 8 && isClosed(l) && runIsSimple(l.pts)
    case other => throw new IllegalArgumentException(
      s"ST_IsRing requires a LineString, got ${typeName(other)}")
  }

  def exteriorRing(g: Geom): Geom = g match {
    case GPolygon(rs) if rs.nonEmpty => GLineString(rs(0))
    case p: GPolygon => GLineString(Array.empty)
    case other => throw new IllegalArgumentException(
      s"ST_ExteriorRing requires a Polygon, got ${typeName(other)}")
  }

  def numInteriorRing(g: Geom): Int = g match {
    case GPolygon(rs) => math.max(0, rs.length - 1)
    case other => throw new IllegalArgumentException(
      s"ST_NumInteriorRing requires a Polygon, got ${typeName(other)}")
  }

  def interiorRingN(g: Geom, n: Int): Option[Geom] = g match {
    case GPolygon(rs) =>
      if (n < 1 || n > rs.length - 1) None else Some(GLineString(rs(n)))
    case other => throw new IllegalArgumentException(
      s"ST_InteriorRingN requires a Polygon, got ${typeName(other)}")
  }

  /** Convex hull via Andrew's monotone chain over every vertex.
    * Degenerate inputs collapse honestly: one distinct point → POINT,
    * collinear set → the spanning LINESTRING, otherwise a CCW POLYGON. */
  def convexHull(g: Geom): Geom = {
    if (g.isEmpty) return g
    val vs = allVerts(prims(g))
    val pts = {
      val set = scala.collection.mutable.LinkedHashSet.empty[(Double, Double)]
      var i = 0
      while (i < vs.length) { set.add((vs(i), vs(i + 1))); i += 2 }
      set.toArray.sorted
    }
    if (pts.length == 1) return GPoint(pts(0)._1, pts(0)._2)
    def chain(ps: Array[(Double, Double)]): Array[(Double, Double)] = {
      val h = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
      ps.foreach { p =>
        while (h.length >= 2 &&
            orient(h(h.length - 2)._1, h(h.length - 2)._2,
              h(h.length - 1)._1, h(h.length - 1)._2, p._1, p._2) <= 0)
          h.remove(h.length - 1)
        h += p
      }
      h.toArray
    }
    val lower = chain(pts)
    val upper = chain(pts.reverse)
    val hull = (lower.dropRight(1) ++ upper.dropRight(1))
    if (hull.length == 2)
      GLineString(Array(hull(0)._1, hull(0)._2, hull(1)._1, hull(1)._2))
    else {
      val ring = (hull :+ hull(0)).flatMap(p => Array(p._1, p._2)).toArray
      GPolygon(Array(ring))
    }
  }

  /** Ring pair conflict for validity: proper crossings and collinear
    * overlaps are invalid; touching at isolated points is allowed
    * (OGC lets rings meet at points). */
  private def ringsConflict(r1: Coords, r2: Coords): Boolean = {
    var i = 0
    while (i + 3 < r1.length) {
      val ax = r1(i); val ay = r1(i + 1); val bx = r1(i + 2); val by = r1(i + 3)
      var j = 0
      while (j + 3 < r2.length) {
        val cx = r2(j); val cy = r2(j + 1); val dx = r2(j + 2); val dy = r2(j + 3)
        if (segProperCross(ax, ay, bx, by, cx, cy, dx, dy)) return true
        val o1 = orient(ax, ay, bx, by, cx, cy)
        val o2 = orient(ax, ay, bx, by, dx, dy)
        if (o1 == 0 && o2 == 0) {
          val touching = Seq(
            (cx, cy, onSegment(cx, cy, ax, ay, bx, by)),
            (dx, dy, onSegment(dx, dy, ax, ay, bx, by)),
            (ax, ay, onSegment(ax, ay, cx, cy, dx, dy)),
            (bx, by, onSegment(bx, by, cx, cy, dx, dy)))
            .collect { case (x, y, true) => (x, y) }.distinct
          if (touching.size > 1) return true
        }
        j += 2
      }
      i += 2
    }
    false
  }

  private def polygonInvalidReason(rings: Array[Coords]): Option[String] = {
    // a fully collinear ring is the degenerate case; any other
    // non-simple ring is a genuine self-intersection (note a bowtie's
    // SIGNED area is also zero — opposite windings cancel — so area is
    // not the discriminator, collinearity is; a simple closed ring of
    // non-collinear points always has positive area)
    def collinear(c: Coords): Boolean = {
      var i = 4
      while (i + 1 < c.length) {
        if (orient(c(0), c(1), c(2), c(3), c(i), c(i + 1)) != 0) return false
        i += 2
      }
      true
    }
    var r = 0
    while (r < rings.length) {
      if (collinear(rings(r))) return Some("Degenerate ring (zero area)")
      if (!runIsSimple(rings(r))) return Some("Self-intersection")
      r += 1
    }
    var i = 0
    while (i < rings.length) {
      var j = i + 1
      while (j < rings.length) {
        if (ringsConflict(rings(i), rings(j)))
          return Some("Self-intersection between rings")
        j += 1
      }
      i += 1
    }
    val shell = rings(0)
    var h = 1
    while (h < rings.length) {
      interiorPointOf(Array(rings(h))) match {
        case Some((x, y)) =>
          if (pointInRings(x, y, Array(shell)) != 1)
            return Some("Hole lies outside shell")
          var h2 = 1
          while (h2 < rings.length) {
            if (h2 != h && pointInRings(x, y, Array(rings(h2))) == 1)
              return Some("Holes are nested")
            h2 += 1
          }
        case None => return Some("Degenerate ring (zero area)")
      }
      h += 1
    }
    None
  }

  /** Presto geometry_invalid_reason, None when valid. Points and lines
    * are valid whenever their coordinates are finite (OGC validity is
    * not simplicity for curves); polygons check ring simplicity,
    * degenerate rings, ring crossings/overlaps (point touches
    * allowed), hole placement and nesting; multipolygons additionally
    * reject overlapping components (one component inside another's
    * HOLE stays valid). Interior connectedness under many point
    * touches is NOT checked — the one OGC clause that needs a full
    * topology graph. */
  def invalidReason(g: Geom): Option[String] = {
    val vs = vertsOf(g)
    var i = 0
    while (i < vs.length) {
      if (vs(i).isNaN || vs(i).isInfinite || vs(i + 1).isNaN || vs(i + 1).isInfinite)
        return Some("Invalid coordinates")
      i += 2
    }
    g match {
      case GGeometryCollection(gs) => gs.flatMap(invalidReason).headOption
      case GPolygon(rings) if rings.nonEmpty => polygonInvalidReason(rings)
      case GMultiPolygon(ps) =>
        ps.flatMap(polygonInvalidReason(_)).headOption.orElse {
          var a = 0
          while (a < ps.length) {
            var b = a + 1
            while (b < ps.length) {
              if (ringsConflict(ps(a)(0), ps(b)(0)))
                return Some("Overlapping component polygons")
              val inOther = interiorPointOf(ps(a))
                .exists { case (x, y) => pointInRings(x, y, ps(b)) == 1 } ||
                interiorPointOf(ps(b))
                  .exists { case (x, y) => pointInRings(x, y, ps(a)) == 1 }
              if (inOther) return Some("Overlapping component polygons")
              b += 1
            }
            a += 1
          }
          None
        }
      case _ => None
    }
  }

  /** Fraction ∈ [0,1] of the line's length at the point on the line
    * closest to p (Presto line_locate_point). Zero-length lines locate
    * everything at 0. */
  def lineLocate(line: Coords, px: Double, py: Double): Double = {
    var total = 0.0
    var i = 0
    while (i + 3 < line.length) {
      total += distPointPoint(line(i), line(i + 1), line(i + 2), line(i + 3))
      i += 2
    }
    if (total == 0) return 0.0
    var best = Double.PositiveInfinity
    var bestAt = 0.0
    var prefix = 0.0
    i = 0
    while (i + 3 < line.length) {
      val ax = line(i); val ay = line(i + 1); val bx = line(i + 2); val by = line(i + 3)
      val segLen = distPointPoint(ax, ay, bx, by)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
      val d = distPointPoint(px, py, ax + t * dx, ay + t * dy)
      if (d < best) { best = d; bestAt = prefix + t * segLen }
      prefix += segLen
      i += 2
    }
    bestAt / total
  }

  /** The point at `fraction` of the line's length (Presto
    * line_interpolate_point). Zero-length lines yield their first
    * vertex. */
  def lineInterpolate(line: Coords, fraction: Double): GPoint = {
    if (fraction < 0 || fraction > 1) throw new IllegalArgumentException(
      s"line_interpolate_point fraction must be in [0, 1], got $fraction")
    var total = 0.0
    var i = 0
    while (i + 3 < line.length) {
      total += distPointPoint(line(i), line(i + 1), line(i + 2), line(i + 3))
      i += 2
    }
    if (total == 0) return GPoint(line(0), line(1))
    val target = fraction * total
    var prefix = 0.0
    i = 0
    while (i + 3 < line.length) {
      val segLen = distPointPoint(line(i), line(i + 1), line(i + 2), line(i + 3))
      if (prefix + segLen >= target || i + 5 >= line.length) {
        val t = if (segLen == 0) 0.0 else (target - prefix) / segLen
        return GPoint(line(i) + t * (line(i + 2) - line(i)),
          line(i + 1) + t * (line(i + 3) - line(i + 1)))
      }
      prefix += segLen
      i += 2
    }
    GPoint(line(line.length - 2), line(line.length - 1))
  }

  /** Douglas–Peucker simplification of one vertex run: endpoints are
    * anchors; a vertex survives iff its segment-distance from the
    * current anchor chord exceeds the tolerance. Iterative stack — no
    * recursion depth limit on long lines. */
  private def simplifyRun(c: Coords, tol: Double): Coords = {
    val n = c.length / 2
    if (n <= 2) return c
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.Stack((0, n - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi > lo + 1) {
        var maxD = -1.0
        var maxI = -1
        var i = lo + 1
        while (i < hi) {
          val d = distPointSeg(c(2 * i), c(2 * i + 1),
            c(2 * lo), c(2 * lo + 1), c(2 * hi), c(2 * hi + 1))
          if (d > maxD) { maxD = d; maxI = i }
          i += 1
        }
        if (maxD > tol) {
          keep(maxI) = true
          stack.push((lo, maxI))
          stack.push((maxI, hi))
        }
      }
    }
    val out = Array.newBuilder[Double]
    var i = 0
    while (i < n) {
      if (keep(i)) { out += c(2 * i); out += c(2 * i + 1) }
      i += 1
    }
    out.result()
  }

  /** Presto simplify_geometry: Douglas–Peucker with the given
    * tolerance. Points pass through; rings that would collapse below a
    * valid polygon (4 vertices with closure) keep their original shape
    * rather than going invalid. */
  def simplify(g: Geom, tol: Double): Geom = {
    if (tol < 0 || tol.isNaN) throw new IllegalArgumentException(
      s"simplify_geometry tolerance must be >= 0, got $tol")
    def ring(r: Coords): Coords = {
      val s = simplifyRun(r, tol)
      if (s.length >= 8) s else r
    }
    g match {
      case p: GPoint => p
      case p: GMultiPoint => p
      case GLineString(p) => GLineString(simplifyRun(p, tol))
      case GMultiLineString(ls) => GMultiLineString(ls.map(simplifyRun(_, tol)))
      case GPolygon(rs) => GPolygon(rs.map(ring))
      case GMultiPolygon(ps) => GMultiPolygon(ps.map(_.map(ring)))
      case GGeometryCollection(gs) => GGeometryCollection(gs.map(simplify(_, tol)))
    }
  }

  /** Presto great_circle_distance: km on a sphere of radius 6371.01 km
    * (haversine), args in degrees as (lat1, lon1, lat2, lon2). */
  def greatCircleDistance(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.01
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val dPhi = math.toRadians(lat2 - lat1); val dLam = math.toRadians(lon2 - lon1)
    val a = math.sin(dPhi / 2) * math.sin(dPhi / 2) +
      math.cos(phi1) * math.cos(phi2) * math.sin(dLam / 2) * math.sin(dLam / 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }

  // ---------------------------------------------------------- expressions

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  case class StPoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_point"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(x: Any, y: Any): Any =
      toWkb(GPoint(x.asInstanceOf[Double], y.asInstanceOf[Double]))
  }

  case class StGeometryFromText(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_geometryfromtext"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = toWkb(parseWkt(v.toString))
  }

  case class StAsText(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_astext"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = utf8(toWkt(fromWkb(v.asInstanceOf[Array[Byte]])))
  }

  /** Shared shape for geometry → double/bool/int/geometry accessors. */
  abstract class GeoUnaryBase extends UnaryExpression with CodegenFallback {
    protected def eval1(g: Geom): Any
    override protected def nullSafeEval(v: Any): Any = eval1(fromWkb(v.asInstanceOf[Array[Byte]]))
  }

  case class StX(child: Expression) extends GeoUnaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_x"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g match {
      case p: GPoint if !p.isEmpty => p.x
      case p: GPoint => null
      case other => throw new IllegalArgumentException(
        s"ST_X requires a Point, got ${typeName(other)}")
    }
  }

  case class StY(child: Expression) extends GeoUnaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_y"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g match {
      case p: GPoint if !p.isEmpty => p.y
      case p: GPoint => null
      case other => throw new IllegalArgumentException(
        s"ST_Y requires a Point, got ${typeName(other)}")
    }
  }

  case class StArea(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_area"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    // geography values dispatch to spherical excess in m² (round 17)
    override protected def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      if (isGeography(b)) geographyArea(b) else area(fromWkb(b))
    }
    protected def eval1(g: Geom): Any = area(g)
  }

  case class StLength(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_length"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    // geography values dispatch to geodesic meters (round 17)
    override protected def nullSafeEval(v: Any): Any = {
      val b = v.asInstanceOf[Array[Byte]]
      if (isGeography(b)) geographyLength(b) else length(fromWkb(b))
    }
    protected def eval1(g: Geom): Any = length(g)
  }

  case class StCentroid(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_centroid"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = toWkb(centroid(g))
  }

  case class StEnvelope(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_envelope"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = toWkb(envelope(g))
  }

  case class StGeometryType(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = StringType
    override def prettyName: String = "st_geometrytype"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g match {
      // Presto spells the collection type without "etry"
      case _: GGeometryCollection => utf8("ST_GeomCollection")
      case _ => utf8("ST_" + typeName(g))
    }
  }

  case class StNumPoints(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_numpoints"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = numPoints(g)
  }

  case class StIsEmpty(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_isempty"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g.isEmpty
  }

  case class StBound(child: Expression, which: Int) extends GeoUnaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String =
      Seq("st_xmin", "st_ymin", "st_xmax", "st_ymax")(which)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = envelopeBounds(g) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) => which match {
        case 0 => xmin
        case 1 => ymin
        case 2 => xmax
        case 3 => ymax
      }
    }
  }

  abstract class GeoBinaryBase extends BinaryExpression with CodegenFallback {
    protected def eval2(a: Geom, b: Geom): Any
    override protected def nullSafeEval(l: Any, r: Any): Any =
      eval2(fromWkb(l.asInstanceOf[Array[Byte]]), fromWkb(r.asInstanceOf[Array[Byte]]))
  }

  case class StDistance(left: Expression, right: Expression) extends GeoBinaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "st_distance"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    // geography pairs dispatch to geodesic meters; mixing the two
    // families is an error, not a silent planar answer
    override def nullSafeEval(l: Any, r: Any): Any = {
      val lb = l.asInstanceOf[Array[Byte]]; val rb = r.asInstanceOf[Array[Byte]]
      (isGeography(lb), isGeography(rb)) match {
        case (true, true) => geographyDistance(lb, rb)
        case (false, false) => eval2(fromWkb(lb), fromWkb(rb))
        case _ => throw new IllegalArgumentException(
          "st_distance: cannot mix geometry and geography arguments")
      }
    }
    protected def eval2(a: Geom, b: Geom): Any =
      if (a.isEmpty || b.isEmpty) null else distance(a, b)
  }

  /** Presto ST_Points: the geometry's vertices as an array of Point
    * geometries (ring closers included, matching numpoints). */
  case class StIsValid(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_isvalid"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = invalidReason(g).isEmpty
  }

  case class GeometryInvalidReason(child: Expression) extends GeoUnaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = StringType
    override def prettyName: String = "geometry_invalid_reason"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = invalidReason(g).map(utf8).orNull
  }

  case class StPoints(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "st_points"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = {
      val vs = vertsOf(g)
      val out = new Array[Any](vs.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = toWkb(GPoint(vs(2 * i), vs(2 * i + 1)))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** ST_LineString(array(Point)) / ST_MultiPoint(array(Point)) — the
    * array-of-points constructors (the inverses of [[StPoints]]).
    * Elements must be non-empty POINTs (anything else errors by name);
    * fewer than 2 points lines to LINESTRING EMPTY, an empty array
    * multipoints to MULTIPOINT EMPTY. ST_LineString additionally
    * rejects consecutive duplicate points by name, matching Presto's
    * validation (a degenerate zero-length segment would otherwise
    * slip silently into downstream length/relate kernels). */
  case class StFromPointArray(child: Expression, multi: Boolean)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = if (multi) "st_multipoint" else "st_linestring"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override protected def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = arr.numElements()
      val coords = Array.newBuilder[Double]
      var lastX = Double.NaN
      var lastY = Double.NaN
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: point array must not contain nulls (element $i)")
        fromWkb(arr.getBinary(i)) match {
          case p: GPoint if !p.isEmpty =>
            if (!multi && i > 0 && p.x == lastX && p.y == lastY)
              throw new IllegalArgumentException(
                s"$prettyName: consecutive duplicate points at index $i")
            lastX = p.x; lastY = p.y
            coords += p.x; coords += p.y
          case p: GPoint => throw new IllegalArgumentException(
            s"$prettyName: element $i is POINT EMPTY")
          case other => throw new IllegalArgumentException(
            s"$prettyName: element $i is a ${typeName(other)}, expected POINT")
        }
        i += 1
      }
      val cs = coords.result()
      if (multi) toWkb(GMultiPoint(cs))
      else if (cs.length < 4) toWkb(GLineString(Array.empty))
      else toWkb(GLineString(cs))
    }
  }

  case class StCoordDim(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = ByteType
    override def prettyName: String = "st_coorddim"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = 2.toByte
  }

  /** Presto line_interpolate_points: points at fraction, 2·fraction, …
    * up to 1 (the final endpoint included when the step divides 1). */
  case class LineInterpolatePoints(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "line_interpolate_points"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(g: Any, f: Any): Any =
      fromWkb(g.asInstanceOf[Array[Byte]]) match {
        case l: GLineString =>
          if (l.isEmpty) null
          else {
            val step = f.asInstanceOf[Double]
            if (step <= 0 || step > 1) throw new IllegalArgumentException(
              s"line_interpolate_points fraction must be in (0, 1], got $step")
            val out = scala.collection.mutable.ArrayBuffer.empty[Any]
            var k = 1
            while (k * step <= 1.0 + 1e-12) {
              out += toWkb(lineInterpolate(l.pts, math.min(1.0, k * step)))
              k += 1
            }
            new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
          }
        case other => throw new IllegalArgumentException(
          s"line_interpolate_points requires a LineString, got ${typeName(other)}")
      }
  }

  case class ToSphericalGeography(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "to_spherical_geography"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any =
      toSphericalGeography(v.asInstanceOf[Array[Byte]])
  }

  case class ToGeometry(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "to_geometry"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any =
      toWkb(geographyToGeom(v.asInstanceOf[Array[Byte]]))
  }

  case class StIntersects(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_intersects"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = intersects(a, b)
  }

  case class StContains(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_contains"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = contains(a, b)
  }

  case class StWithin(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_within"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = contains(b, a)
  }

  /** Geometry already travels as WKB, so AsBinary is the identity and
    * FromBinary is a validating parse-and-reencode (foreign byte order
    * or junk is rejected here, not at first use downstream). */
  case class StAsBinary(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_asbinary"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      fromWkb(v.asInstanceOf[Array[Byte]]) // validate
      v
    }
  }

  case class StGeomFromBinary(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_geomfrombinary"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any =
      toWkb(fromWkb(v.asInstanceOf[Array[Byte]])) // canonicalize to LE
  }

  /** Typed WKT constructors (Presto ST_LineFromText / ST_Polygon):
    * parse, then reject the wrong geometry type by name. */
  case class StTypedFromText(child: Expression, want: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String =
      if (want == "LineString") "st_linefromtext" else "st_polygon"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val g = parseWkt(v.toString)
      if (typeName(g) != want) throw new IllegalArgumentException(
        s"${prettyName.toUpperCase} requires $want WKT, got ${typeName(g)}")
      toWkb(g)
    }
  }

  case class StDimension(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_dimension"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = dimension(g)
  }

  case class StNumGeometries(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_numgeometries"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = numGeometries(g)
  }

  case class StIsClosed(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_isclosed"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = isClosed(g)
  }

  case class StIsSimple(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_issimple"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = isSimple(g)
  }

  case class StIsRing(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_isring"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = isRing(g)
  }

  case class StExteriorRing(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_exteriorring"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = toWkb(exteriorRing(g))
  }

  case class StNumInteriorRing(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "st_numinteriorring"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = numInteriorRing(g)
  }

  case class StConvexHull(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_convexhull"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = toWkb(convexHull(g))
  }

  /** 1-based vertex accessor endpoints: which = 0 start, 1 end. */
  case class StEndpoint(child: Expression, atEnd: Boolean) extends GeoUnaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = if (atEnd) "st_endpoint" else "st_startpoint"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g match {
      case GLineString(p) if p.nonEmpty =>
        toWkb(if (atEnd) GPoint(p(p.length - 2), p(p.length - 1)) else GPoint(p(0), p(1)))
      case _: GLineString => null
      case other => throw new IllegalArgumentException(
        s"${prettyName.toUpperCase} requires a LineString, got ${typeName(other)}")
    }
  }

  abstract class GeoIndexedBase extends BinaryExpression with CodegenFallback {
    protected def evalIdx(g: Geom, n: Int): Any
    override protected def nullSafeEval(l: Any, r: Any): Any =
      evalIdx(fromWkb(l.asInstanceOf[Array[Byte]]), r.asInstanceOf[Int])
  }

  case class StPointN(left: Expression, right: Expression) extends GeoIndexedBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_pointn"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def evalIdx(g: Geom, n: Int): Any = pointN(g, n).map(toWkb).orNull
  }

  case class StGeometryN(left: Expression, right: Expression) extends GeoIndexedBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_geometryn"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def evalIdx(g: Geom, n: Int): Any = geometryN(g, n).map(toWkb).orNull
  }

  case class StInteriorRingN(left: Expression, right: Expression) extends GeoIndexedBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_interiorringn"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def evalIdx(g: Geom, n: Int): Any = interiorRingN(g, n).map(toWkb).orNull
  }

  case class SimplifyGeometry(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "simplify_geometry"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(g: Any, t: Any): Any =
      toWkb(simplify(fromWkb(g.asInstanceOf[Array[Byte]]), t.asInstanceOf[Double]))
  }

  case class LineLocatePoint(left: Expression, right: Expression) extends GeoBinaryBase {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def prettyName: String = "line_locate_point"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = (a, b) match {
      case (l: GLineString, p: GPoint) =>
        if (l.isEmpty || p.isEmpty) null else lineLocate(l.pts, p.x, p.y)
      case _ => throw new IllegalArgumentException(
        s"line_locate_point requires (LineString, Point), got " +
        s"(${typeName(a)}, ${typeName(b)})")
    }
  }

  case class LineInterpolatePoint(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    // empty-geometry / out-of-range inputs yield NULL even when the
    // child is non-nullable
    override def nullable: Boolean = true
    override def dataType: DataType = BinaryType
    override def prettyName: String = "line_interpolate_point"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(g: Any, f: Any): Any =
      fromWkb(g.asInstanceOf[Array[Byte]]) match {
        case l: GLineString =>
          if (l.isEmpty) null
          else toWkb(lineInterpolate(l.pts, f.asInstanceOf[Double]))
        case other => throw new IllegalArgumentException(
          s"line_interpolate_point requires a LineString, got ${typeName(other)}")
      }
  }

  case class StDisjoint(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_disjoint"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = !intersects(a, b)
  }

  case class StTouches(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_touches"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = touches(a, b)
  }

  case class StCrosses(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_crosses"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = crosses(a, b)
  }

  case class StOverlaps(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_overlaps"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = overlaps(a, b)
  }

  case class StEquals(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "st_equals"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = equalsTopo(a, b)
  }

  /** st_relate(g1, g2, pattern) — Presto's 3-arg boolean form. */
  case class StRelate(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "st_relate"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      relate(fromWkb(vs(0).asInstanceOf[Array[Byte]]),
        fromWkb(vs(1).asInstanceOf[Array[Byte]]),
        vs(2).asInstanceOf[UTF8String].toString)
    }
  }

  case class GreatCircle(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "great_circle_distance"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) null
      else greatCircleDistance(
        vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
        vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double])
    }
  }

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression = { args =>
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")
    build(args)
  }

  private def dbl(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)

  // Constructive overlay (round 17): kernels in GeoOverlay — canonical
  // mutual noding + interior-left sub-segment selection + DCEL
  // face-walk stitching on the relate machinery's exact primitives.
  case class StIntersection(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_intersection"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = toWkb(GeoOverlay.intersection(a, b))
  }

  case class StUnion(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_union"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = toWkb(GeoOverlay.union(a, b))
  }

  case class StDifference(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_difference"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = toWkb(GeoOverlay.difference(a, b))
  }

  case class StSymDifference(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_symdifference"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any = toWkb(GeoOverlay.symDifference(a, b))
  }

  case class StBuffer(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_buffer"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(a: Geom, b: Geom): Any =
      throw new IllegalStateException("st_buffer binds distance via nullSafeEval")
    override protected def nullSafeEval(l: Any, r: Any): Any =
      toWkb(GeoOverlay.buffer(fromWkb(l.asInstanceOf[Array[Byte]]),
        r.asInstanceOf[Double]))
  }


  // ------------------------------------------------- round-17 tail
  // (boundary/ring/envelope accessors + nearest-points witness +
  // array-union / collection-flatten utilities)

  /** OGC boundary: points → GEOMETRYCOLLECTION EMPTY, lines → the
    * mod-2 endpoint MULTIPOINT (closed → empty), polygons → their
    * rings (one → LINESTRING, several → MULTILINESTRING); collections
    * are rejected by name (the JTS/Presto stance — a collection has no
    * single boundary rule). */
  case class StBoundary(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "st_boundary"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = toWkb(g match {
      case _: GPoint | _: GMultiPoint => GGeometryCollection(Array.empty)
      case GLineString(p) => GMultiPoint(lineBoundaryPts(Array(p)))
      case GMultiLineString(ls) => GMultiPoint(lineBoundaryPts(ls))
      case GPolygon(rings) =>
        if (rings.length == 1) GLineString(rings(0))
        else GMultiLineString(rings)
      case GMultiPolygon(ps) => GMultiLineString(ps.flatten)
      case other => throw new IllegalArgumentException(
        s"ST_Boundary does not support ${typeName(other)}")
    })
  }

  /** Presto st_interiorrings: the hole rings as LINESTRING wkbs (NULL
    * for an empty polygon, error for any other type — the Presto
    * signature). */
  case class StInteriorRings(child: Expression) extends GeoUnaryBase {
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "st_interiorrings"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = g match {
      case GPolygon(rings) =>
        if (rings.isEmpty) null
        else new org.apache.spark.sql.catalyst.util.GenericArrayData(
          rings.drop(1).map(r => toWkb(GLineString(r)): Any))
      case other => throw new IllegalArgumentException(
        s"ST_InteriorRings requires a Polygon, got ${typeName(other)}")
    }
  }

  /** Presto st_envelopeaspts: the envelope's lower-left and upper-right
    * corners as a 2-element POINT array (NULL for an empty geometry). */
  case class StEnvelopeAsPts(child: Expression) extends GeoUnaryBase {
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "st_envelopeaspts"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = envelopeBounds(g) match {
      case None => null
      case Some((xmin, ymin, xmax, ymax)) =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](toWkb(GPoint(xmin, ymin)), toWkb(GPoint(xmax, ymax))))
    }
  }

  /** expand_envelope(g, d): the envelope grown by d on every side (a
    * cheap pre-filter box for distance joins — the overlay-free way to
    * do "within d" candidate pruning at scale). */
  case class ExpandEnvelope(left: Expression, right: Expression) extends GeoBinaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "expand_envelope"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override protected def nullSafeEval(v1: Any, v2: Any): Any = {
      val g = fromWkb(v1.asInstanceOf[Array[Byte]])
      val d = v2.asInstanceOf[Double]
      if (d < 0) throw new IllegalArgumentException(
        s"expand_envelope: distance must be non-negative, got $d")
      toWkb(envelopeBounds(g) match {
        case None => GPolygon(Array.empty)
        case Some((xmin, ymin, xmax, ymax)) =>
          GPolygon(Array(Array(xmin - d, ymin - d, xmax + d, ymin - d,
            xmax + d, ymax + d, xmin - d, ymax + d, xmin - d, ymin - d)))
      })
    }
    protected def eval2(a: Geom, b: Geom): Any =
      throw new IllegalStateException("unreachable: nullSafeEval overridden")
  }

  /** flatten_geometry_collections(g): recursively flattens nested
    * collections into the array of leaf geometries (a non-collection
    * flattens to itself). */
  case class FlattenGeometryCollections(child: Expression) extends GeoUnaryBase {
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "flatten_geometry_collections"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def eval1(g: Geom): Any = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      def walk(x: Geom): Unit = x match {
        case GGeometryCollection(gs) => gs.foreach(walk)
        case leaf => out += toWkb(leaf)
      }
      walk(g)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
    }
  }

  /** geometry_union(array(Geometry)): the scalar fold of st_union over
    * an array column (nulls skipped; empty/all-null → NULL). Presto
    * documents it as the small-array alternative to
    * geometry_union_agg, which shares the same overlay kernel. */
  case class GeometryUnionArray(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "geometry_union"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(BinaryType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"geometry_union expects array<binary>, got ${other.catalogString}")
      }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var acc: Geom = null
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val g = fromWkb(arr.getBinary(i))
          acc = if (acc == null) g else GeoOverlay.union(acc, g)
        }
        i += 1
      }
      if (acc == null) null else toWkb(acc)
    }
  }

  /** geometry_nearest_points(g1, g2): a 2-element POINT array realizing
    * st_distance — a point of g1 and a point of g2 at minimal
    * separation (intersecting operands share a witness point from the
    * overlay intersection; empty operands → NULL). The disjoint sweep
    * mirrors [[distance]] with witness tracking: the minimum between
    * disjoint piecewise-linear sets is always attained vertex-to-
    * segment or vertex-to-vertex. */
  case class GeometryNearestPoints(left: Expression, right: Expression)
      extends GeoBinaryBase {
    override def nullable: Boolean = true
    override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
    override def prettyName: String = "geometry_nearest_points"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    protected def eval2(g1: Geom, g2: Geom): Any = {
      if (g1.isEmpty || g2.isEmpty) return null
      val w = nearestPointsKernel(g1, g2)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](toWkb(GPoint(w(0), w(1))), toWkb(GPoint(w(2), w(3)))))
    }
  }

  private[functions] def nearestPointsKernel(g1: Geom, g2: Geom): Array[Double] = {
    if (intersects(g1, g2)) {
      // any vertex of the (closed) intersection lies in both operands
      val w = GeoOverlay.intersection(g1, g2)
      val vs = vertsOf(w)
      require(vs.length >= 2,
        "geometry_nearest_points: empty intersection for intersecting operands")
      return Array(vs(0), vs(1), vs(0), vs(1))
    }
    val a = prims(g1); val b = prims(g2)
    val pa = allVerts(a); val pb = allVerts(b)
    var best = Double.PositiveInfinity
    val w = new Array[Double](4)
    def consider(d: Double, x1: Double, y1: Double, x2: Double, y2: Double): Unit =
      if (d < best) { best = d; w(0) = x1; w(1) = y1; w(2) = x2; w(3) = y2 }
    def footOnSeg(px: Double, py: Double, ax: Double, ay: Double,
        bx: Double, by: Double): (Double, Double) = {
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      if (len2 == 0) return (ax, ay)
      val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
      (ax + t * dx, ay + t * dy)
    }
    // vertex-to-vertex
    var i = 0
    while (i < pa.length) {
      var j = 0
      while (j < pb.length) {
        consider(distPointPoint(pa(i), pa(i + 1), pb(j), pb(j + 1)),
          pa(i), pa(i + 1), pb(j), pb(j + 1))
        j += 2
      }
      i += 2
    }
    // g1 vertices against g2 segments, and vice versa
    i = 0
    while (i < pa.length) {
      val px = pa(i); val py = pa(i + 1)
      eachSeg(b.runs) { (ax, ay, bx, by) =>
        val f = footOnSeg(px, py, ax, ay, bx, by)
        consider(distPointPoint(px, py, f._1, f._2), px, py, f._1, f._2); false }
      i += 2
    }
    i = 0
    while (i < pb.length) {
      val px = pb(i); val py = pb(i + 1)
      eachSeg(a.runs) { (ax, ay, bx, by) =>
        val f = footOnSeg(px, py, ax, ay, bx, by)
        consider(distPointPoint(px, py, f._1, f._2), f._1, f._2, px, py); false }
      i += 2
    }
    w
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "st_point" -> arity("st_point", 2)(a => StPoint(dbl(a(0)), dbl(a(1)))),
    "st_boundary" -> arity("st_boundary", 1)(a => StBoundary(a(0))),
    "st_interiorrings" -> arity("st_interiorrings", 1)(a => StInteriorRings(a(0))),
    "st_envelopeaspts" -> arity("st_envelopeaspts", 1)(a => StEnvelopeAsPts(a(0))),
    "expand_envelope" -> arity("expand_envelope", 2)(a => ExpandEnvelope(a(0), dbl(a(1)))),
    "flatten_geometry_collections" -> arity("flatten_geometry_collections", 1)(a =>
      FlattenGeometryCollections(a(0))),
    "geometry_union" -> arity("geometry_union", 1)(a => GeometryUnionArray(a(0))),
    "geometry_nearest_points" -> arity("geometry_nearest_points", 2)(a =>
      GeometryNearestPoints(a(0), a(1))),
    "st_geometryfromtext" ->
      arity("st_geometryfromtext", 1)(a => StGeometryFromText(a(0))),
    "st_astext" -> arity("st_astext", 1)(a => StAsText(a(0))),
    "st_x" -> arity("st_x", 1)(a => StX(a(0))),
    "st_y" -> arity("st_y", 1)(a => StY(a(0))),
    "st_area" -> arity("st_area", 1)(a => StArea(a(0))),
    "st_length" -> arity("st_length", 1)(a => StLength(a(0))),
    "st_centroid" -> arity("st_centroid", 1)(a => StCentroid(a(0))),
    "st_envelope" -> arity("st_envelope", 1)(a => StEnvelope(a(0))),
    "st_geometrytype" -> arity("st_geometrytype", 1)(a => StGeometryType(a(0))),
    "st_numpoints" -> arity("st_numpoints", 1)(a => StNumPoints(a(0))),
    "st_isempty" -> arity("st_isempty", 1)(a => StIsEmpty(a(0))),
    "st_xmin" -> arity("st_xmin", 1)(a => StBound(a(0), 0)),
    "st_ymin" -> arity("st_ymin", 1)(a => StBound(a(0), 1)),
    "st_xmax" -> arity("st_xmax", 1)(a => StBound(a(0), 2)),
    "st_ymax" -> arity("st_ymax", 1)(a => StBound(a(0), 3)),
    "st_distance" -> arity("st_distance", 2)(a => StDistance(a(0), a(1))),
    "st_intersects" -> arity("st_intersects", 2)(a => StIntersects(a(0), a(1))),
    "st_contains" -> arity("st_contains", 2)(a => StContains(a(0), a(1))),
    "st_within" -> arity("st_within", 2)(a => StWithin(a(0), a(1))),
    "great_circle_distance" -> arity("great_circle_distance", 4)(a =>
      GreatCircle(a.map(dbl))),
    "st_dimension" -> arity("st_dimension", 1)(a => StDimension(a(0))),
    "st_numgeometries" -> arity("st_numgeometries", 1)(a => StNumGeometries(a(0))),
    "st_isclosed" -> arity("st_isclosed", 1)(a => StIsClosed(a(0))),
    "st_issimple" -> arity("st_issimple", 1)(a => StIsSimple(a(0))),
    "st_isring" -> arity("st_isring", 1)(a => StIsRing(a(0))),
    "st_exteriorring" -> arity("st_exteriorring", 1)(a => StExteriorRing(a(0))),
    "st_numinteriorring" -> arity("st_numinteriorring", 1)(a => StNumInteriorRing(a(0))),
    "st_convexhull" -> arity("st_convexhull", 1)(a => StConvexHull(a(0))),
    "st_startpoint" -> arity("st_startpoint", 1)(a => StEndpoint(a(0), atEnd = false)),
    "st_endpoint" -> arity("st_endpoint", 1)(a => StEndpoint(a(0), atEnd = true)),
    "st_pointn" -> arity("st_pointn", 2)(a => StPointN(a(0), a(1))),
    "st_geometryn" -> arity("st_geometryn", 2)(a => StGeometryN(a(0), a(1))),
    "st_interiorringn" -> arity("st_interiorringn", 2)(a => StInteriorRingN(a(0), a(1))),
    "st_disjoint" -> arity("st_disjoint", 2)(a => StDisjoint(a(0), a(1))),
    "st_isvalid" -> arity("st_isvalid", 1)(a => StIsValid(a(0))),
    "geometry_invalid_reason" -> arity("geometry_invalid_reason", 1)(a =>
      GeometryInvalidReason(a(0))),
    "st_points" -> arity("st_points", 1)(a => StPoints(a(0))),
    "st_coorddim" -> arity("st_coorddim", 1)(a => StCoordDim(a(0))),
    "line_interpolate_points" -> arity("line_interpolate_points", 2)(a =>
      LineInterpolatePoints(a(0), dbl(a(1)))),
    "to_spherical_geography" -> arity("to_spherical_geography", 1)(a =>
      ToSphericalGeography(a(0))),
    "to_geometry" -> arity("to_geometry", 1)(a => ToGeometry(a(0))),
    "simplify_geometry" -> arity("simplify_geometry", 2)(a =>
      SimplifyGeometry(a(0), dbl(a(1)))),
    "line_locate_point" -> arity("line_locate_point", 2)(a => LineLocatePoint(a(0), a(1))),
    "line_interpolate_point" -> arity("line_interpolate_point", 2)(a =>
      LineInterpolatePoint(a(0), dbl(a(1)))),
    "st_asbinary" -> arity("st_asbinary", 1)(a => StAsBinary(a(0))),
    "st_geomfrombinary" -> arity("st_geomfrombinary", 1)(a => StGeomFromBinary(a(0))),
    "st_geometryfrombinary" -> arity("st_geometryfrombinary", 1)(a => StGeomFromBinary(a(0))),
    "st_linefromtext" -> arity("st_linefromtext", 1)(a => StTypedFromText(a(0), "LineString")),
    "st_linestring" -> arity("st_linestring", 1)(a => StFromPointArray(a(0), multi = false)),
    "st_multipoint" -> arity("st_multipoint", 1)(a => StFromPointArray(a(0), multi = true)),
    "st_polygon" -> arity("st_polygon", 1)(a => StTypedFromText(a(0), "Polygon")),
    "st_union" -> arity("st_union", 2)(a => StUnion(a(0), a(1))),
    "st_intersection" -> arity("st_intersection", 2)(a => StIntersection(a(0), a(1))),
    "st_difference" -> arity("st_difference", 2)(a => StDifference(a(0), a(1))),
    "st_symdifference" -> arity("st_symdifference", 2)(a => StSymDifference(a(0), a(1))),
    "st_buffer" -> arity("st_buffer", 2)(a => StBuffer(a(0), dbl(a(1)))),
    // The DE-9IM family (round 16): all five derive from the exact
    // relate matrix — boundary-cut classification, the same discipline
    // contains() uses, so equal polygons, boundary-riding lines, and
    // corner touches classify without heuristics.
    "st_touches" -> arity("st_touches", 2)(a => StTouches(a(0), a(1))),
    "st_crosses" -> arity("st_crosses", 2)(a => StCrosses(a(0), a(1))),
    "st_overlaps" -> arity("st_overlaps", 2)(a => StOverlaps(a(0), a(1))),
    "st_equals" -> arity("st_equals", 2)(a => StEquals(a(0), a(1))),
    "st_relate" -> arity("st_relate", 3)(a => StRelate(a)))
}
