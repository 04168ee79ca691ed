package graft

import graft.functions.{GeoFns, GeoOverlay}
import graft.functions.GeoFns._
import org.scalatest.funsuite.AnyFunSuite

/** Planar geometry kernel pins (functions/GeoFns) — Presto/OGC
  * semantics on hand-derived fixtures: WKT round-trips, even-odd
  * point-in-polygon with holes, strict-interior ST_Contains,
  * closure-touching ST_Intersects, distances, shoelace measures, and
  * the fail-fast surface. Pure kernel tests plus SQL-level smoke via
  * the shared session (the expressions register through
  * GraftExtensions). */
class GeoSpec extends AnyFunSuite with SparkSpec {

  private def g(wkt: String): Geom = parseWkt(wkt)

  test("WKT parse/format round-trips every supported type") {
    val cases = Seq(
      "POINT (1 2)",
      "POINT (1.5 -2.25)",
      "POINT EMPTY",
      "LINESTRING (0 0, 3 4, 10 0)",
      "LINESTRING EMPTY",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "POLYGON EMPTY",
      "MULTIPOINT ((1 2), (3 4))",
      "MULTIPOINT EMPTY",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 4))",
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), GEOMETRYCOLLECTION (POINT (9 9)))",
      "GEOMETRYCOLLECTION EMPTY")
    cases.foreach { w =>
      assert(toWkt(g(w)) == w, s"WKT round-trip of $w")
      // and through WKB
      assert(toWkt(fromWkb(toWkb(g(w)))) == w, s"WKB round-trip of $w")
    }
    // unclosed polygon rings are tolerated on parse and closed
    assert(toWkt(g("POLYGON ((0 0, 4 0, 4 4))")) == "POLYGON ((0 0, 4 0, 4 4, 0 0))")
    // bare-pair MULTIPOINT spelling accepted
    assert(toWkt(g("MULTIPOINT (1 2, 3 4)")) == "MULTIPOINT ((1 2), (3 4))")
  }

  test("WKT errors: unknown type, trailing junk, malformed rings") {
    assert(intercept[IllegalArgumentException](g("BLOB (1 2)"))
      .getMessage.contains("unknown geometry type"))
    assert(intercept[IllegalArgumentException](g("POINT (1 2) x"))
      .getMessage.contains("trailing"))
    assert(intercept[IllegalArgumentException](g("POLYGON ((0 0, 1 1))"))
      .getMessage.contains("at least 3"))
  }

  test("big-endian WKB is read (writer emits little-endian)") {
    val b = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    b.put(0.toByte); b.putInt(1); b.putDouble(3.0); b.putDouble(-4.5)
    assert(toWkt(fromWkb(b.array())) == "POINT (3 -4.5)")
  }

  test("area: shoelace with holes, winding-independent; multipolygon sums") {
    assert(area(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 100.0)
    // hole subtracts regardless of its winding direction
    assert(area(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")) == 96.0)
    assert(area(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))")) == 96.0)
    // clockwise shell still positive
    assert(area(g("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")) == 100.0)
    assert(area(g("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))")) == 4.5)
    assert(area(g("LINESTRING (0 0, 5 5)")) == 0.0)
  }

  test("length on linestrings; rejected elsewhere (Presto ST_Length)") {
    assert(GeoFns.length(g("LINESTRING (0 0, 3 4)")) == 5.0)
    assert(GeoFns.length(g("MULTILINESTRING ((0 0, 3 4), (0 0, 0 2))")) == 7.0)
    assert(intercept[IllegalArgumentException](
      GeoFns.length(g("POLYGON ((0 0, 1 0, 1 1, 0 0))")))
      .getMessage.contains("LineString"))
  }

  test("centroid: point, multipoint mean, length-weighted line, area-weighted polygon with hole") {
    assert(centroid(g("POINT (3 4)")) == GPoint(3, 4))
    assert(centroid(g("MULTIPOINT ((0 0), (2 0), (2 2), (0 2))")) == GPoint(1, 1))
    // two segments of length 4 and 2: midpoints (2,0) and (4,1) weighted 4:2
    assert(centroid(g("LINESTRING (0 0, 4 0, 4 2)")) == GPoint((2.0 * 4 + 4 * 2) / 6, (0.0 * 4 + 1 * 2) / 6))
    assert(centroid(g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")) == GPoint(2, 2))
    // symmetric hole keeps the centroid centered
    assert(centroid(g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")) == GPoint(2, 2))
    // off-center hole pushes the centroid away: shell 4x4 at (2,2) area 16,
    // hole 1x1 at (0.75,0.75)-(1.75,1.75) center (1.25,1.25) area 1 ⇒
    // centroid = (16*2 - 1*1.25) / 15
    val c = centroid(g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), " +
      "(0.75 0.75, 1.75 0.75, 1.75 1.75, 0.75 1.75, 0.75 0.75))")).asInstanceOf[GPoint]
    assert(math.abs(c.x - (16 * 2 - 1.25) / 15.0) < 1e-12)
    assert(math.abs(c.y - (16 * 2 - 1.25) / 15.0) < 1e-12)
  }

  test("point-in-polygon: interior, exterior, boundary, inside-a-hole") {
    val withHole = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    def pip(x: Double, y: Double): Boolean = contains(withHole, GPoint(x, y))
    assert(pip(1, 1))
    assert(!pip(11, 5), "outside the shell")
    assert(!pip(5, 5), "inside the hole is outside the polygon")
    assert(!pip(10, 5), "on the shell boundary is NOT contained (strict interior)")
    assert(!pip(4, 5), "on the hole boundary is NOT contained")
    // but boundary DOES intersect
    assert(intersects(withHole, GPoint(10, 5)))
    assert(intersects(withHole, GPoint(4, 5)))
    assert(!intersects(withHole, GPoint(5, 5)), "hole interior does not intersect")
  }

  test("contains: line and polygon arguments, hole crossings, boundary-only lines") {
    val square = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(contains(square, g("LINESTRING (1 1, 9 9)")))
    assert(contains(square, g("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))")))
    assert(!contains(square, g("LINESTRING (5 5, 15 5)")), "line exits the shell")
    assert(!contains(square, g("LINESTRING (0 0, 10 0)")),
      "a line lying ON the boundary has no interior point inside")
    assert(contains(square, g("LINESTRING (0 0, 10 10)")),
      "boundary-touching endpoints with an interior body IS contained")
    val withHole = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(!contains(withHole, g("LINESTRING (2 5, 8 5)")), "line crosses the hole")
    assert(contains(withHole, g("LINESTRING (1 1, 3 3)")))
    assert(!contains(withHole, g("POLYGON ((4.2 4.2, 5.8 4.2, 5.8 5.8, 4.2 5.8, 4.2 4.2))")),
      "polygon inside the hole is not contained")
    // linear g1 contains interior points but not its boundary endpoints
    assert(contains(g("LINESTRING (0 0, 10 0)"), GPoint(5, 0)))
    assert(!contains(g("LINESTRING (0 0, 10 0)"), GPoint(0, 0)),
      "a line's boundary endpoint is not contained")
    assert(!contains(g("LINESTRING (0 0, 10 0)"), GPoint(5, 1)))
    // a closed line has no boundary — every on-line point is contained
    assert(contains(g("LINESTRING (0 0, 4 0, 4 4, 0 0)"), GPoint(0, 0)))
    // point g1 contains exactly its own point set
    assert(contains(g("POINT (3 4)"), GPoint(3, 4)))
    assert(!contains(g("POINT (3 4)"), GPoint(3, 5)))
    assert(contains(g("MULTIPOINT ((1 1), (2 2))"), GPoint(2, 2)))
    // linear-vs-linear containment via the DE-9IM matrix (round 16)
    assert(contains(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (1 0, 2 0)")))
    assert(!contains(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (1 0, 2 1)")))
    // a sub-line ending exactly at g1's boundary endpoint is still
    // contained (no g2 point in g1's exterior, interiors meet)
    assert(contains(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (5 0, 10 0)")))
    // ...but a line is NOT contained in a strict sub-line of itself
    assert(!contains(g("LINESTRING (1 0, 2 0)"), g("LINESTRING (0 0, 10 0)")))
    // and a line cannot contain a polygon
    assert(!contains(g("LINESTRING (0 0, 1 0)"), g("POLYGON ((0 0, 1 0, 1 1, 0 0))")))
  }

  test("contains: concave-shell and boundary-aligned exactness (round-15 kernel fixes)") {
    // U-shape: slot x∈(4,6) is EXTERIOR; a triangle whose vertices all
    // lie on the shell boundary but whose body fills the slot must not
    // be contained (the old midpoint/area heuristic said yes)
    val u = g("POLYGON ((0 0, 10 0, 10 10, 6 10, 6 4, 4 4, 4 10, 0 10, 0 0))")
    assert(!contains(u, g("POLYGON ((4 10, 6 10, 5 4, 4 10))")),
      "slot triangle is outside the U")
    assert(!contains(u, g("LINESTRING (4 10, 6 10)")),
      "a line spanning the slot mouth crosses exterior")
    assert(contains(u, g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")))
    // a line running entirely along the slot walls has no interior point
    assert(!contains(u, g("LINESTRING (4 4, 6 4, 6 10)")),
      "boundary-only line is not contained")
    assert(!contains(u, g("LINESTRING (3 9, 7 9)")),
      "segment dipping through the slot is not contained")
    // equality: a polygon contains itself (interior witness decides)
    val sq = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(contains(sq, g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
    // a polygon exactly filling g1's hole is NOT contained
    val holed = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert(!contains(holed, g("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")))
    // a polygon SWALLOWING the hole is not contained either
    assert(!contains(holed, g("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")))
    assert(contains(holed, g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")))
  }

  test("ST_LineString / ST_MultiPoint array constructors (inverse of st_points)") {
    val r = spark.sql(
      """SELECT st_astext(st_linestring(array(st_point(0, 0), st_point(3, 4), st_point(9, 9)))) AS ls,
                st_astext(st_multipoint(array(st_point(1, 2), st_point(3, 4)))) AS mp,
                st_astext(st_linestring(array(st_point(1, 1)))) AS short,
                st_astext(st_multipoint(array())) AS empty_mp,
                st_astext(st_linestring(st_points(st_geometryfromtext('LINESTRING (5 6, 7 8)')))) AS rt
      """).head()
    assert(r.getString(0) == "LINESTRING (0 0, 3 4, 9 9)")
    assert(r.getString(1) == "MULTIPOINT ((1 2), (3 4))")
    assert(r.getString(2) == "LINESTRING EMPTY")
    assert(r.getString(3) == "MULTIPOINT EMPTY")
    assert(r.getString(4) == "LINESTRING (5 6, 7 8)", "st_points round-trip")
    def chain2(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain2(t.getCause)
    val e = intercept[Exception] {
      spark.sql("SELECT st_linestring(array(st_geometryfromtext('LINESTRING (0 0, 1 1)')))")
        .collect()
    }
    assert(chain2(e).exists(_.contains("expected POINT")), chain2(e).mkString("|"))
    val eEmpty = intercept[Exception] {
      spark.sql("SELECT st_multipoint(array(st_geometryfromtext('POINT EMPTY')))").collect()
    }
    assert(chain2(eEmpty).exists(_.contains("POINT EMPTY")), chain2(eEmpty).mkString("|"))
    // Presto rejects consecutive duplicate points in ST_LineString by
    // name (a zero-length segment would otherwise slip into downstream
    // length/relate kernels); ST_MultiPoint keeps duplicates.
    val eDup = intercept[Exception] {
      spark.sql(
        "SELECT st_linestring(array(st_point(0, 0), st_point(1, 1), st_point(1, 1), st_point(2, 0)))"
      ).collect()
    }
    assert(chain2(eDup).exists(_.contains("consecutive duplicate points at index 2")),
      chain2(eDup).mkString("|"))
    val mpDup = spark.sql(
      "SELECT st_astext(st_multipoint(array(st_point(1, 1), st_point(1, 1))))").head().getString(0)
    assert(mpDup == "MULTIPOINT ((1 1), (1 1))")
  }

  test("relate: line-poly cut points classified exactly against mod-2 boundary endpoints") {
    // run 2's mod-2 boundary endpoint (0 1) sits EXACTLY at one of run
    // 1's two polygon-boundary crossings; the other crossing (2 1) is a
    // genuine line-interior cut. The cut surplus (2 distinct cuts vs 1
    // boundary endpoint inside the segment) must yield IB=0 alongside
    // BB=0 — no interpolated-point tolerance involved.
    val sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert(relateMatrix(
      g("MULTILINESTRING ((-1 1, 3 1), (0 1, -2 3))"), g(sq)) == "101F00212")
    // …and when EVERY internal cut IS a boundary endpoint (run 1 stops
    // inside the square, its single crossing at (0 1) being run 2's
    // endpoint), the line's interior never meets the polygon boundary:
    // IB must stay F while BB=0 and BI=0 (run 1's end (1 1) is interior).
    assert(relateMatrix(
      g("MULTILINESTRING ((-1 1, 1 1), (0 1, -2 3))"), g(sq)) == "1F1000212")
  }

  test("GEOMETRYCOLLECTION: accessors, measures, overlay distribution") {
    val c = g("GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), " +
      "LINESTRING (5 5, 9 5), POINT (10 10))")
    assert(numGeometries(c) == 3)
    assert(toWkt(geometryN(c, 2).get) == "LINESTRING (5 5, 9 5)")
    assert(area(c) == 4.0)
    assert(dimension(c) == 2)
    // an all-empty collection IS empty and prints EMPTY
    assert(g("GEOMETRYCOLLECTION (POINT EMPTY)").isEmpty)
    // validity recurses into members
    import graft.functions.GeoFns.invalidReason
    assert(invalidReason(c).isEmpty)
    assert(invalidReason(g(
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 0 0)))")).isDefined)
    // overlay distribution: intersection picks the members the square
    // hits; difference subtracts family-wise; union re-packages
    val sq = g("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))")
    val inter = GeoOverlay.intersection(c, sq)
    assert(inter.isInstanceOf[GGeometryCollection], toWkt(inter))
    assert(area(inter) == 4.0, toWkt(inter))
    assert(toWkt(inter).contains("LINESTRING (5 5, 6 5)"), toWkt(inter))
    assert(!toWkt(inter).contains("POINT"), toWkt(inter))
    val diff = GeoOverlay.difference(c, sq)
    assert(toWkt(diff) == "GEOMETRYCOLLECTION (LINESTRING (6 5, 9 5), POINT (10 10))",
      toWkt(diff))
    // union with a polygon absorbs the covered pieces
    val uni = GeoOverlay.union(c, sq)
    assert(uni.isInstanceOf[GGeometryCollection], toWkt(uni))
    assert(area(uni) == 36.0, toWkt(uni))
    assert(toWkt(uni).contains("LINESTRING (6 5, 9 5)") &&
      toWkt(uni).contains("POINT (10 10)"), toWkt(uni))
    // symdifference through the (A−B) ∪ (B−A) identity
    val sym = GeoOverlay.symDifference(c, sq)
    assert(area(sym) == 32.0, toWkt(sym))
    // SQL surface: st_geometrytype spells Presto's ST_GeomCollection
    val row = spark.sql(
      """SELECT st_geometrytype(st_geometryfromtext(
                  'GEOMETRYCOLLECTION (POINT (1 2))')) AS t,
                st_numgeometries(st_geometryfromtext(
                  'GEOMETRYCOLLECTION (POINT (1 2), POINT (3 4))')) AS n,
                st_area(st_geometryfromtext(
                  'GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))')) AS a
      """).head()
    assert(row.getString(0) == "ST_GeomCollection")
    assert(row.getInt(1) == 2 || row.getLong(1) == 2L)
    assert(row.getDouble(2) == 4.0)
  }

  test("relate: zero-area polygon operands fail fast by name") {
    val e = intercept[IllegalArgumentException] {
      relateMatrix(g("POLYGON ((0 0, 2 0, 0 0))"),
                   g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    }
    assert(e.getMessage.contains("zero area"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      relateMatrix(g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
                   g("POLYGON ((5 5, 9 9, 5 5))"))
    }
    assert(e2.getMessage.contains("second polygon operand"), e2.getMessage)
  }

  test("DE-9IM relate: hand-derived matrices per family pair") {
    def mx(a: String, b: String) = relateMatrix(g(a), g(b))
    // polygon × polygon
    assert(mx("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
              "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") == "2FFF1FFF2", "equal squares")
    assert(mx("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
              "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))") == "FF2F11212", "edge-adjacent")
    assert(mx("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
              "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") == "FF2F01212", "corner touch")
    assert(mx("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
              "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))") == "212101212", "overlap")
    assert(mx("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
              "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))") == "212FF1FF2", "strict nest")
    // line × polygon: a chord crossing the square twice
    assert(mx("LINESTRING (-1 1, 3 1)",
              "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") == "101FF0212", "chord")
    // line riding the square's bottom edge only
    assert(mx("LINESTRING (0 0, 2 0)",
              "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") == "F1FF0F212", "edge-rider")
    // line × line
    assert(mx("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)") == "0F1FF0102", "X cross")
    assert(mx("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 3 0)") == "1010F0102", "overlap")
    assert(mx("LINESTRING (0 0, 2 0)", "LINESTRING (2 0, 3 0)") == "FF1F00102", "chain")
    // point families
    assert(mx("POINT (1 1)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") == "0FFFFF212",
      "point in polygon")
    assert(mx("POINT (3 4)", "POINT (3 4)") == "0FFFFFFF2", "equal points")
    assert(mx("POINT (0 0)", "POINT (1 1)") == "FF0FFF0F2", "distinct points")
    // empties
    assert(mx("POINT EMPTY", "POLYGON ((0 0, 1 0, 1 1, 0 0))") == "FFFFFF212")
    assert(mx("POLYGON EMPTY", "POLYGON EMPTY") == "FFFFFFFF2")
  }

  test("DE-9IM predicates: touches/crosses/overlaps/equals + differential vs kernels") {
    def G = (w: String) => g(w)
    val sq = G("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert(touches(sq, G("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")))
    assert(touches(sq, G("POINT (2 1)")))
    assert(!touches(sq, G("POINT (1 1)"))) // interior contact is not touching
    assert(!touches(sq, G("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")))
    assert(crosses(G("LINESTRING (-1 1, 3 1)"), sq))
    assert(!crosses(G("LINESTRING (0 0, 2 0)"), sq)) // boundary-rider never enters
    assert(crosses(G("LINESTRING (0 0, 2 2)"), G("LINESTRING (0 2, 2 0)")))
    assert(!crosses(G("LINESTRING (0 0, 2 0)"), G("LINESTRING (1 0, 3 0)"))) // dim-1 overlap
    assert(overlaps(G("LINESTRING (0 0, 2 0)"), G("LINESTRING (1 0, 3 0)")))
    assert(overlaps(sq, G("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")))
    assert(!overlaps(sq, G("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))) // containment
    assert(!overlaps(sq, G("LINESTRING (0 0, 2 2)"))) // mixed dims never overlap
    assert(equalsTopo(sq, G("POLYGON ((2 0, 2 2, 0 2, 0 0, 2 0))"))) // rotated ring
    assert(!equalsTopo(sq, G("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), (1 1, 1.5 1, 1.5 1.5, 1 1.5, 1 1))")))
    assert(equalsTopo(G("LINESTRING (0 0, 1 0, 2 0)"), G("LINESTRING (2 0, 0 0)"))) // collinear vertex
    // differential: matrix-derived intersects/contains/disjoint == the kernels
    val fixtures = Seq(
      "POLYGON ((0 0, 10 0, 10 10, 6 10, 6 4, 4 4, 4 10, 0 10, 0 0))", // U-shape
      "POLYGON ((4 10, 6 10, 5 4, 4 10))",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
      "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))",
      "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))",
      "LINESTRING (4 10, 6 10)",
      "LINESTRING (3 9, 7 9)",
      "LINESTRING (1 1, 3 1)",
      "POINT (5 5)", "POINT (1 1)", "MULTIPOINT ((1 1), (5 5))")
    for (wa <- fixtures; wb <- fixtures) {
      val (ga, gb) = (g(wa), g(wb))
      assert(relate(ga, gb, "FF*FF****") == !intersects(ga, gb),
        s"disjoint-matrix vs kernel: $wa / $wb -> ${relateMatrix(ga, gb)}")
      assert(relate(ga, gb, "T*****FF*") == contains(ga, gb),
        s"contains-matrix vs kernel: $wa / $wb -> ${relateMatrix(ga, gb)}")
    }
    // matrix symmetry: relate(a,b) is the transpose of relate(b,a)
    for (wa <- fixtures; wb <- fixtures) {
      val ab = relateMatrix(g(wa), g(wb)); val ba = relateMatrix(g(wb), g(wa))
      val t = Array(0, 3, 6, 1, 4, 7, 2, 5, 8).map(ba.charAt).mkString
      assert(ab == t, s"transpose: $wa / $wb -> $ab vs $ba")
    }
    // a proper segment crossing can land EXACTLY on a multilinestring's
    // mod-2 boundary endpoint from another run — that's a touch, not a
    // cross (round-16 review finding: the kernel claimed II=0 there)
    val junctionA = g("MULTILINESTRING ((0 0, 2 2), (1 1, 3 0))")
    val diag = g("LINESTRING (0 2, 2 0)")
    assert(relateMatrix(junctionA, diag) == "FF10F0102",
      relateMatrix(junctionA, diag))
    assert(touches(junctionA, diag) && !crosses(junctionA, diag))
    // pattern surface errors
    assert(intercept[IllegalArgumentException](
      relate(sq, sq, "T*F")).getMessage.contains("9 characters"))
    assert(intercept[IllegalArgumentException](
      relate(sq, sq, "T*F**FFFX")).getMessage.contains("invalid"))
  }

  test("differential: relate matrix consistent with the standalone kernels on random convex polygon pairs") {
    // Non-axis-aligned edges through the poly×poly relate path (the box
    // differential only exercises horizontal/vertical boundaries):
    // circle-built convex polygons at random centers/radii so the pairs
    // sample disjoint, overlapping, and nested relations. Pins per pair:
    // matrix-derived disjoint/contains/within == the standalone
    // kernels, intersects() == some non-F cell among the four
    // closure×closure cells, and transpose symmetry.
    val rnd = new scala.util.Random(20260815)
    def convex(): Geom = {
      val k = 3 + rnd.nextInt(6)
      val angles = Array.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      if (!angles.sliding(2).forall(p => p(1) - p(0) > 0.05)) return convex()
      val cx = rnd.nextDouble() * 60; val cy = rnd.nextDouble() * 60
      val r = 3 + rnd.nextDouble() * 25
      val verts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
      g("POLYGON ((" +
        (verts :+ verts(0)).map(v => s"${v._1} ${v._2}").mkString(", ") + "))")
    }
    for (i <- 1 to 200) {
      val (a, b) = (convex(), convex())
      val m = relateMatrix(a, b)
      assert(relate(a, b, "FF*FF****") == !intersects(a, b), s"disjoint #$i: $m")
      assert(relate(a, b, "T*****FF*") == contains(a, b), s"contains #$i: $m")
      assert(relate(a, b, "T*F**F***") == contains(b, a), s"within #$i: $m")
      val closureMeet = "0134".exists(c => m(c - '0') != 'F') // II/IB/BI/BB
      assert(closureMeet == intersects(a, b), s"closure #$i: $m")
      val t = Array(0, 3, 6, 1, 4, 7, 2, 5, 8).map(relateMatrix(b, a).charAt).mkString
      assert(m == t, s"transpose #$i: $m vs ${relateMatrix(b, a)}")
    }
  }

  test("differential: DE-9IM on random axis-aligned boxes vs exact interval arithmetic") {
    // For axis-aligned rectangles every DE-9IM cell has an EXACT
    // closed form in 1-D interval relations — an independent oracle the
    // general boundary-cut kernel must reproduce on all 500 random
    // pairs (small int coords so touching/nesting/equality are common).
    val rnd = new scala.util.Random(20160815)
    def box(): (Int, Int, Int, Int) = {
      val x1 = rnd.nextInt(5); val y1 = rnd.nextInt(5)
      (x1, y1, x1 + 1 + rnd.nextInt(3), y1 + 1 + rnd.nextInt(3))
    }
    def wkt(b: (Int, Int, Int, Int)) = {
      val (x1, y1, x2, y2) = b
      s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"
    }
    def expected(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): String = {
      val (ax1, ay1, ax2, ay2) = a; val (bx1, by1, bx2, by2) = b
      val ii = math.min(ax2, bx2) > math.max(ax1, bx1) &&
               math.min(ay2, by2) > math.max(ay1, by1)
      val aInB = bx1 <= ax1 && ax2 <= bx2 && by1 <= ay1 && ay2 <= by2
      val bInA = ax1 <= bx1 && bx2 <= ax2 && ay1 <= by1 && by2 <= ay2
      // does a vertical line x=v cross the open interior of rect r?
      def vCross(v: Int, ry1: Int, ry2: Int, r: (Int, Int, Int, Int)) =
        r._1 < v && v < r._3 && math.min(ry2, r._4) > math.max(ry1, r._2)
      def hCross(h: Int, rx1: Int, rx2: Int, r: (Int, Int, Int, Int)) =
        r._2 < h && h < r._4 && math.min(rx2, r._3) > math.max(rx1, r._1)
      val ib = vCross(bx1, by1, by2, a) || vCross(bx2, by1, by2, a) ||
               hCross(by1, bx1, bx2, a) || hCross(by2, bx1, bx2, a)
      val bi = vCross(ax1, ay1, ay2, b) || vCross(ax2, ay1, ay2, b) ||
               hCross(ay1, ax1, ax2, b) || hCross(ay2, ax1, ax2, b)
      // boundary ∩ boundary: exact 4×4 axis-aligned segment pairs
      def segs(r: (Int, Int, Int, Int)) = Seq(
        (r._1, r._2, r._1, r._4), (r._3, r._2, r._3, r._4), // vertical
        (r._1, r._2, r._3, r._2), (r._1, r._4, r._3, r._4)) // horizontal
      var bb = -1
      for (s1 <- segs(a); s2 <- segs(b)) {
        val v1 = s1._1 == s1._3; val v2 = s2._1 == s2._3
        if (v1 && v2) {
          if (s1._1 == s2._1) {
            val lo = math.max(s1._2, s2._2); val hi = math.min(s1._4, s2._4)
            if (hi > lo) bb = 1 else if (hi == lo) bb = math.max(bb, 0)
          }
        } else if (!v1 && !v2) {
          if (s1._2 == s2._2) {
            val lo = math.max(s1._1, s2._1); val hi = math.min(s1._3, s2._3)
            if (hi > lo) bb = 1 else if (hi == lo) bb = math.max(bb, 0)
          }
        } else {
          val (vx, vy1, vy2) = if (v1) (s1._1, s1._2, s1._4) else (s2._1, s2._2, s2._4)
          val (hy, hx1, hx2) = if (v1) (s2._2, s2._1, s2._3) else (s1._2, s1._1, s1._3)
          if (hx1 <= vx && vx <= hx2 && vy1 <= hy && hy <= vy2) bb = math.max(bb, 0)
        }
      }
      def c(dim: Int) = if (dim < 0) 'F' else ('0' + dim).toChar
      "" + c(if (ii) 2 else -1) + c(if (ib) 1 else -1) + c(if (aInB) -1 else 2) +
        c(if (bi) 1 else -1) + c(bb) + c(if (aInB) -1 else 1) +
        c(if (bInA) -1 else 2) + c(if (bInA) -1 else 1) + '2'
    }
    for (_ <- 1 to 500) {
      val a = box(); val b = box()
      val got = relateMatrix(g(wkt(a)), g(wkt(b)))
      assert(got == expected(a, b), s"${wkt(a)} vs ${wkt(b)}: got $got want ${expected(a, b)}")
    }
  }

  test("interior witness: scanline fallback when every ear centroid lands in a hole") {
    // square shell, 4 ear centroids at (10/3,10/3) (20/3,10/3) (20/3,20/3)
    // (10/3,20/3) — the hole (3 3, 7 7) covers ALL of them, so the
    // ear-triangle fast path finds no witness; the scanline fallback
    // must still locate interior (e.g. the x∈(0,3) band) so
    // self-containment stays true
    val w = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    assert(contains(g(w), g(w)), "boundary-aligned self-containment via scanline witness")
    // and the witness still refuses a copy shifted into the hole
    assert(!contains(g(w), g("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))")))
    // hole-filling copy of the SHELL only: interior leaks into the hole
    assert(!contains(g(w), g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
  }

  test("intersects: crossing, touching, containment without boundary contact, disjoint") {
    val square = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(intersects(g("LINESTRING (-5 5, 15 5)"), square), "transversal line")
    assert(intersects(g("LINESTRING (1 1, 2 2)"), square), "line wholly inside")
    assert(intersects(square, g("POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))")), "nested polygon")
    assert(intersects(square, g("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")), "shared edge")
    assert(!intersects(square, g("POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))")))
    assert(intersects(g("LINESTRING (0 0, 2 2)"), g("LINESTRING (0 2, 2 0)")), "X crossing")
    assert(intersects(g("LINESTRING (0 0, 2 2)"), g("LINESTRING (2 2, 4 0)")), "endpoint touch")
    assert(intersects(g("LINESTRING (0 0, 4 0)"), g("LINESTRING (1 0, 3 0)")), "collinear overlap")
    assert(!intersects(g("POINT (1 1)"), g("POINT (1 2)")))
    assert(intersects(g("POINT (1 1)"), g("POINT (1 1)")))
    assert(intersects(g("POINT (2 0)"), g("LINESTRING (0 0, 4 0)")), "point on segment")
  }

  test("distance: point/segment/polygon combinations; zero when touching") {
    assert(distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0)
    assert(distance(g("POINT (0 5)"), g("LINESTRING (3 0, 3 10)")) == 3.0)
    val square = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(distance(g("POINT (13 5)"), square) == 3.0)
    assert(distance(g("POINT (5 5)"), square) == 0.0, "interior point touches")
    assert(distance(g("LINESTRING (12 0, 12 10)"), square) == 2.0)
    assert(distance(g("MULTIPOINT ((20 5), (13 5))"), square) == 3.0)
    // segment-to-segment via perpendicular feet, not endpoints
    assert(distance(g("LINESTRING (0 0, 10 0)"), g("LINESTRING (5 2, 5 12)")) == 2.0)
  }

  test("envelope, bounds, numpoints, geometrytype, isempty") {
    val line = g("LINESTRING (1 7, 5 3, 2 9)")
    assert(toWkt(envelope(line)) == "POLYGON ((1 3, 5 3, 5 9, 1 9, 1 3))")
    assert(envelopeBounds(line).contains((1.0, 3.0, 5.0, 9.0)))
    assert(envelopeBounds(g("POINT EMPTY")).isEmpty)
    assert(numPoints(g("POLYGON ((0 0, 4 0, 4 4, 0 0))")) == 4,
      "ring closing vertex counts")
    assert(numPoints(g("MULTIPOINT ((1 2), (3 4))")) == 2)
    assert(typeName(g("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")) == "MultiPolygon")
    assert(g("LINESTRING EMPTY").isEmpty && !g("POINT (0 0)").isEmpty)
  }

  test("great_circle_distance matches the Presto constant (6371.01 km sphere)") {
    // antipodal-ish check: half circumference = pi * R
    assert(math.abs(greatCircleDistance(0, 0, 0, 180) - math.Pi * 6371.01) < 1e-6)
    assert(greatCircleDistance(12.3, 45.6, 12.3, 45.6) == 0.0)
    // one degree of latitude = R * pi/180
    assert(math.abs(greatCircleDistance(0, 0, 1, 0) - 6371.01 * math.Pi / 180) < 1e-9)
  }

  test("SQL surface: functions resolve session-wide; errors fail fast by name") {
    val row = spark.sql(
      """SELECT st_astext(st_point(1, 2)) AS wkt,
                st_distance(st_point(0, 0), st_point(3, 4)) AS d,
                st_contains(st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                            st_point(2, 2)) AS c,
                st_area(st_envelope(st_geometryfromtext('LINESTRING (0 0, 2 3)'))) AS a
      """).head()
    assert(row.getString(0) == "POINT (1 2)")
    assert(row.getDouble(1) == 5.0)
    assert(row.getBoolean(2))
    assert(row.getDouble(3) == 6.0)
    val ex = intercept[Exception] {
      spark.sql("SELECT st_x(st_geometryfromtext('LINESTRING (0 0, 1 1)'))").collect()
    }
    assert(ex.getMessage.contains("ST_X requires a Point") ||
      Option(ex.getCause).exists(_.getMessage.contains("ST_X requires a Point")))
    // st_union is REAL as of round 17 (overlay kernel); a union whose
    // pieces span families returns a GEOMETRYCOLLECTION
    assert(spark.sql("SELECT st_astext(st_union(st_point(0, 0), st_point(1, 1)))")
      .head().getString(0) == "MULTIPOINT ((0 0), (1 1))")
    assert(spark.sql(
      """SELECT st_astext(st_union(st_point(99, 99),
                st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))""")
      .head().getString(0) ==
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), POINT (99 99))")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    // closure-based st_intersects decomposes collections and works;
    // the DE-9IM relate family stays rejected by name (no single
    // family row mapping for a heterogeneous operand)
    assert(spark.sql(
      """SELECT st_intersects(
                st_geometryfromtext('GEOMETRYCOLLECTION (POINT (1 1))'),
                st_point(1, 1))""").head().getBoolean(0))
    val rejRel = intercept[Exception] {
      spark.sql(
        """SELECT st_touches(
                  st_geometryfromtext('GEOMETRYCOLLECTION (POINT (1 1))'),
                  st_point(1, 1))""").collect()
    }
    assert(chain(rejRel).exists(_.contains("relate/predicate")), chain(rejRel).mkString("|"))
    // the DE-9IM family resolves session-wide (round 16)
    val rel = spark.sql(
      """SELECT st_touches(st_point(0, 0), st_point(1, 1)) AS t,
                st_equals(st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                          st_geometryfromtext('POLYGON ((2 0, 2 2, 0 2, 0 0, 2 0))')) AS e,
                st_relate(st_geometryfromtext('LINESTRING (0 0, 2 2)'),
                          st_geometryfromtext('LINESTRING (0 2, 2 0)'), '0********') AS r
      """).head()
    assert(!rel.getBoolean(0) && rel.getBoolean(1) && rel.getBoolean(2))
  }

  test("accessors: dimension, components, vertices, rings") {
    assert(dimension(g("POINT (1 2)")) == 0)
    assert(dimension(g("MULTILINESTRING ((0 0, 1 1))")) == 1)
    assert(dimension(g("POLYGON ((0 0, 1 0, 1 1, 0 0))")) == 2)
    assert(numGeometries(g("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")) == 2)
    assert(numGeometries(g("POINT (1 2)")) == 1)
    assert(numGeometries(g("POINT EMPTY")) == 0)
    assert(geometryN(g("MULTIPOINT ((1 2), (3 4))"), 2).contains(GPoint(3, 4)))
    assert(geometryN(g("MULTIPOINT ((1 2), (3 4))"), 3).isEmpty)
    assert(geometryN(g("POINT (1 2)"), 1).contains(GPoint(1, 2)))
    assert(pointN(g("LINESTRING (0 0, 5 6, 9 9)"), 2).contains(GPoint(5, 6)))
    assert(pointN(g("LINESTRING (0 0, 5 6)"), 3).isEmpty)
    assert(intercept[IllegalArgumentException](pointN(g("POINT (1 2)"), 1))
      .getMessage.contains("LineString"))
    val holed = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    assert(toWkt(exteriorRing(holed)) == "LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    assert(numInteriorRing(holed) == 1)
    assert(toWkt(interiorRingN(holed, 1).get) == "LINESTRING (2 2, 4 2, 4 4, 2 4, 2 2)")
    assert(interiorRingN(holed, 2).isEmpty)
  }

  test("isClosed / isSimple / isRing") {
    assert(!isClosed(g("LINESTRING (0 0, 1 1)")))
    assert(isClosed(g("LINESTRING (0 0, 1 0, 1 1, 0 0)")))
    assert(intercept[IllegalArgumentException](isClosed(g("POINT (0 0)")))
      .getMessage.contains("LineString"))
    assert(isSimple(g("LINESTRING (0 0, 2 0, 2 2)")))
    assert(!isSimple(g("LINESTRING (0 0, 2 2, 2 0, 0 2)")), "self-crossing bowtie")
    assert(!isSimple(g("LINESTRING (0 0, 2 0, 1 0)")), "collinear backtrack")
    assert(isSimple(g("MULTIPOINT ((1 1), (2 2))")))
    assert(!isSimple(g("MULTIPOINT ((1 1), (1 1))")), "repeated point")
    assert(isRing(g("LINESTRING (0 0, 4 0, 4 4, 0 0)")))
    assert(!isRing(g("LINESTRING (0 0, 4 0, 4 4)")), "open")
    assert(!isRing(g("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)")), "closed but self-crossing")
    // round-15 degenerates: a 1-point line is neither closed nor a
    // ring (it compared its endpoint with itself); a doubled-back
    // 2-pointer closes but is not a ring
    assert(!isClosed(g("LINESTRING (5 5)")))
    assert(!isRing(g("LINESTRING (5 5)")))
    assert(!isRing(g("LINESTRING (0 0, 1 1, 0 0)")))
    // round-15 MultiLineString simplicity: components crossing in their
    // interiors is NOT simple; touching at a shared free endpoint is
    assert(!isSimple(g("MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))")),
      "components cross at (1,1)")
    assert(isSimple(g("MULTILINESTRING ((0 0, 1 1), (1 1, 2 0))")),
      "shared free endpoint is a legal touch")
    assert(!isSimple(g("MULTILINESTRING ((0 0, 2 0), (1 0, 1 2))")),
      "endpoint of one component in the other's interior")
    assert(!isSimple(g("MULTILINESTRING ((0 0, 2 0), (1 0, 3 0))")),
      "collinear overlap between components")
    assert(!isSimple(g("MULTILINESTRING ((0 0, 1 1, 0 2), (1 1, 2 2))")),
      "touch at a mid-vertex (not a boundary point) of the first component")
  }

  test("convex hull: polygon, collinear line, single point; interior points dropped") {
    val hull = convexHull(g("MULTIPOINT ((0 0), (4 0), (0 4), (4 4), (2 2), (1 3))"))
    assert(toWkt(hull) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(toWkt(convexHull(g("MULTIPOINT ((0 0), (2 2), (4 4))"))) == "LINESTRING (0 0, 4 4)")
    assert(toWkt(convexHull(g("MULTIPOINT ((3 3), (3 3))"))) == "POINT (3 3)")
    // hull of a concave polygon's vertices fills the notch
    assert(area(convexHull(g("POLYGON ((0 0, 4 0, 4 4, 2 1, 0 4, 0 0))"))) == 16.0)
  }

  test("st_disjoint and the indexed accessors through SQL") {
    val row = spark.sql(
      """SELECT st_disjoint(st_point(0, 0), st_point(5, 5)) AS dj,
                st_astext(st_geometryn(st_geometryfromtext('MULTIPOINT ((1 2), (3 4))'), 2)) AS g2,
                st_astext(st_endpoint(st_geometryfromtext('LINESTRING (0 0, 7 8)'))) AS ep,
                st_numinteriorring(st_geometryfromtext(
                  'POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))')) AS nir,
                st_pointn(st_geometryfromtext('LINESTRING (0 0, 7 8)'), 5) AS oob
      """).head()
    assert(row.getBoolean(0))
    assert(row.getString(1) == "POINT (3 4)")
    assert(row.getString(2) == "POINT (7 8)")
    assert(row.getInt(3) == 1)
    assert(row.isNullAt(4), "out-of-range vertex access is NULL")
  }

  test("binary interchange and typed WKT constructors") {
    val row = spark.sql(
      """SELECT st_astext(st_geomfrombinary(st_asbinary(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 0))')))) AS rt,
                st_astext(st_linefromtext('LINESTRING (1 1, 2 2)')) AS ln
      """).head()
    assert(row.getString(0) == "POLYGON ((0 0, 2 0, 2 2, 0 0))")
    assert(row.getString(1) == "LINESTRING (1 1, 2 2)")
    // big-endian bytes canonicalize to our little-endian storage
    val be = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.BIG_ENDIAN)
    be.put(0.toByte); be.putInt(1); be.putDouble(6.0); be.putDouble(7.0)
    assert(toWkt(fromWkb(toWkb(fromWkb(be.array())))) == "POINT (6 7)")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val wrongType = intercept[Exception] {
      spark.sql("SELECT st_polygon('LINESTRING (0 0, 1 1)')").collect()
    }
    assert(chain(wrongType).exists(_.contains("requires Polygon")), chain(wrongType))
    val junk = intercept[Exception] {
      spark.sql("SELECT st_asbinary(unhex('DEADBEEF'))").collect()
    }
    assert(chain(junk).exists(_.contains("not WKB")), chain(junk))
    // round-15: corrupt COUNTS are rejected by name, not parsed as
    // EMPTY (negative) or allocated (huge)
    val negCount = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    negCount.put(1.toByte); negCount.putInt(3); negCount.putInt(-1)
    assert(intercept[IllegalArgumentException](fromWkb(negCount.array()))
      .getMessage.contains("implausible element count"))
    val hugeCount = java.nio.ByteBuffer.allocate(9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hugeCount.put(1.toByte); hugeCount.putInt(2); hugeCount.putInt(0x40000000)
    assert(intercept[IllegalArgumentException](fromWkb(hugeCount.array()))
      .getMessage.contains("implausible element count"))
  }

  test("differential: PIP kernel agrees with half-plane tests on random convex polygons") {
    // Polygons built on a circle (sorted angles ⇒ convex CCW by
    // construction, independent of the hull code); the expected answer
    // comes from half-plane sign tests re-derived here — a different
    // algorithm than the kernel's even-odd ray casting. Near-boundary
    // points (any |cross| < 1e-9) are skipped: both algorithms are
    // exact on doubles but the CONSTRUCTION is not, so the fixture
    // can't say which side such a point is on.
    val rnd = new scala.util.Random(42)
    def cross(ax: Double, ay: Double, bx: Double, by: Double, px: Double, py: Double) =
      (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    var checked = 0
    for (_ <- 1 to 60) {
      val k = 3 + rnd.nextInt(6)
      val angles = Array.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      if (angles.sliding(2).forall(p => p(1) - p(0) > 0.05)) {
        val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
        val r = 5 + rnd.nextDouble() * 40
        val verts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
        val wkt = "POLYGON ((" +
          (verts :+ verts(0)).map(v => s"${v._1} ${v._2}").mkString(", ") + "))"
        val poly = g(wkt)
        val edges = verts.zip(verts.tail :+ verts.head)
        for (_ <- 1 to 60) {
          val px = cx + (rnd.nextDouble() - 0.5) * 3 * r
          val py = cy + (rnd.nextDouble() - 0.5) * 3 * r
          val sides = edges.map { case (a, b) => cross(a._1, a._2, b._1, b._2, px, py) }
          if (sides.forall(s => math.abs(s) > 1e-9)) {
            val inside = sides.forall(_ > 0)
            assert(contains(poly, GPoint(px, py)) == inside,
              s"contains mismatch at ($px, $py) for $wkt")
            assert(intersects(poly, GPoint(px, py)) == inside,
              s"intersects mismatch at ($px, $py) for $wkt")
            checked += 1
          }
        }
      }
    }
    assert(checked > 1000, s"only $checked differential checks ran")
  }

  test("differential: convex hull closure contains every input point and is convex") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 3 + rnd.nextInt(40)
      val pts = Array.fill(n)((rnd.nextInt(200).toDouble, rnd.nextInt(200).toDouble))
      val mp = GMultiPoint(pts.flatMap(p => Array(p._1, p._2)))
      val hull = convexHull(mp)
      pts.foreach { p =>
        assert(intersects(hull, GPoint(p._1, p._2)),
          s"hull ${toWkt(hull)} lost input point $p")
      }
      hull match {
        case GPolygon(rings) =>
          val c = rings(0)
          var i = 0
          while (i + 5 < c.length) {
            assert((c(i + 2) - c(i)) * (c(i + 5) - c(i + 3)) -
              (c(i + 3) - c(i + 1)) * (c(i + 4) - c(i + 2)) > 0,
              s"hull not strictly convex: ${toWkt(hull)}")
            i += 2
          }
        case _ => () // degenerate collinear/point input
      }
    }
  }

  test("bing tiles: published example vector, quadkey round-trip, edge clipping, errors") {
    import graft.functions.BingTiles._
    // the Bing Maps Tile System documentation example: (47.61, -122.33)
    // at level 3 is tile (1, 2), quadkey "021"
    assert(tileAt(47.61, -122.33, 3) == (1, 2))
    assert(quadkey(1, 2, 3) == "021")
    assert(fromQuadkey("021") == (1, 2, 3))
    // round-trip across the bit width
    for ((x, y, z) <- Seq((0, 0, 1), (255, 128, 8), (123456, 654321, 23)))
      assert(fromQuadkey(quadkey(x, y, z)) == (x, y, z))
    // zoom-0 world tile: empty quadkey, polygon spans the mercator box
    assert(quadkey(0, 0, 0) == "")
    val world = tilePolygon(0, 0, 0)
    assert(envelopeBounds(world).exists { case (xmin, ymin, xmax, ymax) =>
      xmin == -180.0 && xmax == 180.0 &&
        math.abs(ymin + MaxLat) < 1e-6 && math.abs(ymax - MaxLat) < 1e-6
    }, toWkt(world))
    // out-of-range lat/lon throw (Presto behavior) rather than clamp
    assert(intercept[IllegalArgumentException](tileAt(89.9, 0.0, 4))
      .getMessage.contains("latitude"))
    assert(intercept[IllegalArgumentException](tileAt(0.0, 180.5, 4))
      .getMessage.contains("longitude"))
    // the exact mercator limit is still valid and maps to the edge tile
    assert(tileAt(MaxLat, 0.0, 4)._2 == 0)
    assert(intercept[IllegalArgumentException](tileAt(0, 0, 24))
      .getMessage.contains("zoom"))
    assert(intercept[IllegalArgumentException](checkTile(4, 0, 2))
      .getMessage.contains("out of range"))
    assert(intercept[IllegalArgumentException](fromQuadkey("0412"))
      .getMessage.contains("quadkey digit"))
    // SQL surface: struct-typed tiles group and join directly; around
    // clips at the map corner
    val row = spark.sql(
      """SELECT bing_tile_quadkey(bing_tile_at(47.61, -122.33, 3)) AS qk,
                bing_tile_zoom_level(bing_tile('021')) AS z,
                bing_tile_coordinates(bing_tile(1, 2, 3)).x AS x,
                size(bing_tiles_around(85.0, -179.9, 8)) AS corner_n,
                size(bing_tiles_around(0.0, 0.0, 8)) AS mid_n
      """).head()
    assert(row.getString(0) == "021")
    assert(row.getInt(1) == 3)
    assert(row.getInt(2) == 1)
    assert(row.getInt(3) == 4, "corner tile keeps only the 2x2 in-map neighborhood")
    assert(row.getInt(4) == 9)
  }

  test("linear referencing: locate/interpolate on multi-segment lines") {
    import graft.functions.GeoFns.{lineLocate, lineInterpolate}
    // L-shaped line of total length 8: (0,0)→(4,0)→(4,4)
    val l = Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0)
    assert(lineLocate(l, 2, 0) == 0.25)
    assert(lineLocate(l, 4, 2) == 0.75, "closest point on the second segment")
    assert(lineLocate(l, 2, -5) == 0.25, "off-line point projects onto the first segment")
    assert(lineLocate(l, 10, 10) == 1.0, "beyond the end clamps to 1")
    assert(lineInterpolate(l, 0.0) == GPoint(0, 0))
    assert(lineInterpolate(l, 0.5) == GPoint(4, 0), "the corner is at half length")
    assert(lineInterpolate(l, 0.75) == GPoint(4, 2))
    assert(lineInterpolate(l, 1.0) == GPoint(4, 4))
    assert(intercept[IllegalArgumentException](lineInterpolate(l, 1.5))
      .getMessage.contains("fraction"))
    // zero-length degenerate
    assert(lineLocate(Array(3.0, 3.0, 3.0, 3.0), 9, 9) == 0.0)
    assert(lineInterpolate(Array(3.0, 3.0, 3.0, 3.0), 0.7) == GPoint(3, 3))
    // SQL surface + type errors
    val row = spark.sql(
      """SELECT line_locate_point(st_geometryfromtext('LINESTRING (0 0, 10 0)'),
                                  st_point(7, 3)) AS f,
                st_astext(line_interpolate_point(
                  st_geometryfromtext('LINESTRING (0 0, 10 0)'), 0.3)) AS p""").head()
    assert(row.getDouble(0) == 0.7)
    assert(row.getString(1) == "POINT (3 0)")
    val bad = intercept[Exception] {
      spark.sql("SELECT line_locate_point(st_point(0, 0), st_point(1, 1))").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(bad).exists(_.contains("LineString, Point")), chain(bad))
  }

  test("st_isvalid / geometry_invalid_reason: ring topology classes") {
    import graft.functions.GeoFns.invalidReason
    // points and lines are valid even self-crossing (validity != simplicity)
    assert(invalidReason(g("POINT (1 2)")).isEmpty)
    assert(invalidReason(g("LINESTRING (0 0, 2 2, 2 0, 0 2)")).isEmpty)
    // bowtie ring
    assert(invalidReason(g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"))
      .contains("Self-intersection"))
    // zero-area ring
    assert(invalidReason(g("POLYGON ((0 0, 4 0, 2 0, 0 0))"))
      .contains("Degenerate ring (zero area)"))
    // hole placement
    val shell = "(0 0, 10 0, 10 10, 0 10, 0 0)"
    assert(invalidReason(g(s"POLYGON ($shell, (2 2, 4 2, 4 4, 2 4, 2 2))")).isEmpty)
    assert(invalidReason(g(s"POLYGON ($shell, (20 20, 22 20, 22 22, 20 22, 20 20))"))
      .contains("Hole lies outside shell"))
    assert(invalidReason(g(s"POLYGON ($shell, (1 1, 8 1, 8 8, 1 8, 1 1), (2 2, 3 2, 3 3, 2 3, 2 2))"))
      .contains("Holes are nested"))
    // hole crossing the shell
    assert(invalidReason(g(s"POLYGON ($shell, (8 8, 12 8, 12 12, 8 12, 8 8))"))
      .contains("Self-intersection between rings"))
    // hole touching the shell at one point is VALID
    assert(invalidReason(g(s"POLYGON ($shell, (0 0, 4 2, 2 4, 0 0))")).isEmpty)
    // multipolygon: disjoint valid, overlapping invalid, in-the-hole valid
    assert(invalidReason(g(
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")).isEmpty)
    assert(invalidReason(g(
      "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((2 2, 6 2, 6 6, 2 6, 2 2)))"))
      .contains("Overlapping component polygons"))
    assert(invalidReason(g(
      "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2)), " +
        "((4 4, 6 4, 6 6, 4 6, 4 4)))")).isEmpty,
      "a component inside another's hole is valid")
    // SQL surface
    val row = spark.sql(
      """SELECT st_isvalid(st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 0))')) AS ok,
                geometry_invalid_reason(
                  st_geometryfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')) AS why,
                geometry_invalid_reason(st_point(1, 1)) AS clean
      """).head()
    assert(row.getBoolean(0))
    assert(row.getString(1) == "Self-intersection")
    assert(row.isNullAt(2))
  }

  test("st_points, st_coorddim, line_interpolate_points") {
    val row = spark.sql(
      """SELECT transform(st_points(st_geometryfromtext('LINESTRING (1 2, 3 4)')),
                          p -> st_astext(p)) AS pts,
                st_coorddim(st_point(0, 0)) AS dim,
                transform(line_interpolate_points(
                  st_geometryfromtext('LINESTRING (0 0, 10 0)'), 0.25),
                          p -> st_x(p)) AS xs
      """).head()
    assert(row.getSeq[String](0) == Seq("POINT (1 2)", "POINT (3 4)"))
    assert(row.getByte(1) == 2)
    assert(row.getSeq[Double](2) == Seq(2.5, 5.0, 7.5, 10.0))
    // ring closers count, matching st_numpoints
    val n = spark.sql(
      """SELECT size(st_points(st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 0))'))) AS n
      """).head().getInt(0)
    assert(n == 4)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val bad = intercept[Exception] {
      spark.sql("""SELECT line_interpolate_points(
        st_geometryfromtext('LINESTRING (0 0, 10 0)'), 0.0)""").collect()
    }
    assert(chain(bad).exists(_.contains("fraction")), chain(bad))
  }

  test("spherical geography: tagging, geodesic meters, family separation") {
    import graft.functions.GeoFns.{isGeography, toSphericalGeography, geographyToGeom}
    val ptWkb = toWkb(GPoint(-122.33, 47.61))
    val geog = toSphericalGeography(ptWkb)
    assert(isGeography(geog) && !isGeography(ptWkb))
    assert(geographyToGeom(geog) == GPoint(-122.33, 47.61))
    // a geography value must not leak into plain-geometry functions
    assert(intercept[IllegalArgumentException](fromWkb(geog))
      .getMessage.contains("geography"))
    // lon/lat validation
    assert(intercept[IllegalArgumentException](
      toSphericalGeography(toWkb(GPoint(200.0, 0.0))))
      .getMessage.contains("longitude/latitude"))
    // one degree of latitude along a meridian = R * pi/180 km, in meters
    val row = spark.sql(
      """SELECT st_distance(to_spherical_geography(st_point(10, 0)),
                            to_spherical_geography(st_point(10, 1))) AS m,
                st_astext(to_geometry(to_spherical_geography(st_point(3, 4)))) AS w
      """).head()
    assert(math.abs(row.getDouble(0) - 6371.01 * math.Pi / 180 * 1000) < 1e-6)
    assert(row.getString(1) == "POINT (3 4)")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val mixed = intercept[Exception] {
      spark.sql("""SELECT st_distance(to_spherical_geography(st_point(0, 0)),
                                      st_point(1, 1))""").collect()
    }
    assert(chain(mixed).exists(_.contains("mix")), chain(mixed))
    // line × point geography distance is REAL as of round 17: point at
    // lat 5 above an equatorial arc → the meridian arc, exactly
    val lp = spark.sql("""SELECT st_distance(
        to_spherical_geography(st_geometryfromtext('LINESTRING (0 0, 20 0)')),
        to_spherical_geography(st_point(10, 5)))""").head().getDouble(0)
    assert(math.abs(lp - 6371.01 * 5 * math.Pi / 180 * 1000) < 1e-6, lp.toString)
  }

  test("geography capability table: every planar-only surface rejects by name (round 18)") {
    // The GeoFns scaladoc table says relate/predicates, overlay,
    // buffer, aggregates, and accessors are planar-only; pin one
    // representative per row so the table cannot silently drift from
    // behavior. All reject through the single fromWkb choke point with
    // an error naming the geography-capable set.
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val gg = "to_spherical_geography(st_point(10, 10))"
    val planarOnly = Seq(
      s"st_contains($gg, $gg)",                                   // predicate
      s"st_relate($gg, $gg, 'T*****FF*')",                        // relate
      s"st_union($gg, $gg)",                                      // overlay
      s"st_intersection($gg, $gg)",                               // overlay
      s"st_buffer($gg, 1.0)",                                     // constructive
      s"st_x($gg)",                                               // accessor
      s"st_centroid($gg)")                                        // transform
    for (expr <- planarOnly) {
      val e = intercept[Exception](spark.sql(s"SELECT $expr").collect())
      assert(chain(e).exists(_.contains("geography")), s"$expr: ${chain(e)}")
    }
    for (agg <- Seq("convex_hull_agg", "geometry_union_agg")) {
      val e = intercept[Exception](
        spark.sql(s"SELECT $agg(g) FROM (SELECT $gg AS g)").collect())
      assert(chain(e).exists(_.contains("geography")), s"$agg: ${chain(e)}")
    }
    // and the geography-CAPABLE set keeps working on the same value
    val ok = spark.sql(s"""SELECT st_distance($gg, $gg) AS d,
        st_length(to_spherical_geography(st_geometryfromtext('LINESTRING (0 0, 1 0)'))) AS l,
        st_area(to_spherical_geography(
          st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))) AS a""").head()
    assert(ok.getDouble(0) == 0.0 && ok.getDouble(1) > 0 && ok.getDouble(2) > 0)
  }

  test("geography measures: spherical length/area/distance on lines and polygons") {
    import graft.functions.GeoFns.{toSphericalGeography, geographyArea,
      geographyLength, geographyDistance, greatCircleDistance}
    val R = 6371.01
    def geog(wkt: String) = toSphericalGeography(toWkb(g(wkt)))
    // length = geodesic segment sum (matches the haversine kernel)
    val len = geographyLength(geog("LINESTRING (10 0, 20 10, 30 0)"))
    val want = (greatCircleDistance(0, 10, 10, 20) +
      greatCircleDistance(10, 20, 0, 30)) * 1000
    assert(math.abs(len - want) < 1e-9, s"$len vs $want")
    // the classic octant: (0,0), (90,0), (0,90) covers 1/8 of the sphere
    val octant = geographyArea(geog("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
    val octWant = 4 * math.Pi * R * R * 1e6 / 8
    assert(math.abs(octant - octWant) / octWant < 1e-12, octant.toString)
    // orientation-independent (smaller-cap normalization)
    val octantCw = geographyArea(geog("POLYGON ((0 0, 0 90, 90 0, 0 0))"))
    assert(math.abs(octant - octantCw) / octWant < 1e-12)
    // a small ring converges to its planar area: 1°x1° at the equator
    val small = geographyArea(geog("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    val planar = math.pow(R * math.Pi / 180 * 1000, 2)
    assert(math.abs(small - planar) / planar < 2e-3, s"$small vs $planar")
    // holes subtract
    val holed = geographyArea(geog(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"))
    val shell = geographyArea(geog("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    val hole = geographyArea(geog("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"))
    assert(math.abs(holed - (shell - hole)) / shell < 1e-12)
    // l'Huilier differential: random small triangles, area from side
    // lengths alone must match the Gauss-Bonnet vertex-angle kernel
    val rnd = new scala.util.Random(20260819)
    for (i <- 1 to 100) {
      val lon = rnd.nextDouble() * 300 - 150; val lat = rnd.nextDouble() * 120 - 60
      val d1 = 0.5 + rnd.nextDouble() * 5; val d2 = 0.5 + rnd.nextDouble() * 5
      val tri = geog(s"POLYGON (($lon $lat, ${lon + d1} $lat, $lon ${lat + d2}, $lon $lat))")
      val got = geographyArea(tri)
      def side(aLat: Double, aLon: Double, bLat: Double, bLon: Double) =
        greatCircleDistance(aLat, aLon, bLat, bLon) / R // central angle
      val sa = side(lat, lon + d1, lat + d2, lon)
      val sb = side(lat, lon, lat + d2, lon)
      val sc = side(lat, lon, lat, lon + d1)
      val s = (sa + sb + sc) / 2
      val e = 4 * math.atan(math.sqrt(math.max(0.0,
        math.tan(s / 2) * math.tan((s - sa) / 2) *
          math.tan((s - sb) / 2) * math.tan((s - sc) / 2))))
      val lhuilier = e * R * R * 1e6
      assert(math.abs(got - lhuilier) / lhuilier < 1e-9, s"#$i: $got vs $lhuilier")
    }
    // a geography-tagged collection sums its polygon members (like
    // planar area) instead of silently reading 0
    val collArea = geographyArea(geog(
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 90 0, 0 90, 0 0)), POINT (50 50))"))
    assert(math.abs(collArea - octant) / octant < 1e-12, collArea.toString)
    // distance: crossing arcs → 0; point in polygon → 0; beyond-end
    // point → endpoint distance
    assert(geographyDistance(geog("LINESTRING (0 -5, 0 5)"),
      geog("LINESTRING (-5 0, 5 0)")) == 0.0)
    assert(geographyDistance(geog("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      geog("POINT (5 5)")) == 0.0)
    val beyond = geographyDistance(geog("LINESTRING (0 0, 20 0)"),
      geog("POINT (25 0)")).asInstanceOf[Double]
    assert(math.abs(beyond - greatCircleDistance(0, 20, 0, 25) * 1000) < 1e-9)
    // disjoint polygons: boundary-to-boundary
    val pp = geographyDistance(geog("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      geog("POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))")).asInstanceOf[Double]
    val edge = greatCircleDistance(5, 10, 5, 20) * 1000
    assert(pp <= edge + 1e-6 && pp > 0, s"$pp vs $edge")
    // SQL surface end-to-end
    val row = spark.sql(
      """SELECT st_length(to_spherical_geography(
                  st_geometryfromtext('LINESTRING (10 0, 20 0)'))) AS len,
                st_area(to_spherical_geography(
                  st_geometryfromtext('POLYGON ((0 0, 90 0, 0 90, 0 0))'))) AS a
      """).head()
    assert(math.abs(row.getDouble(0) - R * 10 * math.Pi / 180 * 1000) < 1e-6)
    assert(math.abs(row.getDouble(1) - 4 * math.Pi * R * R * 1e6 / 8) /
      (4 * math.Pi * R * R * 1e6 / 8) < 1e-12)
  }

  test("simplify_geometry: Douglas-Peucker keeps shape above tolerance, rings stay valid") {
    import graft.functions.GeoFns.simplify
    // collinear interior vertices vanish at any tolerance
    assert(toWkt(simplify(g("LINESTRING (0 0, 1 0, 2 0, 3 0, 4 0)"), 0.0)) ==
      "LINESTRING (0 0, 4 0)")
    // the spike survives iff it exceeds the tolerance
    assert(toWkt(simplify(g("LINESTRING (0 0, 2 1, 4 0)"), 0.5)) ==
      "LINESTRING (0 0, 2 1, 4 0)")
    assert(toWkt(simplify(g("LINESTRING (0 0, 2 1, 4 0)"), 1.5)) == "LINESTRING (0 0, 4 0)")
    // recursive keep: a staircase where every level matters at small tol
    assert(numPoints(simplify(g("LINESTRING (0 0, 1 1, 2 0, 3 1, 4 0)"), 0.1)) == 5)
    // a ring that would collapse keeps its original shape (never invalid)
    val tri = "POLYGON ((0 0, 4 0, 2 1, 0 0))"
    assert(toWkt(simplify(g(tri), 5.0)) == tri)
    // a redundant ring vertex disappears; area is preserved
    val sq = simplify(g("POLYGON ((0 0, 2 0, 4 0, 4 4, 0 4, 0 0))"), 0.0)
    assert(toWkt(sq) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert(area(sq) == 16.0)
    assert(intercept[IllegalArgumentException](simplify(g(tri), -1.0))
      .getMessage.contains("tolerance"))
  }

  test("geometry_to_bing_tiles: envelope-ranged exact cover") {
    import graft.functions.BingTiles.cover
    // a rectangle spanning two zoom-1 tiles horizontally
    assert(cover(g("POLYGON ((-10 10, 10 10, 10 20, -10 20, -10 10))"), 1) ==
      Seq((0, 0), (1, 0)))
    // a diagonal line misses the off-diagonal tiles of its envelope
    val diag = cover(g("LINESTRING (-170 80, -170 10, 170 10)"), 2)
    assert(!diag.contains((3, 0)), s"L-shaped line must not cover the far corner tile: $diag")
    assert(diag.contains((0, 0)) && diag.contains((3, 1)), diag.toString)
    // tile-count explosion is rejected by name
    assert(intercept[IllegalArgumentException](
      cover(g("POLYGON ((-170 -80, 170 -80, 170 80, -170 80, -170 -80))"), 12))
      .getMessage.contains("limit"))
    val n = spark.sql(
      """SELECT size(geometry_to_bing_tiles(
           st_geometryfromtext('POLYGON ((-10 10, 10 10, 10 20, -10 20, -10 10))'), 1)) AS n
      """).head().getInt(0)
    assert(n == 2)
  }

  test("convex_hull_agg: bounded-state aggregate over 10k grid points across merges") {
    // a 100x100 grid in [0,1]^2: the hull is exactly the unit square
    // (collinear boundary points must be dropped), through multiple
    // partial compactions (CompactAt = 1024) and a 7-way merge
    val row = spark.range(10000)
      .selectExpr("st_point(cast(id % 100 as double) / 99, cast(id div 100 as double) / 99) AS p")
      .repartition(7)
      .selectExpr("convex_hull_agg(p) AS h")
      .selectExpr("st_area(h) AS a", "st_numpoints(h) AS n", "st_astext(h) AS wkt")
      .head()
    assert(row.getDouble(0) == 1.0, row.getString(2))
    assert(row.getInt(1) == 5, s"hull must be the 4 corners + closure: ${row.getString(2)}")
    // empty input group → null; geometry inputs contribute their vertices
    val row2 = spark.sql(
      """SELECT convex_hull_agg(g) AS h FROM (
           SELECT st_geometryfromtext('LINESTRING (0 0, 4 0)') AS g
           UNION ALL SELECT st_geometryfromtext('POINT (2 3)')) v""").head()
    assert(GeoFns.toWkt(GeoFns.fromWkb(row2.getAs[Array[Byte]](0))) ==
      "POLYGON ((0 0, 4 0, 2 3, 0 0))")
    val empty = spark.range(1).filter("id < 0")
      .selectExpr("st_point(cast(id as double), 0.0) AS p")
      .selectExpr("convex_hull_agg(p) AS h").head()
    assert(empty.isNullAt(0))
  }

  test("geo_distance_join plans an equi-join on grid cells, not a cartesian product") {
    val df = graft.queries.Geo.geoDistanceJoin(tables)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"spatial join must bucket, not all-pairs:\n${plan.take(1500)}")
    // ground truth on the sf0.001 fixture via the all-pairs reference
    import org.apache.spark.sql.functions._
    val pts = tables.documents.select(col("doc_id"),
      (col("doc_id") * 37 % 100).cast("double").as("x"),
      (col("doc_id") * 61 % 100).cast("double").as("y")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expect = (for {
      (a, ax, ay) <- pts; (b, bx, by) <- pts
      if a < b && math.hypot(ax - bx, ay - by) < 5.0
    } yield (a, b)).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"pairs: got ${got.size}, want ${expect.size}")
  }

  // ------------------------------------------------------ overlay (r17)


  test("overlay: hand-derived polygon cases across all four operators") {
    def w(gm: Geom) = toWkt(gm)
    val a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    val b = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    // overlapping squares
    assert(area(GeoOverlay.intersection(a, b)) == 1.0)
    assert(area(GeoOverlay.union(a, b)) == 7.0)
    assert(area(GeoOverlay.difference(a, b)) == 3.0)
    assert(area(GeoOverlay.symDifference(a, b)) == 6.0)
    // identical
    assert(w(GeoOverlay.union(a, a)) == w(a) ||
      area(GeoOverlay.union(a, a)) == 4.0)
    assert(area(GeoOverlay.intersection(a, a)) == 4.0)
    assert(GeoOverlay.difference(a, a).isEmpty)
    assert(GeoOverlay.symDifference(a, a).isEmpty)
    // containment: difference punches a HOLE
    val big = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val inner = g("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))")
    val holed = GeoOverlay.difference(big, inner)
    assert(area(holed) == 96.0, w(holed))
    assert(holed.isInstanceOf[GPolygon] &&
      holed.asInstanceOf[GPolygon].rings.length == 2, w(holed))
    assert(area(GeoOverlay.intersection(big, inner)) == 4.0)
    assert(area(GeoOverlay.union(big, inner)) == 100.0)
    assert(area(GeoOverlay.symDifference(big, inner)) == 96.0)
    // edge-adjacent squares: union merges, intersection is the shared EDGE
    val right = g("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")
    val merged = GeoOverlay.union(a, right)
    assert(area(merged) == 8.0 && merged.isInstanceOf[GPolygon], w(merged))
    val sharedEdge = GeoOverlay.intersection(a, right)
    assert(sharedEdge.isInstanceOf[GLineString], w(sharedEdge))
    assert(GeoFns.length(sharedEdge) == 2.0, w(sharedEdge))
    // corner-touching squares: union stays TWO shells, intersection is a POINT
    val diag = g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
    val pinch = GeoOverlay.union(a, diag)
    assert(area(pinch) == 8.0 && pinch.isInstanceOf[GMultiPolygon], w(pinch))
    assert(w(GeoOverlay.intersection(a, diag)) == "POINT (2 2)")
    // disjoint
    val far = g("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
    assert(GeoOverlay.intersection(a, far).isEmpty)
    assert(GeoOverlay.union(a, far).isInstanceOf[GMultiPolygon])
    assert(area(GeoOverlay.union(a, far)) == 5.0)
    // symdifference of overlapping squares pinches at the overlap
    // corners (degree-4 stitch nodes) — two L-shaped shells
    val sd = GeoOverlay.symDifference(a, b)
    assert(sd.isInstanceOf[GMultiPolygon], w(sd))
    // hole interactions: subtracting a bridge across the hole splits
    // the holed square into two slabs (bridge ∩ holed = 2·10 − 4 = 16)
    val bridge = g("POLYGON ((4 0, 6 0, 6 10, 4 10, 4 0))")
    val cut = GeoOverlay.difference(holed, bridge)
    assert(area(cut) == 96.0 - 16.0, w(cut))
    assert(cut.isInstanceOf[GMultiPolygon], w(cut))
  }

  test("overlay: line clipping and point filtering") {
    val sq = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    // chord: clipped to the inside stretch
    assert(toWkt(GeoOverlay.intersection(g("LINESTRING (-1 1, 3 1)"), sq)) ==
      "LINESTRING (0 1, 2 1)")
    assert(toWkt(GeoOverlay.difference(g("LINESTRING (-1 1, 3 1)"), sq)) ==
      "MULTILINESTRING ((-1 1, 0 1), (2 1, 3 1))")
    // boundary-rider: intersection keeps it (closure), difference drops it
    assert(toWkt(GeoOverlay.intersection(g("LINESTRING (0 0, 2 0)"), sq)) ==
      "LINESTRING (0 0, 2 0)")
    assert(GeoOverlay.difference(g("LINESTRING (0 0, 2 0)"), sq).isEmpty)
    // line touching the boundary at one point from outside → POINT
    assert(toWkt(GeoOverlay.intersection(g("LINESTRING (-1 -1, 3 -1, 2 0)"), sq))
      == "POINT (2 0)")
    // polygon × line commutes
    assert(toWkt(GeoOverlay.intersection(sq, g("LINESTRING (-1 1, 3 1)"))) ==
      "LINESTRING (0 1, 2 1)")
    // line × line: overlap stretch and crossing point
    assert(toWkt(GeoOverlay.intersection(
      g("LINESTRING (0 0, 2 0)"), g("LINESTRING (1 0, 3 0)"))) ==
      "LINESTRING (1 0, 2 0)")
    assert(toWkt(GeoOverlay.intersection(
      g("LINESTRING (0 0, 2 2)"), g("LINESTRING (0 2, 2 0)"))) == "POINT (1 1)")
    assert(toWkt(GeoOverlay.union(
      g("LINESTRING (0 0, 2 0)"), g("LINESTRING (1 0, 3 0)"))) ==
      "LINESTRING (0 0, 1 0, 2 0, 3 0)")
    // mixed-dimension line×line result is a GEOMETRYCOLLECTION (r17)
    val mixedLl = GeoOverlay.intersection(
      g("MULTILINESTRING ((0 0, 2 0), (0 1, 2 3))"),
      g("MULTILINESTRING ((1 0, 3 0), (2 1, 0 3))"))
    assert(mixedLl.isInstanceOf[GGeometryCollection], toWkt(mixedLl))
    assert(toWkt(mixedLl) == "GEOMETRYCOLLECTION (LINESTRING (1 0, 2 0), POINT (1 2))",
      toWkt(mixedLl))
    // points
    assert(toWkt(GeoOverlay.intersection(
      g("MULTIPOINT ((1 1), (5 5), (2 0))"), sq)) == "MULTIPOINT ((1 1), (2 0))")
    assert(toWkt(GeoOverlay.difference(
      g("MULTIPOINT ((1 1), (5 5), (2 0))"), sq)) == "POINT (5 5)")
    assert(toWkt(GeoOverlay.union(g("POINT (1 1)"), g("POINT (2 2)"))) ==
      "MULTIPOINT ((1 1), (2 2))")
    // covered point absorbed by union; an uncovered one survives into
    // a GEOMETRYCOLLECTION (r17 — previously a named error)
    assert(toWkt(GeoOverlay.union(g("POINT (1 1)"), sq)) == toWkt(sq))
    val u2 = GeoOverlay.union(g("POINT (9 9)"), sq)
    assert(toWkt(u2) ==
      "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), POINT (9 9))",
      toWkt(u2))
    // subtracting a lower-dimensional geometry is a no-op
    assert(toWkt(GeoOverlay.difference(sq, g("LINESTRING (0 0, 2 2)"))) == toWkt(sq))
  }

  test("overlay: round-17 review regressions (non-dyadic crossings, island-in-hole, multi-component geography containment)") {
    // 1) a proper line×line crossing at a NON-dyadic point must come
    //    back as the crossing POINT — the interpolated intersection is
    //    generally not exactly collinear with the other segment, so an
    //    exact re-verification of cut points dropped it
    val x = GeoOverlay.intersection(
      g("LINESTRING (0 0, 1 1)"), g("LINESTRING (0 1, 2 0)"))
    assert(x.isInstanceOf[GPoint], toWkt(x))
    val gp = x.asInstanceOf[GPoint]
    assert(math.abs(gp.x - 2.0 / 3) < 1e-12 && math.abs(gp.y - 2.0 / 3) < 1e-12)
    assert(intersects(g("LINESTRING (0 0, 1 1)"), g("LINESTRING (0 1, 2 0)")))
    // 2) hole assignment must skip an ISLAND shell nested inside the
    //    hole: subtracting a donut from a square leaves the square with
    //    the donut's outer ring as a hole AND the donut's hole as an
    //    island — attaching the hole to the island is structurally wrong
    val sq10 = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val donut = g("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2), (3 3, 7 3, 7 7, 3 7, 3 3))")
    val carved = GeoOverlay.difference(sq10, donut)
    assert(area(carved) == 100.0 - (36.0 - 16.0), toWkt(carved))
    assert(carved.isInstanceOf[GMultiPolygon], toWkt(carved))
    assert(!contains(carved, g("POINT (2.5 2.5)")), "hole interior must stay excluded")
    assert(contains(carved, g("POINT (5 5)")), "island interior is part of the result")
    assert(invalidReason(carved).isEmpty, toWkt(carved))
    // feeding the result back into another op must not trip validation
    assert(area(GeoOverlay.intersection(carved, sq10)) == area(carved))
    // 3) geography distance containment: a multi-component operand
    //    whose FIRST component is outside but a later one is inside
    //    must still read 0
    import graft.functions.GeoFns.{toSphericalGeography, geographyDistance}
    def geog(wkt: String) = toSphericalGeography(toWkb(g(wkt)))
    assert(geographyDistance(
      geog("MULTIPOINT ((20 20), (5 5))"),
      geog("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 0.0)
    assert(geographyDistance(
      geog("MULTILINESTRING ((20 20, 25 25), (4 5, 6 5))"),
      geog("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 0.0)
  }

  test("overlay: inclusion-exclusion + relate consistency on random convex pairs") {
    val rnd = new scala.util.Random(20260817)
    def convex(): Geom = {
      val k = 3 + rnd.nextInt(6)
      val angles = Array.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      if (!angles.sliding(2).forall(p => p(1) - p(0) > 0.05)) return convex()
      val cx = rnd.nextDouble() * 60; val cy = rnd.nextDouble() * 60
      val r = 3 + rnd.nextDouble() * 25
      val verts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
      g("POLYGON ((" +
        (verts :+ verts(0)).map(v => s"${v._1} ${v._2}").mkString(", ") + "))")
    }
    for (i <- 1 to 200) {
      val (a, b) = (convex(), convex())
      val (aa, ab) = (area(a), area(b))
      val inter = GeoOverlay.intersection(a, b)
      val uni = GeoOverlay.union(a, b)
      val dif = GeoOverlay.difference(a, b)
      val sym = GeoOverlay.symDifference(a, b)
      val tol = 1e-9 * (aa + ab)
      assert(math.abs(aa + ab - (area(uni) + area(inter))) <= tol,
        s"incl-excl #$i: $aa + $ab vs ${area(uni)} + ${area(inter)}")
      assert(math.abs(area(dif) + area(inter) - aa) <= tol,
        s"partition #$i")
      assert(math.abs(area(sym) - (area(uni) - area(inter))) <= tol,
        s"symdiff #$i")
      // matrix consistency: nonempty intersection ⇔ intersects
      assert(!inter.isEmpty == intersects(a, b), s"relate-consistency #$i")
      // containment collapse: A ⊆ B ⇒ A∩B = A, A∪B = B
      if (contains(b, a)) {
        assert(math.abs(area(inter) - aa) <= tol, s"nested-inter #$i")
        assert(math.abs(area(uni) - ab) <= tol, s"nested-union #$i")
      }
    }
  }

  test("overlay: random axis-aligned boxes vs exact interval closed forms") {
    val rnd = new scala.util.Random(20260818)
    for (i <- 1 to 500) {
      val x1 = rnd.nextInt(5); val y1 = rnd.nextInt(5)
      val x2 = x1 + 1 + rnd.nextInt(3); val y2 = y1 + 1 + rnd.nextInt(3)
      val u1 = rnd.nextInt(5); val v1 = rnd.nextInt(5)
      val u2 = u1 + 1 + rnd.nextInt(3); val v2 = v1 + 1 + rnd.nextInt(3)
      val a = g(s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))")
      val b = g(s"POLYGON (($u1 $v1, $u2 $v1, $u2 $v2, $u1 $v2, $u1 $v1))")
      val ix = math.max(0, math.min(x2, u2) - math.max(x1, u1))
      val iy = math.max(0, math.min(y2, v2) - math.max(y1, v1))
      val interA = (ix * iy).toDouble
      val areaA = ((x2 - x1) * (y2 - y1)).toDouble
      val areaB = ((u2 - u1) * (v2 - v1)).toDouble
      assert(area(GeoOverlay.intersection(a, b)) == interA, s"box-inter #$i")
      assert(area(GeoOverlay.union(a, b)) == areaA + areaB - interA, s"box-union #$i")
      assert(area(GeoOverlay.difference(a, b)) == areaA - interA, s"box-diff #$i")
      assert(area(GeoOverlay.symDifference(a, b)) ==
        areaA + areaB - 2 * interA, s"box-sym #$i")
      // result TYPE matches the interval picture (the dimensional-
      // collapse surface: area overlap / edge touch / corner touch /
      // disjoint)
      val inter = GeoOverlay.intersection(a, b)
      val touchX = math.min(x2, u2) == math.max(x1, u1)
      val touchY = math.min(y2, v2) == math.max(y1, v1)
      val sepX = math.min(x2, u2) < math.max(x1, u1)
      val sepY = math.min(y2, v2) < math.max(y1, v1)
      if (ix > 0 && iy > 0) assert(!inter.isEmpty && area(inter) > 0, s"type-a #$i")
      else if (sepX || sepY) assert(inter.isEmpty, s"type-d #$i")
      else if (touchX && touchY)
        assert(inter.isInstanceOf[GPoint], s"type-p #$i: ${toWkt(inter)}")
      else assert(inter.isInstanceOf[GLineString] ||
        inter.isInstanceOf[GMultiLineString], s"type-l #$i: ${toWkt(inter)}")
    }
  }

  test("st_buffer: tessellated-arc closed forms and convergence") {
    val r = 2.0
    // point buffer = regular 32-gon INSCRIBED in the radius-r circle
    val ptBuf = GeoOverlay.buffer(g("POINT (5 5)"), r)
    val ngon = 16 * r * r * math.sin(math.Pi / 16)
    // tolerance = the documented snap-round perturbation (grid ~r·2⁻³⁰
    // over a ~32-vertex ring), far under the tessellation error
    assert(math.abs(area(ptBuf) - ngon) < 1e-6, s"${area(ptBuf)} vs $ngon")
    // convergence toward πr² from below
    val fine = GeoOverlay.buffer(g("POINT (5 5)"), r, quadSegs = 64)
    assert(area(ptBuf) < area(fine) && area(fine) < math.Pi * r * r)
    assert(math.Pi * r * r - area(fine) < 0.005)
    // segment buffer = capsule: 2rL + the full 32-gon from the two caps
    val segBuf = GeoOverlay.buffer(g("LINESTRING (0 0, 7 0)"), r)
    assert(math.abs(area(segBuf) - (2 * r * 7 + ngon)) < 1e-6, s"${area(segBuf)}")
    // erosion of a rectangle = the exact inset rectangle (integer and
    // dyadic coordinates snap to themselves, so this stays EXACT)
    val rect = g("POLYGON ((0 0, 10 0, 10 8, 0 8, 0 0))")
    val eroded = GeoOverlay.buffer(rect, -2.0)
    assert(area(eroded) == 6.0 * 4.0, toWkt(eroded))
    // dilation contains the original; erosion is contained by it
    val dilated = GeoOverlay.buffer(rect, 2.0)
    assert(contains(dilated, rect), "dilation must contain the input")
    assert(contains(rect, eroded), "erosion must be contained by the input")
    assert(area(dilated) > 80.0 && area(eroded) < 80.0)
    // buffer(0) is the identity; full erosion empties
    assert(toWkt(GeoOverlay.buffer(rect, 0.0)) == toWkt(rect))
    assert(GeoOverlay.buffer(rect, -5.0).isEmpty)
    // negative buffer of a non-polygon fails by name
    val e = intercept[IllegalArgumentException](
      GeoOverlay.buffer(g("LINESTRING (0 0, 7 0)"), -1.0))
    assert(e.getMessage.contains("negative distance"), e.getMessage)
  }

  test("overlay SQL surface: st_intersection/st_union/st_difference/st_symdifference/st_buffer/geometry_union_agg") {
    val r = spark.sql(
      """SELECT st_area(st_intersection(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                  st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS ia,
                st_area(st_union(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                  st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS ua,
                st_area(st_difference(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                  st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS da,
                st_area(st_symdifference(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                  st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))) AS sa,
                st_area(st_buffer(st_point(0, 0), 2.0)) AS ba
      """).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 7.0 &&
      r.getDouble(2) == 3.0 && r.getDouble(3) == 6.0)
    assert(math.abs(r.getDouble(4) - 16 * 4 * math.sin(math.Pi / 16)) < 1e-6)
    // geometry_union_agg: 5 overlapping unit-step tiles [i, i+2]×[0,2]
    // union to [0, 6]×[0, 2] = area 12
    val agg = spark.sql(
      """SELECT st_area(geometry_union_agg(st_geometryfromtext(
                  concat('POLYGON ((', i, ' 0, ', i + 2, ' 0, ', i + 2,
                         ' 2, ', i, ' 2, ', i, ' 0))')))) AS a
         FROM range(5) t(i)""").head()
    assert(agg.getDouble(0) == 12.0, agg.getDouble(0).toString)
  }

  test("round-17 tail: boundary, interior rings, envelope pts, expand, flatten, array union, nearest points") {
    def w(gm: Geom) = toWkt(gm)
    // boundary edge semantics
    assert(w(g("POINT (1 2)")) != null) // parse sanity
    val r = spark.sql(
      """SELECT st_astext(st_boundary(st_geometryfromtext('POINT (1 2)'))) AS pb,
                st_astext(st_boundary(st_geometryfromtext(
                  'LINESTRING (0 0, 1 0, 1 1, 0 0)'))) AS closedb,
                st_astext(st_boundary(st_geometryfromtext(
                  'LINESTRING (0 0, 5 0)'))) AS openb,
                st_astext(st_boundary(st_geometryfromtext(
                  'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))) AS polyb
      """).head()
    assert(r.getString(0) == "GEOMETRYCOLLECTION EMPTY", r.getString(0))
    assert(r.getString(1) == "MULTIPOINT EMPTY", r.getString(1))
    assert(r.getString(2) == "MULTIPOINT ((0 0), (5 0))", r.getString(2))
    assert(r.getString(3) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)", r.getString(3))
    // boundary of a collection fails by name
    val eb = intercept[Exception](spark.sql(
      """SELECT st_boundary(st_geometryfromtext(
           'GEOMETRYCOLLECTION (POINT (1 1))'))""").collect())
    assert(eb.getMessage.contains("ST_Boundary") ||
      eb.getCause.getMessage.contains("ST_Boundary"))
    // nearest points: intersecting operands share one witness point
    val n = spark.sql(
      """SELECT transform(geometry_nearest_points(
                  st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),
                  st_geometryfromtext('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))')),
                p -> st_astext(p)) AS ws,
                geometry_nearest_points(
                  st_geometryfromtext('POLYGON EMPTY'),
                  st_geometryfromtext('POINT (1 1)')) AS nul
      """).head()
    val ws = n.getSeq[String](0)
    assert(ws.length == 2 && ws(0) == ws(1), ws.toString)
    assert(n.isNullAt(1))
    // geometry_union skips nulls; all-null → NULL
    val u = spark.sql(
      """SELECT st_area(geometry_union(array(
                  st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),
                  CAST(NULL AS BINARY),
                  st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')))) AS a,
                geometry_union(array(CAST(NULL AS BINARY))) AS nul""").head()
    assert(u.getDouble(0) == 7.0, u.getDouble(0).toString)
    assert(u.isNullAt(1))
  }

  test("round-17 self-review regressions: degenerate arcs, collection erosion, mixed collapse, chain wrap") {
    import graft.functions.GeoFns.{toSphericalGeography, geographyDistance,
      greatCircleDistance}
    def geog(wkt: String) = toSphericalGeography(toWkb(g(wkt)))
    def w(gm: Geom) = toWkt(gm)

    // 1a. a consecutive duplicate vertex (zero-length arc) must not
    // zero the geography distance: the degenerate arc has no great
    // circle, so it cannot "cross" a far-away arc
    val clean = geographyDistance(geog("LINESTRING (0 0, 1 0)"),
      geog("LINESTRING (50 50, 60 60)")).asInstanceOf[Double]
    val dup = geographyDistance(geog("LINESTRING (0 0, 0 0, 1 0)"),
      geog("LINESTRING (50 50, 60 60)")).asInstanceOf[Double]
    assert(clean > 1e6, clean.toString) // ~6700 km, nowhere near 0
    assert(math.abs(dup - clean) < 1e-6, s"$dup vs $clean")
    // 1b. a run that is ALL duplicates degenerates to a point probe
    // instead of vanishing from the distance entirely
    val degen = geographyDistance(geog("LINESTRING (0 0, 0 0)"),
      geog("POINT (0 1)")).asInstanceOf[Double]
    assert(math.abs(degen - greatCircleDistance(0, 0, 1, 0) * 1000) < 1e-6,
      degen.toString)

    // 2. negative buffer of a collection: point/line members have an
    // empty negative buffer — they must not punch holes in or carve
    // slots from the polygon member (rectangle erosion is exact)
    val gc = g("GEOMETRYCOLLECTION (POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)), " +
      "POINT (5 5), LINESTRING (2 2, 3 3))")
    val eroded = GeoOverlay.buffer(gc, -1)
    assert(area(eroded) == 64.0, w(eroded))

    // 3. zero-area polygon intersection keeps BOTH the shared-edge
    // linework and the isolated corner touch (a collection, per OGC)
    val sq = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val edgeAndCorner = g("MULTIPOLYGON (((10 2, 12 2, 12 5, 10 5, 10 2)), " +
      "((-2 10, 0 10, 0 12, -2 12, -2 10)))")
    val both = GeoOverlay.intersection(sq, edgeAndCorner)
    assert(w(both) == "GEOMETRYCOLLECTION (LINESTRING (10 2, 10 5), POINT (0 10))",
      w(both))

    // 4. shared linework wrapping the ring's start vertex merges into
    // ONE maximal chain (the walk now grows the head too)
    val hug = g("POLYGON ((0 3, -1 3, -1 -1, 3 -1, 3 0, 0 0, 0 3))")
    val chain = GeoOverlay.intersection(sq, hug)
    assert(chain.isInstanceOf[GLineString], w(chain))
    assert(w(chain) == "LINESTRING (0 3, 0 0, 3 0)", w(chain))
  }
}
