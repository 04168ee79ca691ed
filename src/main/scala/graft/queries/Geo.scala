package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geospatial oracle entries (SURVEY §2.5 tail — the Velox-library
  * `ST_*` family the reference registers wholesale via
  * `axiom/optimizer/tests/AxiomSql.cpp:149`).
  *
  * DuckDB in the driver has no spatial extension, so every entry is
  * designed to be DOUBLY derived: the Spark side runs the real geometry
  * kernels ([[graft.functions.GeoFns]] — WKT parse, even-odd
  * point-in-polygon, segment intersection, shoelace area), while the
  * oracle recomputes the same answers from closed-form planar math in
  * plain SQL (half-plane sign tests for the convex polygon, sqrt for
  * distances, cross products for crossings). Agreement is a genuine
  * differential test of the kernels, not a re-run of them.
  *
  * Coordinates derive deterministically from doc_id (small integers, so
  * double arithmetic is exact on both engines); doubles are rounded to
  * 6 digits on both sides. The fixed convex quad's vertices sit on
  * half-integers with edge lines that admit no integer solutions or,
  * where they might, both sides treat boundary identically (strict
  * interior for contains — kernel returns boundary ⇒ false, oracle's
  * strict sign test ⇒ false).
  */
object Geo {

  /** documents projected to doc_id and spread to cluster parallelism,
    * applied ONLY to the entries whose per-row overlay kernels are
    * expensive (geo_overlay / geo_buffer / geo_union_agg /
    * geo_collection): those derive geometry from doc_id alone and run
    * compute-bound kernels, but the corpus arrives as ONE parquet split
    * at bench scale (a single small file = one scan partition = one
    * core for the whole kernel pass). Projecting to the id FIRST keeps
    * the exchange at 8 bytes/row (guide §2.3 "project before the
    * exchange"); repartitioning to `defaultParallelism` is
    * scale-adaptive, not a local constant — at 100 TB the scan already
    * has at least that many natural splits and this is a cheap
    * reshuffle of ids, while at bench scale it is the difference
    * between 1 and N cores on a CPU-bound operator (the
    * [[graft.llm.Dedup]] docsSpread discipline). The CHEAP
    * expression-only entries keep the plain scan: measured round-20
    * A/B, the added exchange costs them ~0.3 s flat (1.5-2.5× on
    * sub-second entries) for no kernel time to parallelize. */
  private def docIds(t: Tables): DataFrame =
    t.documents.select(col("doc_id"))
      .repartition(t.spark.sparkContext.defaultParallelism)

  // doc-derived planar points: integers in [0, 100)
  private def px = (col("doc_id") * 37 % 100).cast("double")
  private def py = (col("doc_id") * 61 % 100).cast("double")
  private def qx = (col("doc_id") * 17 % 100).cast("double")
  private def qy = (col("doc_id") * 29 % 100).cast("double")

  private def stPoint(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    call_function("st_point", x, y)

  /** Measures: point distance, great-circle distance, and the area +
    * centroid of a doc-derived triangle built through the WKT parser. */
  def geoMeasures(t: Tables): DataFrame = {
    val triWkt = concat(lit("POLYGON ((0 0, "), (px + 1).cast("long"),
      lit(" 0, 0 "), (py + 1).cast("long"), lit(", 0 0))"))
    val tri = call_function("st_geometryfromtext", triWkt)
    // geography line/polygon measures (round 17): lon = py-family,
    // lat = px-50-family, all valid ranges by construction. The
    // oracle recomputes length from haversine segment sums and the
    // triangle's spherical area from l'HUILIER's side-length theorem —
    // a genuinely independent derivation from the kernel's
    // Gauss-Bonnet vertex-angle excess.
    def geogFromWkt(w: org.apache.spark.sql.Column) =
      call_function("to_spherical_geography", call_function("st_geometryfromtext", w))
    val lat = (px - 50).cast("long")
    val geogLine = geogFromWkt(concat(
      lit("LINESTRING ("), py.cast("long"), lit(" "), lat,
      lit(", "), qy.cast("long"), lit(" "), (qx - 50).cast("long"),
      lit(", "), py.cast("long"), lit(" "), (qx - 50).cast("long"), lit(")")))
    val geogTri = geogFromWkt(concat(
      lit("POLYGON (("), py.cast("long"), lit(" "), lat,
      lit(", "), (py + 2).cast("long"), lit(" "), lat,
      lit(", "), py.cast("long"), lit(" "), (lat + 2),
      lit(", "), py.cast("long"), lit(" "), lat, lit("))")))
    val eqArc = geogFromWkt(concat(
      lit("LINESTRING ("), py.cast("long"), lit(" 0, "),
      (py + 10).cast("long"), lit(" 0)")))
    t.documents.select(
      col("doc_id"),
      round(call_function("st_distance", stPoint(px, py), stPoint(qx, qy)), 6).as("dist"),
      round(call_function("great_circle_distance", px - 50, py, qx - 50, qy), 6).as("gcd"),
      // geography path end-to-end: tag lon/lat points as spherical
      // geography, geodesic st_distance in METERS (round 15)
      round(call_function("st_distance",
        call_function("to_spherical_geography", stPoint(py, px - 50)),
        call_function("to_spherical_geography", stPoint(qy, qx - 50))), 3).as("gcd_m"),
      round(call_function("st_area", tri), 6).as("tri_area"),
      round(call_function("st_x", call_function("st_centroid", tri)), 6).as("cx"),
      round(call_function("st_y", call_function("st_centroid", tri)), 6).as("cy"),
      round(call_function("st_length", geogLine), 3).as("glen_m"),
      round(call_function("st_area", geogTri) / 1e6, 3).as("gtri_km2"),
      round(call_function("st_distance", eqArc, call_function(
        "to_spherical_geography", stPoint(py + 5, (px - 50) / 2))), 3).as("gxt_in_m"),
      round(call_function("st_distance", eqArc, call_function(
        "to_spherical_geography", stPoint(py + 15, (px - 50) / 2))), 3).as("gxt_out_m"))
      .orderBy(col("doc_id"))
  }

  val geoMeasuresSql: String =
    """SELECT doc_id,
              round(sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy)), 6) AS dist,
              round(2 * 6371.01 * asin(sqrt(
                sin(radians((qx - px) / 2)) * sin(radians((qx - px) / 2)) +
                cos(radians(px - 50)) * cos(radians(qx - 50)) *
                sin(radians((qy - py) / 2)) * sin(radians((qy - py) / 2)))), 6) AS gcd,
              round(1000 * 2 * 6371.01 * asin(sqrt(
                sin(radians((qx - px) / 2)) * sin(radians((qx - px) / 2)) +
                cos(radians(px - 50)) * cos(radians(qx - 50)) *
                sin(radians((qy - py) / 2)) * sin(radians((qy - py) / 2)))), 3) AS gcd_m,
              round((px + 1) * (py + 1) / 2, 6) AS tri_area,
              round((px + 1) / 3, 6) AS cx,
              round((py + 1) / 3, 6) AS cy,
              round(1000 * (
                2 * 6371.01 * asin(sqrt(
                  sin(radians((qx - px) / 2)) * sin(radians((qx - px) / 2)) +
                  cos(radians(px - 50)) * cos(radians(qx - 50)) *
                  sin(radians((qy - py) / 2)) * sin(radians((qy - py) / 2)))) +
                2 * 6371.01 * asin(sqrt(
                  cos(radians(qx - 50)) * cos(radians(qx - 50)) *
                  sin(radians((py - qy) / 2)) * sin(radians((py - qy) / 2))))), 3)
                AS glen_m,
              round(4 * atan(sqrt(greatest(0,
                tan(st / 2) * tan((st - sa) / 2) *
                tan((st - sb) / 2) * tan((st - sc) / 2)))) *
                6371.01 * 6371.01, 3) AS gtri_km2,
              round(1000 * 6371.01 * radians(abs(px - 50) / 2), 3) AS gxt_in_m,
              round(1000 * 2 * 6371.01 * asin(sqrt(
                sin(radians((px - 50) / 4)) * sin(radians((px - 50) / 4)) +
                cos(radians((px - 50) / 2)) *
                sin(radians(2.5)) * sin(radians(2.5)))), 3) AS gxt_out_m
       FROM (SELECT doc_id, px, py, qx, qy, sa, sb, sc, (sa + sb + sc) / 2 AS st
             FROM (SELECT doc_id, px, py, qx, qy,
                          2 * asin(sqrt(
                            sin(radians(1)) * sin(radians(1)) +
                            cos(radians(px - 50)) * cos(radians(px - 48)) *
                            sin(radians(1)) * sin(radians(1)))) AS sa,
                          radians(2) AS sb,
                          2 * asin(cos(radians(px - 50)) * sin(radians(1))) AS sc
                   FROM (SELECT doc_id,
                                CAST(doc_id * 37 % 100 AS DOUBLE) AS px,
                                CAST(doc_id * 61 % 100 AS DOUBLE) AS py,
                                CAST(doc_id * 17 % 100 AS DOUBLE) AS qx,
                                CAST(doc_id * 29 % 100 AS DOUBLE) AS qy
                         FROM documents) b) a) p
       ORDER BY doc_id"""

  // fixed convex CCW quad on half-integer vertices
  private val quadWkt =
    "POLYGON ((10.5 0.5, 89.5 10.5, 79.5 90.5, 0.5 69.5, 10.5 0.5))"

  /** Predicates: strict-interior containment of the doc point in the
    * fixed convex quad, plus segment-vs-polygon intersection. The
    * oracle derives both from orientation signs; the kernels run
    * even-odd ray casting and the general segment sweep. */
  def geoPredicates(t: Tables): DataFrame = {
    val quad = call_function("st_geometryfromtext", lit(quadWkt))
    val p = stPoint(px, py)
    val segWkt = concat(lit("LINESTRING ("), px.cast("long"), lit(" "), py.cast("long"),
      lit(", "), (px + 7).cast("long"), lit(" "), (py + 3).cast("long"), lit(")"))
    val seg = call_function("st_geometryfromtext", segWkt)
    t.documents.select(
      col("doc_id"),
      call_function("st_contains", quad, p).as("in_poly"),
      call_function("st_within", p, quad).as("within_p"),
      call_function("st_intersects", seg, quad).as("seg_x"))
      .orderBy(col("doc_id"))
  }

  /** ccw(a,b,p) > 0 for every CCW edge = strictly interior; >= 0 = in
    * closure. Segment PQ intersects the convex quad iff an endpoint is
    * in the closure or PQ properly crosses an edge (the segment
    * direction (7,3) is parallel to no edge, so collinear-overlap
    * cases cannot arise). */
  val geoPredicatesSql: String = {
    val vs = Seq((10.5, 0.5), (89.5, 10.5), (79.5, 90.5), (0.5, 69.5))
    def ccw(ax: String, ay: String, bx: String, by: String,
        cx: String, cy: String) =
      s"(($bx - $ax) * ($cy - $ay) - ($by - $ay) * ($cx - $ax))"
    val edges = vs.zip(vs.tail :+ vs.head)
    def inside(x: String, y: String, strict: Boolean) = edges.map { case (a, b) =>
      ccw(a._1.toString, a._2.toString, b._1.toString, b._2.toString, x, y) +
        (if (strict) " > 0" else " >= 0")
    }.mkString("(", " AND ", ")")
    val cross = edges.map { case (a, b) =>
      val (ax, ay, bx, by) = (a._1.toString, a._2.toString, b._1.toString, b._2.toString)
      s"(${ccw("px", "py", "rx", "ry", ax, ay)} * ${ccw("px", "py", "rx", "ry", bx, by)} < 0" +
        s" AND ${ccw(ax, ay, bx, by, "px", "py")} * ${ccw(ax, ay, bx, by, "rx", "ry")} < 0)"
    }.mkString("(", " OR ", ")")
    s"""SELECT doc_id,
               ${inside("px", "py", strict = true)} AS in_poly,
               ${inside("px", "py", strict = true)} AS within_p,
               (${inside("px", "py", strict = false)} OR
                ${inside("rx", "ry", strict = false)} OR $cross) AS seg_x
        FROM (SELECT doc_id,
                     CAST(doc_id * 37 % 100 AS DOUBLE) AS px,
                     CAST(doc_id * 61 % 100 AS DOUBLE) AS py,
                     CAST(doc_id * 37 % 100 + 7 AS DOUBLE) AS rx,
                     CAST(doc_id * 61 % 100 + 3 AS DOUBLE) AS ry
              FROM documents) p
        ORDER BY doc_id"""
  }

  /** WKT round-trip and accessors: the text writer, the parser, type
    * and envelope accessors — against string-built oracles. */
  def geoWkt(t: Tables): DataFrame = {
    val lineWkt = concat(lit("LINESTRING ("), px.cast("long"), lit(" "), py.cast("long"),
      lit(", "), qx.cast("long"), lit(" "), qy.cast("long"), lit(")"))
    val line = call_function("st_geometryfromtext", lineWkt)
    t.documents.select(
      col("doc_id"),
      call_function("st_astext", stPoint(px, py)).as("wkt"),
      call_function("st_geometrytype", line).as("gtype"),
      call_function("st_numpoints", line).cast("long").as("npts"),
      round(call_function("st_xmin", line), 6).as("exmin"),
      round(call_function("st_xmax", line), 6).as("exmax"),
      round(call_function("st_ymin", line), 6).as("eymin"),
      round(call_function("st_ymax", line), 6).as("eymax"))
      .orderBy(col("doc_id"))
  }

  val geoWktSql: String =
    """SELECT doc_id,
              'POINT (' || px || ' ' || py || ')' AS wkt,
              'ST_LineString' AS gtype,
              CAST(2 AS BIGINT) AS npts,
              round(CAST(least(px, qx) AS DOUBLE), 6) AS exmin,
              round(CAST(greatest(px, qx) AS DOUBLE), 6) AS exmax,
              round(CAST(least(py, qy) AS DOUBLE), 6) AS eymin,
              round(CAST(greatest(py, qy) AS DOUBLE), 6) AS eymax
       FROM (SELECT doc_id,
                    doc_id * 37 % 100 AS px, doc_id * 61 % 100 AS py,
                    doc_id * 17 % 100 AS qx, doc_id * 29 % 100 AS qy
             FROM documents) p
       ORDER BY doc_id"""

  /** Grid-bucketed distance self-join — the 100 TB spatial-join shape:
    * each point lands in ONE r-sized grid cell; the left side is
    * replicated to its 3×3 cell neighborhood (a constant ×9 map-side
    * expansion, no driver state) and equi-joins the right side's single
    * home cell, so every candidate pair is generated exactly once and
    * the exact distance filter runs on co-located partitions. All-pairs
    * never happens: candidates are bounded by points-per-cell density,
    * the same bucketing discipline as the MinHash/LSH dedup band join.
    * A radius-r pair can differ by at most one cell index per axis, so
    * the 3×3 neighborhood is exhaustive — no recall loss. */
  /** Core of the grid-bucketed distance self-join over an (id, x, y)
    * frame — shared by the oracle entry and the GeoScale lane. */
  def distanceJoinPoints(points: DataFrame, r: Double): DataFrame = {
    val pts = points.select(col("id"), col("x"), col("y"),
      floor(col("x") / r).as("cx"), floor(col("y") / r).as("cy"))
    val left = pts
      .withColumn("dx", explode(sequence(lit(-1), lit(1))))
      .withColumn("dy", explode(sequence(lit(-1), lit(1))))
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("jcx"), (col("cy") + col("dy")).as("jcy"))
    val right = pts.select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
      col("cx").as("jcx"), col("cy").as("jcy"))
    left.join(right, Seq("jcx", "jcy"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist",
        sqrt((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))))
      .filter(col("dist") < r)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  def geoDistanceJoin(t: Tables): DataFrame =
    distanceJoinPoints(
      t.documents.select(col("doc_id").as("id"), px.as("x"), py.as("y")), 5.0)
      .select(col("a_id"), col("b_id"), round(col("dist"), 6).as("dist"))
      .orderBy(col("a_id"), col("b_id"))

  val geoDistanceJoinSql: String =
    """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              round(sqrt((a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)), 6) AS dist
       FROM (SELECT doc_id, CAST(doc_id * 37 % 100 AS DOUBLE) AS px,
                    CAST(doc_id * 61 % 100 AS DOUBLE) AS py FROM documents) a,
            (SELECT doc_id, CAST(doc_id * 37 % 100 AS DOUBLE) AS px,
                    CAST(doc_id * 61 % 100 AS DOUBLE) AS py FROM documents) b
       WHERE a.doc_id < b.doc_id
         AND sqrt((a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)) < 5.0
       ORDER BY a_id, b_id"""

  /** Accessor/hull batch (round 15): component and vertex accessors,
    * closure/simplicity predicates, and the convex hull — the hull of
    * the doc-derived 5-point cloud {(0,0), (px,0), (0,py), (px,py),
    * (px/2, py/2)} is the px×py rectangle (the interior point must be
    * dropped), so its area has the closed form px·py that the oracle
    * recomputes; degenerate clouds (px or py = 0) collapse to
    * lines/points of area 0 on both sides. */
  def geoAccessors(t: Tables): DataFrame = {
    val lineWkt = concat(lit("LINESTRING ("), px.cast("long"), lit(" "), py.cast("long"),
      lit(", "), qx.cast("long"), lit(" "), qy.cast("long"),
      lit(", "), px.cast("long"), lit(" "), py.cast("long"), lit(")"))
    val line = call_function("st_geometryfromtext", lineWkt)
    val cloudWkt = concat(
      lit("MULTIPOINT ((0 0), ("), px.cast("long"), lit(" 0), (0 "), py.cast("long"),
      lit("), ("), px.cast("long"), lit(" "), py.cast("long"),
      lit("), ("), (px / 2), lit(" "), (py / 2), lit("))"))
    val cloud = call_function("st_geometryfromtext", cloudWkt)
    t.documents.select(
      col("doc_id"),
      call_function("st_dimension", line).cast("long").as("dim"),
      call_function("st_numgeometries", cloud).cast("long").as("ngeom"),
      call_function("st_isclosed", line).as("closed"),
      round(call_function("st_x",
        call_function("st_startpoint", line)), 6).as("sx"),
      round(call_function("st_y",
        call_function("st_pointn", line, lit(2))), 6).as("p2y"),
      round(call_function("st_area",
        call_function("st_convexhull", cloud)), 6).as("hull_area"))
      .orderBy(col("doc_id"))
  }

  /** The closing vertex equals the start, so `closed` is always true;
    * the interior point never survives the hull, so hull area = px·py. */
  val geoAccessorsSql: String =
    """SELECT doc_id,
              CAST(1 AS BIGINT) AS dim,
              CAST(5 AS BIGINT) AS ngeom,
              TRUE AS closed,
              round(CAST(px AS DOUBLE), 6) AS sx,
              round(CAST(qy AS DOUBLE), 6) AS p2y,
              round(CAST(px * py AS DOUBLE), 6) AS hull_area
       FROM (SELECT doc_id,
                    doc_id * 37 % 100 AS px, doc_id * 61 % 100 AS py,
                    doc_id * 17 % 100 AS qx, doc_id * 29 % 100 AS qy
             FROM documents) p
       ORDER BY doc_id"""

  /** Bing tiles (round 15): doc-derived lat/lon → zoom-8 tile indices,
    * quadkey, and the tile polygon's area — the oracle re-derives the
    * Web-Mercator forward map, the base-4 bit interleaving, and the
    * inverse-Mercator tile height in raw DuckDB SQL. Quarter-degree
    * offsets keep every point far from tile boundaries, so the two
    * engines' libm ulps cannot flip a floor. */
  def geoBingTiles(t: Tables): DataFrame = {
    val lat = py - lit(50.0) + lit(0.25)
    val lon = px * lit(3.5) - lit(175.0) + lit(0.25)
    val tile = call_function("bing_tile_at", lat, lon, lit(8))
    t.documents.select(
      col("doc_id"),
      call_function("bing_tile_coordinates", tile).getField("x").cast("long").as("tx"),
      call_function("bing_tile_coordinates", tile).getField("y").cast("long").as("ty"),
      call_function("bing_tile_quadkey", tile).as("qk"),
      size(call_function("bing_tiles_around", lat, lon, lit(8))).cast("long").as("n_around"),
      round(call_function("st_area", call_function("bing_tile_polygon", tile)), 6)
        .as("tile_area"))
      .orderBy(col("doc_id"))
  }

  val geoBingTilesSql: String = {
    // digit i of the zoom-8 quadkey: bit (8−i) of x plus twice that of y
    val qk = (1 to 8).map(i =>
      s"CAST(((tx >> ${8 - i}) & 1) + 2 * ((ty >> ${8 - i}) & 1) AS VARCHAR)")
      .mkString(" || ")
    """SELECT doc_id, tx, ty, """ + qk + """ AS qk,
              CAST(9 AS BIGINT) AS n_around,
              round((360.0 / 256) *
                ((90 - 360 * atan(exp(-(0.5 - ty / 256.0) * 2 * pi())) / pi()) -
                 (90 - 360 * atan(exp(-(0.5 - (ty + 1) / 256.0) * 2 * pi())) / pi())),
                6) AS tile_area
       FROM (SELECT doc_id,
                    CAST(floor((lon + 180) / 360 * 256) AS BIGINT) AS tx,
                    CAST(floor((0.5 - ln((1 + sin(radians(lat))) / (1 - sin(radians(lat))))
                      / (4 * pi())) * 256) AS BIGINT) AS ty
             FROM (SELECT doc_id,
                          doc_id * 61 % 100 - 50 + 0.25 AS lat,
                          (doc_id * 37 % 100) * 3.5 - 175 + 0.25 AS lon
                   FROM documents) ll) p
       ORDER BY doc_id"""
  }

  /** convex_hull_agg (round 15): per group, doc points lie ON a circle
    * (angle 7·doc_id mod 360°, radius 10), so every distinct point is a
    * hull vertex, the hull's vertex count is the distinct-angle count
    * (+1 ring closure), and the shoelace area equals the center-fan
    * identity ½·r²·Σ sin(Δθ) EXACTLY — the oracle computes that sum
    * with window functions, an independent derivation of the same
    * number.
    *
    * The closed form's precondition is ≥3 distinct angles per group
    * (1–2 points hull to a POINT/LINESTRING where numpoints ≠ count+1
    * and the fan area is 0), so BOTH sides filter groups below that —
    * enforcing the precondition instead of assuming the corpus is big
    * enough to satisfy it. */
  def geoHullAgg(t: Tables): DataFrame = {
    val theta = radians((col("doc_id") * 7 % 360).cast("double"))
    val p = call_function("st_point",
      lit(50.0) + lit(10.0) * cos(theta), lit(50.0) + lit(10.0) * sin(theta))
    t.documents
      .withColumn("g", (col("doc_id") % 10).cast("long"))
      .withColumn("pt", p)
      .groupBy(col("g"))
      .agg(
        round(call_function("st_area", call_function("convex_hull_agg", col("pt"))), 6)
          .as("hull_area"),
        call_function("st_numpoints", call_function("convex_hull_agg", col("pt")))
          .cast("long").as("hull_pts"),
        countDistinct(col("doc_id") * 7 % 360).as("n_ang"))
      .filter(col("n_ang") >= 3).drop("n_ang")
      .orderBy(col("g"))
  }

  val geoHullAggSql: String =
    """WITH pts AS (
         SELECT DISTINCT doc_id % 10 AS g, doc_id * 7 % 360 AS deg FROM documents),
       d AS (
         SELECT g, radians(CAST(deg AS DOUBLE)) AS th,
                lead(radians(CAST(deg AS DOUBLE)))
                  OVER (PARTITION BY g ORDER BY deg) AS nxt,
                first_value(radians(CAST(deg AS DOUBLE)))
                  OVER (PARTITION BY g ORDER BY deg) AS fst
         FROM pts)
       SELECT g,
              round(0.5 * 100 * sum(sin(coalesce(nxt, fst + 2 * pi()) - th)), 6) AS hull_area,
              CAST(count(*) + 1 AS BIGINT) AS hull_pts
       FROM d GROUP BY g HAVING count(*) >= 3 ORDER BY g"""

  /** Linear referencing (round 15): locate a point's fraction along a
    * doc-derived 2-point line and interpolate a point at a doc-derived
    * fraction — for a single segment both have clamp/lerp closed forms
    * the oracle re-derives in raw SQL (the kernels walk arbitrary
    * multi-segment lines; the spec pins those). */
  def geoLinearRef(t: Tables): DataFrame = {
    val lineWkt = concat(lit("LINESTRING ("), px.cast("long"), lit(" "), py.cast("long"),
      lit(", "), qx.cast("long"), lit(" "), qy.cast("long"), lit(")"))
    val line = call_function("st_geometryfromtext", lineWkt)
    val frac = (col("doc_id") % 11).cast("double") / 10.0
    val interp = call_function("line_interpolate_point", line, frac)
    t.documents.select(
      col("doc_id"),
      round(call_function("line_locate_point", line, stPoint(qy, px)), 6).as("loc"),
      round(call_function("st_x", interp), 6).as("ix"),
      round(call_function("st_y", interp), 6).as("iy"))
      .orderBy(col("doc_id"))
  }

  val geoLinearRefSql: String =
    """SELECT doc_id,
              round(CASE WHEN len2 = 0 THEN 0.0
                    ELSE greatest(0.0, least(1.0,
                      ((qy - px) * (qx - px) + (px - py) * (qy - py)) / len2)) END, 6) AS loc,
              round(px + fr * (qx - px), 6) AS ix,
              round(py + fr * (qy - py), 6) AS iy
       FROM (SELECT doc_id, px, py, qx, qy,
                    (qx - px) * (qx - px) + (qy - py) * (qy - py) AS len2,
                    CAST(doc_id % 11 AS DOUBLE) / 10.0 AS fr
             FROM (SELECT doc_id,
                          CAST(doc_id * 37 % 100 AS DOUBLE) AS px,
                          CAST(doc_id * 61 % 100 AS DOUBLE) AS py,
                          CAST(doc_id * 17 % 100 AS DOUBLE) AS qx,
                          CAST(doc_id * 29 % 100 AS DOUBLE) AS qy
                   FROM documents) q0) p
       ORDER BY doc_id"""

  /** simplify_geometry + geometry_to_bing_tiles (round 15): a spike
    * line keeps or drops its apex depending on whether the doc-derived
    * amplitude exceeds the Douglas–Peucker tolerance (both engines
    * compare the SAME ieee double (doc_id%5)*0.3 against 0.6, so the
    * inexact-0.3 boundary case agrees by construction), and a
    * quarter-offset lon/lat rectangle's zoom-6 tile cover count is the
    * corner-tile index product (every tile in a rectangle's index
    * range intersects it). */
  def geoSimplifyTiles(t: Tables): DataFrame = {
    val h = (col("doc_id") % 5).cast("double") * 0.3
    val spikeWkt = concat(lit("LINESTRING (0 0, 2 "), h, lit(", 4 0)"))
    val simp = call_function("simplify_geometry",
      call_function("st_geometryfromtext", spikeWkt), lit(0.6))
    val lon0 = px * 2.8 - 140.0 + 0.25
    val lat0 = py * 0.8 - 40.0 + 0.25
    val rectWkt = concat(
      lit("POLYGON (("), lon0, lit(" "), lat0,
      lit(", "), lon0 + 7.0, lit(" "), lat0,
      lit(", "), lon0 + 7.0, lit(" "), lat0 + 4.0,
      lit(", "), lon0, lit(" "), lat0 + 4.0,
      lit(", "), lon0, lit(" "), lat0, lit("))"))
    val rect = call_function("st_geometryfromtext", rectWkt)
    t.documents.select(
      col("doc_id"),
      call_function("st_numpoints", simp).cast("long").as("npts"),
      round(call_function("st_length", simp), 6).as("slen"),
      size(call_function("geometry_to_bing_tiles", rect, lit(6))).cast("long").as("ntiles"))
      .orderBy(col("doc_id"))
  }

  val geoSimplifyTilesSql: String =
    """SELECT doc_id,
              CAST(CASE WHEN h > 0.6 THEN 3 ELSE 2 END AS BIGINT) AS npts,
              round(CASE WHEN h > 0.6 THEN 2 * sqrt(4 + h * h) ELSE 4.0 END, 6) AS slen,
              (CAST(floor((lon0 + 7 + 180) / 360 * 64) AS BIGINT)
                 - CAST(floor((lon0 + 180) / 360 * 64) AS BIGINT) + 1) *
              (CAST(floor((0.5 - ln((1 + sin(radians(lat0))) / (1 - sin(radians(lat0))))
                    / (4 * pi())) * 64) AS BIGINT)
                 - CAST(floor((0.5 - ln((1 + sin(radians(lat0 + 4))) / (1 - sin(radians(lat0 + 4))))
                    / (4 * pi())) * 64) AS BIGINT) + 1) AS ntiles
       FROM (SELECT doc_id,
                    CAST(doc_id % 5 AS DOUBLE) * 0.3 AS h,
                    CAST(doc_id * 37 % 100 AS DOUBLE) * 2.8 - 140 + 0.25 AS lon0,
                    CAST(doc_id * 61 % 100 AS DOUBLE) * 0.8 - 40 + 0.25 AS lat0
             FROM documents) p
       ORDER BY doc_id"""

  /** DE-9IM predicates (round 16): two unit-ish squares offset by
    * dx = doc_id % 5, which walks the full topological spectrum —
    * dx 0 equal, dx 1 overlapping, dx 2 edge-touching, dx 3–4 disjoint
    * — plus a fixed chord whose crossing flips exactly at dx = 3 (its
    * endpoint (3, 1) lands ON the square's edge: II empty, not a
    * cross). The oracle is pure CASE arithmetic on dx — an independent
    * derivation of every predicate from the construction, no geometry
    * in DuckDB at all. */
  def geoRelate(t: Tables): DataFrame = {
    val dx = (col("doc_id") % 5).cast("long")
    val sqA = call_function("st_geometryfromtext",
      lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    val sqB = call_function("st_geometryfromtext",
      concat(lit("POLYGON (("), dx, lit(" 0, "), dx + 2, lit(" 0, "), dx + 2,
        lit(" 2, "), dx, lit(" 2, "), dx, lit(" 0))")))
    val chord = call_function("st_geometryfromtext", lit("LINESTRING (-1 1, 3 1)"))
    t.documents.select(
      col("doc_id"),
      call_function("st_equals", sqA, sqB).as("eq"),
      call_function("st_overlaps", sqA, sqB).as("ovl"),
      call_function("st_touches", sqA, sqB).as("tch"),
      call_function("st_crosses", chord, sqB).as("crs"),
      call_function("st_relate", sqA, sqB, lit("FF*FF****")).as("dsj"))
      .orderBy(col("doc_id"))
  }

  val geoRelateSql: String =
    """SELECT doc_id,
              dx = 0 AS eq,
              dx = 1 AS ovl,
              dx = 2 AS tch,
              dx <= 2 AS crs,
              dx >= 3 AS dsj
       FROM (SELECT doc_id, doc_id % 5 AS dx FROM documents) p
       ORDER BY doc_id"""

  /** Constructive overlay (round 17): doc-derived INTEGER axis-aligned
    * rectangles walk the full relation spectrum (overlap / nest / edge
    * touch / corner touch / disjoint) while every overlay result has
    * an exact 1-D interval closed form — intersection/union/
    * difference/symdifference areas, the intersection's centroid, and
    * its geometry TYPE (the dimensional-collapse surface: area overlap
    * → polygon, edge touch → linestring, corner touch → point,
    * disjoint → empty polygon). The Spark side runs the real noding +
    * stitching kernel ([[graft.functions.GeoOverlay]]); the oracle is
    * pure interval arithmetic. */
  def geoOverlay(t: Tables): DataFrame = {
    val x1 = (col("doc_id") * 13 % 20).cast("long")
    val y1 = (col("doc_id") * 7 % 20).cast("long")
    val x2 = x1 + 2 + (col("doc_id") % 9).cast("long")
    val y2 = y1 + 2 + (col("doc_id") % 7).cast("long")
    val u1 = (col("doc_id") * 23 % 20).cast("long")
    val v1 = (col("doc_id") * 31 % 20).cast("long")
    val u2 = u1 + 2 + (col("doc_id") % 11).cast("long")
    val v2 = v1 + 2 + (col("doc_id") % 5).cast("long")
    def rect(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             c: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      call_function("st_geometryfromtext",
        concat(lit("POLYGON (("), a, lit(" "), b, lit(", "), c, lit(" "), b,
          lit(", "), c, lit(" "), d, lit(", "), a, lit(" "), d,
          lit(", "), a, lit(" "), b, lit("))")))
    val ra = rect(x1, y1, x2, y2)
    val rb = rect(u1, v1, u2, v2)
    val inter = call_function("st_intersection", ra, rb)
    val interArea = call_function("st_area", inter)
    docIds(t).select(
      col("doc_id"),
      round(interArea, 6).as("ia"),
      round(call_function("st_area", call_function("st_union", ra, rb)), 6).as("ua"),
      round(call_function("st_area", call_function("st_difference", ra, rb)), 6).as("da"),
      round(call_function("st_area", call_function("st_symdifference", ra, rb)), 6).as("sa"),
      when(interArea > 0,
        round(call_function("st_x", call_function("st_centroid", inter)), 6)).as("icx"),
      when(interArea > 0,
        round(call_function("st_y", call_function("st_centroid", inter)), 6)).as("icy"),
      call_function("st_geometrytype", inter).as("ity"))
      .orderBy(col("doc_id"))
  }

  val geoOverlaySql: String =
    """SELECT doc_id,
              round(CAST(ix * iy AS DOUBLE), 6) AS ia,
              round(aa + ab - ix * iy, 6) AS ua,
              round(aa - ix * iy, 6) AS da,
              round(aa + ab - 2 * ix * iy, 6) AS sa,
              CASE WHEN ix * iy > 0
                   THEN round((greatest(x1, u1) + least(x2, u2)) / 2.0, 6) END AS icx,
              CASE WHEN ix * iy > 0
                   THEN round((greatest(y1, v1) + least(y2, v2)) / 2.0, 6) END AS icy,
              CASE WHEN ix > 0 AND iy > 0 THEN 'ST_Polygon'
                   WHEN wx < 0 OR wy < 0 THEN 'ST_Polygon'
                   WHEN wx = 0 AND wy = 0 THEN 'ST_Point'
                   ELSE 'ST_LineString' END AS ity
       FROM (SELECT doc_id, x1, y1, x2, y2, u1, v1, u2, v2,
                    greatest(0, least(x2, u2) - greatest(x1, u1)) AS ix,
                    greatest(0, least(y2, v2) - greatest(y1, v1)) AS iy,
                    least(x2, u2) - greatest(x1, u1) AS wx,
                    least(y2, v2) - greatest(y1, v1) AS wy,
                    CAST((x2 - x1) * (y2 - y1) AS DOUBLE) AS aa,
                    CAST((u2 - u1) * (v2 - v1) AS DOUBLE) AS ab
             FROM (SELECT doc_id,
                          doc_id * 13 % 20 AS x1, doc_id * 7 % 20 AS y1,
                          doc_id * 13 % 20 + 2 + doc_id % 9 AS x2,
                          doc_id * 7 % 20 + 2 + doc_id % 7 AS y2,
                          doc_id * 23 % 20 AS u1, doc_id * 31 % 20 AS v1,
                          doc_id * 23 % 20 + 2 + doc_id % 11 AS u2,
                          doc_id * 31 % 20 + 2 + doc_id % 5 AS v2
                   FROM documents) b) p
       ORDER BY doc_id"""

  /** st_buffer closed forms: a point buffers to the regular 32-gon
    * (16·r²·sin(π/16)), a horizontal segment to the exact capsule
    * (2rL + the same 32-gon), and a NEGATIVE buffer of a rectangle is
    * the exact inset rectangle (the tessellated caps only matter
    * outside the rectangle, so erosion is exact). Dilation of the
    * rectangle is pinned between its two closed-form bounds (bands
    * only vs bands + full corner disks). */
  def geoBuffer(t: Tables): DataFrame = {
    val r = (lit(1) + col("doc_id") % 3).cast("double")
    val l = (lit(5) + col("doc_id") % 7).cast("double")
    val w = (lit(10) + col("doc_id") % 6).cast("double")
    val h = (lit(8) + col("doc_id") % 5).cast("double")
    val px = (col("doc_id") * 37 % 100).cast("double")
    val py = (col("doc_id") * 61 % 100).cast("double")
    val seg = call_function("st_geometryfromtext",
      concat(lit("LINESTRING (0 0, "), l.cast("long"), lit(" 0)")))
    val rect = call_function("st_geometryfromtext",
      concat(lit("POLYGON ((0 0, "), w.cast("long"), lit(" 0, "), w.cast("long"),
        lit(" "), h.cast("long"), lit(", 0 "), h.cast("long"), lit(", 0 0))")))
    docIds(t).select(
      col("doc_id"),
      round(call_function("st_area",
        call_function("st_buffer", call_function("st_point", px, py), r)), 4)
        .as("pt_area"),
      round(call_function("st_area", call_function("st_buffer", seg, r)), 4)
        .as("seg_area"),
      round(call_function("st_area", call_function("st_buffer", rect, -r)), 4)
        .as("erode_area"),
      // the dilation bracket is the one column whose five-way capsule
      // union dominates the entry's bench cost — sample it on 1/11 of
      // the rows. The modulus must be COPRIME to every parameter
      // modulus (3, 5, 6, 7): sampling on %5 aliased with h = 8 +
      // doc_id % 5, silently testing only height-8 rectangles. The
      // |dil − mid| < half form references the expensive dil subtree
      // ONCE (a > lo && < hi conjunction evaluates it twice — Spark's
      // subexpression elimination skips conditional branches).
      when(col("doc_id") % 11 === 0,
        abs(call_function("st_area", call_function("st_buffer", rect, r)) -
          (w * h + lit(2) * r * (w + h) + lit(math.Pi / 2) * r * r)) <
          lit(math.Pi / 2) * r * r)
        .otherwise(lit(true)).as("dil_bounded"))
      .orderBy(col("doc_id"))
  }

  val geoBufferSql: String =
    """SELECT doc_id,
              round(16 * r * r * sin(pi() / 16), 4) AS pt_area,
              round(2 * r * l + 16 * r * r * sin(pi() / 16), 4) AS seg_area,
              round((w - 2 * r) * (h - 2 * r), 4) AS erode_area,
              TRUE AS dil_bounded
       FROM (SELECT doc_id,
                    CAST(1 + doc_id % 3 AS DOUBLE) AS r,
                    CAST(5 + doc_id % 7 AS DOUBLE) AS l,
                    CAST(10 + doc_id % 6 AS DOUBLE) AS w,
                    CAST(8 + doc_id % 5 AS DOUBLE) AS h
             FROM documents) p
       ORDER BY doc_id"""

  /** geometry_union_agg: per group, a chain of OVERLAPPING tiles
    * [2i, 2i+3]×[0,2] whose union is the single slab [0, 2·max(i)+3]
    * ×[0,2], plus a family of pairwise-DISJOINT tiles whose union
    * area is exactly 4 per member — one aggregate exercises both the
    * merge-away and the multi-shell state paths, each with an integer
    * closed form. */
  def geoUnionAgg(t: Tables): DataFrame = {
    val g = (col("doc_id") % 25).cast("long")
    val i = floor(col("doc_id") / 25).cast("long")
    def wkt(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
            c: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
      call_function("st_geometryfromtext",
        concat(lit("POLYGON (("), a, lit(" "), b, lit(", "), c, lit(" "), b,
          lit(", "), c, lit(" "), d, lit(", "), a, lit(" "), d,
          lit(", "), a, lit(" "), b, lit("))")))
    val chain = wkt(i * 2, lit(0), i * 2 + 3, lit(2))
    val sparse = wkt(i * 5, lit(10), i * 5 + 2, lit(12))
    docIds(t)
      .withColumn("g", g).withColumn("chain", chain).withColumn("sparse", sparse)
      .groupBy(col("g"))
      .agg(
        round(call_function("st_area",
          call_function("geometry_union_agg", col("chain"))), 6).as("chain_area"),
        round(call_function("st_area",
          call_function("geometry_union_agg", col("sparse"))), 6).as("sparse_area"))
      .orderBy(col("g"))
  }

  val geoUnionAggSql: String =
    """SELECT doc_id % 25 AS g,
              round(CAST(2 * (2 * max(floor(doc_id / 25)) + 3) AS DOUBLE), 6) AS chain_area,
              round(CAST(4 * count(DISTINCT floor(doc_id / 25)) AS DOUBLE), 6) AS sparse_area
       FROM documents
       GROUP BY 1
       ORDER BY g"""

  /** GEOMETRYCOLLECTION (round 17): a doc-derived heterogeneous
    * collection (rectangle + horizontal segment + far point) through
    * the accessors, measures, and overlay distribution — every column
    * has an integer/interval closed form. */
  def geoCollection(t: Tables): DataFrame = {
    val x1 = (col("doc_id") * 13 % 20).cast("long")
    val y1 = (col("doc_id") * 7 % 20).cast("long")
    val x2 = x1 + 2 + (col("doc_id") % 9).cast("long")
    val y2 = y1 + 2 + (col("doc_id") % 7).cast("long")
    val u1 = (col("doc_id") * 23 % 20).cast("long")
    val v1 = (col("doc_id") * 31 % 20).cast("long")
    val u2 = u1 + 2 + (col("doc_id") % 11).cast("long")
    val v2 = v1 + 2 + (col("doc_id") % 5).cast("long")
    val coll = call_function("st_geometryfromtext", concat(
      lit("GEOMETRYCOLLECTION (POLYGON (("),
      x1, lit(" "), y1, lit(", "), x2, lit(" "), y1, lit(", "),
      x2, lit(" "), y2, lit(", "), x1, lit(" "), y2, lit(", "),
      x1, lit(" "), y1,
      lit(")), LINESTRING (0 50, 10 50), POINT (70 70))")))
    val clip = call_function("st_geometryfromtext", concat(
      lit("POLYGON (("), u1, lit(" "), v1, lit(", "), u2, lit(" "), v1,
      lit(", "), u2, lit(" "), v2, lit(", "), u1, lit(" "), v2,
      lit(", "), u1, lit(" "), v1, lit("))")))
    docIds(t).select(
      col("doc_id"),
      call_function("st_numgeometries", coll).cast("long").as("n"),
      call_function("st_dimension", coll).cast("long").as("dim"),
      round(call_function("st_area", coll), 6).as("a"),
      call_function("st_geometrytype", call_function("st_geometryn", coll, lit(2)))
        .as("t2"),
      round(call_function("st_area",
        call_function("st_intersection", coll, clip)), 6).as("ia"),
      round(call_function("st_area",
        call_function("st_union", coll, clip)), 6).as("ua"))
      .orderBy(col("doc_id"))
  }

  val geoCollectionSql: String =
    """SELECT doc_id,
              CAST(3 AS BIGINT) AS n,
              CAST(2 AS BIGINT) AS dim,
              round(CAST((x2 - x1) * (y2 - y1) AS DOUBLE), 6) AS a,
              'ST_LineString' AS t2,
              round(CAST(greatest(0, least(x2, u2) - greatest(x1, u1)) *
                         greatest(0, least(y2, v2) - greatest(y1, v1)) AS DOUBLE), 6)
                AS ia,
              round(CAST((x2 - x1) * (y2 - y1) + (u2 - u1) * (v2 - v1) -
                         greatest(0, least(x2, u2) - greatest(x1, u1)) *
                         greatest(0, least(y2, v2) - greatest(y1, v1)) AS DOUBLE), 6)
                AS ua
       FROM (SELECT doc_id,
                    doc_id * 13 % 20 AS x1, doc_id * 7 % 20 AS y1,
                    doc_id * 13 % 20 + 2 + doc_id % 9 AS x2,
                    doc_id * 7 % 20 + 2 + doc_id % 7 AS y2,
                    doc_id * 23 % 20 AS u1, doc_id * 31 % 20 AS v1,
                    doc_id * 23 % 20 + 2 + doc_id % 11 AS u2,
                    doc_id * 31 % 20 + 2 + doc_id % 5 AS v2
             FROM documents) p
       ORDER BY doc_id"""

  /** Round-17 accessor/constructive tail — st_boundary,
    * st_interiorrings, st_envelopeaspts, expand_envelope,
    * flatten_geometry_collections, geometry_union (scalar array fold),
    * geometry_nearest_points — on doc-derived integer rectangles whose
    * answers all have integer closed forms: the boundary of an a×b
    * rectangle has length 2(a+b); the holed square's one interior ring
    * has perimeter 4c; the envelope's upper-right corner is (a, b); the
    * 3-expanded envelope has area (a+6)(b+6); the flattened nested
    * collection has 3 leaves; the union with the edge-adjacent 2×2
    * square adds exactly 4; and the nearest points between the
    * rectangle and the external point (a+5, b+7) are the corner (a, b)
    * and the point itself. */
  def geoFnsTail(t: Tables): DataFrame = {
    val a = (col("doc_id") * 37 % 100 + 1).cast("long")
    val b = (col("doc_id") * 61 % 100 + 1).cast("long")
    val c = (col("doc_id") % 3 + 1).cast("long")
    val rect = call_function("st_geometryfromtext",
      concat(lit("POLYGON ((0 0, "), a, lit(" 0, "), a, lit(" "), b,
        lit(", 0 "), b, lit(", 0 0))")))
    val holed = call_function("st_geometryfromtext",
      concat(lit("POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (1 1, "),
        c + 1, lit(" 1, "), c + 1, lit(" "), c + 1, lit(", 1 "), c + 1,
        lit(", 1 1))")))
    val adj = call_function("st_geometryfromtext",
      concat(lit("POLYGON (("), a, lit(" 0, "), a + 2, lit(" 0, "), a + 2,
        lit(" 2, "), a, lit(" 2, "), a, lit(" 0))")))
    val nested = call_function("st_geometryfromtext",
      lit("GEOMETRYCOLLECTION (POINT (1 1), GEOMETRYCOLLECTION (" +
        "LINESTRING (0 0, 1 1), POINT (2 2)))"))
    val far = call_function("st_point", (a + 5).cast("double"), (b + 7).cast("double"))
    val near = call_function("geometry_nearest_points", rect, far)
    t.documents.select(
      col("doc_id"),
      round(call_function("st_length", call_function("st_boundary", rect)), 6)
        .as("boundary_len"),
      call_function("st_geometrytype", call_function("st_boundary", holed))
        .as("bnd_type"),
      size(call_function("st_interiorrings", holed)).cast("long").as("n_rings"),
      round(call_function("st_length",
        element_at(call_function("st_interiorrings", holed), 1)), 6).as("ring_len"),
      round(call_function("st_x",
        element_at(call_function("st_envelopeaspts", rect), 2)), 6).as("env_x"),
      round(call_function("st_area",
        call_function("expand_envelope", rect, lit(3.0))), 6).as("expand_area"),
      size(call_function("flatten_geometry_collections", nested)).cast("long")
        .as("flat_n"),
      round(call_function("st_area",
        call_function("geometry_union", array(rect, adj))), 6).as("union_area"),
      round(call_function("st_x", element_at(near, 1)), 6).as("near_x1"),
      round(call_function("st_y", element_at(near, 2)), 6).as("near_y2"))
      .orderBy(col("doc_id"))
  }

  val geoFnsTailSql: String =
    """SELECT doc_id,
              round(CAST(2 * (a + b) AS DOUBLE), 6) AS boundary_len,
              'ST_MultiLineString' AS bnd_type,
              CAST(1 AS BIGINT) AS n_rings,
              round(CAST(4 * c AS DOUBLE), 6) AS ring_len,
              round(CAST(a AS DOUBLE), 6) AS env_x,
              round(CAST((a + 6) * (b + 6) AS DOUBLE), 6) AS expand_area,
              CAST(3 AS BIGINT) AS flat_n,
              round(CAST(a * b + 4 AS DOUBLE), 6) AS union_area,
              round(CAST(a AS DOUBLE), 6) AS near_x1,
              round(CAST(b + 7 AS DOUBLE), 6) AS near_y2
       FROM (SELECT doc_id,
                    doc_id * 37 % 100 + 1 AS a,
                    doc_id * 61 % 100 + 1 AS b,
                    doc_id % 3 + 1 AS c
             FROM documents) p
       ORDER BY doc_id"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("geo_fns_tail", geoFnsTail _, geoFnsTailSql),
    ("geo_overlay", geoOverlay _, geoOverlaySql),
    ("geo_collection", geoCollection _, geoCollectionSql),
    ("geo_buffer", geoBuffer _, geoBufferSql),
    ("geo_union_agg", geoUnionAgg _, geoUnionAggSql),
    ("geo_relate", geoRelate _, geoRelateSql),
    ("geo_simplify_tiles", geoSimplifyTiles _, geoSimplifyTilesSql),
    ("geo_linear_ref", geoLinearRef _, geoLinearRefSql),
    ("geo_hull_agg", geoHullAgg _, geoHullAggSql),
    ("geo_bing_tiles", geoBingTiles _, geoBingTilesSql),
    ("geo_accessors", geoAccessors _, geoAccessorsSql),
    ("geo_measures", geoMeasures _, geoMeasuresSql),
    ("geo_predicates", geoPredicates _, geoPredicatesSql),
    ("geo_wkt", geoWkt _, geoWktSql),
    ("geo_distance_join", geoDistanceJoin _, geoDistanceJoinSql))
}
