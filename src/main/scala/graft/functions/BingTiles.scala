package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's Bing-tile family — the Web-Mercator quadtree addressing
  * scheme (published Bing Maps Tile System math; Presto registers these
  * alongside the `ST_*` surface the reference pulls in via the Velox
  * library, `axiom/optimizer/tests/AxiomSql.cpp:149`).
  *
  * Tiles are STRUCT<x INT, y INT, zoom INT> — SQL-transparent, joins
  * and groupBys work on them directly, which is the point: at 100 TB a
  * tile IS the spatial bucketing key (a fixed-zoom `bing_tile_at` per
  * row + groupBy tile is the planetary analogue of the grid cells the
  * distance join buckets with).
  *
  * Semantics follow the published Presto behavior: zoom ∈ [0, 23];
  * `bing_tile_at`/`bing_tiles_around` THROW for latitude outside
  * ±85.05112878 (Web-Mercator validity) or longitude outside ±180 —
  * only `geometry_to_bing_tiles` clips an envelope to the valid range,
  * which is also the published behavior. Tile indices land in
  * [0, 2^zoom − 1]; quadkeys are the base-4 interleaving of (y, x)
  * bits, one digit per zoom level. */
object BingTiles {

  val MaxZoom = 23
  val MinLat = -85.05112878
  val MaxLat = 85.05112878

  private def clamp(v: Double, lo: Double, hi: Double) = math.max(lo, math.min(hi, v))

  def checkZoom(z: Int): Int = {
    if (z < 0 || z > MaxZoom) throw new IllegalArgumentException(
      s"bing tile zoom must be in [0, $MaxZoom], got $z")
    z
  }

  /** (x, y) tile indices for a lat/lon at a zoom. Presto's
    * `bing_tile_at` rejects coordinates outside the Web-Mercator
    * validity range rather than clamping them, so out-of-range input
    * is an error here too — silent clamping would alias every
    * high-latitude point onto the edge tile. */
  def tileAt(lat: Double, lon: Double, zoom: Int): (Int, Int) = {
    if (lat.isNaN || lat < MinLat || lat > MaxLat) throw new IllegalArgumentException(
      s"bing tile latitude must be within [$MinLat, $MaxLat], got $lat")
    if (lon.isNaN || lon < -180.0 || lon > 180.0) throw new IllegalArgumentException(
      s"bing tile longitude must be within [-180.0, 180.0], got $lon")
    tileAtClamped(lat, lon, zoom)
  }

  /** Clamping variant for envelope cover: `geometry_to_bing_tiles`
    * clips geometries to the Mercator-valid range (an envelope may
    * legitimately extend past ±85.05°), so ITS corner lookups clamp. */
  private[functions] def tileAtClamped(lat: Double, lon: Double, zoom: Int): (Int, Int) = {
    checkZoom(zoom)
    val la = clamp(lat, MinLat, MaxLat)
    val lo = clamp(lon, -180.0, 180.0)
    val mapSize = 1L << zoom
    val xf = (lo + 180.0) / 360.0
    val sin = math.sin(math.toRadians(la))
    val yf = 0.5 - math.log((1 + sin) / (1 - sin)) / (4 * math.Pi)
    val x = math.min(mapSize - 1, math.max(0L, math.floor(xf * mapSize).toLong)).toInt
    val y = math.min(mapSize - 1, math.max(0L, math.floor(yf * mapSize).toLong)).toInt
    (x, y)
  }

  def checkTile(x: Int, y: Int, zoom: Int): Unit = {
    checkZoom(zoom)
    val n = 1L << zoom
    if (x < 0 || y < 0 || x >= n || y >= n) throw new IllegalArgumentException(
      s"bing tile coordinates ($x, $y) out of range for zoom $zoom")
  }

  def quadkey(x: Int, y: Int, zoom: Int): String = {
    val sb = new StringBuilder
    var i = zoom
    while (i > 0) {
      val mask = 1 << (i - 1)
      var d = 0
      if ((x & mask) != 0) d += 1
      if ((y & mask) != 0) d += 2
      sb.append(('0' + d).toChar)
      i -= 1
    }
    sb.toString
  }

  def fromQuadkey(qk: String): (Int, Int, Int) = {
    val zoom = qk.length
    checkZoom(zoom)
    var x = 0; var y = 0
    var i = 0
    while (i < zoom) {
      val mask = 1 << (zoom - 1 - i)
      qk.charAt(i) match {
        case '0' => ()
        case '1' => x |= mask
        case '2' => y |= mask
        case '3' => x |= mask; y |= mask
        case c => throw new IllegalArgumentException(
          s"invalid quadkey digit '$c' in '$qk' (digits 0-3)")
      }
      i += 1
    }
    (x, y, zoom)
  }

  /** Tile corner in (lon, lat) — the inverse Web-Mercator map. */
  def tileCorner(x: Int, y: Int, zoom: Int): (Double, Double) = {
    val mapSize = (1L << zoom).toDouble
    val lon = x / mapSize * 360.0 - 180.0
    val yf = 0.5 - y / mapSize
    val lat = 90.0 - 360.0 * math.atan(math.exp(-yf * 2 * math.Pi)) / math.Pi
    (lon, lat)
  }

  /** The tile's bounding box as a (lon, lat) polygon geometry. */
  def tilePolygon(x: Int, y: Int, zoom: Int): GeoFns.Geom = {
    val (w, n) = tileCorner(x, y, zoom)
    val (e, s) = tileCorner(x + 1, y + 1, zoom)
    GeoFns.GPolygon(Array(Array(w, s, e, s, e, n, w, n, w, s)))
  }

  val tileType: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("zoom", IntegerType, nullable = false)))

  private def tileRow(x: Int, y: Int, zoom: Int): InternalRow =
    InternalRow(x, y, zoom)

  // ---------------------------------------------------------- expressions

  /** bing_tile(x, y, zoom) | bing_tile(quadkey). */
  case class BingTile(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = tileType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "bing_tile"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      if (children.length == 1) {
        val (x, y, z) = fromQuadkey(vs(0).toString)
        tileRow(x, y, z)
      } else {
        val x = vs(0).asInstanceOf[Int]; val y = vs(1).asInstanceOf[Int]
        val z = vs(2).asInstanceOf[Int]
        checkTile(x, y, z)
        tileRow(x, y, z)
      }
    }
  }

  case class BingTileAt(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = tileType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "bing_tile_at"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      val (x, y) = tileAt(vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
        vs(2).asInstanceOf[Int])
      tileRow(x, y, vs(2).asInstanceOf[Int])
    }
  }

  abstract class TileUnaryBase extends UnaryExpression with CodegenFallback {
    protected def evalTile(x: Int, y: Int, zoom: Int): Any
    override protected def nullSafeEval(v: Any): Any = {
      val r = v.asInstanceOf[InternalRow]
      evalTile(r.getInt(0), r.getInt(1), r.getInt(2))
    }
  }

  case class BingTileQuadkey(child: Expression) extends TileUnaryBase {
    override def dataType: DataType = StringType
    override def prettyName: String = "bing_tile_quadkey"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def evalTile(x: Int, y: Int, zoom: Int): Any =
      UTF8String.fromString(quadkey(x, y, zoom))
  }

  case class BingTileZoom(child: Expression) extends TileUnaryBase {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bing_tile_zoom_level"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def evalTile(x: Int, y: Int, zoom: Int): Any = zoom
  }

  case class BingTileCoordinates(child: Expression) extends TileUnaryBase {
    override def dataType: DataType = StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false)))
    override def prettyName: String = "bing_tile_coordinates"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def evalTile(x: Int, y: Int, zoom: Int): Any = InternalRow(x, y)
  }

  case class BingTilePolygon(child: Expression) extends TileUnaryBase {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "bing_tile_polygon"
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    protected def evalTile(x: Int, y: Int, zoom: Int): Any =
      GeoFns.toWkb(tilePolygon(x, y, zoom))
  }

  /** bing_tiles_around(lat, lon, zoom): the tile and its neighbors,
    * clipped at the map edge — the spatial-join neighborhood primitive
    * (the planetary analogue of the grid join's 3×3 cells). */
  case class BingTilesAround(children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def dataType: DataType = ArrayType(tileType, containsNull = false)
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "bing_tiles_around"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      val zoom = vs(2).asInstanceOf[Int]
      val (cx, cy) = tileAt(vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double], zoom)
      val n = 1L << zoom
      val out = for {
        dy <- -1 to 1
        dx <- -1 to 1
        x = cx + dx
        y = cy + dy
        if x >= 0 && y >= 0 && x < n && y < n
      } yield tileRow(x, y, zoom)
      new GenericArrayData(out.toArray[Any])
    }
  }

  /** Tiles at `zoom` whose box intersects the geometry (coordinates
    * read as lon/lat). The candidate set is the envelope's tile range —
    * work is proportional to the cover, never the map — and each
    * candidate is kept by an exact box-vs-geometry intersects test. */
  def cover(g: GeoFns.Geom, zoom: Int): Seq[(Int, Int)] = {
    checkZoom(zoom)
    GeoFns.envelopeBounds(g) match {
      case None => Seq.empty
      case Some((w, s, e, n)) =>
        val (x1, yN) = tileAtClamped(n, w, zoom)
        val (x2, yS) = tileAtClamped(s, e, zoom)
        val count = (x2 - x1 + 1).toLong * (yS - yN + 1).toLong
        if (count > 100000) throw new IllegalArgumentException(
          s"geometry_to_bing_tiles would produce $count tiles at zoom $zoom " +
          "(limit 100000) - use a coarser zoom")
        for {
          y <- yN to yS
          x <- x1 to x2
          if GeoFns.intersects(tilePolygon(x, y, zoom), g)
        } yield (x, y)
    }
  }

  case class GeometryToBingTiles(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(tileType, containsNull = false)
    override def prettyName: String = "geometry_to_bing_tiles"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(g: Any, z: Any): Any = {
      val zoom = z.asInstanceOf[Int]
      val tiles = cover(GeoFns.fromWkb(g.asInstanceOf[Array[Byte]]), zoom)
      new GenericArrayData(tiles.map { case (x, y) => tileRow(x, y, zoom) }.toArray[Any])
    }
  }

  private def arity(name: String, ns: Set[Int])(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression = { args =>
    require(ns.contains(args.length),
      s"$name expects ${ns.toSeq.sorted.mkString(" or ")} arguments, got ${args.length}")
    build(args)
  }

  private def dbl(e: Expression): Expression = Cast(e, DoubleType)
  private def int(e: Expression): Expression = Cast(e, IntegerType)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bing_tile" -> arity("bing_tile", Set(1, 3)) { a =>
      if (a.length == 1) BingTile(a) else BingTile(Seq(int(a(0)), int(a(1)), int(a(2))))
    },
    "bing_tile_at" -> arity("bing_tile_at", Set(3))(a =>
      BingTileAt(Seq(dbl(a(0)), dbl(a(1)), int(a(2))))),
    "bing_tile_quadkey" -> arity("bing_tile_quadkey", Set(1))(a => BingTileQuadkey(a(0))),
    "bing_tile_zoom_level" -> arity("bing_tile_zoom_level", Set(1))(a => BingTileZoom(a(0))),
    "bing_tile_coordinates" -> arity("bing_tile_coordinates", Set(1))(a =>
      BingTileCoordinates(a(0))),
    "bing_tile_polygon" -> arity("bing_tile_polygon", Set(1))(a => BingTilePolygon(a(0))),
    "bing_tiles_around" -> arity("bing_tiles_around", Set(3))(a =>
      BingTilesAround(Seq(dbl(a(0)), dbl(a(1)), int(a(2))))),
    "geometry_to_bing_tiles" -> arity("geometry_to_bing_tiles", Set(2))(a =>
      GeometryToBingTiles(a(0), int(a(1)))))
}
