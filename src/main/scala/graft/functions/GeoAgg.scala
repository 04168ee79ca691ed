package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Geometry aggregates (Presto `convex_hull_agg`).
  *
  * The aggregation state is the convex hull of everything seen so far —
  * the hull is closed under union (hull(A ∪ B) = hull(hull(A) ∪
  * hull(B))), so partials COMPRESS: each buffer keeps at most
  * [[GeoAgg.CompactAt]] raw coordinates before collapsing to its hull,
  * and a merged buffer compacts the same way. State is bounded by the
  * hull's vertex count (typically tiny — O(log n) expected for random
  * points, ≤ CompactAt worst case mid-stream) no matter how many rows
  * flow through, which is what lets a 100 TB groupBy carry this
  * aggregate with constant-size map-side partials.
  *
  * `geometry_union_agg` (round 17): the state is the RUNNING UNION —
  * union is associative/commutative and idempotent, so partials
  * compress exactly like the hull's do: every update/merge collapses
  * into one geometry whose size is bounded by the union's own output
  * complexity (overlapping/adjacent inputs merge away; only genuinely
  * disjoint inputs keep distinct shells). That is the best possible
  * bound for an exact union — the aggregate's state can never be
  * smaller than its answer — and it is what lets map-side partials
  * stay result-sized rather than input-sized at 100 TB. */
object GeoAgg {

  /** Compact the point buffer to its hull once it holds this many
    * doubles (x,y pairs). */
  val CompactAt = 1024

  /** Tree-union the pending geometry buffer past this many rows. */
  val UnionCompactAt = 64

  final class HullState {
    var pts: scala.collection.mutable.ArrayBuffer[Double] =
      scala.collection.mutable.ArrayBuffer.empty

    def add(coords: Array[Double]): Unit = {
      pts ++= coords
      if (pts.length > CompactAt) compact()
    }

    def compact(): Unit = if (pts.nonEmpty) {
      val hull = GeoFns.convexHull(GeoFns.GMultiPoint(pts.toArray))
      val packed = hull match {
        case GeoFns.GPoint(x, y) => Array(x, y)
        case GeoFns.GLineString(p) => p
        case GeoFns.GPolygon(rings) => rings(0)
        case other => throw new IllegalStateException(
          s"convex hull produced a ${GeoFns.typeName(other)}")
      }
      pts = scala.collection.mutable.ArrayBuffer.from(packed)
    }
  }

  /** convex_hull_agg(geometry): the convex hull of all input
    * geometries' points, as a geometry (POLYGON; degenerate inputs
    * collapse to LINESTRING/POINT; null on no input). */
  case class ConvexHullAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HullState] with UnaryLike[Expression] {

    override def prettyName: String = "convex_hull_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): ConvexHullAgg =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): ConvexHullAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): ConvexHullAgg =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): HullState = new HullState

    override def update(buf: HullState, input: InternalRow): HullState = {
      val v = child.eval(input)
      if (v != null) {
        val g = GeoFns.fromWkb(v.asInstanceOf[Array[Byte]])
        if (!g.isEmpty) buf.add(GeoFns.vertsOf(g))
      }
      buf
    }

    override def merge(buf: HullState, other: HullState): HullState = {
      buf.add(other.pts.toArray)
      buf
    }

    override def eval(buf: HullState): Any =
      if (buf.pts.isEmpty) null
      else GeoFns.toWkb(GeoFns.convexHull(GeoFns.GMultiPoint(buf.pts.toArray)))

    override def serialize(buf: HullState): Array[Byte] = {
      buf.compact()
      val b = java.nio.ByteBuffer.allocate(buf.pts.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.pts.foreach(b.putDouble)
      b.array()
    }

    override def deserialize(bytes: Array[Byte]): HullState = {
      val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val s = new HullState
      val n = bytes.length / 8
      val arr = new Array[Double](n)
      var i = 0
      while (i < n) { arr(i) = b.getDouble(); i += 1 }
      s.pts ++= arr
      s
    }
  }

  final class UnionState {
    /** Pending inputs, tree-unioned on compaction. A per-row running
      * union would re-node the whole accumulation against every new
      * row — Θ(K²) edge tests for K disjoint inputs; buffering
      * [[GeoAgg.UnionCompactAt]] rows and merging pairwise keeps the
      * per-group cost ~O(K log K) while the serialized state stays
      * result-bounded (the same buffer-then-compact shape as
      * [[HullState]]). */
    val pending: scala.collection.mutable.ArrayBuffer[GeoFns.Geom] =
      scala.collection.mutable.ArrayBuffer.empty

    def add(g: GeoFns.Geom): Unit = {
      // validate each USER input ONCE on entry; the tree merges below
      // then run the trusted union — re-validating the running union at
      // every level re-ran the O(E²) operand check over kernel-produced
      // geometry and dominated the aggregate's cost (round-20 profile)
      GeoOverlay.requireValidPolys(g, "st_union")
      pending += g
      if (pending.length > UnionCompactAt) compact()
    }

    def compact(): Unit = if (pending.length > 1) {
      var level: Seq[GeoFns.Geom] = pending.toSeq
      while (level.length > 1)
        level = level.grouped(2).map {
          case Seq(a, b) => GeoOverlay.unionTrusted(a, b)
          case Seq(a) => a
        }.toSeq
      pending.clear()
      pending += level.head
    }
  }

  /** geometry_union_agg(geometry): the constructive union of all
    * inputs ([[GeoOverlay.union]] pairwise — exact overlay, so the
    * result is the same geometry regardless of fold order; null on no
    * input). */
  case class GeometryUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[UnionState] with UnaryLike[Expression] {

    override def prettyName: String = "geometry_union_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): GeometryUnionAgg =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): GeometryUnionAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): GeometryUnionAgg =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): UnionState = new UnionState

    override def update(buf: UnionState, input: InternalRow): UnionState = {
      val v = child.eval(input)
      if (v != null) {
        val g = GeoFns.fromWkb(v.asInstanceOf[Array[Byte]])
        if (!g.isEmpty) buf.add(g)
      }
      buf
    }

    override def merge(buf: UnionState, other: UnionState): UnionState = {
      buf.pending ++= other.pending
      if (buf.pending.length > UnionCompactAt) buf.compact()
      buf
    }

    override def eval(buf: UnionState): Any =
      if (buf.pending.isEmpty) null
      else { buf.compact(); GeoFns.toWkb(buf.pending.head) }

    override def serialize(buf: UnionState): Array[Byte] = {
      buf.compact()
      if (buf.pending.isEmpty) Array.empty else GeoFns.toWkb(buf.pending.head)
    }

    override def deserialize(bytes: Array[Byte]): UnionState = {
      val s = new UnionState
      if (bytes.nonEmpty) s.pending += GeoFns.fromWkb(bytes)
      s
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "convex_hull_agg" -> { args =>
      require(args.length == 1, s"convex_hull_agg expects 1 argument, got ${args.length}")
      ConvexHullAgg(args.head).toAggregateExpression()
    },
    "geometry_union_agg" -> { args =>
      require(args.length == 1,
        s"geometry_union_agg expects 1 argument, got ${args.length}")
      GeometryUnionAgg(args.head).toAggregateExpression()
    })
}
