package graft.functions

import org.apache.datasketches.common.Family
import org.apache.datasketches.hll.{HllSketch, Union}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.tdigest.TDigestDouble

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Presto's quantile-sketch function family (qdigest_agg /
  * value_at_quantile / quantile_at_value) and the genuinely-overloaded
  * merge(sketch).
  *
  * The reference exposes Presto's sketch aggregates through its function
  * registry (AxiomSql.cpp:58-59). Presto's qdigest is a q-digest over a
  * fixed universe; this engine backs the same API with the datasketches
  * KLL sketch (already on Spark's classpath — it powers approx_set /
  * cardinality here) — same contract (mergeable bounded-memory streaming
  * quantiles, exact when the group fits in the sketch), different (and
  * documented) binary format: graft sketches do not interchange with
  * Presto coordinator bytes.
  *
  * Scale shape: per-group state is the KLL summary (~k doubles,
  * capacity-bounded), aggregated map-side, merged associatively across
  * partials — streaming quantiles at 100 TB where an exact sort-based
  * percentile would shuffle every row to one reducer.
  *
  * Rank semantics are pinned to INCLUSIVE: `value_at_quantile(s, q)` is
  * the smallest stored value whose inclusive rank (#values <= v)/n
  * reaches q — which in exact mode (n <= k) equals SQL's
  * `min(v) FILTER (cume_dist() >= q)`, the form the DuckDB oracle uses.
  */
object QuantileSketch {

  /** Wire-format honesty (round 13): graft sketches serialize in the
    * Apache DataSketches layout (family id at preamble byte 2). Presto's
    * qdigest/tdigest are airlift-serialized — a DIFFERENT, non-
    * interchangeable byte format — so foreign bytes are rejected with
    * the divergence named instead of being misparsed. */
  private def wireError(fn: String, family: String, bytes: Array[Byte],
                        cause: Exception = null): Nothing =
    throw new IllegalArgumentException(
      s"not a graft $fn binary: expected the Apache DataSketches $family wire format" +
      s" (family id at preamble byte 2; got byte ${
        if (bytes.length > 2) (bytes(2) & 0xff).toString else s"<${bytes.length}-byte input>"
      }). Presto/airlift $fn serialization is a different, non-interchangeable format —" +
      s" re-aggregate with $fn over the raw values, or merge only graft-produced sketches.",
      cause)

  private def heapifyKll(bytes: Array[Byte]): KllDoublesSketch = {
    if (bytes.length <= 2 || (bytes(2) & 0xff) != Family.KLL.getID)
      wireError("qdigest_agg", "KLL", bytes)
    try KllDoublesSketch.heapify(Memory.wrap(bytes))
    catch { case e: Exception => wireError("qdigest_agg", "KLL", bytes, e) }
  }

  private def heapifyTd(bytes: Array[Byte]): TDigestDouble = {
    if (!isTDigest(bytes)) wireError("tdigest_agg", "TDIGEST", bytes)
    try TDigestDouble.heapify(Memory.wrap(bytes))
    catch { case e: Exception => wireError("tdigest_agg", "TDIGEST", bytes, e) }
  }

  /** Datasketches preamble byte 2 is the family id across HLL/KLL/
    * t-digest — the dispatch key for readers and merge() over untyped
    * BINARY columns (Presto dispatches on the SQL type instead). */
  private def isTDigest(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && (bytes(2) & 0xff) == Family.TDIGEST.getID

  /** tdigest_agg(x) (round 12 — real t-digest, no longer a KLL alias):
    * Dunning & Ertl's mergeable centroid sketch via the datasketches
    * TDigestDouble (the same vetted library backing approx_set's HLL
    * and qdigest_agg's KLL). Accuracy concentrates at the TAILS — the
    * scale function spends centroids near ranks 0 and 1, which is what
    * a user asks a t-digest for (q0.001/q0.999) and exactly where the
    * uniform-rank-error KLL is weakest. State is ~k centroids,
    * map-side-partial and associatively mergeable — the 100 TB shape. */
  case class TDigestAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

    override def prettyName: String = "tdigest_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): TDigestAgg = copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): TDigestDouble =
      new TDigestDouble(TDigestDouble.DEFAULT_K)

    override def update(buf: TDigestDouble, input: InternalRow): TDigestDouble = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: TDigestDouble, other: TDigestDouble): TDigestDouble = {
      buf.merge(other)
      buf
    }

    override def eval(buf: TDigestDouble): Any =
      if (buf.isEmpty) null else buf.toByteArray

    override def serialize(buf: TDigestDouble): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): TDigestDouble = heapifyTd(bytes)
  }

  /** qdigest_agg(x): streaming quantile sketch aggregate. */
  case class KllAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def prettyName: String = "qdigest_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): KllAgg = copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): KllAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): KllAgg =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance()

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other)
      buf
    }

    override def eval(buf: KllDoublesSketch): Any =
      if (buf.isEmpty) null else buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch = heapifyKll(bytes)
  }

  /** Union state for the overloaded merge(): the family is discovered
    * from the first sketch's preamble (datasketches byte 2). */
  final class SketchUnionState(var hll: Union, var kll: KllDoublesSketch,
      var td: TDigestDouble = null,
      var khll: KHll.KState = null) {
    def familyName: String =
      if (hll != null) "HLL" else if (kll != null) "KLL"
      else if (td != null) "t-digest"
      else if (khll != null) "KHyperLogLog" else "empty"
  }

  /** Presto merge(sketch) — overloaded over HLL (approx_set) and
    * quantile (qdigest_agg) sketches. Presto dispatches on the SQL type
    * (hyperloglog vs qdigest); here the column is untyped BINARY, so
    * dispatch happens at runtime on the serialized family id — mixed
    * families in one group fail with a clear error. */
  case class SketchMerge(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SketchUnionState] with UnaryLike[Expression] {

    override def prettyName: String = "merge"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): SketchMerge = copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): SketchMerge =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): SketchMerge =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): SketchUnionState = new SketchUnionState(null, null)

    private def familyOf(bytes: Array[Byte]): Family =
      try Family.idToFamily(bytes(2) & 0xff)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          "merge: unrecognized sketch binary; supported: HyperLogLog " +
            "(approx_set) and KLL quantile (qdigest_agg) sketches in the " +
            "Apache DataSketches wire format. Presto/airlift sketch " +
            "serialization is not interchangeable — re-aggregate here.", e)
      }

    private def addHll(s: SketchUnionState, bytes: Array[Byte]): Unit = {
      if (s.kll != null || s.khll != null) throw new IllegalArgumentException(
        s"merge: mixed sketch families in one group (HLL after ${s.familyName})")
      if (s.hll == null) s.hll = new Union(12)
      s.hll.update(HllSketch.heapify(Memory.wrap(bytes)))
    }

    private def addKll(s: SketchUnionState, bytes: Array[Byte]): Unit = {
      if (s.hll != null || s.td != null || s.khll != null)
        throw new IllegalArgumentException(
          s"merge: mixed sketch families in one group (KLL after ${s.familyName})")
      val sk = heapifyKll(bytes)
      if (s.kll == null) s.kll = KllDoublesSketch.newHeapInstance()
      s.kll.merge(sk)
    }

    private def addTd(s: SketchUnionState, bytes: Array[Byte]): Unit = {
      if (s.hll != null || s.kll != null || s.khll != null)
        throw new IllegalArgumentException(
          s"merge: mixed sketch families in one group (t-digest after ${s.familyName})")
      val sk = heapifyTd(bytes)
      if (s.td == null) s.td = new TDigestDouble(TDigestDouble.DEFAULT_K)
      s.td.merge(sk)
    }

    private def addKhll(s: SketchUnionState, bytes: Array[Byte]): Unit = {
      if (s.hll != null || s.kll != null || s.td != null)
        throw new IllegalArgumentException(
          s"merge: mixed sketch families in one group (KHyperLogLog after ${s.familyName})")
      if (s.khll == null) s.khll = new KHll.KState()
      s.khll.mergeFrom(KHll.deserialize(bytes, "merge"))
    }

    private def add(s: SketchUnionState, bytes: Array[Byte]): Unit =
      if (KHll.isKhll(bytes)) addKhll(s, bytes) // 'GK' frame, not a DataSketches preamble
      else familyOf(bytes) match {
      case Family.HLL => addHll(s, bytes)
      case Family.KLL => addKll(s, bytes)
      case Family.TDIGEST => addTd(s, bytes)
      case other => throw new IllegalArgumentException(
        s"merge: unsupported sketch family $other; supported: HyperLogLog " +
          "(approx_set), KLL quantile (qdigest_agg) and t-digest " +
          "(tdigest_agg) sketches")
    }

    override def update(s: SketchUnionState, input: InternalRow): SketchUnionState = {
      val v = child.eval(input)
      if (v != null) add(s, v.asInstanceOf[Array[Byte]])
      s
    }

    override def merge(s: SketchUnionState, o: SketchUnionState): SketchUnionState = {
      def requireFamily(ok: Boolean): Unit =
        if (!ok) throw new IllegalArgumentException(
          "merge: mixed sketch families across partitions")
      if (o.hll != null) {
        requireFamily(s.kll == null && s.td == null && s.khll == null)
        if (s.hll == null) s.hll = new Union(12)
        s.hll.update(o.hll.getResult)
      }
      if (o.kll != null) {
        requireFamily(s.hll == null && s.td == null && s.khll == null)
        if (s.kll == null) s.kll = KllDoublesSketch.newHeapInstance()
        s.kll.merge(o.kll)
      }
      if (o.td != null) {
        requireFamily(s.hll == null && s.kll == null && s.khll == null)
        if (s.td == null) s.td = new TDigestDouble(TDigestDouble.DEFAULT_K)
        s.td.merge(o.td)
      }
      if (o.khll != null) {
        requireFamily(s.hll == null && s.kll == null && s.td == null)
        if (s.khll == null) s.khll = new KHll.KState()
        s.khll.mergeFrom(o.khll)
      }
      s
    }

    override def eval(s: SketchUnionState): Any =
      if (s.hll != null) s.hll.getResult.toCompactByteArray
      else if (s.kll != null) s.kll.toByteArray
      else if (s.td != null) s.td.toByteArray
      else if (s.khll != null) KHll.serialize(s.khll)
      else null

    override def serialize(s: SketchUnionState): Array[Byte] = {
      if (s.hll != null) Array[Byte](1) ++ s.hll.getResult.toCompactByteArray
      else if (s.kll != null) Array[Byte](2) ++ s.kll.toByteArray
      else if (s.td != null) Array[Byte](3) ++ s.td.toByteArray
      else if (s.khll != null) Array[Byte](4) ++ KHll.serialize(s.khll)
      else Array[Byte](0)
    }

    override def deserialize(bytes: Array[Byte]): SketchUnionState = {
      val s = new SketchUnionState(null, null)
      if (bytes.nonEmpty && bytes(0) != 0) {
        val body = java.util.Arrays.copyOfRange(bytes, 1, bytes.length)
        bytes(0) match {
          case 1 => addHll(s, body)
          case 2 => addKll(s, body)
          case 4 => addKhll(s, body)
          case _ => addTd(s, body)
        }
      }
      s
    }
  }

  /** value_at_quantile(qdigest, q): smallest stored value whose
    * inclusive rank reaches q. */
  case class ValueAtQuantile(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "value_at_quantile"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(bin: Any, q: Any): Any = {
      val rank = q.asInstanceOf[Double]
      if (rank < 0.0 || rank > 1.0) throw new IllegalArgumentException(
        s"value_at_quantile: quantile must be in [0, 1], got $rank")
      val bytes = bin.asInstanceOf[Array[Byte]]
      if (isTDigest(bytes)) {
        val td = heapifyTd(bytes)
        if (td.isEmpty) null else td.getQuantile(rank)
      } else {
        val sk = heapifyKll(bytes)
        if (sk.isEmpty) null
        else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
      }
    }
  }

  /** quantile_at_value(qdigest, v): inclusive rank of v — the inverse
    * reader. NULL for an empty sketch, as in Presto. */
  case class QuantileAtValue(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "quantile_at_value"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(bin: Any, v: Any): Any = {
      val bytes = bin.asInstanceOf[Array[Byte]]
      if (isTDigest(bytes)) {
        val td = heapifyTd(bytes)
        if (td.isEmpty) null else td.getRank(v.asInstanceOf[Double])
      } else {
        val sk = heapifyKll(bytes)
        if (sk.isEmpty) null
        else sk.getRank(v.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
      }
    }
  }
}
