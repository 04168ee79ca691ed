package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch, Union => ThetaUnion}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's SetDigest function family — make_set_digest /
  * merge_set_digest / intersection_cardinality / jaccard_index (plus
  * cardinality, dispatched by [[PrestoCompat.PrestoCardinality]]'s
  * family sniffing).
  *
  * Presto's SetDigest is a MinHash + HLL composite; this engine backs
  * the same query surface with the datasketches THETA sketch (already
  * on Spark's classpath), which answers union, intersection, and
  * Jaccard estimates with the same mergeable bounded-memory contract —
  * different (documented) binary format, and Presto's `hash_counts`
  * (the raw MinHash register dump) has no Theta analogue and is not
  * provided.
  *
  * Determinism: sketches serialize in COMPACT ORDERED form, so in
  * exact mode (distinct values under the nominal 4096 entries) the
  * bytes — and every derived estimate — are identical under any
  * partitioning or input order, which is what makes the oracle entry
  * hash-checkable (the same exact-regime trick as approx_most_frequent
  * and numeric_histogram).
  *
  * Scale shape: per-group state is capacity-bounded (max 4096 retained
  * hashes), aggregated map-side, merged associatively — set overlap at
  * 100 TB where exact distinct-intersections would shuffle every value.
  */
object SetDigest {

  private[functions] def heapify(bytes: Array[Byte]): CompactSketch =
    try CompactSketch.heapify(Memory.wrap(bytes))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        "expected a make_set_digest (Theta) sketch binary", e)
    }

  /** Theta serialized preamble: byte 2 is the family id (COMPACT = 3) —
    * the same sniffing [[QuantileSketch.SketchMerge]] uses for HLL/KLL. */
  def isThetaFamily(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && (bytes(2) & 0xff) == 3

  private def updateWith(u: ThetaUnion, dt: DataType, v: Any): Unit = dt match {
    case StringType => u.update(v.asInstanceOf[UTF8String].toString)
    case LongType => u.update(v.asInstanceOf[Long])
    case IntegerType => u.update(v.asInstanceOf[Int].toLong)
    case ShortType => u.update(v.asInstanceOf[Short].toLong)
    case ByteType => u.update(v.asInstanceOf[Byte].toLong)
    case DoubleType => u.update(v.asInstanceOf[Double])
    case BinaryType => u.update(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"make_set_digest: unsupported input type ${other.catalogString}")
  }

  /** make_set_digest(x): Theta sketch aggregate over the group (the
    * union operator accepts raw updates, so it IS the buffer). */
  case class MakeSetDigest(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaUnion] with UnaryLike[Expression] {

    override def prettyName: String = "make_set_digest"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): MakeSetDigest =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): MakeSetDigest =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): MakeSetDigest =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): ThetaUnion =
      SetOperation.builder().buildUnion()

    override def update(buf: ThetaUnion, input: InternalRow): ThetaUnion = {
      val v = child.eval(input)
      if (v != null) updateWith(buf, child.dataType, v)
      buf
    }

    override def merge(buf: ThetaUnion, other: ThetaUnion): ThetaUnion = {
      buf.union(other.getResult)
      buf
    }

    override def eval(buf: ThetaUnion): Any = {
      // no non-null input seen → NULL, the Presto aggregate stance
      // (and MergeSetDigest's — the two must agree)
      val c = buf.getResult(true, null)
      if (c.isEmpty) null else c.toByteArray
    }

    override def serialize(buf: ThetaUnion): Array[Byte] =
      buf.getResult(true, null).toByteArray
    override def deserialize(bytes: Array[Byte]): ThetaUnion = {
      val u = SetOperation.builder().buildUnion()
      u.union(heapify(bytes))
      u
    }
  }

  /** merge_set_digest(digest): union of already-built digests. */
  case class MergeSetDigest(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaUnion] with UnaryLike[Expression] {

    override def prettyName: String = "merge_set_digest"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): MergeSetDigest =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): MergeSetDigest =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): MergeSetDigest =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): ThetaUnion =
      SetOperation.builder().buildUnion()

    override def update(buf: ThetaUnion, input: InternalRow): ThetaUnion = {
      val v = child.eval(input)
      if (v != null) buf.union(heapify(v.asInstanceOf[Array[Byte]]))
      buf
    }
    override def merge(buf: ThetaUnion, other: ThetaUnion): ThetaUnion = {
      buf.union(other.getResult)
      buf
    }
    override def eval(buf: ThetaUnion): Any = {
      val c = buf.getResult(true, null)
      if (c.isEmpty) null else c.toByteArray
    }
    override def serialize(buf: ThetaUnion): Array[Byte] =
      buf.getResult(true, null).toByteArray
    override def deserialize(bytes: Array[Byte]): ThetaUnion = {
      val u = SetOperation.builder().buildUnion()
      u.union(heapify(bytes))
      u
    }
  }

  /** intersection_cardinality(x, y) / jaccard_index(x, y). */
  case class SetDigestBinary(fn: String, left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType =
      if (fn == "jaccard_index") DoubleType else LongType
    override def nullable: Boolean = true
    override def prettyName: String = fn
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == BinaryType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$fn expects two set-digest binaries")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = heapify(a.asInstanceOf[Array[Byte]])
      val y = heapify(b.asInstanceOf[Array[Byte]])
      fn match {
        case "intersection_cardinality" =>
          val i = SetOperation.builder().buildIntersection()
          i.intersect(x); i.intersect(y)
          math.round(i.getResult.getEstimate)
        case "jaccard_index" =>
          val i = SetOperation.builder().buildIntersection()
          i.intersect(x); i.intersect(y)
          val inter = i.getResult.getEstimate
          val u = SetOperation.builder().buildUnion()
          u.union(x); u.union(y)
          val uni = u.getResult.getEstimate
          if (uni == 0.0) 0.0 else inter / uni
      }
    }
  }

  /** cardinality(setdigest) kernel for the family dispatcher. */
  def estimate(bytes: Array[Byte]): Long = math.round(heapify(bytes).getEstimate)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "make_set_digest" -> { es: Seq[Expression] =>
      MakeSetDigest(es.head).toAggregateExpression() },
    "merge_set_digest" -> { es: Seq[Expression] =>
      MergeSetDigest(es.head).toAggregateExpression() },
    "intersection_cardinality" -> { es: Seq[Expression] =>
      SetDigestBinary("intersection_cardinality", es(0), es(1)) },
    "jaccard_index" -> { es: Seq[Expression] =>
      SetDigestBinary("jaccard_index", es(0), es(1)) })
}
