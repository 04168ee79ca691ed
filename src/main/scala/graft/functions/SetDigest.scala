package graft.functions

import scala.collection.mutable

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union => ThetaUnion}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's SetDigest function family — make_set_digest /
  * merge_set_digest / intersection_cardinality / jaccard_index /
  * hash_counts (plus cardinality, dispatched by
  * [[PrestoCompat.PrestoCardinality]]'s family sniffing).
  *
  * Presto's SetDigest is a MinHash + HLL composite; this engine's is a
  * composite too (round 12): a datasketches THETA sketch answers union
  * / intersection / Jaccard with the same mergeable bounded-memory
  * contract, and a bounded MINHASH COUNT MAP — the B smallest 64-bit
  * value hashes, each with its occurrence count — carries exactly what
  * Presto's `hash_counts` exposes (its MinHash register dump with
  * per-hash counts). Binary format is graft-framed (magic "GS"), not
  * Presto-interchangeable — documented, like every sketch family here.
  * `hash_counts` returns map<bigint, int> (Presto: map(bigint,
  * smallint); counts clamp at Short.MaxValue the way Presto's do,
  * widened to int in the SQL type).
  *
  * Determinism: the Theta part serializes COMPACT ORDERED and the count
  * map serializes hash-sorted, so in exact mode (distinct values under
  * the nominal 4096 entries) the bytes — and every derived estimate —
  * are identical under any partitioning or input order, which is what
  * makes the oracle entries hash-checkable. Past capacity the count map
  * keeps the B smallest hashes (the MinHash contract — identical to
  * Presto's behavior at its own capacity).
  *
  * Scale shape: per-group state is capacity-bounded (4096 retained
  * hashes each side), aggregated map-side, merged associatively — set
  * overlap at 100 TB where exact distinct-intersections would shuffle
  * every value.
  */
object SetDigest {

  /** MinHash register bound (Presto's SetDigest default is 8192; 4096
    * matches the Theta side's nominal entries). */
  private val MaxHashes = 4096

  // ---------------------------------------------------------- framing
  // [0]='G' [1]='S' [2]=version(1)
  // [3..6]  int32 BE theta-length
  // theta bytes (compact ordered)
  // int32 BE #entries, then (int64 hash, int64 count) ascending by hash
  def isSetDigest(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && bytes(0) == 'G'.toByte && bytes(1) == 'S'.toByte

  /** Raw Theta serialized preamble: byte 2 is the family id (COMPACT =
    * 3) — accepted for robustness alongside the framed form. */
  def isThetaFamily(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && (bytes(2) & 0xff) == 3

  /** Wire-format honesty (round 13): graft set digests are the 'GS'-framed
    * Theta + MinHash-counts composite (or a raw DataSketches Theta
    * COMPACT binary). Presto's SetDigest serializes MinHash + HLL bytes —
    * a different, non-interchangeable format — so foreign preambles are
    * rejected with the divergence named instead of being misparsed. */
  private def heapifyTheta(bytes: Array[Byte]): CompactSketch = {
    def fail(cause: Exception): Nothing = throw new IllegalArgumentException(
      "not a graft set digest binary: expected the 'GS'-framed Theta+counts " +
        "composite or a raw Apache DataSketches Theta COMPACT sketch " +
        s"(family id 3 at preamble byte 2; got ${
          if (bytes.length > 2) "byte " + (bytes(2) & 0xff) else s"a ${bytes.length}-byte input"
        }). Presto's SetDigest (MinHash+HLL) serialization is a different, " +
        "non-interchangeable format — re-aggregate with make_set_digest.", cause)
    if (!isThetaFamily(bytes)) fail(null)
    try CompactSketch.heapify(Memory.wrap(bytes))
    catch { case e: Exception => fail(e) }
  }

  private def frame(theta: Array[Byte], counts: Seq[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(3 + 4 + theta.length + 4 + counts.length * 16)
    bb.put('G'.toByte).put('S'.toByte).put(1.toByte)
    bb.putInt(theta.length).put(theta)
    bb.putInt(counts.length)
    counts.sortBy(_._1).foreach { case (h, c) => bb.putLong(h).putLong(c) }
    bb.array()
  }

  private def unframe(bytes: Array[Byte]): (CompactSketch, Seq[(Long, Long)]) = {
    if (!isSetDigest(bytes)) {
      // raw Theta (pre-framing digest or external sketch): empty counts
      return (heapifyTheta(bytes), Nil)
    }
    val bb = java.nio.ByteBuffer.wrap(bytes, 3, bytes.length - 3)
    val tLen = bb.getInt
    val theta = new Array[Byte](tLen)
    bb.get(theta)
    val n = bb.getInt
    val counts = Vector.newBuilder[(Long, Long)]
    var i = 0
    while (i < n) { counts += ((bb.getLong, bb.getLong)); i += 1 }
    (heapifyTheta(theta), counts.result())
  }

  def thetaOf(bytes: Array[Byte]): CompactSketch = unframe(bytes)._1

  // ------------------------------------------------------- value hash
  // 64-bit FNV-1a over the value's canonical byte encoding — stable,
  // partition-independent, independent of the Theta sketch's internal
  // murmur stream (public constant parameters, RFC-described algorithm)
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  private def longBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  private def hashOf(dt: DataType, v: Any): Long = dt match {
    case StringType => fnv1a(v.asInstanceOf[UTF8String].getBytes)
    case LongType => fnv1a(longBytes(v.asInstanceOf[Long]))
    case IntegerType => fnv1a(longBytes(v.asInstanceOf[Int].toLong))
    case ShortType => fnv1a(longBytes(v.asInstanceOf[Short].toLong))
    case ByteType => fnv1a(longBytes(v.asInstanceOf[Byte].toLong))
    case DoubleType =>
      fnv1a(longBytes(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
    case BinaryType => fnv1a(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"make_set_digest: unsupported input type ${other.catalogString}")
  }

  private def updateTheta(u: ThetaUnion, dt: DataType, v: Any): Unit = dt match {
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

  // --------------------------------------------------- aggregate state
  /** Theta union + bounded MinHash count map. */
  final class SdState(val u: ThetaUnion, val counts: mutable.HashMap[Long, Long]) {
    def addHash(h: Long, c: Long): Unit = {
      counts.updateWith(h) {
        case Some(old) => Some(math.min(old + c, Short.MaxValue.toLong))
        case None => Some(math.min(c, Short.MaxValue.toLong))
      }
      // amortized trim: compact to the B smallest once 2B accumulate
      if (counts.size > 2 * MaxHashes) trim()
    }
    def trim(): Unit = if (counts.size > MaxHashes) {
      val keep = counts.keysIterator.toArray.sorted.take(MaxHashes).toSet
      counts.filterInPlace((k, _) => keep(k))
    }
    def trimmed(): Seq[(Long, Long)] = { trim(); counts.toSeq }
  }
  private def newState() =
    new SdState(SetOperation.builder().buildUnion(), mutable.HashMap.empty)

  private def serializeState(s: SdState): Array[Byte] =
    frame(s.u.getResult(true, null).toByteArray, s.trimmed())
  private def deserializeState(bytes: Array[Byte]): SdState = {
    val (theta, counts) = unframe(bytes)
    val s = newState()
    s.u.union(theta)
    counts.foreach { case (h, c) => s.addHash(h, c) }
    s
  }
  private def evalState(s: SdState): Any = {
    val c = s.u.getResult(true, null)
    // no non-null input seen → NULL, the Presto aggregate stance
    // (MakeSetDigest and MergeSetDigest must agree)
    if (c.isEmpty) null else frame(c.toByteArray, s.trimmed())
  }

  /** make_set_digest(x): Theta + MinHash-counts aggregate. */
  case class MakeSetDigest(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SdState] with UnaryLike[Expression] {

    override def prettyName: String = "make_set_digest"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): MakeSetDigest =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): MakeSetDigest =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): MakeSetDigest =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): SdState = newState()

    override def update(buf: SdState, input: InternalRow): SdState = {
      val v = child.eval(input)
      if (v != null) {
        updateTheta(buf.u, child.dataType, v)
        buf.addHash(hashOf(child.dataType, v), 1L)
      }
      buf
    }

    override def merge(buf: SdState, other: SdState): SdState = {
      buf.u.union(other.u.getResult)
      other.counts.foreach { case (h, c) => buf.addHash(h, c) }
      buf
    }

    override def eval(buf: SdState): Any = evalState(buf)
    override def serialize(buf: SdState): Array[Byte] = serializeState(buf)
    override def deserialize(bytes: Array[Byte]): SdState = deserializeState(bytes)
  }

  /** merge_set_digest(digest): union of already-built digests. */
  case class MergeSetDigest(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SdState] with UnaryLike[Expression] {

    override def prettyName: String = "merge_set_digest"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildInternal(c: Expression): MergeSetDigest =
      copy(child = c)
    override def withNewMutableAggBufferOffset(offset: Int): MergeSetDigest =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): MergeSetDigest =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): SdState = newState()

    override def update(buf: SdState, input: InternalRow): SdState = {
      val v = child.eval(input)
      if (v != null) {
        val (theta, counts) = unframe(v.asInstanceOf[Array[Byte]])
        buf.u.union(theta)
        counts.foreach { case (h, c) => buf.addHash(h, c) }
      }
      buf
    }
    override def merge(buf: SdState, other: SdState): SdState = {
      buf.u.union(other.u.getResult)
      other.counts.foreach { case (h, c) => buf.addHash(h, c) }
      buf
    }
    override def eval(buf: SdState): Any = evalState(buf)
    override def serialize(buf: SdState): Array[Byte] = serializeState(buf)
    override def deserialize(bytes: Array[Byte]): SdState = deserializeState(bytes)
  }

  /** intersection_cardinality(x, y) / jaccard_index(x, y) — answered
    * from the Theta part. */
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
      val ab = a.asInstanceOf[Array[Byte]]
      val bb = b.asInstanceOf[Array[Byte]]
      // family dispatch: Presto overloads these names over SetDigest
      // AND KHyperLogLog; the 'GK' preamble picks the KHLL kernels
      if (KHll.isKhll(ab) || KHll.isKhll(bb)) {
        if (!(KHll.isKhll(ab) && KHll.isKhll(bb)))
          throw new IllegalArgumentException(
            s"$fn: cannot mix a KHyperLogLog with a different sketch family")
        return fn match {
          case "intersection_cardinality" => KHll.intersectionCardinality(ab, bb)
          case "jaccard_index" => KHll.jaccard(ab, bb)
        }
      }
      val x = thetaOf(ab)
      val y = thetaOf(bb)
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

  /** hash_counts(setdigest): the MinHash register dump — map from each
    * retained 64-bit value hash to its clamped occurrence count
    * (Presto: map(bigint, smallint); int-widened here). */
  case class HashCounts(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = MapType(LongType, IntegerType, false)
    override def nullable: Boolean = true
    override def prettyName: String = "hash_counts"
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("hash_counts expects a set-digest binary")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val (_, counts) = unframe(v.asInstanceOf[Array[Byte]])
      val sorted = counts.sortBy(_._1)
      new ArrayBasedMapData(
        new GenericArrayData(sorted.map(_._1).toArray),
        new GenericArrayData(sorted.map(_._2.toInt).toArray))
    }
  }

  /** cardinality(setdigest) kernel for the family dispatcher. */
  def estimate(bytes: Array[Byte]): Long = math.round(thetaOf(bytes).getEstimate)

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "make_set_digest" -> { es: Seq[Expression] =>
      MakeSetDigest(es.head).toAggregateExpression() },
    "merge_set_digest" -> { es: Seq[Expression] =>
      MergeSetDigest(es.head).toAggregateExpression() },
    "intersection_cardinality" -> { es: Seq[Expression] =>
      SetDigestBinary("intersection_cardinality", es(0), es(1)) },
    "jaccard_index" -> { es: Seq[Expression] =>
      SetDigestBinary("jaccard_index", es(0), es(1)) },
    "hash_counts" -> { es: Seq[Expression] => HashCounts(es.head) })
}
