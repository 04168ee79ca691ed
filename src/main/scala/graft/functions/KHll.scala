package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's KHyperLogLog family (khyperloglog_agg / cardinality /
  * intersection_cardinality / jaccard_index / merge / merge_khll /
  * uniqueness_distribution / reidentification_potential) — the
  * joinability-and-reidentifiability sketch of Chia et al.,
  * "KHyperLogLog: Estimating Reidentifiability and Joinability of
  * Large Data at Scale" (S&P 2019), which Presto exposes over
  * (x, y) column pairs: the K smallest 64-bit hashes of x (a KMV /
  * MinHash sample) each carry a small cardinality sketch of the y
  * values seen with that x.
  *
  * Answerable questions: NDV(x) (KMV estimate, EXACT below K),
  * MinHash intersection/Jaccard between two sketches, and the
  * "uniqueness" histogram — for each sampled x, how many distinct y
  * accompany it — from which reidentification potential (the fraction
  * of x values with at most `threshold` distinct y) falls out.
  *
  * Wire-format honesty (the SetDigest/qdigest stance): these bytes are
  * the graft 'GK' frame below, NOT Presto's airlift serialization —
  * foreign bytes are rejected with the divergence named, never
  * misparsed. Within the frame the sketch is EXACT in the regimes the
  * oracle exercises: all K x-hashes retained below K distinct x, and
  * each per-key y-set stored as an exact hash set up to [[SparseMax]]
  * distinct y before degrading to a dense m=64 HLL.
  *
  * Scale shape: per-group state is bounded by
  * K·(8 B hash + max(8·SparseMax, DenseM) B) ≈ 1.1 MB worst case and
  * typically ~K·tens of bytes — aggregated map-side, merged
  * associatively, never proportional to row count: the 100 TB
  * "joinability audit over every column pair" use case the paper
  * describes. Reference surface: Presto's KHyperLogLog functions
  * (unexercised by any reference test; registered for user parity).
  */
object KHll {

  /** MinHash sample size over x (Presto's default K). */
  val K = 2048
  /** Exact per-key y-hash set bound before densifying. */
  val SparseMax = 64
  /** Dense per-key HLL register count (64 × 6-bit ranks, byte-stored). */
  val DenseM = 64
  /** uniqueness_distribution default histogram width (Presto default). */
  val DefaultHistogramSize = 256L

  // ---------------------------------------------------------- framing
  // [0]='G' [1]='K' [2]=version(1)
  // int32 K, int32 #keys, then per key ascending by UNSIGNED hash:
  //   int64 keyHash, int8 mode
  //   mode 0 (sparse): int32 n, n × int64 yHash (ascending)
  //   mode 1 (dense):  DenseM register bytes
  def isKhll(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && bytes(0) == 'G'.toByte && bytes(1) == 'K'.toByte

  private def foreign(bytes: Array[Byte], fn: String): Nothing =
    throw new IllegalArgumentException(
      s"$fn: not a graft KHyperLogLog binary — expected the 'GK' frame " +
        s"(got ${if (bytes.length > 1) f"preamble 0x${bytes(0)}%02x 0x${bytes(1)}%02x"
        else s"a ${bytes.length}-byte input"}). Presto's airlift " +
        "KHyperLogLog serialization is a different, non-interchangeable " +
        "format — re-aggregate with khyperloglog_agg.")

  // ------------------------------------------------------- value hash
  // 64-bit FNV-1a over the value's canonical byte encoding (the
  // SetDigest discipline: stable, partition-independent, public
  // constants), FINISHED with the murmur3 fmix64 avalanche — unlike
  // SetDigest's count-keyed registers, KHLL's cardinality estimate and
  // dense HLL ranks read ORDER STATISTICS of the hash values, and raw
  // FNV-1a of short sequential inputs is visibly non-uniform in the
  // high bits (a 20k-distinct KMV estimate came out 6× low without the
  // finalizer).
  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    fmix64(h)
  }
  private def longBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  private def hashOf(fn: String, dt: DataType, v: Any): Long = dt match {
    case StringType => fnv1a(v.asInstanceOf[UTF8String].getBytes)
    case LongType => fnv1a(longBytes(v.asInstanceOf[Long]))
    case IntegerType => fnv1a(longBytes(v.asInstanceOf[Int].toLong))
    case ShortType => fnv1a(longBytes(v.asInstanceOf[Short].toLong))
    case ByteType => fnv1a(longBytes(v.asInstanceOf[Byte].toLong))
    case DoubleType =>
      fnv1a(longBytes(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
    case BinaryType => fnv1a(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      s"$fn: unsupported input type ${other.catalogString}")
  }

  // -------------------------------------------------- per-key y-state
  /** Exact y-hash set up to SparseMax, then dense HLL registers. */
  final class YState(var sparse: java.util.HashSet[java.lang.Long],
                     var dense: Array[Byte]) {
    def add(h: Long): Unit =
      if (dense != null) denseAdd(h)
      else {
        sparse.add(h)
        if (sparse.size > SparseMax) densify()
      }
    private def densify(): Unit = {
      dense = new Array[Byte](DenseM)
      val it = sparse.iterator()
      while (it.hasNext) denseAdd(it.next())
      sparse = null
    }
    private def denseAdd(h: Long): Unit = {
      val idx = (h >>> 58).toInt // top 6 bits → register, m = 64
      val w = h << 6
      val rank = (if (w == 0L) 59 else java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
      if (rank > dense(idx)) dense(idx) = rank
    }
    def mergeFrom(o: YState): Unit =
      if (o.dense != null) {
        if (dense == null) densify()
        var i = 0
        while (i < DenseM) {
          if (o.dense(i) > dense(i)) dense(i) = o.dense(i)
          i += 1
        }
      } else {
        val it = o.sparse.iterator()
        while (it.hasNext) add(it.next())
      }
    /** Distinct-y estimate: exact in sparse mode, HLL in dense mode. */
    def ndv: Long =
      if (dense == null) sparse.size.toLong
      else {
        val m = DenseM.toDouble
        var sum = 0.0; var zeros = 0
        var i = 0
        while (i < DenseM) {
          sum += java.lang.Math.scalb(1.0, -dense(i))
          if (dense(i) == 0) zeros += 1
          i += 1
        }
        val alpha = 0.709 // alpha_64
        val raw = alpha * m * m / sum
        val est =
          if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
        math.max(1L, math.round(est))
      }
  }
  private def newY() = new YState(new java.util.HashSet[java.lang.Long](), null)

  // ---------------------------------------------------- sketch state
  /** K smallest x-hashes (unsigned order) → y-state. */
  final class KState(
      val keys: java.util.TreeMap[java.lang.Long, YState] =
        new java.util.TreeMap[java.lang.Long, YState](
          (a: java.lang.Long, b: java.lang.Long) =>
            java.lang.Long.compareUnsigned(a, b)),
      var sawInput: Boolean = false) {
    def add(xHash: Long, yHash: Long): Unit = {
      sawInput = true
      val existing = keys.get(xHash)
      if (existing != null) existing.add(yHash)
      else if (keys.size < K) {
        val y = newY(); y.add(yHash); keys.put(xHash, y)
      } else if (java.lang.Long.compareUnsigned(xHash, keys.lastKey()) < 0) {
        keys.pollLastEntry()
        val y = newY(); y.add(yHash); keys.put(xHash, y)
      }
    }
    def mergeKey(xHash: Long, o: YState): Unit = {
      sawInput = true
      val existing = keys.get(xHash)
      if (existing != null) existing.mergeFrom(o)
      else if (keys.size < K ||
               java.lang.Long.compareUnsigned(xHash, keys.lastKey()) < 0) {
        if (keys.size >= K) keys.pollLastEntry()
        val y = newY(); y.mergeFrom(o); keys.put(xHash, y)
      }
    }
    def mergeFrom(o: KState): Unit = {
      if (o.sawInput) sawInput = true
      val it = o.keys.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        mergeKey(e.getKey, e.getValue)
      }
    }
  }

  def serialize(s: KState): Array[Byte] = {
    var size = 3 + 4 + 4
    val it0 = s.keys.values().iterator()
    while (it0.hasNext) {
      val y = it0.next()
      size += 8 + 1 + (if (y.dense != null) DenseM else 4 + 8 * y.sparse.size)
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.put('G'.toByte).put('K'.toByte).put(1.toByte)
    bb.putInt(K).putInt(s.keys.size)
    val it = s.keys.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      val y = e.getValue
      if (y.dense != null) { bb.put(1.toByte); bb.put(y.dense) }
      else {
        bb.put(0.toByte)
        val hs = new Array[Long](y.sparse.size)
        var i = 0
        val si = y.sparse.iterator()
        while (si.hasNext) { hs(i) = si.next(); i += 1 }
        java.util.Arrays.sort(hs)
        bb.putInt(hs.length)
        hs.foreach(bb.putLong)
      }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte], fn: String): KState = {
    if (!isKhll(bytes)) foreign(bytes, fn)
    if (bytes(2) != 1.toByte) throw new IllegalArgumentException(
      s"$fn: unsupported KHyperLogLog frame version ${bytes(2)} (engine writes 1)")
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes, 3, bytes.length - 3)
      val k = bb.getInt
      if (k != K) throw new IllegalArgumentException(
        s"$fn: KHyperLogLog K mismatch (sketch $k, engine $K)")
      val n = bb.getInt
      if (n < 0 || n > K) throw new IllegalArgumentException(
        s"$fn: corrupt KHyperLogLog frame (key count $n)")
      val s = new KState(sawInput = true)
      var i = 0
      while (i < n) {
        val h = bb.getLong
        val y = newY()
        if (bb.get() == 1.toByte) {
          y.dense = new Array[Byte](DenseM)
          bb.get(y.dense)
          y.sparse = null // the densify() invariant: sparse XOR dense
        } else {
          val cnt = bb.getInt
          if (cnt < 0 || cnt > SparseMax) throw new IllegalArgumentException(
            s"$fn: corrupt KHyperLogLog frame (sparse count $cnt)")
          var j = 0
          while (j < cnt) { y.add(bb.getLong); j += 1 }
        }
        s.keys.put(h, y)
        i += 1
      }
      s
    } catch {
      case e: java.nio.BufferUnderflowException =>
        throw new IllegalArgumentException(
          s"$fn: truncated KHyperLogLog frame (${bytes.length} bytes)", e)
    }
  }

  // ---------------------------------------------------------- queries
  /** Position of an unsigned 64-bit hash in (0, 1]. */
  private def unit(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  /** NDV(x): exact below K (every hash retained), else the KMV
    * estimator (K−1)/U(K) on the K-th smallest uniform. */
  def cardinality(bytes: Array[Byte]): Long = {
    val s = deserialize(bytes, "cardinality")
    val n = s.keys.size
    if (n < K) n.toLong
    else math.round((K - 1).toDouble / unit(s.keys.lastKey()))
  }

  /** MinHash Jaccard: restrict both key sets to the K smallest hashes
    * of their union; |in both| / |in union sample|. Exact when both
    * sketches are below K (full sets retained). */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double =
    jaccardOf(deserialize(a, "jaccard_index"), deserialize(b, "jaccard_index"))

  private def jaccardOf(sa: KState, sb: KState): Double = {
    val union = new java.util.TreeSet[java.lang.Long](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    union.addAll(sa.keys.keySet()); union.addAll(sb.keys.keySet())
    var inBoth = 0; var total = 0
    val it = union.iterator()
    while (it.hasNext && total < K) {
      val h = it.next()
      if (sa.keys.containsKey(h) && sb.keys.containsKey(h)) inBoth += 1
      total += 1
    }
    if (total == 0) 0.0 else inBoth.toDouble / total
  }

  /** Presto's estimator: Jaccard × NDV(union of key samples) — one
    * deserialization per operand, key-set arithmetic only (the per-key
    * y-states play no part in either factor). */
  def intersectionCardinality(a: Array[Byte], b: Array[Byte]): Long = {
    val sa = deserialize(a, "intersection_cardinality")
    val sb = deserialize(b, "intersection_cardinality")
    val union = new java.util.TreeSet[java.lang.Long](
      (x: java.lang.Long, y: java.lang.Long) => java.lang.Long.compareUnsigned(x, y))
    union.addAll(sa.keys.keySet()); union.addAll(sb.keys.keySet())
    // keep only the K smallest union hashes (what a merged sketch
    // would retain), then the KMV estimate on the K-th smallest
    while (union.size > K) union.pollLast()
    val uCard =
      if (union.size < K) union.size.toLong
      else math.round((K - 1).toDouble / unit(union.last()))
    math.round(jaccardOf(sa, sb) * uCard)
  }

  /** uniqueness → fraction-of-sampled-x histogram: bucket
    * min(NDV(y|x), histogramSize), every bucket 1..histogramSize
    * present (zeros included, the Presto shape). */
  def uniquenessDistribution(bytes: Array[Byte], histSize: Long): ArrayBasedMapData = {
    if (histSize < 1 || histSize > 65536) throw new IllegalArgumentException(
      s"uniqueness_distribution: histogram size must be in [1, 65536], got $histSize")
    val s = deserialize(bytes, "uniqueness_distribution")
    val counts = new Array[Long](histSize.toInt)
    val it = s.keys.values().iterator()
    while (it.hasNext) {
      val u = math.min(it.next().ndv, histSize)
      counts((u - 1).toInt) += 1
    }
    val n = s.keys.size.toDouble
    val ks = new Array[Any](histSize.toInt)
    val vs = new Array[Any](histSize.toInt)
    var i = 0
    while (i < histSize.toInt) {
      ks(i) = (i + 1).toLong
      vs(i) = if (n == 0) 0.0 else counts(i) / n
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
  }

  /** Fraction of sampled x values with at most `threshold` distinct y
    * (the paper's reidentification risk: low-uniqueness values
    * identify their owner). */
  def reidentificationPotential(bytes: Array[Byte], threshold: Long): Double = {
    require(threshold >= 1, "reidentification_potential: threshold must be >= 1")
    val s = deserialize(bytes, "reidentification_potential")
    if (s.keys.isEmpty) return 0.0
    var hits = 0
    val it = s.keys.values().iterator()
    while (it.hasNext) if (it.next().ndv <= threshold) hits += 1
    hits.toDouble / s.keys.size
  }

  // ------------------------------------------------------- aggregates
  /** khyperloglog_agg(x, y): rows with a null x or null y are skipped
    * (both halves of the association must exist). */
  case class KhllAgg(
      left: Expression,
      right: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KState] with BinaryLike[Expression] {

    override def prettyName: String = "khyperloglog_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def withNewMutableAggBufferOffset(offset: Int): KhllAgg =
      copy(mutableAggBufferOffset = offset)
    override def withNewInputAggBufferOffset(offset: Int): KhllAgg =
      copy(inputAggBufferOffset = offset)

    override def createAggregationBuffer(): KState = new KState()
    override def update(buf: KState, input: InternalRow): KState = {
      val x = left.eval(input)
      val y = right.eval(input)
      if (x != null && y != null)
        buf.add(hashOf(prettyName, left.dataType, x),
          hashOf(prettyName, right.dataType, y))
      buf
    }
    override def merge(buf: KState, other: KState): KState = {
      buf.mergeFrom(other); buf
    }
    override def eval(buf: KState): Any =
      if (!buf.sawInput) null else serialize(buf)
    override def serialize(buf: KState): Array[Byte] =
      if (!buf.sawInput) Array[Byte]('G', 'K', 0) else KHll.serialize(buf)
    override def deserialize(bytes: Array[Byte]): KState =
      if (bytes.length == 3 && bytes(2) == 0.toByte) new KState()
      else KHll.deserialize(bytes, prettyName)
  }

  /** merge_khll(array<khll>): the Presto scalar over an array column
    * (its aggregate twin is the generic merge(), which dispatches on
    * the 'GK' preamble). Null elements are skipped; an all-null or
    * empty array yields NULL. */
  case class MergeKhllArray(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "merge_khll"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"merge_khll expects array<binary>, got ${other.catalogString}")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val s = new KState()
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i))
          s.mergeFrom(deserialize(arr.getBinary(i), prettyName))
        i += 1
      }
      if (!s.sawInput) null else serialize(s)
    }
  }

  // ------------------------------------------------- scalar wrappers
  case class KhllUnary(fn: String, child: Expression, arg: Long)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = fn
    override def dataType: DataType = fn match {
      case "uniqueness_distribution" => MapType(LongType, DoubleType, false)
      case _ => DoubleType
    }
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$fn expects a KHyperLogLog binary")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def nullSafeEval(v: Any): Any = fn match {
      case "uniqueness_distribution" =>
        uniquenessDistribution(v.asInstanceOf[Array[Byte]], arg)
      case "reidentification_potential" =>
        reidentificationPotential(v.asInstanceOf[Array[Byte]], arg)
    }
  }

  private def litLong(e: Expression, fn: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, LongType) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: the size/threshold argument must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "khyperloglog_agg" -> { es: Seq[Expression] =>
      KhllAgg(es(0), es(1)).toAggregateExpression() },
    "merge_khll" -> { es: Seq[Expression] => MergeKhllArray(es.head) },
    "uniqueness_distribution" -> { es: Seq[Expression] =>
      KhllUnary("uniqueness_distribution", es.head,
        if (es.length > 1) litLong(es(1), "uniqueness_distribution")
        else DefaultHistogramSize) },
    "reidentification_potential" -> { es: Seq[Expression] =>
      KhllUnary("reidentification_potential", es(0),
        litLong(es(1), "reidentification_potential")) })
}
