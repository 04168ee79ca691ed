package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the signature/vector kernels of the
  * LLM-pipeline tier.
  *
  * These inner loops are k×n per row (64 permutations × ~58 shingles, or
  * 64-dim dot products); as nested higher-order-function expressions they
  * evaluate interpreted (HOFs have no codegen) at ~1µs per element-op —
  * measured 40-60 s at sf0.1. A compiled eval brings the same loop to
  * ~10 ns/op. CodegenFallback is deliberate: one compiled virtual call
  * per ROW is noise when the row itself carries thousands of element-ops
  * (a doGenCode would only inline that outer call).
  *
  * The reference takes the same route for its sampling kernels — bespoke
  * simple functions registered alongside the query surface
  * (axiom/optimizer/JoinSample.cpp:28-63 Hash/HashMix/Sample).
  */
object NativeExprs {

  /** MinHash signature: element i = min over the array's strings of
    * xxhash64(s, seed=i+1). Seed-per-permutation replaces the (a·h+b)
    * mod P permutation family — same independence guarantees, one less
    * multiply, and no ANSI overflow concerns. */
  case class MinHashSig(child: Expression, numPerm: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    // empty input → NULL: the all-MaxValue sentinel signature would make
    // every pair of empty inputs an exact "duplicate" (round-17 review);
    // pipeline callers pre-filter size >= 3, but the registered SQL
    // surface must not manufacture matches
    override def nullable: Boolean = true
    override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return null
      val out = Array.fill(numPerm)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "graft_minhash: input array must not contain NULL elements")
        val s = arr.getUTF8String(i)
        var p = 0
        while (p < numPerm) {
          val h = XxHash64Function.hash(s, StringType, p + 1L)
          if (h < out(p)) out(p) = h
          p += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** 64-bit SimHash packed into one long: bit k set iff the signed sum of
    * the k-th bits of the element hashes is positive. */
  case class SimHashSig64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          "graft_simhash64: input array must not contain NULL elements")
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
        i += 1
      }
      var sig = 0L
      var k = 0
      while (k < 64) { if (counts(k) > 0) sig |= (1L << k); k += 1 }
      sig
    }
  }

  /** Fraction of positions where two long arrays agree — the MinHash
    * Jaccard estimator (E[match fraction] = J), used as the cheap
    * mid-tier of tiered near-dup verification. */
  case class SigMatchFraction(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      if (n == 0) 0.0
      else {
        var eq = 0
        var i = 0
        while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
        eq.toDouble / n
      }
    }
  }

  /** Dot product of two float or double arrays accumulated in double —
    * the kernel under cosine similarity (norm = sqrt(VecDot(a,a))).
    * Element type is read from the (resolved) child schema at execution. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    // Element accessor PER SIDE: mixed float/double arguments would
    // otherwise read 8-byte slots from a 4-byte-packed array — silent
    // garbage, not an error.
    private def accessor(e: Expression): (ArrayData, Int) => Double = e.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"graft_vecdot expects array<float|double>, got $other")
    }
    @transient private lazy val getL = accessor(left)
    @transient private lazy val getR = accessor(right)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += getL(x, i) * getR(y, i); i += 1 }
      acc
    }
  }

  /** Sign-LSH bucket ids over a double array: `tables` independent
    * hyperplane sets of `bits` Rademacher (±1) hyperplanes each; bit j of
    * table l is the sign of the projection onto plane (l, j). Output
    * element l packs (table, bucket) into one long, so an explode + equi
    * self-join on the value compares only same-table-same-bucket pairs.
    * Hyperplanes are derived from `seed` via java.util.Random's specified
    * LCG — identical on every executor with no broadcast. */
  case class SignLshSig(child: Expression, tables: Int, bits: Int, seed: Long)
      extends UnaryExpression with CodegenFallback {
    // the packed key layout is (table << 32 | bucket): bits >= 32 would
    // overwrite the table-id field and silently collide buckets ACROSS
    // tables, exploding the downstream candidate equi-join (round-17
    // review) — the key-layout invariant belongs to the expression
    require(bits >= 1 && bits <= 31,
      s"graft_signlsh: bits must be in [1, 31] (packed-key layout), got $bits")
    require(tables >= 1 && tables <= Int.MaxValue,
      s"graft_signlsh: tables must be >= 1, got $tables")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
    @transient private var planeCache: Array[Double] = _
    private def planes(dims: Int): Array[Double] = {
      if (planeCache == null || planeCache.length != tables * bits * dims) {
        val rnd = new java.util.Random(seed)
        planeCache = Array.fill(tables * bits * dims)(if (rnd.nextBoolean()) 1.0 else -1.0)
      }
      planeCache
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dims = arr.numElements()
      val pl = planes(dims)
      val v = new Array[Double](dims)
      var d = 0
      while (d < dims) { v(d) = arr.getDouble(d); d += 1 }
      val out = new Array[Long](tables)
      var l = 0
      while (l < tables) {
        var bucket = 0L
        var j = 0
        while (j < bits) {
          val base = (l * bits + j) * dims
          var s = 0.0
          d = 0
          while (d < dims) { s += v(d) * pl(base + d); d += 1 }
          if (s > 0) bucket |= (1L << j)
          j += 1
        }
        out(l) = (l.toLong << 32) | bucket
        l += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Top-`nAssign` nearest-centroid list ids (by cosine, ties to the
    * lower index) for one vector — the IVF coarse-assignment kernel used
    * for bucketed embedding similarity. The centroid codebook arrives as
    * a foldable nested-array literal: IVF codebooks are model artifacts
    * of FIXED size k (trained offline, e.g. by [[graft.llm.Ann.kmeansTrain]]),
    * so shipping them inside the plan is the Spark idiom for a broadcast
    * model — the corpus itself never funnels through the driver. Keeping
    * assignment a pure projection (instead of crossJoin(broadcast(cents))
    * + window rank) also keeps BroadcastNestedLoopJoin out of the plan:
    * the downstream candidate join is a plain equi-join on list id. */
  case class IvfAssign(left: Expression, right: Expression, nAssign: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    // The codebook literal decodes once per task, not per row.
    @transient private lazy val cents: Array[Array[Double]] = {
      val arr = right.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(arr.numElements()) { i =>
        val inner = arr.getArray(i)
        Array.tabulate(inner.numElements())(inner.getDouble)
      }
    }
    @transient private lazy val cnorms: Array[Double] = cents.map { c =>
      var s = 0.0; var d = 0
      while (d < c.length) { s += c(d) * c(d); d += 1 }
      math.max(math.sqrt(s), 1e-12)
    }
    // Element accessor for the vector side (same discipline as VecDot):
    // float-packed arrays read 4-byte slots, never 8-byte garbage.
    @transient private lazy val getV: (ArrayData, Int) => Double = left.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"graft_ivf_assign expects array<float|double>, got $other")
    }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val dims = arr.numElements()
      val v = new Array[Double](dims)
      var d = 0
      while (d < dims) { v(d) = getV(arr, d); d += 1 }
      val k = cents.length
      val sims = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cv = cents(c)
        var s = 0.0
        d = 0
        while (d < dims && d < cv.length) { s += v(d) * cv(d); d += 1 }
        sims(c) = s / cnorms(c) // vector norm is a common positive factor; rank-invariant
        c += 1
      }
      val a0 = math.min(nAssign, k)
      val out = new Array[Int](a0)
      val taken = new Array[Boolean](k)
      var t = 0
      while (t < a0) { // selection pass: a is tiny (<=8), k modest
        var best = -1
        c = 0
        while (c < k) {
          if (!taken(c) && (best < 0 || sims(c) > sims(best))) best = c
          c += 1
        }
        taken(best) = true
        out(t) = best
        t += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Product-quantization encode kernel (optimization round 19): for one
    * vector, the argmin-L2 code of every subspace against a trained
    * per-subspace codebook, plus the winner's L1 reconstruction error —
    * array<struct<m, c_idx, abserr>>, m-ascending. The codebook arrives
    * COLLECTED (≤ M·K rows — a fixed-size model artifact, the same
    * bounded-collect discipline as [[IvfAssign]]'s centroid literal) and
    * pre-sliced per subspace in c_idx order, so the strict `<` in the
    * scan reproduces the old (dist asc, c_idx asc) window tie-break
    * exactly; the squared-distance and abserr accumulations run in the
    * same element order the relational zip_with/aggregate chain used, so
    * every double is bit-identical. Replaces an explode→broadcast-join→
    * row_number-window chain that shuffled corpus×M×K rows carrying two
    * 8-dim arrays each. Constructed directly (Shim.column), not
    * registered: the codebook can't round-trip through a SQL signature.
    * Subspaces with no surviving codebook entry emit no element — the
    * join semantics of the relational form. */
  case class PqEncodeCodes(child: Expression,
      cb: Array[(Int, Int, Array[Double])], numSub: Int, subDim: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(new StructType()
      .add("m", IntegerType, nullable = false)
      .add("c_idx", IntegerType, nullable = false)
      .add("abserr", DoubleType, nullable = false), containsNull = false)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
    @transient private lazy val perSub: Array[Array[(Int, Array[Double])]] =
      Array.tabulate(numSub)(m =>
        cb.iterator.filter(_._1 == m).map(t => (t._2, t._3)).toArray)
    @transient private lazy val getV: (ArrayData, Int) => Double = child.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"graft_pq_encode expects array<float|double>, got $other")
    }
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      // Bounds contract (round-20 advice): the subspace loops index up
      // to numSub*subDim-1; a shorter vector would read out of bounds
      // (silent garbage on UnsafeArrayData, AIOOBE on generic arrays)
      // where the old slice+zip_with chain had defined null-padding
      // semantics. Reject short vectors up front with a clear error.
      if (arr.numElements() < numSub * subDim)
        throw new IllegalArgumentException(
          s"graft_pq_encode: vector has ${arr.numElements()} elements, " +
            s"needs >= ${numSub * subDim} (numSub=$numSub x subDim=$subDim)")
      val out = new scala.collection.mutable.ArrayBuffer[Any](numSub)
      var m = 0
      while (m < numSub) {
        val entries = perSub(m)
        if (entries.nonEmpty) {
          var bestD = Double.MaxValue
          var bestI = -1
          var c = 0
          while (c < entries.length) {
            val csv = entries(c)._2
            var s = 0.0
            var j = 0
            while (j < subDim && j < csv.length) {
              val diff = getV(arr, m * subDim + j) - csv(j)
              s += diff * diff
              j += 1
            }
            if (s < bestD) { bestD = s; bestI = c }
            c += 1
          }
          val bcsv = entries(bestI)._2
          var ae = 0.0
          var j = 0
          while (j < subDim && j < bcsv.length) {
            ae += math.abs(getV(arr, m * subDim + j) - bcsv(j))
            j += 1
          }
          out += org.apache.spark.sql.catalyst.InternalRow(m, entries(bestI)._1, ae)
        }
        m += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** Anchor-gram extraction kernel (optimization round 19): for one
    * document, every 1-based char position p whose first codepoint is
    * ≡ 0 (mod 8) paired with xxhash64 of the k-char gram starting there
    * — array<struct<pos, h>>, position-ascending. Replicates the
    * relational chain
    *   transform(filter(sequence(1, length-  k+1),
    *             p -> ascii(substring(text,p,1)) % 8 = 0),
    *             p -> struct(p, xxhash64(substring(text,p,k))))
    * byte-for-byte: Spark's `ascii` is the first codepoint (decoded here
    * straight from the UTF-8 lead byte), `substring` slices codepoints
    * (byte offsets precomputed in one pass), and the gram hash is the
    * same [[XxHash64Function]] at the xxhash64 expression's seed 42 over
    * the identical byte range. As interpreted HOFs that chain allocates
    * a position array, a UTF8String per position for the ascii probe and
    * another per anchor for the hash — ~1 µs/element-op over ~10M
    * positions at sf0.1 (the dominant cost of the span-dedup family,
    * paid once per [[graft.llm.TextStats.withAnchors]] consumer); the
    * compiled pass is one byte scan plus one hash per anchor, zero
    * intermediate allocation. */
  case class AnchorGrams(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(new StructType()
      .add("pos", IntegerType, nullable = false)
      .add("h", LongType, nullable = false), containsNull = false)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val bytes = s.getBytes
      val nBytes = bytes.length
      // One pass: char-start byte offsets + decoded codepoints.
      val starts = new Array[Int](nBytes + 1)
      val cps = new Array[Int](nBytes)
      var nc = 0
      var b = 0
      while (b < nBytes) {
        starts(nc) = b
        val c0 = bytes(b) & 0xFF
        var w = 1
        var cp = c0
        if (c0 >= 0x80) {
          if ((c0 & 0xE0) == 0xC0) { w = 2; cp = c0 & 0x1F }
          else if ((c0 & 0xF0) == 0xE0) { w = 3; cp = c0 & 0x0F }
          else { w = 4; cp = c0 & 0x07 }
          var j = 1
          while (j < w && b + j < nBytes) { cp = (cp << 6) | (bytes(b + j) & 0x3F); j += 1 }
        }
        cps(nc) = cp
        nc += 1
        b += w
      }
      starts(nc) = nBytes
      if (nc < k) return new GenericArrayData(Array.empty[Any])
      val out = new scala.collection.mutable.ArrayBuffer[Any](nc / 8 + 1)
      var p = 0
      val last = nc - k
      while (p <= last) {
        if (cps(p) % 8 == 0) {
          val gram = org.apache.spark.unsafe.types.UTF8String
            .fromBytes(bytes, starts(p), starts(p + k) - starts(p))
          out += org.apache.spark.sql.catalyst.InternalRow(
            p + 1, XxHash64Function.hash(gram, StringType, 42L))
        }
        p += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  /** Bloom-membership probe against a driver-built filter shipped as a
    * broadcast — the prefilter of the decontamination big-eval fallback
    * (llm/TextStats.decontaminateAgainst): when the eval gram set
    * outgrows a broadcast hash relation, its ~10-bits-per-gram bloom
    * still broadcasts, the corpus stream is probed in place, and only
    * the survivors (true matches + fpp of the stream) reach the exact
    * verify join. Constructed directly (Shim.column), not registered:
    * the broadcast handle can't round-trip through a SQL signature. */
  case class BloomMightContain(child: Expression,
      bf: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "graft_bloom_might_contain"
    override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
    override protected def nullSafeEval(v: Any): Any =
      bf.value.mightContainBinary(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }

  // weak keys: a strong Set would pin every session (and its whole
  // sessionState graph) for the driver's lifetime — an unbounded leak
  // under per-job spark.newSession() patterns (round-17 review);
  // registration is idempotent, so losing an entry only re-registers
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  private def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      // extra arguments were silently IGNORED (graft_minhash(x, 128)
      // still built a 64-perm signature — round-17 review)
      if (es.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${es.length}")
      b(es)
    }

  /** Idempotently register the kernels as SQL functions in the session
    * (graft_minhash / graft_simhash64 / graft_vecdot). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!registered.containsKey(spark)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_minhash",
        arity("graft_minhash", 1) { es => MinHashSig(es.head, 64) }, "built-in")
      reg.createOrReplaceTempFunction("graft_simhash64",
        arity("graft_simhash64", 1) { es => SimHashSig64(es.head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_vecdot",
        arity("graft_vecdot", 2) { es => VecDot(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_sigmatch",
        arity("graft_sigmatch", 2) { es => SigMatchFraction(es(0), es(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_signlsh",
        arity("graft_signlsh", 3) { es =>
          def intLit(e: Expression): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"graft_signlsh: tables/bits must be int literals, got $other")
          }
          // SignLshSig reads doubles; cast up front so a raw
          // array<float> embedding column works instead of silently
          // producing garbage buckets (no-op when already double).
          val asDouble = org.apache.spark.sql.catalyst.expressions.Cast(
            es(0), ArrayType(DoubleType))
          SignLshSig(asDouble, intLit(es(1)), intLit(es(2)), seed = 7L)
        }, "built-in")
      reg.createOrReplaceTempFunction("graft_ivf_assign",
        arity("graft_ivf_assign", 3) { es =>
          val n = es(2) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"graft_ivf_assign: nAssign must be an int literal, got $other")
          }
          // the codebook decodes once per task via right.eval(null) —
          // a non-foldable (per-row) codebook would NPE inside the task
          // or silently freeze the first row's value (round-17 review)
          if (!es(1).foldable) throw new IllegalArgumentException(
            "graft_ivf_assign: the codebook must be a foldable literal " +
              "(a fixed model artifact shipped in the plan), not a per-row column")
          val asDouble = org.apache.spark.sql.catalyst.expressions.Cast(
            es(0), ArrayType(DoubleType))
          IvfAssign(asDouble, es(1), n)
        }, "built-in")
      registered.put(spark, java.lang.Boolean.TRUE)
    }
  }
}
