package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto's ML inference helpers (`features`, `learn_regressor`,
  * `learn_classifier`, `regress`, `classify`) — the last Velox-library
  * family the reference pulls in nominally
  * (`axiom/optimizer/tests/AxiomSql.cpp:58-59`) that this engine
  * previously left unregistered.
  *
  * DOCUMENTED DIVERGENCE (the sketch-interchange stance applied to
  * models): Presto trains via libsvm (SMO, iterative, seeded); this
  * module trains the exact LEAST-SQUARES linear model instead — the
  * aggregation-friendly formulation whose state is the Gram matrix
  * Σ x·xᵀ and moment vector Σ x·y, which sum across partitions with no
  * iteration, no ordering sensitivity beyond float associativity, and
  * constant-size partials (the property a 100 TB groupBy needs; an SMO
  * loop is not expressible as a distributed aggregate without giving up
  * exactness). classify() scores the linear model and returns the
  * argmax label. Model bytes are graft-format ("GRML"), not libsvm
  * text: a Presto-trained model is rejected with an error naming the
  * divergence, never silently mis-scored.
  *
  * Features are Presto's `map(bigint, double)`; `features(a, b, …)`
  * builds the 0-indexed dense map. Feature indices are capped at
  * [[MlFns.MaxDim]] — a named error, not a silent truncation. The
  * intercept is always fitted (libsvm's bias term).
  */
object MlFns {

  val MaxDim = 256
  private val Magic = 0x47524d4c // "GRML"
  private val KindRegressor = 1
  private val KindClassifier = 2

  /** Dense symmetric normal-equation state over (d features + intercept):
    * gram = Σ x̃ x̃ᵀ (x̃ = features with a trailing 1), mom = Σ x̃·y.
    * Grows lazily to the max seen feature index; merge is matrix sum. */
  final class LsqState {
    var d: Int = 0 // feature count (excl. intercept)
    var gram: Array[Double] = Array.empty // (d+1)*(d+1) row-major
    var mom: Array[Double] = Array.empty // d+1
    var n: Long = 0
    // classifier label bookkeeping (unused by the regressor)
    var labels: Array[String] = Array.empty // sorted, at most 2

    private def grow(newD: Int): Unit = {
      if (newD > MaxDim) throw new IllegalArgumentException(
        s"learn_*: feature index ${newD - 1} exceeds the supported maximum ${MaxDim - 1}")
      if (newD <= d && gram.nonEmpty) return
      val nd = math.max(newD, d)
      val ng = new Array[Double]((nd + 1) * (nd + 1))
      val nm = new Array[Double](nd + 1)
      if (gram.nonEmpty) {
        // old layout is (d+1)x(d+1) with intercept LAST; re-place
        var i = 0
        while (i <= d) {
          val oi = if (i == d) nd else i
          var j = 0
          while (j <= d) {
            val oj = if (j == d) nd else j
            ng(oi * (nd + 1) + oj) = gram(i * (d + 1) + j)
            j += 1
          }
          nm(oi) = mom(i)
          i += 1
        }
      }
      d = nd; gram = ng; mom = nm
    }

    def add(features: MapData, y: Double): Unit = {
      val ks = features.keyArray()
      val vs = features.valueArray()
      val m = features.numElements()
      var maxK = -1L
      var i = 0
      while (i < m) {
        val k = ks.getLong(i)
        if (k < 0) throw new IllegalArgumentException(
          s"learn_*: negative feature index $k")
        // Long-range check BEFORE any toInt: a key past Int range would
        // wrap and silently credit the update to the wrong feature
        if (k >= MaxDim) throw new IllegalArgumentException(
          s"learn_*: feature index $k exceeds the supported maximum ${MaxDim - 1}")
        if (k > maxK) maxK = k
        i += 1
      }
      grow(math.max(d, maxK.toInt + 1))
      val w = d + 1
      // sparse update of the dense gram: x̃ has entries at the map's
      // keys plus the intercept slot d
      val idx = new Array[Int](m + 1)
      val xv = new Array[Double](m + 1)
      i = 0
      while (i < m) { idx(i) = ks.getLong(i).toInt; xv(i) = vs.getDouble(i); i += 1 }
      idx(m) = d; xv(m) = 1.0
      i = 0
      while (i <= m) {
        var j = 0
        while (j <= m) {
          gram(idx(i) * w + idx(j)) += xv(i) * xv(j)
          j += 1
        }
        mom(idx(i)) += xv(i) * y
        i += 1
      }
      n += 1
    }

    private def flipMom(): Unit = {
      var i = 0
      while (i < mom.length) { mom(i) = -mom(i); i += 1 }
    }

    /** Register a label and return its ±1 encoding (lexicographically
      * smaller ⇒ −1). A buffer that met the GLOBALLY larger label first
      * encoded it −1; the moment the smaller one arrives, every prior
      * row's sign was wrong — y ∈ {±1} means flipping mom re-signs them
      * EXACTLY (y touches only mom, never gram). */
    def addLabel(l: String): Double = {
      if (!labels.contains(l)) {
        if (labels.length >= 2) throw new IllegalArgumentException(
          s"learn_classifier supports exactly 2 distinct labels; got a third: '$l' " +
          s"(have ${labels.mkString(", ")})")
        val hadSingle = labels.length == 1
        val prev = if (hadSingle) labels(0) else null
        labels = (labels :+ l).sorted
        if (hadSingle && prev == labels(1)) flipMom()
      }
      if (labels.length == 1 || l == labels(0)) -1.0 else 1.0
    }

    def mergeIn(o: LsqState): Unit = {
      val selfSingle = labels.length == 1
      val selfLabel = if (selfSingle) labels(0) else null
      o.labels.foreach { l =>
        if (!labels.contains(l)) {
          if (labels.length >= 2) throw new IllegalArgumentException(
            s"learn_classifier supports exactly 2 distinct labels; merge saw '$l'")
          labels = (labels :+ l).sorted
        }
      }
      // Re-sign single-label sides whose label is the GLOBAL +1 (each
      // side encoded its lone label as −1); exact because y ∈ {±1}
      // touches only mom
      if (selfSingle && labels.length == 2 && selfLabel == labels(1)) flipMom()
      if (o.labels.length == 1 && labels.length == 2 && o.labels(0) == labels(1)) {
        var i = 0
        while (i < o.mom.length) { o.mom(i) = -o.mom(i); i += 1 }
      }
      grow(o.d)
      if (o.gram.nonEmpty) {
        val w = d + 1
        var i = 0
        while (i <= o.d) {
          val oi = if (i == o.d) d else i
          var j = 0
          while (j <= o.d) {
            val oj = if (j == o.d) d else j
            gram(oi * w + oj) += o.gram(i * (o.d + 1) + j)
            j += 1
          }
          mom(oi) += o.mom(i)
          i += 1
        }
      }
      n += o.n
    }

    /** Solve (gram) w = mom by Gaussian elimination with partial
      * pivoting; near-singular systems get a tiny ridge (documented —
      * exact-consistent training data never needs it). */
    def solve(): Array[Double] = {
      val w = d + 1
      val a = gram.clone()
      val b = mom.clone()
      def eliminate(): Option[Array[Double]] = {
        var col = 0
        while (col < w) {
          var p = col
          var i = col + 1
          while (i < w) { if (math.abs(a(i * w + col)) > math.abs(a(p * w + col))) p = i; i += 1 }
          if (math.abs(a(p * w + col)) < 1e-12 * math.max(1.0, n.toDouble)) return None
          if (p != col) {
            var j = 0
            while (j < w) {
              val t = a(p * w + j); a(p * w + j) = a(col * w + j); a(col * w + j) = t
              j += 1
            }
            val t = b(p); b(p) = b(col); b(col) = t
          }
          i = col + 1
          while (i < w) {
            val f = a(i * w + col) / a(col * w + col)
            if (f != 0.0) {
              var j = col
              while (j < w) { a(i * w + j) -= f * a(col * w + j); j += 1 }
              b(i) -= f * b(col)
            }
            i += 1
          }
          col += 1
        }
        val x = new Array[Double](w)
        var i = w - 1
        while (i >= 0) {
          var s = b(i)
          var j = i + 1
          while (j < w) { s -= a(i * w + j) * x(j); j += 1 }
          x(i) = s / a(i * w + i)
          i -= 1
        }
        Some(x)
      }
      eliminate().getOrElse {
        // ridge re-solve on the ORIGINAL matrix
        System.arraycopy(gram, 0, a, 0, a.length)
        System.arraycopy(mom, 0, b, 0, b.length)
        var tr = 0.0
        var i = 0
        while (i < w) { tr += gram(i * w + i); i += 1 }
        val lambda = math.max(1e-9 * tr / w, 1e-12)
        i = 0
        while (i < w) { a(i * w + i) += lambda; i += 1 }
        eliminate().getOrElse(throw new IllegalStateException(
          "learn_*: normal equations singular even under ridge"))
      }
    }
  }

  // ------------------------------------------------------ model codec
  private[functions] def encodeModel(kind: Int, weights: Array[Double],
                                     labels: Array[String]): Array[Byte] = {
    val lbytes = labels.map(_.getBytes("UTF-8"))
    val size = 4 + 1 + 4 + weights.length * 8 + 1 + lbytes.map(_.length + 4).sum
    val bb = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).put(kind.toByte).putInt(weights.length)
    weights.foreach(bb.putDouble)
    bb.put(lbytes.length.toByte)
    lbytes.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  private[functions] def decodeModel(bytes: Array[Byte]): (Int, Array[Double], Array[String]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bytes.length < 9 || bb.getInt() != Magic) throw new IllegalArgumentException(
      "not a graft ML model: this engine trains exact least-squares linear models " +
      "(GRML bytes); libsvm-format Presto models are a documented divergence and " +
      "cannot be scored here")
    val kind = bb.get().toInt
    val nw = bb.getInt()
    val ws = Array.fill(nw)(bb.getDouble())
    val nl = bb.get().toInt
    val ls = Array.fill(nl) {
      val len = bb.getInt(); val a = new Array[Byte](len); bb.get(a)
      new String(a, "UTF-8")
    }
    (kind, ws, ls)
  }

  private def score(weights: Array[Double], features: MapData): Double = {
    val d = weights.length - 1
    var s = weights(d) // intercept
    val ks = features.keyArray(); val vs = features.valueArray()
    var i = 0
    while (i < features.numElements()) {
      val k = ks.getLong(i) // range-checked as a LONG — toInt would alias
      if (k < 0) throw new IllegalArgumentException(
        s"regress/classify: negative feature index $k")
      if (k < d) s += weights(k.toInt) * vs.getDouble(i)
      // features unseen at training time carry weight 0 (libsvm behavior)
      i += 1
    }
    s
  }

  // ------------------------------------------------------- expressions
  private val FeatMapType = MapType(LongType, DoubleType, valueContainsNull = false)

  /** features(d1, d2, …) → map(bigint,double) with keys 0..n−1. */
  case class Features(children: Seq[Expression]) extends Expression with CodegenFallback {
    override def dataType: DataType = FeatMapType
    override def nullable: Boolean = children.exists(_.nullable)
    override def prettyName: String = "features"
    override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
      copy(children = cs)
    override def eval(input: InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      new ArrayBasedMapData(
        new GenericArrayData(vs.indices.map(_.toLong).toArray),
        new GenericArrayData(vs.map(_.asInstanceOf[Double]).toArray))
    }
  }

  sealed abstract class LearnBase extends TypedImperativeAggregate[LsqState]
      with BinaryLike[Expression] {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def createAggregationBuffer(): LsqState = new LsqState
    override def merge(buf: LsqState, other: LsqState): LsqState = { buf.mergeIn(other); buf }
    override def serialize(buf: LsqState): Array[Byte] = {
      val w = buf.d + 1
      val lbytes = buf.labels.map(_.getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.allocate(
          4 + 8 + buf.gram.length * 8 + w * 8 + 1 + lbytes.map(_.length + 4).sum)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(buf.d).putLong(buf.n)
      buf.gram.foreach(bb.putDouble)
      var i = 0
      while (i < w && buf.mom.nonEmpty) { bb.putDouble(buf.mom(i)); i += 1 }
      bb.put(lbytes.length.toByte)
      lbytes.foreach { b => bb.putInt(b.length); bb.put(b) }
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): LsqState = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val s = new LsqState
      s.d = bb.getInt(); s.n = bb.getLong()
      val w = s.d + 1
      if (s.n > 0 || s.d > 0) {
        s.gram = Array.fill(w * w)(bb.getDouble())
        s.mom = Array.fill(w)(bb.getDouble())
      }
      val nl = bb.get().toInt
      s.labels = Array.fill(nl) {
        val len = bb.getInt(); val a = new Array[Byte](len); bb.get(a)
        new String(a, "UTF-8")
      }
      s
    }
  }

  /** learn_regressor(label double, features map) → varbinary model. */
  case class LearnRegressor(left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends LearnBase {
    override def prettyName: String = "learn_regressor"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override def update(buf: LsqState, input: InternalRow): LsqState = {
      val y = left.eval(input); val f = right.eval(input)
      if (y != null && f != null) buf.add(f.asInstanceOf[MapData], y.asInstanceOf[Double])
      buf
    }
    override def eval(buf: LsqState): Any =
      if (buf.n == 0) null else encodeModel(KindRegressor, buf.solve(), Array.empty)
  }

  /** learn_classifier(label varchar, features map) → varbinary model
    * (2-class linear; smaller label scores negative). */
  case class LearnClassifier(left: Expression, right: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends LearnBase {
    override def prettyName: String = "learn_classifier"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override def update(buf: LsqState, input: InternalRow): LsqState = {
      val l = left.eval(input); val f = right.eval(input)
      if (l != null && f != null) {
        val y = buf.addLabel(l.asInstanceOf[UTF8String].toString)
        buf.add(f.asInstanceOf[MapData], y)
      }
      buf
    }
    override def eval(buf: LsqState): Any =
      if (buf.n == 0) null
      else if (buf.labels.length < 2) throw new IllegalArgumentException(
        s"learn_classifier needs 2 distinct labels, saw ${buf.labels.mkString(", ")}")
      else encodeModel(KindClassifier, buf.solve(), buf.labels)
  }

  /** regress(features, model) → double. */
  case class Regress(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "regress"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override protected def nullSafeEval(f: Any, m: Any): Any = {
      val (kind, ws, _) = decodeModel(m.asInstanceOf[Array[Byte]])
      if (kind != KindRegressor) throw new IllegalArgumentException(
        "regress() needs a regressor model (got a classifier); use classify()")
      score(ws, f.asInstanceOf[MapData])
    }
  }

  /** classify(features, model) → varchar. */
  case class Classify(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def prettyName: String = "classify"
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override protected def nullSafeEval(f: Any, m: Any): Any = {
      val (kind, ws, labels) = decodeModel(m.asInstanceOf[Array[Byte]])
      if (kind != KindClassifier) throw new IllegalArgumentException(
        "classify() needs a classifier model (got a regressor); use regress()")
      val s = score(ws, f.asInstanceOf[MapData])
      UTF8String.fromString(if (s < 0) labels(0) else labels(1))
    }
  }

  private def asDoubleAll(es: Seq[Expression]): Seq[Expression] =
    es.map(e => org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType))

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "features" -> { es =>
      require(es.nonEmpty, "features() needs at least one argument")
      Features(asDoubleAll(es))
    },
    "learn_regressor" -> { es =>
      require(es.length == 2, s"learn_regressor expects (label, features), got ${es.length}")
      LearnRegressor(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), DoubleType),
        es(1)).toAggregateExpression()
    },
    "learn_classifier" -> { es =>
      require(es.length == 2, s"learn_classifier expects (label, features), got ${es.length}")
      LearnClassifier(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), StringType),
        es(1)).toAggregateExpression()
    },
    "regress" -> { es =>
      require(es.length == 2, s"regress expects (features, model), got ${es.length}")
      Regress(es(0), es(1))
    },
    // The libsvm-parameterized spellings take an options string
    // (kernel type, C, epsilon) that only an SMO trainer can honor —
    // a named rejection pointing at the exact trainer beats silently
    // ignoring the parameters the caller asked for.
    "learn_libsvm_regressor" -> { _ =>
      throw new UnsupportedOperationException(
        "learn_libsvm_regressor is not supported: this engine trains exact " +
        "least-squares linear models (learn_regressor); libsvm kernel/C/epsilon " +
        "parameters need an SMO trainer, which is not expressible as an exact " +
        "distributed aggregate")
    },
    "learn_libsvm_classifier" -> { _ =>
      throw new UnsupportedOperationException(
        "learn_libsvm_classifier is not supported: this engine trains exact " +
        "least-squares linear models (learn_classifier); libsvm kernel/C/epsilon " +
        "parameters need an SMO trainer, which is not expressible as an exact " +
        "distributed aggregate")
    },
    "classify" -> { es =>
      require(es.length == 2, s"classify expects (features, model), got ${es.length}")
      Classify(es(0), es(1))
    })
}
