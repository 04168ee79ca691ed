package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Presto IP-address functions (ip_prefix / ip_subnet_min / max / range /
  * is_subnet_of) over VARCHAR operands, plus the array tail Spark lacks
  * (combinations, contains_sequence). The reference executes these by
  * name through its Presto function library; Spark has no twins, so they
  * are native expressions here (CodegenFallback — none sits in a TPC-H
  * hot loop).
  *
  * IP parsing/formatting is self-contained (no InetAddress: its
  * hostname path would attempt DNS on malformed input): IPv4 dotted
  * quads, full RFC 4291 IPv6 incl. `::` compression and embedded IPv4,
  * and RFC 5952 canonical output (lowercase, longest zero-run
  * compressed, leftmost on ties); IPv4-mapped IPv6 formats as the
  * dotted quad, matching Presto's IPADDRESS rendering.
  */
object NetFns {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // ------------------------------------------------------ IP plumbing
  /** 4 bytes for IPv4, 16 for IPv6; malformed input throws
    * IllegalArgumentException (Presto's INVALID_FUNCTION_ARGUMENT). */
  def parseIp(s: String): Array[Byte] = {
    def fail(): Nothing =
      throw new IllegalArgumentException(s"invalid IP address: '$s'")
    if (s.isEmpty) fail()
    if (s.indexOf(':') < 0) {
      val parts = s.split("\\.", -1)
      if (parts.length != 4) fail()
      val out = new Array[Byte](4)
      var i = 0
      while (i < 4) {
        val p = parts(i)
        if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) fail()
        val v = p.toInt
        if (v > 255) fail()
        out(i) = v.toByte
        i += 1
      }
      out
    } else {
      // IPv6: groups split on ':', one optional '::', optional trailing
      // embedded IPv4
      val dcol = s.indexOf("::")
      if (dcol >= 0 && s.indexOf("::", dcol + 1) >= 0) fail()
      def groups(part: String): Seq[Int] = {
        if (part.isEmpty) return Nil
        val raw = part.split(":", -1)
        if (raw.exists(_.isEmpty)) fail()
        raw.toSeq.flatMap { g =>
          if (g.contains('.')) {
            val v4 = parseIp(g)
            if (v4.length != 4) fail()
            Seq(((v4(0) & 0xff) << 8) | (v4(1) & 0xff),
              ((v4(2) & 0xff) << 8) | (v4(3) & 0xff))
          } else {
            if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) fail()
            Seq(Integer.parseInt(g, 16))
          }
        }
      }
      val gs: Seq[Int] =
        if (dcol < 0) groups(s)
        else {
          val head = groups(s.substring(0, dcol))
          val tail = groups(s.substring(dcol + 2))
          if (head.length + tail.length > 7) fail()
          head ++ Seq.fill(8 - head.length - tail.length)(0) ++ tail
        }
      if (gs.length != 8) fail()
      val out = new Array[Byte](16)
      gs.indices.foreach { i =>
        out(2 * i) = ((gs(i) >> 8) & 0xff).toByte
        out(2 * i + 1) = (gs(i) & 0xff).toByte
      }
      out
    }
  }

  private def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 && b.take(10).forall(_ == 0) &&
      b(10) == -1.toByte && b(11) == -1.toByte

  /** RFC 5952 canonical text (IPv4 stays dotted; IPv4-mapped IPv6
    * renders as its dotted quad, Presto's IPADDRESS behavior). */
  def formatIp(b: Array[Byte]): String =
    if (b.length == 4) b.map(_ & 0xff).mkString(".")
    else if (isV4Mapped(b)) b.drop(12).map(_ & 0xff).mkString(".")
    else {
      val gs = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
      // longest run of >= 2 zero groups, leftmost wins ties
      var bestStart = -1; var bestLen = 0
      var i = 0
      while (i < 8) {
        if (gs(i) == 0) {
          var j = i
          while (j < 8 && gs(j) == 0) j += 1
          if (j - i > bestLen) { bestStart = i; bestLen = j - i }
          i = j
        } else i += 1
      }
      if (bestLen < 2) gs.map(Integer.toHexString).mkString(":")
      else {
        val head = gs.take(bestStart).map(Integer.toHexString).mkString(":")
        val tail = gs.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
        head + "::" + tail
      }
    }

  /** Zero the host bits below `bits`. */
  def maskBits(b: Array[Byte], bits: Int): Array[Byte] = {
    val max = b.length * 8
    if (bits < 0 || bits > max) throw new IllegalArgumentException(
      s"prefix length $bits is out of range [0, $max]")
    val out = b.clone()
    var i = 0
    while (i < out.length) {
      val keep = math.min(8, math.max(0, bits - i * 8))
      out(i) = (out(i) & (0xff << (8 - keep))).toByte
      i += 1
    }
    out
  }
  /** Set the host bits below `bits` (subnet max / broadcast). */
  def orHostBits(b: Array[Byte], bits: Int): Array[Byte] = {
    val out = b.clone()
    var i = 0
    while (i < out.length) {
      val keep = math.min(8, math.max(0, bits - i * 8))
      out(i) = (out(i) | (0xff >> keep)).toByte
      i += 1
    }
    out
  }

  /** Parse 'addr/bits', canonicalizing by zeroing host bits (the
    * IPPREFIX cast behavior). */
  def parsePrefix(s: String): (Array[Byte], Int) = {
    val slash = s.lastIndexOf('/')
    if (slash < 0) throw new IllegalArgumentException(
      s"invalid IP prefix (expected addr/bits): '$s'")
    val bitsStr = s.substring(slash + 1)
    if (bitsStr.isEmpty || !bitsStr.forall(_.isDigit))
      throw new IllegalArgumentException(s"invalid IP prefix bits: '$s'")
    val addr = parseIp(s.substring(0, slash))
    val bits = bitsStr.toInt
    (maskBits(addr, bits), bits)
  }

  // --------------------------------------------------- the expression
  /** One IP-function expression; `fn` picks the kernel. String in,
    * string/boolean/array out; NULL in → NULL out; malformed → error
    * (wrap in TRY for Presto's NULL-on-error form). */
  case class IpFn(fn: String, children: Seq[Expression])
      extends Expression with CodegenFallback {
    override def nullable: Boolean = true
    override def prettyName: String = fn
    override def dataType: DataType = fn match {
      case "is_subnet_of" => BooleanType
      case "ip_subnet_range" => ArrayType(StringType, containsNull = false)
      case _ => StringType
    }
    private val arity = fn match {
      case "ip_prefix" | "is_subnet_of" => 2
      case _ => 1
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.length != arity)
        TypeCheckResult.TypeCheckFailure(s"$fn takes $arity argument(s)")
      else if (fn == "ip_prefix" && !isIntegral(children(1).dataType))
        TypeCheckResult.TypeCheckFailure(s"$fn: prefix bits must be integral")
      else if (!children.zipWithIndex.forall { case (c, i) =>
        (fn == "ip_prefix" && i == 1) || c.dataType == StringType })
        TypeCheckResult.TypeCheckFailure(s"$fn expects string addresses")
      else TypeCheckResult.TypeCheckSuccess
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val vs = children.map(_.eval(input))
      if (vs.contains(null)) return null
      def str(i: Int) = vs(i).asInstanceOf[UTF8String].toString
      fn match {
        case "ip_prefix" =>
          val bits = vs(1) match {
            case n: java.lang.Number => n.intValue()
          }
          val masked = maskBits(parseIp(str(0)), bits)
          UTF8String.fromString(formatIp(masked) + "/" + bits)
        case "ip_subnet_min" =>
          val (addr, _) = parsePrefix(str(0))
          UTF8String.fromString(formatIp(addr))
        case "ip_subnet_max" =>
          val (addr, bits) = parsePrefix(str(0))
          UTF8String.fromString(formatIp(orHostBits(addr, bits)))
        case "ip_subnet_range" =>
          val (addr, bits) = parsePrefix(str(0))
          new GenericArrayData(Array[Any](
            UTF8String.fromString(formatIp(addr)),
            UTF8String.fromString(formatIp(orHostBits(addr, bits)))))
        case "is_subnet_of" =>
          val (net, bits) = parsePrefix(str(0))
          val other = str(1)
          val (oAddr, oBits) =
            if (other.contains('/')) parsePrefix(other)
            else (parseIp(other), -1)
          // a contained PREFIX must be at least as specific; an ADDRESS
          // just masks into the net. Family mismatch is an error in
          // Presto (cannot compare v4 with v6).
          if (net.length != oAddr.length) throw new IllegalArgumentException(
            "is_subnet_of: both arguments must be the same IP family")
          if (oBits >= 0 && oBits < bits) false
          else java.util.Arrays.equals(maskBits(oAddr, bits), net)
      }
    }
  }

  // ------------------------------------------------------ combinations
  /** Presto combinations(array, n): all n-element subsequences in
    * lexicographic index order; n is capped at 5 (Presto's own cap —
    * the result is combinatorial). */
  case class Combinations(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def prettyName: String = "combinations"
    override def dataType: DataType =
      ArrayType(left.dataType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case _: ArrayType if isIntegral(right.dataType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "combinations expects (array, integer)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def nullSafeEval(arrV: Any, nV: Any): Any = {
      val elemType = left.dataType.asInstanceOf[ArrayType].elementType
      val arr = arrV.asInstanceOf[ArrayData].toObjectArray(elemType)
      val n = nV.asInstanceOf[java.lang.Number].intValue()
      if (n < 0 || n > 5) throw new IllegalArgumentException(
        s"combinations: n must be in [0, 5], got $n")
      if (n > arr.length) return new GenericArrayData(Array.empty[Any])
      val out = Vector.newBuilder[Any]
      val idx = Array.tabulate(n)(identity)
      var done = n == 0
      if (n == 0) out += new GenericArrayData(Array.empty[Any])
      while (!done) {
        out += new GenericArrayData(idx.map(arr))
        // advance the rightmost index that can move
        var k = n - 1
        while (k >= 0 && idx(k) == arr.length - n + k) k -= 1
        if (k < 0) done = true
        else {
          idx(k) += 1
          var j = k + 1
          while (j < n) { idx(j) = idx(j - 1) + 1; j += 1 }
        }
      }
      new GenericArrayData(out.result().toArray)
    }
  }

  // -------------------------------------------------- contains_sequence
  /** Presto contains_sequence(x, seq): true when seq is a CONTIGUOUS
    * subsequence of x (an empty seq is contained in anything). */
  case class ContainsSequence(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def prettyName: String = "contains_sequence"
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        // a bare ARRAY[] literal types as array<void> — compatible
        case (ArrayType(a, _), ArrayType(b, _))
            if DataType.equalsStructurally(a, b, ignoreNullability = true) ||
              a == NullType || b == NullType =>
          if (a == NullType) TypeCheckResult.TypeCheckSuccess
          else TypeUtils.checkForOrderingExpr(a, prettyName)
        case _ => TypeCheckResult.TypeCheckFailure(
          "contains_sequence expects two arrays of the same element type")
      }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    @transient private lazy val ordering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(
        left.dataType.asInstanceOf[ArrayType].elementType)
    override def nullSafeEval(xV: Any, seqV: Any): Any = {
      val elemType = left.dataType.asInstanceOf[ArrayType].elementType
      val x = xV.asInstanceOf[ArrayData].toObjectArray(elemType)
      val s = seqV.asInstanceOf[ArrayData].toObjectArray(elemType)
      if (s.isEmpty) return true
      def eq(a: Any, b: Any): Boolean =
        if (a == null || b == null) a == null && b == null
        else ordering.equiv(a, b)
      var i = 0
      while (i + s.length <= x.length) {
        var j = 0
        while (j < s.length && eq(x(i + j), s(j))) j += 1
        if (j == s.length) return true
        i += 1
      }
      false
    }
  }

  // ------------------------------------------------------------ builders
  private def asInt(e: Expression): Expression =
    if (isIntegral(e.dataType)) e else Cast(e, IntegerType)
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ip_prefix" -> { es: Seq[Expression] => IpFn("ip_prefix", Seq(es(0), asInt(es(1)))) },
    "ip_subnet_min" -> { es: Seq[Expression] => IpFn("ip_subnet_min", es) },
    "ip_subnet_max" -> { es: Seq[Expression] => IpFn("ip_subnet_max", es) },
    "ip_subnet_range" -> { es: Seq[Expression] => IpFn("ip_subnet_range", es) },
    "is_subnet_of" -> { es: Seq[Expression] => IpFn("is_subnet_of", es) },
    "combinations" -> { es: Seq[Expression] => Combinations(es(0), es(1)) },
    "contains_sequence" -> { es: Seq[Expression] => ContainsSequence(es(0), es(1)) })
}
