package graft

import graft.functions.NativeExprs
import org.apache.spark.sql.functions._

/** Unit coverage of the compiled kernel library (functions/NativeExprs)
  * — each kernel is a public library function, tested here independently
  * of the queries that use it. */
class NativeExprsSpec extends SparkSpec {

  NativeExprs.ensureRegistered(spark)

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c).collect().head.get(0)
  }

  test("graft_minhash: equal sets → equal signatures; estimator via graft_sigmatch") {
    import spark.implicits._
    val df = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("a b c", "b c d", "c d e")),
      (Seq("a b c", "b c d", "c d e"), Seq("x y z", "y z w", "z w v")))
      .toDF("s1", "s2")
      .select(call_function("graft_sigmatch",
        call_function("graft_minhash", col("s1")),
        call_function("graft_minhash", col("s2"))).as("m"))
      .collect().map(_.getDouble(0))
    assert(df(0) == 1.0)   // identical sets: all 64 minima agree
    assert(df(1) < 0.3)    // disjoint sets: agreement ≈ J = 0
  }

  test("graft_simhash64: identical token sets get identical signatures") {
    import spark.implicits._
    val sigs = Seq(Seq("alpha", "beta", "gamma"), Seq("alpha", "beta", "gamma"))
      .toDF("w").select(call_function("graft_simhash64", col("w")).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
  }

  test("graft_vecdot: float, double, and MIXED element types all read correctly") {
    val f = array(lit(1.0f), lit(2.0f), lit(3.0f))
    val d = array(lit(1.0), lit(2.0), lit(3.0))
    assert(one(call_function("graft_vecdot", f, f)) == 14.0)
    assert(one(call_function("graft_vecdot", d, d)) == 14.0)
    // mixed: per-side accessors, not left-type-wins
    assert(one(call_function("graft_vecdot", f, d)) == 14.0)
    assert(one(call_function("graft_vecdot", d, f)) == 14.0)
  }

  test("graft_signlsh: deterministic, table-prefixed, and float-input safe") {
    val d = array(lit(0.5), lit(-0.25), lit(0.125), lit(1.0))
    val f = array(lit(0.5f), lit(-0.25f), lit(0.125f), lit(1.0f))
    val a = one(call_function("graft_signlsh", d, lit(4), lit(8)))
      .asInstanceOf[scala.collection.Seq[Long]].toSeq
    val b = one(call_function("graft_signlsh", d, lit(4), lit(8)))
      .asInstanceOf[scala.collection.Seq[Long]].toSeq
    // the builder casts float arrays to double: same buckets either way
    val c = one(call_function("graft_signlsh", f, lit(4), lit(8)))
      .asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(a == b && a == c)
    assert(a.length == 4)
    // element l carries its table index in the high 32 bits
    assert(a.zipWithIndex.forall { case (v, l) => (v >> 32) == l })
  }

  test("native as-of join ignores NULL keys and NULL times (SQL ASOF semantics)") {
    import spark.implicits._
    val right = Seq(
      (Some(1L), Some(10L), 100.0),
      (Some(1L), None, 666.0),      // null time: never a match
      (None, Some(5L), 777.0))      // null key: never a match
      .toDF("user_id", "ts", "price")
    val left = Seq((Some(1L), Some(20L), 1), (None, Some(20L), 2))
      .toDF("user_id", "ts", "qty")
    val got = graft.operators.NativeAsOfJoin.asofJoinNative(
      left, right, "user_id", "ts", "price", "p")
      .select("qty", "p").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got == Set((1, 100.0))) // null-key left row emits nothing
  }

  test("format_datetime keeps Java patterns through the rewriter (no rename chaining)") {
    val sql = graft.sql.PrestoRewriter.rewrite(
      "SELECT format_datetime(TIMESTAMP '2024-03-15 13:45:30', 'yyyy-MM-dd') AS s")
    assert(sql.contains("date_format("), sql)
    assert(!sql.contains("presto_date_format"), sql)
    assert(spark.sql(sql).collect().head.getString(0) == "2024-03-15")
  }

  // Optimization round 19: the compiled anchor kernel must be
  // bit-identical to the interpreted HOF chain it replaced — same
  // positions (ascii(substring)%8 selection), same seed-42 xxhash64 over
  // the same gram bytes — including on multi-byte UTF-8, where char
  // positions and byte offsets diverge.
  test("graft AnchorGrams kernel ≡ the relational ascii/xxhash64 HOF chain") {
    import spark.implicits._
    val k = 8 // small gram for a compact fixture; the kernel is k-generic
    val rnd = new scala.util.Random(7)
    val texts = Seq(
      "phone home xylophone parade hippo 0x08",       // several %8==0 chars
      "päx höme φ xylo φφ parade 08080808 end",       // multi-byte chars
      "short",                                         // < k chars
      ("hxp08 " * 40).trim,                            // repetitive
      Seq.fill(300)(rnd.nextPrintableChar()).mkString) // random printable
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hof = df.filter(length(col("text")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(
              filter(sequence(1, length(text) - ${k - 1}),
                     p -> ascii(substring(text, p, 1)) % 8 = 0),
              p -> struct(p AS pos, xxhash64(substring(text, p, $k)) AS h))""")).as("a"))
      .select(col("doc_id"), col("a.pos"), col("a.h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val nat = df.filter(length(col("text")) >= k)
      .select(col("doc_id"), explode(org.apache.spark.sql.graft.Shim.column(
        NativeExprs.AnchorGrams(
          org.apache.spark.sql.graft.Shim.expression(col("text")), k))).as("a"))
      .select(col("doc_id"), col("a.pos"), col("a.h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(nat == hof, s"kernel diverged: only-hof=${hof -- nat} only-native=${nat -- hof}")
    assert(nat.nonEmpty) // the fixture must actually exercise anchors
  }

  // The compiled PQ encode kernel must reproduce the relational
  // explode→join→window argmin exactly: same winners (dist asc, c_idx
  // asc ties), same abserr accumulation order.
  test("graft PqEncodeCodes kernel picks the window-identical argmin codes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = Seq.tabulate(40)(i => (i.toLong, Seq.fill(16)(rnd.nextDouble())))
      .toDF("vec_id", "e")
    val cbArr = Array.tabulate(2, 4) { (m, c) =>
      (m, c, Array.fill(8)(rnd.nextDouble()))
    }.flatten
    val nat = vecs.select(col("vec_id"), explode(
        org.apache.spark.sql.graft.Shim.column(NativeExprs.PqEncodeCodes(
          org.apache.spark.sql.graft.Shim.expression(col("e")), cbArr, 2, 8))).as("b"))
      .select(col("vec_id"), col("b.m"), col("b.c_idx"), col("b.abserr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    // reference: plain Scala replication of the relational argmin
    val cvecs = vecs.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val ref = (for {
      (id, e) <- cvecs; m <- 0 until 2
    } yield {
      val sv = e.slice(m * 8, m * 8 + 8)
      val best = cbArr.filter(_._1 == m).minBy { case (_, cIdx, csv) =>
        (sv.zip(csv).map { case (x, y) => (x - y) * (x - y) }.sum, cIdx)
      }
      val ae = sv.zip(best._3).map { case (x, y) => math.abs(x - y) }.sum
      (id, m, best._2, ae)
    }).toSet
    assert(nat == ref)
  }

  test("graft PqEncodeCodes rejects short vectors with a clear error (round-20 advice)") {
    // the subspace loops index up to numSub*subDim-1; a shorter vector
    // previously read out of bounds (silent garbage on UnsafeArrayData)
    import spark.implicits._
    val cbArr = Array.tabulate(2, 2) { (m, c) =>
      (m, c, Array.fill(8)(0.5 * (c + 1)))
    }.flatten
    val short = Seq((1L, Seq.fill(10)(0.1))).toDF("vec_id", "e") // needs 16
    val e = intercept[Exception] {
      short.select(org.apache.spark.sql.graft.Shim.column(NativeExprs.PqEncodeCodes(
        org.apache.spark.sql.graft.Shim.expression(col("e")), cbArr, 2, 8))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("graft_pq_encode")), msgs(e).mkString(" | "))
  }
}
