package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Expression-semantics checks against an independent Scala model —
  * the reference spells out exact Kleene/null behavior for its special
  * forms (Expr.h:212-378); these tests pin the same behavior in Spark.
  */
class NullSemanticsSpec extends SparkSpec {

  private val tri = Seq(Some(true), Some(false), None)

  /** All 9 boolean pairs evaluated through Spark expressions vs the
    * Kleene truth tables (Expr.h:227-231). */
  test("AND/OR follow Kleene 3-valued logic for all 9 input pairs") {
    val schema = StructType(Seq(
      StructField("a", BooleanType, nullable = true),
      StructField("b", BooleanType, nullable = true)))
    val rows = for (a <- tri; b <- tri) yield Row(a.orNull, b.orNull)
    val df = spark.createDataFrame(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val got = df.select(col("a"), col("b"),
      (col("a") && col("b")).as("and"), (col("a") || col("b")).as("or"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    def kAnd(a: Option[Any], b: Option[Any]): Option[Any] = (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    def kOr(a: Option[Any], b: Option[Any]): Option[Any] = (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    got.foreach { case (a, b, and, or) =>
      assert(and == kAnd(a, b), s"AND($a, $b)")
      assert(or == kOr(a, b), s"OR($a, $b)")
    }
  }

  test("CASE/COALESCE/NULLIF/IF null behavior matches the model") {
    val schema = StructType(Seq(StructField("x", IntegerType, nullable = true)))
    val rows = Seq(Row(1), Row(2), Row(null))
    val df = spark.createDataFrame(java.util.List.copyOf(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val got = df.select(
      col("x"),
      when(col("x") > 1, "big").when(col("x") <= 1, "small").otherwise("null").as("c"),
      coalesce(col("x"), lit(-1)).as("co"),
      nullif(col("x"), lit(2)).as("nf")).collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getInt(2), Option(r.get(3)))).toSet
    assert(got == Set(
      (Some(1), "small", 1, Some(1)),
      (Some(2), "big", 2, None),     // NULLIF(2,2) → null
      (None, "null", -1, None)))     // CASE on null predicate → otherwise
  }

  test("try_cast returns null on failure only (TRY_CAST semantics, Expr.h:276-290)") {
    val df = spark.sql(
      "SELECT try_cast('12' AS INT) AS ok, try_cast('x1' AS INT) AS bad, try_cast(NULL AS INT) AS nul")
    val r = df.collect().head
    assert(r.getInt(0) == 12 && r.isNullAt(1) && r.isNullAt(2))
  }

  /** Pins the documented divergence from the reference's error-tolerant
    * AND/OR (Expr.h:227-231: "Returns false if at least one input
    * evaluates to false even if some inputs ... throw", EITHER side):
    * Spark short-circuits left-to-right only, so `false AND error` is
    * false but `error AND false` throws under ANSI. */
  test("AND short-circuit is left-to-right (documented reference divergence)") {
    val safe = spark.sql("SELECT false AND (1/0 > 1) AS v").collect().head
    assert(!safe.getBoolean(0))
    intercept[Exception] {
      spark.sql("SELECT (1/0 > 1) AND false AS v").collect()
    }
  }

  /** HOF semantics vs a Scala reference model over generated arrays. */
  test("transform/filter/aggregate HOFs match Scala model (property)") {
    val prop = Prop.forAllNoShrink(Gen.listOfN(40, Gen.listOf(Gen.chooseNum(-50, 50)))) { arrays =>
      val schema = StructType(Seq(StructField("a", ArrayType(IntegerType, containsNull = false))))
      val rows = arrays.map(a => Row(a))
      val df = spark.createDataFrame(java.util.List.copyOf(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      val got = df.select(
        transform(col("a"), x => x * 2).as("t"),
        filter(col("a"), x => x > 0).as("f"),
        aggregate(col("a"), lit(0), (acc, x) => acc + x).as("s")).collect()
      got.zip(arrays).forall { case (r, a) =>
        r.getSeq[Int](0) == a.map(_ * 2) &&
          r.getSeq[Int](1) == a.filter(_ > 0) &&
          r.getInt(2) == a.sum
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
