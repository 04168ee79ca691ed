package graft

import org.apache.spark.sql.functions._

/** ML inference helpers (functions/MlFns): exact least-squares recovery
  * on consistent data, classifier label-polarity invariance across row
  * and partition orders, the model-byte rejection surface, and the
  * features() constructor. */
class MlFnsSpec extends SparkSpec {

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  test("features builds the 0-indexed bigint->double map") {
    val r = spark.sql("SELECT features(1.5, -2.0, 7) AS f").head()
      .getMap[Long, Double](0)
    assert(Map(0L -> 1.5, 1L -> -2.0, 2L -> 7.0) == r)
  }

  test("learn_regressor -> regress recovers exact generating coefficients") {
    import spark.implicits._
    (0 until 200).map(i => ((i % 7).toDouble, (i % 5).toDouble))
      .toDF("x1", "x2")
      .withColumn("y", col("x1") * 2 - col("x2") * 3 + 5)
      .createOrReplaceTempView("ml_train")
    spark.sql("SELECT learn_regressor(y, features(x1, x2)) AS m FROM ml_train")
      .createOrReplaceTempView("ml_model")
    val r = spark.sql(
      """SELECT round(regress(features(0.0, 0.0), m), 9) AS b,
                round(regress(features(1.0, 0.0), m), 9) AS w1b,
                round(regress(features(0.0, 1.0), m), 9) AS w2b,
                round(regress(features(4.0, 2.0), m), 9) AS p42
         FROM ml_model""").head()
    assert(r.getDouble(0) == 5.0, "intercept")
    assert(r.getDouble(1) == 7.0, "w1 + b")
    assert(r.getDouble(2) == 2.0, "w2 + b")
    assert(r.getDouble(3) == 7.0, "2*4 - 3*2 + 5")
    // a feature index unseen at training time scores with weight 0
    val tail = spark.sql(
      "SELECT round(regress(features(0.0, 0.0, 99.0), m), 9) FROM ml_model").head()
    assert(tail.getDouble(0) == 5.0)
  }

  test("learn_classifier polarity is invariant to row and partition order") {
    import spark.implicits._
    val df = (0 until 100)
      .map(i => (if (i % 2 == 0) "even" else "odd", (i % 2).toDouble, (i % 11).toDouble))
      .toDF("lbl", "f1", "f2")
    // (a) one partition, lexicographically LARGER label first — the
    // in-partition re-sign path
    val mA = df.repartition(1).sortWithinPartitions(desc("lbl"))
      .agg(call_function("learn_classifier", col("lbl"),
        call_function("features", col("f1"), col("f2"))).as("m"))
    // (b) partitioned BY label — each partial sees one label; the merge
    // re-sign path
    val mB = df.repartition(2, col("lbl"))
      .agg(call_function("learn_classifier", col("lbl"),
        call_function("features", col("f1"), col("f2"))).as("m"))
    for (m <- Seq(mA, mB)) {
      m.createOrReplaceTempView("ml_cls")
      val r = spark.sql(
        """SELECT classify(features(0.0, 3.0), m) AS c0,
                  classify(features(1.0, 8.0), m) AS c1 FROM ml_cls""").head()
      assert(r.getString(0) == "even" && r.getString(1) == "odd")
    }
  }

  test("error surface: label cardinality, model-kind mixups, foreign bytes") {
    import spark.implicits._
    Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("lbl", "f")
      .createOrReplaceTempView("ml_three")
    val e3 = intercept[Exception] {
      spark.sql("SELECT learn_classifier(lbl, features(f)) FROM ml_three").collect()
    }
    assert(chain(e3).exists(_.contains("2 distinct labels")), chain(e3).mkString("|"))
    Seq(("even", 0.0), ("odd", 1.0)).toDF("lbl", "f")
      .createOrReplaceTempView("ml_two")
    val eKind = intercept[Exception] {
      spark.sql("""SELECT regress(features(1.0), m)
                   FROM (SELECT learn_classifier(lbl, features(f)) AS m FROM ml_two)""")
        .collect()
    }
    assert(chain(eKind).exists(_.contains("regressor model")), chain(eKind).mkString("|"))
    val eBytes = intercept[Exception] {
      spark.sql("SELECT classify(features(1.0), X'0001020304050607AA')").collect()
    }
    assert(chain(eBytes).exists(_.contains("not a graft ML model")), chain(eBytes).mkString("|"))
    val eSvm = intercept[Exception] {
      spark.sql("SELECT learn_libsvm_classifier(lbl, features(f), 'C=1') FROM ml_two")
        .collect()
    }
    assert(chain(eSvm).exists(_.contains("SMO trainer")), chain(eSvm).mkString("|"))
  }

  test("feature keys are range-checked as LONGS (no toInt aliasing)") {
    import spark.implicits._
    Seq((1.0, 1.0), (3.0, 2.0), (5.0, 3.0)).toDF("y", "x")
      .createOrReplaceTempView("ml_keys")
    spark.sql("SELECT learn_regressor(y, features(x)) AS m FROM ml_keys")
      .createOrReplaceTempView("ml_keys_model")
    // y = 2x - 1: a key past Int range must read as UNSEEN (weight 0),
    // never alias onto feature 0 via toInt wrap
    val r = spark.sql(
      """SELECT round(regress(map(CAST(4294967296 AS BIGINT), CAST(9.0 AS DOUBLE)), m), 9)
         FROM ml_keys_model""").head()
    assert(r.getDouble(0) == -1.0, "2^32 key must not alias onto feature 0")
    val eNeg = intercept[Exception] {
      spark.sql("""SELECT regress(map(CAST(-1 AS BIGINT), CAST(1.0 AS DOUBLE)), m)
                   FROM ml_keys_model""").collect()
    }
    assert(chain(eNeg).exists(_.contains("negative feature index")), chain(eNeg).mkString("|"))
    val eBig = intercept[Exception] {
      spark.sql("""SELECT learn_regressor(y, map(CAST(4294967299 AS BIGINT), x))
                   FROM ml_keys""").collect()
    }
    assert(chain(eBig).exists(_.contains("exceeds the supported maximum")),
      chain(eBig).mkString("|"))
  }

  test("the family resolves through the Presto dialect door") {
    import spark.implicits._
    Seq((0.0, 1.0), (1.0, 3.0), (2.0, 5.0)).toDF("x", "y")
      .createOrReplaceTempView("ml_line")
    val r = graft.sql.PrestoRewriter.sql(spark, sfDir,
      """SELECT round(regress(features(10.0), m), 9) AS p
         FROM (SELECT learn_regressor(y, features(x)) AS m FROM ml_line)""").head()
    assert(r.getDouble(0) == 21.0) // y = 2x + 1 exactly
  }
}
