package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oracle entries for the ML inference helpers (functions/MlFns).
  *
  * Both entries train on EXACTLY-CONSISTENT synthetic data — the label
  * is a true linear function of the features — so the least-squares
  * solution is the generating coefficients themselves (independent of
  * conditioning or float summation order, up to ~1e-12), and the DuckDB
  * twin needs no linear algebra at all: it recomputes the generating
  * closed form directly. That makes the gate end-to-end over train →
  * model bytes → score while staying hash-exact after round(…, 6). */
object Ml {

  /** learn_regressor → regress round trip: y = 2·(id%7) − 3·(id%5) + 5. */
  def mlRegress(t: Tables): DataFrame = {
    val f = call_function("features",
      (col("doc_id") % 7).cast("double"), (col("doc_id") % 5).cast("double"))
    val y = ((col("doc_id") % 7) * 2 - (col("doc_id") % 5) * 3 + 5).cast("double")
    val model = t.documents.agg(call_function("learn_regressor", y, f).as("m"))
    t.documents.crossJoin(broadcast(model))
      .select(col("doc_id"),
        round(call_function("regress", f, col("m")), 6).as("pred"))
      .orderBy(col("doc_id"))
  }
  val mlRegressSql: String =
    """SELECT doc_id,
              round(CAST((doc_id % 7) * 2 - (doc_id % 5) * 3 + 5 AS DOUBLE), 6) AS pred
       FROM documents ORDER BY doc_id"""

  /** learn_classifier → classify round trip: parity labels, an exact
    * ±1-linear target (y = 2·f1 − 1) plus an irrelevant feature the fit
    * must zero out; scores land at exactly ±1, sign-stable. */
  def mlClassify(t: Tables): DataFrame = {
    val f = call_function("features",
      (col("doc_id") % 2).cast("double"), (col("doc_id") % 11).cast("double"))
    val lbl = when(col("doc_id") % 2 === 0, "even").otherwise("odd")
    val model = t.documents.agg(call_function("learn_classifier", lbl, f).as("m"))
    t.documents.crossJoin(broadcast(model))
      .select(col("doc_id"),
        call_function("classify", f, col("m")).as("label"))
      .orderBy(col("doc_id"))
  }
  val mlClassifySql: String =
    """SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS label
       FROM documents ORDER BY doc_id"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("ml_regress", mlRegress _, mlRegressSql),
    ("ml_classify", mlClassify _, mlClassifySql))
}
