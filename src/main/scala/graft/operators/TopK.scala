package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k as a CUSTOM TYPED AGGREGATOR — the Aggregator escape
  * hatch of the custom-operator ladder (SURVEY §2.5: "Aggregator[IN,
  * BUF,OUT] for gaps").
  *
  * The window formulation (`row_number().over(partitionBy(key).orderBy(
  * ord)) <= k`) must shuffle and sort EVERY row of every key group. An
  * aggregator holds a bounded k-buffer instead, and Spark's automatic
  * partial aggregation applies it map-side: each input partition sends
  * at most k rows per key into the shuffle — at 100 TB with small k this
  * is orders of magnitude less shuffle volume, the same asymmetry as
  * distributed top-k ORDER BY+LIMIT (reference ToVelox.cpp:633 partial
  * sort + merging gather), generalized to per-key.
  */
object TopK {

  /** Bounded top-k buffer of (score, payload), largest scores kept;
    * deterministic tie-break on payload. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def truncate(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (score, id) => (-score, id) }.take(k)
    override def zero: Seq[(Double, Long)] = Seq.empty
    override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      truncate(b :+ a)
    override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      truncate(b1 ++ b2)
    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }

  /** df must carry (key: Long, score: Double, id: Long) columns named by
    * the params; returns (key, id, score, rk) — the per-key top-k by
    * descending score. */
  def perKey(df: DataFrame, key: String, score: String, id: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val agg = udaf(new TopKAgg(k))
    df.groupBy(col(key))
      .agg(agg(col(score), col(id)).as("topk"))
      .select(col(key), posexplode(col("topk")))
      .select(col(key), (col("pos") + 1).as("rk"),
        col("col._2").as(id), col("col._1").as(score))
  }
}
