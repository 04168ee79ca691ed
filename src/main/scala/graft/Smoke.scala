package graft

/** Replicates the driver's t1 smoke: SparkEntry.entry must return >0 rows
  * on sf0.001. Exit code 0 iff non-empty. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.get()
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
