package graft.tools
import graft.Sessions
object ProbeQuant {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[2]", "probe-quant").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq(
      "SELECT 1 AS x WHERE 3 > ANY (SELECT 2)",
      "SELECT 1 AS x WHERE 3 > ALL (SELECT 2)",
      "SELECT 1 AS x WHERE 3 > SOME (SELECT 2)")) {
      try { println(s"OK  : $q -> " + spark.sql(q).collect().mkString) }
      catch { case e: Exception => println(s"FAIL: $q -> ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
