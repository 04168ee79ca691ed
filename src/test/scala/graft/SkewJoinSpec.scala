package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val li = tables.lineitem
    val pt = tables.part
    val plain = li.join(pt, li("l_partkey") === pt("p_partkey"))
      .select("l_orderkey", "l_partkey", "p_name")
    val salted = SkewJoin.saltedJoin(li, li("l_partkey"), pt, pt("p_partkey"), salt = 8)
      .select("l_orderkey", "l_partkey", "p_name")
    val a = plain.collect().map(_.mkString("|")).groupBy(identity).view.mapValues(_.length).toMap
    val b = salted.collect().map(_.mkString("|")).groupBy(identity).view.mapValues(_.length).toMap
    assert(a == b)
  }

  test("salting spreads a hot key across partitions") {
    import spark.implicits._
    // one key carries 90% of rows
    val hot = (1 to 9000).map(_ => (1L, "x")) ++ (1 to 1000).map(i => (i.toLong + 1, "y"))
    val probe = hot.toDF("k", "v")
    val build = (1L to 1001L).map(k => (k, s"b$k")).toDF("bk", "bv")
    val joined = SkewJoin.saltedJoin(probe, probe("k"), build, build("bk"), salt = 8)
    assert(joined.count() == 10000)
    // the hot key's rows land in >1 salt bucket
    val buckets = probe.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(8)).cast("int"))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(buckets > 1, s"hot key stayed in $buckets bucket(s)")
  }
}
