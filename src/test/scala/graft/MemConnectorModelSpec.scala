package graft

import scala.collection.mutable

/** Model-based random-operation differential for the graft-mem
  * connector (round 19 hardening): drive a random but fixed-seed
  * sequence of INSERT / DELETE / UPDATE / TRUNCATE / MERGE statements
  * through the DSv2 row-level-operation machinery, mirror every
  * operation in a trivial in-memory model (a Map), and after EVERY
  * statement assert table == model. Each statement also snapshots the
  * model, and the epilogue replays ALL `VERSION AS OF v` reads against
  * the recorded model states — pinning snapshot numbering, snapshot
  * immutability, and row-level-op correctness under arbitrary
  * interleavings that no hand-written fixture enumerates. Two seeds ×
  * 40 operations.
  *
  * Reference analogue: the connector metadata commit contract
  * (ConnectorMetadata.h:569-627) exercised as a state machine rather
  * than per-operation fixtures. */
class MemConnectorModelSpec extends SparkSpec {

  private val T = "graft_mem.default.t_model"

  private def tableState(): Map[Long, Long] =
    spark.table(T).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  for (seed <- Seq(11, 23)) test(s"random op sequence matches the model (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    spark.sql(s"DROP TABLE IF EXISTS $T")
    spark.sql(s"CREATE TABLE $T (k BIGINT, v BIGINT)") // v1: empty
    val model = mutable.Map.empty[Long, Long]
    // version -> expected state at that commit (v1 = the empty create)
    val history = mutable.ArrayBuffer[Map[Long, Long]](Map.empty)
    var nextKey = 0L
    for (step <- 1 to 40) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // INSERT 1-5 fresh rows
          val rows = (1 to 1 + rnd.nextInt(5)).map { _ =>
            nextKey += 1; (nextKey, rnd.nextInt(1000).toLong)
          }
          spark.sql(s"INSERT INTO $T VALUES " +
            rows.map { case (k, v) => s"($k,$v)" }.mkString(","))
          rows.foreach { case (k, v) => model(k) = v }
        case 4 | 5 => // DELETE a residue class
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          spark.sql(s"DELETE FROM $T WHERE k % $m = $r")
          model.keys.filter(_ % m == r).toSeq.foreach(model.remove)
        case 6 | 7 => // UPDATE a residue class
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val c = 1 + rnd.nextInt(9)
          spark.sql(s"UPDATE $T SET v = v * 2 + $c WHERE k % $m = $r")
          model.keys.filter(_ % m == r).toSeq
            .foreach(k => model(k) = model(k) * 2 + c)
        case 8 => // MERGE: upsert half-new half-existing keys
          val hit = if (model.isEmpty) { nextKey += 1; nextKey }
                    else model.keys.toSeq(rnd.nextInt(model.size))
          nextKey += 1
          val fresh = nextKey
          spark.sql(
            s"""MERGE INTO $T t USING (SELECT * FROM VALUES ($hit, 777L), ($fresh, 888L) s(k, v)) s
               ON t.k = s.k
               WHEN MATCHED THEN UPDATE SET v = s.v
               WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
          model(hit) = 777L; model(fresh) = 888L
        case _ => // TRUNCATE (rare)
          spark.sql(s"TRUNCATE TABLE $T")
          model.clear()
      }
      history += model.toMap
      assert(tableState() == model.toMap,
        s"seed $seed step $step: table diverged from model")
    }
    // snapshot immutability: every recorded version must read back as
    // the model state AT that commit, in any order, after all writes
    val versions = rnd.shuffle(history.indices.toList)
    versions.foreach { i =>
      val got = spark.sql(s"SELECT k, v FROM $T VERSION AS OF ${i + 1}")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == history(i),
        s"seed $seed: VERSION AS OF ${i + 1} diverged from recorded model state")
    }
  }
}
