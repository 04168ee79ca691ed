package graft.sql

import scala.collection.concurrent.TrieMap

/** Recorded table constraints (ALTER TABLE ADD/DROP CONSTRAINT,
  * PrestoSql.g4:69-72, 600-615 constraintSpecification).
  *
  * Presto constraints are catalog metadata: informational for the
  * optimizer (RELY) unless ENFORCED, and Spark has no engine-checked
  * UNIQUE/PRIMARY KEY either — so the honest rendering is a registry
  * that survives the session (driver-side, like [[Routines]] and
  * [[MatViews]]) and surfaces through SHOW CREATE TABLE as the ALTER
  * statements that recreate it. NOT NULL is the exception: it IS
  * enforced, on the write path ([[graft.sources.MemTables]]) via
  * Spark's own ALTER COLUMN SET NOT NULL spelling.
  */
object Constraints {
  /** table-key → ordered (constraint name, spec text). */
  private val byTable = TrieMap.empty[String, Vector[(String, String)]]
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  private def key(table: String): String = table.toLowerCase

  /** Record a constraint; unnamed specs get a system-assigned name
    * (Presto does the same). Duplicate names on one table error. */
  def add(table: String, name: Option[String], spec: String): String = synchronized {
    val n = name.getOrElse(s"c_${counter.incrementAndGet()}")
    val cur = byTable.getOrElse(key(table), Vector.empty)
    if (cur.exists(_._1.equalsIgnoreCase(n)))
      throw new IllegalArgumentException(
        s"constraint already exists: $n on $table")
    byTable.put(key(table), cur :+ (n, spec))
    n
  }

  /** Drop by name; false if absent. */
  def drop(table: String, name: String): Boolean = synchronized {
    val cur = byTable.getOrElse(key(table), Vector.empty)
    val next = cur.filterNot(_._1.equalsIgnoreCase(name))
    if (next.length == cur.length) false
    else { byTable.put(key(table), next); true }
  }

  def list(table: String): Vector[(String, String)] =
    byTable.getOrElse(key(table), Vector.empty)

  /** Drop every constraint of one table (DROP TABLE hygiene). */
  def clearTable(table: String): Unit = { byTable.remove(key(table)); () }

  /** ALTER TABLE ... RENAME TO moves the recorded constraints with the
    * table (round-17 review: they were left under the old key, vanishing
    * from the renamed table and haunting a later CREATE of the old name). */
  def renameTable(from: String, to: String): Unit = synchronized {
    byTable.remove(key(from)).foreach(byTable.put(key(to), _))
  }

  /** Test isolation. */
  def clear(): Unit = byTable.clear()
}
