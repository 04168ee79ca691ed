package graft.sql

import scala.collection.concurrent.TrieMap

/** Driver-side materialized-view registry (round 11).
  *
  * The reference parses the full materialized-view statement family
  * (PrestoSql.g4:88-92 — CREATE/DROP MATERIALIZED VIEW, REFRESH
  * MATERIALIZED VIEW ... WHERE predicate; AstStatements.h:191-236);
  * Spark has no refreshable MV, so graft implements the semantics on
  * its own storage: the view's rows are MATERIALIZED into a graft-mem
  * DSv2 table (one atomic commit per build/refresh step, snapshot
  * history included), the definition text is kept here, and reads by
  * view name resolve through a session temp view over the backing
  * table — so queries serve the STORED (possibly stale) data, exactly
  * Presto's staleness contract, until REFRESH recomputes it.
  *
  * REFRESH ... WHERE pred is predicate-scoped like Presto's
  * partition-scoped refresh: rows of the MATERIALIZED result matching
  * pred are deleted (graft-mem row-level DELETE) and recomputed by
  * re-running the definition filtered to pred. Each step commits
  * atomically; the pair is not one transaction — the same contract as
  * Presto's per-partition refresh.
  */
object MatViews {
  final case class MatView(name: String, backing: String, defn: String,
      comment: Option[String])

  private val views = TrieMap.empty[String, MatView]
  private def key(name: String): String = name.toLowerCase

  def get(name: String): Option[MatView] = views.get(key(name))
  def exists(name: String): Boolean = views.contains(key(name))
  def register(name: String, backing: String, defn: String,
      comment: Option[String]): Unit =
    views.put(key(name), MatView(name, backing, defn, comment))
  def unregister(name: String): Unit = { views.remove(key(name)); () }

  /** Backing graft-mem table for a view name (qualified or bare). */
  def backingFor(name: String): String =
    "graft_mem.default.__mv_" +
      key(name).replace('.', '_').filter(c => c.isLetterOrDigit || c == '_')

  /** The single-part name reads resolve through (temp views are
    * session-level and unqualified, like Presto's session visibility
    * of the current schema). */
  def readName(name: String): String = {
    val k = key(name)
    k.substring(k.lastIndexOf('.') + 1)
  }

  /** Rendered `SHOW CREATE MATERIALIZED VIEW` text. */
  def showCreate(v: MatView): String =
    s"CREATE MATERIALIZED VIEW ${v.name}" +
      v.comment.map(c => s" COMMENT '${c.replace("'", "''")}'").getOrElse("") +
      s" AS ${v.defn}"
}
