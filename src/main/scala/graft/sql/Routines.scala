package graft.sql

import scala.collection.concurrent.TrieMap

/** Created-routine registry behind SHOW CREATE FUNCTION and ALTER
  * FUNCTION (PrestoSql.g4:131,98; AstStatements.h CreateFunction
  * family): stores the original dialect text of CREATE FUNCTION
  * statements keyed by the case-normalized function name. Engine-wide,
  * like [[graft.functions.Registry]] — the reference keeps routine
  * metadata in its function registry the same way. Recording happens at
  * parse time (the parser has no execution hook); a CREATE FUNCTION
  * whose execution later fails can leave a stale entry until re-created
  * or dropped, which SHOW CREATE FUNCTION serves as-written.
  */
object Routines {
  private val texts = TrieMap.empty[String, String]
  private def key(name: String): String = name.toLowerCase

  def record(name: String, text: String): Unit = { texts.put(key(name), text.trim); () }
  def get(name: String): Option[String] = texts.get(key(name))
  def drop(name: String): Unit = { texts.remove(key(name)); () }
}
