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

/** Named-type registry behind CREATE TYPE (PrestoSql.g4:80-82,
  * AstStatements.h:348): name → fully-expanded Presto type text
  * (ROW(...) for the row form, the aliased type otherwise), substituted
  * into CAST targets and CREATE TABLE column definitions by
  * [[PrestoDialect.rewriteUserTypes]]. Keyed by the definition's LAST
  * name part, lowercased — Presto references named types bare. */
object UserTypes {
  private val types = TrieMap.empty[String, String]
  private def key(name: String): String =
    name.split("\\.").last.toLowerCase

  def isEmpty: Boolean = types.isEmpty
  /** Register; the text must already be expanded
    * ([[PrestoDialect.expandUserTypes]]). */
  def record(name: String, expandedText: String): Unit =
    { types.put(key(name), expandedText.trim); () }
  def get(name: String): Option[String] = types.get(key(name))
  def drop(name: String): Unit = { types.remove(key(name)); () }
}
