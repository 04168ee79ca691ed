package graft.sources

import java.util
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TableCatalog over [[MemTables]] — the SQL-statement entry to the
  * in-memory connector's write lifecycle. With
  * `spark.sql.catalog.graft_mem = graft.sources.MemCatalog`, the
  * statements the reference lowers through its AST
  * (axiom/sql/presto/ast/AstStatements.h:44-721 Insert/CreateTableAsSelect;
  * ConnectorMetadata.h:569-627 createTable/beginWrite/finishWrite) run as
  * plain SQL here: `CREATE TABLE graft_mem.ns.t ...`, `INSERT INTO
  * graft_mem.ns.t SELECT ...`, `CREATE TABLE graft_mem.ns.t AS SELECT
  * ...` — Catalyst plans them onto [[MemTable]]'s DSv2 BatchWrite, whose
  * commit protocol stays all-or-nothing (MemConnectorSpec).
  *
  * Tables are keyed by the dotted identifier; namespaces are implicit
  * (any single-level namespace works, "default" by convention) — the
  * in-memory store has no hierarchy worth modeling.
  */
class MemCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {
  private var catalogName: String = "graft_mem"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString(".") + "."
    MemTables.names.filter(_.startsWith(prefix))
      .map(n => Identifier.of(namespace, n.stripPrefix(prefix))).toArray
  }

  private def parts(ident: Identifier): Seq[String] =
    (ident.namespace() :+ ident.name()).toSeq

  override def loadTable(ident: Identifier): Table =
    MemTables.schemaOf(key(ident)) match {
      case Some(s) => new MemTable(key(ident), s)
      case None => throw new NoSuchTableException(parts(ident))
    }

  /** Time travel by VERSION AS OF (1-based commit number). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!MemTables.exists(key(ident))) throw new NoSuchTableException(parts(ident))
    val v = try version.trim.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft_mem versions are integer commit numbers, got '$version'")
    }
    MemTables.snapshotAt(key(ident), v) match {
      case Some((s, rows)) => new MemTableSnapshot(key(ident), s"v$v", s, rows)
      case None => throw new IllegalArgumentException(
        s"version $v not found for ${key(ident)} " +
          s"(have 1..${MemTables.versionCount(key(ident))})")
    }
  }

  /** Time travel by TIMESTAMP AS OF (microseconds since epoch). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!MemTables.exists(key(ident))) throw new NoSuchTableException(parts(ident))
    MemTables.snapshotAsOfTime(key(ident), timestamp) match {
      case Some((s, rows)) => new MemTableSnapshot(key(ident), s"t$timestamp", s, rows)
      case None => throw new IllegalArgumentException(
        s"no commit at or before timestamp $timestamp for ${key(ident)}")
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    MemTables.exists(key(ident))

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(parts(ident))
    // clear refusal over silent acceptance: this store has no
    // partitioned layout, so PARTITIONED BY must not succeed while
    // quietly creating an unpartitioned table (round-17 review)
    if (info.partitions() != null && info.partitions().nonEmpty)
      throw new UnsupportedOperationException(
        "graft_mem: PARTITIONED BY is not supported (in-memory tables " +
          "have no partitioned layout)")
    val schema = org.apache.spark.sql.graft.Shim.v2ColumnsToStructType(info.columns())
    MemTables.create(key(ident), schema)
    new MemTable(key(ident), schema)
  }

  // Older entry points chain to the TableInfo one by default; kept
  // explicit so direct callers (tests) hit the same path.
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident, new TableInfo.Builder()
      .withColumns(org.apache.spark.sql.graft.Shim.structTypeToV2Columns(schema))
      .withPartitions(partitions).withProperties(properties).build())

  /** ALTER TABLE ADD/DROP/RENAME COLUMN (round 11) — Presto's
    * #addColumn/#dropColumn/#renameColumn statements (PrestoSql.g4:
    * 50-56) arrive here as Spark TableChanges; the store rewrites
    * schema + rows in one committed mutation (history keeps the
    * pre-alter shape readable via time travel). Top-level columns
    * only — nested paths fail loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val name = key(ident)
    val schema0 = MemTables.schemaOf(name).getOrElse(
      throw new NoSuchTableException(parts(ident)))
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    // fold changes into (newSchema, per-row value mapper)
    var fields = schema0.fields.toVector
    // each entry: row => value for that output field
    var getters: Vector[(InternalRow, Array[org.apache.spark.sql.types.DataType]) => Any] =
      schema0.fields.indices.map { i =>
        (r: InternalRow, ts: Array[org.apache.spark.sql.types.DataType]) => r.get(i, ts(i))
      }.toVector
    // original source index per CURRENT field (-1 = added in this
    // batch) — SET NOT NULL must validate existing rows through the
    // column's ORIGINAL position, or a rename/add earlier in the same
    // batch silently skips the scan (round-17 review)
    var origins: Vector[Int] = schema0.fields.indices.toVector
    val srcTypes = schema0.fields.map(_.dataType)
    def single(path: Array[String], what: String): String = {
      if (path.length != 1) throw new UnsupportedOperationException(
        s"graft_mem: $what on nested field ${path.mkString(".")} not supported")
      path.head
    }
    changes.foreach {
      case add: TableChange.AddColumn =>
        val col = single(add.fieldNames(), "ADD COLUMN")
        if (fields.exists(_.name.equalsIgnoreCase(col)))
          throw new IllegalArgumentException(s"column already exists: $col")
        if (add.position() != null) throw new UnsupportedOperationException(
          s"graft_mem: ADD COLUMN ... FIRST/AFTER not supported (column $col)")
        // honor a declared NOT NULL: valid for an empty table; on a
        // non-empty table the backfill would be NULL, so fail loudly
        // instead of silently committing the column as nullable
        // (round-17 review)
        if (!add.isNullable && MemTables.rowsOf(name).nonEmpty)
          throw new IllegalStateException(
            s"ADD COLUMN $col NOT NULL: existing rows would be NULL " +
              "(add nullable, backfill, then SET NOT NULL)")
        fields = fields :+ org.apache.spark.sql.types.StructField(
          col, add.dataType(), nullable = add.isNullable)
        getters = getters :+ ((_: InternalRow, _: Array[org.apache.spark.sql.types.DataType]) => null)
        origins = origins :+ -1
      case del: TableChange.DeleteColumn =>
        val col = single(del.fieldNames(), "DROP COLUMN")
        val i = fields.indexWhere(_.name.equalsIgnoreCase(col))
        if (i < 0) throw new IllegalArgumentException(s"no such column: $col")
        fields = fields.patch(i, Nil, 1)
        getters = getters.patch(i, Nil, 1)
        origins = origins.patch(i, Nil, 1)
      case ren: TableChange.RenameColumn =>
        val col = single(ren.fieldNames(), "RENAME COLUMN")
        val i = fields.indexWhere(_.name.equalsIgnoreCase(col))
        if (i < 0) throw new IllegalArgumentException(s"no such column: $col")
        // duplicate-name guard, same as ADD (a rename onto an existing
        // name committed an ambiguous schema — round-17 review)
        if (fields.zipWithIndex.exists { case (f, j) =>
            j != i && f.name.equalsIgnoreCase(ren.newName()) })
          throw new IllegalArgumentException(
            s"column already exists: ${ren.newName()}")
        fields = fields.updated(i, fields(i).copy(name = ren.newName()))
      case un: TableChange.UpdateColumnNullability =>
        // ALTER COLUMN c SET/DROP NOT NULL (PrestoSql.g4:73-76; Spark
        // shares the spelling, so the statement arrives as a DSv2
        // change). SET NOT NULL validates EXISTING rows before the
        // schema commits; the write path enforces it afterwards
        // (MemTables.checkNotNull).
        val col = single(un.fieldNames(), "ALTER COLUMN NULLABILITY")
        val i = fields.indexWhere(_.name.equalsIgnoreCase(col))
        if (i < 0) throw new IllegalArgumentException(s"no such column: $col")
        if (!un.nullable()) {
          val i0 = origins(i)
          if (i0 >= 0) {
            if (MemTables.rowsOf(name).exists(_.isNullAt(i0)))
              throw new IllegalStateException(
                s"ALTER COLUMN $col SET NOT NULL: existing rows contain NULL")
          } else if (MemTables.rowsOf(name).nonEmpty)
            // column added in this same batch: every existing row's
            // value is the NULL backfill
            throw new IllegalStateException(
              s"ALTER COLUMN $col SET NOT NULL: the column was added in " +
                "this ALTER and existing rows would be NULL")
        }
        fields = fields.updated(i, fields(i).copy(nullable = un.nullable()))
      case other => throw new UnsupportedOperationException(
        s"graft_mem: unsupported ALTER TABLE change: $other")
    }
    val newSchema = org.apache.spark.sql.types.StructType(fields)
    val gs = getters
    MemTables.alter(name, newSchema, rows => rows.map { r =>
      new GenericInternalRow(gs.map(_(r, srcTypes)).toArray): InternalRow
    })
    new MemTable(name, newSchema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val existed = tableExists(ident)
    MemTables.drop(key(ident))
    // recorded constraints die with the table — a recreate must not
    // inherit the old table's SHOW CREATE surface
    graft.sql.Constraints.clearTable(s"$catalogName.${key(ident)}")
    existed
  }

  /** ALTER TABLE ... RENAME TO (Presto #renameTable). Spark hands the
    * target through with the catalog name still leading the namespace
    * when the user wrote it fully qualified — strip it so the store
    * key stays catalog-relative. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val newParts0 = parts(newIdent)
    val newParts = if (newParts0.headOption.contains(catalogName)) newParts0.tail else newParts0
    val target = Identifier.of(newParts.dropRight(1).toArray, newParts.last)
    if (!tableExists(oldIdent)) throw new NoSuchTableException(parts(oldIdent))
    if (tableExists(target)) throw new TableAlreadyExistsException(newParts)
    MemTables.rename(key(oldIdent), key(target))
    // recorded constraints move WITH the table: leaving them under the
    // old key loses them from the renamed table's SHOW CREATE surface
    // and lets a later CREATE of the old name inherit phantoms — the
    // exact staleness dropTable clears (round-17 review)
    graft.sql.Constraints.renameTable(
      s"$catalogName.${key(oldIdent)}", s"$catalogName.${key(target)}")
  }

  // ---------------------------------------------- procedures (round 11)
  // Presto CALL (PrestoSql.g4:101, AstStatements.h) through Spark 4's
  // DSv2 ProcedureCatalog: CALL graft_mem.system.<proc>(...) — snapshot
  // maintenance procedures over the connector's version history, the
  // same surface Iceberg ships as its system procedures.
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.Scan
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private abstract class MemProc(procName: String, desc: String,
      params: Array[ProcedureParameter], resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    protected def run(input: InternalRow): Vector[InternalRow]
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      java.util.Collections.singletonList[Scan](
        new ProcResultScan(resultSchema, run(input))).iterator()
  }

  // procedure output must be a LocalScan (driver-local result rows)
  private final class ProcResultScan(schema0: StructType, resultRows: Vector[InternalRow])
      extends org.apache.spark.sql.connector.read.LocalScan {
    override def readSchema(): StructType = schema0
    override def rows(): Array[InternalRow] = resultRows.toArray
  }

  private def requireTable(t: String): String = {
    if (!MemTables.exists(t)) throw new IllegalArgumentException(
      s"graft-mem table not found: $t")
    t
  }

  private val procs: Map[String, UnboundProcedure] = Map(
    "rollback_to_version" -> new MemProc("rollback_to_version",
      "restore a table to a prior committed snapshot (the restore is itself a commit)",
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("version", IntegerType).build()),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("restored_version", IntegerType),
        org.apache.spark.sql.types.StructField("current_version", IntegerType)))) {
      override protected def run(input: InternalRow): Vector[InternalRow] = {
        val t = requireTable(input.getUTF8String(0).toString)
        val v = input.getInt(1)
        if (!MemTables.restore(t, v)) throw new IllegalArgumentException(
          s"version $v not found for $t (have up to ${MemTables.versionCount(t)})")
        Vector(new GenericInternalRow(Array[Any](v, MemTables.versionCount(t))))
      }
    },
    "snapshots" -> new MemProc("snapshots",
      "list the retained snapshots of a table (version, committed_at micros, row_count)",
      Array(ProcedureParameter.in("table", StringType).build()),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("version", IntegerType),
        org.apache.spark.sql.types.StructField("committed_at", LongType),
        org.apache.spark.sql.types.StructField("row_count", LongType)))) {
      override protected def run(input: InternalRow): Vector[InternalRow] = {
        val t = requireTable(input.getUTF8String(0).toString)
        MemTables.snapshots(t).map { case (v, at, n) =>
          new GenericInternalRow(Array[Any](v, at, n)): InternalRow
        }.toVector
      }
    },
    "expire_history" -> new MemProc("expire_history",
      "drop all but the newest `keep` snapshots; version numbers stay stable",
      Array(ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("keep", IntegerType).build()),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("expired", IntegerType)))) {
      override protected def run(input: InternalRow): Vector[InternalRow] = {
        val t = requireTable(input.getUTF8String(0).toString)
        Vector(new GenericInternalRow(
          Array[Any](MemTables.expireHistory(t, input.getInt(1)))))
      }
    })

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procs.keys.toArray.sorted.map(Identifier.of(Array("system"), _))
    else Array.empty
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace().sameElements(Array("system")))
      throw new IllegalArgumentException(
        s"graft_mem procedures live in the 'system' namespace, got ${parts(ident).mkString(".")}")
    procs.getOrElse(ident.name().toLowerCase, throw new IllegalArgumentException(
      s"unknown procedure: ${ident.name()} (have ${procs.keys.toSeq.sorted.mkString(", ")})"))
  }

  // ------------------------------------------------- namespaces (flat)
  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length <= 1
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft_mem: ALTER NAMESPACE not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}
