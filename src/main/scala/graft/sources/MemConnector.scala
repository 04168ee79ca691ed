package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => wstream}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-memory DSv2 connector with the FULL batch-write commit protocol —
  * the Spark rendering of the reference's write lifecycle
  * (`ConnectorMetadata.h:569-627` createTable / beginWrite / finishWrite /
  * abortWrite) and of its in-memory TestConnector
  * (`axiom/connectors/tests/TestConnector.h`).
  *
  * Write protocol (the part worth demonstrating): every task's
  * DataWriter buffers its rows and ships them to the driver as its
  * commit message; nothing becomes visible until BatchWrite.commit
  * installs ALL task outputs atomically. A failed/aborted job therefore
  * leaves the table exactly as it was — the same all-or-nothing contract
  * a production sink implements with staging files + a commit manifest
  * instead of memory. Truncation (overwrite mode) happens inside commit,
  * not before, so even overwrite is atomic.
  */
class MemSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mem"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val name = MemSource.tableName(options.asCaseSensitiveMap())
    MemTables.schemaOf(name).getOrElse(
      throw new IllegalArgumentException(s"graft-mem table '$name' does not exist"))
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MemTable(MemSource.tableName(properties), schema)
}

object MemSource {
  private[sources] def tableName(props: util.Map[String, String]): String = {
    val n = props.get("table")
    require(n != null && n.nonEmpty, "graft-mem requires option 'table'")
    n
  }
}

/** Driver-side catalog of in-memory tables (rows are UnsafeRow copies). */
object MemTables {
  private val tables = TrieMap.empty[String, (StructType, Vector[InternalRow])]
  def schemaOf(name: String): Option[StructType] = tables.get(name).map(_._1)
  def rowsOf(name: String): Vector[InternalRow] = tables.get(name).map(_._2).getOrElse(Vector.empty)
  def names: Seq[String] = tables.keys.toSeq

  /** Version history (round 11): a snapshot of the table state after
    * every committed mutation, 1-based — the DSv2 time-travel surface
    * behind Presto's `FOR VERSION|TIMESTAMP AS OF` (PrestoSql.g4:
    * 561-568). Commit micros support TIMESTAMP AS OF. Snapshots share
    * the immutable row vectors, so history costs one Vector reference
    * per commit, not a copy. */
  final case class Snap(schema: StructType, rows: Vector[InternalRow],
      atMicros: Long, version: Int)
  private val history = TrieMap.empty[String, Vector[Snap]]
  private def snap(name: String): Unit = tables.get(name).foreach { case (s, r) =>
    val at = System.currentTimeMillis() * 1000L
    history.updateWith(name) {
      case Some(h) => Some(h :+ Snap(s, r, at, h.lastOption.map(_.version).getOrElse(0) + 1))
      case None => Some(Vector(Snap(s, r, at, 1)))
    }
  }
  /** Highest committed version number (stable across history expiry). */
  def versionCount(name: String): Int =
    history.get(name).flatMap(_.lastOption).map(_.version).getOrElse(0)
  def snapshotAt(name: String, v: Int): Option[(StructType, Vector[InternalRow])] =
    history.get(name).flatMap(_.find(_.version == v)).map(s => (s.schema, s.rows))
  /** Latest snapshot committed at or before `micros`. */
  def snapshotAsOfTime(name: String, micros: Long): Option[(StructType, Vector[InternalRow])] =
    history.get(name).flatMap(_.reverse.find(_.atMicros <= micros)).map(s => (s.schema, s.rows))
  /** All retained snapshots, oldest first: (version, atMicros, rowCount). */
  def snapshots(name: String): Seq[(Int, Long, Long)] =
    history.get(name).getOrElse(Vector.empty)
      .map(s => (s.version, s.atMicros, s.rows.length.toLong))
  /** Drop all but the newest `keep` snapshots (CALL expire_history):
    * version numbers stay stable; expired versions become unreadable
    * for time travel, exactly the Iceberg expire-snapshots contract.
    * Returns how many were dropped. */
  def expireHistory(name: String, keep: Int): Int = synchronized {
    require(keep >= 1, "expire_history: keep must be >= 1")
    var dropped = 0
    history.updateWith(name) {
      case Some(h) =>
        dropped = math.max(0, h.length - keep)
        Some(h.drop(dropped))
      case None => None
    }
    dropped
  }

  /** DDL create: install an empty table with this schema (createTable in
    * the reference's ConnectorMetadata.h:569 lifecycle). */
  def create(name: String, schema: StructType): Unit = {
    tables.put(name, (schema, Vector.empty))
    snap(name)
  }
  def exists(name: String): Boolean = tables.contains(name)
  /** NOT NULL enforcement (ALTER COLUMN SET NOT NULL, round 12): every
    * committed mutation flows through install/installEpoch, so this one
    * check covers INSERT, CoW rewrites, and the streaming sink. Rows
    * arrive projected to the table's column order, so stored-schema
    * ordinals line up. Throwing here aborts the commit — nothing is
    * installed. */
  private def checkNotNull(name: String, rows: Vector[InternalRow]): Unit =
    tables.get(name).foreach { case (s, _) =>
      val nn = s.fields.zipWithIndex.filter(p => !p._1.nullable)
      if (nn.nonEmpty) rows.foreach { r =>
        nn.foreach { case (f, i) =>
          if (i < r.numFields && r.isNullAt(i))
            throw new IllegalArgumentException(
              s"NULL value in NOT NULL column ${f.name} of graft-mem table $name")
        }
      }
    }

  // install/drop are synchronized like every other committing mutation:
  // unsynchronized concurrent commits let both snap() calls observe the
  // SECOND update, recording the final state twice and the intermediate
  // state never — VERSION AS OF the middle version then reads wrong
  // rows — and the checkNotNull is check-then-act against a concurrent
  // SET NOT NULL (round-17 review)
  def install(name: String, schema: StructType, rows: Vector[InternalRow],
      truncate: Boolean): Unit = synchronized {
    checkNotNull(name, rows)
    tables.updateWith(name) {
      case Some((s, old)) if !truncate => Some((s, old ++ rows))
      // truncate rewrite of an EXISTING table keeps the stored schema —
      // the write schema carries the query's nullability, and adopting
      // it would silently drop a SET NOT NULL on every CoW rewrite
      case Some((s, _)) => Some((s, rows))
      case None => Some((schema, rows))
    }
    snap(name)
  }
  def drop(name: String): Unit = synchronized {
    tables.remove(name)
    epochs.filterInPlace((k, _) => k != name && !k.startsWith(name + "#"))
    history.remove(name); ()
  }

  /** Reinstall snapshot v as the CURRENT state (transaction rollback,
    * round 11). The restore is itself a committed mutation — history
    * keeps growing, so time travel can read across a rollback. The
    * SNAPSHOT's schema is reinstated together with its rows: restoring
    * across an ALTER TABLE under install()'s keep-stored-schema rule
    * would serve old-shape rows under the post-alter schema (round-17
    * review; that rule protects CoW rewrites, whose WRITE schema
    * carries query nullability — here the snapshot schema IS the
    * committed table shape, and its rows passed NOT NULL when first
    * committed). */
  def restore(name: String, v: Int): Boolean = synchronized {
    snapshotAt(name, v) match {
      case Some((s, rows)) =>
        tables.put(name, (s, rows))
        snap(name)
        true
      case None => false
    }
  }

  /** ALTER TABLE ... RENAME TO (round 11): moves current state, history
    * and the epoch ledger under the new key atomically enough for the
    * driver-side store (Presto #renameTable, AstStatements.h). */
  def rename(oldName: String, newName: String): Unit = synchronized {
    require(!tables.contains(newName), s"graft-mem table already exists: $newName")
    tables.remove(oldName).foreach(tables.put(newName, _))
    history.remove(oldName).foreach(history.put(newName, _))
    // epoch ledger entries are keyed "<table>#<queryId>"
    epochs.keys.filter(k => k == oldName || k.startsWith(oldName + "#")).toVector
      .foreach { k =>
        epochs.remove(k).foreach(epochs.put(newName + k.stripPrefix(oldName), _))
      }
  }

  /** ALTER SCHEMA ... RENAME TO (round 11): namespaces are key
    * prefixes, so a schema rename moves every `from.x` table (state,
    * history, epoch ledger) under `to.x`. All-or-nothing: collisions
    * are checked before any move. */
  def renameNamespace(from: String, to: String): Unit = synchronized {
    val pre = from + "."
    val moving = tables.keys.filter(_.startsWith(pre)).toVector.sorted
    if (moving.isEmpty) throw new IllegalArgumentException(
      s"graft-mem schema not found: $from " +
        "(schema rename is supported on the graft_mem catalog only)")
    moving.foreach { k =>
      val nk = to + "." + k.stripPrefix(pre)
      require(!tables.contains(nk), s"graft-mem table already exists: $nk")
    }
    moving.foreach(k => rename(k, to + "." + k.stripPrefix(pre)))
  }

  /** Schema evolution (round 11, ALTER TABLE ADD/DROP/RENAME COLUMN):
    * replace schema AND rows in one committed mutation — time travel
    * still reads the pre-alter shape from history. */
  def alter(name: String, newSchema: StructType,
      remap: Vector[InternalRow] => Vector[InternalRow]): Unit = synchronized {
    tables.get(name).foreach { case (_, rows) =>
      tables.put(name, (newSchema, remap(rows)))
      snap(name)
    }
  }

  /** Committed epoch ids per (table, STREAMING QUERY) — the idempotence
    * ledger for the streaming sink. Keying by table alone silently
    * dropped a second query's batches: a fresh checkpoint restarts
    * epochIds at 0, which a table-wide ledger mistakes for replays
    * (round-17 review). */
  private val epochs = TrieMap.empty[String, Set[Long]]
  private def epochKey(name: String, queryId: String) = s"$name#$queryId"
  def committedEpochs(name: String, queryId: String): Set[Long] =
    epochs.getOrElse(epochKey(name, queryId), Set.empty)
  /** All committed epochs across every query writing to `name` (probe
    * surface for tests — the ledger itself stays per-query). */
  def committedEpochsAll(name: String): Set[Long] =
    epochs.iterator.collect {
      case (k, v) if k == name || k.startsWith(name + "#") => v
    }.foldLeft(Set.empty[Long])(_ ++ _)
  def installEpoch(name: String, schema: StructType, queryId: String, epochId: Long,
      rows: Vector[InternalRow]): Unit = synchronized {
    if (!committedEpochs(name, queryId).contains(epochId)) {
      install(name, schema, rows, truncate = false)
      epochs.updateWith(epochKey(name, queryId)) {
        case Some(done) => Some(done + epochId)
        case None => Some(Set(epochId))
      }
    }
  }
}

final class MemTable(name: String, schema0: StructType) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {
  /** SQL TRUNCATE TABLE (Presto #truncateTable shares the syntax):
    * atomic replace-with-empty; commits a history snapshot like any
    * other mutation, so time travel can read back across it. */
  override def truncateTable(): Boolean = {
    MemTables.install(name, schema(), Vector.empty, truncate = true)
    true
  }
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType = MemTables.schemaOf(name).getOrElse(schema0)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MemScan(name, schema())
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(name, info.schema(), info.queryId())

  /** SQL DELETE/UPDATE/MERGE — the statement entry to the copy-on-write
    * path (reference Update/Delete AST, AstStatements.h:541,573, onto the
    * connector write lifecycle, ConnectorMetadata.h:569-627). Group-based
    * copy-on-write with the WHOLE table as the single group: Catalyst
    * rewrites the statement as scan → modify → ReplaceData, and the
    * replacement write truncates-and-installs inside one atomic commit —
    * the same rewrite a parquet/Iceberg-style connector does per file
    * group, collapsed to one group for an in-memory table. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new MemScan(name, schema())
        }
      override def newWriteBuilder(wInfo: LogicalWriteInfo): WriteBuilder = {
        // ReplaceData writes back the full surviving/updated content of
        // every read group — here the whole table, so the write must
        // replace, not append.
        val b = new MemWriteBuilder(name, wInfo.schema(), wInfo.queryId())
        b.truncate()
        b
      }
    }
}

/** Time-travel view: a read-only table pinned to one history snapshot
  * (DSv2 loadTable(ident, version/timestamp) — Presto FOR VERSION|
  * TIMESTAMP AS OF). */
final class MemTableSnapshot(name: String, tag: String, schema0: StructType,
    rows: Vector[InternalRow]) extends Table with SupportsRead {
  override def name(): String = s"graft_mem($name@$tag)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = schema0
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(MemPartition(rows))
        override def createReaderFactory(): PartitionReaderFactory = MemReaderFactory()
      }
    }
}

// ------------------------------------------------------------------ read
final class MemScan(name: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemPartition(MemTables.rowsOf(name)))
  override def createReaderFactory(): PartitionReaderFactory = MemReaderFactory()
}
final case class MemPartition(rows: Vector[InternalRow]) extends InputPartition
final case class MemReaderFactory() extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val it = p.asInstanceOf[MemPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

// ----------------------------------------------------------------- write
final class MemWriteBuilder(name: String, schema: StructType, queryId: String = "")
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(name, schema, doTruncate)
    override def toStreaming: wstream.StreamingWrite =
      new MemStreamingWrite(name, schema, queryId)
  }
}

/** Commit messages carry each task's buffered rows back to the driver;
  * commit() is the single visibility point (finishWrite); abort() is a
  * no-op because nothing escaped the tasks (abortWrite). */
final case class MemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

final class MemBatchWrite(name: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemTables.install(name, schema,
      messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toVector, truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      private val types = schema.fields.map(_.dataType)
      private val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(types)
      private val scratch =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(types.length)
      override def write(row: InternalRow): Unit = {
        // Row-level rewrites (ReplaceData) PREPEND plan-internal metadata
        // (__row_operation) to the rows the writer sees while the
        // LogicalWriteInfo schema stays the table schema — align by
        // dropping the leading extras, then normalize to a fresh
        // UnsafeRow (incoming buffers are reused between rows).
        val r =
          if (row.numFields == types.length) row
          else {
            val off = row.numFields - types.length
            var i = 0
            while (i < types.length) { scratch.update(i, row.get(i + off, types(i))); i += 1 }
            scratch
          }
        buf += toUnsafe(r).copy()
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.result().toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

// ------------------------------------------------------------- streaming
/** Micro-batch streaming sink: same task-buffered commit messages as the
  * batch path, committed once PER EPOCH. Exactly-once under replay comes
  * from epoch idempotence — after a failure the engine re-runs the last
  * uncommitted batch and re-delivers its commit, so `commit(epochId)`
  * must install a given epoch at most once ([[MemTables.installEpoch]]
  * records committed epoch ids per table and drops re-deliveries). This
  * is the in-memory twin of the transactional-sink pattern (epoch id
  * stored with the data, writes conditional on it). */
final class MemStreamingWrite(name: String, schema: StructType, queryId: String = "")
    extends wstream.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): wstream.StreamingDataWriterFactory =
    MemStreamingWriterFactory(schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    MemTables.installEpoch(name, schema, queryId, epochId,
      messages.iterator.flatMap(_.asInstanceOf[MemCommit].rows).toVector)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemStreamingWriterFactory(schema: StructType) extends wstream.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    MemWriterFactory(schema).createWriter(partitionId, taskId)
}
