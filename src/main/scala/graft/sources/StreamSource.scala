package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Deterministic micro-batch streaming source (`graft-stream`) — the
  * streaming face of the connector surface: a monotonically increasing
  * row-count offset, `batchRows` new rows admitted per micro-batch up to
  * `maxRows`, rows a pure function of their id (same scheme as
  * graft-range, so tests can verify exactly-once delivery end to end).
  *
  * The offset protocol is the part that matters at scale: progress is a
  * single long the engine checkpoints; planInputPartitions(start, end)
  * must return the SAME rows for the same offset range on replay (the
  * exactly-once contract after recovery), which a pure id→row function
  * satisfies by construction. The reference has no streaming (SURVEY
  * §2.8) — this is north-star scope.
  */
class StreamDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = StreamDocSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new StreamDocTable(
      properties.getOrDefault("maxrows", "1000").toLong,
      properties.getOrDefault("batchrows", "100").toLong,
      properties.getOrDefault("splits", "4").toInt)
}

object StreamDocSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false)))
}

final class StreamDocTable(maxRows: Long, batchRows: Long, splits: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_stream($maxRows)"
  override def schema(): StructType = StreamDocSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = StreamDocSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new StreamDocStream(maxRows, batchRows, splits)
      }
    }
}

final case class StreamOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class StreamDocStream(maxRows: Long, batchRows: Long, splits: Int)
    extends MicroBatchStream {
  private var admitted = 0L
  override def initialOffset(): Offset = StreamOffset(0L)
  /** Each poll admits up to batchRows more ids, capped at maxRows — so a
    * bounded stream drains over ⌈maxRows/batchRows⌉ micro-batches and
    * processAllAvailable() terminates. */
  override def latestOffset(): Offset = {
    admitted = math.min(admitted + batchRows, maxRows)
    StreamOffset(admitted)
  }
  override def deserializeOffset(json: String): Offset = StreamOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[StreamOffset].n
    val hi = end.asInstanceOf[StreamOffset].n - 1 // offsets are exclusive-end
    if (hi < lo) return Array.empty
    val per = math.max(1L, (hi - lo + splits) / splits)
    (0 until splits).iterator
      .map(i => (lo + i * per, math.min(lo + (i + 1) * per - 1, hi)))
      .filter { case (l, h) => l <= h }
      .map { case (l, h) => RangeDocPartition(l, h) }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    RangeDocReaderFactory(StreamDocSource.Schema) // same pure id→row readers
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
