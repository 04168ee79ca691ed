package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-wise batch operator.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake (see [[FakeDecoder]]); everything
  * around it — the binary column, the metadata struct schema, the
  * mapPartitions batch shape, partition sizing — is the real Spark
  * plumbing a production decode UDF drops into. The binary payload here
  * is the document text's UTF-8 bytes standing in for image bytes.
  *
  * Scale note: decode is per-row CPU work with no shuffle; throughput is
  * governed by input partition sizing (spark.sql.files.maxPartitionBytes),
  * and the metadata struct lets Catalyst prune the (huge) payload column
  * for queries that only touch metadata.
  */
object Multimodal {

  /** STUB — stands in for an image/audio decoder (libjpeg, ffmpeg, ...).
    * Deterministic: "decodes" a payload into (n_bytes, first_byte,
    * checksum) so tests and the oracle can reproduce it exactly. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      val first = if (payload.nonEmpty) payload(0) & 0xff else -1
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += (payload(i) & 0xff).toLong; i += 1 }
      (payload.length, first, sum)
    }
  }

  /** The multimodal table: binary payload + typed metadata struct —
    * the schema a 100 TB image/text corpus would carry. */
  def mmTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("n_chars").as("n_bytes_claimed"),
        col("lang").as("modality_tag"),
        col("source").as("origin")).as("meta"))

  /** Metadata-only query: payload column must be pruned at the scan —
    * subfield access on the struct (reference DEREFERENCE special form,
    * Expr.h:300-304; nested-schema pruning SURVEY §4.3). */
  def mmMetaOnly(t: Tables): DataFrame =
    mmTable(t).select(
      col("doc_id"),
      col("meta.origin").as("origin"),
      col("meta.n_bytes_claimed").as("n_bytes_claimed"))
      .groupBy(col("origin"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes_claimed")).as("bytes"))
  val mmMetaOnlySql: String =
    "SELECT source AS origin, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS bytes FROM documents GROUP BY source"

  /** Partition-wise decode via mapPartitions — the batch shape a vectorized
    * decode (Arrow/pandas-style) uses: one decoder instance per partition,
    * rows streamed through it. Oracle recomputes the fake decode in SQL. */
  def mmDecodeFeatures(t: Tables): DataFrame = {
    val in = mmTable(t).select(col("doc_id"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("first_byte", IntegerType, nullable = false),
      StructField("byte_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      // one FakeDecoder "instance" per partition (a real decoder would
      // init its codec context here, once, not per row)
      rows.map { r =>
        val id = r.getLong(0)
        val (n, first, sum) = FakeDecoder.decode(r.getAs[Array[Byte]](1))
        Row(id, n, first, sum)
      }
    }(enc)
  }
  val mmDecodeFeaturesSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       ord(substr(text, 1, 1)) AS first_byte,
       list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
                               i -> ord(substr(text, i, 1))))::BIGINT AS byte_sum
       FROM documents"""

  /** STUB — stands in for an image resize (libvips/PIL-style): keeps
    * every `stride`-th byte. Deterministic so the oracle reproduces it. */
  object FakeResizer {
    def resize(payload: Array[Byte], stride: Int): (Int, Long) = {
      var n = 0
      var sum = 0L
      var i = 0
      while (i < payload.length) { n += 1; sum += (payload(i) & 0xff).toLong; i += stride }
      (n, sum)
    }
  }

  /** Resize as a partition-wise binary→binary transform (same batch
    * shape as decode): payload in, resized payload metadata out. A real
    * pipeline would emit the resized binary column; the digest keeps the
    * stub oracle-checkable. */
  def mmResize(t: Tables): DataFrame = {
    val in = mmTable(t).select(col("doc_id"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_resized", IntegerType, nullable = false),
      StructField("resized_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val (n, sum) = FakeResizer.resize(r.getAs[Array[Byte]](1), stride = 2)
        Row(r.getLong(0), n, sum)
      }
    }(enc)
  }
  val mmResizeSql: String =
    """SELECT doc_id,
       CAST((octet_length(encode(text)) + 1) // 2 AS INT) AS n_resized,
       list_sum(list_transform(range(1, octet_length(encode(text)) + 1, 2),
                               i -> ord(substr(text, i, 1))))::BIGINT AS resized_sum
       FROM documents"""

  /** Frame/byte sampling: every 50th byte of each payload — the
    * frame-sample pattern for video (sample positions, then fetch), as a
    * lateral unnest so no row ever materializes the full decoded frame
    * list. */
  def mmFrameSample(t: Tables): DataFrame =
    mmTable(t)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(1), octet_length(col("payload")), lit(50))))
      .select(col("doc_id"), col("col").as("bytepos"),
        substring(decode(col("payload"), "UTF-8"), 0, 0).as("dummy"),
        expr("ascii(substr(decode(payload, 'UTF-8'), col, 1))").as("byte_val"))
      .drop("dummy")
  val mmFrameSampleSql: String =
    """SELECT doc_id, bytepos, ord(substr(text, bytepos, 1)) AS byte_val
       FROM (SELECT doc_id, text, unnest(range(1, octet_length(encode(text)) + 1, 50)) AS bytepos
             FROM documents) s"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("mm_meta_only", mmMetaOnly _, mmMetaOnlySql),
    ("mm_decode_features", mmDecodeFeatures _, mmDecodeFeaturesSql),
    ("mm_resize", mmResize _, mmResizeSql),
    ("mm_frame_sample", mmFrameSample _, mmFrameSampleSql))
}
