package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-wise batch operator.
  *
  * Round 11: the decode step is a REAL codec — [[javax.imageio.ImageIO]]
  * PNG encode/decode (in-JDK, no external libs). Setup synthesizes a
  * deterministic raster per document (dimensions and every pixel are a
  * closed-form function of `doc_id`), encodes it to PNG bytes — the
  * binary payload column — and the operators under test decode those
  * bytes back to pixels with `ImageIO.read` and emit width/height/
  * per-channel statistics. 8-bit RGB PNG is lossless, so the DuckDB
  * oracle reproduces the exact same statistics from the closed-form
  * pixel formula without needing a codec of its own.
  *
  * Scale notes (100 TB): decode is per-row CPU work with no shuffle —
  * throughput is governed by input partition sizing
  * (spark.sql.files.maxPartitionBytes); the codec context is
  * per-partition, not per-row (`mapPartitions`); the metadata struct
  * lets Catalyst prune the (huge) payload column for queries that only
  * touch metadata; and frame sampling explodes sample POSITIONS first so
  * unsampled frames are never decoded (the "sample, then fetch" pattern
  * for video).
  */
object Multimodal {

  /** Deterministic synthetic raster: dimensions and channel values are
    * closed-form in (doc_id, frame, x, y, channel) so the DuckDB oracle
    * can recompute decoded statistics without a codec. */
  object Raster {
    def width(id: Long): Int  = (8 + id % 9).toInt  // 8..16
    def height(id: Long): Int = (8 + id % 7).toInt  // 8..14
    def frames(id: Long): Int = (3 + id % 4).toInt  // 3..6
    /** channel c of pixel (x,y) of frame f: base + c*101 mod 256. */
    def chan(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
      ((id * 31 + f * 17 + x * 7 + y * 13 + c * 101) % 256).toInt

    def render(id: Long, f: Int): BufferedImage = {
      val w = width(id); val h = height(id)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (chan(id, f, x, y, 0) << 16) | (chan(id, f, x, y, 1) << 8) | chan(id, f, x, y, 2))
          x += 1
        }
        y += 1
      }
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream(1024)
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decodePng(bytes: Array[Byte]): BufferedImage =
      ImageIO.read(new ByteArrayInputStream(bytes))

    // The default ImageIO path spools through a temp-file cache; keep the
    // tiny-image hot path entirely in memory.
    ImageIO.setUseCache(false)
  }

  /** The text-modality table (unchanged from earlier rounds): binary
    * payload + typed metadata struct, used by the metadata-pruning
    * entry/specs. Payload is the document text's UTF-8 bytes. */
  def mmTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("n_chars").as("n_bytes_claimed"),
        col("lang").as("modality_tag"),
        col("source").as("origin")).as("meta"))

  /** The image-modality table: PNG payload + typed metadata struct — the
    * schema a 100 TB image corpus would carry. The encode here is SETUP
    * (writing the deterministic synthetic rasters); the entries below
    * are the operators under test. One codec context per partition. */
  def imgTable(t: Tables): DataFrame = {
    val in = t.documents.select(col("doc_id"), col("source"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("modality", StringType, nullable = false),
        StructField("origin", StringType, nullable = true),
        StructField("width_claimed", IntegerType, nullable = false),
        StructField("height_claimed", IntegerType, nullable = false))), nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val png = Raster.encodePng(Raster.render(id, f = 0))
        Row(id, png, Row("image/png", r.getString(1), Raster.width(id), Raster.height(id)))
      }
    }(enc)
  }

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

  /** Partition-wise decode via mapPartitions: ImageIO.read on each PNG
    * payload, emitting dimensions + per-channel pixel sums. Oracle
    * recomputes the statistics from the closed-form raster formula
    * (PNG RGB is lossless, so decoded pixels == formula). */
  def mmDecodeFeatures(t: Tables): DataFrame = {
    val in = imgTable(t).select(col("doc_id"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val img = Raster.decodePng(r.getAs[Array[Byte]](1))
        val w = img.getWidth; val h = img.getHeight
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
            x += 1
          }
          y += 1
        }
        Row(r.getLong(0), w, h, rs, gs, bs)
      }
    }(enc)
  }
  val mmDecodeFeaturesSql: String =
    """SELECT doc_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(8 + doc_id % 7 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 7), y ->
         list_transform(range(0, 8 + doc_id % 9), x ->
           (doc_id*31 + x*7 + y*13) % 256)))) AS BIGINT) AS r_sum,
       CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 7), y ->
         list_transform(range(0, 8 + doc_id % 9), x ->
           (doc_id*31 + x*7 + y*13 + 101) % 256)))) AS BIGINT) AS g_sum,
       CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 7), y ->
         list_transform(range(0, 8 + doc_id % 9), x ->
           (doc_id*31 + x*7 + y*13 + 202) % 256)))) AS BIGINT) AS b_sum
       FROM documents"""

  /** Resize: decode the PNG, nearest-neighbor downsample by 2 on the
    * DECODED pixel grid (the deterministic resize kernel a libvips-style
    * vectorized resize replaces), emit resized dims + the luminance-ish
    * channel total of the sampled pixels. */
  def mmResize(t: Tables): DataFrame = {
    val in = imgTable(t).select(col("doc_id"), col("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("r_width", IntegerType, nullable = false),
      StructField("r_height", IntegerType, nullable = false),
      StructField("resized_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val img = Raster.decodePng(r.getAs[Array[Byte]](1))
        val w = img.getWidth; val h = img.getHeight
        val rw = (w + 1) / 2; val rh = (h + 1) / 2
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 2
          }
          y += 2
        }
        Row(r.getLong(0), rw, rh, sum)
      }
    }(enc)
  }
  val mmResizeSql: String =
    """SELECT doc_id,
       CAST((8 + doc_id % 9 + 1) // 2 AS INT) AS r_width,
       CAST((8 + doc_id % 7 + 1) // 2 AS INT) AS r_height,
       CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 7, 2), y ->
         list_transform(range(0, 8 + doc_id % 9, 2), x ->
             (doc_id*31 + x*7 + y*13) % 256
           + (doc_id*31 + x*7 + y*13 + 101) % 256
           + (doc_id*31 + x*7 + y*13 + 202) % 256)))) AS BIGINT) AS resized_sum
       FROM documents"""

  /** Frame sampling: each document is a "video" of `frames(id)` frames;
    * explode the sampled POSITIONS first (every 2nd frame), then render+
    * encode+decode only those — unsampled frames never touch the codec.
    * Emits per-sampled-frame decoded stats. */
  def mmFrameSample(t: Tables): DataFrame = {
    val in = t.documents.select(
      col("doc_id"),
      explode(sequence(lit(0L), col("doc_id") % 4 + lit(2L), lit(2L))).as("frame_idx"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frame_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val f = r.getLong(1).toInt
        // ties the sampler's inclusive sequence stop (doc_id%4 + 2 =
        // frames-1) to Raster.frames: render() has no bounds check, so
        // a retuned frame-count formula would otherwise sample
        // out-of-range frames without error (round-17 review)
        require(f < Raster.frames(id),
          s"frame $f out of range for doc $id (${Raster.frames(id)} frames)")
        // fetch = encode (the "storage" side) + decode (the operator)
        val img = Raster.decodePng(Raster.encodePng(Raster.render(id, f)))
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        Row(id, f.toLong, w, h, sum)
      }
    }(enc)
  }
  val mmFrameSampleSql: String =
    """SELECT doc_id, f AS frame_idx,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(8 + doc_id % 7 AS INT) AS height,
       CAST(list_sum(flatten(list_transform(range(0, 8 + doc_id % 7), y ->
         list_transform(range(0, 8 + doc_id % 9), x ->
             (doc_id*31 + f*17 + x*7 + y*13) % 256
           + (doc_id*31 + f*17 + x*7 + y*13 + 101) % 256
           + (doc_id*31 + f*17 + x*7 + y*13 + 202) % 256)))) AS BIGINT) AS frame_sum
       FROM (SELECT doc_id, unnest(range(0, 3 + doc_id % 4, 2)) AS f FROM documents) s"""

  val all: Seq[(String, Tables => DataFrame, String)] = Seq(
    ("mm_meta_only", mmMetaOnly _, mmMetaOnlySql),
    ("mm_decode_features", mmDecodeFeatures _, mmDecodeFeaturesSql),
    ("mm_resize", mmResize _, mmResizeSql),
    ("mm_frame_sample", mmFrameSample _, mmFrameSampleSql))
}
