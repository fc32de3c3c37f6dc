package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature-
  * extract / frame-sample operators.
  *
  * The Spark-side plumbing (schema, partitioning, batch-shaped
  * mapPartitions, output contracts) is real and tested; the actual codec
  * step is a clearly-marked STUB (no image/audio libraries in this
  * container — see the build brief): `StubDecoder` produces deterministic
  * hash-derived features so pipelines are testable end-to-end. Swapping in
  * a real decoder is a one-class change (implement `MediaDecoder`).
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", metaType)))

  /** Decoder contract: bytes+meta -> fixed-dim feature vector. Called once
    * per row inside mapPartitions; implementations should amortize model /
    * codec init per partition (see StubDecoder.init).
    */
  trait MediaDecoder extends Serializable {
    def dim: Int
    /** Per-partition init hook (load codec/model once per task). */
    def init(): Unit = ()
    def decode(kind: String, bytes: Array[Byte], meta: Row): Array[Float]
  }

  /** STUB decoder — deterministic fake features derived from content bytes,
    * standing in for a real image/audio codec. Feature i is the first 24
    * bits of md5(bytes ++ "|i"), scaled to [-1, 1] — md5-keyed so external
    * engines (the DuckDB oracle) can recompute the features bit-for-bit.
    */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    @transient private var md: java.security.MessageDigest = _
    override def init(): Unit =
      md = java.security.MessageDigest.getInstance("MD5")
    override def decode(kind: String, bytes: Array[Byte], meta: Row): Array[Float] = {
      if (md == null) init()
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        md.reset()
        if (bytes != null) md.update(bytes)
        md.update(("|" + i).getBytes(StandardCharsets.UTF_8))
        val d = md.digest()
        val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
        out(i) = (v.toDouble / 16777215.0 * 2.0 - 1.0).toFloat
        i += 1
      }
      out
    }
  }

  /** Feature extraction: (media table) -> (media_id, kind, embedding).
    * mapPartitions so decoder init happens once per task, not per row; the
    * input stays columnar until this operator and the output is a normal
    * DataFrame for downstream ANN/dedup operators.
    */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("embedding", ArrayType(FloatType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      decoder.init()
      rows.map { r =>
        val feats = decoder.decode(
          r.getString(kindIdx), r.getAs[Array[Byte]](bytesIdx),
          if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx))
        Row(r.getLong(idIdx), r.getString(kindIdx), feats.toSeq)
      }
    }
  }

  /** Frame sampling for video rows: emit every `everyMs` grid tick in
    * [0, duration_ms) as one output row carrying the media key + frame
    * index + timestamp. The decode of the actual frame bytes is the STUB
    * step; the explode/partition shape (one row per sampled frame,
    * repartitionable by media_id) is the real contract.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("dur"))
      .filter(col("dur").isNotNull && col("dur") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("dur") - 1, lit(everyMs))).as("frame_ms"))
      .withColumn("frame_idx", (col("frame_ms") / everyMs).cast("long"))

  /** Image resize: updates the typed metadata and routes the byte payload
    * through the codec seam. The pixel transform is the STUB step (no
    * image libs in this container — a real codec replaces `transcode`);
    * the Spark contract is real: metadata math, schema preservation, and
    * a per-partition codec-init boundary identical to extractFeatures.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int,
      transcode: (Array[Byte], Int, Int) => Array[Byte] =
        (bytes, _, _) => bytes): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(mediaSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val kind = r.getString(kindIdx)
        val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        if (kind != "image" || meta == null) Row(
          r.getLong(idIdx), kind, r.getAs[Array[Byte]](bytesIdx), meta)
        else {
          val out = transcode(r.getAs[Array[Byte]](bytesIdx), targetW, targetH)
          Row(r.getLong(idIdx), kind, out,
            Row(meta.get(0), targetW, targetH, meta.get(3), meta.get(4)))
        }
      }
    }
  }

  /** Audio chunking: one row per fixed-duration chunk within the clip
    * (sample-accurate boundaries from `sample_rate`); the decode of chunk
    * samples is the STUB step, the explode/partition shape is real.
    */
  def chunkAudio(media: DataFrame, chunkMs: Long): DataFrame =
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("meta.duration_ms").as("dur"),
        col("meta.sample_rate").as("sr"))
      .filter(col("dur").isNotNull && col("dur") > 0 && col("sr").isNotNull)
      .select(col("media_id"), col("sr"),
        explode(sequence(lit(0L), col("dur") - 1, lit(chunkMs))).as("chunk_ms"))
      .withColumn("chunk_idx", (col("chunk_ms") / chunkMs).cast("long"))
      .withColumn("start_sample", (col("chunk_ms") * col("sr") / 1000L).cast("long"))
      .drop("sr")

  /** Build a media table from text rows (test/demo helper: UTF-8 bytes as
    * the opaque payload).
    */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        lit("stub").as("format"),
        lit(64).cast("int").as("width"), lit(64).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        (length(col(textCol)) * 40L).as("duration_ms")).as("meta"))
}
