package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def media = Multimodal.mediaFromText(
    Seq((1L, "hello world"), (2L, "hello world"), (3L, "different"))
      .toDF("id", "text"), "id", "text")

  test("media table has the pinned multimodal schema") {
    assert(media.schema("bytes").dataType.typeName == "binary")
    // literals tighten nullability; names/types must match the pinned schema
    val got = media.schema("meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(got == Multimodal.metaType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("stub feature extraction is deterministic and content-addressed") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(8))
      .select($"media_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap
    assert(feats(1L).size == 8)
    assert(feats(1L) == feats(2L)) // same bytes -> same features
    assert(feats(1L) != feats(3L)) // different bytes -> different features
    // re-running produces identical output (deterministic stub)
    val again = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(8))
      .select($"media_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    assert(again == feats)
  }

  test("sampleFrames emits one row per grid tick within duration") {
    val m = Multimodal.mediaFromText(
      Seq((1L, "x" * 100)).toDF("id", "text"), "id", "text", kind = "video")
    // duration = 100*40 = 4000ms, every 1500ms -> frames at 0,1500,3000
    val frames = Multimodal.sampleFrames(m, 1500L)
      .select($"frame_ms", $"frame_idx").as[(Long, Long)].collect().toSeq.sorted
    assert(frames == Seq((0L, 0L), (1500L, 1L), (3000L, 2L)))
  }

  test("resizeImages updates meta dims, keeps schema, skips non-images") {
    val m = media // kind = image
    val resized = Multimodal.resizeImages(m, 32, 24)
    assert(resized.schema.fieldNames.toSeq == m.schema.fieldNames.toSeq)
    val dims = resized.select($"meta.width", $"meta.height").distinct().collect()
    assert(dims.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((32, 24)))
    // non-image rows pass through untouched
    val vid = Multimodal.mediaFromText(
      Seq((9L, "clip")).toDF("id", "text"), "id", "text", kind = "video")
    val out = Multimodal.resizeImages(vid, 32, 24)
      .select($"meta.width").head().getInt(0)
    assert(out == 64)
  }

  test("chunkAudio emits sample-accurate chunk boundaries") {
    val audio = Multimodal.mediaFromText(
      Seq((1L, "x" * 100)).toDF("id", "text"), "id", "text", kind = "audio")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        $"meta.format", $"meta.width", $"meta.height",
        org.apache.spark.sql.functions.lit(16000).cast("int").as("sample_rate"),
        $"meta.duration_ms"))
    // duration 4000ms, 1500ms chunks -> 0,1500,3000; samples at 16kHz
    val rows = Multimodal.chunkAudio(audio, 1500L)
      .select($"chunk_idx", $"chunk_ms", $"start_sample")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(rows == Seq((0L, 0L, 0L), (1L, 1500L, 24000L), (2L, 3000L, 48000L)))
  }
}
