package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.Multimodal
import graft.operators.Similarity
import graft.sources.FileSources

/** Pipeline plumbing coverage: multimodal feature extraction (stub codec,
  * real Spark contract) and CSV/JSON source round-trips.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    // Stub decoder features are engine-specific -> rows-only driver check;
    // determinism and shape are pinned by MultimodalSpec.
    Q("q70_multimodal_features",
      (s, dir) => {
        val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16))
        feats.select(col("media_id"), col("kind"),
          round(Similarity.norm(col("embedding")), 6).as("feat_norm"))
      },
      None,
      "binary media column -> mapPartitions feature extraction (stub codec)"),

    Q("q71_frame_sample",
      (s, dir) => {
        val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text", kind = "video")
        Multimodal.sampleFrames(media, everyMs = 1000L)
          .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
            max(col("frame_ms")).as("last_frame_ms"))
      },
      Some("""SELECT doc_id AS media_id,
        CAST(CEIL((LENGTH(text) * 40) / 1000.0) AS BIGINT) AS n_frames,
        ((LENGTH(text) * 40 - 1) // 1000) * 1000 AS last_frame_ms
        FROM documents WHERE LENGTH(text) > 0"""),
      "video frame-sampling grid (explode over duration; decode is the stub step)"),

    Q("q72_csv_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "supplier")
        val tmp = java.nio.file.Files.createTempDirectory("graft-csv").toString
        FileSources.writeCsv(src, tmp)
        val back = FileSources.readCsv(s, tmp, schema = Some(src.schema))
        back.agg(count(lit(1)).as("n"),
          sum(col("s_acctbal").cast("decimal(28,8)")).cast("double").as("total_bal"),
          countDistinct(col("s_nationkey")).as("n_nations"))
      },
      Some("""SELECT COUNT(*) AS n,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS total_bal,
        COUNT(DISTINCT s_nationkey) AS n_nations
        FROM supplier"""),
      "CSV sink+source round-trip ($file_csv, SysFileCsv.cs) preserves values"),

    Q("q73_json_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "part")
        val tmp = java.nio.file.Files.createTempDirectory("graft-json").toString
        FileSources.writeJson(src, tmp)
        val back = FileSources.readJson(s, tmp, schema = Some(src.schema))
        back.agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast("decimal(28,8)")).cast("double")
            .as("total_price"),
          countDistinct(col("p_brand")).as("n_brands"))
      },
      Some("""SELECT COUNT(*) AS n,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(28,8))) AS DOUBLE) AS total_price,
        COUNT(DISTINCT p_brand) AS n_brands
        FROM part"""),
      "JSON sink+source round-trip ($file_json, SysFileJson.cs)"),

    // Sketches are approximate and engine-specific -> rows-only driver
    // check; accuracy vs exact is pinned in SketchSpec.
    Q("q74_approx_sketches",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_orderkey"), rsd = 0.02)
              .as("approx_orders"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("p50_price"),
            percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
              .as("p99_price")),
      None,
      "sketch aggregates for 100 TB profiling: HLL++ distinct counts + " +
        "approximate quantiles (one pass, mergeable, no exact-distinct shuffle)")
  )
}
