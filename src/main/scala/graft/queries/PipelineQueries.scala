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

  /** DuckDB replica of Multimodal.StubDecoder(16) + Similarity.norm:
    * feature i = first 24 bits of md5(utf8(text) || '|' || i) scaled to
    * [-1, 1], squashed through FLOAT, norm accumulated in list order.
    */
  lazy val stubFeaturesOracleSql: String = {
    // value of the first 6 hex chars of an md5 string `h`
    val v24 = (1 to 6).map(k =>
      s"(STRPOS('0123456789abcdef', SUBSTR(h, $k, 1)) - 1) * ${1L << (4 * (6 - k))}")
      .mkString(" + ")
    s"""WITH f AS (
        SELECT doc_id,
          LIST_TRANSFORM(
            LIST_TRANSFORM(RANGE(0, 16),
              i -> MD5(text || '|' || CAST(i AS VARCHAR))),
            h -> CAST(CAST($v24 AS DOUBLE) / 16777215.0 * 2.0 - 1.0 AS FLOAT)) AS emb
        FROM documents)
      SELECT doc_id AS media_id, 'image' AS kind,
        ROUND(SQRT(LIST_REDUCE(LIST_PREPEND(0.0,
          LIST_TRANSFORM(emb, x -> x::DOUBLE * x::DOUBLE)), (a,b) -> a+b)), 6)
          AS feat_norm
      FROM f"""
  }

  val all: Seq[Q] = Seq(
    // Stub decoder features are md5-keyed, so the oracle recomputes them
    // (and the norm) bit-for-bit from the document text.
    Q("q70_multimodal_features",
      (s, dir) => {
        val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        val feats = Multimodal.extractFeatures(media, new Multimodal.StubDecoder(16))
        feats.select(col("media_id"), col("kind"),
          round(Similarity.norm(col("embedding")), 6).as("feat_norm"))
      },
      Some(PipelineQueries.stubFeaturesOracleSql),
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

    // Sketch values are engine-specific, so the oracle checks (a) the exact
    // companions and (b) the accuracy CONTRACT: the HLL++ estimate must sit
    // within its rsd band and the approx quantiles within their rank-error
    // band of the exact quantiles — DuckDB asserts TRUE, Spark proves it.
    Q("q74_approx_sketches",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_orderkey")).as("exact_orders"),
            approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("_hll"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("_p50a"),
            percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
              .as("_p99a"),
            expr("percentile(l_extendedprice, 0.49)").as("_p49"),
            expr("percentile(l_extendedprice, 0.51)").as("_p51"),
            expr("percentile(l_extendedprice, 0.985)").as("_p985"),
            expr("percentile(l_extendedprice, 0.995)").as("_p995"))
          .select(col("l_returnflag"), col("exact_orders"),
            (abs(col("_hll") - col("exact_orders")).cast("double")
              / col("exact_orders") <= 0.05).as("hll_ok"),
            (col("_p50a") >= col("_p49") && col("_p50a") <= col("_p51"))
              .as("p50_ok"),
            (col("_p99a") >= col("_p985") && col("_p99a") <= col("_p995"))
              .as("p99_ok")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
        TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p99_ok
        FROM lineitem GROUP BY l_returnflag"""),
      "sketch aggregates for 100 TB profiling: HLL++ distinct counts + " +
        "approximate quantiles (one pass, mergeable, no exact-distinct " +
        "shuffle), accuracy-bound-checked against exact companions")
  )
}
