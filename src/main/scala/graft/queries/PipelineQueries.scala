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

  /** Scratch location for sink/source round-trips. A FIXED per-name dir
    * (overwritten each run — no per-run temp leak) under
    * SPARK_GRAFT_SCRATCH, defaulting to the local tmpdir. On a real
    * cluster the env var MUST point at a shared filesystem: a
    * driver-local path would scatter executor writes across machines
    * and the read back would be partial.
    */
  private def scratchDir(name: String): String = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      System.getProperty("java.io.tmpdir"))
    s"$base/$name"
  }

  /** DuckDB replica of Multimodal.StubDecoder(16) + Similarity.norm:
    * feature i = first 24 bits of md5(utf8(text) || '|' || i) scaled to
    * [-1, 1], squashed through FLOAT, norm accumulated in list order.
    */
  lazy val stubFeaturesOracleSql: String = {
    // value of the first 6 hex chars of an md5 string `h`
    val v24 = OracleSql.hexToBigint("h", 6)
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
        val tmp = scratchDir("graft-csv-roundtrip")
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
        val tmp = scratchDir("graft-json-roundtrip")
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

    // Beyond-reference interchange format: ORC is Spark-native columnar
    // with footer stats, so pushdown/pruning survive the round-trip (the
    // read-back applies a filter that must reach the OrcScan — gated in
    // FileSourcesSpec). Aggregates cover every physical type orders
    // carries: int64, double (decimal-accumulated), string, timestamp.
    Q("q162_orc_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "orders")
        val tmp = scratchDir("graft-orc-roundtrip")
        FileSources.writeOrc(src, tmp)
        val back = FileSources.readOrc(s, tmp, schema = Some(src.schema))
        back.filter(col("o_orderstatus") =!= "X")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(28,8)")).cast("double")
              .as("total_price"),
            countDistinct(col("o_orderstatus")).as("n_status"),
            max(col("o_orderdate")).cast("date").as("last_order"))
      },
      Some("""SELECT COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE) AS total_price,
        COUNT(DISTINCT o_orderstatus) AS n_status,
        CAST(MAX(o_orderdate) AS DATE) AS last_order
        FROM orders WHERE o_orderstatus <> 'X'"""),
      "ORC sink+source round-trip (beyond-reference columnar interchange; " +
        "filter pushdown survives into the OrcScan)"),

    // Sketch values are engine-specific, so the oracle checks (a) the exact
    // companions and (b) the accuracy CONTRACT: the HLL++ estimate must sit
    // within its rsd band and the approx quantiles within their rank-error
    // band of the exact quantiles — DuckDB asserts TRUE, Spark proves it.
    // The EXACT companions (countDistinct, percentile) are the
    // verification harness, not the production path: exact percentile
    // buffers a per-group value map (unbounded memory at 100 TB) — at
    // scale only the sketch columns run; the exact band-check runs on a
    // bounded sample or a small SF, as here.
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
        "shuffle), accuracy-bound-checked against exact companions"),

    // Sequence packing for LLM training: assign each doc to the
    // fixed-capacity token bin where its start offset falls (greedy
    // in-order fill), then report per-bin stats. Deterministic — the pack
    // order is (doc_id) within each (lang, source, shard) group. The
    // shard key (doc_id % 64) is the load-bound: (lang, source) alone is
    // content-derived with a small constant cardinality, so its dominant
    // combination (en x web) is a constant FRACTION of the corpus and its
    // window sort would serialize onto one task at 100 TB; the hash shard
    // caps every window partition at ~1/64 of a (lang, source) group —
    // raise the modulus with the corpus, exactly how real pipelines pack
    // per input shard. Packing quality is unaffected (bins are
    // per-stream; streams are a deployment choice).
    Q("q80_sequence_pack",
      (s, dir) => {
        val cap = 512
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "source", "shard").orderBy("doc_id")
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"),
            (col("doc_id") % 64).as("shard"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n_toks"))
          .withColumn("cum", sum(col("n_toks")).over(w))
          .withColumn("bin",
            floor((col("cum") - col("n_toks")) / lit(cap.toDouble)).cast("long"))
          .groupBy("lang", "source", "shard", "bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("bin_tokens"))
      },
      Some("""WITH d AS (
          SELECT lang, source, doc_id, doc_id % 64 AS shard,
            LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0)) AS n_toks
          FROM documents),
        c AS (
          SELECT lang, source, shard, doc_id, n_toks,
            SUM(n_toks) OVER (PARTITION BY lang, source, shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM d)
        SELECT lang, source, shard,
          CAST(FLOOR((cum - n_toks) / 512.0) AS BIGINT) AS bin,
          COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2, 3, 4"""),
      "sequence packing into 512-token training bins (greedy in-order, " +
        "per-shard windows so no lang-skewed sort at scale)"),

    // Stratified corpus sampling / domain mixing: deterministic Bernoulli
    // per stratum via a 24-bit md5 hash of the doc id — reproducible
    // (re-running selects the SAME docs, the property dataset curation
    // needs), shuffle-free (pure map-side filter + one partial agg), and
    // rate-exact in expectation per stratum. en is downsampled to 0.35,
    // fr to 0.8 (mix rebalancing); everything else kept.
    Q("q81_stratified_sample",
      (s, dir) => {
        val rate = when(col("lang") === "en", lit(0.35))
          .when(col("lang") === "fr", lit(0.8))
          .otherwise(lit(1.0))
        val hash24 = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long")
        Tables.load(s, dir, "documents")
          .select(col("lang"), rate.as("target_rate"),
            (hash24 < rate * lit(1 << 24)).cast("int").as("picked"))
          .groupBy("lang", "target_rate")
          .agg(count(lit(1)).as("n_total"), sum(col("picked")).as("n_sampled"))
          .select(col("lang"), col("target_rate"), col("n_total"),
            col("n_sampled"),
            round(col("n_sampled").cast("double") / col("n_total"), 6)
              .as("achieved_rate"))
      },
      Some {
        val v24 = OracleSql.hexToBigint("h", 6)
        s"""WITH d AS (
          SELECT lang,
            CASE WHEN lang = 'en' THEN 0.35
                 WHEN lang = 'fr' THEN 0.8 ELSE 1.0 END AS target_rate,
            MD5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents),
        p AS (
          SELECT lang, CAST(target_rate AS DOUBLE) AS target_rate,
            CASE WHEN CAST($v24 AS BIGINT) < target_rate * 16777216
              THEN 1 ELSE 0 END AS picked
          FROM d)
        SELECT lang, target_rate, COUNT(*) AS n_total,
          CAST(SUM(picked) AS BIGINT) AS n_sampled,
          ROUND(CAST(SUM(picked) AS DOUBLE) / COUNT(*), 6) AS achieved_rate
        FROM p GROUP BY 1, 2"""
      },
      "stratified deterministic sampling for domain mixing: md5-threshold " +
        "Bernoulli per lang (map-side only, reproducible at any scale)"),

    // The end artifact of the dedup pipeline: one keep/drop verdict per
    // document (pairs -> blocked connected components -> canonical = the
    // cluster minimum; singletons keep themselves). This is the table a
    // training run actually joins against — everything upstream (q25/q46)
    // exists to produce it.
    Q("q87_dedup_keeplist",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = graft.operators.Dedup.jaccardPairsByCooccurrence(
          docs, "doc_id",
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))),
          Seq(col("lang"), floor(col("n_chars") / 50)),
          threshold = 0.6, emitBlockKey = true)
        val labels = graft.operators.Dedup
          .clusterPairsBlocked(pairs, "block_key")
          .withColumnRenamed("id", "doc_id")
        docs.select(col("doc_id"))
          .join(labels, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"),
            (coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
              .as("keep"))
      },
      Some(PipelineQueries.keeplistOracleSql),
      "dedup keep-list: per-doc canonical id + keep/drop verdict " +
        "(the artifact a training run joins against)"),

    // The flagship curation query: one row per training-split document
    // with every gate's verdict and the final curated flag — fuzzy-dedup
    // keep (q87), repetition keep (q83), decontamination (q79; absent
    // from the overlap output = clean). This is the query a pipeline runs
    // LAST; each gate keeps its own scale shape (blocked CC, doc-scoped
    // aggs, broadcast eval set), composed by doc_id equijoins.
    Q("q91_curated_corpus",
      (s, dir) => {
        val kl = Catalog.byName("q87_dedup_keeplist").run(s, dir)
          .select(col("doc_id"), col("keep").as("dedup_keep"))
        val rf = Catalog.byName("q83_repetition_filter").run(s, dir)
          .select(col("doc_id"), col("keep").as("rep_keep"))
        val ct = Catalog.byName("q79_contamination").run(s, dir)
          .select(col("doc_id"), col("contam_ratio"))
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 5 =!= 0)
          .select("doc_id")
          .join(kl, "doc_id").join(rf, "doc_id")
          .join(ct, Seq("doc_id"), "left")
          .select(col("doc_id"), col("dedup_keep"), col("rep_keep"),
            coalesce(col("contam_ratio"), lit(0.0)).as("contam_ratio"),
            (col("dedup_keep") && col("rep_keep") &&
              coalesce(col("contam_ratio"), lit(0.0)) < 0.2).as("curated"))
      },
      Some(PipelineQueries.curatedOracleSql),
      "end-to-end corpus curation: dedup keep x repetition keep x " +
        "decontamination composed into the final training-set verdict"),

    // DSIR-shaped importance resampling (Xie et al. 2023): hashed unigram
    // buckets, target distribution from the held-out eval split
    // (doc_id%5=0), raw from the train split; per-bucket importance ratio
    // ppb-quantized (integer doc sums stay order-independent), per-doc
    // weight = mean bucket ratio. Two shuffles (256-row bucket agg + doc
    // rollup); the ratio table broadcasts to the token stream.
    Q("q93_dsir_weights",
      (s, dir) => {
        val bucket =
          conv(substring(md5(col("w")), 1, 2), 16, 10).cast("int")
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .select(col("doc_id"), bucket.as("b"))
        val bcnt = toks.groupBy("b").agg(
          sum(when(col("doc_id") % 5 === 0, 1L).otherwise(0L)).as("t_cnt"),
          sum(when(col("doc_id") % 5 =!= 0, 1L).otherwise(0L)).as("r_cnt"))
        val ratio = bcnt
          .crossJoin(broadcast(
            bcnt.agg(sum(col("t_cnt")).as("t_tot"), sum(col("r_cnt")).as("r_tot"))))
          // every factor to DOUBLE before multiplying: the LONG products
          // ((r_cnt+1)*(t_tot+256)) ANSI-overflow around 1e10 corpus
          // tokens, and the oracle's DECIMAL literal overflows DuckDB
          // even earlier; the double trees are identical on both sides,
          // so parity holds while the overflow cliff disappears
          .select(col("b"),
            round(lit(1e9) * (col("t_cnt") + lit(1L)).cast("double") *
              (col("r_tot") + lit(256L)).cast("double") /
              ((col("r_cnt") + lit(1L)).cast("double") *
                (col("t_tot") + lit(256L)).cast("double")))
              .cast("long").as("ratio_ppb"))
        toks.filter(col("doc_id") % 5 =!= 0)
          .join(broadcast(ratio), "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum(col("ratio_ppb")).as("w_sum_ppb"))
          .select(col("doc_id"), col("n_toks"),
            round(col("w_sum_ppb").cast("double") /
              (col("n_toks").cast("double") * lit(1e9)), 6).as("mean_ratio"),
            (col("w_sum_ppb") >= col("n_toks") * lit(1000000000L))
              .as("selected"))
      },
      Some("""WITH t AS (
          SELECT doc_id,
            (STRPOS('0123456789abcdef', SUBSTR(MD5(w), 1, 1)) - 1) * 16 +
            (STRPOS('0123456789abcdef', SUBSTR(MD5(w), 2, 1)) - 1) AS b
          FROM (SELECT doc_id, UNNEST(LIST_FILTER(
              REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0)) AS w
            FROM documents)),
        bc AS (
          SELECT b,
            SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS t_cnt,
            SUM(CASE WHEN doc_id % 5 <> 0 THEN 1 ELSE 0 END) AS r_cnt
          FROM t GROUP BY b),
        tot AS (SELECT SUM(t_cnt) AS t_tot, SUM(r_cnt) AS r_tot FROM bc),
        ratio AS (
          SELECT b, CAST(ROUND(
              CAST(1000000000 AS DOUBLE) * CAST(t_cnt + 1 AS DOUBLE)
                * CAST(r_tot + 256 AS DOUBLE)
              / (CAST(r_cnt + 1 AS DOUBLE) * CAST(t_tot + 256 AS DOUBLE)),
              0) AS BIGINT) AS ratio_ppb
          FROM bc, tot)
        SELECT doc_id, COUNT(*) AS n_toks,
          ROUND(CAST(SUM(ratio_ppb) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0), 6) AS mean_ratio,
          (CAST(SUM(ratio_ppb) AS BIGINT) >= COUNT(*) * 1000000000)
            AS selected
        FROM t JOIN ratio USING (b)
        WHERE doc_id % 5 <> 0
        GROUP BY doc_id"""),
      "DSIR importance resampling: hashed-unigram bucket ratios " +
        "(eval-target vs train-raw), ppb-quantized, per-doc mean weight"),

    // Domain-mixture planning (the DoReMi/data-mixing front door): per
    // source, token inventory + corpus share, and the downsample-to-min
    // acceptance rate that yields a uniform token mixture across sources.
    // One shuffle (source agg over map-side token counts); the 1-row min
    // broadcasts back.
    Q("q94_domain_mix",
      (s, dir) => {
        val perSource = Tables.load(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_toks"))
        perSource
          .crossJoin(broadcast(perSource.agg(
            sum(col("n_toks")).as("tot_toks"),
            min(col("n_toks")).as("min_toks"))))
          .select(col("source"), col("n_docs"), col("n_toks"),
            round(col("n_toks").cast("double") * lit(1e6) /
              col("tot_toks").cast("double")).cast("long").as("share_ppm"),
            round(col("min_toks").cast("double") * lit(1e6) /
              col("n_toks").cast("double")).cast("long").as("rate_ppm"))
      },
      Some("""WITH ps AS (
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0))) AS BIGINT) AS n_toks
          FROM documents GROUP BY source),
        tot AS (
          SELECT SUM(n_toks) AS tot_toks, MIN(n_toks) AS min_toks FROM ps)
        SELECT source, n_docs, n_toks,
          CAST(ROUND(CAST(n_toks AS DOUBLE) * 1000000.0
            / CAST(tot_toks AS DOUBLE), 0) AS BIGINT) AS share_ppm,
          CAST(ROUND(CAST(min_toks AS DOUBLE) * 1000000.0
            / CAST(n_toks AS DOUBLE), 0) AS BIGINT) AS rate_ppm
        FROM ps, tot"""),
      "domain-mixture planning: per-source token shares and the " +
        "downsample-to-min rates for a uniform cross-source mixture"),

    // One full-batch gradient step of a fasttext-shaped quality
    // classifier: map + ONE global aggregation (4 longs per partition
    // cross the wire). Rational fast-sigmoid + nano-quantized
    // contributions keep it bit-deterministic — see ClassifierTraining.
    Q("q98_logreg_quality_step",
      (s, dir) => {
        import graft.functions.TextFunctions.tokens
        val t = tokens(col("text"))
        val feats = Tables.load(s, dir, "documents").select(
          when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
          (size(t) / lit(100.0)).as("x1"),
          round(size(array_distinct(t)).cast("double") /
            greatest(size(t), lit(1)).cast("double"), 6).as("x2"),
          (round(aggregate(t, lit(0L), (a, w) => a + length(w)).cast("double") /
            greatest(size(t), lit(1)).cast("double"), 6) / lit(10.0)).as("x3"))
        graft.operators.ClassifierTraining.logregGradientStep(
          feats, "y", Seq("x1", "x2", "x3"),
          weights = Seq(-0.5, 0.8, 0.6, -0.4), lr = 0.1)
      },
      Some("""WITH toks AS (
          SELECT CASE WHEN lang = 'en' THEN 1.0e0 ELSE 0.0e0 END AS y,
            LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0) AS t
          FROM documents),
        f AS (
          SELECT y,
            LEN(t) / 100.0e0 AS x1,
            ROUND(CAST(LEN(LIST_DISTINCT(t)) AS DOUBLE)
              / CAST(GREATEST(LEN(t), 1) AS DOUBLE), 6) AS x2,
            ROUND(CAST(LIST_REDUCE(LIST_PREPEND(0,
                LIST_TRANSFORM(t, w -> LEN(w))), (a, b) -> a + b) AS DOUBLE)
              / CAST(GREATEST(LEN(t), 1) AS DOUBLE), 6) / 10.0e0 AS x3
          FROM toks),
        z AS (
          SELECT y, x1, x2, x3,
            -0.5e0 + (0.8e0 * x1) + (0.6e0 * x2) + (-0.4e0 * x3) AS z
          FROM f),
        p AS (
          SELECT y, x1, x2, x3,
            0.5e0 + (0.5e0 * (z / (1.0e0 + ABS(z)))) AS p
          FROM z),
        g AS (
          SELECT
            CAST(ROUND(((p - y) * 1.0e0) * 1.0e9, 0) AS BIGINT) AS nb_bias,
            CAST(ROUND(((p - y) * x1) * 1.0e9, 0) AS BIGINT) AS nb_x1,
            CAST(ROUND(((p - y) * x2) * 1.0e9, 0) AS BIGINT) AS nb_x2,
            CAST(ROUND(((p - y) * x3) * 1.0e9, 0) AS BIGINT) AS nb_x3
          FROM p)
        SELECT COUNT(*) AS n,
          ROUND(CAST(SUM(nb_bias) AS DOUBLE) / (COUNT(*) * 1.0e9), 6)
            AS grad_bias,
          ROUND(-0.5e0 - (0.1e0 * (CAST(SUM(nb_bias) AS DOUBLE)
            / (COUNT(*) * 1.0e9))), 6) AS w_bias,
          ROUND(CAST(SUM(nb_x1) AS DOUBLE) / (COUNT(*) * 1.0e9), 6)
            AS grad_x1,
          ROUND(0.8e0 - (0.1e0 * (CAST(SUM(nb_x1) AS DOUBLE)
            / (COUNT(*) * 1.0e9))), 6) AS w_x1,
          ROUND(CAST(SUM(nb_x2) AS DOUBLE) / (COUNT(*) * 1.0e9), 6)
            AS grad_x2,
          ROUND(0.6e0 - (0.1e0 * (CAST(SUM(nb_x2) AS DOUBLE)
            / (COUNT(*) * 1.0e9))), 6) AS w_x2,
          ROUND(CAST(SUM(nb_x3) AS DOUBLE) / (COUNT(*) * 1.0e9), 6)
            AS grad_x3,
          ROUND(-0.4e0 - (0.1e0 * (CAST(SUM(nb_x3) AS DOUBLE)
            / (COUNT(*) * 1.0e9))), 6) AS w_x3
        FROM g"""),
      "quality-classifier training step: full-batch logistic gradient as " +
        "map + one aggregation, rational sigmoid, nano-quantized sums"),

    // Token-budget corpus selection at bucket granularity — the "best
    // N-token corpus" gate without the global sort + running cumsum a
    // doc-precise cut would need (a total order = one partition at
    // 100 TB). Quality strata select wholesale; the boundary stratum
    // refines by deterministic hash sub-buckets. Decision tables are
    // bounded (<= 20 + 256 rows) by construction.
    Q("q101_token_budget",
      (s, dir) => {
        import graft.functions.TextFunctions.{qualityScore, tokenCount}
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), qualityScore(col("text")).as("q"),
            tokenCount(col("text")).as("n_toks"))
        graft.operators.CorpusSelection
          .selectToTokenBudget(d, "doc_id", "q", "n_toks", budget = 20000L)
          .select(col("doc_id"), col("bucket"), col("sub"), col("n_toks"),
            col("selected"))
      },
      Some(tokenBudgetOracleSql),
      "token-budget selection: bucket-granular quality cut + hash " +
        "sub-bucket boundary refinement, no global sort"),

    // Leakage-free train/heldout split: near-duplicates of a heldout doc
    // in the training split are evaluation leakage, so the split key is
    // the near-dup CLUSTER representative (q87's labels), not the doc —
    // every member of a cluster lands on the same side by construction.
    // The md5 split hash keeps the assignment deterministic and
    // engine-portable.
    Q("q102_leakage_free_split",
      (s, dir) => {
        val kl = Catalog.byName("q87_dedup_keeplist").run(s, dir)
        kl.select(col("doc_id"), col("canonical_id"),
          when((graft.functions.TextFunctions
              .hash48(col("canonical_id").cast("string")) % 10) < 8, "train")
            .otherwise("heldout").as("split"))
      },
      Some(leakageFreeSplitOracleSql),
      "cluster-aware train/heldout split: hash the near-dup cluster " +
        "representative so no near-duplicate pair straddles the split"),

    // Ingest-side data-quality gate: every declared expectation
    // evaluates in ONE scan (map + global agg, partials combine
    // map-side); the per-rule unpivot runs on the single result row.
    // The discount bound is deliberately tighter than the data so the
    // report exercises a failing rule.
    Q("q103_data_quality",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        graft.operators.DataQuality.check(li, Seq(
          "quantity_range" -> col("l_quantity").between(1, 50),
          "discount_bound" -> (col("l_discount") >= 0 && col("l_discount") <= 0.05),
          "price_positive" -> (col("l_extendedprice") > 0),
          "shipdate_present" -> col("l_shipdate").isNotNull,
          "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "orderkey_present" -> col("l_orderkey").isNotNull))
      },
      Some("""WITH s AS (
          SELECT COUNT(*) AS n_rows,
            SUM(CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE)
              THEN 1 ELSE 0 END) AS v_qr,
            SUM(CASE WHEN NOT COALESCE(l_discount >= 0 AND l_discount <= 0.05,
              FALSE) THEN 1 ELSE 0 END) AS v_db,
            SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
              THEN 1 ELSE 0 END) AS v_pp,
            SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_sp,
            SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)
              THEN 1 ELSE 0 END) AS v_rd,
            SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_op
          FROM lineitem)
        SELECT 'quantity_range' AS rule, n_rows,
          CAST(v_qr AS BIGINT) AS n_violations, v_qr = 0 AS pass FROM s
        UNION ALL SELECT 'discount_bound', n_rows,
          CAST(v_db AS BIGINT), v_db = 0 FROM s
        UNION ALL SELECT 'price_positive', n_rows,
          CAST(v_pp AS BIGINT), v_pp = 0 FROM s
        UNION ALL SELECT 'shipdate_present', n_rows,
          CAST(v_sp AS BIGINT), v_sp = 0 FROM s
        UNION ALL SELECT 'returnflag_domain', n_rows,
          CAST(v_rd AS BIGINT), v_rd = 0 FROM s
        UNION ALL SELECT 'orderkey_present', n_rows,
          CAST(v_op AS BIGINT), v_op = 0 FROM s"""),
      "data-quality expectations: null/range/domain checks, all rules " +
        "in one scan, per-rule violation report"),

    // SCD Type-2 history: the event stream becomes versioned dimension
    // rows with [valid_from, valid_to) intervals — change collapse +
    // interval assignment share one key-partitioned shuffle; event_id
    // tie-breaks same-timestamp changes for reproducible history.
    Q("q104_scd2_history",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        graft.operators.SlowlyChangingDim
          .scd2(ev, Seq("user_id"), Seq("event_type"), "ts", "event_id")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("valid_from")).as("valid_from_us"),
            unix_micros(col("valid_to")).as("valid_to_us"),
            col("version"), col("is_current"))
      },
      Some("""WITH c AS (
          SELECT user_id, event_type, ts, event_id,
            LAG(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev
          FROM events),
        k AS (
          SELECT user_id, event_type, ts, event_id
          FROM c WHERE prev IS NULL OR prev <> event_type),
        v AS (
          SELECT user_id, event_type,
            EPOCH_US(ts) AS valid_from_us,
            EPOCH_US(LEAD(ts) OVER (PARTITION BY user_id
              ORDER BY ts, event_id)) AS valid_to_us,
            CAST(ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS INT) AS version
          FROM k)
        SELECT user_id, event_type, valid_from_us, valid_to_us, version,
          valid_to_us IS NULL AS is_current
        FROM v"""),
      "SCD2 versioned history from a change stream: consecutive no-op " +
        "collapse + validity intervals, one key-partitioned shuffle"),

    // Temperature-scaled mixture weights (the multilingual/multi-domain
    // sampling rule: p_i proportional to share_i^alpha, alpha=0.5 so the
    // exponent is SQRT — correctly-rounded IEEE in both engines, unlike
    // pow/log). Weights are ppb-quantized longs BEFORE the normalizing
    // sum, so the cross-source total is order-independent. Shape: one
    // source-agg shuffle; both normalizers are 1-row broadcasts.
    Q("q107_temp_mixture",
      (s, dir) => {
        val ps = Tables.load(s, dir, "documents")
          .select(col("source"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n"))
          .groupBy("source")
          .agg(sum(col("n")).as("n_toks"))
        val w = ps
          .crossJoin(broadcast(ps.agg(sum(col("n_toks")).as("tot_toks"))))
          .select(col("source"), col("n_toks"),
            round(lit(1e9) * sqrt(col("n_toks").cast("double") /
              col("tot_toks").cast("double"))).cast("long").as("w_ppb"))
        w.crossJoin(broadcast(w.agg(sum(col("w_ppb")).as("sum_w"))))
          .select(col("source"), col("n_toks"), col("w_ppb"),
            round(lit(1e6) * col("w_ppb") / col("sum_w")).cast("long")
              .as("p_ppm"))
      },
      Some("""WITH ps AS (
          SELECT source,
            CAST(SUM(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0))) AS BIGINT) AS n_toks
          FROM documents GROUP BY source),
        tot AS (SELECT SUM(n_toks) AS tot_toks FROM ps),
        w AS (
          SELECT source, n_toks,
            CAST(ROUND(1000000000.0 * SQRT(CAST(n_toks AS DOUBLE)
              / CAST(tot_toks AS DOUBLE)), 0) AS BIGINT) AS w_ppb
          FROM ps, tot),
        sw AS (SELECT SUM(w_ppb) AS sum_w FROM w)
        SELECT source, n_toks, w_ppb,
          CAST(ROUND((1000000.0 * w_ppb) / sum_w, 0) AS BIGINT) AS p_ppm
        FROM w, sw"""),
      "temperature-scaled mixture weights (share^0.5 via sqrt): " +
        "ppb-quantized before the normalizing sum, 1-row broadcasts"),

    // Deterministic N-per-stratum sampling WITHOUT a ranking window: a
    // partitionBy(lang) row_number would serialize each language onto
    // one task (a hot language = one straggler at 100 TB); the typed
    // top-N Aggregator keeps n rows per key per partition and combines
    // map-side like any sum (operators/TopK.scala). The md5 order makes
    // the selection reproducible AND oracle-expressible — the oracle
    // ranks with the window form and must select the identical rows.
    Q("q114_stratified_topn",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            graft.functions.TextFunctions
              .hash48(col("doc_id").cast("string")).as("h"))
        graft.operators.TopK.topNPerKey(d, Seq("lang"), col("h"),
            col("doc_id"), 3)
          .select(col("lang"), col("rank"), col("id").as("doc_id"),
            col("ord").as("h"))
      },
      Some {
        val v48 = OracleSql.hexToBigint("m", 12)
        s"""WITH d AS (
            SELECT doc_id, lang,
              SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 12) AS m
            FROM documents),
          hd AS (SELECT doc_id, lang, CAST($v48 AS BIGINT) AS h FROM d)
          SELECT lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY h, doc_id) AS INT) AS rank, doc_id, h
          FROM hd QUALIFY rank <= 3"""
      },
      "deterministic N-per-stratum sample via a bounded typed top-N " +
        "Aggregator (map-side combine, no per-stratum ranking window)"),

    // The pipeline's last step: assign curated docs to training shards
    // and emit the shard manifest a trainer consumes. Assignment is a
    // pure hash (map-side, reproducible, balanced in expectation —
    // every shard's expected token share is 1/n); the manifest carries
    // an order-independent content checksum (sum of doc hashes mod
    // 2^48) so a re-run, or a trainer-side re-read, can verify shard
    // integrity without ordering guarantees. One partial-agg shuffle.
    Q("q115_shard_manifest",
      (s, dir) => {
        val h = graft.functions.TextFunctions.hash48(
          col("doc_id").cast("string"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n"),
            pmod(h, lit(8L)).cast("int").as("shard"), h.as("h"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_toks"),
            // decimal accumulate: a long sum of 2^48-sized hashes
            // overflows around 30k docs/shard — far below corpus scale
            pmod(sum(col("h").cast("decimal(38,0)")),
              lit(281474976710656L)).cast("long").as("checksum48"))
      },
      Some {
        val v48 = OracleSql.hexToBigint("m", 12)
        s"""WITH d AS (
            SELECT doc_id,
              LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
                x -> LEN(x) > 0)) AS n,
              SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 12) AS m
            FROM documents),
          hd AS (SELECT doc_id, n, CAST($v48 AS BIGINT) AS h FROM d)
          SELECT CAST(h % 8 AS INT) AS shard, COUNT(*) AS n_docs,
            CAST(SUM(n) AS BIGINT) AS n_toks,
            CAST(SUM(h) % 281474976710656 AS BIGINT) AS checksum48
          FROM hd GROUP BY 1"""
      },
      "training-shard assignment + manifest: hash sharding, per-shard " +
        "token inventory, order-independent content checksum"),

    // Materialized-view maintenance: merge a delta batch into a kept
    // aggregate WITHOUT rescanning the base — count/sum are algebraic,
    // so base + delta partials combine with a coalescing full-outer join
    // on the group key. This is the nightly-refresh shape at 100 TB: the
    // base aggregate is corpus-sized but the base *data* is never read
    // again; the full recompute the oracle runs is exactly what this
    // avoids. Decimal accumulation keeps the merge bit-equal to it.
    Q("q128_incremental_agg_merge",
      (s, dir) => {
        val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
        val ev = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"),
            col("value").cast("decimal(28,8)").as("v"))
        // each partial carries a non-null count so the merged sum can be
        // NULL exactly when the full recompute's SUM is NULL (all values
        // NULL on both sides) — coalesce(NULL,0)+coalesce(NULL,0)=0 would
        // silently diverge from SUM's all-NULL→NULL semantics
        def part(df: org.apache.spark.sql.DataFrame, n: String, sv: String,
            nn: String) =
          df.groupBy("user_id")
            .agg(count(lit(1)).as(n), sum(col("v")).as(sv),
              count(col("v")).as(nn))
        part(ev.filter(col("ts") < cutoff), "bn", "bs", "bnn")
          .join(part(ev.filter(col("ts") >= cutoff), "dn", "ds", "dnn"),
            Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_events"),
            when(coalesce(col("bnn"), lit(0L)) +
                coalesce(col("dnn"), lit(0L)) === 0L,
              lit(null).cast("double"))
              .otherwise((coalesce(col("bs"), lit(0).cast("decimal(28,8)")) +
                coalesce(col("ds"), lit(0).cast("decimal(28,8)")))
                .cast("double")).as("total_value"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1"""),
      "incremental aggregate maintenance: algebraic base+delta partial " +
        "merge equals the full recompute the oracle performs"),

    // Deterministic seeded training order: every epoch-reproducible
    // pipeline needs a *seeded* global shuffle, not rand(). Order key =
    // md5 of (seed, doc), shard = key mod N, offset = rank within the
    // shard — so the sort is per-shard (N independent bounded sorts),
    // never a single global total order.
    Q("q129_training_order",
      (s, dir) => {
        val h = graft.functions.TextFunctions.hash48(
          concat(lit("epoch7|"), col("doc_id").cast("string")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy(col("h"), col("doc_id"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), h.as("h"),
            pmod(h, lit(8L)).cast("int").as("shard"))
          .withColumn("offset", (row_number().over(w) - 1).cast("long"))
          .select("doc_id", "shard", "offset")
      },
      Some {
        val v48 = OracleSql.hexToBigint("m", 12)
        s"""WITH d AS (
            SELECT doc_id,
              SUBSTR(MD5('epoch7|' || CAST(doc_id AS VARCHAR)), 1, 12) AS m
            FROM documents),
          hd AS (SELECT doc_id, CAST($v48 AS BIGINT) AS h FROM d)
          SELECT doc_id, CAST(h % 8 AS INT) AS shard,
            ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
              AS offset
          FROM hd"""
      },
      "seeded epoch shuffle: reproducible pseudo-random training order " +
        "via hash ranking inside hash shards (per-shard sorts, no global " +
        "total-order sort)"),

    // Online corpus dedup: the change feed drives the flagship curation
    // op INCREMENTALLY, through streaming.StreamingDedup (shared with
    // the StreamingSpec replay-idempotence case). The scale-defining
    // invariant (same contract as q84/q112): THE STATE NEVER RESHUFFLES
    // -- the admitted-fingerprint state is a lakehouse TABLE seeded once
    // with the curated corpus; each micro-batch's fingerprints (bounded
    // BY the admission caps) broadcast into a map-side probe of it, plan-
    // gated to the BroadcastHashJoin shape. insertBatch's (appId,
    // batchId) ledger skips engine replays outright, and the anti-join
    // makes even a fresh-checkpoint full re-drain admit nothing -- so
    // exactly-once needs no in-memory state store and restart cost is
    // zero. Oracle: the batch recompute -- distinct incoming
    // fingerprints not already in the corpus.
    Q("q163_stream_dedup",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val corpus = docs.filter(col("doc_id") % 4 === 0)
        val incoming = docs.filter(col("doc_id") % 4 =!= 0)
        val base = java.nio.file.Files.createTempDirectory("graft-q163").toString
        val db = GraftDatabase(s, "q163", base)
          .defineTable(TableDef("inbox", "doc_id"))
        // one commit per residue class: duplicate texts land in
        // DIFFERENT commits, so the cross-batch state is what dedups them
        (1 to 3).foreach(r =>
          db.insert("inbox", incoming.filter(col("doc_id") % 4 === r)))
        // the state table, seeded with the curated corpus -- the one
        // corpus-scale shuffle, paid ONCE at bootstrap (building the
        // keep-list), never per batch. The SEED runs on the catalog
        // session (full batch shuffle width); the STREAM and its
        // per-batch work run on a scoped 8-wide session -- per-batch
        // frames are admission-bounded and AQE cannot coalesce inside
        // foreachBatch, so batch-width tiny-task fan-out is pure
        // overhead there (measured ~2x the drain at bench scale).
        val outBase =
          java.nio.file.Files.createTempDirectory("graft-q163-out").toString
        GraftDatabase(s, "q163out", outBase)
          .defineTable(TableDef("admitted", "fp"))
          .insert("admitted", corpus
            .select(md5(col("text")).as("fp")).distinct()
            .withColumn("src", lit("corpus")))
        // per-batch frames are admission-bounded: run the stream and its
        // foreachBatch work on a state-sized scoped session (see
        // GraftDatabase.scopedStreamSession for the measured rule)
        val ss = db.scopedStreamSession(statePartitions = 8)
        val outDb = GraftDatabase(ss, "q163out", outBase)
          .defineTable(TableDef("admitted", "fp"))
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q163-ck")
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q163")
          .option("table", "inbox").option("maxVersionsPerTrigger", "1").load()
          .filter(col("_change_type") === "insert")
          .select(md5(col("text")).as("fp"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.streaming.StreamingDedup.admitBatch(
              outDb, "admitted", "fp", batch, "q163-dedup", id)
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val out = outDb.table("admitted")
          .filter(col("src") === "stream").select("fp")
        // structural gate: the stream admitted exactly the batch-recompute
        // set (first-seen only -- a fingerprint repeated across commits
        // admitted once; corpus content admitted never)
        val corpusFp = corpus.select(md5(col("text")).as("fp")).distinct()
        val expect = incoming.select(md5(col("text")).as("fp")).distinct()
          .join(corpusFp, Seq("fp"), "left_anti").count()
        val got = out.count()
        require(got == expect,
          s"stream dedup: expected $expect first-seen fingerprints, got $got")
        out
      },
      Some("""SELECT DISTINCT MD5(text) AS fp FROM documents
        WHERE doc_id % 4 <> 0 AND MD5(text) NOT IN
          (SELECT MD5(text) FROM documents WHERE doc_id % 4 = 0)"""),
      "incremental corpus dedup OVER the change feed (StreamingDedup): " +
        "the admitted-fingerprint lakehouse table IS the cross-batch " +
        "state, probed map-side by each admission-bounded batch (state " +
        "never reshuffles); replay idempotent twice over (txn ledger + " +
        "anti-join)"),

    // DATABASE-LEVEL change feed (round 13): ONE stream drains EVERY
    // table of a database in commit order — `option("table", "*")`
    // multiplexes heterogeneous tables into the fixed envelope
    // (_table, _change_type, _commit_version, _row JSON). Four commits
    // across three tables, including a delete whose file-granular
    // rewrite must surface ONLY the deleted rows (copied-through rows
    // cancel); the oracle recomputes each commit's cardinality
    // relationally from the base tables.
    Q("q165_db_feed_multiplex",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import org.apache.spark.sql.streaming.Trigger
        val base = java.nio.file.Files.createTempDirectory("graft-q165").toString
        val db = GraftDatabase(s, "q165", base)
          .defineTable(TableDef("region", "r_regionkey"))
          .defineTable(TableDef("nation", "n_nationkey"))
          .defineTable(TableDef("customer", "c_custkey"))
        db.insert("region", Tables.load(s, dir, "region"))     // v1
        db.insert("nation", Tables.load(s, dir, "nation"))     // v2
        db.insert("customer", Tables.load(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal"))         // v3
        db.delete("customer", pmod(col("c_custkey"), lit(10)) === 0) // v4
        val ss = db.scopedStreamSession(statePartitions = 8)
        val outName =
          "q165_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q165-ck")
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q165")
          .option("table", "*").option("maxVersionsPerTrigger", "1").load()
          .groupBy(col("_table"), col("_change_type"), col("_commit_version"))
          .agg(count(lit(1)).as("n"))
          .writeStream.format("memory").queryName(outName)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        ss.table(outName)
      },
      Some("""SELECT 'region' AS _table, 'insert' AS _change_type,
          CAST(1 AS BIGINT) AS _commit_version, COUNT(*) AS n FROM region
        UNION ALL SELECT 'nation', 'insert', 2, COUNT(*) FROM nation
        UNION ALL SELECT 'customer', 'insert', 3, COUNT(*) FROM customer
        UNION ALL SELECT 'customer', 'delete', 4, COUNT(*) FROM customer
          WHERE c_custkey % 10 = 0"""),
      "database-level multiplexed change feed (table=*): one stream, " +
        "every table, commit-ordered envelope; per-commit diffs surface " +
        "exactly the changed rows (rewrite copies cancel)"),

    // INCREMENTAL MATERIALIZED VIEW (round 13): a grouped aggregate
    // maintained from the change feed instead of recomputed — count/sum
    // fold PURELY from each batch's insert/delete deltas (exact DECIMAL
    // state, the base table never read), min/max recompute only the
    // batch's AFFECTED groups against the base pinned at the batch's
    // own end version (withCommitVersion per-version arms), so after
    // every batch the view EQUALS the full group-by of that snapshot.
    // Per-batch cost ∝ change volume; the view is a lakehouse table
    // (mergeBatch: upserts + zero-count deletes + the idempotence
    // ledger in ONE atomic commit). The lifecycle exercises all three
    // DML shapes: two inserts, a delete (evicting group maxima), and
    // an UPDATE (delete+insert pairs in the feed). Oracle: the
    // relational recompute of the final state.
    Q("q166_mv_incremental",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import graft.streaming.{MaterializedView, MvDef}
        import org.apache.spark.sql.streaming.Trigger
        val ord = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_orderpriority",
            "o_totalprice")
        val base = java.nio.file.Files.createTempDirectory("graft-q166").toString
        val db = GraftDatabase(s, "q166", base)
          .defineTable(TableDef("sales", "o_orderkey"))
        db.insert("sales", ord.filter(col("o_orderkey") % 3 === 0)) // v1
        db.insert("sales", ord.filter(col("o_orderkey") % 3 =!= 0)) // v2
        db.delete("sales", col("o_totalprice") > 400000.0)          // v3
        db.updateMany("sales", col("o_orderstatus") === "F",
          Map("o_totalprice" -> (col("o_totalprice") + lit(7.5))))  // v4
        val mv = MvDef(source = "sales", view = "sales_mv",
          keyCols = Seq("o_orderstatus", "o_orderpriority"),
          sumCols = Seq("o_totalprice"),
          minMaxCols = Seq("o_totalprice"))
        // per-batch frames are change-volume-bounded: scoped 8-wide
        // session for the stream + its foreachBatch work (q163's rule)
        val ss = db.scopedStreamSession(statePartitions = 8)
        val sdb = GraftDatabase(ss, "q166", base)
          .defineTable(TableDef("sales", "o_orderkey"))
        val viewBase =
          java.nio.file.Files.createTempDirectory("graft-q166v").toString
        val viewDb = MaterializedView.define(
          GraftDatabase(ss, "q166v", viewBase), mv)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q166-ck")
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q166")
          .option("table", "sales").option("withCommitVersion", "true")
          .option("maxVersionsPerTrigger", "2").load()
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            MaterializedView.applyBatch(sdb, viewDb, mv, batch, "q166-mv", id)
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // structural gate: the maintained view equals the full recompute
        // over the CURRENT table (which the maintenance never ran)
        val expect = sdb.table("sales")
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(MaterializedView.SumType))
              .cast("double").as("sum_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"))
        val got = MaterializedView.read(viewDb, mv)
        val key = (r: org.apache.spark.sql.Row) =>
          r.toSeq.map(String.valueOf).mkString("|")
        val e = expect.select(col("o_orderstatus"), col("o_orderpriority"),
          col("n_rows"), col("sum_price"), col("min_price"), col("max_price"))
          .collect().map(key).toSet
        val g = got.select(col("o_orderstatus"), col("o_orderpriority"),
          col("mv_count"), col("sum_o_totalprice"),
          col("mv_min_o_totalprice"), col("mv_max_o_totalprice"))
          .collect().map(key).toSet
        require(g == e, s"materialized view diverged from recompute:\n" +
          s"view $g\nrecompute $e")
        got.select(col("o_orderstatus"), col("o_orderpriority"),
          col("mv_count").as("n_orders"),
          col("sum_o_totalprice").as("sum_price"),
          col("avg_o_totalprice").as("avg_price"),
          col("mv_min_o_totalprice").as("min_price"),
          col("mv_max_o_totalprice").as("max_price"))
      },
      Some("""WITH final AS (
          SELECT o_orderstatus, o_orderpriority,
            CASE WHEN o_orderstatus = 'F'
              THEN o_totalprice + CAST(7.5 AS DOUBLE)
              ELSE o_totalprice END AS p
          FROM orders WHERE NOT (o_totalprice > 400000.0))
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(p AS DECIMAL(28,8))) AS DOUBLE) AS sum_price,
          CAST(SUM(CAST(p AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*)
            AS avg_price,
          MIN(p) AS min_price,
          MAX(p) AS max_price
        FROM final GROUP BY o_orderstatus, o_orderpriority"""),
      "incremental materialized view over the change feed: count/sum " +
        "fold from deltas alone (exact decimal state), min/max " +
        "recompute only affected groups at the batch's end version — " +
        "snapshot-consistent after every batch, cost ∝ change volume"),

    // The PURE-DELTA materialized view (insert-only feeds — the 100 TB
    // ingest shape): count/sum/avg maintenance NEVER reads the base
    // table, proven structurally by passing a null source handle (any
    // base access would throw). Events fold in four commits; per-batch
    // cost is the batch group-by plus a bounded map-side probe of the
    // view's affected keys.
    Q("q167_mv_pure_delta",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import graft.streaming.{MaterializedView, MvDef}
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "ts", "event_type", "value")
        val base = java.nio.file.Files.createTempDirectory("graft-q167").toString
        val db = GraftDatabase(s, "q167", base)
          .defineTable(TableDef("ev", "event_id"))
        (0 to 3).foreach(r =>
          db.insert("ev", ev.filter(pmod(col("event_id"), lit(4)) === r)))
        val mv = MvDef(source = "ev", view = "ev_mv",
          keyCols = Seq("event_type", "day"), sumCols = Seq("value"))
        val ss = db.scopedStreamSession(statePartitions = 8)
        val viewBase =
          java.nio.file.Files.createTempDirectory("graft-q167v").toString
        val viewDb = MaterializedView.define(
          GraftDatabase(ss, "q167v", viewBase), mv)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q167-ck")
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q167")
          .option("table", "ev").option("maxVersionsPerTrigger", "2").load()
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("value"), col("_change_type"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            // null source: a sum-only view structurally CANNOT read the
            // base table (applyBatch would NPE) — the pure-delta proof
            MaterializedView.applyBatch(null, viewDb, mv, batch,
              "q167-mv", id)
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        MaterializedView.read(viewDb, mv)
          .select(col("event_type"), col("day"),
            col("mv_count").as("n_events"),
            col("sum_value"), col("avg_value"))
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS day,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*)
            AS avg_value
        FROM events GROUP BY event_type, CAST(ts AS DATE)"""),
      "pure-delta materialized view (insert-only feed): count/sum/avg " +
        "maintained without EVER reading the base table (null source " +
        "handle proves it structurally); exact decimal folding"),

    // MATERIALIZED VIEWS COMPOSE: the view is a lakehouse table, so its
    // OWN change feed maintains a coarser rollup — a two-level cascade
    // (events → per-(type, day) view → per-type rollup) where level 2
    // folds level 1's delete+insert delta pairs exactly like any feed
    // (sum-of-counts and sum-of-sums are themselves algebraic). Exact
    // DECIMAL folding makes the cascaded total BIT-equal to the direct
    // aggregate of the base — the oracle recomputes straight from
    // events, skipping both levels.
    Q("q168_mv_cascade",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.streaming.{MaterializedView, MvDef}
        import graft.dml.ConstrainedDml.TableDef
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.load(s, dir, "events")
          .select("event_id", "ts", "event_type", "value")
        val base = java.nio.file.Files.createTempDirectory("graft-q168").toString
        val db = GraftDatabase(s, "q168", base)
          .defineTable(TableDef("ev", "event_id"))
        (0 to 1).foreach(r =>
          db.insert("ev", ev.filter(pmod(col("event_id"), lit(2)) === r)))
        val mv1 = MvDef(source = "ev", view = "ev_mv",
          keyCols = Seq("event_type", "day"), sumCols = Seq("value"))
        val mv2 = MvDef(source = "ev_mv", view = "ev_rollup",
          keyCols = Seq("event_type"),
          sumCols = Seq(MaterializedView.CountCol,
            MaterializedView.sumCol("value")))
        val ss = db.scopedStreamSession(statePartitions = 8)
        val v1Base =
          java.nio.file.Files.createTempDirectory("graft-q168v1").toString
        val v2Base =
          java.nio.file.Files.createTempDirectory("graft-q168v2").toString
        val viewDb1 = MaterializedView.define(
          GraftDatabase(ss, "q168v1", v1Base), mv1)
        val viewDb2 = MaterializedView.define(
          GraftDatabase(ss, "q168v2", v2Base), mv2)
        def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
          q.awaitTermination()
        val ck1 = java.nio.file.Files.createTempDirectory("graft-q168-ck1")
        drain(ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q168")
          .option("table", "ev").option("maxVersionsPerTrigger", "1").load()
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("value"), col("_change_type"))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            MaterializedView.applyBatch(null, viewDb1, mv1, b, "q168-l1", id)
            ()
          }
          .option("checkpointLocation", ck1.toString)
          .trigger(Trigger.AvailableNow()).start())
        // level 2 drains LEVEL 1's OWN feed: its merge commits arrive as
        // delete+insert pairs of view rows, which fold like any deltas
        val ck2 = java.nio.file.Files.createTempDirectory("graft-q168-ck2")
        drain(ss.readStream.format("graft-changes")
          .option("baseDir", v1Base).option("name", "q168v1")
          .option("table", "ev_mv").option("maxVersionsPerTrigger", "1").load()
          .select(col("event_type"), col(MaterializedView.CountCol),
            col(MaterializedView.sumCol("value")), col("_change_type"))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            MaterializedView.applyBatch(null, viewDb2, mv2, b, "q168-l2", id)
            ()
          }
          .option("checkpointLocation", ck2.toString)
          .trigger(Trigger.AvailableNow()).start())
        val out = viewDb2.table("ev_rollup").select(
          col("event_type"),
          col(MaterializedView.CountCol).as("n_days"),
          col(MaterializedView.sumCol(MaterializedView.CountCol))
            .cast("long").as("n_events"),
          col(MaterializedView.sumCol(MaterializedView.sumCol("value")))
            .cast("double").as("sum_value"))
        // structural gate: the cascaded rollup equals the direct
        // aggregate of the base table (neither level ever read it)
        val expect = db.table("ev")
          .groupBy("event_type")
          .agg(countDistinct(to_date(col("ts"))).as("n_days"),
            count(lit(1)).as("n_events"),
            sum(col("value").cast(MaterializedView.SumType))
              .cast("double").as("sum_value"))
        val key = (r: org.apache.spark.sql.Row) =>
          r.toSeq.map(String.valueOf).mkString("|")
        val g = out.collect().map(key).toSet
        val e = expect.select(col("event_type"), col("n_days"),
          col("n_events"), col("sum_value")).collect().map(key).toSet
        require(g == e,
          s"cascaded rollup diverged:\nrollup $g\ndirect $e")
        out
      },
      Some("""SELECT event_type,
          COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value
        FROM events GROUP BY event_type"""),
      "materialized views COMPOSE: the per-(type, day) view's own " +
        "change feed maintains a per-type rollup (sum-of-counts / " +
        "sum-of-sums fold the delete+insert view deltas); the cascaded " +
        "total is bit-equal to the direct aggregate of the base"),

    // The MV applied to the CURATION pipeline: a live corpus-mix
    // monitor — per-(lang, source) document and token totals maintained
    // from the corpus table's ingest feed, staying correct through a
    // post-ingest quality DELETE (the dedup/filter shape). At 100 TB
    // the mixture dashboard that drives sampling weights cannot be a
    // full recompute per refresh; here it folds each commit's deltas
    // (token counts derived IN-STREAM by the same codegen'd whitespace
    // tokenizer the curation operators use, so the monitor needs no
    // second tokenization pass over the corpus).
    Q("q169_corpus_mix_mv",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import graft.streaming.{MaterializedView, MvDef}
        import org.apache.spark.sql.streaming.Trigger
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "text", "lang", "source", "n_chars")
        val base = java.nio.file.Files.createTempDirectory("graft-q169").toString
        val db = GraftDatabase(s, "q169", base)
          .defineTable(TableDef("corpus", "doc_id"))
        (0 to 2).foreach(r =>
          db.insert("corpus", docs.filter(pmod(col("doc_id"), lit(3)) === r)))
        // post-ingest quality gate: short documents drop OUT of the mix
        db.delete("corpus", col("n_chars") < 64)
        val mv = MvDef(source = "corpus", view = "mix",
          keyCols = Seq("lang", "source"), sumCols = Seq("n_toks"))
        val ss = db.scopedStreamSession(statePartitions = 8)
        val viewBase =
          java.nio.file.Files.createTempDirectory("graft-q169v").toString
        val viewDb = MaterializedView.define(
          GraftDatabase(ss, "q169v", viewBase), mv)
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q169-ck")
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q169")
          .option("table", "corpus").option("maxVersionsPerTrigger", "1").load()
          .select(col("lang"), col("source"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("n_toks"),
            col("_change_type"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
            MaterializedView.applyBatch(null, viewDb, mv, batch,
              "q169-mix", id)
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        viewDb.table("mix").select(col("lang"), col("source"),
          col(MaterializedView.CountCol).as("n_docs"),
          col(MaterializedView.sumCol("n_toks"))
            .cast("long").as("n_tokens"))
      },
      Some("""SELECT lang, source, COUNT(*) AS n_docs,
          CAST(SUM(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0))) AS BIGINT) AS n_tokens
        FROM documents WHERE NOT (n_chars < 64)
        GROUP BY lang, source"""),
      "live corpus-mix monitor: per-(lang, source) doc/token totals " +
        "maintained from the ingest feed through a post-ingest quality " +
        "delete — the mixture dashboard without per-refresh recompute; " +
        "in-stream tokenization, exact integer folding"),

    // POLL-based view refresh: the same fold machinery WITHOUT a
    // streaming query — refreshOnce walks the commit log from the
    // view's durable fold mark (batch ids are end versions, so calls
    // are idempotent), in admission-bounded version steps. The
    // scheduled-refresh shape a warehouse cron wants: no trigger
    // machinery, no checkpoint directory, per-call cost ∝ the changes
    // landed since the last call.
    Q("q170_mv_poll_refresh",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import graft.streaming.{MaterializedView, MvDef}
        val ord = Tables.load(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_orderpriority",
            "o_totalprice")
        val base = java.nio.file.Files.createTempDirectory("graft-q170").toString
        val db = GraftDatabase(s, "q170", base)
          .defineTable(TableDef("ord", "o_orderkey"))
        val mv = MvDef(source = "ord", view = "by_prio",
          keyCols = Seq("o_orderpriority"), sumCols = Seq("o_totalprice"),
          minMaxCols = Seq("o_totalprice"))
        val viewBase =
          java.nio.file.Files.createTempDirectory("graft-q170v").toString
        val viewDb = MaterializedView.define(
          GraftDatabase(s, "q170v", viewBase), mv)
        // refresh #1 catches up the two inserts
        db.insert("ord", ord.filter(col("o_orderkey") % 2 === 0)) // v1
        db.insert("ord", ord.filter(col("o_orderkey") % 2 =!= 0)) // v2
        MaterializedView.refreshOnce(db, viewDb, mv)
        // churn lands between refreshes; refresh #2 folds exactly it
        db.delete("ord", col("o_totalprice") < 5000.0)            // v3
        db.updateMany("ord", col("o_orderstatus") === "O",
          Map("o_totalprice" -> (col("o_totalprice") + lit(2.5)))) // v4
        MaterializedView.refreshOnce(db, viewDb, mv)
        require(MaterializedView.lastFoldedVersion(viewDb, mv)
          .contains(4L), "fold mark must sit at the head")
        MaterializedView.read(viewDb, mv)
          .select(col("o_orderpriority"),
            col("mv_count").as("n_orders"),
            col("sum_o_totalprice").as("sum_price"),
            col("mv_min_o_totalprice").as("min_price"),
            col("mv_max_o_totalprice").as("max_price"))
      },
      Some("""WITH final AS (
          SELECT o_orderpriority,
            CASE WHEN o_orderstatus = 'O'
              THEN o_totalprice + CAST(2.5 AS DOUBLE)
              ELSE o_totalprice END AS p
          FROM orders WHERE NOT (o_totalprice < 5000.0))
        SELECT o_orderpriority, COUNT(*) AS n_orders,
          CAST(SUM(CAST(p AS DECIMAL(28,8))) AS DOUBLE) AS sum_price,
          MIN(p) AS min_price, MAX(p) AS max_price
        FROM final GROUP BY o_orderpriority"""),
      "poll-based materialized-view refresh (no stream): refreshOnce " +
        "walks the log from the durable fold mark in bounded version " +
        "steps, idempotent by end-version batch ids — scheduled-" +
        "refresh cost ∝ changes since the last call"),
  )

  /** The q87 keep-list oracle nested verbatim, split-assigned by the
    * same md5 fold of the canonical id (first 12 hex digits mod 10).
    */
  lazy val leakageFreeSplitOracleSql: String = {
    val v48 = OracleSql.hexToBigint("h", 12)
    s"""WITH kl AS ($keeplistOracleSql),
      kh AS (
        SELECT doc_id, canonical_id,
          SUBSTR(MD5(CAST(canonical_id AS VARCHAR)), 1, 12) AS h
        FROM kl)
      SELECT doc_id, canonical_id,
        CASE WHEN ($v48) % 10 < 8 THEN 'train' ELSE 'heldout' END AS split
      FROM kh"""
  }

  /** DuckDB replica of CorpusSelection.selectToTokenBudget(budget=20k,
    * 20 quality buckets, 256 md5 sub-buckets) over qualityScore/
    * tokenCount: same bucket cut (max bucket whose best-first inclusive
    * cumsum overflows) and same ascending sub-bucket refinement.
    */
  lazy val tokenBudgetOracleSql: String = {
    val v48 = OracleSql.hexToBigint("h", 12)
    s"""WITH t AS (
        SELECT doc_id, text,
          LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
            x -> LEN(x) > 0) AS toks
        FROM documents),
      d AS (
        SELECT doc_id, ROUND((
            LEAST(CAST(LEN(toks) AS DOUBLE) / 100.0, 1.0)
            + (1.0 - LEAST(CAST(LENGTH(text) - LENGTH(
                REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                / GREATEST(LENGTH(text), 1) * 5, 1.0))
            + LEAST(CAST(LEN(LIST_FILTER(toks,
                x -> x IN ('the','a','an','of','and','to','in','is','on','for')))
                AS DOUBLE) / GREATEST(LEN(toks), 1) * 10, 1.0)
          ) / 3, 6) AS q,
          LEN(toks) AS n_toks,
          SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 12) AS h
        FROM t),
      b AS (
        SELECT doc_id, n_toks,
          LEAST(CAST(FLOOR(q * 20) AS INT), 19) AS bucket,
          CAST(($v48) % 256 AS INT) AS sub
        FROM d),
      bt AS (SELECT bucket, SUM(n_toks) AS btoks FROM b GROUP BY bucket),
      bc AS (SELECT bucket, btoks,
          SUM(btoks) OVER (ORDER BY bucket DESC) AS cum_incl FROM bt),
      cut AS (SELECT COALESCE(MAX(bucket), -1) AS cutoff
        FROM bc WHERE cum_incl > 20000),
      above AS (SELECT COALESCE(SUM(btoks), 0) AS above_toks
        FROM bt, cut WHERE bucket > cutoff),
      st AS (SELECT sub, SUM(n_toks) AS stoks
        FROM b, cut WHERE bucket = cutoff GROUP BY sub),
      sc AS (SELECT sub, SUM(stoks) OVER (ORDER BY sub ASC) AS scum FROM st),
      ssel AS (SELECT sub FROM sc, above WHERE scum <= 20000 - above_toks)
      SELECT b.doc_id, b.bucket, b.sub, CAST(b.n_toks AS BIGINT) AS n_toks,
        (b.bucket > cutoff OR (b.bucket = cutoff
          AND b.sub IN (SELECT sub FROM ssel))) AS selected
      FROM b, cut"""
  }

  /** The q87 oracle, factored for reuse by q91's composition. */
  lazy val keeplistOracleSql: String =
    """WITH RECURSIVE d AS (
        SELECT doc_id, lang, CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket,
          LIST_DISTINCT(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0)) AS toks
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS id1, b.doc_id AS id2
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
            / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 1), 6) >= 0.6),
      edges AS (
        SELECT id1 AS src, id2 AS dst FROM pairs
        UNION SELECT id2, id1 FROM pairs),
      reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
      labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      SELECT doc_id,
        COALESCE(l.cluster_id, doc_id) AS canonical_id,
        (COALESCE(l.cluster_id, doc_id) = doc_id) AS keep
      FROM documents LEFT JOIN labels l ON l.id = documents.doc_id"""

  /** q91's oracle: the q87/q83/q79 oracles verbatim as nested-WITH CTEs
    * (each one is a complete SELECT), composed by doc_id equijoins — so
    * the composition is checked against the same per-gate SQL already
    * proven against each individual query.
    */
  lazy val curatedOracleSql: String = {
    def oracleOf(name: String): String =
      TextQueries.all.find(_.name == name).get.oracle.get
    s"""WITH kl AS ($keeplistOracleSql),
      rf AS (${oracleOf("q83_repetition_filter")}),
      ct AS (${oracleOf("q79_contamination")})
      SELECT d.doc_id, kl.keep AS dedup_keep, rf.keep AS rep_keep,
        COALESCE(ct.contam_ratio, 0.0) AS contam_ratio,
        (kl.keep AND rf.keep AND COALESCE(ct.contam_ratio, 0.0) < 0.2)
          AS curated
      FROM documents d
      JOIN kl ON kl.doc_id = d.doc_id
      JOIN rf ON rf.doc_id = d.doc_id
      LEFT JOIN ct ON ct.doc_id = d.doc_id
      WHERE d.doc_id % 5 <> 0"""
  }
}
