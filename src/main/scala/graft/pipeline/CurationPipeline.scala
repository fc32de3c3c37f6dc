package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{CorpusSelection, Dedup, QualityFilters}

/** The full training-data curation DAG as ONE runnable composition of the
  * catalog's operators — what a user of the library actually executes
  * against a raw corpus. Every stage keeps the scale shape its catalog
  * query proved (doc-scoped aggs, blocked pair generation, broadcast
  * probes, hash sharding); this object only wires them together.
  *
  * Stages: normalize -> quality gates (Gopher rules x repetition) ->
  * exact dedup -> near-dup keep-list (blocked CC) -> fuzzy
  * decontamination vs an eval set -> optional token budget -> shard
  * assignment + manifest. Returns the per-doc verdict table; `write`
  * also lands shard-partitioned parquet plus the manifest.
  */
object CurationPipeline {

  final case class Config(
      tokenBudget: Option[Long] = None,
      shards: Int = 8,
      jaccardThreshold: Double = 0.6,
      contamThreshold: Double = 0.5,
      gramN: Int = 2,
      minWords: Int = 50,
      minStopHits: Int = 2)

  /** Per-document verdict table over `docs` (doc_id, text, lang,
    * n_chars, ...): every gate's outcome plus the final `curated` flag,
    * shard assignment, and token count. Pure composition — one row per
    * input doc, nothing collected.
    */
  def verdicts(docs: DataFrame, evalDocs: DataFrame,
      cfg: Config = Config()): DataFrame = {
    // materialize the normalized corpus ONCE: every gate branch below is
    // an independent subtree, so without this one verdicts() action
    // would re-run the scan + 3-regex normalization ~8 times
    val base = docs.select(col("doc_id"), col("lang"),
      TextFunctions.normalizeText(col("text")).as("text"))
      .localCheckpoint(true)

    // quality: scan-speed Gopher rules + repetition metrics (doc-scoped)
    val gopher = QualityFilters
      .gopherRules(base, "doc_id", "text", minWords = cfg.minWords,
        minStopHits = cfg.minStopHits)
      .select(col("doc_id"), col("keep").as("gopher_keep"))
    val rep = QualityFilters.repetitionMetrics(base, "doc_id", "text", cfg.gramN)
      .select(col("doc_id"), (col("ttr") >= 0.35 &&
        col("top_word_frac") <= 0.12 && col("dup_gram_frac") <= 0.1)
        .as("rep_keep"))

    // exact dedup: first doc per normalized fingerprint wins (the
    // operator's canonical_id semantics, reused not re-implemented)
    val exactKeep = base.select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .join(Dedup.exactDedup(base, "doc_id", "text"), "fp")
      .select(col("doc_id"),
        (col("doc_id") === col("canonical_id")).as("exact_keep"))

    // near-dup keep-list: bucketed jaccard pairs -> blocked CC. The
    // length bucket uses the NORMALIZED length — bucketing on raw
    // n_chars would split near-identical docs whose raw lengths diverge
    // (markup stripped by normalizeText) into different blocks and
    // never compare them
    val pairs = Dedup.jaccardPairsByCooccurrence(
      base, "doc_id", array_distinct(TextFunctions.tokens(col("text"))),
      Seq(col("lang"), floor(length(col("text")) / 50)),
      threshold = cfg.jaccardThreshold, emitBlockKey = true)
    val labels = Dedup.clusterPairsBlocked(pairs, "block_key")
      .withColumnRenamed("id", "doc_id")
    val nearKeep = base.select("doc_id").join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("cluster_id"), col("doc_id")) === col("doc_id"))
          .as("near_keep"))

    // fuzzy decontamination: eval side broadcast, corpus never shuffles.
    // The eval text normalizes through the SAME pipeline as the corpus —
    // shingling normalized train text against raw eval text would miss
    // any contamination that differs only in case/markup/whitespace.
    val evalNorm = evalDocs.select(col("doc_id"),
      TextFunctions.normalizeText(col("text")).as("text"))
    val contaminated = Dedup.minhashLshCrossMatches(
        base, "doc_id", evalNorm, "doc_id",
        "text", wordGrams = 2, k = 8, bands = 2,
        threshold = cfg.contamThreshold)
      .select(col("train_id").as("doc_id")).distinct()
      .withColumn("contaminated", lit(true))

    // LEFT joins with fail-closed defaults: a doc too short to emit
    // n-grams (repetitionMetrics) or with a null fingerprint (null/empty
    // text) must still get a verdict ROW — one row per input doc is the
    // contract — with the missing gate recorded false, not silently
    // dropped by an inner join
    base
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_toks"))
      .join(gopher, "doc_id")
      .join(rep, Seq("doc_id"), "left")
      .join(exactKeep, Seq("doc_id"), "left")
      .join(nearKeep, "doc_id")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("rep_keep", coalesce(col("rep_keep"), lit(false)))
      .withColumn("exact_keep", coalesce(col("exact_keep"), lit(false)))
      .withColumn("decontam_keep", col("contaminated").isNull)
      .drop("contaminated")
      .withColumn("curated", col("gopher_keep") && col("rep_keep") &&
        col("exact_keep") && col("near_keep") && col("decontam_keep"))
      .withColumn("shard", pmod(TextFunctions.hash48(
        col("doc_id").cast("string")), lit(cfg.shards.toLong)).cast("int"))
  }

  /** Run the DAG and land the artifacts: curated docs shard-partitioned
    * under `outDir/curated`, the per-doc verdict table under
    * `outDir/verdicts`, and the shard manifest (q115's shape) under
    * `outDir/manifest`. Returns the manifest for inspection.
    */
  def write(spark: SparkSession, docs: DataFrame, evalDocs: DataFrame,
      outDir: String, cfg: Config = Config()): DataFrame = {
    val v = verdicts(docs, evalDocs, cfg)
    v.write.mode("overwrite").parquet(s"$outDir/verdicts")
    val vv = spark.read.parquet(s"$outDir/verdicts") // reuse, don't recompute
    val kept = cfg.tokenBudget match {
      case Some(b) =>
        val sel = CorpusSelection.selectToTokenBudget(
          vv.filter(col("curated"))
            .join(docs.select(col("doc_id"), col("text")), "doc_id")
            .select(col("doc_id"),
              TextFunctions.qualityScore(col("text")).as("q"), col("n_toks")),
          "doc_id", "q", "n_toks", budget = b)
        vv.join(sel.filter(col("selected")).select("doc_id"), "doc_id")
      case None => vv.filter(col("curated"))
    }
    docs.join(kept.select("doc_id", "shard", "n_toks"), "doc_id")
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/curated")
    val manifest = kept.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"),
        pmod(sum(graft.functions.TextFunctions.hash48(
          col("doc_id").cast("string")).cast("decimal(38,0)")),
          lit(281474976710656L)).cast("long").as("checksum48"))
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }
}
