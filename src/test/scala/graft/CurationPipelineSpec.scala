package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.CurationPipeline

class CurationPipelineSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def docs = Tables.load(spark, Sf0001, "documents")
  private def evalDocs = docs.filter(col("doc_id") % 5 === 0)
  private def trainDocs = docs.filter(col("doc_id") % 5 =!= 0)
  // the synthetic corpus is 31-word soup with one Gopher stopword and
  // 10-99-word docs, so the corpus-policy knobs relax to match
  private val cfg = CurationPipeline.Config(minWords = 10, minStopHits = 1)

  test("verdicts: one row per input doc; curated == AND of all gates") {
    val v = CurationPipeline.verdicts(trainDocs, evalDocs, cfg)
    assert(v.count() == trainDocs.count())
    val bad = v.filter(col("curated") =!= (col("gopher_keep") &&
      col("rep_keep") && col("exact_keep") && col("near_keep") &&
      col("decontam_keep")))
    assert(bad.count() == 0)
    // the pipeline must actually gate something and keep something
    val n = v.count()
    val kept = v.filter(col("curated")).count()
    assert(kept > 0 && kept < n, s"kept $kept of $n")
  }

  test("write lands shard-partitioned curated docs + a consistent manifest") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val manifest = CurationPipeline.write(spark, trainDocs, evalDocs, out, cfg)
    val curated = spark.read.parquet(s"$out/curated")
    val verdicts = spark.read.parquet(s"$out/verdicts")
    // manifest totals == curated rows; every curated doc passed the gates
    val mDocs = manifest.agg(sum(col("n_docs"))).head().getLong(0)
    assert(mDocs == curated.count())
    assert(curated.join(verdicts.filter(!col("curated")), "doc_id").count() == 0)
    // shard column materialized as partition dirs
    assert(new java.io.File(s"$out/curated").listFiles()
      .count(_.getName.startsWith("shard=")) > 1)
    // re-run reproduces the identical manifest (checksums included)
    val again = CurationPipeline.write(spark, trainDocs, evalDocs,
      Files.createTempDirectory("graft-pipeline2").toString, cfg)
    assert(manifest.collect().toSet == again.collect().toSet)
  }

  test("token budget caps the kept corpus") {
    val out = Files.createTempDirectory("graft-pipeline-b").toString
    val manifest = CurationPipeline.write(spark, trainDocs, evalDocs, out,
      cfg.copy(tokenBudget = Some(3000L)))
    val total = manifest.agg(sum(col("n_toks"))).head().getLong(0)
    assert(total <= 3000L, s"budgeted total $total")
    assert(total > 0L)
  }
}
