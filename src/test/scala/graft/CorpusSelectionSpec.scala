package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusSelection

class CorpusSelectionSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def mkDocs(n: Int) =
    (1 to n).map { i =>
      // quality spread over [0,1); token counts 50..149
      (i.toLong, (i % 100) / 100.0, 50L + i % 100)
    }.toDF("doc_id", "q", "n_toks")

  test("selected token sum is <= budget and within one sub-bucket of it") {
    val docs = mkDocs(500)
    val total = docs.agg(sum($"n_toks")).head().getLong(0)
    val budget = total / 3
    val r = CorpusSelection.selectToTokenBudget(docs, "doc_id", "q",
      "n_toks", budget)
    val selected = r.filter($"selected").agg(sum($"n_toks")).head().getLong(0)
    assert(selected <= budget, s"$selected > $budget")
    // granularity: adding any one unselected boundary sub-bucket must
    // overflow — the selection is maximal at its granularity
    val cutoff = r.filter($"selected").agg(min($"bucket")).head().getInt(0)
    val nextSub = r.filter(!$"selected" && $"bucket" === cutoff)
      .groupBy($"sub").agg(sum($"n_toks").as("t"))
      .orderBy($"sub").limit(1).collect()
    nextSub.foreach(row => assert(selected + row.getLong(1) > budget))
  }

  test("quality ordering: every selected doc's bucket >= every dropped " +
      "doc's bucket, except inside the boundary stratum") {
    val docs = mkDocs(300)
    val r = CorpusSelection
      .selectToTokenBudget(docs, "doc_id", "q", "n_toks", budget = 8000L)
      .select($"bucket", $"selected").as[(Int, Boolean)].collect()
    val minSel = r.filter(_._2).map(_._1).min
    val maxDrop = r.filterNot(_._2).map(_._1).max
    assert(maxDrop <= minSel)
  }

  test("a budget covering the whole corpus selects everything") {
    val docs = mkDocs(50)
    val r = CorpusSelection
      .selectToTokenBudget(docs, "doc_id", "q", "n_toks", budget = 10000000L)
    assert(r.filter(!$"selected").count() == 0L)
  }

  test("null quality ranks worst: scored docs fill the budget first") {
    val docs = Seq(
      (1L, Some(0.9), 100L), (2L, Some(0.8), 100L),
      (3L, None, 100L), (4L, None, 100L))
      .toDF("doc_id", "q", "n_toks")
    val r = CorpusSelection
      .selectToTokenBudget(docs, "doc_id", "q", "n_toks", budget = 200L)
    val sel = r.filter($"selected").select($"doc_id").as[Long].collect().toSet
    assert(sel == Set(1L, 2L)) // null-quality docs never displace scored ones
    // and with room for everything, null-quality docs are still eligible
    val all = CorpusSelection
      .selectToTokenBudget(docs, "doc_id", "q", "n_toks", budget = 1000L)
    assert(all.filter($"selected").count() == 4L)
  }

  test("a zero budget selects nothing") {
    val docs = mkDocs(50)
    val r = CorpusSelection
      .selectToTokenBudget(docs, "doc_id", "q", "n_toks", budget = 0L)
    assert(r.filter($"selected").count() == 0L)
  }
}
