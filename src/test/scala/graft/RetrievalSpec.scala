package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def corpus(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "text")
  }

  private def score(df: org.apache.spark.sql.DataFrame, terms: String*) =
    Retrieval.bm25(df, "id", split(col("text"), " "), terms)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("docs without any query term are absent; hits count matched terms") {
    val s = score(corpus(
      1 -> "spark is fast",
      2 -> "ducks are birds",
      3 -> "spark hash join"), "spark", "hash")
    assert(!s.contains(2))
    assert(s(1)._1 == 1) // one distinct term matched
    assert(s(3)._1 == 2)
  }

  test("more occurrences of a term rank higher at equal doc length") {
    val s = score(corpus(
      1 -> "spark a b c",
      2 -> "spark spark b c",
      3 -> "x y z w"), "spark")
    assert(s(2)._2 > s(1)._2) // tf=2 beats tf=1, same dl
  }

  test("same tf, shorter doc ranks higher (length normalization)") {
    val s = score(corpus(
      1 -> "spark a",
      2 -> "spark a b c d e f g h"), "spark")
    assert(s(1)._2 > s(2)._2)
  }

  test("rarer term contributes more than a common one (idf ordering)") {
    // 'rare' in 1 of 4 docs, 'common' in 3 of 4 — same tf=1, same dl
    val s = score(corpus(
      1 -> "rare a b",
      2 -> "common a b",
      3 -> "common x y",
      4 -> "common p q"), "rare", "common")
    assert(s(1)._2 > s(2)._2)
  }

  test("bm25 score is monotone under BM25's exact formula on a golden case") {
    // hand-check one contribution: N=2, df=1 -> idf_ppm =
    // round(1e6 * (2 - 1 + 0.5) / 1.5) = 1_000_000; tf=1, dl=2, avgdl=2
    // -> c_n9 = round(1e6*1000 * (1*2.2) / (1 + 1.2*(0.25+0.75*1)))
    //        = round(2.2e9 / 2.2) = 1_000_000_000
    val s = score(corpus(1 -> "spark a", 2 -> "b c"), "spark")
    assert(s(1)._2 == 1000000000L, s.toString)
  }

  test("query plan: term filter runs map-side before the first exchange") {
    val df = Retrieval.bm25(
      graft.core.Tables.load(spark, Sf0001, "documents"), "doc_id",
      graft.functions.TextFunctions.tokens(col("text")),
      Seq("spark", "hash", "merge"))
    val p = df.queryExecution.executedPlan.toString
    // the isin filter must appear in the plan (applied to the exploded
    // token stream pre-shuffle) and the idf/stats joins must broadcast —
    // the corpus-sized side never shuffles for them
    assert(p.contains("INSET") || p.contains("IN ("), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
