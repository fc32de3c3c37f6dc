package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

class LanguageModelSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def docs(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "text")
  }

  private def toks = split(col("text"), " ")

  test("bigram emission: adjacent in-order pairs, short docs emit nothing") {
    val bg = LanguageModel.bigrams(docs(1 -> "a b c", 2 -> "x", 3 -> ""), "id", toks)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(bg.toSet == Set((1, "a", "b"), (1, "b", "c")))
  }

  test("bigram probabilities: deterministic context implies prob_ppb ~ 1") {
    // corpus "a b a b a b": c(a,b)=3=c(a.), c(.b)=3, T=5
    // prob(b|a) = 0.7*3/3 + 0.3*3/5 = 0.88
    val bg = LanguageModel.bigrams(docs(1 -> "a b a b a b"), "id", toks)
    val p = LanguageModel.bigramProbs(bg, 700000000L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(p(("a", "b")) == 880000000L, p.toString)
    // prob(a|b) = 0.7*2/2 + 0.3*2/5 = 0.82
    assert(p(("b", "a")) == 820000000L, p.toString)
  }

  test("per-w1 interpolated mass is at least lambda (model sanity)") {
    val bg = LanguageModel.bigrams(
      docs(1 -> "a b c a c b a", 2 -> "c a b b a c"), "id", toks)
    val sums = LanguageModel.bigramProbs(bg, 700000000L)
      .groupBy("w1").agg(sum(col("prob_ppb")).as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sum over observed w2 of c12/c1 = 1, so mass >= lambda (0.7e9),
    // up to quantization slack
    sums.values.foreach(m => assert(m >= 699999990L, sums.toString))
  }

  test("repetitive text scores higher mean_prob than novel text") {
    val s = LanguageModel.score(
      docs(1 -> "a b a b a b a b", 2 -> "c d e f g h i j"), "id", toks)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(s(1) > s(2), s.toString)
  }

  test("score excludes docs with fewer than two tokens") {
    val s = LanguageModel.score(docs(1 -> "a b", 2 -> "x"), "id", toks)
    assert(s.collect().map(_.getInt(0)).toSet == Set(1))
  }
}
