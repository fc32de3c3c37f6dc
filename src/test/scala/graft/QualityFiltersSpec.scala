package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityFilters

class QualityFiltersSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("repetitionMetrics matches hand-computed values") {
    val docs = Seq(
      (1L, "a b a b a b"),        // 6 toks, 2 types, top 3; 2-grams: ab,ba,ab,ba,ab -> all dup
      (2L, "w x y z"),            // all unique; 2-grams wx,xy,yz unique
      (3L, "spam spam spam spam") // 1 type; 2-grams all "spam spam"
    ).toDF("doc_id", "text")
    val m = QualityFilters.repetitionMetrics(docs, "doc_id", "text", gramN = 2)
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 6, 0.333333, 0.5, 1.0)))
    assert(m(2L) == ((2L, 4, 1.0, 0.25, 0.0)))
    assert(m(3L) == ((3L, 4, 0.25, 1.0, 1.0)))
  }

  test("repetitionMetrics drops token-less docs, keeps single-token docs") {
    val docs = Seq((1L, ""), (2L, "solo")).toDF("doc_id", "text")
    val m = QualityFilters.repetitionMetrics(docs, "doc_id", "text", gramN = 2)
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // a token-less doc has no (doc, token) rows on either engine — absent
    // by construction (and dropped by any downstream filter anyway)
    assert(!m.contains(1L))
    assert(m(2L) == ((2L, 1, 1.0, 1.0, 0.0)))
  }
}
