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

  test("gopherRules: each rule trips on its crafted violator") {
    val good = ("the cat sat and that dog ran to be of note with care " * 5).trim
    val docs = Seq(
      (1L, good),                                 // passes every rule
      (2L, "the of and " + ("x " * 5).trim),      // too few words
      (3L, good + " " + ("ab#cd " * 20).trim),    // symbol ratio > 0.1
      (4L, good + " " + ("99 " * 60).trim),       // alpha frac < 0.8
      (5L, ("walrus keeps humming bright tunes " * 12).trim), // no stopwords
      (6L, (1 to 60).map(i => s"- the bullet of $i and that").mkString("\n"))
    ).toDF("doc_id", "text")
    val r = QualityFilters.gopherRules(docs, "doc_id", "text", minWords = 20)
      .select("doc_id", "rule_word_count", "rule_symbols", "rule_alpha",
        "rule_stopwords", "rule_lines", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(r(1L)._7, "clean doc must keep")
    assert(!r(2L)._2 && !r(2L)._7, "short doc fails word count")
    assert(!r(3L)._3 && !r(3L)._7, "hash-heavy doc fails symbol rule")
    assert(!r(4L)._4 && !r(4L)._7, "digit-heavy doc fails alpha rule")
    assert(!r(5L)._5 && !r(5L)._7, "stopword-free doc fails stopword rule")
    assert(!r(6L)._6 && !r(6L)._7, "all-bullet doc fails line-shape rule")
  }

  test("gopherRules mean-word-length band catches mash and acronym soup") {
    val mash = ("pneumonoultramicroscopic " * 60).trim  // mean len 24
    val acro = ("a b c d e f g h i j " * 6).trim       // mean len 1
    val docs = Seq((1L, mash), (2L, acro)).toDF("doc_id", "text")
    val r = QualityFilters.gopherRules(docs, "doc_id", "text", minWords = 20)
      .select("doc_id", "rule_mean_len")
      .as[(Long, Boolean)].collect().toMap
    assert(!r(1L) && !r(2L))
  }

  test("bpePairCounts weights pairs by corpus word frequency") {
    val docs = Seq((1L, "aba aba cd"), (2L, "aba e")).toDF("doc_id", "text")
    val freqs = graft.operators.TokenizerTraining.wordFrequencies(docs, "text")
    val pairs = graft.operators.TokenizerTraining.bpePairCounts(freqs)
      .as[(String, Long)].collect().toMap
    // "aba" x3 contributes ab,ba each x3; "cd" x1; "e" has no pairs
    assert(pairs == Map("ab" -> 3L, "ba" -> 3L, "cd" -> 1L))
  }

  test("applyMerges: golden subword splits under DemoMerges") {
    import graft.operators.TokenizerTraining
    import org.apache.spark.sql.functions.col
    val got = Seq("hash", "key", "table", "a", "spark").toDF("w")
      .select(col("w"), TokenizerTraining.applyMerges(
        col("w"), TokenizerTraining.DemoMerges).as("sub"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("hash") == Seq("hash"))   // h a s h -> h as h -> has h -> hash
    assert(got("key") == Seq("key"))
    assert(got("table") == Seq("tab", "le"))
    assert(got("a") == Seq("a"))         // single char: no merge applies
    assert(got("spark") == Seq("s", "p", "a", "r", "k")) // untouched
  }

  test("applyMerges never merges across symbol boundaries") {
    import graft.operators.TokenizerTraining
    import org.apache.spark.sql.functions.col
    // after (t,h) builds "th", the pattern "a t" must NOT match 'a' plus
    // the prefix of the "th" symbol — correct BPE on "path" is p|a|th
    val got = Seq("path").toDF("w")
      .select(TokenizerTraining.applyMerges(
        col("w"), Seq("t" -> "h", "a" -> "t")).as("sub"))
      .head().getSeq[String](0)
    assert(got == Seq("p", "a", "th"), got.toString)
  }

  test("a learned top merge plugs into applyMerges (train -> encode)") {
    import graft.operators.TokenizerTraining
    import org.apache.spark.sql.functions.{asc, col, desc}
    val wf = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "word_cnt")
    val top = TokenizerTraining.bpePairCounts(wf)
      .orderBy(desc("merge_count"), asc("pair")).head().getString(0)
    assert(top == "es") // es and st both score 9; tiebreak picks es
    val merge = Seq(top.substring(0, 1) -> top.substring(1))
    val enc = wf.select(col("word"), TokenizerTraining.applyMerges(
        col("word"), merge).as("sub"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("newest") == Seq("n", "e", "w", "es", "t"))
    assert(enc("widest") == Seq("w", "i", "d", "es", "t"))
    assert(enc("low") == Seq("l", "o", "w"))
  }
}
