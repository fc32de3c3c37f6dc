package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TopK

class TopKSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def sample = Seq(
    ("a", 5L, 1L), ("a", 3L, 2L), ("a", 3L, 3L), ("a", 9L, 4L),
    ("b", 1L, 5L), ("b", 2L, 6L),
    ("c", 7L, 7L)).toDF("k", "h", "id")

  test("topNPerKey matches the ranking-window form exactly") {
    val got = TopK.topNPerKey(sample, Seq("k"), col("h"), col("id"), 2)
      .select("k", "rank", "id").as[(String, Int, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy(col("h"), col("id"))
    val want = sample.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("k", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(got == want)
    // ties on h break by id: (a,3,2) before (a,3,3)
    assert(got.contains(("a", 1, 2)) && got.contains(("a", 2, 3)))
  }

  test("keys with fewer than n rows keep everything; ranks stay dense") {
    val got = TopK.topNPerKey(sample, Seq("k"), col("h"), col("id"), 3)
    assert(got.filter(col("k") === "c").count() == 1)
    assert(got.filter(col("k") === "b").count() == 2)
    val ranks = got.filter(col("k") === "a").select("rank")
      .as[Int].collect().sorted.toSeq
    assert(ranks == Seq(1, 2, 3))
  }

  test("selection is invariant under repartitioning (map-side combine law)") {
    val big = spark.range(2000).select(
      (col("id") % 7).cast("string").as("k"),
      pmod(col("id") * 2654435761L, lit(1000003L)).as("h"), col("id"))
    def run(df: org.apache.spark.sql.DataFrame) =
      TopK.topNPerKey(df, Seq("k"), col("h"), col("id"), 5)
        .select("k", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(run(big) == run(big.repartition(17)))
  }

  test("q114's plan has no Window and a partial aggregation phase") {
    val p = SparkEntry.queries("q114_stratified_topn")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_"), p)
  }
}
