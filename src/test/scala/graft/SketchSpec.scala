package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Accuracy bounds for the sketch aggregates (q74): HLL++ within its
  * configured rsd, approximate median within 2% of exact.
  */
class SketchSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("approx_count_distinct within 5% of exact per group") {
    val li = Tables.load(spark, Sf0001, "lineitem")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", rsd = 0.02).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel <= 0.05, s"$k: exact=$n approx=${approx(k)} rel=$rel")
    }
  }

  test("percentile_approx median within 2% of exact median") {
    val li = Tables.load(spark, Sf0001, "lineitem")
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0)(0)
    val approx = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(10000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"exact=$exact approx=$approx")
  }
}
