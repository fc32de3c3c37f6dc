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

  test("count-min: est >= exact always, tight on a skewed stream") {
    import graft.operators.Sketches
    // zipf-ish: key i appears ceil(200/i) times
    val weighted = (1 to 300).map(i => (s"key$i", (200 / i + 1).toLong))
      .toDF("k", "cnt")
    val sketch = Sketches.cmsBuild(weighted, "k", "cnt", depth = 4, width = 256)
    val est = Sketches.cmsEstimate(weighted.select("k"), "k", sketch,
        depth = 4, width = 256)
      .as[(String, Long)].collect().toMap
    val exact = weighted.as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: est ${est(k)} < exact $c")
    }
    // the heaviest key's estimate is within the e*N/width additive bound
    val n = exact.values.sum
    val bound = math.ceil(math.E * n / 256).toLong
    assert(est("key1") - exact("key1") <= bound)
  }

  test("count-min sketches merge counter-wise: merged = whole-stream") {
    import graft.operators.Sketches
    val a = (1 to 100).map(i => (s"k${i % 7}", 1L)).toDF("k", "cnt")
    val b = (1 to 80).map(i => (s"k${i % 5}", 2L)).toDF("k", "cnt")
    val whole = Sketches.cmsBuild(
      a.union(b).groupBy("k").agg(sum($"cnt").as("cnt")),
      "k", "cnt", depth = 4, width = 64)
    val merged = Sketches.cmsBuild(a, "k", "cnt", depth = 4, width = 64)
      .union(Sketches.cmsBuild(b, "k", "cnt", depth = 4, width = 64))
      .groupBy("row", "pos").agg(sum($"c").as("c"))
    val w = whole.as[(Int, Int, Long)].collect().toSet
    val m = merged.as[(Int, Int, Long)].collect().toSet
    assert(w == m)
  }

  test("count-min: a key absent from the stream estimates 0, not a " +
      "collision artifact") {
    import graft.operators.Sketches
    val weighted = (1 to 10).map(i => (s"present$i", 5L)).toDF("k", "cnt")
    // large width => the absent key's coordinates are almost surely
    // untouched; the estimate must come back 0 (not dropped, not merged
    // from surviving coordinates)
    val sketch = Sketches.cmsBuild(weighted, "k", "cnt",
      depth = 4, width = 4096)
    val probes = Seq("definitely-absent-key-xyz").toDF("k")
    val est = Sketches.cmsEstimate(probes, "k", sketch, 4, 4096)
      .as[(String, Long)].collect().toMap
    assert(est.contains("definitely-absent-key-xyz"))
    assert(est("definitely-absent-key-xyz") == 0L)
  }

  test("count-min build is bounded by depth*width rows") {
    import graft.operators.Sketches
    val big = (1 to 5000).map(i => (s"key$i", 1L)).toDF("k", "cnt")
    val n = Sketches.cmsBuild(big, "k", "cnt", depth = 4, width = 32).count()
    assert(n <= 4L * 32L)
  }
}
