package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DataQuality

class DataQualitySpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("violations are counted exactly and NULL verdicts count as failed") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -3.0), (3L, null), (null, 5.0)
    ).toDF("id", "v")
    val r = DataQuality.check(df, Seq(
        "v_positive" -> (col("v") > 0),      // -3 fails, null fails
        "id_present" -> col("id").isNotNull  // one null id
      )).collect().map(x => x.getString(0) -> (x.getLong(2), x.getBoolean(3)))
      .toMap
    assert(r("v_positive") == ((2L, false)))
    assert(r("id_present") == ((1L, false)))
  }

  test("a clean table passes every rule") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val r = DataQuality.check(df, Seq(
      "pos" -> (col("v") > 0), "id" -> col("id").isNotNull))
    assert(r.filter(!col("pass")).count() == 0)
  }

  test("all rules evaluate in one scan: single aggregate, no join") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val plan = DataQuality.check(df,
      (1 to 8).map(i => s"r$i" -> (col("v") > i))).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // one aggregate pair (partial+final), not one per rule
    assert(plan.split("HashAggregate").length <= 3, plan)
  }
}
