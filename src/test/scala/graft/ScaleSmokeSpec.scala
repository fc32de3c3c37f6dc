package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ts.TimeSeriesOps

/** Scale-up smoke: replicate the events table 200x (~200k rows, 20x more
  * series keys) and run the window-heavy operators end-to-end. Catches
  * formulations that only work at toy sizes (per-key memory blowups,
  * driver-side collects, grid explosions) before the cluster would.
  */
class ScaleSmokeSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val big = {
    val ev = Tables.load(spark, Sf0001, "events") // 1k rows, 20 users
    ev.crossJoin(spark.range(200).select(col("id").as("rep")))
      .select(
        (col("user_id") + col("rep") * 100).as("user_id"), // 2000 distinct keys
        col("ts"), col("value"), col("event_id"))
      .cache()
  }

  test("resample scales: 200k rows, 2000 series, hourly grid") {
    val out = TimeSeriesOps.resampleLinear(
      big.groupBy("user_id", "ts").agg(max("value").as("value")),
      "user_id", "ts", "value", 3600L)
    val n = out.count()
    // each series spans ~30 days -> ~719 ticks; 2000 series
    assert(n > 1000000L, s"unexpected grid size $n")
    assert(out.filter(col("value").isNull).count() < n / 100)
  }

  test("locf + asof scale on replicated series") {
    val withNulls = big.withColumn("v",
      when(col("event_id") % 3 === 0, col("value")))
    val locf = TimeSeriesOps.locf(withNulls, "user_id", "ts", "event_id",
      "v", "carried")
    assert(locf.filter(col("carried").isNotNull).count() > 150000L)
  }

  test("sessionize scales without per-key skew") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = big
      .withColumn("prev", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        unix_micros(col("ts")) - col("prev") > 1800000000L, 1L).otherwise(0L))
      .groupBy("user_id").agg(sum(col("new_s")).as("n_sessions"))
    val expectedKeys = big.select("user_id").distinct().count()
    assert(sessions.count() == expectedKeys)
    assert(expectedKeys >= 2000, s"replication should multiply keys: $expectedKeys")
  }
}
