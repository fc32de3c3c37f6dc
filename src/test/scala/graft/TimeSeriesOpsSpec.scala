package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.ts.TimeSeriesOps

/** Golden tests for LOCF / resample / as-of semantics, hand-computed from
  * the reference's TsCollection.cs:130-233 behavior (FIXTURES.md §2).
  */
class TimeSeriesOpsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("locf carries last non-null forward per key") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L, Some(10.0)),
      ("a", ts("2024-01-01 00:01:00"), 2L, None),
      ("a", ts("2024-01-01 00:02:00"), 3L, Some(30.0)),
      ("a", ts("2024-01-01 00:03:00"), 4L, None),
      ("b", ts("2024-01-01 00:00:30"), 5L, None)
    ).toDF("k", "t", "id", "v")
    val out = TimeSeriesOps.locf(df, "k", "t", "id", "v", "carried")
      .orderBy("id").select("carried").as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), Some(30.0), Some(30.0), None))
  }

  test("resampleLinear interpolates linearly between neighbors") {
    // obs at t=30s (v=0) and t=150s (v=120): grid tick at 60s => 30,
    // at 120s => 90  (step 60s, first tick = floor(30/60)*60+60 = 60)
    val df = Seq(
      ("p", ts("2024-01-01 00:00:30"), 0.0),
      ("p", ts("2024-01-01 00:02:30"), 120.0)
    ).toDF("k", "t", "v")
    val out = TimeSeriesOps.resampleLinear(df, "k", "t", "v", 60L)
      .orderBy("grid_ts")
      .select(col("grid_ts").cast("string"), col("value"), col("interpolated"))
      .as[(String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01 00:01:00", 30.0, true),
      ("2024-01-01 00:02:00", 90.0, true)))
  }

  test("resampleLinear: exact-on-grid obs is not interpolated; tail is LOCF") {
    val df = Seq(
      ("p", ts("2024-01-01 00:01:00"), 10.0), // exactly on grid
      ("p", ts("2024-01-01 00:01:30"), 20.0),
      ("p", ts("2024-01-01 00:03:10"), 50.0)
    ).toDF("k", "t", "v")
    val out = TimeSeriesOps.resampleLinear(df, "k", "t", "v", 60L)
      .orderBy("grid_ts")
      .select(col("grid_ts").cast("string"), round(col("value"), 4), col("interpolated"))
      .as[(String, Double, Boolean)].collect().toSeq
    // tick 02:00: between 01:30(20) and 03:10(50): 20 + 30*(30/100) = 29.0
    // tick 03:00: 20 + 30*(90/100) = 47.0
    assert(out == Seq(
      ("2024-01-01 00:01:00", 10.0, false),
      ("2024-01-01 00:02:00", 29.0, true),
      ("2024-01-01 00:03:00", 47.0, true)))
  }

  test("resampleLinear: series shorter than one step yields empty grid") {
    val df = Seq(("p", ts("2024-01-01 00:00:10"), 1.0),
      ("p", ts("2024-01-01 00:00:20"), 2.0)).toDF("k", "t", "v")
    assert(TimeSeriesOps.resampleLinear(df, "k", "t", "v", 3600L).count() == 0)
  }

  test("asofJoinBackward attaches latest right at or before left ts") {
    val left = Seq(
      ("u", ts("2024-01-01 00:05:00"), 1L),
      ("u", ts("2024-01-01 00:10:00"), 2L),
      ("u", ts("2024-01-01 00:00:30"), 3L)
    ).toDF("k", "t", "lid")
    val right = Seq(
      ("u", ts("2024-01-01 00:01:00"), 100.0),
      ("u", ts("2024-01-01 00:05:00"), 200.0), // equal ts: inclusive
      ("u", ts("2024-01-01 00:09:00"), 300.0)
    ).toDF("k", "t", "payload")
    val out = TimeSeriesOps.asofJoinBackward(left, right, "k", "t", "lid",
        Seq("payload"))
      .orderBy("lid").select("payload").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(200.0), Some(300.0), None))
  }
}
