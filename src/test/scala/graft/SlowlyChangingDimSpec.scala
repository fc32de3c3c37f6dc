package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SlowlyChangingDim

class SlowlyChangingDimSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2: collapses no-op changes, chains intervals, one current row") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze", 1L),
      (1L, ts("2024-01-02 00:00:00"), "bronze", 2L), // no-op: collapsed
      (1L, ts("2024-01-03 00:00:00"), "silver", 3L),
      (1L, ts("2024-01-05 00:00:00"), "gold", 4L),
      (2L, ts("2024-01-04 00:00:00"), "bronze", 5L)
    ).toDF("user_id", "ts", "tier", "event_id")
    val h = SlowlyChangingDim
      .scd2(changes, Seq("user_id"), Seq("tier"), "ts", "event_id")
      .orderBy("user_id", "version")
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)]
      .collect()
    assert(h.length == 4) // the no-op row is gone
    val u1 = h.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq == Seq("bronze", "silver", "gold"))
    // intervals chain: each valid_to equals the next valid_from
    assert(u1(0)._4.contains(u1(1)._3) && u1(1)._4.contains(u1(2)._3))
    // exactly one current row per key, the last one
    assert(u1.count(_._6) == 1 && u1.last._6)
    assert(h.filter(_._1 == 2L).forall(r => r._6 && r._4.isEmpty))
  }

  test("scd2: same-timestamp changes order by the tiebreak column") {
    val t0 = ts("2024-01-01 00:00:00")
    val changes = Seq(
      (1L, t0, "a", 10L), (1L, t0, "b", 2L) // event 2 happened first
    ).toDF("user_id", "ts", "attr", "event_id")
    val h = SlowlyChangingDim
      .scd2(changes, Seq("user_id"), Seq("attr"), "ts", "event_id")
      .orderBy("version")
      .as[(Long, String, Timestamp, Option[Timestamp], Int, Boolean)]
      .collect()
    assert(h.map(_._2).toSeq == Seq("b", "a"))
    assert(h.last._6 && !h.head._6)
  }

  test("scd2: an attribute flapping back is a real change, not a no-op") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), "x", 1L),
      (1L, ts("2024-01-02 00:00:00"), "y", 2L),
      (1L, ts("2024-01-03 00:00:00"), "x", 3L)
    ).toDF("user_id", "ts", "attr", "event_id")
    val h = SlowlyChangingDim
      .scd2(changes, Seq("user_id"), Seq("attr"), "ts", "event_id")
    assert(h.count() == 3)
  }
}
