package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelState}

/** Streaming funnel: stage machine across micro-batches, batch/stream
  * parity with catalog q121 on the shared test events.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def lastStates(mem: MemoryStream[FunnelEvent]): Map[Long, FunnelState] = {
    val out = StreamingFunnel.track(spark, mem.toDS())
    val name = s"funnel_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    // update mode emits one row per (user, batch). The stage machine is
    // monotone and times freeze once a stage is taken, so the final state
    // is the max-stage row (same-stage duplicates are identical rows).
    spark.table(name).as[FunnelState].collect()
      .groupBy(_.userId).map { case (k, v) => k -> v.maxBy(_.stage) }
  }

  test("stage machine advances across micro-batches with strict progression") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    // batch 1: signup then a too-early click (same ts) — stays stage 1
    mem.addData(FunnelEvent(1L, 100L, 1L, "signup"),
      FunnelEvent(1L, 100L, 2L, "click"))
    // batch 2: click advances, purchase after it completes the funnel
    mem.addData(FunnelEvent(1L, 200L, 3L, "click"),
      FunnelEvent(1L, 300L, 4L, "purchase"),
      FunnelEvent(2L, 50L, 5L, "purchase")) // no signup: stays stage 0
    val s = lastStates(mem)
    assert(s(1L) == FunnelState(1L, 3, Some(100L), Some(200L), Some(300L)))
    assert(s(2L) == FunnelState(2L, 0, None, None, None))
  }

  test("stream-fed events reach the same final states as batch q121") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val evs = graft.core.Tables.load(spark, Sf0001, "events")
      .filter(col("event_type").isin(StreamingFunnel.stages: _*))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect().map(t => FunnelEvent(t._1, t._2, t._3, t._4))
      .sortBy(e => (e.tsUs, e.eventId))
    // feed in two arbitrary time-ordered chunks to cross a batch boundary
    val (a, b) = evs.splitAt(evs.length / 2)
    mem.addData(a.toIndexedSeq); mem.addData(b.toIndexedSeq)
    val streamed = lastStates(mem)

    val batch = SparkEntry.queries("q121_funnel_steps")(spark, Sf0001)
      .collect().map { r =>
        def opt(c: String) = if (r.isNullAt(r.fieldIndex(c))) None
          else Some(r.getAs[Long](c))
        r.getAs[Long]("user_id") -> FunnelState(r.getAs[Long]("user_id"),
          r.getAs[Int]("reached_stage"), opt("t1_us"), opt("t2_us"), opt("t3_us"))
      }.toMap
    assert(streamed == batch)
  }
}
