package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming twin of the batch ordered funnel (catalog q121): the per-user
  * signup -> click -> purchase stage machine maintained across
  * micro-batches with `mapGroupsWithState`.
  *
  * Semantics match the batch fold — strict forward progression, stage k+1
  * only from an event strictly later than the stage-k timestamp — with
  * the one constraint inherent to streaming: events are folded in
  * (micro-batch, ts, eventId) arrival order, so an event arriving in a
  * LATER batch with an EARLIER timestamp cannot rewind an already-taken
  * stage (batch replay is the repair path, as with any streaming
  * aggregation).
  *
  * State per user is three longs + a stage byte — O(1) per key, state
  * store bounded by live-user cardinality (add a GroupStateTimeout in
  * deployments where users churn).
  */
object StreamingFunnel {

  final case class FunnelEvent(userId: Long, tsUs: Long, eventId: Long,
      eventType: String)
  final case class FunnelState(userId: Long, stage: Int,
      t1Us: Option[Long], t2Us: Option[Long], t3Us: Option[Long])

  val stages: Seq[String] = Seq("signup", "click", "purchase")

  private final case class S(stage: Int, t1: Long, t2: Long, t3: Long)
  private val empty = S(0, Long.MinValue, Long.MinValue, Long.MinValue)

  private def advance(s: S, e: FunnelEvent): S =
    if (s.stage == 0 && e.eventType == "signup") S(1, e.tsUs, s.t2, s.t3)
    else if (s.stage == 1 && e.eventType == "click" && e.tsUs > s.t1)
      S(2, s.t1, e.tsUs, s.t3)
    else if (s.stage == 2 && e.eventType == "purchase" && e.tsUs > s.t2)
      S(3, s.t1, s.t2, e.tsUs)
    else s

  /** Per micro-batch: fold the user's events (time-ordered within the
    * batch) into the stage machine and emit the current funnel state.
    */
  def updateState(userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[(Int, Long, Long, Long)]): FunnelState = {
    var s = state.getOption
      .map(t => S(t._1, t._2, t._3, t._4)).getOrElse(empty)
    events.toSeq.sortBy(e => (e.tsUs, e.eventId)).foreach(e => s = advance(s, e))
    state.update((s.stage, s.t1, s.t2, s.t3))
    def opt(v: Long, atLeast: Int): Option[Long] =
      if (s.stage >= atLeast) Some(v) else None
    FunnelState(userId, s.stage, opt(s.t1, 1), opt(s.t2, 2), opt(s.t3, 3))
  }

  /** Wire a streaming Dataset[FunnelEvent] into the stateful funnel
    * (update mode: one row per user per batch it appears in).
    */
  def track(spark: SparkSession,
      events: Dataset[FunnelEvent]): Dataset[FunnelState] = {
    import spark.implicits._
    events
      .filter(e => stages.contains(e.eventType))
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }
}
