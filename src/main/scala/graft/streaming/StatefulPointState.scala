package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming current-state: the IotValue 17-slot state maintained
  * per point across micro-batches with `mapGroupsWithState` — the
  * streaming twin of the batch `model.PrioritySlots` aggregator (and of
  * the reference's in-memory current value updated by the write-behind
  * queue, `TableCollection.cs:1419-1433`).
  *
  * State per key is 17 fixed slots — O(1) regardless of stream length —
  * so state store size is bounded by live key cardinality.
  */
object StatefulPointState {

  final case class Write(key: Long, priority: Int, value: String,
      tsUs: Long, tie: Long)
  final case class SlotState(values: Seq[String], tsUs: Seq[Long],
      ties: Seq[Long])
  final case class PointState(key: Long, resolved: Option[String],
      priority: Option[Int], nWrites: Long)

  val emptySlots: SlotState =
    SlotState(Seq.fill(17)(null), Seq.fill(17)(Long.MinValue),
      Seq.fill(17)(Long.MinValue))

  private final case class Tracked(slots: SlotState, nWrites: Long)

  private def later(aTs: Long, aTie: Long, bTs: Long, bTie: Long): Boolean =
    aTs > bTs || (aTs == bTs && aTie > bTie)

  private def applyWrite(s: SlotState, w: Write): SlotState = {
    if (w.priority < 1 || w.priority > 17 || w.value == null) s
    else {
      val i = w.priority - 1
      if (s.values(i) == null || later(w.tsUs, w.tie, s.tsUs(i), s.ties(i)))
        SlotState(s.values.updated(i, w.value), s.tsUs.updated(i, w.tsUs),
          s.ties.updated(i, w.tie))
      else s
    }
  }

  private def resolve(s: SlotState): (Option[String], Option[Int]) =
    // slots 1-16 only: slot 17 stores the query configuration and never
    // resolves (IotValue.cs Value getter iterates i < Values.Length - 1)
    s.values.take(16).zipWithIndex.collectFirst {
      case (v, i) if v != null => (Some(v), Some(i + 1))
    }.getOrElse((None, None))

  /** Per micro-batch: fold the batch's writes into the per-key slot state
    * and emit the resolved current value.
    */
  def updateState(key: Long, writes: Iterator[Write],
      state: GroupState[SlotState]): PointState = {
    var slots = state.getOption.getOrElse(emptySlots)
    var n = 0L
    writes.foreach { w => slots = applyWrite(slots, w); n += 1 }
    state.update(slots)
    val (resolved, priority) = resolve(slots)
    PointState(key, resolved, priority, n)
  }

  /** Wire a streaming Dataset[Write] into the stateful current-state
    * tracker (update mode: one row per key per batch it appears in).
    */
  def track(spark: SparkSession, writes: Dataset[Write]): Dataset[PointState] = {
    import spark.implicits._
    writes
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }
}
