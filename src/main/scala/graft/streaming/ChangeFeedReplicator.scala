package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import graft.catalog.GraftDatabase

/** Continuous CDC replication as ONE stream: readChangeFeed (poll
  * [[GraftDatabase.changesSince]] at the source) → applyChanges (an
  * atomic, idempotent, file-granular batch at the destination) — the
  * micro-batch form of the reference's write-through replication hooks
  * (`Iot.Database/Table/TableCollection.cs` post-write events feeding a
  * second store), built on the snapshot-diff feed instead of per-row
  * callbacks so a batch's cost tracks the CHURN, not the table.
  *
  * The CURSOR is the destination's own Txn idempotence ledger entry
  * (appId → last applied source version), persisted ATOMICALLY with the
  * batch's commit — there is no side file to fsync and no window where
  * output and cursor disagree. A consumer restart resumes from the
  * ledger; a replayed batch (crash between commit and any external
  * bookkeeping) is a no-op by the same marker — exactly-once replica
  * state from at-least-once polling. A cursor below the source's vacuum
  * retention fails LOUDLY ([[GraftDatabase.changes]] refuses truncated
  * history) — re-bootstrap the replica from version 0.
  *
  * Scale posture: each micro-batch reads only the files the source
  * exchanged since the cursor and rewrites only destination files
  * holding a touched PK; an idle source costs one metadata diff per
  * poll (two snapshot resolutions, no data I/O).
  */
final class ChangeFeedReplicator(
    source: GraftDatabase, sourceTable: String,
    dest: GraftDatabase, destTable: String,
    appId: String) {

  /** Last applied source version — the persisted cursor (0 = nothing
    * applied yet: the first batch is the bootstrap snapshot load).
    */
  def cursor(): Long = dest.appliedBatch(appId).getOrElse(0L)

  private val batches = new AtomicLong(0L)
  /** Batches this instance applied (diagnostics; restarts reset it —
    * the ledger, not this counter, is the source of truth).
    */
  def appliedBatches: Long = batches.get()

  /** One micro-batch: diff everything since the persisted cursor,
    * apply it atomically, advance the ledger. Returns the cursor after
    * the step. An EMPTY feed still advances: applyChanges commits the
    * idempotence marker alone (no data file) — a cursor frozen on an
    * idle table would otherwise fall below the source's vacuum
    * retention and force a full re-bootstrap despite having missed
    * nothing, and every poll would re-diff an ever-growing range.
    */
  def replicateOnce(): Long = {
    val from = cursor()
    val (feed, head) = source.changesSince(sourceTable, from)
    if (head <= from) return from
    val f = feed.cache()
    try {
      dest.applyChanges(destTable, f, appId, head)
      batches.incrementAndGet()
      head
    } finally f.unpersist()
  }

  /** Run as a scheduled continuous query: one registered entry on the
    * shared [[ContinuousQueryService]] polling [[replicateOnce]] every
    * `intervalMillis`. The returned name unregisters it.
    */
  def start(service: ContinuousQueryService, intervalMillis: Long,
      onFailure: Throwable => Unit = _ => ()): String = {
    val name = s"cdc-$appId-$sourceTable"
    service.register(service.Config(
      name,
      s => {
        import s.implicits._
        Seq(replicateOnce()).toDF("cursor")
      },
      intervalMillis,
      onFailure = onFailure))
    name
  }
}
