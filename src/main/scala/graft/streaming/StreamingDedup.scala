package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.catalog.GraftDatabase

/** Table-as-state streaming dedup — the continuous-ingestion shape of
  * the curation pipeline (q163; the incremental twin of
  * `operators.Dedup`'s batch detectors).
  *
  * The admitted-fingerprint LAKEHOUSE TABLE is the cross-batch state:
  * seed it once with the curated corpus, then feed each micro-batch
  * through [[admitBatch]]. Scale invariants, enforced in-plan:
  *
  *   - THE STATE NEVER RESHUFFLES: the batch's fingerprints (bounded by
  *     the change feed's admission caps) broadcast into a left-semi
  *     probe of the state table — gated to the BroadcastHashJoin shape —
  *     and the constraint checks behind `insertBatch` put the table on
  *     the probe side too (ConstrainedDml's direction note), so
  *     per-batch cost is map-side scans of the fingerprint column plus
  *     batch-sized work, no table-scale shuffle or broadcast.
  *   - EXACTLY-ONCE twice over — with one rule: THE appId IS SCOPED TO
  *     A CHECKPOINT LINEAGE. Within one lineage, `insertBatch`'s
  *     (appId, batchId) ledger skips engine-level replays outright (no
  *     empty commits, no probe work) — sound because the engine replays
  *     a batchId with identical contents. A FRESH checkpoint is a NEW
  *     consumer whose batch numbering restarts at 0: give it a NEW
  *     appId, or the ledger would silently skip batches that now carry
  *     never-processed data. Under a new appId the anti-join absorbs
  *     the re-drain — already-admitted content admits nothing.
  *     StreamingSpec pins both mechanisms separately.
  *   - State growth = new distinct content only.
  */
object StreamingDedup {

  /** Process one micro-batch: admit the batch's first-seen fingerprints
    * into `stateTable` (schema: fpCol + src), skipping content already
    * admitted by the corpus seed or any earlier batch.
    *
    * CONCURRENT MAINTENANCE: the state table is long-lived and growing,
    * so production runs OPTIMIZE/vacuum against it while the stream is
    * live. An OPTIMIZE commit interleaving with this batch's commit is
    * a genuine write-write conflict (the insert's Add is absolute, the
    * compaction's Patch touches the same table) — the loser re-probes
    * the FRESH state and retries, which is always safe here: the (appId,
    * batchId) ledger makes a replay a no-op, and re-deriving the
    * admit set against the post-OPTIMIZE state is semantically identical
    * (compaction never changes row content). Returns the number of
    * conflict retries (0 on the uncontended path) so callers/specs can
    * observe contention.
    */
  def admitBatch(outDb: GraftDatabase, stateTable: String, fpCol: String,
      batch: DataFrame, appId: String, batchId: Long): Int = {
    // persist: validation and staging inside insertBatch are concurrent
    // Spark actions over `admit` — without the cache each would re-read
    // the micro-batch and re-probe the state table
    val newFps = batch.select(col(fpCol)).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var retries = 0
      var done = false
      while (!done) {
        try {
          admitOnce(outDb, stateTable, fpCol, newFps, appId, batchId)
          done = true
        } catch {
          case e: graft.catalog.TxLog.ConflictException =>
            retries += 1
            if (retries > MaxConflictRetries) throw new IllegalStateException(
              s"StreamingDedup($stateTable): batch $batchId lost " +
                s"$retries consecutive commit races — maintenance is " +
                "churning the state table faster than batches land", e)
            conflictRetries.incrementAndGet()
            // brief jittered backoff: the maintenance commit that beat
            // us is already durable; re-probe against it
            Thread.sleep(25L + scala.util.Random.nextInt(50))
        }
      }
      retries
    } finally { newFps.unpersist(); () }
  }

  /** One attempt: probe the CURRENT state snapshot, gate the plan,
    * commit through the idempotence ledger.
    */
  private def admitOnce(outDb: GraftDatabase, stateTable: String,
      fpCol: String, newFps: DataFrame, appId: String,
      batchId: Long): Unit = {
    val dup = outDb.table(stateTable)
      .join(broadcast(newFps), Seq(fpCol), "left_semi").select(fpCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // plan gate (typed — see PlanGates): the state-table probe must
      // be a broadcast hash join (batch broadcasts, state table only
      // scans); a sort-merge or shuffled-hash here would reshuffle
      // the table-scale state every batch
      graft.plans.PlanGates.assertBroadcastProbe(dup,
        s"StreamingDedup($stateTable)")
      val admit = newFps
        .join(broadcast(dup), Seq(fpCol), "left_anti")
        .withColumn("src", lit("stream"))
      outDb.insertBatch(stateTable, admit, appId, batchId)
      ()
    } finally { dup.unpersist(); () }
  }

  /** Bound on consecutive lost commit races before failing loudly. */
  val MaxConflictRetries: Int = 50

  /** Process-wide count of admit-batch commit retries (contention
    * observability for SCALE.md / specs). Monotonic, never reset.
    */
  val conflictRetries = new java.util.concurrent.atomic.AtomicLong(0L)
}
