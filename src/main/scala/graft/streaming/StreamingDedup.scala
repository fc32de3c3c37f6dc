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
    */
  def admitBatch(outDb: GraftDatabase, stateTable: String, fpCol: String,
      batch: DataFrame, appId: String, batchId: Long): Unit = {
    // persist: validation and staging inside insertBatch are concurrent
    // Spark actions over `admit` — without the cache each would re-read
    // the micro-batch and re-probe the state table
    val newFps = batch.select(col(fpCol)).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
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
    } finally { newFps.unpersist(); () }
  }
}
