package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming ingest re-expressing the reference's write-behind queues
  * (SURVEY §2.8: `TableCollection.cs:1411-1433` fans inserts out to the
  * main store, time-series store and blockchain asynchronously;
  * `TsCollection.FlushQueue` drains ≤5000 items/tick).
  *
  * Spark-native form: one Structured Streaming query with `foreachBatch`
  * fanning each micro-batch out to the main, time-series and audit sinks —
  * the micro-batch IS the flush tick, and backpressure replaces the queue
  * bound. Event-time correctness (watermarks, windows, in-stream dedup) is
  * added capability the reference lacks (it appends in arrival order and
  * corrupts deltas on out-of-order input, `DeltaT.cs:14-26`).
  */
object IngestPipeline {

  /** Fan a point-event stream out to (a) the raw fact sink, (b) an hourly
    * per-key rollup, (c) an audit log with per-row content hashes. Parquet
    * sinks partitioned by event date — the 100 TB layout (date partitions ×
    * key-hash files).
    */
  def fanOut(
      events: DataFrame, // streaming: (key, ts, value, ...)
      factDir: String, rollupDir: String, auditDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    events.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.withColumn("date", to_date(col("ts"))).cache()
        try {
          b.write.mode("append").partitionBy("date").parquet(factDir)
          b.groupBy(col("key"), window(col("ts"), "1 hour").as("w"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
            .select(col("key"), col("w.start").as("window_start"),
              col("n"), col("total"))
            .write.mode("append").parquet(rollupDir)
          b.select(col("key"), col("ts"),
              sha2(concat_ws("-", unix_micros(col("ts")).cast("string"),
                col("value").cast("string")), 256).as("hash"),
              lit(batchId).as("batch_id"))
            .write.mode("append").parquet(auditDir)
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** Event-time hourly aggregation with a watermark: the streaming twin of
    * q33_tumbling_window. Late data beyond `lateness` is dropped — a
    * declared policy where the reference silently corrupts (SURVEY §2.8).
    */
  def hourlyAgg(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("key"),
        col("n"), col("total"))

  /** In-stream exact dedup on (key, ts) within the watermark — the
    * streaming form of the TS ingest dedup (TsCollection.cs:43-103).
    */
  def dedupWithinWatermark(events: DataFrame,
      lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("key", "ts")

  /** In-stream corpus dedup — the streaming twin of exact dedup (q23):
    * drop any document whose normalized-content fingerprint was already
    * seen within the watermark. State is one fingerprint per distinct doc
    * bounded by the lateness horizon (RocksDB-spillable at scale), so a
    * 100 TB/day firehose holds state only for the dedup window, never the
    * corpus.
    */
  def dedupByContent(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text", lateness: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming curation gate: the ingest-path form of the batch curation
    * verdict (q91) — every arriving document is admitted only when it
    * (a) is not an in-stream duplicate within the watermark,
    * (b) passes the shuffle-free Gopher document-quality rules, and
    * (c) does not near-duplicate the EXISTING store, probed against a
    *     static keep-list/fingerprint table by broadcast (stream-static
    *     join: the static side is re-read per micro-batch, the stream
    *     side never shuffles).
    * Returns the admitted stream with the per-gate verdicts attached
    * (callers route rejects to a dead-letter sink by filtering NOT
    * admit, exactly like partitionByWriteRules).
    */
  def curationGate(docs: DataFrame, storeFingerprints: DataFrame,
      tsCol: String = "ts", textCol: String = "text",
      lateness: String = "1 hour"): DataFrame = {
    val fresh = dedupByContent(docs, tsCol, textCol, lateness)
    // distinct before the join: duplicate fp rows in the store table
    // would multiply matching stream rows through the left join
    val known = broadcast(storeFingerprints.select("fp").distinct()
      .withColumn("in_store", lit(true)))
    graft.operators.QualityFilters.gopherRulesAll(fresh, textCol)
      .join(known, Seq("fp"), "left")
      .withColumn("novel", col("in_store").isNull)
      .withColumn("admit", col("keep") && col("novel"))
      .drop("in_store")
  }

  /** Streaming ingest-time IVF assignment: each arriving embedding gets
    * its cell (the per-row `cellOf` fold — no join, no window) and lands
    * in the cell-partitioned layout that `Similarity.ivfTopK` probes
    * with partition pruning. This is the streaming twin of the q77 batch
    * ingest: at 100 TB the O(nlist) assignment expression runs ONCE per
    * vector at write time, never per query, and the directory layout IS
    * the inverted file.
    */
  def ivfIngest(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Float])], layoutDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    // the assignment IS the batch operator (pure projection — streams
    // fine); re-implementing the cell/null-sentinel expression here
    // would let the two paths silently diverge
    graft.operators.Similarity
      .ivfAssign(embeddings, idCol, vecCol, centroids)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("cell")
      .format("parquet")
      .option("path", layoutDir)
      .start()

  /** Enforce the IotValue write rules in the ingest path (SURVEY §7:
    * "write rules live in the ingest path, not the storage" —
    * IotValue.cs:123-139): rows whose (priority, flags) violate
    * AllowManualOperator/Priority9Only split into a rejects stream for the
    * dead-letter sink instead of silently landing.
    * Input needs `priority` and `flags` columns; returns (accepted,
    * rejected).
    */
  def partitionByWriteRules(points: DataFrame): (DataFrame, DataFrame) = {
    val ok = graft.model.IotValue.writeAllowed(col("priority"), col("flags"))
    (points.filter(ok), points.filter(!ok))
  }

  /** Session windows keyed by inactivity gap (`session_window`): the
    * event-time twin of the batch gaps-and-islands sessionization (q34).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("key"),
        col("n"), col("total"))
}

/** Streaming count-min maintenance: each micro-batch's token sketch is
  * merged counter-wise into a driver-held accumulator — the streaming
  * face of `Sketches` mergeability. The state is bounded at depth×width
  * counters FOREVER (vs. a groupBy-count whose state grows with the
  * vocabulary), which is the whole point of sketching an unbounded
  * ingest stream; the per-batch work is one bounded aggregation.
  *
  * The accumulated sketch is exactly equal to the batch-built sketch
  * over the concatenation of all batches (StreamingSpec pins this merge
  * law), so estimates keep the one-sided `est >= exact` contract at any
  * point in the stream's life.
  */
class StreamingSketch(depth: Int, width: Int) extends Serializable {

  @volatile private var acc = Map.empty[(Int, Int), Long]

  /** Fold one micro-batch of documents into the sketch. */
  def mergeBatch(batch: DataFrame, textCol: String): Unit = {
    import graft.functions.TextFunctions.tokens
    val weighted = batch
      .select(explode(tokens(col(textCol))).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val rows = graft.operators.Sketches
      .cmsBuild(weighted, "k", "cnt", depth, width)
      .collect() // bounded: <= depth*width rows by construction
    // the fold is read-modify-write: two streams attached to one sketch
    // merge from different foreachBatch threads, so it must be atomic or
    // an interleaved write drops counts (breaking est >= exact). The
    // Spark job above stays outside the lock.
    synchronized {
      acc = rows.foldLeft(acc) { (m, r) =>
        val key = (r.getInt(0), r.getInt(1))
        m.updated(key, m.getOrElse(key, 0L) + r.getLong(2))
      }
    }
  }

  /** Attach to a streaming document frame; every micro-batch merges. */
  def attach(docs: DataFrame, textCol: String,
      queryName: String): StreamingQuery =
    docs.writeStream.queryName(queryName)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, textCol)
      }
      .start()

  /** The accumulated sketch as a DataFrame for `Sketches.cmsEstimate`. */
  def sketch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    acc.toSeq.map { case ((r, p), c) => (r, p, c) }
      .toDF("row", "pos", "c")
  }

  /** Estimate token counts for a set of keys against the current state. */
  def estimate(keys: DataFrame, keyCol: String): DataFrame =
    graft.operators.Sketches.cmsEstimate(
      keys, keyCol, sketch(keys.sparkSession), depth, width)
}
