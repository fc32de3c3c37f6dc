package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.catalog.GraftDatabase

/** A micro-batch offset that IS a commit-log version: the streaming
  * engine's checkpointed offset and the database's version history are
  * the same monotonic sequence, so a restarted query resumes exactly
  * where its checkpoint says — the immutable log replays the identical
  * snapshot diff (exactly-once from the WAL's at-least-once redelivery).
  */
final case class VersionOffset(version: Long) extends Offset {
  override def json: String = version.toString
  // the v1 Offset contract compares offsets by their JSON form — a
  // restart hands back SerializedOffset(json), and the synthesized
  // case-class equals would call it unequal to a fresh VersionOffset
  // of the SAME version, triggering a spurious empty batch per restart
  override def equals(o: Any): Boolean = o match {
    case other: Offset => other.json == json
    case _ => false
  }
  override def hashCode(): Int = json.hashCode
}

/** The change feed as a FIRST-CLASS `spark.readStream` source — the
  * composable generalization of [[ChangeFeedReplicator]] (which is
  * replica-only): the feed joins, windows, and watermarks like any
  * other stream.
  *
  * {{{
  * spark.readStream
  *   .format("graft-changes")              // or the provider class name
  *   .option("baseDir", dir).option("name", dbName).option("table", t)
  *   .load()                               // table columns + _change_type
  * }}}
  *
  * Semantics:
  *   - offsets are COMMIT-LOG VERSIONS ([[VersionOffset]]); each batch
  *     is `changes(table, fromVersion, toVersion)` — the snapshot diff
  *     that reads only the files EXCHANGED between the versions, so
  *     batch cost ∝ churn, never table size
  *   - the FIRST batch bootstraps from version 0: the initial snapshot
  *     arrives as inserts, exactly like a replicator's initial load
  *   - a checkpointed offset below the vacuum retention floor fails
  *     LOUDLY at the next batch (see `changes`) instead of silently
  *     re-feeding the table
  *   - the schema is pinned at stream start (table columns +
  *     `_change_type`); a mid-stream ADD COLUMN keeps feeding the
  *     pinned columns — restart the query to pick up new ones
  */
final class ChangeFeedSource(db: GraftDatabase, table: String,
    pinned: StructType, ctx: SQLContext, startVersion: Long) extends Source {

  override def schema: StructType = pinned

  override def getOffset: Option[Offset] = {
    val v = db.settledLogVersion
    if (v <= 0L) None else Some(VersionOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startVersion)
    val batch = db.changes(table, from, ver(end))
      .select(pinned.fieldNames.map(col).toSeq: _*)
    // the engine asserts isStreaming on the returned frame
    org.apache.spark.sql.graft.StreamingShim.asStreaming(ctx, batch)
  }

  // a restarted query hands offsets back as SerializedOffset(json)
  private def ver(o: Offset): Long = o.json.trim.toLong

  override def stop(): Unit = ()
}

/** `format("graft-changes")` provider — BOTH directions of the feed.
  *
  * As a SOURCE (`readStream`): options `baseDir` + `name` (the
  * database), `table`, optional `password` (file-at-rest encryption),
  * and optionally ONE of:
  *   - `startingVersion` — the first batch carries changes committed
  *     AFTER this version (the cursor convention; 0 = bootstrap the
  *     full snapshot as inserts, the default)
  *   - `startingTimestamp` — resolved to a version through the commit
  *     stamps (TIMESTAMP AS OF semantics: skew-monotonized, refuses
  *     below retention)
  *
  * As a SINK (`writeStream`): the EXACTLY-ONCE landing half — each
  * micro-batch applies through the idempotence ledger
  * ([[GraftDatabase.applyChanges]] with (appId, batchId) Txn markers),
  * so an at-least-once redelivered batch commits at most once, across
  * restarts AND across processes. Options as above plus `appId`
  * (stable writer identity, default `stream-<table>`) and `sinkMode`:
  *   - `cdc` (default when the frame carries `_change_type`): rows
  *     apply as inserts/deletes — pipe a graft-changes SOURCE straight
  *     in and two databases replicate with ordinary Spark streaming
  *   - `append`: every row lands as an insert (PK-validated)
  */
final class ChangeFeedSourceProvider
    extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String,
      params: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      ChangeFeedSourceProvider.feedSchema(open(ctx, params),
        tableOf(params))))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      params: Map[String, String]): Source = {
    val db = open(ctx, params)
    val t = tableOf(params)
    require(!(params.contains("startingVersion") &&
      params.contains("startingTimestamp")),
      "graft-changes: give startingVersion OR startingTimestamp, not both")
    val startV = params.get("startingVersion").map(_.trim.toLong)
      .orElse(params.get("startingTimestamp").map(ts =>
        db.versionAt(java.time.Instant.ofEpochMilli(
          graft.query.LiteSql.parseTsLiteralMs(ts,
            ctx.sparkSession.sessionState.conf.sessionLocalTimeZone)))))
      .getOrElse(0L)
    new ChangeFeedSource(db, t, schema.getOrElse(
      ChangeFeedSourceProvider.feedSchema(db, t)), ctx, startV)
  }

  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val db = open(ctx, params)
    val t = tableOf(params)
    new GraftTableSink(db, t,
      params.get("sinkMode"),
      params.getOrElse("appId", s"stream-$t"))
  }

  private def tableOf(params: Map[String, String]): String =
    params.getOrElse("table", throw new IllegalArgumentException(
      "graft-changes needs option 'table'"))

  private def open(ctx: SQLContext,
      params: Map[String, String]): GraftDatabase = {
    def req(k: String) = params.getOrElse(k,
      throw new IllegalArgumentException(s"graft-changes needs option '$k'"))
    GraftDatabase(ctx.sparkSession, req("name"), req("baseDir"),
      graft.core.Collation.Binary, params.get("password"))
  }
}

/** The exactly-once micro-batch writer: every batch routes through
  * [[GraftDatabase.applyChanges]], whose (appId, batchId) ledger makes
  * redelivery a no-op — the same Txn-marker contract the replicator
  * uses, now reachable as plain `writeStream.format("graft-changes")`.
  */
final class GraftTableSink(db: GraftDatabase, table: String,
    sinkMode: Option[String], appId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data0: DataFrame): Unit = {
    // the engine hands a streaming-flagged frame; the DML paths run
    // ordinary batch actions over it (ForeachBatchSink does the same)
    val data = org.apache.spark.sql.graft.StreamingShim.asBatch(data0)
    val cdc = sinkMode match {
      case Some("cdc") => true
      case Some("append") => false
      case Some(other) => throw new IllegalArgumentException(
        s"graft-changes sinkMode must be cdc|append, got '$other'")
      case None => data.columns.contains("_change_type")
    }
    val feed =
      if (cdc) {
        require(data.columns.contains("_change_type"),
          "graft-changes cdc sink needs a _change_type column")
        data
      } else data.withColumn("_change_type",
        org.apache.spark.sql.functions.lit("insert"))
    db.applyChanges(table, feed, appId, batchId)
  }

  override def toString: String = s"GraftTableSink($table)"
}

object ChangeFeedSourceProvider {
  /** Table columns + `_change_type` — derived from a zero-churn feed
    * of the CURRENT version (the table must hold committed data).
    */
  private[streaming] def feedSchema(db: GraftDatabase,
      table: String): StructType = {
    val v = db.settledLogVersion
    require(v > 0L && db.tableExists(table),
      s"graft-changes: table '$table' has no committed data to stream")
    db.changes(table, v, v).schema
  }
}
