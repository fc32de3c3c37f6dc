package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
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
    pinned: StructType, ctx: SQLContext) extends Source {

  override def schema: StructType = pinned

  override def getOffset: Option[Offset] = {
    val v = db.settledLogVersion
    if (v <= 0L) None else Some(VersionOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(0L)
    val batch = db.changes(table, from, ver(end))
      .select(pinned.fieldNames.map(col).toSeq: _*)
    // the engine asserts isStreaming on the returned frame
    org.apache.spark.sql.graft.StreamingShim.asStreaming(ctx, batch)
  }

  // a restarted query hands offsets back as SerializedOffset(json)
  private def ver(o: Offset): Long = o.json.trim.toLong

  override def stop(): Unit = ()
}

/** `readStream.format("graft-changes")` provider. Options: `baseDir` +
  * `name` (the database), `table`, optional `password` (file-at-rest
  * encryption).
  */
final class ChangeFeedSourceProvider
    extends StreamSourceProvider with DataSourceRegister {

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
    new ChangeFeedSource(db, t, schema.getOrElse(
      ChangeFeedSourceProvider.feedSchema(db, t)), ctx)
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
