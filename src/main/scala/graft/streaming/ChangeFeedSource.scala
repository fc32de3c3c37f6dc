package graft.streaming

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.GraftDatabase

/** A micro-batch offset that IS a commit-log version: the streaming
  * engine's checkpointed offset and the database's version history are
  * the same monotonic sequence, so a restarted query resumes exactly
  * where its checkpoint says — the immutable log replays the identical
  * snapshot diff (exactly-once from the WAL's at-least-once
  * redelivery). The connector `Offset` base class already compares by
  * the JSON form, which keeps a checkpoint-restored offset equal to a
  * fresh one of the same version.
  */
final case class VersionOffset(version: Long) extends OffsetV2 {
  override def json: String = version.toString
}

/** The change feed as a FIRST-CLASS `spark.readStream` source — a
  * DataSource V2 `MicroBatchStream` (the composable generalization of
  * [[ChangeFeedReplicator]], which is replica-only): the feed joins,
  * windows, and watermarks like any other stream.
  *
  * {{{
  * spark.readStream
  *   .format("graft-changes")              // or the provider class name
  *   .option("baseDir", dir).option("name", dbName).option("table", t)
  *   .option("maxVersionsPerTrigger", "10") // admission control
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
  *   - ADMISSION CONTROL (`maxVersionsPerTrigger`, `maxFilesPerTrigger`,
  *     `maxBytesPerTrigger`) advances the offset in bounded steps, so
  *     a bootstrap or a long-downtime catch-up never materializes the
  *     whole backlog in one micro-batch — snapshot diffs telescope, so
  *     N capped batches land the same final state as one uncapped one.
  *     BOUNDED BY DEFAULT: with no cap option set, `maxBytesPerTrigger`
  *     defaults to 512 MiB; unbounded takes the explicit
  *     `maxBytesPerTrigger=none` opt-out
  *   - a checkpointed offset below the vacuum retention floor fails
  *     LOUDLY at the next batch (see `changes`) instead of silently
  *     re-feeding the table
  *   - the schema is pinned at stream start (table columns +
  *     `_change_type`); a mid-stream ADD COLUMN keeps feeding the
  *     pinned columns. The divergence is no longer silent:
  *     `schemaTrackingMode=warn` (default) logs it loudly once,
  *     `schemaTrackingMode=fail` stops the query at the next batch —
  *     restart the query to pick up the new columns either way
  */
final class ChangeFeedMicroBatchStream(db: GraftDatabase, table: String,
    pinned: StructType, startVersion: Long, maxVersions: Option[Long],
    maxFiles: Option[Long], maxBytes: Option[Long], schemaMode: String,
    checkpointDir: String, warnBytes: Long = 1L << 30,
    withVersion: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val spark = db.spark
  private val stagingRoot = new Path(checkpointDir, "graft-staged").toString
  @volatile private var driftWarned = false

  /** `Trigger.AvailableNow` — the bounded-backfill mode: the engine
    * calls this once at query start; every later `latestOffset` is
    * CEILINGED at the version settled at that instant, so the query
    * drains exactly the backlog that existed when it started (in
    * admission-capped steps) and then stops. Commits landing while the
    * backfill runs are not consumed — the next run picks them up from
    * the checkpoint. None outside AvailableNow (continuous triggers
    * chase the live head).
    */
  @volatile private var availableNowCeiling: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling = Some(math.max(db.settledLogVersion, startVersion))

  private def ver(o: OffsetV2): Long = o.json.trim.toLong

  override def initialOffset(): OffsetV2 = VersionOffset(startVersion)

  override def deserializeOffset(json: String): OffsetV2 =
    VersionOffset(json.trim.toLong)

  // the engine routes through the admission-control overload
  override def latestOffset(): OffsetV2 = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): OffsetV2 =
    VersionOffset(math.max(db.settledLogVersion, startVersion))

  /** Bounded advance: never past the settled head, never more than
    * `maxVersionsPerTrigger` versions, never more exchanged files /
    * bytes than `maxFilesPerTrigger` / `maxBytesPerTrigger` (always
    * ≥ 1 version so a single huge commit still delivers). Caps ride
    * the source options rather than [[ReadLimit]] because the unit is
    * log versions, which the generic row/file limits cannot express;
    * multiple caps compose as the tightest one.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    sweepOrphanedStaging()
    val from = ver(start)
    val live = math.max(db.settledLogVersion, from)
    lastSeenHead = live
    val head = availableNowCeiling.fold(live)(c => math.min(live, math.max(c, from)))
    val vCap = maxVersions.fold(head)(c => math.min(head, from + c))
    warnIfUncappedAndHuge(from, head)
    VersionOffset(db.advanceByBudgets(from, vCap, maxFiles, maxBytes))
  }

  /** An entirely uncapped first advance over a large backlog (a
    * bootstrap or long-downtime catch-up) materializes it all in ONE
    * micro-batch — measured to exhaust an 8 GB driver near 1 GB of
    * on-disk backlog (SCALE.md round 11). Reaching here uncapped takes
    * the explicit `maxBytesPerTrigger=none` opt-out (the source is
    * bounded by default), so this is a loud one-time warning, not an
    * error: the threshold rides `uncappedWarnBytes` (0 disables).
    */
  @volatile private var uncappedChecked = false

  private def warnIfUncappedAndHuge(from: Long, head: Long): Unit = {
    if (uncappedChecked || warnBytes <= 0 || maxVersions.isDefined ||
      maxFiles.isDefined || maxBytes.isDefined) return
    uncappedChecked = true
    val bytes = db.exchangedBytesBetween(from, head)
    if (bytes > warnBytes)
      Console.err.println(s"[graft] WARN: graft-changes($table): the " +
        s"first micro-batch spans versions ($from, $head] ≈ " +
        s"${bytes >> 20} MiB of exchanged files with NO admission cap " +
        "(maxBytesPerTrigger=none) — a bootstrap/catch-up this size " +
        "lands in ONE batch. Set maxBytesPerTrigger / " +
        "maxFilesPerTrigger / maxVersionsPerTrigger to drain it in " +
        "bounded steps.")
  }

  /** Reclaim staged batches a PRIOR run of this checkpoint left behind:
    * `commit(end)` only sweeps dirs at or below committed offsets, so a
    * batch that FAILED (or a stream abandoned mid-backlog) leaks its
    * `.urs` staging dir under the checkpoint until — without this — a
    * later successful commit, or forever if the stream never advances.
    * Everything staged before this stream instance existed is
    * unreachable by construction (a restart builds fresh partitions and
    * re-stages the replayed batch), so the whole root is swept once,
    * before this instance stages anything.
    */
  @volatile private var sweptOrphans = false

  private def sweepOrphanedStaging(): Unit = {
    if (sweptOrphans) return
    sweptOrphans = true
    val root = new Path(stagingRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).foreach(st => fs.delete(st.getPath, true))
  }

  // one staging per (from, to] PER STREAM INSTANCE: the engine may plan
  // the same batch more than once in a run, and re-staging would delete
  // the attempt-unique files the first plan's partitions point at. A
  // restart builds a fresh stream → fresh staging AND fresh partitions,
  // so the cache can never serve stale paths across runs.
  private val planned = new java.util.concurrent.ConcurrentHashMap[
    (Long, Long), Array[InputPartition]]()

  override def planInputPartitions(start: OffsetV2,
      end: OffsetV2): Array[InputPartition] = {
    // a restart replaying the last uncommitted batch plans WITHOUT a
    // prior latestOffset call, so the orphan sweep hooks here too —
    // always before this instance's first staging write
    sweepOrphanedStaging()
    val (from, to) = (ver(start), ver(end))
    if (to <= from) return Array.empty
    planned.computeIfAbsent((from, to), _ => planBatch(from, to))
  }

  private def planBatch(from: Long, to: Long): Array[InputPartition] = {
    // table=* multiplexes EVERY table in commit order under the fixed
    // envelope — no drift check (the envelope never changes) and no
    // reshaping (changesAllTables already emits it)
    if (table == "*")
      return UnsafeRowStage.write(db.changesAllTables(from, to),
        s"$stagingRoot/$from-$to", pinned)
    checkSchemaDrift()
    // project the batch onto the PINNED shape by name, null-filling
    // and upcasting: an admission-capped catch-up can span historical
    // schema changes, so a batch below an ADD COLUMN lacks the pinned
    // column (it null-fills, exactly like the table read of that era),
    // and a batch below a type widening carries the narrow type (it
    // upcasts). A renamed/dropped pinned column mid-stream null-fills
    // the same way under schemaTrackingMode=warn.
    //
    // withCommitVersion trades the span's ONE telescoped diff for one
    // arm per version tagged `_commit_version` (the multiplexed feed's
    // granularity, typed): consumers that maintain per-version
    // invariants (MaterializedView's snapshot-consistency contract)
    // need to know which snapshot a batch lands them at. Plan width is
    // bounded by the version cap (defaulted when this option is on).
    val diff =
      if (withVersion) db.changesPerVersion(table, from, to)
      else db.changes(table, from, to)
    val have = diff.columns.map(_.toLowerCase).toSet
    val batch = diff.select(pinned.toSeq.map { f =>
      if (have(f.name.toLowerCase))
        org.apache.spark.sql.functions.col(f.name)
          .cast(f.dataType).as(f.name)
      else org.apache.spark.sql.functions.lit(null)
        .cast(f.dataType).as(f.name)
    }: _*)
    UnsafeRowStage.write(batch, s"$stagingRoot/$from-$to", pinned)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StagedReaderFactory(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))

  /** The engine committed everything ≤ `end`: staged batches up to it
    * can never be replayed — reclaim them.
    */
  override def commit(end: OffsetV2): Unit = {
    val upTo = ver(end)
    planned.keySet.removeIf(_._2 <= upTo)
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(stagingRoot)
    val fs = root.getFileSystem(hconf)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      st.getPath.getName.split("-") match {
        case Array(_, t) if t.forall(_.isDigit) && t.toLong <= upTo =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  override def stop(): Unit = ()

  // the table's schema can only diverge through a COMMIT (a new log
  // version), so the drift re-resolve — several charged log reads per
  // call — runs once per observed head, not once per micro-batch: a
  // long capped catch-up over a static backlog checks exactly once
  @volatile private var lastSeenHead = -1L
  @volatile private var driftCheckedAt = Long.MinValue

  private def checkSchemaDrift(): Unit = {
    if (lastSeenHead >= 0 && lastSeenHead == driftCheckedAt) return
    val headNow = lastSeenHead
    val current = ChangeFeedSourceProvider.feedSchema(db, table, withVersion)
    def shape(s: StructType) =
      s.fields.toSeq.map(f => (f.name, f.dataType.catalogString))
    if (shape(current) != shape(pinned)) {
      val msg = s"graft-changes($table): the table schema diverged from " +
        s"the stream's pinned schema (pinned ${pinned.simpleString}, " +
        s"current ${current.simpleString}) — the feed keeps emitting the " +
        "pinned columns (renamed/dropped ones null-fill); restart the " +
        "query to pick up the change (schemaTrackingMode=fail stops it " +
        "here instead)"
      if (schemaMode == "fail") throw new IllegalStateException(msg)
      else if (!driftWarned) {
        driftWarned = true
        Console.err.println(s"[graft] WARN: $msg")
      }
    }
    driftCheckedAt = headNow
  }
}

/** The V2 read-side plumbing: one logical scan whose micro-batch
  * stream resolves the database, start offset, and admission caps from
  * the read options.
  */
final class ChangeFeedScan(pinned: StructType,
    params: CaseInsensitiveStringMap) extends Scan {

  override def readSchema(): StructType = pinned

  override def description(): String =
    s"graft-changes(${params.get("name")}.${params.get("table")})"

  override def toMicroBatchStream(checkpointDir: String): MicroBatchStream = {
    val spark = SparkSession.active
    val db = ChangeFeedSourceProvider.open(spark, params)
    val table = ChangeFeedSourceProvider.tableOf(params)
    require(!(params.containsKey("startingVersion") &&
      params.containsKey("startingTimestamp")),
      "graft-changes: give startingVersion OR startingTimestamp, not both")
    val startV = Option(params.get("startingVersion")).map(_.trim.toLong)
      .orElse(Option(params.get("startingTimestamp")).map(ts =>
        db.versionAt(java.time.Instant.ofEpochMilli(
          graft.query.LiteSql.parseTsLiteralMs(ts,
            spark.conf.get("spark.sql.session.timeZone"))))))
      .getOrElse(0L)
    val schemaMode = Option(params.get("schemaTrackingMode"))
      .getOrElse("warn")
    require(schemaMode == "warn" || schemaMode == "fail",
      s"graft-changes: schemaTrackingMode must be warn|fail, got '$schemaMode'")
    // Admission caps: each takes a positive long, or the explicit
    // opt-out "none". BOUNDED BY DEFAULT: when the user sets NO cap
    // option at all, maxBytesPerTrigger defaults to 512 MiB (tunable
    // via spark.graft.changes.defaultMaxBytesPerTrigger) — an uncapped
    // bootstrap/catch-up lands the whole backlog in ONE micro-batch,
    // measured to exhaust an 8 GB driver near 1 GB of backlog
    // (SCALE.md), so unbounded is something a user must ASK for
    // (`maxBytesPerTrigger=none`), never fall into.
    // capChosen = the user set a REAL cap (a positive long) on any
    // dimension, or addressed maxBytesPerTrigger itself (value or the
    // explicit `none` opt-out). `maxVersionsPerTrigger=none` /
    // `maxFilesPerTrigger=none` are semantic no-ops (those were never
    // capped by default) and MUST NOT silently disable the default byte
    // cap — unbounded is only ever the documented `maxBytesPerTrigger=
    // none`.
    var capChosen = false
    def capLong(k: String): Option[Long] = Option(params.get(k)).flatMap { v =>
      if (v.trim.equalsIgnoreCase("none")) {
        if (k == "maxBytesPerTrigger") capChosen = true
        None
      } else {
        val n = try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft-changes: $k must be a positive long or 'none', got '$v'")
        }
        require(n > 0,
          s"graft-changes: $k must be a positive long or 'none', got $n")
        capChosen = true
        Some(n)
      }
    }
    val maxVersions0 = capLong("maxVersionsPerTrigger")
    // the multiplexed feed plans one diff arm per (version, touched
    // table): with no explicit version cap, bound plan width per
    // trigger (the byte default alone could admit thousands of tiny
    // commits into one batch plan)
    // per-version-arm modes (table=* and withCommitVersion) plan one
    // diff arm per version — default the version cap to bound PLAN
    // width, which the byte cap cannot
    val withVersion = ChangeFeedSourceProvider.wantsCommitVersion(params)
    val maxVersions =
      if ((ChangeFeedSourceProvider.tableOf(params) == "*" || withVersion) &&
          !params.containsKey("maxVersionsPerTrigger"))
        Some(ChangeFeedSourceProvider.DefaultMultiplexVersionsPerTrigger)
      else maxVersions0
    val maxFiles = capLong("maxFilesPerTrigger")
    val maxBytes0 = capLong("maxBytesPerTrigger")
    val maxBytes =
      if (capChosen) maxBytes0
      else Some {
        val key = "spark.graft.changes.defaultMaxBytesPerTrigger"
        val v = spark.conf.get(key,
          ChangeFeedSourceProvider.DefaultMaxBytesPerTrigger.toString)
        val n = try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft-changes: $key must be a positive long (per-stream " +
              s"opt-out is .option(\"maxBytesPerTrigger\", \"none\")), got '$v'")
        }
        require(n > 0,
          s"graft-changes: $key must be a positive long (per-stream " +
            s"opt-out is .option(\"maxBytesPerTrigger\", \"none\")), got $n")
        n
      }
    val warnBytes = Option(params.get("uncappedWarnBytes")).map { v =>
      val n = try v.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          "graft-changes: uncappedWarnBytes must be a non-negative long " +
            s"(0 disables the warning), got '$v'")
      }
      require(n >= 0, "graft-changes: uncappedWarnBytes must be >= 0 " +
        s"(0 disables the warning), got $n")
      n
    }.getOrElse(1L << 30)
    require(!(withVersion && table == "*"),
      "graft-changes: withCommitVersion is for single-table feeds — the " +
        "multiplexed table=* envelope always carries _commit_version")
    new ChangeFeedMicroBatchStream(db, table, pinned, startV,
      maxVersions, maxFiles, maxBytes, schemaMode, checkpointDir, warnBytes,
      withVersion)
  }
}

/** The feed as a connector [[Table]]: micro-batch readable, not
  * writable — writes fall back to the V1 sink half of the provider.
  */
final class ChangeFeedTable(pinned: StructType,
    props: util.Map[String, String]) extends Table with SupportsRead {

  override def name(): String =
    s"graft-changes(${props.get("name")}.${props.get("table")})"

  override def schema(): StructType = pinned

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(pinned.nonEmpty,
      "graft-changes: the table has no committed data to stream " +
        "(commit an initial state first, or pass an explicit schema)")
    new ScanBuilder {
      override def build(): Scan = new ChangeFeedScan(pinned, options)
    }
  }
}

/** `format("graft-changes")` provider — BOTH directions of the feed.
  *
  * As a SOURCE (`readStream`): a DataSource V2 [[TableProvider]] —
  * options `baseDir` + `name` (the database), `table`, optional
  * `password` (file-at-rest encryption), admission caps
  * `maxVersionsPerTrigger` / `maxFilesPerTrigger` /
  * `maxBytesPerTrigger` (each a positive long or the opt-out `none`,
  * composing as the tightest; with NO cap set, `maxBytesPerTrigger`
  * defaults to 512 MiB so an out-of-the-box bootstrap is always
  * drained in bounded steps),
  * `schemaTrackingMode` (warn|fail), and optionally ONE of:
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
  * restarts AND across processes. Deliberately V1 (`Sink.addBatch`):
  * `applyChanges` is a whole-batch DataFrame transaction, which the
  * per-partition V2 writer API cannot express — the same reason
  * Delta's streaming sink is V1. Options as above plus `appId`
  * (stable writer identity, default `stream-<table>`) and `sinkMode`:
  *   - `cdc` (default when the frame carries `_change_type`): rows
  *     apply as inserts/deletes — pipe a graft-changes SOURCE straight
  *     in and two databases replicate with ordinary Spark streaming
  *   - `append`: every row lands as an insert (PK-validated)
  */
final class ChangeFeedSourceProvider
    extends TableProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  // reads accept a user-specified schema; writes hand the query schema
  // to getTable (whose table is read-only, routing them to the V1 sink)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // missing/invalid options fail HERE with their real message —
    // only the "no committed data yet" case falls through, because the
    // WRITE path also resolves the provider's schema and a sink target
    // legitimately starts empty (the read path re-raises loudly in
    // newScanBuilder)
    val db = ChangeFeedSourceProvider.open(SparkSession.active, options)
    val t = ChangeFeedSourceProvider.tableOf(options)
    try ChangeFeedSourceProvider.feedSchema(db, t,
      ChangeFeedSourceProvider.wantsCommitVersion(options))
    catch { case _: IllegalArgumentException => new StructType() }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangeFeedTable(schema, properties)

  override def createSink(ctx: SQLContext, params: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val db = ChangeFeedSourceProvider.open(ctx.sparkSession,
      new CaseInsensitiveStringMap(params.asJava))
    val t = params.getOrElse("table", throw new IllegalArgumentException(
      "graft-changes needs option 'table'"))
    require(t != "*", "graft-changes: the multiplexed table=* feed is " +
      "source-only — demultiplex with from_json(_row, schema) per table " +
      "and sink each to its own table")
    new GraftTableSink(db, t,
      params.get("sinkMode"),
      params.getOrElse("appId", s"stream-$t"))
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
  /** Default `maxBytesPerTrigger` when the user sets no admission cap —
    * the seatbelt that keeps a default-options bootstrap from
    * materializing an arbitrarily large backlog in one micro-batch
    * (Delta's streaming source ships a default `maxFilesPerTrigger` for
    * the same reason; bytes track the actual batch cost more closely).
    * Overridable per session via
    * `spark.graft.changes.defaultMaxBytesPerTrigger`; opt out per
    * stream with `maxBytesPerTrigger=none`.
    */
  val DefaultMaxBytesPerTrigger: Long = 512L << 20

  /** Default `maxVersionsPerTrigger` for the multiplexed `table=*`
    * feed (one diff arm per version × touched table — the version cap
    * bounds PLAN width, which the byte cap cannot).
    */
  val DefaultMultiplexVersionsPerTrigger: Long = 64L

  /** Table columns + `_change_type` (+ `_commit_version` when the
    * stream asked for per-version granularity) — derived from a
    * zero-churn feed of the CURRENT version (the table must hold
    * committed data).
    */
  private[streaming] def feedSchema(db: GraftDatabase,
      table: String, withVersion: Boolean = false): StructType = {
    // table=* — the DATABASE-LEVEL feed: a fixed schema-tagged envelope
    // (see GraftDatabase.changesAllTables), so it exists before any
    // commit and never drifts
    if (table == "*") return GraftDatabase.MultiplexEnvelope
    val v = db.settledLogVersion
    require(v > 0L && db.tableExists(table),
      s"graft-changes: table '$table' has no committed data to stream")
    val base = db.changes(table, v, v).schema
    if (withVersion)
      base.add("_commit_version", org.apache.spark.sql.types.LongType,
        nullable = false)
    else base
  }

  private[streaming] def wantsCommitVersion(
      params: CaseInsensitiveStringMap): Boolean =
    Option(params.get("withCommitVersion")).exists { v =>
      v.trim.toLowerCase match {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"graft-changes: withCommitVersion must be true|false, got '$other'")
      }
    }

  private[streaming] def tableOf(params: CaseInsensitiveStringMap): String = {
    val t = params.get("table")
    if (t == null) throw new IllegalArgumentException(
      "graft-changes needs option 'table'")
    t
  }

  private[streaming] def open(spark: SparkSession,
      params: CaseInsensitiveStringMap): GraftDatabase = {
    def req(k: String): String = {
      val v = params.get(k)
      if (v == null) throw new IllegalArgumentException(
        s"graft-changes needs option '$k'")
      v
    }
    val primitive = Option(params.get("commitPrimitiveRef"))
      .map(GraftDatabase.resolveCommitPrimitive)
      .getOrElse(graft.catalog.CommitPrimitive.posix)
    GraftDatabase(spark, req("name"), req("baseDir"),
      graft.core.Collation.Binary, Option(params.get("password")), primitive)
  }
}
