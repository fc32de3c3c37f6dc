package graft.sources

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned file store — the reference's check-in/check-out file manager
  * (`Iot.Database/FileManager/FileCollection.cs:107-767`: AddNewFile,
  * CheckInFile, CheckOutFile(version), AbandonCheckout, DeleteFile,
  * RenameFile + FileMetadata/FileCheckoutRecord/FileAccessLog collections)
  * on Spark-native storage:
  *
  *  - `versions/`  — append-only parquet of every checked-in version
  *    (file_id, version, ts_us, sha256, n_bytes, content). Append-only is
  *    the scale posture: a check-in is one small parquet append, never a
  *    rewrite; at 100 TB the binary `content` column becomes an object-
  *    store path with the same schema.
  *  - `events/`    — append-only event log unifying the reference's
  *    checkoutRecords + accessLogs (seq, file_id, user, op, version,
  *    status, ts_us). Checkout STATE is derived, not updated: the latest
  *    event per file decides whether it is actively checked out — the
  *    event-sourced form of the reference's in-place status updates.
  *  - `files/`     — current metadata (file_id, file_name, file_ext,
  *    current_version, ts_us, deleted), a small dimension table rewritten
  *    on change (the only non-append surface, tiny by construction).
  *
  * Directory ingest uses Spark's `binaryFile` source, so bulk file loads
  * are distributed reads, not driver loops.
  */
final class FileStore(spark: SparkSession, root: String,
    ioOptions: Map[String, String] = Map.empty,
    checkWritable: () => Unit = () => ()) {
  import FileStore._

  private val versionsDir = s"$root/versions"
  private val eventsDir = s"$root/events"
  private val filesPath = s"$root/files"
  // complete a metadata-swap a crash interrupted (writeMeta)
  graft.core.FsUtils.recoverSwap(Paths.get(filesPath))
  Files.createDirectories(Paths.get(root))

  // ---- table views --------------------------------------------------------

  private def hasData(dir: String): Boolean = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) false
    else {
      val s = Files.list(p)
      try s.anyMatch(f =>
        f.getFileName.toString.endsWith(".parquet") ||
          f.getFileName.toString == "_SUCCESS")
      finally s.close() // Files.list holds an open fd until closed
    }
  }

  /** All stored versions (blob table). */
  def versions: DataFrame =
    if (hasData(versionsDir)) spark.read.options(ioOptions).parquet(versionsDir)
    else emptyVersions(spark)

  /** The unified checkout/access event log (FileCheckoutRecord +
    * FileAccessLog).
    */
  def events: DataFrame =
    if (hasData(eventsDir)) spark.read.options(ioOptions).parquet(eventsDir)
    else emptyEvents(spark)

  /** Current file metadata (FileMetadata collection). */
  def files: DataFrame =
    if (hasData(filesPath)) spark.read.options(ioOptions).parquet(filesPath)
      .filter(!col("deleted"))
    else emptyFiles(spark)

  /** Version history of one file (FileRecord.FileVersions analog). */
  def fileVersions(fileId: String): DataFrame =
    versions.filter(col("file_id") === fileId)
      .select("file_id", "version", "ts_us", "sha256", "n_bytes")

  def metadata(fileId: String): Option[Row] =
    files.filter(col("file_id") === fileId).collect().headOption

  // ---- write paths --------------------------------------------------------

  /** AddNewFile: first check-in creates version 1 and returns the new id. */
  def addNewFile(user: String, fileName: String, content: Array[Byte]): String = {
    checkWritable()
    val fileId = java.util.UUID.randomUUID().toString
    checkInInternal(user, fileId, content, isNew = true, fileName = fileName)
    fileId
  }

  /** CheckInFile: a new version for an existing file. Allowed when the file
    * has no active checkout, or the active checkout belongs to `user`
    * (FileCollection.cs CheckIn gate); a check-in closes the checkout.
    */
  def checkIn(user: String, fileId: String, content: Array[Byte]): Unit =
    checkInInternal(user, fileId, content, isNew = false)

  /** CheckOutFile: returns (metadata, bytes) of `version` (default: the
    * current one) and records the active checkout. Errors when actively
    * checked out by another user, or by the same user at a different
    * version (both reference behaviors).
    */
  def checkOut(user: String, fileId: String,
      version: Option[Int] = None): (Row, Array[Byte]) = {
    val meta = metadata(fileId).getOrElse(
      throw new IllegalArgumentException(s"file not found: $fileId"))
    activeCheckout(fileId).foreach { co =>
      val owner = co.getAs[String]("user")
      if (!owner.equalsIgnoreCase(user))
        throw new IllegalStateException("file is already checked out")
      val coVersion = co.getAs[Int]("version")
      version.filter(_ > 0).filter(_ != coVersion).foreach(v =>
        throw new IllegalStateException(
          s"user [$user] already checked out version [$coVersion]"))
    }
    // <= 0 means "no specific version" (same sentinel the gate above
    // uses), resolving to the current version rather than a failed lookup
    val v = version.filter(_ > 0).getOrElse(meta.getAs[Int]("current_version"))
    val rows = versions
      .filter(col("file_id") === fileId && col("version") === v)
      .select("content").collect()
    if (rows.isEmpty)
      throw new IllegalArgumentException(s"version $v of $fileId not found")
    // one event serves as both the checkout record and the access log; a
    // re-checkout by the owner re-asserts the same state
    appendEvent(fileId, user, "checkout", v, StatusCheckout)
    (meta, rows.head.getAs[Array[Byte]]("content"))
  }

  /** AbandonCheckout: releases an active checkout; a different user needs
    * `force` (FileCollection.cs:410).
    */
  def abandonCheckout(user: String, fileId: String, force: Boolean = false): Unit =
    activeCheckout(fileId).foreach { co =>
      if (!co.getAs[String]("user").equalsIgnoreCase(user) && !force)
        throw new IllegalStateException("cannot abandon checkout by other user")
      appendEvent(fileId, user, "abandon", co.getAs[Int]("version"), StatusAbandon)
    }

  /** DeleteFile: no-op when absent; errors when actively checked out by
    * another user. Versions stay in the append-only blob table (tombstone
    * delete — the scale-friendly form; compaction reclaims them).
    */
  def deleteFile(user: String, fileId: String): Unit = {
    checkWritable()
    if (metadata(fileId).isEmpty) return
    activeCheckout(fileId).foreach { co =>
      if (!co.getAs[String]("user").equalsIgnoreCase(user))
        throw new IllegalStateException("file is already checked out")
    }
    upsertMeta(fileId, identity, delete = true)
    appendEvent(fileId, user, "delete", -1, StatusNone)
  }

  /** RenameFile (FileCollection.cs:767). */
  def renameFile(user: String, fileId: String, newName: String): Unit = {
    checkWritable()
    require(metadata(fileId).nonEmpty, s"file not found: $fileId")
    upsertMeta(fileId, r => r.copy(fileName = newName, fileExt = extOf(newName)))
    appendEvent(fileId, user, "rename", -1, StatusNone)
  }

  /** Bulk ingest every file under `dir` via Spark's binaryFile source.
    * File CONTENT never reaches the driver: ids are assigned from the
    * (small) path listing, joined back by path, and the blob rows — hash,
    * size, bytes — are computed and appended executor-side in one
    * distributed write. Metadata is rewritten once and the events land as
    * one batch, so n files cost O(n) appends, not n serial check-ins.
    * Returns (originalPath -> fileId).
    */
  def ingestDirectory(user: String, dir: String): Map[String, String] = {
    checkWritable()
    import spark.implicits._
    val paths = spark.read.format("binaryFile").load(dir)
      .select("path").as[String].collect().toSeq
    if (paths.isEmpty) return Map.empty
    val ids = paths.map(p => p -> java.util.UUID.randomUUID().toString).toMap
    val ts = now()
    val idDf = ids.toSeq.toDF("path", "file_id")
    spark.read.format("binaryFile").load(dir)
      .select("path", "content")
      .join(broadcast(idDf), "path")
      .select(col("file_id"), lit(1).as("version"), lit(ts).as("ts_us"),
        sha2(col("content"), 256).as("sha256"),
        length(col("content")).cast("long").as("n_bytes"), col("content"))
      .write.options(ioOptions).mode("append").parquet(versionsDir)
    val metas = paths.map { p =>
      val name = p.substring(p.lastIndexOf('/') + 1)
      Meta(ids(p), name, extOf(name), 1, ts, deleted = false)
    }
    writeMeta(allMeta ++ metas)
    appendEvents(metas.map(m => (m.fileId, user, "new", 1, StatusCheckin)))
    ids
  }

  // ---- internals ----------------------------------------------------------

  // checkIn / checkOut / abandonCheckout converge here or on logEvent —
  // both append parquet, so both honor the facade's write fence
  private def checkInInternal(user: String, fileId: String,
      content: Array[Byte], isNew: Boolean, fileName: String = ""): Unit = {
    checkWritable()
    val existing = metadata(fileId)
    if (isNew && existing.nonEmpty)
      throw new IllegalStateException("file exists: cannot add new file with same id")
    if (!isNew && existing.isEmpty)
      throw new IllegalArgumentException(s"file not found: $fileId")
    activeCheckout(fileId).foreach { co =>
      if (!co.getAs[String]("user").equalsIgnoreCase(user))
        throw new IllegalStateException("no active checkout by this user")
    }
    val newVersion = existing.map(_.getAs[Int]("current_version")).getOrElse(0) + 1
    val ts = now()
    val sha = MessageDigest.getInstance("SHA-256").digest(content)
      .map("%02x".format(_)).mkString
    import spark.implicits._
    Seq((fileId, newVersion, ts, sha, content.length.toLong, content))
      .toDF("file_id", "version", "ts_us", "sha256", "n_bytes", "content")
      .write.options(ioOptions).mode("append").parquet(versionsDir)
    if (isNew)
      insertMeta(Meta(fileId, fileName, extOf(fileName), newVersion, ts,
        deleted = false))
    else upsertMeta(fileId, _.copy(currentVersion = newVersion, tsUs = ts))
    appendEvent(fileId, user, if (isNew) "new" else "checkin", newVersion,
      StatusCheckin)
  }

  /** The active checkout of a file, if any: the LATEST checkout-lifecycle
    * event decides (event-sourced state — checkin/abandon events supersede
    * the checkout they close).
    */
  def activeCheckout(fileId: String): Option[Row] =
    events
      .filter(col("file_id") === fileId && col("status") =!= StatusNone)
      .orderBy(col("seq").desc)
      .select("user", "version", "status", "seq")
      .collect().headOption
      .filter(_.getAs[String]("status") == StatusCheckout)

  private def appendEvent(fileId: String, user: String, op: String,
      version: Int, status: String): Unit =
    appendEvents(Seq((fileId, user, op, version, status)))

  /** One event-log append for a batch, with one max(seq) scan for the
    * whole range.
    */
  private def appendEvents(
      rows: Seq[(String, String, String, Int, String)]): Unit = {
    checkWritable()
    import spark.implicits._
    val base = events.agg(coalesce(max(col("seq")), lit(0L))).head().getLong(0)
    val ts = now()
    rows.zipWithIndex.map { case ((fileId, user, op, version, status), i) =>
      (base + i + 1, fileId, user, op, version, status, ts)
    }
      .toDF("seq", "file_id", "user", "op", "version", "status", "ts_us")
      .write.options(ioOptions).mode("append").parquet(eventsDir)
  }

  private case class Meta(fileId: String, fileName: String, fileExt: String,
      currentVersion: Int, tsUs: Long, deleted: Boolean)

  private def allMeta: Seq[Meta] =
    if (!hasData(filesPath)) Nil
    else spark.read.options(ioOptions).parquet(filesPath).collect().toIndexedSeq.map(r => Meta(
      r.getAs[String]("file_id"), r.getAs[String]("file_name"),
      r.getAs[String]("file_ext"), r.getAs[Int]("current_version"),
      r.getAs[Long]("ts_us"), r.getAs[Boolean]("deleted")))

  private def writeMeta(rows: Seq[Meta]): Unit = {
    import spark.implicits._
    val tmp = filesPath + "_tmp_swap"
    rows.map(m => (m.fileId, m.fileName, m.fileExt, m.currentVersion, m.tsUs,
        m.deleted))
      .toDF("file_id", "file_name", "file_ext", "current_version", "ts_us",
        "deleted")
      .coalesce(1).write.options(ioOptions).mode("overwrite").parquet(tmp)
    // crash-safe exchange (data always on disk in files/ or
    // files.retire); recoverSwap at FileStore construction completes an
    // interrupted one
    graft.core.FsUtils.swapDirectory(Paths.get(tmp), Paths.get(filesPath))
  }

  private def insertMeta(m: Meta): Unit = writeMeta(allMeta :+ m)

  private def upsertMeta(fileId: String, f: Meta => Meta,
      delete: Boolean = false): Unit =
    writeMeta(allMeta.map(m =>
      if (m.fileId == fileId) {
        val updated = f(m)
        if (delete) updated.copy(deleted = true) else updated
      } else m))

  private def extOf(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i < 0) "dat" else name.substring(i + 1)
  }

  private def now(): Long = System.currentTimeMillis() * 1000L
}

object FileStore {
  val StatusCheckout = "checkout"
  val StatusCheckin = "checkin"
  val StatusAbandon = "abandon"
  val StatusNone = "none"

  private def emptyVersions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int, Long, String, Long, Array[Byte])]
      .toDF("file_id", "version", "ts_us", "sha256", "n_bytes", "content")
  }

  private def emptyEvents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, String, String, Int, String, Long)]
      .toDF("seq", "file_id", "user", "op", "version", "status", "ts_us")
  }

  private def emptyFiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, Int, Long, Boolean)]
      .toDF("file_id", "file_name", "file_ext", "current_version", "ts_us",
        "deleted")
  }
}
