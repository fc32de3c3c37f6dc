package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** Lakehouse table operations layered on the commit log: time travel
  * (facade `tableAt` + SQL `VERSION AS OF`), the snapshot-diff change
  * feed (`changes`), small-file bin-packing (`optimize` / SQL
  * `OPTIMIZE`), and zero-copy shallow clone (`cloneCollection` / SQL
  * `CLONE COLLECTION`). The reference has no analog (single-node WAL
  * reuses pages in place); these are the operations the same contract
  * buys once state is immutable-files + versioned metadata.
  */
class LakehouseOpsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(pk: String = "id"): GraftDatabase = {
    val base = Files.createTempDirectory("graft-lakehouse").toString
    GraftDatabase(spark, "lakehouse", base).defineTable(TableDef("t", pk))
  }

  private def rows(n: Int) =
    (1 to n).map(i => (i, i * 10L, s"r$i")).toDF("id", "v", "name")

  // ---- time travel ---------------------------------------------------------

  test("tableAt reads every committed state; VERSION AS OF matches it") {
    val db = freshDb()
    db.insert("t", rows(10))
    val v1 = db.logVersion
    db.delete("t", col("id") <= 3)
    val v2 = db.logVersion
    db.updateMany("t", col("id") === 10, Map("v" -> lit(999L)))
    val v3 = db.logVersion

    assert(db.tableAt("t", v1).get.count() == 10)
    assert(db.tableAt("t", v2).get.count() == 7)
    assert(db.tableAt("t", v2).get.filter(col("v") === 999).count() == 0)
    assert(db.tableAt("t", v3).get.filter(col("v") === 999).count() == 1)
    // a version BELOW the table's creation: no binding
    assert(db.tableAt("t", 0L).isEmpty)

    // the SQL dialect's time travel reads the same states
    assert(db.sql(s"SELECT COUNT(*) AS n FROM t VERSION AS OF $v1")
      .as[Long].head() == 10)
    assert(db.sql(s"SELECT COUNT(*) AS n FROM t VERSION AS OF $v2")
      .as[Long].head() == 7)
    // two versions of one table can meet in a single statement (the
    // version-suffixed views never collide with the live binding)
    assert(db.sql(
      s"SELECT COUNT(*) AS n FROM t VERSION AS OF $v1 " +
        s"WHERE id NOT IN (SELECT id FROM t VERSION AS OF $v2)")
      .as[Long].head() == 3)
  }

  test("VERSION AS OF without a database-backed engine is rejected") {
    val engine = new graft.query.LiteSql(spark,
      Map("t" -> rows(3)), Map.empty)
    intercept[UnsupportedOperationException] {
      engine.run("SELECT * FROM t VERSION AS OF 1")
    }
  }

  // ---- TIMESTAMP AS OF -----------------------------------------------------

  /** Blocks until the wall clock has LEFT instant `t`'s millisecond, so
    * the next commit stamps strictly later.
    */
  private def pastMs(t: java.time.Instant): Unit =
    while (System.currentTimeMillis <= t.toEpochMilli) Thread.sleep(1)

  test("TIMESTAMP AS OF resolves wall clock to versions: exact stamp is " +
      "inclusive; pre-first-commit refuses; future resolves to head") {
    val db = freshDb()
    db.insert("t", rows(6))
    val v1 = db.logVersion
    val t1 = db.commitTimeOf(v1).get
    pastMs(t1)
    db.updateMany("t", col("id") === 1, Map("v" -> lit(999L)))
    val t2 = db.commitTimeOf(db.logVersion).get
    // the exact commit stamp resolves to THAT version (<= contract)
    assert(db.tableAsOf("t", t1).get
      .filter(col("id") === 1).head.getLong(1) == 10L)
    assert(db.tableAsOf("t", t2).get
      .filter(col("id") === 1).head.getLong(1) == 999L)
    // a future instant resolves to the head (latest version <= t)
    assert(db.tableAsOf("t", t2.plusSeconds(3600)).get
      .filter(col("id") === 1).head.getLong(1) == 999L)
    // before the first commit the mapping is unknowable — refuse
    intercept[IllegalArgumentException] {
      db.tableAsOf("t", t1.minusSeconds(3600))
    }
  }

  test("SQL TIMESTAMP AS OF binds snapshot views; two timestamp-resolved " +
      "snapshots join in one statement") {
    val db = freshDb()
    db.insert("t", rows(5))
    val t1 = db.commitTimeOf(db.logVersion).get
    pastMs(t1)
    db.updateMany("t", col("id") <= 2, Map("v" -> lit(0L)))
    val t2 = db.commitTimeOf(db.logVersion).get
    val out = db.sql(
      s"SELECT a.id AS id, a.v AS v_then, b.v AS v_now " +
        s"FROM t TIMESTAMP AS OF '$t1' a " +
        s"JOIN t TIMESTAMP AS OF '$t2' b ON a.id = b.id " +
        "WHERE a.v <> b.v ORDER BY a.id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1, 10L, 0L), (2, 20L, 0L)))
    // zone-less wall-clock literal parses in the session timezone
    val wall = java.time.LocalDateTime.ofInstant(t2,
      java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone))
      .toString.replace('T', ' ')
    assert(db.sql(s"SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF '$wall'")
      .head.getLong(0) == 5L)
  }

  test("TIMESTAMP AS OF refuses below the vacuum retention horizon") {
    val db = freshDb()
    db.insert("t", rows(4))
    val t1 = db.commitTimeOf(db.logVersion).get
    pastMs(t1)
    // push far past a checkpoint so vacuum can truncate v1's log file
    (1 to 12).foreach(i =>
      db.updateMany("t", col("id") === 1, Map("v" -> lit(i.toLong))))
    db.vacuum(keepVersions = 2, minAgeMs = 0L)
    intercept[IllegalArgumentException] { db.tableAsOf("t", t1) }
    // the surviving head still resolves
    val tHead = db.commitTimeOf(db.logVersion).get
    assert(db.tableAsOf("t", tHead).get.count() == 4)
  }

  test("writer clock skew monotonizes: version order wins over stamps") {
    import graft.catalog.TxLog
    val root = Files.createTempDirectory("graft_ts_skew").toString
    Files.createDirectories(Paths.get(root, "_txlog"))
    def w(v: Int, body: String): Unit = Files.write(
      Paths.get(root, "_txlog", f"v$v%08d.txt"), body.getBytes("UTF-8"))
    w(1, "CTS\t1000\nADD\tt\t")
    w(2, "CTS\t500\nADD\tt\t") // a skewed writer stamped BEFORE v1
    w(3, "CTS\t2000\nADD\tt\t")
    val log = new TxLog(spark, root)
    // v2's stamp monotonizes up to v1's: both are <= 1500, order kept
    assert(log.versionAtTime(1500L) == 2L)
    assert(log.versionAtTime(1000L) == 2L) // exact stamp, skew absorbed
    assert(log.versionAtTime(2000L) == 3L)
    intercept[IllegalArgumentException] { log.versionAtTime(999L) }
  }

  test("restore rolls a table back metadata-only, keeps history " +
      "time-travelable, and brings schema + stats back with it") {
    val db = freshDb()
    db.insert("t", rows(100).repartitionByRange(2, col("id")))
    val v1 = db.logVersion
    val filesThen = db.liveFiles("t")
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    db.delete("t", col("id") <= 50)
    db.updateMany("t", col("id") === 60, Map("v" -> lit(0L)))
    assert(db.table("t").count() == 50)

    val vRestore = db.restore("t", v1)
    assert(db.table("t").count() == 100)
    assert(db.liveFiles("t") == filesThen,
      "restore must rebind the HISTORICAL files, not copy them")
    // the pre-evolution schema came back with the version
    assert(!db.table("t").columns.contains("score"))
    // stats came back too: the range probe prunes again
    assert(db.seek("t", "id", 1, 10).inputFiles.length == 1)
    // history preserved: the undone state is still readable AS OF
    assert(db.tableAt("t", vRestore - 1).get.count() == 50)
    // SQL surface
    db.delete("t", col("id") > 90)
    assert(db.sql(s"RESTORE t TO VERSION $v1").as[Boolean].head())
    assert(db.table("t").count() == 100)
    // a vacuum-truncated version refuses loudly
    (1 to 12).foreach(i => db.updateMany("t", col("id") === 1,
      Map("v" -> lit(i.toLong))))
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    intercept[Exception] { db.restore("t", v1) }
  }

  test("restore refuses a future version, respects declared FKs, and " +
      "undrops by name") {
    val base = Files.createTempDirectory("graft-restore2").toString
    val db = GraftDatabase(spark, "restore2", base)
      .defineTable(TableDef("parent", "id"))
      .defineTable(TableDef("child", "cid", fks = Seq(
        graft.dml.ConstrainedDml.Fk("pid", "parent", "id",
          graft.dml.ConstrainedDml.Restrict))))
    db.insert("parent", Seq((1, "a"), (2, "b")).toDF("id", "tag"))
    val v1 = db.logVersion
    // a future version is an error, not a silent no-op
    intercept[IllegalArgumentException] { db.restore("parent", v1 + 50) }

    // child rows referencing a parent added AFTER v1 block the rollback
    db.insert("parent", Seq((3, "c")).toDF("id", "tag"))
    db.insert("child", Seq((10, 3)).toDF("cid", "pid"))
    val ex = intercept[IllegalStateException] { db.restore("parent", v1) }
    assert(ex.getMessage.contains("orphan"))
    // rolling the child back first unblocks the parent
    db.delete("child", col("cid") === 10)
    db.restore("parent", v1)
    assert(db.table("parent").count() == 2)

    // undrop: restore binds names, so a dropped name comes back
    db.dropCollection("parent")
    assert(!db.tableExists("parent"))
    db.restore("parent", v1)
    assert(db.table("parent").count() == 2)
  }

  // ---- change feed ---------------------------------------------------------

  test("changes() is row-exact across a file-granular rewrite and reads " +
      "only the exchanged files") {
    val db = freshDb()
    db.insert("t", rows(30).repartition(3))
    val v0 = db.logVersion
    assert(db.liveFiles("t").size == 3)
    val before = db.liveFiles("t").toSet

    // rewrite ONE row: the granular patch rewrites only its file, and
    // that file's untouched rows ride along on both sides of the diff
    db.updateMany("t", col("id") === 7, Map("v" -> lit(777L)))
    val v1 = db.logVersion
    val after = db.liveFiles("t").toSet
    assert(before.intersect(after).size == 2,
      "granular update must keep the two untouched files")

    val feed = db.changes("t", v0, v1)
    val got = feed.select("id", "v", "_change_type")
      .as[(Int, Long, String)].collect().toSet
    assert(got == Set((7, 70L, "delete"), (7, 777L, "insert")),
      s"pass-through rows must cancel, got $got")

    // scale contract: the diff's scan set is exactly the exchanged files
    val exchanged = (before -- after) ++ (after -- before)
    val scanned = feed.inputFiles.map(u => new java.net.URI(u).getPath).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(
      exchanged.map(p => Paths.get(p).toAbsolutePath.toString)),
      s"diff must read only exchanged files; read $scanned")
  }

  test("changes() classifies pure appends and reports no churn as empty") {
    val db = freshDb()
    db.insert("t", rows(5))
    val v0 = db.logVersion
    assert(db.changes("t", v0, v0).count() == 0)
    db.insert("t", (6 to 8).map(i => (i, i * 10L, s"r$i"))
      .toDF("id", "v", "name"))
    val feed = db.changes("t", v0, db.logVersion)
    assert(feed.filter(col("_change_type") === "insert").count() == 3)
    assert(feed.filter(col("_change_type") === "delete").count() == 0)
  }

  test("changesSince advances a CDC cursor across commit batches") {
    val db = freshDb()
    db.insert("t", rows(5))
    var cursor = db.logVersion
    val (empty, same) = db.changesSince("t", cursor)
    assert(empty.count() == 0 && same == cursor)

    db.insert("t", Seq((6, 60L, "r6")).toDF("id", "v", "name"))
    db.delete("t", col("id") === 2)
    val (feed1, v1) = db.changesSince("t", cursor)
    assert(v1 > cursor)
    assert(feed1.select("id", "_change_type").as[(Int, String)]
      .collect().toSet == Set((6, "insert"), (2, "delete")))
    cursor = v1

    // the cursor fences consumed history: only NEW churn appears
    db.updateMany("t", col("id") === 3, Map("v" -> lit(333L)))
    val (feed2, v2) = db.changesSince("t", cursor)
    assert(feed2.select("id", "v", "_change_type").as[(Int, Long, String)]
      .collect().toSet == Set((3, 30L, "delete"), (3, 333L, "insert")))
    assert(v2 == v1 + 1)
  }

  test("applyChanges replicates a table through the change feed: " +
      "converges, is file-granular, and replays are no-ops") {
    val basePrimary = Files.createTempDirectory("graft-primary").toString
    val baseReplica = Files.createTempDirectory("graft-replica").toString
    val primary = GraftDatabase(spark, "p", basePrimary)
      .defineTable(TableDef("t", "id"))
    val replica = GraftDatabase(spark, "r", baseReplica)
      .defineTable(TableDef("t", "id"))

    // bootstrap batch
    primary.insert("t", rows(30).repartition(3))
    var cursor = 0L
    val (boot, c1) = primary.changesSince("t", cursor)
    assert(replica.applyChanges("t", boot, "repl", 1L))
    cursor = c1
    assert(replica.table("t").count() == 30)

    // a mixed round: update + delete + insert on the primary
    primary.updateMany("t", col("id") === 7, Map("v" -> lit(777L)))
    primary.delete("t", col("id") === 20)
    primary.insert("t", Seq((31, 310L, "r31")).toDF("id", "v", "name"))
    val (feed2, c2) = primary.changesSince("t", cursor)
    val replicaFiles = replica.liveFiles("t").toSet
    assert(replica.applyChanges("t", feed2, "repl", 2L))
    cursor = c2
    // file-granular: the 3-file replica only rewrites files holding a
    // touched PK (plus the appended inserts)
    assert(replica.liveFiles("t").toSet.intersect(replicaFiles).nonEmpty,
      "untouched replica files must keep their physical paths")

    // converged: the replica equals the primary exactly
    val diff = replica.table("t").exceptAll(primary.table("t"))
      .unionAll(primary.table("t").exceptAll(replica.table("t")))
    assert(diff.count() == 0, "replica must converge to the primary")
    assert(replica.table("t").filter(col("v") === 777L).count() == 1)

    // a REPLAYED batch (consumer restarted before persisting its
    // cursor) must be a no-op — exactly-once from at-least-once
    val vBefore = replica.logVersion
    assert(!replica.applyChanges("t", feed2, "repl", 2L))
    assert(replica.logVersion == vBefore)
    assert(replica.table("t").count() == 30)
  }

  // ---- optimize ------------------------------------------------------------

  test("optimize packs only small files, leaves right-sized ones, and " +
      "publishes a relative patch") {
    val db = freshDb()
    // one LARGE file (1000 rows) + four small single-row appends
    db.insert("t", (1 to 1000).map(i => (i, i * 10L, s"r$i"))
      .toDF("id", "v", "name").repartition(1))
    val bigFile = db.liveFiles("t").head
    (1001 to 1004).foreach(i => db.insert("t",
      Seq((i, i * 10L, s"r$i")).toDF("id", "v", "name")))
    assert(db.liveFiles("t").size == 5)
    val vBefore = db.logVersion

    // threshold BETWEEN the sizes: the big file must stay untouched
    val bigBytes = Files.size(Paths.get(bigFile))
    val smallMax = db.liveFiles("t").filterNot(_ == bigFile)
      .map(f => Files.size(Paths.get(f))).max
    assert(smallMax < bigBytes, "fixture: appends must be smaller")
    val (fb, fa) = db.optimize("t", smallThreshold = (smallMax + bigBytes) / 2)
    assert(fb == 5 && fa == 2, s"expected 5 -> 2 files, got $fb -> $fa")
    assert(db.liveFiles("t").contains(bigFile),
      "right-sized file must keep its physical path (never rewritten)")
    assert(db.logVersion == vBefore + 1)
    // the exchange is a RELATIVE patch (stats lines ride along), so it
    // commutes with concurrent DML on disjoint files instead of
    // conflicting with it
    val acts = db.history.filter(col("version") === db.logVersion)
      .select("action").as[String].collect().toSet
    assert(acts.contains("PATCH") && !acts.contains("PUT"), acts)
    // data round-trips exactly
    assert(db.table("t").count() == 1004)
    assert(db.table("t").agg(org.apache.spark.sql.functions.sum("v"))
      .as[Long].head() == (1 to 1004).map(_ * 10L).sum)
  }

  test("optimize commutes with concurrent DML on disjoint files: both " +
      "commit, neither retries from scratch") {
    val db = freshDb()
    // big file holding ids 1..1000 + four single-row small appends
    db.insert("t", (1 to 1000).map(i => (i, i * 10L, s"r$i"))
      .toDF("id", "v", "name").repartition(1))
    (1001 to 1004).foreach(i => db.insert("t",
      Seq((i, i * 10L, s"r$i")).toDF("id", "v", "name")))
    val bigFile = db.liveFiles("t").head
    val smallMax = db.liveFiles("t").drop(1)
      .map(f => Files.size(Paths.get(f))).max
    val threshold = (smallMax + Files.size(Paths.get(bigFile))) / 2

    // race: OPTIMIZE packs the small backlog while updateMany patches a
    // row INSIDE the big file — the two relative patches exchange
    // disjoint files, so both must land whatever the interleaving
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    @volatile var optResult: (Int, Int) = null
    @volatile var dmlRows = -1L
    @volatile var failure: Throwable = null
    val tOpt = new Thread(() => {
      barrier.await()
      try optResult = db.optimize("t", smallThreshold = threshold)
      catch { case e: Throwable => failure = e }
    })
    val tDml = new Thread(() => {
      barrier.await()
      try dmlRows = db.updateMany("t", col("id") === 500,
        Map("v" -> lit(5555L)))
      catch { case e: Throwable => failure = e }
    })
    tOpt.start(); tDml.start(); tOpt.join(); tDml.join()
    if (failure != null) throw failure
    assert(optResult._1 == 5 && optResult._2 == 2,
      s"optimize must pack 5 -> 2 files, got $optResult")
    assert(dmlRows == 1L)
    assert(db.table("t").count() == 1004)
    assert(db.table("t").filter(col("v") === 5555L)
      .select("id").as[Int].head() == 500)
  }

  test("registered clustering: OPTIMIZE re-asserts a churned z-order " +
      "layout without re-specifying columns; checkpoint reports drift") {
    val db = freshDb()
    // 2-D data over a grid; unclustered insert
    db.insert("t", (1 to 4000).map(i =>
      (i, (i * 37 % 200).toLong, s"r$i")).toDF("id", "v", "name")
      .repartition(8))
    val bytes = db.liveFiles("t")
      .map(f => Files.size(Paths.get(f))).sum
    val (_, nAfter) = db.optimizeZorder("t", Seq("id", "v"),
      targetBytes = math.max(1L, bytes / 16))
    assert(db.clusterSpec("t").exists(_._1 == "zorder"))
    // a small box away from the z-curve's quadrant midline (the
    // documented boundary case where Morton ranges fragment)
    def boxScan(): Int = db.table("t")
      .filter(col("id").between(400, 800) && col("v").between(20, 60))
      .inputFiles.length
    val clusteredScan = boxScan()
    assert(clusteredScan <= math.max(2, nAfter / 4),
      s"clustered box probe must prune: $clusteredScan of $nAfter")
    // churn: appends + a DV delete drift the layout
    db.insert("t", (4001 to 4400).map(i =>
      (i, (i * 37 % 200).toLong, s"r$i")).toDF("id", "v", "name"))
    db.deleteVectorized("t", col("id") === 2000)
    val report = db.checkpoint()
    assert(report.exists(_.contains("cluster drift")),
      s"checkpoint must report the drifted layout: $report")
    // OPTIMIZE with NO columns re-clusters from the registered spec
    val (_, nRe) = db.optimize("t",
      targetBytes = math.max(1L, bytes / 16))
    val reScan = boxScan()
    assert(reScan <= math.max(2, nRe / 3),
      s"re-clustered box probe must prune again: $reScan of $nRe")
    assert(db.table("t").count() == 4399) // DV reconciled, appends kept
    assert(db.table("t").filter(col("id") === 2000).isEmpty)
    // undrifted: OPTIMIZE leaves the layout untouched (no version bump)
    val v = db.logVersion
    db.optimize("t", targetBytes = math.max(1L, bytes / 16))
    assert(db.logVersion == v, "undrifted clustered table must no-op")
    assert(db.checkpoint().forall(!_.contains("cluster drift")))
  }

  test("registered clustering: ensureIndex registers a range layout " +
      "that OPTIMIZE re-asserts; DROP INDEX retires the spec") {
    val db = freshDb()
    db.insert("t", (1 to 2000).map(i => (i, i * 10L, s"r$i"))
      .toDF("id", "v", "name").repartition(6))
    db.ensureIndex("t", "ix_v", "v", unique = false)
    assert(db.clusterSpec("t").exists(s => s._1 == "range" &&
      s._2 == Seq("v")))
    // churn, then OPTIMIZE restores range pruning on v without columns
    db.insert("t", (2001 to 2400).map(i => (i, i * 10L, s"r$i"))
      .toDF("id", "v", "name").repartition(3))
    val tBytes = math.max(1L,
      db.liveFiles("t").map(f => Files.size(Paths.get(f))).sum / 8)
    db.optimize("t", targetBytes = tBytes)
    val n = db.liveFiles("t").size
    val scanned = db.table("t")
      .filter(col("v").between(100L, 2000L)).inputFiles.length
    assert(n > 2 && scanned <= math.max(1, n / 2),
      s"re-asserted range layout must prune: $scanned of $n")
    db.sql("DROP INDEX t.ix_v")
    assert(db.clusterSpec("t").isEmpty,
      "dropping the index must retire the registered layout")
  }

  test("3-column ZORDER: SQL OPTIMIZE clusters three dims; box probes " +
      "on any pair prune; the registry carries all columns") {
    val db = freshDb()
    db.insert("t", (1 to 4000).map(i =>
      (i, (i * 37 % 200).toLong, (i * 53 % 300).toLong))
      .toDF("id", "v", "w").repartition(8))
    val bytes = db.liveFiles("t").map(f => Files.size(Paths.get(f))).sum
    // SQL surface parses the 3-column list (targetBytes via facade for
    // a deterministic file count)
    db.optimizeZorder("t", Seq("id", "v", "w"),
      targetBytes = math.max(1L, bytes / 16))
    assert(db.clusterSpec("t").exists(s =>
      s._1 == "zorder" && s._2 == Seq("id", "v", "w")))
    val n = db.liveFiles("t").size
    def scan(cond: org.apache.spark.sql.Column) =
      db.table("t").filter(cond).inputFiles.length
    // a small off-midline box on any PAIR of the three dims prunes
    // a pair box is a SLAB in 3-dim space (the third dim unconstrained)
    // — prunes less sharply than the 2-dim curve, but still well under
    // the full scan an unclustered layout pays
    assert(scan(col("id").between(400, 800) && col("v").between(20, 60))
      <= math.max(2, n / 2), "id×v box must prune")
    assert(scan(col("id").between(400, 800) && col("w").between(30, 90))
      <= math.max(2, n / 2), "id×w box must prune")
    // SQL form parses too (re-cluster, same registry)
    db.sql("OPTIMIZE t ZORDER BY (id, v, w)")
    assert(db.clusterSpec("t").exists(_._2 == Seq("id", "v", "w")))
  }

  test("clone carries the source's DV masks, stored schema, and stats " +
      "(deleted rows must NOT resurface in the clone)") {
    val db = freshDb()
    db.insert("t", rows(200).repartitionByRange(2, col("id")))
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    db.deleteVectorized("t", col("id") === 7)
    db.cloneCollection("t", "c1")
    assert(db.table("c1").count() == 199,
      "the clone must inherit the DV mask, not resurface the delete")
    assert(db.table("c1").filter(col("id") === 7).isEmpty)
    assert(db.table("c1").columns.contains("score"),
      "the clone must inherit the stored (ADD COLUMN) schema")
    // stats came over: the clone prunes immediately (probe the range
    // whose file carries no DV — a masked file's anti-join adds its
    // sidecar to inputFiles)
    assert(db.seek("c1", "id", 150, 160).inputFiles.length == 1)
    // clone and source then diverge copy-on-write
    db.insert("t", Seq((9001, 1L, "x")).toDF("id", "v", "name")
      .withColumn("score", lit(0.5)))
    assert(db.table("c1").count() == 199 && db.table("t").count() == 200)
  }

  test("CLONE at VERSION AS OF / TIMESTAMP AS OF binds the historical " +
      "state under the new name") {
    val db = freshDb()
    db.insert("t", rows(10))
    val v1 = db.logVersion
    val t1 = db.commitTimeOf(v1).get
    pastMs(t1)
    db.delete("t", col("id") <= 4)
    db.sql(s"CLONE COLLECTION t TO past VERSION AS OF $v1")
    assert(db.table("past").count() == 10,
      "the historical clone must carry v1's full state")
    assert(db.table("t").count() == 6)
    db.sql(s"CLONE COLLECTION t TO past_ts TIMESTAMP AS OF '$t1'")
    assert(db.table("past_ts").count() == 10)
    // RESTORE by timestamp: roll t itself back to the instant
    db.sql(s"RESTORE t TO TIMESTAMP AS OF '$t1'")
    assert(db.table("t").count() == 10)
    // a pre-creation version refuses
    intercept[Exception] {
      db.cloneCollection("t", "never", 0L)
    }
  }

  test("DESCRIBE HISTORY matches the whole identifier, not a prefix") {
    val base = Files.createTempDirectory("graft-dh").toString
    val db = GraftDatabase(spark, "dh", base)
      .defineTable(TableDef("cust", "id"))
      .defineTable(TableDef("customer", "id"))
    db.insert("cust", rows(3))
    db.insert("customer", rows(4))
    db.renameCollection("customer", "customer2")
    // `cust` must NOT absorb `customer`'s history (prefix) nor the
    // rename pair `customer->customer2` (substring)
    val targets = db.sql("DESCRIBE HISTORY cust")
      .select("target").as[String].collect().toSet
    assert(targets.nonEmpty)
    assert(targets.forall(t => t == "cust" || t.startsWith("cust(")),
      s"over-inclusive DESCRIBE HISTORY: $targets")
    // the renamed table's history matches BOTH sides of the arrow
    val t2 = db.sql("DESCRIBE HISTORY customer2")
      .select("target").as[String].collect().toSet
    assert(t2.contains("customer->customer2"))
    assert(db.sql("DESCRIBE HISTORY customer")
      .select("target").as[String].collect().toSet
      .contains("customer->customer2"))
  }

  // ---- lost vacuum races: no torn bindings ---------------------------------

  private def localPath(p: String): java.nio.file.Path =
    Paths.get(if (p.startsWith("file:")) new java.net.URI(p).getPath else p)

  test("a lost vacuum race during historical clone unbinds the torn dst") {
    val base = Files.createTempDirectory("graft-clonerace").toString
    @volatile var armed = false
    @volatile var doomed: java.nio.file.Path = null
    val hooked = new graft.catalog.CommitPrimitive {
      override def putIfAbsent(target: java.nio.file.Path,
          content: Array[Byte]): Unit = {
        graft.catalog.CommitPrimitive.posix.putIfAbsent(target, content)
        // the "vacuum": reclaim a cloned file the instant the clone's
        // commit becomes visible — deterministic post-commit loss
        if (armed && new String(content).linesIterator
            .exists(_.startsWith("PUT\tt2\t"))) {
          armed = false
          Files.deleteIfExists(doomed)
        }
      }
    }
    val db = GraftDatabase(spark, "clonerace", base,
      graft.core.Collation.Binary, None, hooked)
      .defineTable(TableDef("t", "id"))
    db.insert("t", rows(5))
    val v1 = db.logVersion
    // rewrite everything so v1's files are unbound at head (vacuumable)
    db.updateMany("t", col("id") >= 1, Map("v" -> lit(0L)))
    val headFiles = db.table("t").inputFiles.toSet
    val v1Only = db.tableAt("t", v1).get.inputFiles
      .filterNot(headFiles).head
    doomed = localPath(v1Only)
    armed = true
    val ex = intercept[IllegalStateException](
      db.cloneCollection("t", "t2", v1))
    assert(ex.getMessage.contains("reclaimed"))
    // the torn dst did NOT persist: it is unbound, and the suggested
    // re-clone (of a retained version) is NOT blocked by a ghost table
    assert(!db.tableExists("t2"))
    db.cloneCollection("t", "t2")
    assert(db.table("t2").count() == 5)
  }

  test("a lost vacuum race during restore rolls the binding back") {
    val base = Files.createTempDirectory("graft-restorerace").toString
    @volatile var armed = false
    @volatile var doomed: java.nio.file.Path = null
    val hooked = new graft.catalog.CommitPrimitive {
      override def putIfAbsent(target: java.nio.file.Path,
          content: Array[Byte]): Unit = {
        graft.catalog.CommitPrimitive.posix.putIfAbsent(target, content)
        if (armed && new String(content).linesIterator
            .exists(_.startsWith("PUT\tt\t"))) {
          armed = false // one-shot: the ROLLBACK commit must land intact
          Files.deleteIfExists(doomed)
        }
      }
    }
    val db = GraftDatabase(spark, "restorerace", base,
      graft.core.Collation.Binary, None, hooked)
      .defineTable(TableDef("t", "id"))
    db.insert("t", rows(5))
    val v1 = db.logVersion
    db.updateMany("t", col("id") >= 1, Map("v" -> lit(777L)))
    val headFiles = db.table("t").inputFiles.toSet
    doomed = localPath(db.tableAt("t", v1).get.inputFiles
      .filterNot(headFiles).head)
    val before = db.table("t").orderBy("id").collect().toSeq
    armed = true
    val ex = intercept[IllegalStateException](db.restore("t", v1))
    assert(ex.getMessage.contains("reclaimed"))
    // the binding rolled BACK to the pre-restore state: reads still work
    // and see exactly what they saw before the failed restore
    assert(db.table("t").orderBy("id").collect().toSeq == before)
  }

  test("SQL VACUUM and DESCRIBE HISTORY surface the store maintenance") {
    val db = freshDb()
    db.insert("t", rows(100))
    (1 to 12).foreach(i =>
      db.updateMany("t", col("id") === 1, Map("v" -> lit(i.toLong))))
    val h = db.sql("DESCRIBE HISTORY")
    assert(h.columns.toSeq ==
      Seq("version", "action", "target", "n_files"))
    assert(h.count() > 12)
    assert(db.sql("DESCRIBE HISTORY t").filter(col("action") === "CTS")
      .isEmpty, "per-collection history filters to the table's actions")
    assert(db.sql("DESCRIBE HISTORY t").count() > 0)
    // vacuum with explicit retention reclaims the retired rewrites
    val n = db.sql("VACUUM RETAIN 2 VERSIONS RETAIN 0 HOURS")
      .head.getLong(0)
    assert(n > 0, "retired granular rewrites must reclaim")
    assert(db.table("t").count() == 100, "live state survives vacuum")
  }

  test("optimize with nothing to pack is a no-op (no version bump)") {
    val db = freshDb()
    db.insert("t", rows(10).repartition(1))
    val v = db.logVersion
    val (fb, fa) = db.optimize("t")
    assert(fb == 1 && fa == 1 && db.logVersion == v)
  }

  test("SQL OPTIMIZE surfaces the file counts") {
    val db = freshDb()
    (1 to 3).foreach(i => db.insert("t",
      Seq((i, i * 10L, s"r$i")).toDF("id", "v", "name")))
    val out = db.sql("OPTIMIZE t").as[(Long, Long)].head()
    assert(out == ((3L, 1L)))
  }

  // ---- data skipping (log-held file stats) ---------------------------------

  test("seek prunes the file list from log-held stats with zero " +
      "read-time footer I/O; results equal the unpruned filter") {
    val db = freshDb()
    db.insert("t", rows(400).repartitionByRange(4, col("id")))
    assert(db.liveFiles("t").size == 4)
    // range-clustered: ids 101..200 live in one file; the seek must
    // scan ONLY that file (pruned from the log, not from footers)
    val out = db.seek("t", "id", 120, 180)
    assert(out.count() == 61)
    assert(out.inputFiles.length == 1,
      s"expected 1 surviving file, scanned ${out.inputFiles.length}")
    // exactness against the unpruned filter
    assert(out.exceptAll(db.table("t")
      .filter(col("id") >= 120 && col("id") <= 180)).count() == 0)
    // a provably-empty range scans nothing and keeps the schema
    val empty = db.seek("t", "id", 5000, 6000)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("id", "v", "name"))
    // string-typed bounds prune too
    val byName = db.seek("t", "name", "r100", "r102")
    assert(byName.count() ==
      db.table("t").filter(col("name").between("r100", "r102")).count())
  }

  test("seek is conservative: files without stats (legacy import) are " +
      "always scanned, never mispruned") {
    val base = Files.createTempDirectory("graft-legacy").toString
    // a pre-commit-log layout: files directly under Tables/<t>, no log
    rows(50).repartition(1).write
      .parquet(s"$base/legacy/Tables/t_tmp_write")
    val dir = Paths.get(s"$base/legacy/Tables/t")
    Files.createDirectories(dir.getParent)
    Files.move(Paths.get(s"$base/legacy/Tables/t_tmp_write"), dir)
    val db = GraftDatabase(spark, "legacy", base)
      .defineTable(TableDef("t", "id"))
    // imported in place: no staged stats exist for these files
    val out = db.seek("t", "id", 10, 20)
    assert(out.count() == 11)
    assert(out.inputFiles.nonEmpty)
  }

  test("file stats survive checkpoint replay + vacuum and retire with " +
      "their files") {
    val db = freshDb()
    db.insert("t", rows(200).repartitionByRange(2, col("id")))
    // cross a checkpoint boundary and truncate below it
    (1 to 12).foreach(i => db.updateMany("t", col("id") === 1,
      Map("v" -> lit(i.toLong))))
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    val db2 = GraftDatabase(spark, "lakehouse",
      Paths.get(db.root).getParent.toString).defineTable(TableDef("t", "id"))
    val out = db2.seek("t", "id", 150, 160)
    assert(out.count() == 11)
    assert(out.inputFiles.length == 1,
      "stats must replay from the checkpoint and keep pruning")
    // a rewritten file's stats follow the rewrite: the granular update
    // of id=1 retired the first file's original version, and seek at
    // the low range still scans exactly one (the replacement) file
    assert(db2.seek("t", "id", 1, 5).inputFiles.length == 1)
  }

  test("stats never misprune the tricky types: DECIMAL columns yield no " +
      "entry, infinite bounds scan conservatively, UTF-8 order rules " +
      "strings") {
    // DECIMAL physical stats are UNSCALED ints — harvesting them raw
    // would prune files whose scaled values match the probe
    val db = freshDb()
    db.insert("t", spark.sql(
      """SELECT id, CAST(id AS DECIMAL(9,2)) * 1.5 AS price
         FROM range(1, 101) AS r(id)""").repartitionByRange(2, col("id")))
    val byPrice = db.seek("t", "price", java.math.BigDecimal.valueOf(15.0),
      java.math.BigDecimal.valueOf(30.0))
    assert(byPrice.count() == db.table("t")
      .filter(col("price").between(15.0, 30.0)).count(),
      "a DECIMAL probe must never lose rows to unscaled stats")
    // the numeric id column still prunes on the same table
    assert(db.seek("t", "id", 1, 10).inputFiles.length == 1)

    // an infinite probe bound is 'no bound' — conservative, not a crash
    val db2 = freshDb()
    db2.insert("t", rows(20).repartitionByRange(2, col("id")))
    assert(db2.seek("t", "v", 0.0, Double.PositiveInfinity).count() == 20)

    // a data file CONTAINING infinities keeps its other columns' stats
    val db3 = freshDb()
    db3.insert("t", spark.sql(
      """SELECT id, CAST(CASE WHEN id = 1 THEN 'Infinity'
           ELSE CAST(id AS STRING) END AS DOUBLE) AS score
         FROM range(1, 51) AS r(id)"""))
    assert(db3.seek("t", "id", 100, 200).count() == 0)
    assert(db3.seek("t", "score", 2.0, 3.0).count() == 2)

    // unsigned UTF-8 ordering: a supplementary-plane probe against a
    // file whose max is U+FFFD must NOT be pruned (Java UTF-16 order
    // would wrongly exclude it)
    val json = Some("""{"s":{"k":"str","lo":"a","hi":"�"}}""")
    assert(!graft.catalog.FileStatsUtil.overlaps(
      json, "s", "😀", "😀"),
      "U+1F600 sorts ABOVE U+FFFD in UTF-8 bytes: provably outside")
    assert(graft.catalog.FileStatsUtil.overlaps(
      Some("""{"s":{"k":"str","lo":"a","hi":"😀"}}"""),
      "s", "�", "�"),
      "U+FFFD is INSIDE [a, U+1F600] under UTF-8 byte order")
  }

  test("a change batch that touches nothing consumes its marker without " +
      "committing a junk data file") {
    val db = freshDb()
    db.insert("t", rows(5))
    val files = db.liveFiles("t")
    val ghost = rows(5).filter(col("id") > 100) // misses every PK
      .withColumn("_change_type", lit("delete"))
    assert(db.applyChanges("t", ghost, "ghost", 1L))
    assert(db.liveFiles("t") == files,
      "a no-op batch must not append an empty data file")
    // ...but the marker advanced: a replay is now a no-op
    assert(!db.applyChanges("t", ghost, "ghost", 1L))
  }

  test("stats harvest through file-at-rest encryption (PME footers)") {
    val base = Files.createTempDirectory("graft-enc-seek").toString
    val db = GraftDatabase(spark, "encseek", base,
      graft.core.Collation.Binary, Some("seek-key"))
      .defineTable(TableDef("t", "id"))
    db.insert("t", rows(100).repartitionByRange(2, col("id")))
    val out = db.seek("t", "id", 10, 20)
    assert(out.count() == 11)
    assert(out.inputFiles.length == 1,
      "encrypted footers must still yield stage-time stats (keyed read)")
  }

  // ---- shallow clone -------------------------------------------------------

  test("clone is metadata-only, diverges copy-on-write, and survives " +
      "dropping + vacuuming the source") {
    val base = Files.createTempDirectory("graft-lakehouse").toString
    val db = GraftDatabase(spark, "lakehouse", base)
      .defineTable(TableDef("t", "id"))
    db.insert("t", rows(20))
    val srcFiles = db.liveFiles("t")
    val v0 = db.logVersion

    db.cloneCollection("t", "t2")
    assert(db.logVersion == v0 + 1, "clone must be exactly one commit")
    assert(db.liveFiles("t2") == srcFiles, "zero copy: shared files")

    // diverge BOTH sides; each write is copy-on-write over shared files
    db.delete("t2", col("id") <= 5)
    db.updateMany("t", col("id") === 1, Map("v" -> lit(111L)))
    assert(db.table("t").count() == 20 && db.table("t2").count() == 15)
    assert(db.table("t2").filter(col("v") === 111).count() == 0)

    // the clone carries the source's TableDef: PK duplicates rejected
    intercept[IllegalStateException] {
      db.insert("t2", Seq((6, 0L, "dup")).toDF("id", "v", "name"))
    }

    // dropping the source and vacuuming ALL history must not strand the
    // clone: retention is computed across every table's retained
    // snapshots, and t2 still references some of the original files
    db.dropCollection("t")
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    assert(db.table("t2").count() == 15)
    assert(db.table("t2").agg(org.apache.spark.sql.functions.sum("v"))
      .as[Long].head() == (6 to 20).map(_ * 10L).sum)
  }

  // ---- schema evolution ----------------------------------------------------

  test("addColumn is metadata-only and older files null-fill the column") {
    val db = freshDb()
    db.insert("t", rows(10))
    val files = db.liveFiles("t")
    val v0 = db.logVersion
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    assert(db.logVersion == v0 + 1, "ADD COLUMN must be one commit")
    assert(db.liveFiles("t") == files, "ADD COLUMN must touch no data file")
    assert(db.table("t").schema.fieldNames.toSeq ==
      Seq("id", "v", "name", "score"))
    assert(db.table("t").filter(col("score").isNull).count() == 10)
    intercept[IllegalArgumentException] {
      db.addColumn("t", "SCORE", org.apache.spark.sql.types.LongType)
    }
  }

  test("a widening write extends the stored schema in the same commit") {
    val db = freshDb()
    db.insert("t", rows(5))
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    // append rows that carry yet ANOTHER column: the commit must widen
    // the stored schema, or the pinned read would hide it
    db.insert("t", Seq((6, 60L, "r6", 0.5, "en"))
      .toDF("id", "v", "name", "score", "lang"))
    val t = db.table("t")
    assert(t.schema.fieldNames.toSeq == Seq("id", "v", "name", "score", "lang"))
    assert(t.filter(col("lang").isNull).count() == 5)
    assert(t.filter(col("lang") === "en").count() == 1)
    // updating an evolved table round-trips the widened schema
    db.updateMany("t", col("id") === 2, Map("score" -> lit(9.5)))
    assert(db.table("t").filter(col("score") === 9.5)
      .select("id").as[Int].head() == 2)
  }

  test("the stored schema follows RENAME, dies with DROP, and survives " +
      "checkpoint replay + vacuum") {
    val db = freshDb()
    db.insert("t", rows(3))
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    db.renameCollection("t", "u")
    assert(db.table("u").schema.fieldNames.contains("score"))
    // push past a checkpoint boundary and truncate the log below it:
    // the schema must replay from the checkpoint, not the lost commits
    (1 to 12).foreach(i => db.updateMany("u", col("id") === 1,
      Map("v" -> lit(i.toLong))))
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    val db2 = GraftDatabase(spark,
      "lakehouse", Paths.get(db.root).getParent.toString)
    assert(db2.table("u").schema.fieldNames.contains("score"))
    assert(db2.table("u").filter(col("score").isNull).count() == 3)
    // DROP clears it: a recreated table starts schema-free
    db.dropCollection("u")
    db.insert("u", Seq((1, "fresh")).toDF("id", "w"))
    assert(db.table("u").schema.fieldNames.toSeq == Seq("id", "w"))
  }

  test("SQL ALTER COLLECTION ADD COLUMN evolves through the dialect") {
    val db = freshDb()
    db.insert("t", rows(4))
    assert(db.sql("ALTER COLLECTION t ADD COLUMN score DOUBLE")
      .as[Boolean].head())
    assert(db.sql("SELECT COUNT(*) AS n FROM t WHERE score IS NULL")
      .as[Long].head() == 4)
  }

  test("optimize packs a backlog that straddles an ADD COLUMN without " +
      "losing the new column") {
    val db = freshDb()
    db.insert("t", rows(2).repartition(1))
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    db.insert("t", Seq((3, 30L, "r3", 1.5))
      .toDF("id", "v", "name", "score").repartition(1))
    val (fb, fa) = db.optimize("t")
    assert(fb == 2 && fa == 1)
    val t = db.table("t")
    assert(t.count() == 3 && t.filter(col("score") === 1.5).count() == 1)
  }

  test("changes() stays union-compatible across an ADD COLUMN") {
    val db = freshDb()
    db.insert("t", rows(3))
    val v0 = db.logVersion
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    db.insert("t", Seq((4, 40L, "r4", 2.5)).toDF("id", "v", "name", "score"))
    db.delete("t", col("id") === 1)
    val feed = db.changes("t", v0, db.logVersion)
    assert(feed.filter(col("_change_type") === "insert")
      .select("id").as[Int].collect().toSet == Set(4))
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Int].collect().toSet == Set(1))
  }

  test("a partial write staging a known column at a different type is " +
      "rejected; a full rewrite re-syncs the stored type") {
    val db = freshDb()
    db.insert("t", rows(4))
    db.addColumn("t", "score", org.apache.spark.sql.types.DoubleType)
    // append with score as STRING: committing it would leave two
    // incompatible physical types behind one pinned schema — every
    // later read would throw inside the parquet reader. Must fail AT
    // THE WRITE. (A NARROWER-but-widenable type — int under the double
    // pin — is fine: the reader upcasts it, the type-widening contract.)
    val ex = intercept[IllegalStateException] {
      db.insert("t", Seq((5, 50L, "r5", "oops"))
        .toDF("id", "v", "name", "score"))
    }
    assert(ex.getMessage.contains("cast the incoming column"))
    assert(db.table("t").count() == 4, "rejected append must not commit")
    db.insert("t", Seq((5, 50L, "r5", 7)).toDF("id", "v", "name", "score"))
    assert(db.table("t").filter(col("score") === 7.0d).count() == 1,
      "a widenable narrow append lands and upcasts at scan")
    db.delete("t", col("id") === 5)
    // transform updates COERCE the SET value to the column's stored
    // type (when/otherwise), so granular DML cannot drift a type either
    db.updateMany("t", col("id") === 1, Map("score" -> lit(1)))
    assert(db.table("t").schema("score").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(db.table("t").filter(col("score") === 1.0d).count() == 1)
    // the FULL-replace path (a transaction's Put rewrites every live
    // file) re-syncs the stored schema when the committed state widens
    db.sql("BEGIN")
    db.sql("""INSERT INTO t VALUES {"id": 9, "v": 90, "name": "r9",
      "score": 2.5, "lang": "en"}""")
    db.sql("COMMIT")
    assert(db.table("t").schema.fieldNames.contains("lang"),
      "a widening transactional rewrite must extend the stored schema")
    assert(db.table("t").filter(col("lang").isNull).count() == 4)
  }

  test("changes() fails loudly on a cursor vacuumed below the retention " +
      "floor instead of re-emitting the table as inserts") {
    val db = freshDb()
    db.insert("t", rows(5))
    val stale = db.logVersion
    // push past a checkpoint boundary, then truncate the log below it
    (1 to 12).foreach(i => db.updateMany("t", col("id") === 1,
      Map("v" -> lit(i.toLong))))
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    val ex = intercept[IllegalStateException] {
      db.changes("t", stale, db.logVersion)
    }
    assert(ex.getMessage.contains("truncated by vacuum"))
    // version 0 stays the explicit bootstrap: full current state as inserts
    val boot = db.changes("t", 0L, db.logVersion)
    assert(boot.filter(col("_change_type") === "insert").count() == 5)
  }

  test("DML bases on the SETTLED head: an in-flight empty commit is a " +
      "conflict, not a silently skipped one") {
    val db = freshDb()
    db.insert("t", rows(3))
    // simulate a non-conforming publisher's claim→write window: a
    // zero-byte version file at the head slot
    val logDir = Paths.get(db.root, "_txlog")
    val v = db.logVersion
    val inflight = logDir.resolve(f"v${v + 1}%08d.txt")
    Files.createFile(inflight)
    // the insert validates at the settled base (v), so the conflict
    // check MUST inspect v+1 — unreadable ⇒ fail safe, never skip
    intercept[java.util.ConcurrentModificationException] {
      db.insert("t", Seq((4, 40L, "r4")).toDF("id", "v", "name"))
    }
    // once the in-flight commit lands, the same insert validates
    // against it and goes through
    Files.write(inflight, "ADD\tother\t".getBytes("UTF-8"))
    db.insert("t", Seq((4, 40L, "r4")).toDF("id", "v", "name"))
    assert(db.table("t").count() == 4)
  }

  test("OPTIMIZE ZORDER BY clusters both dimensions, reconciles DVs, " +
      "and the SQL form parses") {
    val db = freshDb()
    // two independent dimensions, deliberately unclustered
    db.insert("t", (1 to 4000).map { i =>
      (i, (i * 2654435761L % 1000).toInt, (i * 40503L % 1000).toDouble)
    }.toDF("id", "a", "b").repartition(6))
    db.deleteVectorized("t", col("id") === 77)
    val (before, after) = db.optimizeZorder("t", Seq("a", "b"),
      targetBytes = db.liveFiles("t")
        .map(f => Files.size(Paths.get(f))).sum / 8)
    assert(before == 6 && after >= 4)
    // the DV reconciled into the rewrite (mask gone, row still absent)
    assert(db.txlogSnapshotForTest.dvs.isEmpty)
    assert(db.table("t").count() == 3999)
    // a 20%x20% box probe on the DEFAULT read path prunes (box inside
    // one z-quadrant — a box STRADDLING the 0.5x0.5 corner spreads
    // across the curve's four farthest runs, the documented z-order
    // worst case; q153 gates that shape with a looser bound)
    val probe = db.sql(
      "SELECT id FROM t WHERE a BETWEEN 100 AND 300 AND b >= 100.0 AND b <= 300.0")
    assert(probe.inputFiles.length <= math.max(2, after / 2),
      s"z-clustered box probe scanned ${probe.inputFiles.length} of $after")
    // content identical to the pre-cluster state
    assert(probe.count() ==
      db.table("t").filter(col("a").between(100, 300) &&
        col("b").between(100.0, 300.0)).count())
    // SQL form
    val r = db.sql("OPTIMIZE t ZORDER BY (a, b)").head()
    assert(r.getLong(0) >= 1 && r.getLong(1) >= 1)
    // still exactly two columns required
    intercept[IllegalArgumentException](db.optimizeZorder("t", Seq("a")))
  }

  test("SQL CLONE COLLECTION clones and rejects an existing target") {
    val db = freshDb()
    db.insert("t", rows(4))
    assert(db.sql("CLONE COLLECTION t TO t3").as[Boolean].head())
    assert(db.sql("SELECT COUNT(*) AS n FROM t3").as[Long].head() == 4)
    intercept[Exception] { db.sql("CLONE COLLECTION t TO t3") }
  }
}
