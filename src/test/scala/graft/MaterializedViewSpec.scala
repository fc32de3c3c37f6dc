package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef
import graft.streaming.{MaterializedView, MvDef}

class MaterializedViewSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  /** Full group-by recompute of `mv` over an arbitrary base frame —
    * the oracle for every maintained state.
    */
  private def recompute(base: DataFrame, mv: MvDef): DataFrame = {
    val aggs = (count(lit(1)).as(MaterializedView.CountCol) +:
      mv.sumCols.map(c => sum(col(c).cast(MaterializedView.SumType))
        .cast(MaterializedView.SumType).as(MaterializedView.sumCol(c)))) ++
      mv.minMaxCols.flatMap(c => Seq(
        min(col(c)).as(MaterializedView.minColName(c)),
        max(col(c)).as(MaterializedView.maxColName(c))))
    base.groupBy(mv.keyCols.map(col): _*).agg(aggs.head, aggs.drop(1): _*)
  }

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  private def viewState(viewDb: GraftDatabase, mv: MvDef): DataFrame =
    viewDb.table(mv.view).drop(MaterializedView.KeyCol)
      .select((mv.keyCols ++ Seq(MaterializedView.CountCol) ++
        mv.sumCols.map(MaterializedView.sumCol) ++
        mv.minMaxCols.flatMap(c => Seq(MaterializedView.minColName(c),
          MaterializedView.maxColName(c)))).map(col): _*)

  test("snapshot consistency: after EVERY batch the view equals the " +
      "full recompute at that batch's end version — across inserts, " +
      "deletes, and an update, with min/max recomputed under deletes") {
    val base = Files.createTempDirectory("graft_mvsrc").toString
    val db = GraftDatabase(spark, "mvsrc", base)
      .defineTable(TableDef("sales", "id"))
    val mv = MvDef(source = "sales", view = "sales_by_key",
      keyCols = Seq("k"), sumCols = Seq("v"), minMaxCols = Seq("v"))
    // v1: two groups; v2: more rows incl. a new group; v3: delete the
    // current max of group a (forces the recompute path to find the
    // successor); v4: update bumps group b values (delete+insert pairs)
    db.insert("sales", Seq((1L, "a", 10.0), (2L, "a", 50.0),
      (3L, "b", 5.0)).toDF("id", "k", "v"))
    db.insert("sales", Seq((4L, "a", 20.0), (5L, "c", 7.0))
      .toDF("id", "k", "v"))
    db.delete("sales", col("v") === 50.0)
    db.updateMany("sales", col("k") === "b", Map("v" -> (col("v") + 100.0)))

    val outBase = Files.createTempDirectory("graft_mvview").toString
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvview", outBase), mv)
    val ckpt = Files.createTempDirectory("graft_mv_ck").toString
    val perBatchOk = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "mvsrc")
      .option("table", "sales").option("withCommitVersion", "true")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val b = batch.persist()
        try {
          MaterializedView.applyBatch(db, viewDb, mv, b, "mv-spec", id)
          // the pinned invariant: view state == recompute at the
          // batch's own end version
          if (!b.isEmpty) {
            val vMax = b.agg(max(col("_commit_version"))).head.getLong(0)
            val expect = recompute(db.tableAt("sales", vMax).get, mv)
            val got = viewState(viewDb, mv)
            if (asSet(got) != asSet(expect))
              perBatchOk.add(s"batch $id (version $vMax): view " +
                s"${asSet(got)} != recompute ${asSet(expect)}")
          }
        } finally { b.unpersist(); () }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(perBatchOk.isEmpty,
      s"per-batch snapshot consistency violated:\n${perBatchOk.toArray.mkString("\n")}")
    // final state: equals the recompute over the CURRENT table
    assert(asSet(viewState(viewDb, mv)) ==
      asSet(recompute(db.table("sales"), mv)))
    // and the arithmetic is right in user terms: group a lost its 50,
    // b was bumped to 105, c arrived in v2
    val byKey = MaterializedView.read(viewDb, mv)
      .select(col("k"), col(MaterializedView.CountCol), col("sum_v"),
        col("mv_min_v"), col("mv_max_v"))
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(byKey("a") == ((2L, 30.0, 10.0, 20.0)))
    assert(byKey("b") == ((1L, 105.0, 105.0, 105.0)))
    assert(byKey("c") == ((1L, 7.0, 7.0, 7.0)))
  }

  test("a group deleted down to zero rows is REMOVED from the view " +
      "(no tombstones), atomically with the same batch's upserts") {
    val base = Files.createTempDirectory("graft_mvz").toString
    val db = GraftDatabase(spark, "mvz", base)
      .defineTable(TableDef("t", "id"))
    val mv = MvDef(source = "t", view = "t_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    db.insert("t", Seq((1L, "gone", 1.0), (2L, "stays", 2.0))
      .toDF("id", "k", "v"))
    // one commit BOTH deletes every 'gone' row and (via a second
    // commit) inserts more 'stays' — drain with one batch per version
    db.delete("t", col("k") === "gone")
    db.insert("t", Seq((3L, "stays", 3.0)).toDF("id", "k", "v"))
    val outBase = Files.createTempDirectory("graft_mvz_view").toString
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvzv", outBase), mv)
    val ckpt = Files.createTempDirectory("graft_mvz_ck").toString
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "mvz")
      .option("table", "t").option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        MaterializedView.applyBatch(db, viewDb, mv, batch, "mvz-spec", id)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = viewDb.table(mv.view)
      .select("k", MaterializedView.CountCol)
      .as[(String, Long)].collect().toMap
    assert(rows == Map("stays" -> 2L),
      "the zeroed group must be physically absent, not count=0")
  }

  test("replay idempotence: the SAME (appId, batchId) re-applied is a " +
      "ledger-skipped no-op — the log version does not move") {
    val outBase = Files.createTempDirectory("graft_mvr").toString
    val mv = MvDef(source = "unused", view = "r_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvr", outBase), mv)
    val batch = Seq(("k1", 1.0, "insert"), ("k1", 2.0, "insert"))
      .toDF("k", "v", "_change_type")
    // sum-only view: srcDb is NEVER read (pass null to prove it
    // structurally — any base-table access would NPE)
    MaterializedView.applyBatch(null, viewDb, mv, batch, "mvr-app", 0L)
    val v = viewDb.logVersion
    val retries = MaterializedView.applyBatch(
      null, viewDb, mv, batch, "mvr-app", 0L)
    assert(retries == 0)
    assert(viewDb.logVersion == v,
      "a ledger-skipped replay must not commit anything")
    val got = viewDb.table(mv.view)
      .select("k", MaterializedView.CountCol).as[(String, Long)]
      .collect().toMap
    assert(got == Map("k1" -> 2L), "no double-fold")
  }

  test("feed incoherence fails LOUDLY: a delete for a row the view " +
      "never counted drives the group count negative") {
    val outBase = Files.createTempDirectory("graft_mvneg").toString
    val mv = MvDef(source = "unused", view = "n_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvneg", outBase), mv)
    val rogue = Seq(("ghost", 1.0, "delete")).toDF("k", "v", "_change_type")
    val e = intercept[Exception] {
      MaterializedView.applyBatch(null, viewDb, mv, rogue, "mvneg-app", 0L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("went negative")), e.getMessage)
  }

  test("lost-checkpoint RESUME: a fresh lineage restarts from the " +
      "atomically-recorded last-folded version under a new appId — no " +
      "double-fold, no gap") {
    val base = Files.createTempDirectory("graft_mvres").toString
    val db = GraftDatabase(spark, "mvres", base)
      .defineTable(TableDef("t", "id"))
    val mv = MvDef(source = "t", view = "res_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    db.insert("t", Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v"))
    db.insert("t", Seq((3L, "a", 4.0)).toDF("id", "k", "v"))
    val outBase = Files.createTempDirectory("graft_mvres_view").toString
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvresv", outBase), mv)
    def drain(appId: String, fromVersion: Option[Long]): Unit = {
      val ckpt = Files.createTempDirectory("graft_mvres_ck").toString
      var r = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "mvres")
        .option("table", "t").option("withCommitVersion", "true")
        .option("maxVersionsPerTrigger", "1")
      fromVersion.foreach(v => r = r.option("startingVersion", v.toString))
      val q = r.load()
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          MaterializedView.applyBatch(db, viewDb, mv, b, appId, id)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("mvres-a", None)
    assert(MaterializedView.lastFoldedVersion(viewDb, mv).contains(2L),
      "the fold mark tracks the last drained version")
    // the checkpoint is LOST here; more commits land meanwhile
    db.insert("t", Seq((4L, "b", 8.0)).toDF("id", "k", "v"))
    db.delete("t", col("id") === 1L)
    // resume: NEW appId + startingVersion from the recorded mark
    drain("mvres-b", MaterializedView.lastFoldedVersion(viewDb, mv))
    assert(MaterializedView.lastFoldedVersion(viewDb, mv).contains(4L))
    assert(asSet(viewState(viewDb, mv)) ==
      asSet(recompute(db.table("t"), mv)),
      "resumed view equals the recompute — no double-fold, no gap")
  }

  test("OPTIMIZE churning the view table concurrently with a live " +
      "drain: races retried (never fatal), final state exact") {
    val base = Files.createTempDirectory("graft_mvopt").toString
    val db = GraftDatabase(spark, "mvopt", base)
      .defineTable(TableDef("t", "id"))
    val mv = MvDef(source = "t", view = "opt_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    (0 until 6).foreach(i =>
      db.insert("t", Seq((i.toLong, s"k${i % 3}", i.toDouble))
        .toDF("id", "k", "v")))
    val outBase = Files.createTempDirectory("graft_mvopt_view").toString
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvoptv", outBase), mv)
    // separate maintenance handle (own session state), churning the
    // VIEW table while the stream folds into it
    val maintDb = GraftDatabase(spark, "mvoptv", outBase)
    @volatile var stop = false
    val churn = new Thread(() => {
      while (!stop) {
        try { maintDb.optimize("opt_by_k"); () }
        catch { case _: Exception => () } // absent table early, races
        Thread.sleep(10)
      }
    })
    churn.start()
    try {
      val ckpt = Files.createTempDirectory("graft_mvopt_ck").toString
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "mvopt")
        .option("table", "t").option("withCommitVersion", "true")
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          MaterializedView.applyBatch(db, viewDb, mv, b, "mvopt-app", id)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally { stop = true; churn.join() }
    assert(asSet(viewState(viewDb, mv)) ==
      asSet(recompute(db.table("t"), mv)),
      "view exact despite concurrent OPTIMIZE churn")
  }

  test("a batch whose rows for a group ALL carry a NULL measure leaves " +
      "the stored sum intact (SQL sum skips nulls; the fold must too)") {
    val outBase = Files.createTempDirectory("graft_mvnull").toString
    val mv = MvDef(source = "unused", view = "null_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"))
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvnull", outBase), mv)
    MaterializedView.applyBatch(null, viewDb, mv,
      Seq(("k1", Some(1.0), "insert"), ("k1", Some(2.0), "insert"))
        .toDF("k", "v", "_change_type"), "mvnull-app", 0L)
    // batch of ONLY null-valued rows for the group: d_sum is NULL
    MaterializedView.applyBatch(null, viewDb, mv,
      Seq(("k1", Option.empty[Double], "insert"))
        .toDF("k", "v", "_change_type"), "mvnull-app", 1L)
    val got = viewDb.table(mv.view)
      .select("k", MaterializedView.CountCol,
        MaterializedView.sumCol("v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getDecimal(2)).map(_.doubleValue))).toSeq
    assert(got == Seq(("k1", 3L, Some(3.0))),
      s"null-measure batch must not clobber the sum: $got")
  }

  test("a withCommitVersion batch spanning a historical ADD COLUMN " +
      "null-fills the older arms instead of failing the union") {
    val base = Files.createTempDirectory("graft_mvsch").toString
    val db = GraftDatabase(spark, "mvsch", base)
      .defineTable(TableDef("t", "id"))
    db.insert("t", Seq((1L, "a")).toDF("id", "s"))             // v1
    db.addColumn("t", "c", org.apache.spark.sql.types.LongType) // v2
    db.insert("t", Seq((2L, "b", 9L)).toDF("id", "s", "c"))    // v3
    val ckpt = Files.createTempDirectory("graft_mvsch_ck").toString
    val name = "mvsch_out_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // ONE batch spans all three versions: the v1 arm is pinned to the
    // pre-ADD-COLUMN stored schema and must null-fill `c`
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "mvsch")
      .option("table", "t").option("withCommitVersion", "true")
      .option("maxVersionsPerTrigger", "3").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name)
      .select("id", "c", "_commit_version")
      .as[(Long, Option[Long], Long)].collect().toSet
    assert(got == Set((1L, None, 1L), (2L, Some(9L), 3L)))
  }

  test("refreshOnce: poll-based refresh folds exactly the versions " +
      "since the fold mark — no stream, repeated calls no-op, capped " +
      "folds land the same state") {
    val base = Files.createTempDirectory("graft_mvpoll").toString
    val db = GraftDatabase(spark, "mvpoll", base)
      .defineTable(TableDef("t", "id"))
    val mv = MvDef(source = "t", view = "poll_by_k",
      keyCols = Seq("k"), sumCols = Seq("v"), minMaxCols = Seq("v"))
    val outBase = Files.createTempDirectory("graft_mvpoll_view").toString
    val viewDb = MaterializedView.define(
      GraftDatabase(spark, "mvpollv", outBase), mv)
    db.insert("t", Seq((1L, "a", 5.0), (2L, "b", 7.0)).toDF("id", "k", "v"))
    db.insert("t", Seq((3L, "a", 9.0)).toDF("id", "k", "v"))
    // capped at 1 version/fold: two merge commits, same final state
    assert(MaterializedView.refreshOnce(db, viewDb, mv,
      maxVersionsPerFold = 1) == 2L)
    assert(MaterializedView.lastFoldedVersion(viewDb, mv).contains(2L))
    assert(asSet(viewState(viewDb, mv)) ==
      asSet(recompute(db.table("t"), mv)))
    // caught up: a repeated refresh is a no-op (no commit)
    val ver = viewDb.logVersion
    assert(MaterializedView.refreshOnce(db, viewDb, mv) == 0L)
    assert(viewDb.logVersion == ver)
    // more churn, incl. a delete (the recompute arm) — one wide fold
    db.delete("t", col("v") === 9.0)
    db.updateMany("t", col("k") === "b", Map("v" -> (col("v") + 100.0)))
    assert(MaterializedView.refreshOnce(db, viewDb, mv) == 2L)
    assert(MaterializedView.lastFoldedVersion(viewDb, mv).contains(4L))
    assert(asSet(viewState(viewDb, mv)) ==
      asSet(recompute(db.table("t"), mv)))
  }

  test("withCommitVersion tags every row with the version that changed " +
      "it — per-version arms even when one batch spans two versions") {
    val base = Files.createTempDirectory("graft_mvwv").toString
    val db = GraftDatabase(spark, "mvwv", base)
      .defineTable(TableDef("t", "id"))
    db.insert("t", Seq((1L, "a")).toDF("id", "s")) // v1
    db.insert("t", Seq((2L, "b")).toDF("id", "s")) // v2
    val ckpt = Files.createTempDirectory("graft_mvwv_ck").toString
    val name = "mvwv_out_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "mvwv")
      .option("table", "t").option("withCommitVersion", "true")
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "insert", 1L), (2L, "insert", 2L)))
  }
}
