package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.{GraftDatabase, TxLog}
import graft.dml.ConstrainedDml.{Fk, Restrict, Cascade, TableDef}

/** Deletion vectors (merge-on-read point deletes): a 1-row delete
  * publishes a tiny PK-list sidecar instead of rewriting its data file
  * (the Delta DV shape). Masks apply at every read surface, ride time
  * travel / RESTORE, surface in the change feed, reconcile under
  * OPTIMIZE, survive vacuum while referenced, and conflict like
  * patches at file granularity.
  */
class DeletionVectorSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(name: String = "dvdb") = GraftDatabase(spark, name,
    Files.createTempDirectory("graft_dv").toString)

  private def seed(db: GraftDatabase, n: Int = 400, files: Int = 4): Unit = {
    db.defineTable(TableDef("t", "id"))
    db.insert("t", (1 to n).map(i => (i, i * 10L, s"r$i")).toDF("id", "v", "s")
      .repartitionByRange(files, col("id")))
  }

  test("point delete publishes ZERO rewritten data files; reads mask") {
    val db = freshDb()
    seed(db)
    val before = db.liveFiles("t").toSet
    val v0 = db.logVersion
    val n = db.deleteVectorized("t", col("id").isin(5, 7, 305))
    assert(n == 3)
    assert(db.logVersion == v0 + 1, "DV delete is ONE commit")
    assert(db.liveFiles("t").toSet == before,
      "a deletion-vector delete must not add/remove/rewrite ANY data file")
    assert(db.table("t").count() == 397)
    assert(db.table("t").filter(col("id") === 5).isEmpty)
    assert(db.table("t").filter(col("id") === 6).count() == 1)
    // sql + find surfaces mask too
    assert(db.sql("SELECT id FROM t WHERE id IN (5, 6, 7)").count() == 1)
  }

  test("re-masking a file unions with its existing DV; seek masks") {
    val db = freshDb()
    seed(db)
    assert(db.deleteVectorized("t", col("id") === 10) == 1)
    assert(db.deleteVectorized("t", col("id") === 11) == 1)
    assert(db.table("t").filter(col("id").isin(10, 11)).isEmpty)
    assert(db.table("t").count() == 398)
    // deleting an already-masked row is a no-op (no commit)
    val v = db.logVersion
    assert(db.deleteVectorized("t", col("id") === 10) == 0)
    assert(db.logVersion == v)
    // seek goes through the masked read
    assert(db.seek("t", "id", 9, 12).count() == 2) // 9 and 12 survive
  }

  test("time travel: the mask belongs to its version") {
    val db = freshDb()
    seed(db)
    val v0 = db.logVersion
    db.deleteVectorized("t", col("id") === 42)
    assert(db.tableAt("t", v0).get.filter(col("id") === 42).count() == 1)
    assert(db.table("t").filter(col("id") === 42).isEmpty)
  }

  test("change feed surfaces DV deletes (no files exchanged)") {
    val db = freshDb()
    seed(db)
    val v0 = db.logVersion
    db.deleteVectorized("t", col("id").isin(3, 101))
    val feed = db.changes("t", v0, db.logVersion)
    val rows = feed.select(col("id"), col("_change_type")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((3, "delete"), (101, "delete")))
    // and a second incremental window is empty
    val (feed2, _) = db.changesSince("t", db.logVersion)
    assert(feed2.isEmpty)
  }

  test("OPTIMIZE reconciles: masked content rewrites, sidecars drop") {
    val db = freshDb()
    seed(db)
    db.deleteVectorized("t", col("id") === 200)
    val (nb, na) = db.optimize("t")
    assert(na < nb, "dv'd small files must bin-pack")
    // the mask is materialized: no DV remains on any live file
    val snap = dvSnapshot(db)
    assert(snap.isEmpty, s"OPTIMIZE must drop reconciled DVs, found $snap")
    assert(db.table("t").count() == 399)
    assert(db.table("t").filter(col("id") === 200).isEmpty)
  }

  test("RESTORE rebinds the version's masks (and undoes later ones)") {
    val db = freshDb()
    seed(db)
    db.deleteVectorized("t", col("id") === 1)
    val vMasked = db.logVersion
    db.deleteVectorized("t", col("id") === 2)
    assert(db.table("t").count() == 398)
    db.restore("t", vMasked)
    // id=1 stays deleted (its mask is part of vMasked), id=2 is back
    assert(db.table("t").filter(col("id") === 1).isEmpty)
    assert(db.table("t").filter(col("id") === 2).count() == 1)
    assert(db.table("t").count() == 399)
  }

  test("RESTORE to a version where a file carried NO mask clears the " +
      "later mask (explicit removal, not a leftover)") {
    val db = freshDb()
    seed(db)
    val v0 = db.logVersion // no DVs anywhere
    db.deleteVectorized("t", col("id") === 7)
    assert(db.table("t").count() == 399)
    db.restore("t", v0)
    // the restored state must NOT silently keep the later delete
    assert(db.table("t").filter(col("id") === 7).count() == 1,
      "restore must clear masks added after the target version")
    assert(db.table("t").count() == 400)
    assert(dvSnapshot(db).isEmpty)
    // and the pre-restore masked state stays time-travelable
    assert(db.tableAt("t", v0 + 1).get.count() == 399)
  }

  test("vacuum keeps referenced sidecars, reclaims unreferenced ones") {
    val db = freshDb()
    seed(db)
    db.deleteVectorized("t", col("id") === 9)
    val dv1 = dvSnapshot(db).values.head
    // retained: aggressive vacuum keeps the sidecar, reads still mask
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    assert(Files.exists(Paths.get(s"${db.root}/$dv1")))
    assert(db.table("t").filter(col("id") === 9).isEmpty)
    // replace the mask (union re-mask) then vacuum: the OLD sidecar is
    // no longer referenced by any retained snapshot and is reclaimed
    db.deleteVectorized("t", col("id") === 10)
    db.vacuum(keepVersions = 1, minAgeMs = 0)
    val dvsNow = dvSnapshot(db).values.toSet
    assert(!dvsNow.contains(dv1))
    assert(!Files.exists(Paths.get(s"${db.root}/$dv1")),
      "an unreferenced DV sidecar must be reclaimed")
    assert(db.table("t").filter(col("id").isin(9, 10)).isEmpty)
  }

  test("conflicts: DV commutes with disjoint-file DML, conflicts on " +
      "the same file") {
    val db = freshDb()
    seed(db) // 4 range-clustered files: ids 1-100 / 101-200 / ...
    // commute: mask in file 1, concurrent update in file 4
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    @volatile var err: Throwable = null
    val a = new Thread(() => {
      barrier.await()
      try db.deleteVectorized("t", col("id") === 50)
      catch { case e: Throwable => err = e }
    })
    val b = new Thread(() => {
      barrier.await()
      try db.updateMany("t", col("id") === 350, Map("v" -> lit(1L)))
      catch { case e: Throwable => err = e }
    })
    a.start(); b.start(); a.join(); b.join()
    if (err != null) throw err
    assert(db.table("t").filter(col("id") === 50).isEmpty)
    assert(db.table("t").filter(col("id") === 350).select("v")
      .as[Long].head() == 1L)
    // conflict: a rewrite of the masked file must not resurrect the row
    // (the DML path reads masked state, so sequential is consistent)
    db.updateMany("t", col("id") === 51, Map("v" -> lit(2L)))
    assert(db.table("t").filter(col("id") === 50).isEmpty,
      "rewriting a masked file must materialize its mask, not drop it")
    assert(dvSnapshot(db).isEmpty ||
      !dvSnapshot(db).keys.exists(_ => false)) // mask moved into rewrite
  }

  test("constraints: RESTRICT blocks, CASCADE/SET-NULL refuse loudly") {
    val db = freshDb()
    db.defineTable(TableDef("p", "id"))
    db.insert("p", Seq((1, "a"), (2, "b")).toDF("id", "nm"))
    db.defineTable(TableDef("c", "cid",
      fks = Seq(Fk("pid", "p", "id", Restrict))))
    db.insert("c", Seq((10, 1)).toDF("cid", "pid"))
    val e = intercept[IllegalStateException](
      db.deleteVectorized("p", col("id") === 1))
    assert(e.getMessage.contains("RESTRICT"))
    // unreferenced parent row masks fine
    assert(db.deleteVectorized("p", col("id") === 2) == 1)
    // cascade children refuse
    val db2 = freshDb("dvdb2")
    db2.defineTable(TableDef("p", "id"))
    db2.insert("p", Seq((1, "a")).toDF("id", "nm"))
    db2.defineTable(TableDef("c", "cid",
      fks = Seq(Fk("pid", "p", "id", Cascade))))
    db2.insert("c", Seq((10, 1)).toDF("cid", "pid"))
    val e2 = intercept[UnsupportedOperationException](
      db2.deleteVectorized("p", col("id") === 1))
    assert(e2.getMessage.toLowerCase.contains("cascade"))
  }

  test("checkpoint round-trip: masks survive log replay from a " +
      "checkpoint (10+ commits)") {
    val base = Files.createTempDirectory("graft_dv_ckpt").toString
    val db = GraftDatabase(spark, "t1", base)
    seed(db)
    db.deleteVectorized("t", col("id") === 77)
    // push past a checkpoint boundary (every 10 commits)
    (1 to 12).foreach(i =>
      db.updateMany("t", col("id") === 300 + i, Map("v" -> lit(0L))))
    // a FRESH instance of the SAME root replays from the checkpoint
    val db2 = GraftDatabase(spark, "t1", base)
    assert(db2.table("t").filter(col("id") === 77).isEmpty,
      "the DV must survive checkpoint replay")
    assert(db2.table("t").count() == 399)
  }

  test("delete-then-reinsert: a stale mask never hides the new row " +
      "(file-granular subtraction at every write surface)") {
    val db = freshDb()
    seed(db)
    // insert(): the re-inserted PK lands in a NEW file the old DV must
    // not touch
    assert(db.deleteVectorized("t", col("id") === 5) == 1)
    assert(db.table("t").filter(col("id") === 5).isEmpty)
    db.insert("t", Seq((5, 555L, "re5")).toDF("id", "v", "s"))
    assert(db.table("t").filter(col("id") === 5).count() == 1,
      "re-inserted row must be visible (stale DV hid it)")
    assert(db.sql("SELECT v FROM t WHERE id = 5").head.getLong(0) == 555L)
    assert(db.findById("t", 5).isDefined)
    // a SECOND insert of the now-live PK is a duplicate again
    intercept[Exception] {
      db.insert("t", Seq((5, 0L, "dup")).toDF("id", "v", "s"))
    }
    // upsert(): same shape
    assert(db.deleteVectorized("t", col("id") === 6) == 1)
    db.upsert("t", Seq((6, 666L, "re6")).toDF("id", "v", "s"))
    assert(db.table("t").filter(col("id") === 6).count() == 1)
    // MERGE INSERT: same shape through SQL
    assert(db.deleteVectorized("t", col("id") === 7) == 1)
    db.defineTable(TableDef("src", "k"))
    db.insert("src", Seq((7, 777L)).toDF("k", "nv"))
    db.sql("MERGE INTO t USING src ON t.id = src.k " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.k, src.nv)")
    assert(db.table("t").filter(col("id") === 7).count() == 1)
    assert(db.table("t").filter(col("id") === 7).head.getLong(1) == 777L)
    // applyChanges insert: the CDC replication surface
    assert(db.deleteVectorized("t", col("id") === 8) == 1)
    assert(db.applyChanges("t",
      Seq((8, 888L, "re8", "insert")).toDF("id", "v", "s", "_change_type"),
      "dv-reinsert-app", 1L))
    assert(db.table("t").filter(col("id") === 8).count() == 1)
    // total content is exact: 400 seeded, 4 deleted, 4 re-inserted
    assert(db.table("t").count() == 400)
    // and the masks still hold for rows NOT re-inserted
    assert(db.deleteVectorized("t", col("id") === 9) == 1)
    assert(db.table("t").filter(col("id") === 9).isEmpty)
  }

  test("mass-mask reads: above DvPerFileJoinMax masked files the plan " +
      "collapses to ONE (file, PK) anti-join; results identical") {
    val db = freshDb()
    val files = TxLog.DvPerFileJoinMax + 8 // 24 masked files
    db.defineTable(TableDef("t", "id"))
    db.insert("t", (1 to files * 50)
      .map(i => (i, i * 10L)).toDF("id", "v")
      .repartitionByRange(files, col("id")))
    assert(db.liveFiles("t").size == files)
    // one DV per file: delete the first row of every 50-row range
    val doomed = (0 until files).map(_ * 50 + 1)
    assert(db.deleteVectorized("t", col("id").isin(doomed: _*)) == files)
    assert(dvSnapshot(db).size == files)
    val out = db.table("t")
    // plan shape (typed): one anti-join total, not one per masked file
    val antiJoins = graft.plans.PlanGates
      .joinsOfType(out, org.apache.spark.sql.catalyst.plans.LeftAnti).size
    assert(antiJoins == 1,
      s"expected the single-scan (file, PK) anti-join, saw $antiJoins")
    // results are exact under the collapsed plan
    assert(out.count() == files * 49L)
    assert(out.filter(col("id").isin(doomed: _*)).isEmpty)
    assert(out.filter(col("id").isin(doomed.map(_ + 1): _*)).count()
      == files.toLong)
    // and reinsert stays file-granular on this path too
    db.insert("t", Seq((1, 111L)).toDF("id", "v"))
    assert(db.table("t").filter(col("id") === 1).count() == 1)
  }

  test("RESTRICT check resolves unambiguously when the child carries a " +
      "column named like the parent key") {
    val db = freshDb()
    db.defineTable(TableDef("p", "id"))
    db.insert("p", Seq((1, "a"), (2, "b")).toDF("id", "name"))
    // the child ALSO has an 'id' (its own PK) — bare col("id") refs in
    // the restrict join would raise AMBIGUOUS_REFERENCE
    db.defineTable(TableDef("c", "id",
      fks = Seq(Fk("pid", "p", "id", Restrict))))
    db.insert("c", Seq((10, 1)).toDF("id", "pid"))
    assert(db.deleteVectorized("p", col("id") === 2) == 1,
      "unreferenced parent must DV-delete cleanly")
    intercept[IllegalStateException] {
      db.deleteVectorized("p", col("id") === 1)
    }
  }

  test("byte-weighted admission weighs DV versions by the masked data " +
      "file, so a delete-heavy backlog paces instead of collapsing " +
      "into one batch") {
    val db = freshDb("dvbudget")
    seed(db) // v1: 4 data files
    val v1 = db.logVersion
    // three DV-only versions (each masks one row in one file)
    Seq(5, 105, 205).foreach(i =>
      assert(db.deleteVectorized("t", col("id") === i) == 1))
    val head = db.logVersion
    assert(head == v1 + 3)
    // a 1-byte budget is below every masked file's size: the ≥1-version
    // floor must pace exactly one DV version per step (weight 0 would
    // admit the whole backlog — the bug this pins)
    assert(db.advanceByByteBudget(v1, head, 1L) == v1 + 1,
      "DV versions must carry a positive byte weight")
    // an unconstraining budget admits everything
    assert(db.advanceByByteBudget(v1, head, Long.MaxValue) == head)
    // and the combined walk agrees with the tightest single cap
    assert(db.advanceByBudgets(v1, head, Some(Long.MaxValue), Some(1L)) ==
      v1 + 1)
  }

  /** Live (table, file) -> dv map of db's 't'-family tables. */
  private def dvSnapshot(db: GraftDatabase): Map[(String, String), String] =
    db.txlogSnapshotForTest.dvs
}
