package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef
import graft.streaming.{ChangeFeedReplicator, ContinuousQueryService}

/** Streaming change-feed source: a replica is ONE polling stream
  * (changesSince → applyChanges) whose cursor is the destination's Txn
  * ledger — persisted atomically with each batch, restart-safe, loud on
  * vacuum-truncated history.
  */
class ChangeFeedReplicatorSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def pair(tag: String): (GraftDatabase, GraftDatabase, String, String) = {
    val bp = Files.createTempDirectory(s"graft_cfr_${tag}_p").toString
    val br = Files.createTempDirectory(s"graft_cfr_${tag}_r").toString
    val p = GraftDatabase(spark, "p", bp).defineTable(TableDef("t", "id"))
    val r = GraftDatabase(spark, "r", br).defineTable(TableDef("t", "id"))
    (p, r, bp, br)
  }

  private def converged(p: GraftDatabase, r: GraftDatabase): Boolean =
    r.tableExists("t") &&
      r.table("t").exceptAll(p.table("t"))
        .unionAll(p.table("t").exceptAll(r.table("t"))).isEmpty

  test("streamed replica == batch replica, exactly, across mixed DML") {
    val (p, r, _, br2) = pair("eq")
    val rep = new ChangeFeedReplicator(p, "t", r, "t", "cdc-eq")
    // batch twin applying the SAME feeds the long way (the q146 flow)
    val r2 = GraftDatabase(spark, "r2", br2 + "_b")
      .defineTable(TableDef("t", "id"))
    var c2 = 0L
    var b2 = 0L
    def batchStep(): Unit = {
      val (feed, head) = p.changesSince("t", c2)
      if (head > c2 && !feed.isEmpty) {
        b2 += 1; r2.applyChanges("t", feed, "cdc-eq-b", b2); c2 = head
      }
    }
    p.insert("t", (1 to 300).map(i => (i, i * 10L)).toDF("id", "v"))
    rep.replicateOnce(); batchStep()
    p.updateMany("t", col("id") % 7 === 0, Map("v" -> (col("v") + 1)))
    p.delete("t", col("id") % 11 === 0)
    rep.replicateOnce(); batchStep()
    p.insert("t", (301 to 350).map(i => (i, i * 10L)).toDF("id", "v"))
    p.deleteVectorized("t", col("id") === 5) // DV deletes flow through too
    rep.replicateOnce(); batchStep()
    assert(converged(p, r), "streamed replica must equal the primary")
    assert(r.table("t").exceptAll(r2.table("t"))
      .unionAll(r2.table("t").exceptAll(r.table("t"))).isEmpty,
      "streamed and batch replicas must be identical")
    assert(rep.cursor() == p.logVersion)
  }

  test("cursor persists across restart in the ledger; no re-apply") {
    val (p, r, bp, br) = pair("restart")
    p.insert("t", (1 to 100).map(i => (i, i.toLong)).toDF("id", "v"))
    new ChangeFeedReplicator(p, "t", r, "t", "cdc-rs").replicateOnce()
    val vReplica = r.logVersion
    val cur = r.appliedBatch("cdc-rs")
    assert(cur.contains(p.logVersion))
    // "restart": fresh database handles AND a fresh replicator — the
    // only state is the destination's ledger
    val p2 = GraftDatabase(spark, "p", bp)
    val r2 = GraftDatabase(spark, "r", br)
    val rep2 = new ChangeFeedReplicator(p2, "t", r2, "t", "cdc-rs")
    assert(rep2.cursor() == cur.get, "cursor must come back from the ledger")
    assert(rep2.replicateOnce() == cur.get)
    assert(r2.logVersion == vReplica,
      "an unchanged source after restart must commit NOTHING")
    // new primary data resumes from the cursor
    p2.insert("t", Seq((101, 101L)).toDF("id", "v"))
    rep2.replicateOnce()
    assert(converged(p2, r2))
  }

  test("a vacuum-truncated cursor fails loudly (re-bootstrap, not a " +
      "silent full-table re-feed)") {
    val (p, r, _, _) = pair("vac")
    p.insert("t", (1 to 50).map(i => (i, i.toLong)).toDF("id", "v"))
    val rep = new ChangeFeedReplicator(p, "t", r, "t", "cdc-vac")
    rep.replicateOnce()
    assert(rep.cursor() <= 3)
    // move the primary far past a checkpoint, then truncate history
    (1 to 12).foreach(i =>
      p.updateMany("t", col("id") === i, Map("v" -> lit(0L))))
    p.vacuum(keepVersions = 1, minAgeMs = 0)
    val e = intercept[IllegalStateException](rep.replicateOnce())
    assert(e.getMessage.contains("truncated"))
  }

  test("timer-driven: start() on the shared scheduler converges and " +
      "stops cleanly") {
    val (p, r, _, _) = pair("timer")
    val svc = new ContinuousQueryService(spark)
    val rep = new ChangeFeedReplicator(p, "t", r, "t", "cdc-timer")
    val name = rep.start(svc, intervalMillis = 100)
    try {
      p.insert("t", (1 to 120).map(i => (i, i.toLong)).toDF("id", "v"))
      p.delete("t", col("id") % 5 === 0)
      val deadline = System.currentTimeMillis() + 30000
      while (!converged(p, r) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(converged(p, r), "timer-driven replica must converge")
      assert(rep.appliedBatches >= 1)
    } finally { svc.unregister(name); svc.shutdown() }
  }
}
