package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit}

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** Model-based check of the WHOLE DML stack — constraint validation,
  * file-granular copy-on-write staging, relative patch commits, log
  * replay, compaction — against an independent in-memory model: a
  * seeded random op sequence must leave the table exactly equal to a
  * plain Map fold, across fresh facades (pure log replay) and
  * checkpoint compactions (file-layout churn under the same contents).
  */
class DmlModelSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def rows(m: Map[Long, Long]) =
    m.toSeq.map { case (k, v) => (k, v) }.toDF("id", "v")

  test("60 random insert/upsert/update/updateMany/delete ops match an " +
      "in-memory model across reopens and compactions") {
    val base = Files.createTempDirectory("graft-dmlmodel").toString
    var db = GraftDatabase(spark, "model", base)
      .defineTable(TableDef("t", "id"))
    val rnd = new scala.util.Random(7)
    var model = Map.empty[Long, Long]
    var nextId = 0L

    def freshIds(k: Int): Seq[Long] = (1 to k).map { _ =>
      nextId += 1; nextId
    }
    def check(step: Int): Unit = {
      val actual =
        if (db.tableExists("t"))
          db.table("t").as[(Long, Long)].collect().toMap
        else Map.empty[Long, Long]
      assert(actual == model, s"diverged at step $step: " +
        s"missing=${(model.keySet -- actual.keySet).take(5)} " +
        s"extra=${(actual.keySet -- model.keySet).take(5)} " +
        s"wrong=${model.collect { case (k, v) if actual.get(k).exists(_ != v) =>
          (k, v, actual(k)) }.take(5)}")
    }

    (1 to 60).foreach { step =>
      rnd.nextInt(7) match {
        case 0 | 1 => // insert a small batch of brand-new ids
          val batch = freshIds(1 + rnd.nextInt(3))
            .map(id => id -> rnd.nextLong(100)).toMap
          db.insert("t", rows(batch).coalesce(1))
          model ++= batch
        case 2 => // upsert: mix of replaced and new keys
          val existing = rnd.shuffle(model.keySet.toSeq).take(rnd.nextInt(3))
          val batch = (existing ++ freshIds(rnd.nextInt(2)))
            .map(id => id -> rnd.nextLong(100)).toMap
          if (batch.nonEmpty) {
            db.upsert("t", rows(batch).coalesce(1))
            model ++= batch
          }
        case 3 => // predicated transform update
          val (k, r) = (2 + rnd.nextInt(4), rnd.nextInt(4))
          db.updateMany("t", col("id") % k === r,
            Map("v" -> (col("v") + 7)))
          model = model.map { case (id, v) =>
            id -> (if (id % k == r) v + 7 else v)
          }
        case 4 => // predicated delete
          val (k, r) = (3 + rnd.nextInt(4), rnd.nextInt(4))
          db.delete("t", col("v") % k === r)
          model = model.filterNot { case (_, v) => v % k == r }
        case 5 => // PK-matched replace (update ignores unknown ids)
          val ids = rnd.shuffle(model.keySet.toSeq).take(rnd.nextInt(3)) ++
            Seq(999999L) // unknown id: must be ignored
          val batch = ids.map(id => id -> rnd.nextLong(100)).toMap
          db.update("t", rows(batch).coalesce(1))
          model = model.map { case (id, v) =>
            id -> batch.getOrElse(id, v)
          }
        case 6 => // SQL UPDATE through the dialect (granular persist)
          val r = rnd.nextInt(3)
          db.sql(s"UPDATE t SET $$.v = $$.v + 1 WHERE $$.id % 3 = $r")
          model = model.map { case (id, v) =>
            id -> (if (id % 3 == r) v + 1 else v)
          }
      }
      if (step % 12 == 0) {
        check(step)
        // churn the file layout without changing contents
        db.setPragma("CHECKPOINT", 1)
        db.checkpoint()
        check(step)
      }
      if (step % 25 == 0) {
        // a FRESH facade replays the log (incl. patches) from disk
        db = GraftDatabase(spark, "model", base)
          .defineTable(TableDef("t", "id"))
        check(step)
      }
    }
    check(60)
    assert(model.nonEmpty, "fixture must end non-trivial")
    // note: most of this mix commits ABSOLUTE actions (small tables,
    // spread predicates → all-files-hit short-circuit); the patch
    // commute/conflict semantics are pinned by the dedicated TxLogSpec
    // cases, and the model check's reopen steps replay whatever mix of
    // action kinds the run produced
  }

  test("two concurrent writers, 200 random ops on disjoint key spaces: " +
      "the final state equals the union of both writers' models") {
    // The isolation contract under test: ABSOLUTE commits are
    // serializable (any interleaved touch of the table conflicts) and
    // PATCH commits are write-serializable (disjoint-file patches
    // commute; same-file patches conflict). Each writer's ops touch
    // only its own key parity, and every op is retried until it
    // commits, so no landed effect may be lost — the final table must
    // equal the union of two independent single-writer folds. A lost
    // update (overwrite without conflict) or a torn commit shows up as
    // a divergence from the union; a missed invalidation shows up as a
    // retry applying against stale state.
    val base = Files.createTempDirectory("graft-dmlmodel2").toString
    GraftDatabase(spark, "model2", base).defineTable(TableDef("t", "id"))

    final class Writer(parity: Long, seed: Int) extends Thread {
      val db: GraftDatabase = GraftDatabase(spark, "model2", base)
        .defineTable(TableDef("t", "id"))
      private val rnd = new scala.util.Random(seed)
      var model = Map.empty[Long, Long]
      private var nextId = parity // parity-preserving id generator
      @volatile var failure: Option[Throwable] = None

      private def freshIds(k: Int): Seq[Long] = (1 to k).map { _ =>
        nextId += 2; nextId
      }
      private def retry[T](op: => T): T = {
        var i = 0
        while (i < 120) {
          try return op
          catch {
            case _: java.util.ConcurrentModificationException =>
              i += 1
              Thread.sleep(5L + rnd.nextInt(20))
          }
        }
        throw new IllegalStateException(s"writer $parity: retry cap hit")
      }

      override def run(): Unit = try {
        (1 to 100).foreach { _ =>
          rnd.nextInt(6) match {
            case 0 | 1 => // insert fresh own-parity ids
              val batch = freshIds(1 + rnd.nextInt(2))
                .map(id => id -> rnd.nextLong(100)).toMap
              retry(db.insert("t", rows(batch).coalesce(1)))
              model ++= batch
            case 2 => // upsert: replaced own keys + fresh own keys
              val existing = rnd.shuffle(model.keySet.toSeq)
                .take(rnd.nextInt(2))
              val batch = (existing ++ freshIds(rnd.nextInt(2)))
                .map(id => id -> rnd.nextLong(100)).toMap
              if (batch.nonEmpty) {
                retry(db.upsert("t", rows(batch).coalesce(1)))
                model ++= batch
              }
            case 3 => // predicated transform on OWN parity (patch-safe)
              val (k, r) = (2 + rnd.nextInt(3), rnd.nextInt(3))
              retry(db.updateMany("t",
                col("id") % 2 === parity && col("v") % k === r,
                Map("v" -> (col("v") + 7))))
              model = model.map { case (id, v) =>
                id -> (if (v % k == r) v + 7 else v)
              }
            case 4 => // predicated delete on OWN parity
              val (k, r) = (3 + rnd.nextInt(3), rnd.nextInt(3))
              retry(db.delete("t",
                col("id") % 2 === parity && col("v") % k === r))
              model = model.filterNot { case (_, v) => v % k == r }
            case 5 => // SQL UPDATE through the dialect on OWN parity
              val r = rnd.nextInt(3)
              retry(db.sql("UPDATE t SET $.v = $.v + 1 WHERE " +
                s"$$.id % 2 = $parity AND $$.v % 3 = $r"))
              model = model.map { case (id, v) =>
                id -> (if (v % 3 == r) v + 1 else v)
              }
          }
        }
      } catch { case t: Throwable => failure = Some(t) }
    }

    val a = new Writer(parity = 0L, seed = 11)
    val b = new Writer(parity = 1L, seed = 23)
    a.start(); b.start()
    a.join(); b.join()
    a.failure.foreach(t => fail(s"writer A died: $t", t))
    b.failure.foreach(t => fail(s"writer B died: $t", t))

    val expected = a.model ++ b.model // disjoint key spaces
    assert(a.model.nonEmpty && b.model.nonEmpty,
      "both writers must end non-trivial")
    val actual = a.db.table("t").as[(Long, Long)].collect().toMap
    assert(actual == expected, s"diverged: " +
      s"missing=${(expected.keySet -- actual.keySet).take(5)} " +
      s"extra=${(actual.keySet -- expected.keySet).take(5)} " +
      s"wrong=${expected.collect { case (k, v) if actual.get(k).exists(_ != v) =>
        (k, v, actual(k)) }.take(5)}")
    // a FRESH facade replaying the interleaved log from disk agrees
    val replay = GraftDatabase(spark, "model2", base)
      .defineTable(TableDef("t", "id"))
    assert(replay.table("t").as[(Long, Long)].collect().toMap == expected)
  }
}
