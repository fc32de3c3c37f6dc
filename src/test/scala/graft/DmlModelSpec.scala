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
}
