package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.{GraftDatabase, Pragmas}
import graft.dml.ConstrainedDml._

/** The reference's engine pragmas (`EnginePragmas.cs:70-160`) on the
  * facade: defaults, persistence across reopen, the reference's
  * validations, enforced LIMIT_SIZE, and CHECKPOINT-driven compaction.
  */
class PragmasSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(): (GraftDatabase, String) = {
    val base = Files.createTempDirectory("graft-pragma").toString
    val db = GraftDatabase(spark, "pdb", base)
      .defineTable(TableDef("t", "id"))
    (db, base)
  }

  test("defaults match the reference's shape; values persist across reopen") {
    val (db, base) = freshDb()
    assert(db.pragma("USER_VERSION") == 0)
    assert(db.pragma("TIMEOUT") == 60)
    assert(db.pragma("LIMIT_SIZE") == Long.MaxValue)
    assert(db.pragma("UTC_DATE") == true)
    assert(db.pragma("CHECKPOINT") == 1000)
    assert(db.pragma("collation") == "Binary") // case-insensitive names

    db.setPragma("USER_VERSION", 7)
    db.setPragma("TIMEOUT", 120)
    val reopened = GraftDatabase(spark, "pdb", base)
    assert(reopened.pragma("USER_VERSION") == 7)
    assert(reopened.pragma("TIMEOUT") == 120)
  }

  test("validations mirror the reference; UTC pin is loud") {
    val (db, _) = freshDb()
    intercept[IllegalStateException](db.setPragma("COLLATION", "x"))
    intercept[IllegalArgumentException](db.setPragma("TIMEOUT", 0))
    intercept[IllegalArgumentException](db.setPragma("CHECKPOINT", -1))
    intercept[IllegalArgumentException](db.setPragma("LIMIT_SIZE", 1024))
    intercept[IllegalArgumentException](db.setPragma("UTC_DATE", false))
    intercept[IllegalArgumentException](db.pragma("NOPE"))
    db.setPragma("UTC_DATE", true) // accepted no-op
  }

  test("LIMIT_SIZE blocks writes once the store exceeds it") {
    val (db, _) = freshDb()
    // incompressible values (repeated chars would RLE away to nothing) so
    // the store comfortably exceeds the 4-page floor
    def blob(i: Int): String =
      (1 to 400).map(j => (i * 2654435761L + j * 40503L).toHexString)
        .mkString
    db.insert("t", (1 to 40).map(i => (i, blob(i))).toDF("id", "v"))
    // LIMIT_SIZE accounts LIVE bytes (the snapshot's data files), not the
    // raw directory walk — retired versions awaiting vacuum must never
    // count, or deletes would inflate the accounted size
    val size = db.liveFiles("t")
      .map(f => Files.size(java.nio.file.Paths.get(f))).sum
    assert(size > Pragmas.MinLimitSize)
    // a limit below the current live size is itself rejected (reference rule)
    intercept[IllegalArgumentException](db.setPragma("LIMIT_SIZE", size - 1))
    db.setPragma("LIMIT_SIZE", size + 512)
    // this write is allowed (store still under the limit) but grows the
    // store past it — the NEXT write must fail loudly
    db.insert("t", (41 to 80).map(i => (i, blob(i))).toDF("id", "v"))
    intercept[IllegalStateException](
      db.insert("t", Seq((99, "z")).toDF("id", "v")))
  }

  test("checkpoint() compacts tables over the CHECKPOINT file count") {
    val (db, _) = freshDb()
    db.insert("t", spark.range(1000).select($"id".cast("int").as("id"),
      concat(lit("v"), $"id").as("v")).repartition(16))
    db.setPragma("CHECKPOINT", 4)
    val before = db.table("t").inputFiles.length
    assert(before > 4)
    assert(db.checkpoint() == Seq("t"))
    assert(db.table("t").inputFiles.length < before)
    assert(db.count("t") == 1000)
    // below threshold: nothing to do; 0 disables entirely
    assert(db.checkpoint().isEmpty)
    db.setPragma("CHECKPOINT", 0)
    assert(db.checkpoint().isEmpty)
  }

  test("$database exposes the pragma row") {
    val (db, _) = freshDb()
    db.setPragma("USER_VERSION", 3)
    val row = db.system("$database").collect().head
    assert(row.getAs[Int]("user_version") == 3)
    assert(row.getAs[Boolean]("utc_date"))
    assert(row.getAs[Int]("checkpoint") == 1000)
  }
}
