package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, sum}
import org.apache.spark.sql.types._

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.{Fk, TableDef}

/** Metadata-only column DDL over the commit log: RENAME COLUMN (a
  * logical→physical mapping in the schema pin — zero data movement,
  * old and new files byte-identical), DROP COLUMN (a tombstone that
  * also prevents a later re-add from resurrecting old file data), and
  * lossless type WIDENING (the parquet reader upcasts narrow physical
  * data under the wide pin). The reference rebuilds collections for
  * any shape change; immutable files + versioned schema pins make all
  * three one metadata commit.
  */
class ColumnDdlSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(pk: String = "id"): GraftDatabase = {
    val base = Files.createTempDirectory("graft-colddl").toString
    GraftDatabase(spark, "coldl", base).defineTable(TableDef("t", pk))
  }

  private def rows(n: Int) =
    (1 to n).map(i => (i, i * 10L, s"r$i")).toDF("id", "v", "name")

  // ---- rename ---------------------------------------------------------------

  test("renameColumn is metadata-only: same files, data under the new " +
      "name, writes in both eras read back together") {
    val db = freshDb()
    db.insert("t", rows(100).repartitionByRange(2, col("id")))
    val filesBefore = db.liveFiles("t")
    db.renameColumn("t", "v", "val2")
    assert(db.liveFiles("t") == filesBefore, "rename must move no data")
    assert(db.table("t").columns.toSeq == Seq("id", "val2", "name"))
    assert(db.table("t").agg(sum(col("val2"))).head.getLong(0) ==
      (1 to 100).map(_ * 10L).sum)
    // post-rename writes: an insert carrying the NEW name and a
    // targeted update both land; old and new files read back as one
    db.insert("t", Seq((101, 1010L, "r101")).toDF("id", "val2", "name"))
    db.updateMany("t", col("id") === 1, Map("val2" -> lit(0L)))
    assert(db.table("t").count() == 101)
    assert(db.table("t").filter(col("id") === 1)
      .select("val2").as[Long].head() == 0L)
    // the SQL surface sees the new name
    assert(db.sql("SELECT SUM(val2) AS s FROM t").head.getLong(0) ==
      (2 to 100).map(_ * 10L).sum + 1010L)
  }

  test("rename keeps file-stats pruning working under the new name") {
    val db = freshDb()
    db.insert("t", rows(100).repartitionByRange(4, col("id")))
    db.renameColumn("t", "id", "key")
    // stats were harvested under the physical name; seek by the NEW
    // logical name still prunes to the one covering file
    val hit = db.seek("t", "key", 1, 10)
    assert(hit.inputFiles.length == 1,
      s"seek must prune via the mapping, scanned ${hit.inputFiles.length}")
    assert(hit.count() == 10)
  }

  test("rename with live deletion vectors: masks keep masking, and " +
      "post-rename DV deletes land") {
    val db = freshDb()
    db.insert("t", rows(20))
    db.deleteVectorized("t", col("id") <= 3)
    db.renameColumn("t", "id", "key")
    assert(db.table("t").count() == 17,
      "pre-rename DV masks must keep masking through the mapping")
    db.deleteVectorized("t", col("key") === 10)
    assert(db.table("t").count() == 16)
    assert(db.table("t").filter(col("key") <= 3).count() == 0)
  }

  test("rename follows time travel and restore") {
    val db = freshDb()
    db.insert("t", rows(10))
    val v1 = db.logVersion
    db.renameColumn("t", "v", "val2")
    assert(db.tableAt("t", v1).get.columns.contains("v"),
      "a snapshot below the rename reads the OLD name")
    db.restore("t", v1)
    assert(db.table("t").columns.toSeq == Seq("id", "v", "name"))
    assert(db.table("t").agg(sum(col("v"))).head.getLong(0) ==
      (1 to 10).map(_ * 10L).sum)
  }

  test("rename re-keys constraints, the index registry, and the " +
      "clustering spec") {
    val base = Files.createTempDirectory("graft-coldl2").toString
    val db = GraftDatabase(spark, "coldl2", base)
      .defineTable(TableDef("p", "id"))
      .defineTable(TableDef("c", "id",
        fks = Seq(Fk("pid", "p", "id"))))
    db.insert("p", rows(5))
    db.insert("c", Seq((1, 1), (2, 2)).toDF("id", "pid"))
    db.ensureIndex("p", "v", unique = false) // range-clusters + registers
    db.renameColumn("p", "v", "val2")
    assert(db.indexes("p").map(_._1) == Seq("val2"),
      "index registry must re-key the renamed column")
    assert(db.clusterSpec("p").exists(_._2 == Seq("val2")),
      "clustering spec must re-key the renamed column")
    // FK retarget across tables: rename the PARENT key and verify the
    // constraint still enforces under the new name
    db.renameColumn("p", "id", "pkey")
    intercept[Exception] {
      db.insert("c", Seq((3, 99)).toDF("id", "pid")) // no parent 99
    }
    db.insert("c", Seq((3, 3)).toDF("id", "pid")) // parent 3 exists
    // PK rename on the child: uniqueness still enforced
    db.renameColumn("c", "id", "cid")
    intercept[Exception] {
      db.insert("c", Seq((3, 1)).toDF("cid", "pid")) // duplicate PK
    }
  }

  // ---- drop -----------------------------------------------------------------

  test("dropColumn hides the column; a re-added namesake does NOT " +
      "resurrect old data; restore brings the original back") {
    val db = freshDb()
    db.insert("t", rows(10))
    val v1 = db.logVersion
    db.dropColumn("t", "v")
    assert(db.table("t").columns.toSeq == Seq("id", "name"))
    assert(db.table("t").count() == 10)
    // re-add the same NAME: the old files still hold 'v' bytes, but the
    // fresh physical mapping must keep them invisible
    db.addColumn("t", "v", LongType)
    assert(db.table("t").filter(col("v").isNotNull).count() == 0,
      "re-added column must be all-null, not resurrected")
    db.insert("t", Seq((11, 5L, "r11")).toDF("id", "v", "name"))
    assert(db.table("t").filter(col("v").isNotNull).count() == 1)
    // the pre-drop world is still one restore away
    db.restore("t", v1)
    assert(db.table("t").agg(sum(col("v"))).head.getLong(0) ==
      (1 to 10).map(_ * 10L).sum)
  }

  test("a widening WRITE of a dropped/renamed namesake refuses loudly " +
      "instead of resurrecting (ADD COLUMN first mints the fresh name)") {
    val db = freshDb()
    db.insert("t", rows(5))
    db.dropColumn("t", "v")
    // the implicit pin-extension path (a write carrying the namesake
    // directly) must NOT silently map onto the claimed physical name
    val ex = intercept[IllegalStateException] {
      db.insert("t", Seq((6, 60L, "r6")).toDF("id", "v", "name"))
    }
    assert(ex.getMessage.contains("previously dropped or renamed"))
    assert(db.table("t").count() == 5, "the refused write must not commit")
    // the sanctioned path: ADD COLUMN (fresh physical), THEN write
    db.addColumn("t", "v", LongType)
    db.insert("t", Seq((6, 60L, "r6")).toDF("id", "v", "name"))
    assert(db.table("t").filter(col("v").isNotNull).count() == 1)
    // reserved names refuse everywhere
    intercept[IllegalArgumentException](
      db.renameColumn("t", "name", "__graft_dropped_1_name"))
    intercept[IllegalArgumentException](
      db.addColumn("t", "__graft_dropped_2_x", LongType))
  }

  test("dropColumn guards: primary key, FK-referenced columns, last column") {
    val base = Files.createTempDirectory("graft-coldl3").toString
    val db = GraftDatabase(spark, "coldl3", base)
      .defineTable(TableDef("p", "id"))
      .defineTable(TableDef("c", "id", fks = Seq(Fk("pid", "p", "id"))))
    db.insert("p", rows(3))
    db.insert("c", Seq((1, 1)).toDF("id", "pid"))
    intercept[IllegalArgumentException](db.dropColumn("p", "id"))
    intercept[IllegalArgumentException](db.dropColumn("c", "pid"))
    // a column another table's FK references
    intercept[IllegalArgumentException](db.dropColumn("p", "id"))
    db.dropColumn("p", "v"); db.dropColumn("p", "name")
    intercept[IllegalArgumentException](db.dropColumn("p", "id"))
  }

  test("a full rewrite clears drop tombstones but preserves rename " +
      "mappings (staged files carry physical names)") {
    val db = freshDb()
    db.insert("t", rows(50))
    db.renameColumn("t", "v", "val2")
    db.dropColumn("t", "name")
    // ensureIndex re-clusters the WHOLE table — a full replace
    db.ensureIndex("t", "val2", unique = false)
    assert(db.table("t").columns.toSeq == Seq("id", "val2"))
    assert(db.table("t").agg(sum(col("val2"))).head.getLong(0) ==
      (1 to 50).map(_ * 10L).sum,
      "renamed column data must survive the rewrite (mapping preserved)")
    // and more writes after the rewrite still line up
    db.insert("t", Seq((51, 510L)).toDF("id", "val2"))
    assert(db.table("t").count() == 51)
  }

  // ---- widen ----------------------------------------------------------------

  test("widenColumn is metadata-only: narrow files upcast at scan; " +
      "appends of either width land; lossy widenings refuse") {
    val base = Files.createTempDirectory("graft-coldl4").toString
    val db = GraftDatabase(spark, "coldl4", base).defineTable(TableDef("t", "id"))
    db.insert("t", Seq((1, 7), (2, 9)).toDF("id", "x"))
    val filesBefore = db.liveFiles("t")
    db.widenColumn("t", "x", LongType)
    assert(db.liveFiles("t") == filesBefore, "widening must move no data")
    assert(db.table("t").schema("x").dataType == LongType)
    assert(db.table("t").agg(sum(col("x"))).head.getLong(0) == 16L)
    // a NARROW append still stages (reader upcasts it under the pin)…
    db.insert("t", Seq((3, 5)).toDF("id", "x"))
    // …and a WIDE append stages natively
    db.insert("t", Seq((4, 3L)).toDF("id", "x"))
    assert(db.table("t").agg(sum(col("x"))).head.getLong(0) == 24L)
    // lossy: long → double is not readable-losslessly; refuse
    intercept[IllegalArgumentException](db.widenColumn("t", "x", DoubleType))
    // non-widening type change still rejected at write time
    intercept[IllegalStateException](
      db.insert("t", Seq((5, "s")).toDF("id", "x")))
  }

  test("the widening matrix arms read back exactly") {
    val base = Files.createTempDirectory("graft-coldl5").toString
    val db = GraftDatabase(spark, "coldl5", base).defineTable(TableDef("t", "id"))
    db.insert("t", Seq((1,
      1.toByte, 2.toShort, 3, 1.5f,
      new java.math.BigDecimal("12.34"),
      7, java.sql.Date.valueOf("2024-01-02")))
      .toDF("id", "b", "s", "i", "f", "d", "i2", "dt")
      .withColumn("d", col("d").cast(DecimalType(5, 2))))
    db.widenColumn("t", "b", IntegerType)
    db.widenColumn("t", "s", LongType)
    db.widenColumn("t", "i", DoubleType)
    db.widenColumn("t", "f", DoubleType)
    db.widenColumn("t", "d", DecimalType(12, 4))
    db.widenColumn("t", "i2", DecimalType(14, 2))
    db.widenColumn("t", "dt", TimestampNTZType)
    val r = db.table("t").head
    assert(r.getInt(1) == 1 && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 1.5)
    assert(r.getDecimal(5).toPlainString == "12.3400")
    assert(r.getDecimal(6).toPlainString == "7.00")
    assert(r.getAs[java.time.LocalDateTime](7).toLocalDate.toString ==
      "2024-01-02")
  }

  // ---- SQL surface ----------------------------------------------------------

  test("SQL ALTER COLLECTION dispatches all four column DDL forms") {
    val db = freshDb()
    db.insert("t", rows(5))
    db.sql("ALTER COLLECTION t RENAME COLUMN v TO w")
    assert(db.table("t").columns.contains("w"))
    db.sql("ALTER COLLECTION t ALTER COLUMN w TYPE decimal(22,0)")
    assert(db.table("t").schema("w").dataType == DecimalType(22, 0))
    db.sql("ALTER COLLECTION t DROP COLUMN name")
    assert(db.table("t").columns.toSeq == Seq("id", "w"))
    db.sql("ALTER COLLECTION t ADD COLUMN name string")
    assert(db.table("t").filter(col("name").isNotNull).count() == 0)
    intercept[IllegalArgumentException](
      db.sql("ALTER COLLECTION t FROBNICATE COLUMN w"))
  }
}
