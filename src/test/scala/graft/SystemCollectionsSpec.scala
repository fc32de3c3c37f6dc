package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{GraftDatabase, SystemCollections}
import graft.dml.ConstrainedDml._

/** The reference's system-collection registry
  * (`LiteDB/Engine/SystemCollections/Register.cs:14-33`) on the facade:
  * catalog metadata ($database/$cols/$indexes/$sequences), the parquet
  * footer manifest standing in for the page dump ($dump/$page_list),
  * runtime views ($transactions/$snapshots/$open_cursors), and the
  * argument-taking collections ($query/$file).
  */
class SystemCollectionsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb(): GraftDatabase = {
    val base = Files.createTempDirectory("graft-sys").toString
    val db = GraftDatabase(spark, "sysdb", base)
      .defineTable(TableDef("customer", "id", uniqueCols = Seq("name")))
      .defineTable(TableDef("orders", "id",
        fks = Seq(Fk("customer_id", "customer", "id", Cascade))))
    db.insert("customer", Seq((1, "ann", 30), (2, "bob", 40))
      .toDF("id", "name", "age"))
    db.insert("orders", Seq((10, 1, 250.0), (11, 1, 50.0), (12, 2, 99.0))
      .toDF("id", "customer_id", "amount"))
    db
  }

  test("$cols lists user tables plus every registered system name") {
    val db = freshDb()
    val cols = db.system("$cols").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cols("customer") == "user" && cols("orders") == "user")
    SystemCollections.names.foreach(n => assert(cols(n) == "system", n))
  }

  test("$database is one row of facade metadata") {
    val db = freshDb()
    val row = db.system("$database").collect().head
    assert(row.getAs[String]("name") == "sysdb")
    assert(row.getAs[Long]("n_tables") == 2L)
  }

  test("$indexes reflects ensureIndex; $sequences is max(pk)+1") {
    val db = freshDb()
    db.ensureIndex("customer", "name", unique = true)
    val ix = db.system("$indexes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(ix.contains(("customer", "name", true)))

    val seqs = db.system("$sequences").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(seqs("customer") == 3L) // max(id)=2 -> next 3
    assert(seqs("orders") == 13L)
  }

  test("$sequences skips defined-but-never-written tables") {
    val db = freshDb().defineTable(TableDef("empty_t", "id"))
    val seqs = db.system("$sequences").collect().map(_.getString(0)).toSet
    assert(seqs == Set("customer", "orders"))
  }

  test("$dump and $page_list agree with each other and with COUNT(*)") {
    val db = freshDb()
    val dump = db.system("$dump")
    assert(dump.schema == SystemCollections.fileSchema)
    val byTable = dump.groupBy("tbl").sum("num_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable("customer") == db.count("customer"))
    assert(byTable("orders") == db.count("orders"))

    // row-group rows roll up to the file rows
    val pages = db.system("$page_list")
    assert(pages.schema == SystemCollections.rowGroupSchema)
    val pageTotals = pages.groupBy("tbl").sum("num_rows").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pageTotals == byTable)
    // byte sizes are positive (a real footer was read, not a stub)
    assert(pages.collect().forall(r => r.getLong(4) > 0 && r.getLong(5) > 0))
  }

  test("tableStats over the shared testdata matches loaded counts") {
    val dir = "/root/testdata/sf0.001"
    val stats = SystemCollections.tableStats(spark,
      Seq("nation" -> s"$dir/nation.parquet",
        "documents" -> s"$dir/documents.parquet")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("nation") ==
      graft.core.Tables.load(spark, dir, "nation").count())
    assert(stats("documents") ==
      graft.core.Tables.load(spark, dir, "documents").count())
  }

  test("$query evaluates through the SQL engine; $file reads csv") {
    val db = freshDb()
    val n = db.system("$query",
      Map("sql" -> "SELECT COUNT(*) AS n FROM orders WHERE amount > 60"))
      .collect().head.getLong(0)
    assert(n == 2L)

    val tmp = Files.createTempDirectory("graft-sysfile").toString + "/c"
    graft.sources.FileSources.writeCsv(db.table("customer"), tmp)
    val back = db.system("$file", Map("path" -> tmp, "format" -> "csv"))
    assert(back.count() == 2L)
  }

  test("runtime collections return their schemas; unknown name throws") {
    val db = freshDb()
    assert(db.system("$transactions").columns.toSeq ==
      Seq("job_id", "n_stages", "status"))
    assert(db.system("$snapshots").columns.toSeq ==
      Seq("rdd_id", "name", "storage_level"))
    assert(db.system("$open_cursors").columns.toSeq ==
      Seq("cursor_id", "name", "active"))
    intercept[IllegalArgumentException](db.system("$nope"))
    intercept[IllegalArgumentException](db.system("$query")) // missing sql
  }
}
