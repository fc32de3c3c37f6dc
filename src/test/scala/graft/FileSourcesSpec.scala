package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FileSources
import graft.sources.FileSources.CsvOptions

class FileSourcesSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("csv round-trip honors delimiter and header options") {
    val tmp = Files.createTempDirectory("graft-csv-opts").toString
    val df = Seq((1, "a|b", 2.5), (2, "plain", -1.0)).toDF("id", "s", "v")
    val opts = CsvOptions(header = true, delimiter = ";")
    FileSources.writeCsv(df, tmp, opts)
    val back = FileSources.readCsv(spark, tmp, opts, Some(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // the payload containing '|' survives because ';' delimits
    assert(back.filter($"s" === "a|b").count() == 1)
  }

  test("csv without header reads positionally with explicit schema") {
    val tmp = Files.createTempDirectory("graft-csv-nohdr").toString
    val df = Seq((7, "x")).toDF("id", "s")
    val opts = CsvOptions(header = false)
    FileSources.writeCsv(df, tmp, opts)
    val back = FileSources.readCsv(spark, tmp, opts, Some(df.schema))
    assert(back.collect().toSeq == df.collect().toSeq)
  }

  test("orc round-trip preserves values, nulls, and timestamps; filters " +
    "push into the OrcScan") {
    val tmp = Files.createTempDirectory("graft-orc").toString
    val df = Seq(
      (1L, Some("a"), Some(2.5), Some(java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))),
      (2L, None, None, None),
      (3L, Some("c"), Some(-0.0), Some(java.sql.Timestamp.valueOf("1999-12-31 23:59:59"))))
      .toDF("id", "s", "v", "ts")
    FileSources.writeOrc(df, tmp)
    val back = FileSources.readOrc(spark, tmp, Some(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
    // typed gate (PlanGates): the filter must reach the V2 OrcScan's
    // own pushedFilters, not merely print somewhere in the plan string
    val pushed = graft.plans.PlanGates
      .v2PushedFilters(back.filter($"id" > 1L), "orc")
    assert(pushed.exists(_.contains("id")),
      s"expected the id filter pushed into the OrcScan, got $pushed")
  }

  test("json round-trip preserves nested-free schema and values") {
    val tmp = Files.createTempDirectory("graft-json2").toString
    val df = Seq((1L, Some(2.5)), (2L, None)).toDF("id", "v")
    FileSources.writeJson(df, tmp)
    val back = FileSources.readJson(spark, tmp, Some(df.schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
