package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.FsUtils

/** The crash-safe directory exchange behind REBUILD's store rewrites
  * and the file store's metadata swap: at every instant the data is on
  * disk under the live name or `<live>.retire`, and `recoverSwap`
  * completes whatever a crash interrupted.
  */
class FsUtilsSpec extends AnyFunSuite {

  private def dirWith(content: String): java.nio.file.Path = {
    val d = Files.createTempDirectory("fsutils")
    Files.write(d.resolve("data.txt"), content.getBytes("UTF-8"))
    d
  }
  private def readData(d: java.nio.file.Path): String =
    new String(Files.readAllBytes(d.resolve("data.txt")), "UTF-8")

  test("swapDirectory replaces live with fresh and drops the old copy") {
    val live = dirWith("old")
    val fresh = dirWith("new")
    FsUtils.swapDirectory(fresh, live)
    assert(readData(live) == "new")
    assert(!Files.exists(fresh))
    assert(!Files.exists(live.resolveSibling(live.getFileName + ".retire")))
  }

  test("crash between the two moves (live gone, data in .retire) " +
      "recovers to the ORIGINAL state") {
    val live = dirWith("old")
    val retire = live.resolveSibling(live.getFileName + ".retire")
    Files.move(live, retire) // swap step 1 happened, then crash
    FsUtils.recoverSwap(live)
    assert(readData(live) == "old")
    assert(!Files.exists(retire))
  }

  test("crash after the new copy landed (live present, stale .retire) " +
      "drops the retired copy and keeps the NEW state") {
    val live = dirWith("new")
    val retire = live.resolveSibling(live.getFileName + ".retire")
    Files.createDirectory(retire)
    Files.write(retire.resolve("data.txt"), "old".getBytes("UTF-8"))
    FsUtils.recoverSwap(live)
    assert(readData(live) == "new")
    assert(!Files.exists(retire))
  }

  test("a stale .retire from an earlier crash does not block the next swap") {
    val live = dirWith("old")
    val retire = live.resolveSibling(live.getFileName + ".retire")
    Files.createDirectory(retire)
    Files.write(retire.resolve("data.txt"), "ancient".getBytes("UTF-8"))
    val fresh = dirWith("new")
    FsUtils.swapDirectory(fresh, live)
    assert(readData(live) == "new")
    assert(!Files.exists(retire))
  }

  test("the facade completes an interrupted TimeSeries exchange at open") {
    import SparkSessionFixture._
    import spark.implicits._
    val base = Files.createTempDirectory("graft-recover").toString
    val db = graft.catalog.GraftDatabase(spark, "rec", base)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    db.tsAppend(Seq(("g1", t0, 1.0)).toDF("point_guid", "ts", "value"))
    // simulate the crash window: live dir retired, new copy never landed
    val ts = Paths.get(base, "rec", "TimeSeries")
    Files.move(ts, ts.resolveSibling("TimeSeries.retire"))
    val again = graft.catalog.GraftDatabase(spark, "rec", base)
    assert(again.tsRange("g1", t0, t0).count() == 1,
      "reopen must restore the retired TimeSeries store")
  }
}
