package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** End-to-end throughput of the change-feed surfaces at scale: the same
  * backlog (lineitem at the given SF, landed as `commits` insert
  * versions) is drained three ways and timed —
  *
  *   1. `graft-changes` readStream → writeStream under
  *      `Trigger.AvailableNow` with `maxVersionsPerTrigger` admission
  *      (the DSv2 path: each batch stages UnsafeRow files under the
  *      checkpoint, so this price includes the public-API staging
  *      write+read),
  *   2. the same uncapped (one bootstrap batch), and
  *   3. the polling [[graft.streaming.ChangeFeedReplicator]]
  *      (`changesSince` → `applyChanges`, no staging — the V1-shaped
  *      in-process twin).
  *
  * All three must land byte-identical replicas; the interesting output
  * is rows/s and the DSv2 staging overhead vs the replicator.
  *
  * Usage: `sbt "runMain graft.FeedBench [sfDir] [commits] [cap]"` —
  * one JSON line; recorded in SCALE.md.
  */
object FeedBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val commits = if (args.length > 1) args(1).toInt else 8
    val cap = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .appName("graft-feed-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // source: `commits` insert versions over disjoint id ranges — the
    // catch-up backlog shape (each version exchanges its own files)
    val srcBase = Files.createTempDirectory("graft-feedbench-src").toString
    val src = GraftDatabase(spark, "feedsrc", srcBase)
      .defineTable(TableDef("li", "id"))
    // monotonically_increasing_id is unique but NOT contiguous (the
    // partition id rides in the high bits) — slice commits by id hash,
    // not by range
    val rows = graft.core.Tables.load(spark, dir, "lineitem")
      .select(monotonically_increasing_id().as("id"), col("l_orderkey"),
        col("l_quantity"), col("l_extendedprice"))
      .persist()
    val nRows = rows.count()
    (0 until commits).foreach { i =>
      src.insert("li", rows
        .filter(pmod(xxhash64(col("id")), lit(commits)) === i)
        .repartition(8))
    }
    rows.unpersist()
    require(src.table("li").count() == nRows, "backlog landed short")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def streamDrain(name: String, opts: Map[String, String]): (Double, Long) = {
      val dstBase = Files.createTempDirectory(s"graft-feedbench-$name").toString
      val dst = GraftDatabase(spark, name, dstBase)
      dst.defineTable(TableDef("li", "id"))
      val ckpt = Files.createTempDirectory(s"graft-feedbench-ckpt-$name").toString
      val (_, secs) = timed {
        val q = spark.readStream.format("graft-changes")
          .option("baseDir", srcBase).option("name", "feedsrc")
          .option("table", "li").options(opts).load()
          .writeStream.format("graft-changes")
          .option("baseDir", dstBase).option("name", name)
          .option("table", "li").option("appId", s"$name-rep")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val got = dst.table("li").count()
      require(got == nRows, s"$name replica has $got rows, want $nRows")
      (secs, got)
    }

    // a drain that exhausts the harness heap is a RESULT, not a crash:
    // the whole point of admission control is that the capped path
    // completes where an unbounded bootstrap batch cannot
    def tryDrain(name: String, opts: Map[String, String]): Double =
      try streamDrain(name, opts)._1
      catch {
        case e: Throwable =>
          System.err.println(s"[feedbench] $name failed: ${e.getMessage}")
          -1.0
      }
    val cappedSecs = tryDrain("feedcap",
      Map("maxVersionsPerTrigger" -> cap.toString))

    val (_, pollSecs) = timed {
      val dstBase = Files.createTempDirectory("graft-feedbench-poll").toString
      val dst = GraftDatabase(spark, "feedpoll", dstBase)
      dst.defineTable(TableDef("li", "id"))
      val rep = new graft.streaming.ChangeFeedReplicator(
        src, "li", dst, "li", appId = "poll-rep")
      rep.replicateOnce()
      val got = dst.table("li").count()
      require(got == nRows, s"poll replica has $got rows, want $nRows")
    }

    // the uncapped drain runs LAST: at scales where it exhausts the
    // harness heap (a RESULT this bench exists to show), the JVM after
    // an OOM is not a trustworthy place to time anything else
    val uncappedSecs = tryDrain("feedall", Map.empty)

    def fmt(v: Double) = f"$v%.2f"
    def rps(secs: Double) = if (secs > 0) fmt(nRows / secs) else "-1"
    println(s"""{"metric":"feed_throughput","rows":$nRows,""" +
      s""""commits":$commits,"cap":$cap,""" +
      s""""capped_s":${fmt(cappedSecs)},"capped_rows_per_s":${rps(cappedSecs)},""" +
      s""""uncapped_s":${fmt(uncappedSecs)},"uncapped_rows_per_s":${rps(uncappedSecs)},""" +
      s""""poll_s":${fmt(pollSecs)},"poll_rows_per_s":${rps(pollSecs)},""" +
      s""""sf":"$dir"}""")
    spark.stop()
  }
}
