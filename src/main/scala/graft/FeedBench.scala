package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** End-to-end throughput of the change-feed surfaces at scale: the same
  * backlog (lineitem at the given SF, landed as `commits` insert
  * versions) is drained four ways and timed —
  *
  *   1. the polling [[graft.streaming.ChangeFeedReplicator]]
  *      (`changesSince` → `applyChanges`, no staging — the V1-shaped
  *      in-process twin; runs FIRST on a fresh heap, see below),
  *   2. `graft-changes` readStream → writeStream under
  *      `Trigger.AvailableNow` with ZERO options (the out-of-the-box
  *      path: the DEFAULT 512 MiB `maxBytesPerTrigger` paces it),
  *   3. the same with explicit `maxVersionsPerTrigger` admission, and
  *   4. the same with the explicit `maxBytesPerTrigger=none` opt-out
  *      (one bootstrap batch — the path that exhausts an 8 GB heap at
  *      sf10, which is a RESULT, not a crash; runs LAST for the same
  *      heap-hygiene reason).
  *
  * Every completed drain's replica must be CONTENT-IDENTICAL to the
  * source (order-insensitive xxhash64 rollup over the business
  * columns, not just a row count); the interesting output is rows/s
  * and the DSv2 staging overhead vs the replicator.
  *
  * Usage: `sbt "runMain graft.FeedBench [sfDir] [commits] [cap]
  * [readRttMs]"` — one JSON line; recorded in SCALE.md. A non-zero
  * `readRttMs` charges every SOURCE-side commit-log read (version
  * GETs, LISTs, HEADs) with that round trip via a latency-injected
  * [[graft.catalog.CommitPrimitive]] — the wide-area regime where the
  * catch-up walk's per-trigger read floor actually costs.
  */
object FeedBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val commits = if (args.length > 1) args(1).toInt else 8
    val cap = if (args.length > 2) args(2).toInt else 2
    val readRttMs = if (args.length > 3) args(3).toLong else 0L
    val spark = SparkSession.builder()
      .appName("graft-feed-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // source: `commits` insert versions over disjoint id ranges — the
    // catch-up backlog shape (each version exchanges its own files).
    // The id is DETERMINISTIC in the business columns (a per-order
    // row_number over a total in-order sort), so commit slices are
    // stable under recomputation — an assigned
    // monotonically_increasing_id is not (task retry or cache eviction
    // reassigns it, overlapping or dropping slice rows); the distinct
    // check below guards the derivation on any input
    val srcBase = Files.createTempDirectory("graft-feedbench-src").toString
    val src = GraftDatabase(spark, "feedsrc", srcBase)
      .defineTable(TableDef("li", "id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))
    // persist: the id derivation is deterministic (safe to recompute),
    // but WITHOUT caching, the full window sort re-executes for every
    // commit slice plus both guards — `commits + 2` sorts of the whole
    // table is an hour-class setup cost at sf10. Unpersisted before the
    // timed phases so setup cache blocks can't skew their heap.
    val rows = graft.core.Tables.load(spark, dir, "lineitem")
      .select((col("l_orderkey") * 1000 + row_number().over(w)).as("id"),
        col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nRows = rows.count()
    require(rows.select("id").distinct().count() == nRows,
      "derived id is not unique on this input — widen the sort key")
    (0 until commits).foreach { i =>
      src.insert("li", rows
        .filter(pmod(xxhash64(col("id")), lit(commits)) === i)
        .repartition(8))
    }
    rows.unpersist(blocking = true)
    require(src.table("li").count() == nRows, "backlog landed short")

    // order-insensitive content fingerprint over ALL business columns:
    // replicas must be byte-identical to the source, not just as large
    def contentHash(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = df
      .select(xxhash64(col("id"), col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice")).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h"))).collect()(0).getDecimal(0)
    val srcHash = contentHash(src.table("li"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // read-charged regime: the drains' SOURCE handle reads its log
    // through a latency-injected primitive (writes/sink unaffected —
    // CommitBench owns the write side)
    if (readRttMs > 0)
      GraftDatabase.registerCommitPrimitive("feedbench-read-rtt",
        new graft.catalog.LatencyCommitPrimitive(
          graft.catalog.CommitPrimitive.posix, 0L, readRttMs))
    val srcOpts: Map[String, String] =
      if (readRttMs > 0) Map("commitPrimitiveRef" -> "feedbench-read-rtt")
      else Map.empty

    def streamDrain(name: String, opts: Map[String, String]): Double = {
      val dstBase = Files.createTempDirectory(s"graft-feedbench-$name").toString
      val dst = GraftDatabase(spark, name, dstBase)
      dst.defineTable(TableDef("li", "id"))
      val ckpt = Files.createTempDirectory(s"graft-feedbench-ckpt-$name").toString
      val (_, secs) = timed {
        val q = spark.readStream.format("graft-changes")
          .option("baseDir", srcBase).option("name", "feedsrc")
          .option("table", "li").options(srcOpts).options(opts).load()
          .writeStream.format("graft-changes")
          .option("baseDir", dstBase).option("name", name)
          .option("table", "li").option("appId", s"$name-rep")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val got = dst.table("li").count()
      require(got == nRows, s"$name replica has $got rows, want $nRows")
      require(contentHash(dst.table("li")) == srcHash,
        s"$name replica content diverged from the source")
      secs
    }

    // a drain that exhausts the harness heap is a RESULT, not a crash:
    // the whole point of admission control is that the bounded paths
    // complete where an unbounded bootstrap batch cannot
    def tryDrain(name: String, opts: Map[String, String]): Double =
      try streamDrain(name, opts)
      catch {
        case e: Throwable =>
          System.err.println(s"[feedbench] $name failed: ${e.getMessage}")
          -1.0
      }
    // the POLL replicator runs FIRST: its single 60M-row applyChanges
    // batch is the phase with the largest one-shot aggregation, and in
    // one shared local-mode JVM it measured an AGGREGATE_OUT_OF_MEMORY
    // at sf10 when two full stream drains ran before it (their
    // accumulated broadcast/state blocks shrink the unified memory the
    // final-phase aggregation can claim) — fresh-heap ordering keeps
    // each phase's number comparable across rounds. Failure-isolated
    // like the drains: one phase dying must not cost the others' data.
    val pollSecs = try {
      // time ONLY the drain (setup and verification sit outside the
      // clock, exactly as in streamDrain — otherwise poll_rows_per_s
      // pays the verification scan the stream paths don't)
      val dstBase = Files.createTempDirectory("graft-feedbench-poll").toString
      val dst = GraftDatabase(spark, "feedpoll", dstBase)
      dst.defineTable(TableDef("li", "id"))
      val rep = new graft.streaming.ChangeFeedReplicator(
        src, "li", dst, "li", appId = "poll-rep")
      val (_, secs) = timed { rep.replicateOnce() }
      val got = dst.table("li").count()
      require(got == nRows, s"poll replica has $got rows, want $nRows")
      require(contentHash(dst.table("li")) == srcHash,
        "poll replica content diverged from the source")
      secs
    } catch {
      case e: Throwable =>
        System.err.println(s"[feedbench] poll failed: ${e.getMessage}")
        -1.0
    }

    // ZERO options — the out-of-the-box posture the default byte cap
    // exists for: this drain must complete at every scale
    val defaultSecs = tryDrain("feeddef", Map.empty)
    val cappedSecs = tryDrain("feedcap",
      Map("maxVersionsPerTrigger" -> cap.toString))

    // the explicitly-uncapped drain runs LAST: at scales where it
    // exhausts the harness heap (a RESULT this bench exists to show),
    // the JVM after an OOM is not a trustworthy place to time anything
    val uncappedSecs = tryDrain("feedall", Map("maxBytesPerTrigger" -> "none"))

    def fmt(v: Double) = f"$v%.2f"
    def rps(secs: Double) = if (secs > 0) fmt(nRows / secs) else "-1"
    println(s"""{"metric":"feed_throughput","rows":$nRows,""" +
      s""""commits":$commits,"cap":$cap,"read_rtt_ms":$readRttMs,""" +
      s""""default_s":${fmt(defaultSecs)},"default_rows_per_s":${rps(defaultSecs)},""" +
      s""""capped_s":${fmt(cappedSecs)},"capped_rows_per_s":${rps(cappedSecs)},""" +
      s""""uncapped_s":${fmt(uncappedSecs)},"uncapped_rows_per_s":${rps(uncappedSecs)},""" +
      s""""poll_s":${fmt(pollSecs)},"poll_rows_per_s":${rps(pollSecs)},""" +
      s""""sf":"$dir"}""")
    spark.stop()
  }
}
