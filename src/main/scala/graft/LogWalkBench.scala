package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.TxLog

/** Per-trigger commit-log I/O of a capped change-feed catch-up over a
  * LONG backlog of SMALL commits — the object-store posture check for
  * the parsed-action cache: every trigger weighs versions in
  * `advanceByBudgets` and then replays the same files behind
  * `changes()`, so without the cache the log is parsed twice per
  * version (2× the GETs on a real object store).
  *
  * Builds an `n`-version single-file-patch backlog (files pre-staged in
  * ONE distributed write — CommitBench's trick), drains it through
  * `format("graft-changes")` under `Trigger.AvailableNow` at
  * `maxVersionsPerTrigger = cap`, and counts RAW version-file reads
  * through [[TxLog.versionFileReads]] — once with the cache, once with
  * `spark.graft.txlog.actionCacheSize=0`. Identical delivered rows,
  * halved-or-better reads is the pass shape.
  *
  * Usage: `sbt "runMain graft.LogWalkBench [versions] [cap]"` — one
  * JSON line; recorded in SCALE.md.
  */
object LogWalkBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val cap = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder()
      .appName("graft-logwalk-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(cacheOn: Boolean, tag: String): (Long, Long, Double) = {
      spark.conf.set("spark.graft.txlog.actionCacheSize",
        if (cacheOn) "4096" else "0")
      val base = Files.createTempDirectory(s"graft-logwalk-$tag").toString
      val root = s"$base/lw"
      val log = new TxLog(spark, root)
      log.commit(Seq(TxLog.Put("t", Nil))) // v1: bind the (empty) table
      val files = log.stage("t",
        spark.range(n).selectExpr("id", "id * 2 AS v")
          .repartitionByRange(n, col("id")))
      require(files.size == n, s"pre-staged ${files.size} != $n")
      files.foreach(f => log.commit(Seq(TxLog.Patch("t", Nil, Seq(f)))))
      val ckpt = Files.createTempDirectory(s"graft-logwalk-ckpt-$tag").toString
      val before = TxLog.versionFileReads.get()
      val t0 = System.nanoTime()
      // files-weighted admission (one file per version here) — the cap
      // shape that actually WALKS the log each trigger, exactly like
      // the default byte budget does; a bare maxVersionsPerTrigger
      // advances arithmetically and never reads a version file
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "lw").option("table", "t")
        .option("maxFilesPerTrigger", cap.toString)
        .load()
        .writeStream.format("memory").queryName(s"lw_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val reads = TxLog.versionFileReads.get() - before
      val rows = spark.table(s"lw_$tag").count()
      require(rows == n, s"$tag drain delivered $rows rows, want $n")
      (reads, rows, secs)
    }

    val (rawReads, _, rawSecs) = run(cacheOn = false, "nocache")
    val (cachedReads, _, cachedSecs) = run(cacheOn = true, "cache")
    spark.conf.unset("spark.graft.txlog.actionCacheSize")
    val triggers = math.ceil((n + 1).toDouble / cap).toLong // + the seed Put
    println(s"""{"metric":"logwalk_reads","versions":$n,"cap":$cap,""" +
      s""""triggers":$triggers,"reads_nocache":$rawReads,""" +
      s""""reads_cache":$cachedReads,""" +
      f""""reads_per_trigger_nocache":${rawReads.toDouble / triggers}%.1f,""" +
      f""""reads_per_trigger_cache":${cachedReads.toDouble / triggers}%.1f,""" +
      f""""drain_s_nocache":$rawSecs%.2f,"drain_s_cache":$cachedSecs%.2f}""")
    spark.stop()
  }
}
