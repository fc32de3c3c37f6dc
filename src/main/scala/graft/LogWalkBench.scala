package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.{CommitPrimitive, GraftDatabase, LatencyCommitPrimitive, TxLog}

/** Per-trigger commit-log I/O of a capped change-feed catch-up over a
  * LONG backlog of SMALL commits — the object-store posture check, now
  * with the READ side charged: every trigger's version-file GETs,
  * log-directory LISTs, checkpoint GETs, and size-probe HEADs go
  * through a [[LatencyCommitPrimitive]] with the given read RTT, so
  * the drain time measures the real wide-area per-trigger floor
  * (round 12 counted the reads; this charges them).
  *
  * Builds an `n`-version single-file-patch backlog (files pre-staged in
  * ONE distributed write — CommitBench's trick), then drains it through
  * `format("graft-changes")` under `Trigger.AvailableNow` at
  * `maxFilesPerTrigger = cap`, once per configuration:
  *
  *   - `nocache` / `cache` at RTT 0 — the parsed-action-cache A/B
  *     (identical delivered rows, halved-or-better reads is the pass
  *     shape, as in round 11)
  *   - `cache` at each requested read RTT (default 25 and 50 ms),
  *     threaded into the stream via `commitPrimitiveRef`
  *
  * Each run prints ONE JSON line with the full read ledger (version
  * GETs, LISTs, checkpoint GETs, HEADs — per trigger) and the drain
  * seconds; recorded in SCALE.md.
  *
  * Usage: `sbt "runMain graft.LogWalkBench [versions] [cap] [rttList]
  * [checkpointEvery]"` — rttList comma-separated ms, e.g. `25,50`.
  */
object LogWalkBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val cap = if (args.length > 1) args(1).toInt else 25
    val rtts = (if (args.length > 2) args(2) else "25,50")
      .split(",").toSeq.filter(_.nonEmpty).map(_.trim.toLong)
    val ckptEvery = if (args.length > 3) args(3).toLong else TxLog.checkpointEvery
    val spark = SparkSession.builder()
      .appName("graft-logwalk-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.txlog.checkpointEvery", ckptEvery.toString)

    final case class Ledger(reads: Long, lists: Long, ckpts: Long,
        heads: Long, secs: Double)

    def run(cacheOn: Boolean, readRttMs: Long, tag: String): Ledger = {
      spark.conf.set("spark.graft.txlog.actionCacheSize",
        if (cacheOn) "4096" else "0")
      val base = Files.createTempDirectory(s"graft-logwalk-$tag").toString
      val root = s"$base/lw"
      // setup commits through the UNcharged posix primitive (building
      // the backlog is not what's measured)
      val log = new TxLog(spark, root)
      log.commit(Seq(TxLog.Put("t", Nil))) // v1: bind the (empty) table
      val files = log.stage("t",
        spark.range(n).selectExpr("id", "id * 2 AS v")
          .repartitionByRange(n, col("id")))
      require(files.size == n, s"pre-staged ${files.size} != $n")
      files.foreach(f => log.commit(Seq(TxLog.Patch("t", Nil, Seq(f)))))
      // the DRAIN's database handle reads its log through the charged
      // primitive — registered and referenced by key
      val primKey = s"lw-$tag"
      GraftDatabase.registerCommitPrimitive(primKey,
        new LatencyCommitPrimitive(CommitPrimitive.posix, 0L, readRttMs))
      val ckpt = Files.createTempDirectory(s"graft-logwalk-ckpt-$tag").toString
      val (r0, l0, c0, h0) = (TxLog.versionFileReads.get(),
        TxLog.logListings.get(), TxLog.ckptReads.get(), TxLog.sizeProbes.get())
      val t0 = System.nanoTime()
      // files-weighted admission (one file per version here) — the cap
      // shape that actually WALKS the log each trigger, exactly like
      // the default byte budget does; a bare maxVersionsPerTrigger
      // advances arithmetically and never reads a version file
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "lw").option("table", "t")
        .option("maxFilesPerTrigger", cap.toString)
        .option("commitPrimitiveRef", primKey)
        .load()
        .writeStream.format("memory").queryName(s"lw_$tag")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val rows = spark.table(s"lw_$tag").count()
      require(rows == n, s"$tag drain delivered $rows rows, want $n")
      Ledger(TxLog.versionFileReads.get() - r0, TxLog.logListings.get() - l0,
        TxLog.ckptReads.get() - c0, TxLog.sizeProbes.get() - h0, secs)
    }

    val triggers = math.ceil((n + 1).toDouble / cap).toLong // + the seed Put
    def per(x: Long): String = f"${x.toDouble / triggers}%.1f"
    def emit(tag: String, rtt: Long, l: Ledger): Unit =
      println(s"""{"metric":"logwalk","config":"$tag","versions":$n,""" +
        s""""cap":$cap,"ckpt_every":$ckptEvery,"read_rtt_ms":$rtt,""" +
        s""""triggers":$triggers,"reads":${l.reads},"lists":${l.lists},""" +
        s""""ckpt_reads":${l.ckpts},"head_probes":${l.heads},""" +
        s""""reads_per_trigger":${per(l.reads)},""" +
        s""""lists_per_trigger":${per(l.lists)},""" +
        s""""ckpt_per_trigger":${per(l.ckpts)},""" +
        s""""heads_per_trigger":${per(l.heads)},""" +
        f""""drain_s":${l.secs}%.2f}""")

    // the round-11 cache A/B at zero RTT, unchanged in meaning
    val raw = run(cacheOn = false, 0L, "nocache")
    val cached = run(cacheOn = true, 0L, "cache0")
    emit("nocache_rtt0", 0L, raw)
    emit("cache_rtt0", 0L, cached)
    // the read-charged regimes
    rtts.foreach { rtt =>
      emit(s"cache_rtt$rtt", rtt, run(cacheOn = true, rtt, s"rtt$rtt"))
    }
    spark.conf.unset("spark.graft.txlog.actionCacheSize")
    spark.stop()
  }
}
