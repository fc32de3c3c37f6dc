package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.catalog.{CommitPrimitive, HttpCasServer, HttpCommitPrimitive,
  LatencyCommitPrimitive, PosixCommitPrimitive, TxLog}

/** Multi-writer commit throughput under contention — the measurement
  * CommitRaceProcessSpec (safety) does not make. N writer threads each
  * publish M pre-staged commits against ONE log:
  *
  *   - `patch` mode: file-granular `Patch` commits over DISJOINT files
  *     (the Delta-style concurrency unit). These COMMUTE: a lost CAS
  *     race re-validates and retries inside `commit()`, so writers
  *     should scale near-linearly until the log's CAS itself saturates.
  *   - `absolute` mode: `Add` commits validated at a read version (the
  *     serializable path). Every interleaved commit on the same table
  *     is a real conflict → ConflictException → the writer re-reads and
  *     retries, the documented policy. Throughput must DEGRADE
  *     GRACEFULLY (bounded retries, no livelock), not collapse.
  *
  * Staging is hoisted OUT of the timed region (one Spark job writes
  * every file up front), so the numbers isolate the commit protocol —
  * conflict validation reads + the publish CAS — not parquet writes.
  *
  * The commit PRIMITIVE is swappable (the object-store posture
  * measurement): `GRAFT_COMMIT_PRIMITIVE=posix|nolink|http` picks the
  * hard-link CAS, the sidecar-lock fallback, or the conditional-PUT
  * HTTP store ([[graft.catalog.HttpCasServer]], S3 `If-None-Match: *`
  * semantics); `GRAFT_PUT_LATENCY_MS=25` injects the wide-area round
  * trip on every put, losers included, and `GRAFT_READ_LATENCY_MS=25`
  * charges the commit protocol's READ side the same way — conflict
  * validation GETs, head-discovery LISTs, settle-probe HEADs — so the
  * table measures the FULL wide-area commit cost, not just the CAS.
  *
  * Usage: `sbt "runMain graft.CommitBench"` → one JSON line; recorded
  * in SCALE.md.
  */
object CommitBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-commit-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val perWriter =
      sys.env.get("GRAFT_COMMITS_PER_WRITER").flatMap(_.toIntOption)
        .getOrElse(24)
    val primKind = sys.env.getOrElse("GRAFT_COMMIT_PRIMITIVE", "posix")
    val putLatencyMs =
      sys.env.get("GRAFT_PUT_LATENCY_MS").flatMap(_.toLongOption).getOrElse(0L)
    val readLatencyMs =
      sys.env.get("GRAFT_READ_LATENCY_MS").flatMap(_.toLongOption).getOrElse(0L)

    def run(writers: Int, absolute: Boolean): (Double, Long) = {
      val root = Files.createTempDirectory("graft-commitbench").toString
      // per-writer primitive factory: each TxLog handle gets its own
      // primitive (own HTTP client), like distinct driver processes
      val server: Option[HttpCasServer] = primKind match {
        case "http" => Some(new HttpCasServer(java.nio.file.Paths.get(root)))
        case _ => None
      }
      def prim(): CommitPrimitive = {
        val base = primKind match {
          case "posix" => CommitPrimitive.posix
          case "nolink" => new PosixCommitPrimitive(forceNoLinks = true)
          case "http" => new HttpCommitPrimitive(server.get.endpoint,
            java.nio.file.Paths.get(root))
          case other => throw new IllegalArgumentException(
            s"GRAFT_COMMIT_PRIMITIVE must be posix|nolink|http, got '$other'")
        }
        if (putLatencyMs > 0 || readLatencyMs > 0)
          new LatencyCommitPrimitive(base, putLatencyMs, readLatencyMs)
        else base
      }
      val log = new TxLog(spark, root, primitive = prim())
      // seed + pre-stage every file in ONE distributed write
      log.commit(Seq(TxLog.Put("t",
        log.stage("t", Seq((0, 0)).toDF("id", "x")))))
      val total = writers * perWriter
      // repartitionByRange over `total` distinct ids yields exactly one
      // row per partition → one staged file per commit (round-robin
      // repartition leaves some partitions empty and under-stages)
      val files = log.stage("t",
        spark.range(total).selectExpr("CAST(id AS INT) AS id", "1 AS x")
          .repartitionByRange(total, org.apache.spark.sql.functions.col("id")))
      require(files.size == total, s"pre-staged ${files.size} != $total")
      val slices = files.grouped(perWriter).toSeq
      val retries = new AtomicLong(0L)
      val barrier = new CyclicBarrier(writers + 1)
      @volatile var err: Throwable = null
      val threads = slices.map { mine =>
        new Thread(() => {
          // each writer publishes through ITS OWN log handle (own
          // snapshot cache), like distinct driver processes would.
          // Construction failures must still trip the barrier or the
          // main thread would hang instead of reporting the error.
          val my = try new TxLog(spark, root, primitive = prim())
            catch { case t: Throwable => err = t; null }
          barrier.await()
          try {
            if (my != null) mine.foreach { f =>
              var done = false
              while (!done) {
                try {
                  if (absolute)
                    my.commit(Seq(TxLog.Add("t", Seq(f))),
                      readVersion = my.settledVersion)
                  else
                    my.commit(Seq(TxLog.Patch("t", Nil, Seq(f))),
                      readVersion = my.settledVersion)
                  done = true
                } catch {
                  case _: TxLog.ConflictException => retries.incrementAndGet()
                }
              }
            }
          } catch { case t: Throwable => err = t }
        })
      }
      threads.foreach(_.start())
      barrier.await()
      val t0 = System.nanoTime()
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      server.foreach(_.close())
      if (err != null) throw err
      val snap = new TxLog(spark, root).snapshot()
      require(snap.tables("t").size == total + 1,
        s"lost commits: ${snap.tables("t").size - 1} of $total landed")
      (total / secs, retries.get())
    }

    val rows = for {
      writers <- Seq(1, 4, 16)
      mode <- Seq("patch", "absolute")
    } yield {
      val (cps, retries) = run(writers, mode == "absolute")
      f"""{"writers":$writers,"mode":"$mode","commits_per_s":$cps%.1f,"retries":$retries}"""
    }
    println(s"""{"metric":"commit_throughput","per_writer":$perWriter,""" +
      s""""primitive":"$primKind","put_latency_ms":$putLatencyMs,""" +
      s""""read_latency_ms":$readLatencyMs,""" +
      s""""rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
