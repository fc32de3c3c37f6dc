package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for q146 (not part of the graded suite —
  * run explicitly with testOnly). Prints per-phase wall times.
  */
class PerfQ146Probe extends AnyFunSuite {
  import SparkSessionFixture._

  test("q146 phase timings at SPARK_GRAFT_PROBE_SF (skipped unless set)") {
    val dirOpt = sys.env.get("SPARK_GRAFT_PROBE_SF")
    assume(dirOpt.isDefined, "set SPARK_GRAFT_PROBE_SF to run")
    val dir = dirOpt.get
    val s = spark
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    import graft.core.Tables
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val verbose = sys.env.contains("SPARK_GRAFT_PROBE_VERBOSE")
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) println(s"[q146probe-job] stages=" +
          js.stageInfos.size + " " +
          js.stageInfos.map(_.name).mkString(" | ").take(200))
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
    }
    s.sparkContext.addSparkListener(listener)
    def t[A](name: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[q146probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s" +
        f"  jobs=${jobs.get() - j0}")
      r
    }
    // floor measurement: warm trivial action + trivial parquet write
    (1 to 3).foreach(_ => s.range(100).count())
    t("floor-count")(s.range(100).count())
    t("floor-shuffle")(s.range(100).groupBy((col("id") % 7).as("k"))
      .count().collect())
    val fdir = java.nio.file.Files.createTempDirectory("q146probe-w").toString
    t("floor-write")(s.range(100).coalesce(1).write
      .mode("overwrite").parquet(fdir + "/w1"))
    t("floor-write2")(s.range(100).coalesce(1).write
      .mode("overwrite").parquet(fdir + "/w2"))
    for (round <- 1 to 2) {
    println(s"[q146probe] ===== round $round =====")
    val basePrimary = java.nio.file.Files.createTempDirectory("q146probe-p").toString
    val baseReplica = java.nio.file.Files.createTempDirectory("q146probe-r").toString
    val primary = GraftDatabase(s, "p", basePrimary).defineTable(TableDef("orders", "o_orderkey"))
    val replica = GraftDatabase(s, "r", baseReplica).defineTable(TableDef("orders", "o_orderkey"))
    val src = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    t("insert-primary")(primary.insert("orders", src.filter(col("o_orderkey") % 12 === 0)))
    val (boot, c1) = t("changesSince-boot")(primary.changesSince("orders", 0L))
    t("applyChanges-boot")(replica.applyChanges("orders", boot, "q146", 1L))
    t("updateMany")(primary.updateMany("orders", col("o_custkey") % 5 === 0,
      Map("o_totalprice" -> (col("o_totalprice") + 50))))
    t("delete")(primary.delete("orders", col("o_custkey") % 9 === 0))
    t("insert-2")(primary.insert("orders", src.filter(col("o_orderkey") % 12 === 3)))
    val (feed, _) = t("changesSince-2")(primary.changesSince("orders", c1))
    t("applyChanges-2")(replica.applyChanges("orders", feed, "q146", 2L))
    t("replay-noop")(replica.applyChanges("orders", feed, "q146", 2L))
    t("exceptAll-check")(assert(
      replica.table("orders").withColumn("_s", lit(1L))
        .unionByName(primary.table("orders").withColumn("_s", lit(-1L)))
        .groupBy(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .agg(sum(col("_s")).as("_net")).filter(col("_net") =!= 0L)
        .isEmpty))
    t("final-agg")(replica.table("orders")
      .groupBy((col("o_custkey") % 10).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price")).count())
    }
  }
}
