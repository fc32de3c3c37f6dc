package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef
import graft.streaming.{MaterializedView, MvDef}

/** The materialized view's scale claim, measured: maintaining a grouped
  * aggregate from a FIXED-size change against a GROWING base, versus
  * recomputing it. Phases (per run, events at the given SF as the base):
  *
  *   1. bootstrap: fold the whole base into the view once (cost ∝ base —
  *      reported for context; it is the one full-scan an incremental
  *      view ever pays),
  *   2. three fixed-size change commits (insert / delete / update),
  *      each folded with [[MaterializedView.applyBatch]] and timed —
  *      once into a PURE-DELTA view (count/sum only: the base table is
  *      never read; expected FLAT across decades) and once into a
  *      MIN/MAX view (affected groups recompute from the base at the
  *      batch's version — cost ∝ the affected groups' base rows, the
  *      documented tradeoff of min/max-under-delete semantics),
  *   3. the full group-by recompute of the final state (what a
  *      non-incremental engine pays per refresh — expected to grow
  *      linearly with the base).
  *
  * Batches are built exactly as the feed's withCommitVersion arms build
  * them (`changes(v-1, v)` + the version tag) so the numbers are the
  * maintenance cost, not stream-trigger overhead (FeedBench owns that).
  * Both views are equality-checked against the recompute at the end.
  *
  * Usage: `sbt "runMain graft.MvBench [sfDir] [changeRows]"` → one JSON
  * line; recorded in SCALE.md.
  */
object MvBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val changeRows = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder()
      .appName("graft-mv-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = Files.createTempDirectory("graft-mvbench").toString
    val db = GraftDatabase(spark, "mvbench", base)
      .defineTable(TableDef("ev", "event_id"))
    val ev = graft.core.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "event_type", "value")
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val nRows = ev.count()
    require(ev.select("event_id").distinct().count() == nRows,
      "event_id is not unique on this input")
    val maxId = ev.agg(max("event_id")).head.getLong(0)
    db.insert("ev", ev)                                        // v1
    ev.unpersist(blocking = true)

    val derive = (df: DataFrame) =>
      df.withColumn("day", to_date(col("ts")))
    val mvSum = MvDef(source = "ev", view = "ev_sum",
      keyCols = Seq("event_type", "day"), sumCols = Seq("value"))
    val mvMinMax = MvDef(source = "ev", view = "ev_mm",
      keyCols = Seq("event_type", "day"), sumCols = Seq("value"),
      minMaxCols = Seq("value"), prepare = derive)
    val sumDb = MaterializedView.define(GraftDatabase(spark, "mvb_sum",
      Files.createTempDirectory("graft-mvbench-sum").toString), mvSum)
    val mmDb = MaterializedView.define(GraftDatabase(spark, "mvb_mm",
      Files.createTempDirectory("graft-mvbench-mm").toString), mvMinMax)

    // a feed batch for version v, exactly as the withCommitVersion arm
    // builds it, with the derived `day` key the views group on
    def batchAt(v: Long): DataFrame =
      db.changes("ev", v - 1, v)
        .withColumn("_commit_version", lit(v))
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("value"), col("_change_type"), col("_commit_version"))

    def fold(v: Long, batchId: Long): (Double, Double) = {
      val b = batchAt(v).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        b.count()
        val (_, sSum) = timed {
          // null source: structurally proves the pure-delta path never
          // reads the base
          MaterializedView.applyBatch(null, sumDb, mvSum, b,
            "mvb-sum", batchId)
        }
        val (_, sMm) = timed {
          MaterializedView.applyBatch(db, mmDb, mvMinMax, b,
            "mvb-mm", batchId)
        }
        (sSum, sMm)
      } finally { b.unpersist(); () }
    }

    // 1. bootstrap: the whole base as one insert batch
    val (bootSum, bootMm) = fold(1L, 0L)

    // 2. three FIXED-size changes: insert new ids, delete half of them,
    //    update a base slice (delete+insert pairs in the feed)
    db.insert("ev", db.table("ev")
      .filter(col("event_id") <= changeRows)
      .withColumn("event_id", col("event_id") + maxId + 1))     // v2
    db.delete("ev",
      col("event_id") > maxId + 1 + changeRows / 2)             // v3
    db.updateMany("ev", col("event_id") <= changeRows / 2,
      Map("value" -> (col("value") + lit(1.0))))                // v4
    val times = (2L to 4L).map(v => fold(v, v - 1))
    val chgSum = times.map(_._1)
    val chgMm = times.map(_._2)

    // 3. the non-incremental alternative: full recompute of the final
    //    grouped state from the base table
    val (recomputed, recomputeS) = timed {
      db.table("ev")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          col("value"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as(MaterializedView.CountCol),
          sum(col("value").cast(MaterializedView.SumType))
            .cast(MaterializedView.SumType)
            .as(MaterializedView.sumCol("value")),
          min(col("value")).as(MaterializedView.minColName("value")),
          max(col("value")).as(MaterializedView.maxColName("value")))
        .localCheckpoint(eager = true)
    }

    // both views must equal the recompute
    def canon(df: DataFrame, cols: Seq[String]): Set[String] =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val sumCols = Seq("event_type", "day", MaterializedView.CountCol,
      MaterializedView.sumCol("value"))
    val mmCols = sumCols ++ Seq(MaterializedView.minColName("value"),
      MaterializedView.maxColName("value"))
    require(canon(sumDb.table("ev_sum"), sumCols) ==
      canon(recomputed, sumCols), "pure-delta view diverged")
    require(canon(mmDb.table("ev_mm"), mmCols) ==
      canon(recomputed, mmCols), "min/max view diverged")

    def fmt(v: Double) = f"$v%.2f"
    def arr(xs: Seq[Double]) = xs.map(fmt).mkString("[", ",", "]")
    println(s"""{"metric":"mv_maintenance","base_rows":$nRows,""" +
      s""""change_rows":$changeRows,""" +
      s""""bootstrap_sum_s":${fmt(bootSum)},"bootstrap_mm_s":${fmt(bootMm)},""" +
      s""""delta_sum_s":${arr(chgSum)},"delta_mm_s":${arr(chgMm)},""" +
      s""""recompute_s":${fmt(recomputeS)},"sf":"$dir"}""")
    spark.stop()
  }
}
