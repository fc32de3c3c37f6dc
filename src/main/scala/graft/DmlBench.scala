package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** Measures the file-granular copy-on-write DML path against a
  * same-size update spread across every file: lineitem at the given SF
  * is staged range-clustered into 64 files, then (a) an update whose
  * matches live in ONE file and (b) one touching ALL files run through
  * `updateMany`. The ratio is the rewrite amplification the granular
  * path removes.
  *
  * Usage: `sbt "runMain graft.DmlBench /root/testdata/sf0.1"` — prints
  * one JSON line; results recorded in SCALE.md.
  */
object DmlBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-dml-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val src = graft.core.Tables.load(spark, dir, "lineitem")
        .select(monotonically_increasing_id().as("id"), col("l_orderkey"),
          col("l_quantity"), col("l_extendedprice"))
      def freshTable(): GraftDatabase = {
        val base = java.nio.file.Files.createTempDirectory("graft-dmlbench")
        val db = GraftDatabase(spark, "bench", base.toString)
          .defineTable(TableDef("lineitem", "id"))
        db.insert("lineitem", src.repartitionByRange(64, col("l_orderkey")))
        db
      }
      val maxKey = src.agg(max(col("l_orderkey"))).head().getLong(0)
      // ~1/64 of the key range → matches land in one range-clustered file
      val loHi = (1L, math.max(2L, maxKey / 64))
      @volatile var nFiles = 0

      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      def run(pred: org.apache.spark.sql.Column) = {
        val db = freshTable()
        try {
          val before = db.liveFiles("lineitem").toSet
          nFiles = before.size
          val (t, n) = time(db.updateMany("lineitem", pred,
            Map("l_quantity" -> (col("l_quantity") + 1))))
          val after = db.liveFiles("lineitem").toSet
          val rewritten = before.diff(after).size
          // bytes physically WRITTEN by the update = its new files'
          // sizes; at toy SF wall time is scan-dominated, so write
          // amplification is the scale-honest number
          val written = after.diff(before).toSeq
            .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
          (t, n, rewritten, written)
        } finally graft.core.FsUtils.deleteRecursively(
          java.nio.file.Paths.get(db.root).getParent)
      }
      // alternate runs, take the min of 2 each to damp noise
      val locals = (1 to 2).map { _ =>
        run(col("l_orderkey").between(loHi._1, loHi._2))
      }
      val spreads = (1 to 2).map { _ => run(col("l_orderkey") % 64 === 0) }
      val l = locals.minBy(_._1); val s = spreads.minBy(_._1)
      println(f"""{"metric":"dml_cow","sf_dir":"$dir","n_files":$nFiles,"local_s":${l._1}%.3f,"local_rows":${l._2},"local_files_rewritten":${l._3},"local_bytes_written":${l._4},"spread_s":${s._1}%.3f,"spread_rows":${s._2},"spread_files_rewritten":${s._3},"spread_bytes_written":${s._4},"write_amplification_removed":${s._4.toDouble / math.max(1L, l._4)}%.1f}""")
    } finally spark.stop()
  }
}
