package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.catalog.GraftDatabase
import graft.dml.ConstrainedDml.TableDef

/** Measures the lakehouse table operations' scale posture on lineitem
  * at the given SF: shallow clone and ADD COLUMN must be O(1) in data
  * size (metadata-only commits), the change feed must cost ∝ churn
  * (files exchanged) rather than table size, and OPTIMIZE must rewrite
  * only the small-file backlog's bytes. Run at two SFs and compare —
  * the constant-time claims are the deltas ACROSS the runs.
  *
  * Usage: `sbt "runMain graft.LakeBench /root/testdata/sf0.1"` — one
  * JSON line; results recorded in SCALE.md.
  */
object LakeBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-lake-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val src = graft.core.Tables.load(spark, dir, "lineitem")
        .select(monotonically_increasing_id().as("id"), col("l_orderkey"),
          col("l_quantity"), col("l_extendedprice"))
      val base = java.nio.file.Files.createTempDirectory("graft-lakebench")
      val db = GraftDatabase(spark, "bench", base.toString)
        .defineTable(TableDef("lineitem", "id"))
      db.insert("lineitem", src.repartitionByRange(64, col("l_orderkey")))
      val nRows = db.table("lineitem").count()
      val totalBytes = db.liveFiles("lineitem")
        .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum

      def timeMs[A](body: => A): (A, Long) = {
        val t0 = System.nanoTime(); val a = body
        (a, (System.nanoTime() - t0) / 1000000L)
      }

      // metadata-only ops: wall time must not track data size
      val (_, cloneMs) = timeMs(db.cloneCollection("lineitem", "li_clone"))
      val (_, addColMs) = timeMs(db.addColumn("lineitem", "li_flag",
        org.apache.spark.sql.types.LongType))

      // change feed ∝ churn: a 1-file update vs a ~half-table update,
      // each feed fully consumed (count), vs a full-table read
      val maxKey = src.agg(max(col("l_orderkey"))).head().getLong(0)
      val v0 = db.logVersion
      db.updateMany("lineitem", col("l_orderkey") <= maxKey / 64,
        Map("l_quantity" -> (col("l_quantity") + 1)))
      val v1 = db.logVersion
      val (oneFileRows, oneFileMs) =
        timeMs(db.changes("lineitem", v0, v1).count())
      db.updateMany("lineitem", col("l_orderkey") <= maxKey / 2,
        Map("l_quantity" -> (col("l_quantity") + 1)))
      val v2 = db.logVersion
      val (halfRows, halfMs) = timeMs(db.changes("lineitem", v1, v2).count())
      val (_, fullReadMs) = timeMs(db.table("lineitem").count())

      // data skipping: a 1/64-of-keyspace probe against the
      // range-clustered layout — file-list pruning from the log alone
      val probe = db.seek("lineitem", "l_orderkey", 1L, maxKey / 64)
      val seekFiles = probe.inputFiles.length
      val (seekRows, seekMs) = timeMs(probe.count())

      // OPTIMIZE ∝ backlog: 8 small appends onto the 64-file table;
      // only the appended bytes rewrite
      (1 to 8).foreach(i => db.insert("lineitem",
        spark.range(1).select((lit(10_000_000L) + lit(i)).as("id"),
          lit(maxKey + i).as("l_orderkey"),
          lit(1.0).as("l_quantity"), lit(1.0).as("l_extendedprice"),
          lit(i.toLong).as("li_flag"))))
      val beforeOpt = db.liveFiles("lineitem")
      val smallBytes = beforeOpt.map(f =>
          java.nio.file.Files.size(java.nio.file.Paths.get(f)))
        .filter(_ < (64L << 10)).sum // the 8 tiny appends
      val ((fb, fa), optMs) =
        timeMs(db.optimize("lineitem", smallThreshold = 64L << 10))

      println(s"""{"metric":"lake_ops","sf_dir":"$dir","rows":$nRows,""" +
        s""""total_bytes":$totalBytes,"clone_ms":$cloneMs,""" +
        s""""add_column_ms":$addColMs,""" +
        s""""changes_1file_ms":$oneFileMs,"changes_1file_rows":$oneFileRows,""" +
        s""""changes_half_ms":$halfMs,"changes_half_rows":$halfRows,""" +
        s""""full_read_ms":$fullReadMs,""" +
        s""""seek_ms":$seekMs,"seek_rows":$seekRows,""" +
        s""""seek_files_scanned":$seekFiles,""" +
        s""""optimize_ms":$optMs,"optimize_files":"$fb->$fa",""" +
        s""""optimize_backlog_bytes":$smallBytes}""")
    } finally spark.stop()
  }
}
