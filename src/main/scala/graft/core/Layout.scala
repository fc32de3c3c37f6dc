package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout helpers for the 100 TB deployment (SURVEY §7 M5):
  * date-partitioned facts (partition pruning on time predicates) and
  * bucketed tables (shuffle-free co-located joins on the bucket key —
  * the Spark replacement for the reference's per-collection PK index).
  *
  * On a cluster these target the real catalog (metastore); locally they
  * use the session catalog + spark.sql.warehouse.dir, which exercises the
  * identical plan shapes (PlanSpec-style tests assert no Exchange).
  */
object Layout {

  /** Write a fact table date-partitioned: time-range queries prune whole
    * directories before any I/O.
    */
  def writeDatePartitioned(df: DataFrame, dateCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(dateCol).parquet(path)

  /** Save as a bucketed managed table: joins/aggregations on `bucketCol`
    * between tables with the same bucketing need no shuffle at all.
    * Idempotent across processes: a fresh session's catalog does not know
    * a leftover warehouse directory from a previous run, and saveAsTable
    * refuses to overwrite an unregistered location — drop both first.
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Drop a managed table AND its leftover warehouse directory (a fresh
    * session's catalog does not know a previous run's directory, and
    * saveAsTable refuses to overwrite an unregistered location).
    */
  private def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = spark.sessionState.catalog.defaultTablePath(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Save as a value-partitioned managed table (one directory per distinct
    * `partCol` value): an IN/equality filter on `partCol` prunes whole
    * directories before any I/O, unconditionally. This is the scan-pruning
    * layout — bucket pruning, by contrast, only applies when bucketed
    * reading survives planning, and Spark auto-disables bucketed scans for
    * queries with no join/aggregation on the bucket key
    * ("Bucketed: false (disabled by query planner)"). Use `saveBucketed`
    * for co-located joins, this for probe-pruned point/ANN reads.
    */
  def savePartitionedTable(df: DataFrame, table: String, partCol: String): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode("overwrite")
      .partitionBy(partCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — zero-shuffle when
    * layouts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** Morton (Z-order) key over two non-negative integer dimensions: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure long
    * arithmetic (shifts + masks), codegen-friendly, no UDF. Rows close in
    * z-value are close in BOTH dimensions, so sorting by it clusters the
    * file-level min/max ranges that parquet data-skipping prunes on —
    * the multi-column locality a single-column sort cannot give.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // saturate out-of-range values at the domain edges instead of
    // truncating high bits: a value >= 2^bits sorts with the TOP cell
    // (and negatives with the bottom), never wrapping onto small keys —
    // truncation would interleave the whole overflow range into every
    // file and silently defeat min/max skipping. NULL stays NULL (so
    // null-keyed rows cluster in their own range) — Spark's
    // greatest/least SKIP nulls and would otherwise coerce them to 0.
    def clamp(c: org.apache.spark.sql.Column) = {
      val v = c.cast("long")
      when(v.isNotNull,
        least(greatest(v, lit(0L)), lit((1L << bits) - 1)))
    }
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** k-dimensional Morton interleave (2 ≤ k ≤ 4): bit j of dimension d
    * lands at position j*k + d, so the curve recurses through
    * 2^k-cell hypercubes — each output file's [min, max] box stays
    * tight in EVERY clustered column. Per-dimension resolution shrinks
    * with k (floor(62/k) capped at 16 bits): at 4 columns that is
    * 15 bits ≈ 32k grid cells per dimension, far finer than any
    * realistic file count. NULL and out-of-range values behave as in
    * [[zValue]] (clamp, never wrap).
    */
  def zValueN(cols: Seq[org.apache.spark.sql.Column],
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2 && cols.size <= 4,
      s"zValueN takes 2-4 columns, got ${cols.size}")
    val k = cols.size
    val b = math.min(bits, 62 / k)
    def clamp(c: org.apache.spark.sql.Column) = {
      val v = c.cast("long")
      when(v.isNotNull, least(greatest(v, lit(0L)), lit((1L << b) - 1)))
    }
    val cs = cols.map(clamp)
    (0 until b).foldLeft(lit(0L)) { (acc, i) =>
      cs.zipWithIndex.foldLeft(acc) { case (a2, (c, d)) =>
        a2 + shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + d)
      }
    }
  }

  /** Write z-ordered on two dimensions: range-partition + sort by the
    * Morton key so each output file covers a small rectangle of
    * (aCol, bCol) space — point/range predicates on EITHER column then
    * skip most files on parquet min/max stats. `files` bounds output file
    * count (the cluster-side knob is rows-per-file / maxRecordsPerFile).
    */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String, path: String,
      files: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a directory of many small parquet files into
    * ceil(totalBytes / targetBytes) right-sized files — the maintenance
    * pass that keeps scan task counts sane after fine-grained streaming
    * or per-partition writes (the 100 TB equivalent of the reference's
    * single-file Rebuild/Shrink, `LiteDB/Engine/LiteEngine.cs`).
    * Coalesce, not repartition: no shuffle, just fewer read tasks
    * stitched into fewer writers.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    // a value-partitioned layout (subdirectories) must compact per
    // partition — a flat rewrite here would silently erase the layout
    require(!entries.exists(e => e.isDirectory &&
        !e.getPath.getName.startsWith("_")),
      s"$path contains partition subdirectories; compact each partition " +
        "directory individually to preserve the layout")
    val total = entries.filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compact")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap via rename-aside so a failure between steps never loses the
    // original: the old data survives as ._old until the new set is in.
    // HDFS-style rename reports failure by RETURNING false — check it,
    // never fall through to the backup delete on a failed swap.
    val old = new org.apache.hadoop.fs.Path(path + "._old")
    fs.delete(old, true)
    require(fs.rename(p, old), s"compact: could not move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore; best-effort, original data intact
      throw new java.io.IOException(
        s"compact: could not move compacted set into $p; original restored")
    }
    fs.delete(old, true)
  }
}
