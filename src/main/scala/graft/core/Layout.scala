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
}
