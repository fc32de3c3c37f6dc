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
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on the bucket key — zero-shuffle when
    * layouts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
