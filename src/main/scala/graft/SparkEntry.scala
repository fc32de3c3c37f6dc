package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Replays the reference's M0 slice (`Iot.Database/README.md:245`,
    * SURVEY §7): FIND customer WHERE <pred> SELECT name INCLUDE orders
    * WHERE <pred> INNERJOIN flatten — as broadcast-dim join + flatten.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.query.GraftQueryEngine(spark, "/root/testdata/sf0.001").run(
      "FIND customer WHERE c_acctbal > 1000 SELECT c_custkey, c_name as person " +
        "INCLUDE orders WHERE o_totalprice > 100 SELECT o_totalprice as amount " +
        "INNERJOIN as t SELECT person, amount")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (engine-specific hashes, Scala-generated LSH planes) → driver
    * records a weaker rows-only check for those.
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
