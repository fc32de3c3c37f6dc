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
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") > 1000)
      .select(col("c_custkey"), col("c_name").as("person"))
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 100)
      .select(col("o_custkey"), col("o_totalprice").as("amount"))
    c.join(o, c("c_custkey") === o("o_custkey"), "inner")
      .select("person", "amount")
  }

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
