package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the sf directory. At cluster
  * scale these would be partitioned/bucketed managed tables; the loader is
  * the single seam where that swap happens (everything else consumes
  * DataFrames).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // native function registration is idempotent; loading a table is the
    // common entry point, so every consumer session gets the functions
    graft.functions.GraftFunctions.register(spark)
    // events.ts is physically TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects; read it as a long and floor-convert to micros (the
    // same truncation DuckDB applies when it reads nanos into TIMESTAMP).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register all tables as temp views (used by SQL-form queries/tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
