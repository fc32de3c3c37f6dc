package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

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
    // The testdata's timestamp physical types have shipped in three forms
    // across driver rounds: TIMESTAMP(NANOS) (Spark's vectorized reader
    // rejects it — read as long via nanosAsLong and floor to micros, the
    // same truncation DuckDB applies), TIMESTAMP_UTC, and TIMESTAMP_NTZ
    // (micros, no tz annotation). Normalize all three to TimestampType here
    // so every consumer sees one type. The NTZ->TZ cast is an exact
    // relabel ONLY under a UTC session TZ — the engine's contract — so the
    // loader pins it itself (same pattern as nanosAsLong below) instead of
    // trusting every entry point's session builder to have done it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    val tzFixed = df.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(df) { (acc, f) =>
        acc.withColumn(f.name, col(f.name).cast(TimestampType))
      }
    // Same insurance for the vector table: the engine's codegen vector
    // expressions are float-typed (VectorExpressions matches
    // ArrayType(FloatType)); if a future testdata round ships embeddings
    // as list<double>, normalize at the same seam that absorbed the
    // timestamp drift rather than breaking 15 vector queries at once.
    // Scoped to the embeddings table so a genuinely double-valued array
    // elsewhere is never silently narrowed.
    if (name != "embeddings") tzFixed
    else tzFixed.schema.fields
      .collect { case f if (f.dataType match {
        case ArrayType(DoubleType, _) => true; case _ => false
      }) => f }
      .foldLeft(tzFixed) { (acc, f) =>
        acc.withColumn(f.name, col(f.name).cast(ArrayType(FloatType)))
      }
  }

  /** Register all tables as temp views (used by SQL-form queries/tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
