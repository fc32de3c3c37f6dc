package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** The driver's testdata has shipped `events.ts` under three different
  * parquet physical types across rounds: TIMESTAMP (micros, UTC-adjusted),
  * TIMESTAMP_NTZ (micros, no tz annotation), and TIMESTAMP(NANOS) (which
  * Spark surfaces as LONG under `nanosAsLong`). `Tables.load` must normalize
  * all of them to TimestampType with identical values — this pins that seam
  * so a testdata re-generation can't silently break timestamp queries again
  * (it did in round 4: 7 queries threw DATATYPE_MISMATCH on NTZ input).
  */
class TablesPhysicalTypeSpec extends AnyFunSuite {
  private lazy val spark = SparkSessionFixture.spark

  // one canonical micros instant: 2024-03-01T12:34:56.789Z
  private val micros = 1709296496789000L

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 7L, 41.5), (2L, 7L, 42.5), (3L, 9L, 43.5))
      .toDF("event_id", "device_id", "value")
      .withColumn("ts", tsCol)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    // the round-4 failure mode: unix_micros rejects TIMESTAMP_NTZ input
    df.select(unix_micros(col("ts"))).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq.sorted
  }

  private val expected =
    Seq(micros, micros + 1000000L, micros + 2000000L)

  test("TIMESTAMP (tz-adjusted micros) loads as TimestampType") {
    val dir = Files.createTempDirectory("phys-tz").toString
    writeEvents(dir, timestamp_micros(lit(micros) + (col("event_id") - 1) * 1000000L))
    assert(loadedMicros(dir) == expected)
  }

  test("TIMESTAMP_NTZ loads as TimestampType with identical instants") {
    val dir = Files.createTempDirectory("phys-ntz").toString
    writeEvents(dir,
      timestamp_micros(lit(micros) + (col("event_id") - 1) * 1000000L)
        .cast(TimestampNTZType))
    assert(loadedMicros(dir) == expected)
  }

  test("LONG nanos (legacy nanosAsLong surface) floors to micros") {
    val dir = Files.createTempDirectory("phys-long").toString
    // TIMESTAMP(NANOS) parquet reads as LongType under nanosAsLong; writing
    // a LongType column exercises the identical loader branch. Add 500 ns
    // to verify floor-truncation to micros (DuckDB's behavior).
    writeEvents(dir, (lit(micros) + (col("event_id") - 1) * 1000000L) * 1000L + 500L)
    assert(loadedMicros(dir) == expected)
  }

  test("embeddings shipped as list<double> normalize to array<float>") {
    val dir = Files.createTempDirectory("phys-emb").toString
    import spark.implicits._
    Seq((1L, Seq(0.25, -1.5), 0), (2L, Seq(3.75, 0.5), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.load(spark, dir, "embeddings")
    assert(df.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    // the float-typed codegen path must accept it end-to-end
    val d = df.select(graft.operators.Similarity
      .norm(col("embedding")).as("n")).orderBy("n").collect()
    assert(math.abs(d.head.getDouble(0) - math.sqrt(0.25 * 0.25 + 1.5 * 1.5))
      < 1e-6)
  }

  test("orders/lineitem date columns normalize too") {
    val dir = Files.createTempDirectory("phys-orders").toString
    import spark.implicits._
    Seq((1L, 10.0)).toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderdate", timestamp_micros(lit(micros)).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.load(spark, dir, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampType)
    assert(df.select(unix_micros(col("o_orderdate"))).head().getLong(0) == micros)
  }
}
