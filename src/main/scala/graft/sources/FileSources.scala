package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks mirroring the reference's `$file_csv(...)` /
  * `$file_json(...)` system collections (SURVEY §2.1,
  * `LiteDB/Engine/SystemCollections/SysFileCsv.cs:20-78`, `SysFileJson.cs`):
  * header/delimiter/encoding options on CSV, array-of-docs JSON. Thin,
  * typed wrappers over Spark's readers — pushdown/pruning stay intact.
  */
object FileSources {

  final case class CsvOptions(
      header: Boolean = true, delimiter: String = ",",
      encoding: String = "UTF-8", inferSchema: Boolean = false)

  def readCsv(spark: SparkSession, path: String, opts: CsvOptions = CsvOptions(),
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter)
      .option("encoding", opts.encoding)
      .option("inferSchema", opts.inferSchema.toString)
    schema.map(r.schema).getOrElse(r).csv(path)
  }

  def writeCsv(df: DataFrame, path: String,
      opts: CsvOptions = CsvOptions()): Unit =
    df.write.mode("overwrite")
      .option("header", opts.header.toString)
      .option("sep", opts.delimiter)
      .option("encoding", opts.encoding)
      .csv(path)

  /** JSON lines (Spark-native). The reference writes one pretty array; at
    * scale line-delimited is the only shape that parallelizes, so that is
    * the contract here.
    */
  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC source/sink (beyond-reference: the reference stops at CSV/JSON).
    * ORC ships inside Spark itself, and at scale it matters for the same
    * reason parquet does: columnar + footer stats, so predicate pushdown
    * and column pruning survive the interchange (`PushedFilters` reaches
    * the OrcScan exactly as it does a parquet scan). Schema is passed
    * explicitly for the same reason as CSV: inference reads footers of
    * every file on the driver.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).orc(path)
  }

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
