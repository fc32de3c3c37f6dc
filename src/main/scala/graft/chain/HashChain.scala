package graft.chain

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audit hash chain (SURVEY §2.5 / `Iot.Database/Blockchain/Block.cs:24-38`,
  * `BlockCollection.cs:138-162`): each row's hash covers
  * `"{ts}-{previous_hash}-{data}"` where previous_hash is the predecessor's
  * *final* hash — inherently sequential within a chain.
  *
  * Scale model: chains are per point/key; the build folds each key's rows
  * sequentially inside one task (groupByKey → flatMapGroups), so the job
  * parallelizes across keys — the same contract as the reference, which
  * serializes per collection. Verification is non-recursive (recompute from
  * stored fields + check the lag link) and runs as a pure window pass.
  */
object HashChain {

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Build the chain over (key, tsMicros, data) rows, ordered by
    * (tsMicros, tie). Output adds `previous_hash` and `hash`; genesis rows
    * get previous_hash = "" (Block.cs:17).
    */
  def build(spark: SparkSession, df: DataFrame, keyCol: String,
      tsMicrosCol: String, tieCol: String, dataCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("previous_hash", StringType), StructField("hash", StringType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val kIdx = df.schema.fieldIndex(keyCol)
    val tsIdx = df.schema.fieldIndex(tsMicrosCol)
    val tieIdx = df.schema.fieldIndex(tieCol)
    val dIdx = df.schema.fieldIndex(dataCol)
    df.groupByKey(r => r.get(kIdx).toString)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (_, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r.getLong(tsIdx), r.getLong(tieIdx)))
        var prev = ""
        sorted.iterator.map { r =>
          val h = sha256Hex(s"${r.getLong(tsIdx)}-$prev-${r.get(dIdx)}")
          val out = Row.fromSeq(r.toSeq ++ Seq(prev, h))
          prev = h
          out
        }
      }
  }

  /** Verify a built chain distributively: recompute each row's hash from
    * its stored fields and check (a) it equals the stored hash and (b) the
    * stored previous_hash equals the predecessor's stored hash. A tampered
    * row flips its own `hash_valid` (and its successor's `link_valid` if
    * the hash itself was rewritten).
    */
  def verify(chain: DataFrame, keyCol: String, tsMicrosCol: String,
      tieCol: String, dataCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsMicrosCol), col(tieCol))
    // coalesce to the literal "null": build hashes a null payload as the
    // interpolated string "null", while concat_ws silently DROPS null
    // columns — without this, every null-data row false-alarms as tampered
    val recomputed = sha2(concat_ws("-",
      col(tsMicrosCol).cast("string"), col("previous_hash"),
      coalesce(col(dataCol).cast("string"), lit("null"))), 256)
    chain
      .withColumn("hash_valid", recomputed === col("hash"))
      .withColumn("link_valid",
        coalesce(lag(col("hash"), 1).over(w), lit("")) === col("previous_hash"))
  }
}
