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
    * get previous_hash = "" (Block.cs:17). `seeds` chains a batch onto an
    * existing store: a key's first row links to its seeded frontier hash
    * instead of genesis (how `BlockCollection.Insert` reads the last
    * block's hash before appending, BlockCollection.cs:53-66).
    */
  def build(spark: SparkSession, df: DataFrame, keyCol: String,
      tsMicrosCol: String, tieCol: String, dataCol: String,
      seeds: Map[String, String] = Map.empty): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("previous_hash", StringType), StructField("hash", StringType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val kIdx = df.schema.fieldIndex(keyCol)
    val tsIdx = df.schema.fieldIndex(tsMicrosCol)
    val tieIdx = df.schema.fieldIndex(tieCol)
    val dIdx = df.schema.fieldIndex(dataCol)
    df.groupByKey(r => r.get(kIdx).toString)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (key, rows) =>
        val sorted = rows.toSeq.sortBy(r => (r.getLong(tsIdx), r.getLong(tieIdx)))
        var prev = seeds.getOrElse(key, "")
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

  /** Checkpointed-cursor verify: check ONLY rows appended after each
    * key's last verified position instead of recomputing the whole
    * chain per pass — the reference re-verifies everything every time
    * (`BlockCollection.cs:138-162`), which an append-only audit table
    * outgrows. The cursor row carries each key's verified-frontier
    * (ts, tie, hash); the first new row's `previous_hash` is checked
    * against that frontier hash, so rewriting history at or before the
    * frontier still trips the first incremental pass (link breaks), and
    * tampering inside the new suffix trips `hash_valid`/`link_valid`
    * exactly as the full verify would. Chain integrity BEHIND the
    * frontier was already attested by the pass that produced the cursor
    * — that is the checkpoint contract.
    *
    * Scale shape: the cursor is one bounded row per key (broadcast);
    * the verified prefix is filtered out before the window, so each
    * pass costs O(new rows), and with a ts-partitioned chain table the
    * frontier predicate prunes old partitions at the scan.
    */
  def verifyIncremental(chain: DataFrame, cursor: DataFrame, keyCol: String,
      tsMicrosCol: String, tieCol: String, dataCol: String): DataFrame = {
    val cur = cursor.select(col(keyCol), col("cur_ts"), col("cur_tie"),
      col("cur_hash"))
    val joined = chain.join(broadcast(cur), Seq(keyCol), "left")
    val fresh = joined.filter(col("cur_ts").isNull ||
      col(tsMicrosCol) > col("cur_ts") ||
      (col(tsMicrosCol) === col("cur_ts") && col(tieCol) > col("cur_tie")))
    val w = Window.partitionBy(keyCol).orderBy(col(tsMicrosCol), col(tieCol))
    val recomputed = sha2(concat_ws("-",
      col(tsMicrosCol).cast("string"), col("previous_hash"),
      coalesce(col(dataCol).cast("string"), lit("null"))), 256)
    fresh
      .withColumn("hash_valid", recomputed === col("hash"))
      .withColumn("link_valid",
        coalesce(lag(col("hash"), 1).over(w),
          coalesce(col("cur_hash"), lit(""))) === col("previous_hash"))
      .drop("cur_ts", "cur_tie", "cur_hash")
  }

  /** The verified-frontier cursor of a (fully or incrementally) verified
    * chain: per key, the (ts, tie, hash) of the newest row. Feed the
    * result of one pass into the next `verifyIncremental`.
    */
  def cursorFrom(chain: DataFrame, keyCol: String, tsMicrosCol: String,
      tieCol: String): DataFrame =
    chain.groupBy(col(keyCol))
      .agg(max(struct(col(tsMicrosCol), col(tieCol), col("hash")))
        .as("_frontier"))
      .select(col(keyCol),
        col("_frontier").getField(tsMicrosCol).as("cur_ts"),
        col("_frontier").getField(tieCol).as("cur_tie"),
        col("_frontier").getField("hash").as("cur_hash"))
}
