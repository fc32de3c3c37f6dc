package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types.StructType

/** Hadoop `Configuration` is not `Serializable`; this is the standard
  * write/readFields envelope so executors inherit the DRIVER's resolved
  * filesystem configuration (checkpoint dirs can live on any Hadoop FS,
  * not just file://).
  */
final class SerializableHadoopConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** One staged micro-batch file: a stream of `[len:int32][UnsafeRow
  * bytes]` records, self-contained given the field count.
  */
final case class StagedPartition(path: String, numFields: Int)
    extends InputPartition

/** The DSv2 bridge for a DATAFRAME-SHAPED streaming source.
  *
  * A `MicroBatchStream` must hand the engine executor-side
  * `PartitionReader[InternalRow]`s, but the change feed's batch is a
  * composed distributed query (two masked scans + a multiset diff) —
  * it cannot be expressed as independent per-partition readers. So
  * each admitted batch is materialized ONCE by a distributed job into
  * length-prefixed UnsafeRow stream files under the stream's
  * checkpoint directory, and the partition readers replay those bytes.
  * UnsafeRow is the engine's own wire format (every type, nested or
  * not, round-trips byte-exactly), so this needs no per-type
  * conversion code and no parquet reader re-implementation.
  *
  * Scale posture: the staging write is churn-sized, BOUNDED by the
  * source's admission control (`maxVersionsPerTrigger` /
  * `maxFilesPerTrigger`), written by executors in parallel to the
  * checkpoint filesystem, and deleted as soon as the engine commits
  * the batch — the cost of the public connector API over the removed
  * `internalCreateDataFrame` shim is one extra write+read of each
  * batch's rows, never of the table.
  */
object UnsafeRowStage {

  /** Materialize `df` as UnsafeRow stream files under `dir` (one per
    * non-empty partition; the directory is recreated, so re-planning a
    * batch after a failure is idempotent) and return the partitions.
    */
  def write(df: DataFrame, dir: String, schema: StructType)
      : Array[InputPartition] = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(hconf)
    fs.delete(dirPath, true)
    fs.mkdirs(dirPath)
    val ser = new SerializableHadoopConf(hconf)
    val nf = schema.length
    val files = graft.core.JobLabel(spark, "feed batch stage") {
      org.apache.spark.sql.graft.RddShim.toInternalRowRdd(df)
      .mapPartitionsWithIndex { (idx, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          // attempt-unique name: a speculative/zombie retry of this
          // partition writes its OWN file — the driver's collect()
          // returns exactly the successful attempts' names, so a torn
          // concurrent write of the same path can never be replayed
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val p = new Path(dir, f"part-$idx%05d-a$attempt.urs")
          val out = new DataOutputStream(new BufferedOutputStream(
            p.getFileSystem(ser.value).create(p, true), 1 << 16))
          // operators reuse row objects and may emit non-Unsafe rows
          // (columnar scans); canonicalize through one projection
          val toUnsafe = UnsafeProjection.create(schema)
          val buf = new Array[Byte](1 << 12)
          try rows.foreach { r =>
            val u = r match {
              case u: UnsafeRow => u
              case other        => toUnsafe(other)
            }
            out.writeInt(u.getSizeInBytes)
            u.writeToStream(out, buf)
          } finally out.close()
          Iterator.single(p.toString)
        }
      }.collect() // file NAMES only — never rows
    }
    files.map(f => StagedPartition(f, nf): InputPartition)
  }

  /** Delete a staged batch directory (post-commit cleanup). */
  def drop(dir: String, hconf: Configuration): Unit = {
    val p = new Path(dir)
    p.getFileSystem(hconf).delete(p, true)
  }
}

/** Replays `[len][UnsafeRow bytes]` records; the row buffer is reused
  * per record (the Kafka source's converter does the same — the engine
  * copies when it buffers).
  */
final class StagedReaderFactory(hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[StagedPartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(sp.path)
      private val in = new DataInputStream(new BufferedInputStream(
        path.getFileSystem(hconf.value).open(path), 1 << 16))
      private val row = new UnsafeRow(sp.numFields)
      private var buf = new Array[Byte](1 << 12)
      private var done = false

      override def next(): Boolean = {
        if (done) return false
        val len =
          try in.readInt()
          catch { case _: EOFException => done = true; -1 }
        if (len < 0) false
        else {
          if (buf.length < len) buf = new Array[Byte](len)
          in.readFully(buf, 0, len)
          row.pointTo(buf, len)
          true
        }
      }
      override def get(): InternalRow = row
      override def close(): Unit = in.close()
    }
  }
}
