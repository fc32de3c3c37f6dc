package graft.model

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed aggregate building an IotValue 17-slot current state from a
  * stream/history of prioritized writes (SURVEY §2.10: custom
  * `Aggregator`; reference semantics: each write lands in its priority
  * slot, the latest write per slot wins — `IotValue.cs` setters +
  * `TsCollection` write-through).
  *
  * Deterministic: later (tsUs, tie) wins per slot, so the merge is
  * order-independent across partitions — safe as a distributed aggregate.
  */
object PrioritySlots {

  /** One prioritized write. `tie` breaks exact-timestamp collisions
    * (e.g. the event id).
    */
  final case class SlotWrite(priority: Int, value: String, tsUs: Long, tie: Long)

  /** Buffer: 17 slots of (value, tsUs, tie), null value = empty slot.
    * Arrays, mutated in place — the Aggregator contract permits mutating
    * and returning the buffer, and the immutable-Seq form costs three
    * 17-element copies per input row (it dominated q56's runtime).
    */
  final case class Buf(values: Array[String], tsUs: Array[Long], ties: Array[Long])

  final case class Slot(value: Option[String], tsUs: Option[Long])

  val aggregator: Aggregator[SlotWrite, Buf, Seq[Slot]] =
    new Aggregator[SlotWrite, Buf, Seq[Slot]] {
      override def zero: Buf = Buf(new Array[String](17),
        Array.fill(17)(Long.MinValue), Array.fill(17)(Long.MinValue))

      private def later(aTs: Long, aTie: Long, bTs: Long, bTie: Long): Boolean =
        aTs > bTs || (aTs == bTs && aTie > bTie)

      override def reduce(b: Buf, w: SlotWrite): Buf = {
        if (w.priority >= 1 && w.priority <= 17 && w.value != null) {
          val i = w.priority - 1
          if (b.values(i) == null || later(w.tsUs, w.tie, b.tsUs(i), b.ties(i))) {
            b.values(i) = w.value; b.tsUs(i) = w.tsUs; b.ties(i) = w.tie
          }
        }
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < 17) {
          if (b.values(i) != null && (a.values(i) == null ||
              later(b.tsUs(i), b.ties(i), a.tsUs(i), a.ties(i)))) {
            a.values(i) = b.values(i); a.tsUs(i) = b.tsUs(i); a.ties(i) = b.ties(i)
          }
          i += 1
        }
        a
      }

      override def finish(b: Buf): Seq[Slot] =
        (0 until 17).map(i =>
          if (b.values(i) == null) Slot(None, None)
          else Slot(Some(b.values(i)), Some(b.tsUs(i))))

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Slot]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Slot]]()
    }

  /** Build the per-key current state: (key, slots array<struct<value,
    * tsUs>>, resolved value + priority per IotValue.resolvePriority).
    * Input columns: keyCol, priority (int), value (string), tsUs (long),
    * tie (long).
    */
  def currentState(spark: SparkSession, df: DataFrame, keyCol: String): DataFrame = {
    import spark.implicits._
    val writes = df.select(col(keyCol).cast("long").as("key"),
      col("priority").cast("int"), col("value").cast("string"),
      col("tsUs").cast("long"), col("tie").cast("long"))
      .as[(Long, Int, String, Long, Long)]
    val agg = writes
      .groupByKey(_._1)
      .mapValues(r => SlotWrite(r._2, r._3, r._4, r._5))
      .agg(aggregator.toColumn.name("slots"))
      .toDF("key", "raw_slots")
    // rename struct fields (value, tsUs) -> (value, ts-like) for resolve
    val slots = expr("transform(raw_slots, s -> struct(s.value as value, s.tsUs as ts))")
    agg.select(col("key"), slots.as("slots"))
      .withColumn("resolved", IotValue.resolvePriority(col("slots")))
      .withColumn("priority", IotValue.resolvedPriorityIndex(col("slots")))
  }
}
