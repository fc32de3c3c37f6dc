package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory per-key top-N as a typed Aggregator — the scale-correct
  * form of `row_number().over(partitionBy(key)) <= n`.
  *
  * A ranking window materializes EVERY row of a key on one partition
  * before discarding all but n — at 100 TB a hot key (one language, one
  * domain) serializes onto a single task and spills. The Aggregator keeps
  * only the current best n per key, combines map-side (partial
  * aggregation), and ships n rows per key per partition across the wire —
  * the same partial/final split a sum gets, applied to selection.
  *
  * Ordering is (ord, id) ascending — a total order, so results are
  * deterministic under any partitioning (the id tiebreak is mandatory,
  * exactly like every top-k query in the catalog).
  */
object TopK {

  case class Entry(ord: Long, id: Long)

  /** Aggregation buffer/output: a product wrapper so the encoder stays
    * on the public Encoders.product API.
    */
  case class Top(entries: Seq[Entry])

  private class TopNAgg(n: Int) extends Aggregator[Entry, Top, Top] {
    private def lt(a: Entry, b: Entry): Boolean =
      a.ord < b.ord || (a.ord == b.ord && a.id < b.id)
    override def zero: Top = Top(Vector.empty)
    override def reduce(acc: Top, e: Entry): Top =
      if (acc.entries.length < n) Top((acc.entries :+ e).sortWith(lt))
      else if (lt(e, acc.entries.last))
        Top((acc.entries.init :+ e).sortWith(lt))
      else acc
    override def merge(a: Top, b: Top): Top =
      Top((a.entries ++ b.entries).sortWith(lt).take(n))
    override def finish(acc: Top): Top = acc
    override def bufferEncoder: Encoder[Top] = Encoders.product[Top]
    override def outputEncoder: Encoder[Top] = Encoders.product[Top]
  }

  /** Smallest-n rows per key by (ordCol, idCol) ascending. Returns one
    * row per kept (key, rank): keyCols ++ (rank, id, ord). `ordCol` and
    * `idCol` must cast to LONG (hash ranks and ids — the catalog idiom).
    */
  def topNPerKey(df: DataFrame, keyCols: Seq[String], ordCol: Column,
      idCol: Column, n: Int): DataFrame = {
    val agg = udaf(new TopNAgg(n), Encoders.product[Entry])
    df.select(keyCols.map(col) :+ ordCol.cast("long").as("_ord") :+
        idCol.cast("long").as("_id"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col("_ord"), col("_id")).as("_top"))
      .select(keyCols.map(col) :+
        posexplode(col("_top.entries")).as(Seq("_pos", "_e")): _*)
      .select(keyCols.map(col) :+ (col("_pos") + 1).cast("int").as("rank") :+
        col("_e.id").as("id") :+ col("_e.ord").as("ord"): _*)
  }
}
