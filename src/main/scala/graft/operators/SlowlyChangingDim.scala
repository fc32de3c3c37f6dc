package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history build: turn a change/event stream into versioned
  * dimension rows with [valid_from, valid_to) intervals — the standard
  * warehouse companion to the reference's versioned file store (every
  * check-in keeps the full history; here every attribute change does).
  *
  * Scale shape (100 TB): both passes (change collapse, interval
  * assignment) are windows over the SAME key partitioning, so the
  * stream shuffles once on the dimension key and the sorts are
  * per-key — embarrassingly parallel across keys, no global order
  * anywhere. The explicit `tiebreakCol` makes same-timestamp changes
  * deterministic (a requirement for reproducible history, not just for
  * the oracle).
  */
object SlowlyChangingDim {

  /** Collapse consecutive no-op changes, then assign each surviving
    * change its validity interval and version number.
    * Returns the input's key/attr columns + (valid_from = tsCol value,
    * valid_to = next change's ts or null, version, is_current).
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String, tiebreakCol: String): DataFrame = {
    val ord: Seq[Column] = Seq(col(tsCol), col(tiebreakCol))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val collapsed = changes
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_prev").isNull || !(col("_prev") === attrs))
      .drop("_prev")
    collapsed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          col("is_current")): _*)
  }
}
