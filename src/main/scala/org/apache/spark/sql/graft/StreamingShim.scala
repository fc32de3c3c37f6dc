package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow

/** The sink half of the V1 streaming bridge. (The SOURCE half —
  * `internalCreateDataFrame(isStreaming = true)` — is gone: the
  * change-feed source is a DataSource V2 `MicroBatchStream` now and
  * produces partitions through the public connector API.)
  */
object StreamingShim {
  /** For a V1 `Sink.addBatch`: the engine hands the batch as a
    * STREAMING-flagged frame, which refuses ordinary batch actions —
    * re-wrap it exactly the way ForeachBatchSink does. The V1 `Sink`
    * stays the right API for this sink because `applyChanges` is a
    * whole-batch DataFrame transaction (the same reason Delta's
    * streaming sink is V1).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}

/** RDD-level access to a DataFrame's executed plan (`queryExecution`
  * lives on the `classic` implementation, not the abstract API class).
  * Used by the V2 micro-batch staging writer, which needs the rows as
  * `InternalRow` to serialize them in UnsafeRow wire format.
  */
object RddShim {
  def toInternalRowRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .queryExecution.toRdd
}

/** Session-conf introspection (`sessionState` is `private[sql]`). */
object ConfShim {
  /** True when `key` was EXPLICITLY set on this session — set via
    * `spark.conf.set`, builder `.config`, or `--conf` — as opposed to
    * resolving through the conf's default. `RuntimeConfig` cannot make
    * that distinction (its get resolves defaults), but respecting an
    * explicit user choice that HAPPENS to equal a default we would
    * otherwise override requires it.
    */
  def isSetByUser(spark: org.apache.spark.sql.SparkSession,
      key: String): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.contains(key)
}

/** Column ↔ Expression bridging (`classic.ExpressionUtils` is
  * `private[sql]`) — the two conversions a custom Catalyst expression
  * needs to surface as a user-facing Column without a registry round
  * trip.
  */
object ExprShim {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
