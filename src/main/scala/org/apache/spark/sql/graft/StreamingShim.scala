package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SQLContext}

/** The one `private[sql]` door a V1 micro-batch `Source` needs: the
  * engine asserts that `getBatch`'s DataFrame carries
  * `isStreaming = true`, and the only way to stamp that flag is
  * `SparkSession.internalCreateDataFrame` — the same shim every
  * external V1 source (Kafka's original connector among them) ships.
  * Lives under `org.apache.spark.sql` solely for the access scope;
  * nothing else in the engine reaches Spark internals this way.
  */
object StreamingShim {
  /** `df`'s physical plan re-wrapped as a streaming DataFrame. */
  def asStreaming(ctx: SQLContext, df: DataFrame): DataFrame = {
    val session = ctx.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 `Sink.addBatch`: the engine hands the batch
    * as a STREAMING-flagged frame, which refuses ordinary batch
    * actions — re-wrap it exactly the way ForeachBatchSink does.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val session = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
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
