package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators re-expressing the reference's signature domain
  * (SURVEY §2.8, `Iot.Database/TimeSeries/TsCollection.cs`):
  * LOCF range read (TsCollection.cs:130-185), interval resample with
  * linear interpolation (TsCollection.cs:188-233), and the as-of join the
  * resample implies.
  *
  * All are single-shuffle window formulations: partition by series key,
  * order by event time. At 100 TB the shuffle is on the series key, so
  * cardinality(keys) bounds parallelism — high-cardinality keys (device
  * guid) are exactly the good case. No driver-side iteration anywhere.
  */
object TimeSeriesOps {

  /** Last-observation-carried-forward of `valueCol` within each `keyCol`
    * series ordered by `tsCol` (+ `tieCol` tiebreak): nulls take the most
    * recent non-null earlier value.
    */
  def locf(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** As-of join: for each left row, attach the latest right row with
    * `right.ts <= left.ts` for the same key. Implemented as a union +
    * single window pass (one shuffle on the key), not a per-row lookup —
    * the Spark-native form of the reference's nearest-before scan
    * (TsCollection.cs:195-229).
    *
    * Left must have (key, ts, leftId); right must have (key, ts) plus the
    * payload columns listed in `payload` (names must not collide with
    * left's).
    */
  def asofJoinBackward(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, leftIdCol: String,
      payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.select(
      Seq(col(keyCol), col(tsCol)) ++ payload.map(col): _*)
      .withColumn("_side", lit(0))
    val leftCols = left.columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => "<=" semantics
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).select(
      (leftCols.toIndexedSeq.map(col) ++ payload.map(col)): _*)
  }

  /** Resample each series onto a fixed grid of `stepSeconds`, carrying the
    * nearest-before observation and linearly interpolating numeric values
    * between the two neighbors — the reference's interval read
    * (`GetTimeSeries(start,end,interval)`, TsCollection.cs:188-233), with
    * `interpolated` marking grid points not exactly on an observation
    * (ValueInterpolated flag, IotValueFlags).
    *
    * Input: (key, ts, value). Output: (key, grid_ts, value, interpolated).
    * Grid spans each series' [min(ts), max(ts)] truncated to the step.
    */
  def resampleLinear(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      stepSeconds: Long): DataFrame = {
    val step = lit(stepSeconds)
    // per-series grid bounds — tiny aggregate, broadcast back via join
    val bounds = df.groupBy(keyCol).agg(
      min(unix_timestamp(col(tsCol))).as("_t0"),
      max(unix_timestamp(col(tsCol))).as("_t1"))
    // first tick = smallest step-multiple >= t0 (an on-grid first obs is a tick)
    val gridStart =
      expr(s"(_t0 + ${stepSeconds - 1}) DIV $stepSeconds") * step
    val grid = bounds.select(
      col(keyCol),
      // guard: a series shorter than one step yields an empty grid
      explode(when(gridStart <= col("_t1"),
        sequence(gridStart, col("_t1"), step))
        .otherwise(array().cast("array<long>"))).as("_gsec"))
      .select(col(keyCol), timestamp_seconds(col("_gsec")).as("grid_ts"))

    // union observations (side 0) with grid ticks (side 1); forward pass
    // carries last value/ts, backward pass carries next value/ts.
    val obs = df.select(col(keyCol), col(tsCol).as("_ts"),
      col(valueCol).cast("double").as("_v"), lit(0).as("_side"))
    val ticks = grid.select(col(keyCol), col("grid_ts").as("_ts"),
      lit(null).cast("double").as("_v"), lit(1).as("_side"))
    val u = obs.unionByName(ticks)

    val fw = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bw = Window.partitionBy(keyCol).orderBy(col("_ts").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val obsTs = when(col("_side") === 0, col("_ts"))
    val withPrev = u
      .withColumn("_pv", last(col("_v"), ignoreNulls = true).over(fw))
      .withColumn("_pt", last(obsTs, ignoreNulls = true).over(fw))
    val withNext = withPrev
      .withColumn("_nv", last(col("_v"), ignoreNulls = true).over(bw))
      .withColumn("_nt", last(obsTs, ignoreNulls = true).over(bw))

    val g = col("_ts")
    val exact = col("_pt") === g
    val lerp = col("_pv") +
      (col("_nv") - col("_pv")) *
        (unix_micros(g) - unix_micros(col("_pt"))).cast("double") /
        (unix_micros(col("_nt")) - unix_micros(col("_pt"))).cast("double")
    withNext.filter(col("_side") === 1)
      .select(
        col(keyCol),
        g.as("grid_ts"),
        when(exact, col("_pv"))
          .when(col("_nt").isNull, col("_pv"))        // after last obs: LOCF
          .when(col("_pt").isNull, lit(null))          // before first obs
          .otherwise(lerp).as("value"),
        // before the first obs `exact` is NULL (no prev ts) — such ticks
        // are still not exact samples, so interpolated must be true
        coalesce(!exact, lit(true)).as("interpolated"))
  }
}
