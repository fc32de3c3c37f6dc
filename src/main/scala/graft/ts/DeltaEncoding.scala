package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-of-timestamp encoding (the reference's BaseDeltaT storage shape,
  * `TimeSeries/BaseDeltaT/DeltaT.cs:14-26`: per 20-day group, timestamps
  * stored as deltas from the previous point).
  *
  * In this engine parquet's own encodings make this unnecessary for
  * storage — these operators exist for (a) wire-format compatibility with
  * reference exports and (b) compact shuffle payloads when a whole series
  * travels as one row. Encode groups per (key, group) where
  * group = days-since-epoch / groupDays; decode restores exact rows.
  */
object DeltaEncoding {

  /** (key, ts_us, value) -> (key, group, base_us, deltas, values): per
    * group, sorted timestamps as base + deltas-from-previous.
    */
  def encode(df: DataFrame, keyCol: String, tsUsCol: String,
      valueCol: String, groupDays: Int = 20): DataFrame = {
    val groupUs = groupDays.toLong * 86400L * 1000000L
    df.select(col(keyCol).as("key"), col(tsUsCol).as("ts_us"),
        col(valueCol).as("value"))
      .withColumn("group", (col("ts_us") / groupUs).cast("long"))
      .groupBy("key", "group")
      .agg(sort_array(collect_list(struct(col("ts_us"), col("value"))))
        .as("pts"))
      .select(col("key"), col("group"),
        element_at(col("pts"), 1).getField("ts_us").as("base_us"),
        expr("""transform(pts, (p, i) ->
          p.ts_us - if(i = 0, element_at(pts, 1).ts_us, pts[i - 1].ts_us))""")
          .as("deltas"),
        expr("transform(pts, p -> p.value)").as("values"))
  }

  /** Inverse of encode: (key, group, base_us, deltas, values) ->
    * (key, ts_us, value) rows. Reconstruction is a running sum over the
    * delta array (positions are cumulative sums).
    */
  def decode(df: DataFrame): DataFrame =
    df.select(col("key"), col("base_us"),
        // offsets = cumulative sums of deltas (quadratic in group size —
        // groups are wire-format payloads, not unbounded partitions)
        expr("""transform(deltas, (d, i) ->
          aggregate(slice(deltas, 1, i + 1), 0L, (acc, x) -> acc + x))""")
          .as("offsets"),
        col("values"))
      .select(col("key"), col("base_us"),
        explode(arrays_zip(col("offsets"), col("values"))).as("z"))
      .select(col("key"),
        (col("base_us") + col("z.offsets")).as("ts_us"),
        col("z.values").as("value"))
}
