package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash48

/** Portable count-min sketch (Cormode & Muthukrishnan 2005) for
  * heavy-hitter estimation over unbounded key streams — the bounded-
  * memory companion to exact `groupBy(key).count` when the key space
  * (URLs, n-grams, user ids) outgrows a shuffle.
  *
  * Scale shape (100 TB): the sketch is `depth × width` counters built
  * by ONE bounded aggregation (partial sums combine map-side; at most
  * depth·width rows ever cross the wire, regardless of key
  * cardinality), and it is MERGEABLE — sketches of shards add
  * counter-wise, so incremental / distributed builds compose. Estimates
  * attach via a broadcast of the tiny sketch; the keyed side never
  * shuffles for the lookup.
  *
  * Positions are md5-derived (`hash48(j + "|" + key) % width`), so the
  * sketch — and every collision-driven overestimate — is bit-identical
  * on any engine with md5, keeping the operator oracle-checkable. The
  * estimate contract: `est >= exact` always (one-sided error), with
  * overestimates bounded by e·N/width at probability 1 - e^-depth.
  */
object Sketches {

  private def posOf(keyCol: String, j: Int, width: Int) =
    (hash48(concat(lit(s"$j|"), col(keyCol))) % width).cast("int")

  /** Explode each weighted key into its `depth` (row, pos) sketch
    * coordinates, carrying the weight.
    */
  private def coords(weighted: DataFrame, keyCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame =
    weighted.select(col(keyCol), col(weightCol),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("row"), posOf(keyCol, j, width).as("pos"))): _*))
        .as("e"))
      .select(col(keyCol), col(weightCol), col("e.row"), col("e.pos"))

  /** Build the sketch from a pre-aggregated (key, weight) table:
    * at most `depth * width` rows of (row, pos, c).
    */
  def cmsBuild(weighted: DataFrame, keyCol: String, weightCol: String,
      depth: Int, width: Int): DataFrame =
    coords(weighted, keyCol, weightCol, depth, width)
      .groupBy("row", "pos").agg(sum(col(weightCol)).as("c"))

  /** Attach `est` (the min over depth counters — never below the true
    * weight) to every key of `keys` via a broadcast of the sketch.
    * A coordinate the sketch never touched counts as 0 (left join +
    * coalesce), so a key absent from the stream estimates 0 instead of
    * being dropped or overestimated from its surviving coordinates.
    */
  def cmsEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val marked = keys.withColumn("_one", lit(1L))
    coords(marked, keyCol, "_one", depth, width)
      .join(broadcast(sketch), Seq("row", "pos"), "left")
      .groupBy(keyCol).agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }
}
