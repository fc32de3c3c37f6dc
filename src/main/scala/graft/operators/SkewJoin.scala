package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting — the manual fallback for the
  * 100 TB case where AQE's skew-join split does not apply (e.g. the skewed
  * side feeds an aggregation, or the join is with a mid-sized table that
  * cannot broadcast).
  *
  * The hot-keyed left side gets a random salt in [0, buckets); the right
  * side is replicated once per salt value. One shuffle on (key, salt)
  * spreads a hot key over `buckets` reducers. Row multiplicity is
  * unchanged, so any aggregate computed after the join is exact.
  */
object SkewJoin {

  /** Inner equi-join `left.key = right.key` with the left side salted.
    * `buckets` bounds the replication factor of the right side (keep
    * right small-ish: |right| × buckets rows are shuffled).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Detect hot keys: keys whose row count exceeds `threshold` times the
    * mean — the planning input for manual salting or key isolation.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Double = 10.0): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
    // avg over zero groups is null; an empty input has no hot keys
    // (getDouble on the null would NPE)
    val mean = Option(counts.agg(avg(col("n"))).head().get(0))
      .map(_.asInstanceOf[Double]).getOrElse(0.0)
    if (mean == 0.0) counts.limit(0).withColumn("skew_factor", lit(0.0))
    else counts.filter(col("n") > mean * threshold)
      .withColumn("skew_factor", round(col("n") / mean, 2))
  }
}
