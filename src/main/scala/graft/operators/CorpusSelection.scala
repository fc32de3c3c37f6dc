package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the highest-quality documents
  * whose token counts fit a training budget — the final gate of a
  * curation pipeline ("give me the best N-token corpus").
  *
  * The naive shape — global sort by quality, running token cumsum, cut
  * at the budget — needs a TOTAL ORDER over the corpus: one partition
  * owns the running sum, which is exactly what cannot exist at 100 TB.
  * This operator trades doc-level cut precision for bucket granularity,
  * the standard large-scale pattern:
  *   - quality is quantized into `qualityBuckets` fixed buckets; bucket
  *     token totals (a bounded aggregate, <= qualityBuckets rows) pick
  *     the highest CUTOFF bucket that overflows the budget — everything
  *     above is selected wholesale;
  *   - the cutoff bucket alone is refined by a deterministic md5 hash
  *     sub-bucket (<= `subBuckets` more rows), selecting whole
  *     sub-buckets — an unbiased uniform sample of the boundary
  *     stratum — until the budget is exhausted.
  * Both decision tables are bounded by construction (like the IVF
  * centroid lists), so the two driver-side folds are O(buckets), never
  * O(corpus), and the final verdict is a broadcast-literal projection.
  * Selection lands within one sub-bucket (~1/subBuckets of one quality
  * stratum) of the exact budget.
  */
object CorpusSelection {

  /** `docs` must carry `qualityCol` in [0,1] and integer `tokenCol`.
    * Returns docs + (bucket, sub, selected); `selected` rows' token sum
    * is the largest bucket-granular total <= `budget`.
    */
  def selectToTokenBudget(docs: DataFrame, idCol: String, qualityCol: String,
      tokenCol: String, budget: Long, qualityBuckets: Int = 20,
      subBuckets: Int = 256): DataFrame = {
    // null quality ranks WORST (bucket -1, below every scored stratum):
    // unguarded, floor(null * b) is null and least() skips nulls, which
    // would land null-quality docs in the TOP bucket
    val bucketed = docs
      .withColumn("bucket",
        when(col(qualityCol).isNotNull, least(
          floor(col(qualityCol) * qualityBuckets).cast("int"),
          lit(qualityBuckets - 1)))
        .otherwise(lit(-1)))
      .withColumn("sub",
        (graft.functions.TextFunctions.hash48(col(idCol).cast("string"))
          % subBuckets).cast("int"))

    // bounded decision table 1: per-bucket token totals, best-first
    val bucketTotals = bucketed.groupBy("bucket")
      .agg(sum(col(tokenCol)).as("btoks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(-_._1)
    // sentinel must sit below the null-quality bucket (-1), which is a
    // real, selectable stratum
    var cum = 0L
    var cutoff = Int.MinValue
    var aboveTokens = 0L
    bucketTotals.foreach { case (b, t) =>
      if (cutoff == Int.MinValue) {
        if (cum + t > budget) { cutoff = b; aboveTokens = cum }
        else cum += t
      }
    }

    if (cutoff == Int.MinValue) {
      // the whole corpus fits the budget
      bucketed.withColumn("selected", lit(true))
    } else {
      // bounded decision table 2: sub-bucket refinement of the cutoff
      val remaining = budget - aboveTokens
      val subTotals = bucketed.filter(col("bucket") === cutoff)
        .groupBy("sub").agg(sum(col(tokenCol)).as("stoks"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
        .sortBy(_._1)
      var scum = 0L
      val selectedSubs = subTotals.takeWhile { case (_, t) =>
        scum += t; scum <= remaining
      }.map(_._1)
      bucketed.withColumn("selected",
        col("bucket") > cutoff ||
          (col("bucket") === cutoff &&
            col("sub").isin(selectedSubs.map(Integer.valueOf): _*)))
    }
  }
}
