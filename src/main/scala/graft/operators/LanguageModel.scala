package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model scoring — the CCNet-style "does a
  * target-domain LM like this text" quality gate, one order up from the
  * unigram stand-in (q88). P(w2|w1) = lambda * c(w1 w2)/c(w1 .) +
  * (1-lambda) * c(. w2)/T, all counts taken over the bigram stream.
  *
  * Determinism contract: probabilities are ppb-quantized LONGs computed
  * from integer counts with a fixed operation order (no log(), no
  * order-dependent double sums) — the per-doc rollup sums longs, which is
  * partition-order independent, exactly the q88/q98 convention.
  *
  * Scale shape (100 TB): bigram emission is a pure map-side transform
  * (each doc emits its own adjacent pairs — no window, no self-join). The
  * model tables are bounded by the bigram/unigram VOCABULARY, not the
  * corpus: c12 shuffles once on (w1, w2), c1 once on w1, T is a 1-row
  * broadcast. Scoring re-joins the bigram stream against the model on its
  * natural key; AQE broadcasts when the model is small and hash-joins
  * co-partitioned otherwise. Nothing collects to the driver.
  */
object LanguageModel {

  /** Adjacent-pair stream: one row per in-document bigram, map-side only.
    * Docs with fewer than two tokens emit nothing.
    */
  def bigrams(docs: DataFrame, idCol: String, toksCol: Column): DataFrame =
    docs.select(col(idCol), toksCol.as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(1), size(col("_t")) - 1),
          i => struct(element_at(col("_t"), i).as("w1"),
            element_at(col("_t"), i + 1).as("w2")))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))

  /** ppb-quantized interpolated bigram probabilities: (w1, w2, prob_ppb).
    * `lambdaPpb` is the interpolation weight on the bigram term, in ppb
    * (e.g. 700000000L = 0.7).
    *
    * The corpus-sized bigram stream aggregates ONCE (into c12); the
    * marginals c(w1 .), c(. w2) and the total are rollups of that
    * vocab-bounded table — identical counts, three fewer corpus passes.
    */
  def bigramProbs(bg: DataFrame, lambdaPpb: Long): DataFrame = {
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val total = c12.agg(sum(col("c12")).as("t_bg"))
    c12.join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        round(lit(lambdaPpb.toDouble) * col("c12") / col("c1") +
          lit((1000000000L - lambdaPpb).toDouble) * col("c2") / col("t_bg"))
          .cast("long").as("prob_ppb"))
  }

  /** Per-document LM score: mean interpolated bigram probability and the
    * share of bigrams below `lowPpb` (the perplexity-proxy drop signal).
    *
    * Memory shape: the bigram stream is EXPLICITLY hash-partitioned on
    * its key BEFORE the c12 aggregation and the scoring join, at a
    * width scaled to the INPUT SIZE (one partition per ~64 KB of
    * estimated source bytes — near one per MB of raw text at parquet's
    * usual text compression; clamped to [session shuffle partitions, 2048];
    * `spark.graft.lm.bigramPartitions` overrides). Two effects that
    * matter once the distinct-bigram space outgrows the heap (measured
    * at sf10 under the 8 GB harness heap):
    *   - the aggregation runs WHERE the data already sits — no
    *     map-side partial hash map over unclustered input, and the
    *     per-partition final map holds keySpace/width entries, a bound
    *     the width controls (AQE never coalesces an explicit
    *     numPartitions repartition, so the bound holds at runtime);
    *   - the c12 aggregation and the scoring join consume the SAME
    *     exchange (ReuseExchange), so the corpus-sized explode is
    *     computed once, not twice, and the join needs no re-shuffle of
    *     the stream side.
    * Size-scaled (not fixed-wide) because a fixed 256-wide exchange
    * measured 2.6× pure task overhead at bench scale, while 32-wide at
    * sf10 is exactly the heap-pressure case this exists to remove.
    */
  def score(docs: DataFrame, idCol: String, toksCol: Column,
      lambdaPpb: Long = 700000000L, lowPpb: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    // one partition per ~64 KB of (compressed) source — text compresses
    // ~10-30x, so this lands near one partition per MB of raw text;
    // over-partitioning is the safe direction (ms of task overhead vs
    // heap pressure). Below the session shuffle width the explicit
    // exchange buys nothing: keep the legacy plan and its AQE freedom
    // (broadcast the model, no forced stream shuffle).
    val width = spark.conf.get("spark.graft.lm.bigramPartitions", "").trim match {
      case "" =>
        val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
        (bytes / (64L << 10)).min(BigInt(2048)).toInt
      case s => s.toInt
    }
    val bg0 = bigrams(docs, idCol, toksCol)
    val bg =
      if (width > spark.sessionState.conf.numShufflePartitions)
        bg0.repartition(width, col("w1"), col("w2"))
      else bg0
    bg.join(bigramProbs(bg, lambdaPpb), Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("prob_ppb")).as("sum_ppb"),
        sum(when(col("prob_ppb") < lowPpb, 1L).otherwise(0L)).as("n_low"))
      .select(col(idCol), col("n_bigrams"),
        round(col("sum_ppb").cast("double") /
          (col("n_bigrams") * lit(1e9)), 6).as("mean_prob"),
        round(col("n_low").cast("double") /
          col("n_bigrams").cast("double"), 6).as("low_frac"))
  }
}
