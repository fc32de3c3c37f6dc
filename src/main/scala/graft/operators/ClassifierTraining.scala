package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed training steps for a fasttext-shaped document-quality
  * classifier (the Brown et al. 2020 / Du et al. 2022 curation pattern:
  * score every document against a small supervised model, keep the
  * high-scoring tail).
  *
  * One full-batch logistic-regression gradient step is a single
  * map + one global aggregation — the exact shape that scales to 100 TB
  * (partial aggregation map-side, 4 longs per partition crossing the
  * wire). The driver loop (epochs) stays O(model size), never O(data).
  *
  * Determinism contract (oracle-checkable):
  *   - the squash is the rational "fast sigmoid" 0.5 + 0.5·z/(1+|z|) —
  *     +,*,/,abs only, bit-identical on every IEEE-754 engine, unlike
  *     exp()/log() which are not correctly rounded across libms;
  *   - per-row gradient contributions are quantized to integer
  *     nano-units and summed as longs, so partition order can never
  *     flip a low bit (same trick as q88's ppb frequencies).
  */
object ClassifierTraining {

  /** One full-batch gradient step. `feats` must carry a 0/1 double
    * `labelCol` and the double feature columns `xCols` (bias handled
    * here). Returns a single row: n, grad_bias, grad_<x>..., and the
    * updated weights w_bias, w_<x>... after `w - lr * grad`.
    */
  def logregGradientStep(feats: DataFrame, labelCol: String,
      xCols: Seq[String], weights: Seq[Double], lr: Double): DataFrame = {
    require(weights.length == xCols.length + 1,
      s"need ${xCols.length + 1} weights (bias first), got ${weights.length}")
    val z = xCols.zip(weights.tail).foldLeft(lit(weights.head)) {
      case (acc, (x, w)) => acc + (lit(w) * col(x))
    }
    val p = lit(0.5) + (lit(0.5) * (z / (lit(1.0) + abs(z))))
    val resid = p - col(labelCol)
    val xs = lit(1.0) +: xCols.map(col)
    val names = "bias" +: xCols
    val nanoCols = xs.zip(names).map { case (x, n) =>
      round((resid * x) * lit(1e9), 0).cast("long").as(s"nb_$n")
    }
    val agged = feats.select(nanoCols: _*)
      .agg(count(lit(1)).as("n"),
        names.map(n => sum(col(s"nb_$n")).as(s"s_$n")): _*)
    val out = names.zip(weights).flatMap { case (n, w) =>
      val grad = col(s"s_$n").cast("double") / (col("n") * lit(1e9))
      Seq(round(grad, 6).as(s"grad_$n"),
        round(lit(w) - (lit(lr) * grad), 6).as(s"w_$n"))
    }
    agged.select(col("n") +: out: _*)
  }
}
