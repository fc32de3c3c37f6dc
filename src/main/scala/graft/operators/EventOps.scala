package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream operators shared by the catalog (q121/q123), the
  * streaming twins, and library users: the ordered-funnel fold and the
  * compacted banded range join. Both are written so the expensive step
  * is a keyed shuffle — never a nested loop or a driver pass.
  */
object EventOps {

  /** Ordered 3-stage funnel with strict forward progression: per user,
    * t1 = min ts of stage-1, t2 = min stage-2 ts AFTER t1, t3 = min
    * stage-3 ts AFTER t2. ONE shuffle: events group to their user,
    * sort_array orders the history, an aggregate() fold advances the
    * stage machine. Columns expected: `userCol`, `usCol` (epoch micros),
    * `idCol` (unique tiebreak), `typeCol`.
    *
    * Output: (userCol, reached_stage, t1_us, t2_us, t3_us).
    */
  def funnel(events: DataFrame, stages: (String, String, String),
      userCol: String = "user_id", usCol: String = "us",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    val (s1, s2, s3) = stages
    val init = struct(lit(0).as("stage"),
      lit(null).cast("long").as("t1"), lit(null).cast("long").as("t2"),
      lit(null).cast("long").as("t3"))
    def step(acc: Column, e: Column): Column =
      when(acc.getField("stage") === 0 && e.getField("event_type") === s1,
        struct(lit(1).as("stage"), e.getField("us").as("t1"),
          lit(null).cast("long").as("t2"), lit(null).cast("long").as("t3")))
      .when(acc.getField("stage") === 1 && e.getField("event_type") === s2 &&
            e.getField("us") > acc.getField("t1"),
        struct(lit(2).as("stage"), acc.getField("t1").as("t1"),
          e.getField("us").as("t2"), lit(null).cast("long").as("t3")))
      .when(acc.getField("stage") === 2 && e.getField("event_type") === s3 &&
            e.getField("us") > acc.getField("t2"),
        struct(lit(3).as("stage"), acc.getField("t1").as("t1"),
          acc.getField("t2").as("t2"), e.getField("us").as("t3")))
      .otherwise(acc)
    events
      .filter(col(typeCol).isin(s1, s2, s3))
      .select(col(userCol), col(usCol).as("us"), col(idCol).as("event_id"),
        col(typeCol).as("event_type"))
      .groupBy(userCol)
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .withColumn("f", aggregate(col("evs"), init, step))
      .select(col(userCol),
        col("f.stage").as("reached_stage"), col("f.t1").as("t1_us"),
        col("f.t2").as("t2_us"), col("f.t3").as("t3_us"))
  }

  /** N-stage generalization of [[funnel]]: the state is the array of
    * stage timestamps taken so far (size = reached stage), advanced when
    * the next stage's type arrives strictly after the last taken time.
    * Same single-shuffle shape; stage count is a query constant, so the
    * fold stays a codegen-friendly array expression.
    *
    * Output: (userCol, reached_stage, stage_ts — array of epoch-micros,
    * one per reached stage, in order).
    */
  def funnelN(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", usCol: String = "us",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val stageArr = array(stages.map(lit): _*)
    def step(acc: Column, e: Column): Column =
      when(size(acc) < stages.size &&
           e.getField("event_type") === element_at(stageArr, size(acc) + 1) &&
           (size(acc) === 0 ||
             e.getField("us") > element_at(acc, -1)),
        concat(acc, array(e.getField("us"))))
      .otherwise(acc)
    events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol), col(usCol).as("us"), col(idCol).as("event_id"),
        col(typeCol).as("event_type"))
      .groupBy(userCol)
      .agg(sort_array(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .withColumn("f",
        aggregate(col("evs"), array().cast("array<long>"), step))
      .select(col(userCol), size(col("f")).as("reached_stage"),
        col("f").as("stage_ts"))
  }

  /** Per-group z-score outlier counts (q134): values quantize to 4dp
    * BIGINTs so the moments are exact integers; the double formula
    * ((sq - s*s/n) / (n-1), IEEE sqrt) is deterministic across engines.
    * Zero-variance and single-row groups report ZERO outliers — an
    * unguarded |z| > t would flag a constant group 100% outlier, because
    * z is NaN there and Spark orders NaN above every number. The
    * per-group stats broadcast back, so scoring is a map-side pass.
    */
  def zscoreOutlierCounts(events: DataFrame, typeCol: String,
      valueCol: String, threshold: Double = 2.5): DataFrame = {
    // null measurements are ignored entirely: counting them in n while
    // sum skips them would shift every mean/std in the group
    val ev = events.filter(col(valueCol).isNotNull).select(col(typeCol),
      round(col(valueCol) * 10000, 0).cast("long").as("v4"))
    val stats = ev.groupBy(typeCol)
      .agg(count(lit(1)).as("n"),
        sum(col("v4").cast("decimal(28,0)")).as("s"),
        // square in DECIMAL: a LONG v4*v4 overflows (ANSI throw) once
        // |value| passes ~3e5
        sum(col("v4").cast("decimal(19,0)") *
          col("v4").cast("decimal(19,0)")).as("sq"))
      .select(col(typeCol), col("n"),
        (col("s").cast("double") / col("n")).as("mean4"),
        // try_divide: ANSI mode throws DIVIDE_BY_ZERO on the n=1 group's
        // (n - 1) divisor; the null it returns instead is filtered by
        // the outlier guard below. greatest(0): catastrophic cancellation
        // can round a zero-variance group's sq - s^2/n to a TINY NEGATIVE
        // (large values, 4dp quantization) — DuckDB's SQRT hard-errors on
        // it, so both engines clamp identically and the group lands in
        // the std4 = 0 guard.
        sqrt(greatest(lit(0d), try_divide(col("sq").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"),
          col("n") - 1))).as("std4"))
    ev.join(broadcast(stats), typeCol)
      .withColumn("z", try_divide(
        col("v4").cast("double") - col("mean4"), col("std4")))
      .groupBy(col(typeCol), col("n"),
        round(col("mean4") / 10000.0, 6).as("mean_r"))
      // guard: zero-variance (std4 = 0 -> z null via try_divide) and
      // single-row (std4 null/NaN) groups report zero outliers
      .agg(count(when(col("std4").isNotNull && !isnan(col("std4")) &&
        col("std4") > 0 && abs(col("z")) > threshold, 1)).as("n_outliers"))
      .select(col(typeCol), col("n"), col("n_outliers"), col("mean_r"))
  }

  /** Count, per key row, the values of `right` falling within
    * [min(x*loFactor, x*hiFactor), max(x*loFactor, x*hiFactor)] of the
    * key's `x` (the min/max normalization makes negative `x`, which
    * inverts the two products, count its true interval) — a non-equi
    * range join
    * WITHOUT a nested loop. Both sides compact to distinct values with
    * multiplicity weights, the join runs on a grid of width `width`, and
    * per-value counts map back with one equi-join. Cost scales with
    * distinct-value pairs, never row pairs. Each left value explodes to
    * exactly the buckets its own interval spans — correctness never
    * depends on `width`, which only trades replication (small width,
    * more buckets per interval) against bucket occupancy (large width,
    * more residual-filter work per bucket).
    *
    * Output: `left` columns + `n_close` (inner: rows with zero matches
    * drop, mirroring a SQL inner range join).
    */
  def bandedRangeCount(left: DataFrame, leftValCol: String,
      right: DataFrame, rightValCol: String, width: Double,
      loFactor: Double, hiFactor: Double): DataFrame = {
    require(width > 0, "width must be positive")
    require(loFactor <= hiFactor, "loFactor must be <= hiFactor")
    val loB = floor(least(col(leftValCol) * loFactor,
      col(leftValCol) * hiFactor) / width).cast("long")
    val hiB = floor(greatest(col(leftValCol) * loFactor,
      col(leftValCol) * hiFactor) / width).cast("long")
    val distinctL = left.select(col(leftValCol)).distinct()
      .withColumn("_b", explode(sequence(loB, hiB)))
    val weights = right
      .groupBy(col(rightValCol)).agg(count(lit(1)).as("_w"))
      .withColumn("_b", floor(col(rightValCol) / width).cast("long"))
    // residual filter bounds use least/greatest like the bucket bounds:
    // a negative left value inverts x*lo vs x*hi, and a plain BETWEEN on
    // the inverted interval is vacuously empty — the banding would then
    // generate the right buckets but the filter would drop every match
    val perValue = distinctL.join(weights, "_b")
      .filter(col(rightValCol).between(
        least(col(leftValCol) * loFactor, col(leftValCol) * hiFactor),
        greatest(col(leftValCol) * loFactor, col(leftValCol) * hiFactor)))
      .groupBy(col(leftValCol))
      .agg(sum(col("_w")).as("n_close"))
    left.join(perValue, leftValCol)
  }
}
