package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Event-stream analytics over `events`: ordered funnels, retention
  * cohorts, last-touch attribution, co-occurrence mining, hopping
  * windows, and the banded (grid-bucketed) range join. These extend the
  * reference's time-series surface (SURVEY §2.8) with the product-
  * analytics shapes a query engine over event streams is expected to
  * answer; each is written so the expensive step is a keyed shuffle the
  * planner can scale, never a nested-loop or a driver-side pass.
  */
object EventQueries {

  private val US_PER_WEEK = 7L * 24 * 3600 * 1000000L

  val all: Seq[Q] = Seq(

    // Ordered funnel signup -> click -> purchase with strict forward
    // progression (t2 = min click AFTER t1, t3 = min purchase AFTER t2).
    // ONE shuffle: events group to their user, sort_array orders each
    // user's history, and an aggregate() fold advances the stage machine
    // — the classic scalable funnel (per-user state, linear scan) instead
    // of K self-joins. Per-user memory is the user's event history, which
    // a production funnel bounds with a time-range predicate pushed to
    // the scan.
    Q("q121_funnel_steps",
      (s, dir) => {
        val stages = Seq("signup", "click", "purchase")
        val init = struct(lit(0).as("stage"),
          lit(null).cast("long").as("t1"), lit(null).cast("long").as("t2"),
          lit(null).cast("long").as("t3"))
        Tables.load(s, dir, "events")
          .filter(col("event_type").isin(stages: _*))
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("event_type"))
          .groupBy("user_id")
          .agg(sort_array(collect_list(
            struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
          .withColumn("f", aggregate(col("evs"), init, (acc, e) =>
            when(acc.getField("stage") === 0 &&
                 e.getField("event_type") === "signup",
              struct(lit(1).as("stage"), e.getField("us").as("t1"),
                lit(null).cast("long").as("t2"), lit(null).cast("long").as("t3")))
            .when(acc.getField("stage") === 1 &&
                  e.getField("event_type") === "click" &&
                  e.getField("us") > acc.getField("t1"),
              struct(lit(2).as("stage"), acc.getField("t1").as("t1"),
                e.getField("us").as("t2"), lit(null).cast("long").as("t3")))
            .when(acc.getField("stage") === 2 &&
                  e.getField("event_type") === "purchase" &&
                  e.getField("us") > acc.getField("t2"),
              struct(lit(3).as("stage"), acc.getField("t1").as("t1"),
                acc.getField("t2").as("t2"), e.getField("us").as("t3")))
            .otherwise(acc)))
          .select(col("user_id"),
            col("f.stage").as("reached_stage"), col("f.t1").as("t1_us"),
            col("f.t2").as("t2_us"), col("f.t3").as("t3_us"))
      },
      Some("""WITH e AS (
          SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
          WHERE event_type IN ('signup', 'click', 'purchase')),
        s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
        SELECT u.user_id,
          CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
               WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS reached_stage,
          t1 AS t1_us, t2 AS t2_us, t3 AS t3_us
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)"""),
      "ordered conversion funnel via single-shuffle per-user fold (the " +
        "oracle's equivalent K-join form would be K shuffles at scale)"),

    // Weekly retention cohorts: cohort = Monday-truncated week of the
    // user's first event; week_k = full weeks since that first event.
    // first_us comes from an unordered window over user_id (one shuffle,
    // no sort), then the (cohort, week) matrix is one more bounded-key
    // aggregation. COUNT(DISTINCT user) is exact — the cohort matrix is
    // small; a 100 TB deployment swaps in approx_count_distinct when
    // cohort cardinality itself explodes.
    Q("q122_retention_cohorts",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("first_us",
            min(col("us")).over(Window.partitionBy("user_id")))
          .select(
            unix_micros(date_trunc("week", timestamp_micros(col("first_us"))))
              .as("cohort_week_us"),
            floor((col("us") - col("first_us")) / lit(US_PER_WEEK))
              .cast("long").as("week_k"),
            col("user_id"))
          .groupBy("cohort_week_us", "week_k")
          .agg(countDistinct(col("user_id")).as("n_active")),
      Some(s"""WITH f AS (
          SELECT user_id, MIN(EPOCH_US(ts)) AS first_us
          FROM events GROUP BY 1)
        SELECT
          EPOCH_US(DATE_TRUNC('week', MAKE_TIMESTAMP(f.first_us)))
            AS cohort_week_us,
          (EPOCH_US(e.ts) - f.first_us) // $US_PER_WEEK AS week_k,
          COUNT(DISTINCT e.user_id) AS n_active
        FROM events e JOIN f USING (user_id)
        GROUP BY 1, 2"""),
      "weekly retention cohort matrix (first-touch cohorting, exact " +
        "distinct actives per cohort-week cell)"),

    // Banded range join: lineitems priced within +/-1% of a part's list
    // price, WITHOUT an equi-key. The naive plan is a nested-loop
    // (BroadcastNestedLoopJoin — quadratic scan work at scale); the grid
    // trick buckets both sides by floor(price/W) with W chosen >= the
    // widest interval (0.02 * max price ~ 20 < 32), replicates the
    // bounded side to its 3 neighbor buckets, and turns the range join
    // into an equi-shuffle + residual BETWEEN filter.
    //
    // Second scale lever: the matched COUNT depends only on the VALUES,
    // so both sides first compact to distinct prices with multiplicity
    // weights — the band join runs over distinct-value pairs (never row
    // pairs; a duplicate-heavy corpus would otherwise go quadratic in
    // replicas, the q48 phenomenon) and per-part results come back via
    // one equi-join on price. On fully-distinct data the compaction is a
    // free no-op and the plan degrades to the plain banded join.
    Q("q123_band_range_join",
      (s, dir) => {
        val width = 32.0
        val partPrices = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_retailprice"))
        val distinctP = partPrices.select("p_retailprice").distinct()
          .withColumn("b", explode(array((-1 to 1).map(k =>
            (floor(col("p_retailprice") / width) + k).cast("long")): _*)))
        val items = Tables.load(s, dir, "lineitem")
          .groupBy("l_extendedprice").agg(count(lit(1)).as("w"))
          .withColumn("b", floor(col("l_extendedprice") / width).cast("long"))
        val perPrice = distinctP.join(items, "b")
          .filter(col("l_extendedprice")
            .between(col("p_retailprice") * 0.99, col("p_retailprice") * 1.01))
          .groupBy("p_retailprice")
          .agg(sum(col("w")).as("n_close"))
        partPrices.join(perPrice, "p_retailprice")
          .select(col("p_partkey"), col("n_close"))
      },
      Some("""SELECT p_partkey, COUNT(*) AS n_close
        FROM part JOIN lineitem
          ON l_extendedprice BETWEEN p_retailprice * 0.99
                                 AND p_retailprice * 1.01
        GROUP BY 1"""),
      "non-equi range join via grid bucketing + distinct-value compaction " +
        "(equi-shuffle over weighted distinct prices replaces the " +
        "nested-loop the naive BETWEEN join plans; row-pair-free)"),

    // Co-occurrence mining: which event types appear together in the
    // same user's history, with support = number of users. The self-join
    // is over the DISTINCT (user, type) projection, so its output is
    // bounded by |users| * |type vocabulary|^2 — the type taxonomy is a
    // fixed product property, never corpus-sized, which is what keeps
    // this linear in users at 100 TB.
    Q("q124_type_cooccurrence",
      (s, dir) => {
        val d = Tables.load(s, dir, "events")
          .select("user_id", "event_type").distinct()
        d.as("a").join(d.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          COUNT(*) AS n_users
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2"""),
      "event-type co-occurrence (market-basket support over per-user " +
        "distinct type sets; output bounded by the type taxonomy)"),

    // Last-touch attribution: each purchase credits the nearest
    // preceding non-purchase event of the same user. last(..., ignore
    // nulls) over the preceding frame is one window pass (one shuffle +
    // per-user sort) — no self-join, no as-of lookup table.
    Q("q125_last_touch_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.load(s, dir, "events")
          .withColumn("attributed",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("attributed"), lit("none")).as("attributed_type"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(28,8)")).cast("double")
              .as("total_value"))
      },
      Some("""WITH a AS (
          SELECT event_type, value,
            LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
              IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attributed
          FROM events)
        SELECT COALESCE(attributed, 'none') AS attributed_type,
          COUNT(*) AS n_purchases,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        FROM a WHERE event_type = 'purchase' GROUP BY 1"""),
      "last-touch attribution via ignore-nulls window (single keyed " +
        "window pass, no per-purchase as-of self-join)"),

    // Hopping (sliding) event-time windows: 1 h length, 15 min slide —
    // each event lands in exactly 4 overlapping windows. Uses the native
    // window() generator (the same operator the streaming pipeline uses
    // with a watermark), which expands in-plan without a join against a
    // window-spec table. Complements q33's tumbling form (§2.8).
    Q("q126_hopping_window",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
          .select(unix_micros(col("w.start")).as("window_start_us"),
            col("event_type"), col("n"), col("total")),
      Some("""WITH g AS (
          SELECT (EPOCH_US(ts) // 900000000) * 900000000 AS grid,
            event_type, value FROM events),
        h AS (
          SELECT grid - k * 900000000 AS window_start_us, event_type, value
          FROM g CROSS JOIN (SELECT UNNEST(RANGE(0, 4)) AS k))
        SELECT window_start_us, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total
        FROM h GROUP BY 1, 2"""),
      "hopping event-time windows (1h/15min; batch form of the streaming " +
        "windowed aggregation, each event in duration/slide windows)")
  )
}
