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
      (s, dir) =>
        graft.operators.EventOps.funnel(
          Tables.load(s, dir, "events")
            .withColumn("us", unix_micros(col("ts"))),
          ("signup", "click", "purchase")),
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
    // trick buckets both sides by floor(price/W), replicates each part
    // price to exactly the buckets its interval spans (width is a pure
    // tuning knob, never a correctness precondition), and turns the
    // range join into an equi-shuffle + residual BETWEEN filter.
    //
    // Second scale lever: the matched COUNT depends only on the VALUES,
    // so both sides first compact to distinct prices with multiplicity
    // weights — the band join runs over distinct-value pairs (never row
    // pairs; a duplicate-heavy corpus would otherwise go quadratic in
    // replicas, the q48 phenomenon) and per-part results come back via
    // one equi-join on price. On fully-distinct data the compaction is a
    // free no-op and the plan degrades to the plain banded join.
    Q("q123_band_range_join",
      (s, dir) =>
        graft.operators.EventOps.bandedRangeCount(
          Tables.load(s, dir, "part")
            .select(col("p_partkey"), col("p_retailprice")),
          "p_retailprice",
          Tables.load(s, dir, "lineitem"), "l_extendedprice",
          width = 32.0, loFactor = 0.99, hiFactor = 1.01)
          .select(col("p_partkey"), col("n_close")),
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
        "windowed aggregation, each event in duration/slide windows)"),

    // Path mining: the most frequent 3-step event paths where each hop
    // follows within 30 min (the q34 session gap). Two lead() calls over
    // ONE window spec = a single shuffle+sort per user; the path space is
    // |type vocabulary|^3 — a product property, so the aggregate output
    // stays bounded no matter the corpus size.
    Q("q132_event_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("u2", lead(col("us"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .withColumn("u3", lead(col("us"), 2).over(w))
          .filter(col("t3").isNotNull &&
            col("u2") - col("us") <= gapUs && col("u3") - col("u2") <= gapUs)
          .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
            col("t3").as("step3"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH l AS (
          SELECT user_id, event_type AS step1, EPOCH_US(ts) AS us,
            LEAD(event_type, 1) OVER w AS step2,
            LEAD(EPOCH_US(ts), 1) OVER w AS u2,
            LEAD(event_type, 2) OVER w AS step3,
            LEAD(EPOCH_US(ts), 2) OVER w AS u3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT step1, step2, step3, COUNT(*) AS n
        FROM l
        WHERE step3 IS NOT NULL
          AND u2 - us <= 1800000000 AND u3 - u2 <= 1800000000
        GROUP BY 1, 2, 3"""),
      "3-step path mining with per-hop session gap (one window pass; " +
        "path space bounded by the type taxonomy cubed)"),

    // First-order transition matrix with gap bound: P(next type | type)
    // as exact counts + a probability derived from them. The probability
    // divides two exact longs IN THE SAME WAY on both engines, so the
    // doubles compare bit-for-bit. One window pass + one bounded-key agg.
    Q("q133_transition_matrix",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        val trans = Tables.load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .withColumn("u2", lead(col("us"), 1).over(w))
          .filter(col("to_type").isNotNull && col("u2") - col("us") <= gapUs)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        trans
          .withColumn("row_total",
            sum(col("n")).over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            (col("n").cast("double") / col("row_total")).as("p"))
      },
      Some("""WITH l AS (
          SELECT event_type AS from_type, EPOCH_US(ts) AS us,
            LEAD(event_type, 1) OVER w AS to_type,
            LEAD(EPOCH_US(ts), 1) OVER w AS u2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        t AS (
          SELECT from_type, to_type, COUNT(*) AS n FROM l
          WHERE to_type IS NOT NULL AND u2 - us <= 1800000000
          GROUP BY 1, 2)
        SELECT from_type, to_type, n,
          CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
        FROM t"""),
      "event transition matrix (Sankey edges): gap-bounded next-event " +
        "counts row-normalized to probabilities"),

    // Z-score anomaly detection per event type. Values quantize to 4dp
    // BIGINTs (the catalog's established cross-engine quantization
    // pattern), so the moments are EXACT integers; the double formula
    // ((sq - s*s/n) / (n-1), IEEE sqrt) is then spelled identically on
    // both sides, making the flag threshold — and the outlier counts —
    // bit-deterministic. One scan, one bounded-key agg, then a broadcast
    // of 5 rows back onto the stream: anomaly scoring at 100 TB is a
    // map, not a shuffle.
    Q("q134_zscore_outliers",
      (s, dir) =>
        graft.operators.EventOps.zscoreOutlierCounts(
          Tables.load(s, dir, "events"), "event_type", "value"),
      Some("""WITH q AS (
          SELECT event_type,
            CAST(ROUND(value * 10000, 0) AS BIGINT) AS v4 FROM events
          WHERE value IS NOT NULL),
        st AS (
          SELECT event_type, COUNT(*) AS n, SUM(v4) AS s,
            SUM(v4::HUGEINT * v4::HUGEINT) AS sq
          FROM q GROUP BY 1),
        m AS (
          -- GREATEST(0, ...): cancellation can round zero variance to a
          -- tiny negative and DuckDB SQRT errors on negatives; clamping
          -- mirrors the Spark side so the group hits the std4 = 0 guard
          SELECT event_type, n, CAST(s AS DOUBLE) / n AS mean4,
            SQRT(GREATEST(0, (CAST(sq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)))
              AS std4
          FROM st)
        SELECT q.event_type, m.n,
          COUNT(CASE WHEN NOT ISNAN(m.std4) AND m.std4 > 0
            AND ABS((CAST(q.v4 AS DOUBLE) - m.mean4) / m.std4) > 2.5
            THEN 1 END) AS n_outliers,
          ROUND(m.mean4 / 10000.0, 6) AS mean_r
        FROM q JOIN m ON q.event_type = m.event_type
        GROUP BY 1, 2, 4"""),
      "z-score outlier counts per type: exact integer moments over " +
        "4dp-quantized values, identically-spelled double formula both " +
        "engines, stats broadcast back so scoring is a map-side pass"),

    // N-stage funnel (EventOps.funnelN): same single-shuffle fold as
    // q121 but with array state, graded here at 4 stages. The oracle is
    // the K-join chain — K shuffles where the fold needs one.
    Q("q135_funnel_four_stage",
      (s, dir) =>
        graft.operators.EventOps.funnelN(
          Tables.load(s, dir, "events")
            .withColumn("us", unix_micros(col("ts"))),
          Seq("signup", "view", "click", "purchase"))
          // try_element_at: a partial funnel's stage_ts is shorter than 4
          // and plain element_at THROWS under ANSI mode (every seed-42
          // user happens to finish all 4 stages, so only a partial-funnel
          // corpus would reveal it — the unit test covers one)
          .select(col("user_id"), col("reached_stage"),
            try_element_at(col("stage_ts"), lit(1)).as("t1_us"),
            try_element_at(col("stage_ts"), lit(2)).as("t2_us"),
            try_element_at(col("stage_ts"), lit(3)).as("t3_us"),
            try_element_at(col("stage_ts"), lit(4)).as("t4_us")),
      Some("""WITH e AS (
          SELECT user_id, EPOCH_US(ts) AS us, event_type FROM events
          WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'view' AND us > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'click' AND us > t2 GROUP BY 1),
        s4 AS (SELECT e.user_id, MIN(us) AS t4 FROM e JOIN s3 USING (user_id)
               WHERE event_type = 'purchase' AND us > t3 GROUP BY 1)
        SELECT u.user_id,
          CASE WHEN t4 IS NOT NULL THEN 4 WHEN t3 IS NOT NULL THEN 3
               WHEN t2 IS NOT NULL THEN 2 WHEN t1 IS NOT NULL THEN 1
               ELSE 0 END AS reached_stage,
          t1 AS t1_us, t2 AS t2_us, t3 AS t3_us, t4 AS t4_us
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)"""),
      "4-stage funnel via the N-stage array fold (one shuffle vs the " +
        "oracle's 4-join chain)"),

    // Streaming COMPOSITION proof (round 12): the change feed IS a real
    // stream — a watermarked tumbling-window aggregation with a
    // stream-static join runs over `format("graft-changes")` exactly as
    // it would over any streaming source. Three commits: the live slice
    // (ts >= cut), a whole commit of LATE stragglers (ts < cut, all
    // below the watermark the live batch set), and a far-future sentinel
    // whose only job is pushing the watermark past every real window so
    // append mode emits them. The late commit must be DROPPED by the
    // watermark (gated in-query on numRowsDroppedByWatermark); the
    // oracle recomputes the same windows relationally over the non-late
    // slice. cut = day-truncated max(ts) minus 2 days, so every late
    // window ends at least a day below the watermark — Spark guarantees
    // drops only for windows already evicted, and these always are.
    Q("q161_stream_window_join",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        val bounds = ev.agg(
          max(col("ts")).as("mx"),
          (date_trunc("DAY", max(col("ts"))) -
            expr("INTERVAL 2 DAYS")).as("cut")).head()
        val (maxTs, cutTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
        val base = java.nio.file.Files.createTempDirectory("graft-q161").toString
        val db = GraftDatabase(s, "q161", base)
          .defineTable(TableDef("ev", "event_id"))
        db.insert("ev", ev.filter(col("ts") >= lit(cutTs)))   // v1: live
        // v2: a keeper tick just past max(ts) — its batch runs the
        // eviction at watermark ≈ max(ts), so the late commit arrives a
        // FULL batch after its windows were evicted (a row landing in
        // the same batch as its window's eviction still merges; the
        // guaranteed drop needs this gap)
        def zz(id: Long, t: java.sql.Timestamp) = s.createDataFrame(
          Seq((id, t, "zz_sentinel", 0.0)))
          .toDF("event_id", "ts", "event_type", "value")
        db.insert("ev", zz(-2L,
          new java.sql.Timestamp(maxTs.getTime + 60L * 1000)))
        val late = ev.filter(col("ts") < lit(cutTs))
        val nLate = late.count()
        db.insert("ev", late)                                  // v3: all late
        db.insert("ev", zz(-1L,                                // v4: wm pusher
          new java.sql.Timestamp(maxTs.getTime + 100L * 86400 * 1000)))
        // static dimension for the stream-static join
        val dim = ev.select("event_type").distinct()
          .withColumn("weight", length(col("event_type")))
        val outName =
          "q161_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q161-ck")
        // State partitions are fixed at the stream's first checkpoint, so
        // size them to the STATE (≤ ~150 window×type keys), not to the
        // session's batch-query shuffle width — the packaged helper
        // (scopedStreamSession) owns that rule; 32 near-empty state
        // stores paid ~2× the drain in per-batch snapshot I/O.
        val ss = db.scopedStreamSession(statePartitions = 8)
        val q = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q161")
          .option("table", "ev").option("maxVersionsPerTrigger", "1").load()
          .filter(col("_change_type") === "insert")
          .withWatermark("ts", "1 hour")
          .join(broadcast(dim), Seq("event_type"))
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum((col("value") * col("weight")).cast("decimal(28,8)"))
              .as("wv0"))
          .select(col("window.start").cast("date").as("w"),
            col("event_type"), col("n"), col("wv0").cast("double").as("wv"))
          .writeStream.format("memory").queryName(outName)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        // the late-drop gate is STRUCTURAL (numRowsDroppedByWatermark
        // only counts state-store drops, not the pre-agg watermark
        // filter): every live row lands exactly once, and no window
        // below the cut exists — a single surviving late row would
        // create one (its windows all end below the cut)
        val out = ss.table(outName)
          .filter(col("event_type") =!= "zz_sentinel")
        val nLive = ev.filter(col("ts") >= lit(cutTs)).count()
        val shape = out.agg(sum(col("n")).as("rows"),
          min(col("w")).as("wmin")).head()
        val cutDate = java.sql.Date.valueOf(
          cutTs.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)
        require(shape.getLong(0) == nLive && !shape.getDate(1).before(cutDate),
          s"watermark gate: expected $nLive live rows in windows >= " +
            s"$cutDate (late commit of $nLate rows dropped), got " +
            s"${shape.getLong(0)} rows from ${shape.getDate(1)}")
        out
      },
      Some("""WITH cut AS (
          SELECT DATE_TRUNC('day', MAX(ts)) - INTERVAL 2 DAY AS c FROM events),
        d AS (SELECT DISTINCT event_type, LEN(event_type) AS weight
              FROM events)
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS w, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value * weight AS DECIMAL(28,8))) AS DOUBLE) AS wv
        FROM events e CROSS JOIN cut JOIN d USING (event_type)
        WHERE e.ts >= cut.c
        GROUP BY 1, 2"""),
      "watermarked tumbling-window aggregation + stream-static join OVER " +
        "the graft-changes feed: a whole late commit dropped by the " +
        "watermark, append mode emits exactly the finalized windows"),

    // STREAM-STREAM composition proof (round 13; q161 proved
    // stream-static): TWO `graft-changes` feeds — clicks and purchases
    // committed as separate tables of one database — event-time
    // interval-joined with BOTH sides watermarked. Commit order per
    // side: live slice, a sentinel tick (pushes the watermark past
    // every live window a full batch before the stragglers), then a
    // whole LATE commit (ts < cut, ≥ 2 days below the watermark) that
    // must be dropped on ITS side of the join. The oracle recomputes
    // the interval join relationally over the non-late slices. The two
    // sources share one commit log; each trigger advances each source
    // by ≤ 1 version, so the engine replays the same interleaving on
    // restart. Inner stream-stream joins emit eagerly in append mode —
    // no final flush tick needed.
    Q("q164_stream_stream_join",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        import org.apache.spark.sql.streaming.Trigger
        // the 4-column projection feeds six consumers (bounds, two live
        // inserts, two late inserts, the expect recompute) — cache it so
        // setup scans the parquet once, not six times
        val ev = Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bounds = ev.agg(
          max(col("ts")).as("mx"),
          (date_trunc("DAY", max(col("ts"))) -
            expr("INTERVAL 2 DAYS")).as("cut")).head()
        val (maxTs, cutTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
        val clicks = ev.filter(col("event_type") =!= "purchase")
          .select(col("event_id").as("click_id"), col("ts"), col("user_id"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("ts"), col("user_id"))
        val base = java.nio.file.Files.createTempDirectory("graft-q164").toString
        val db = GraftDatabase(s, "q164", base)
          .defineTable(TableDef("clicks", "click_id"))
          .defineTable(TableDef("buys", "buy_id"))
        def tick(idCol: String, t: java.sql.Timestamp) = s.createDataFrame(
          Seq((-9L, t, -9L))).toDF(idCol, "ts", "user_id")
        val live = col("ts") >= lit(cutTs)
        db.insert("clicks", clicks.filter(live))              // v1
        db.insert("buys", buys.filter(live))                  // v2
        val tickTs = new java.sql.Timestamp(maxTs.getTime + 60L * 1000)
        db.insert("clicks", tick("click_id", tickTs))         // v3
        db.insert("buys", tick("buy_id", tickTs))             // v4
        db.insert("clicks", clicks.filter(!live))             // v5: late
        db.insert("buys", buys.filter(!live))                 // v6: late
        val ss = db.scopedStreamSession(statePartitions = 8)
        // cap 2 pairs the commits into 3 batches — (live a, live b),
        // (tick a, tick b), (late a, late b) — which preserves the
        // guarantee (watermark advances AFTER the tick batch, a full
        // batch before the lates) at half the trigger overhead
        def feed(table: String) = ss.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "q164")
          .option("table", table).option("maxVersionsPerTrigger", "2").load()
          .filter(col("_change_type") === "insert")
        val a = feed("clicks").withWatermark("ts", "1 hour")
          .select(col("click_id"), col("ts").as("a_ts"), col("user_id"))
        val b = feed("buys").withWatermark("ts", "1 hour")
          .select(col("buy_id"), col("ts").as("b_ts"),
            col("user_id").as("b_user"))
        val outName =
          "q164_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q164-ck")
        val q = b.join(a,
            col("b_user") === col("user_id") &&
              col("a_ts") >= col("b_ts") - expr("INTERVAL 1 DAY") &&
              col("a_ts") <= col("b_ts"))
          .select(col("buy_id"), col("click_id"))
          .writeStream.format("memory").queryName(outName)
          .option("checkpointLocation", ckpt.toString)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val out = ss.table(outName)
          .filter(col("buy_id") =!= -9L && col("click_id") =!= -9L)
        // structural late-drop gate: the joined pairs are EXACTLY the
        // live-only batch recompute — a single surviving late row on
        // either side would create a pair outside the live set (late
        // windows sit ≥ 2 days below the watermark, and user -9 keeps
        // tick rows out of every pair)
        val expect = buys.filter(live).as("b").join(
          clicks.filter(live).as("a"),
          col("b.user_id") === col("a.user_id") &&
            col("a.ts") >= col("b.ts") - expr("INTERVAL 1 DAY") &&
            col("a.ts") <= col("b.ts")).count()
        val got = out.count()
        ev.unpersist()
        require(got == expect,
          s"stream-stream watermark gate: expected $expect live pairs, " +
            s"got $got (late commits must drop on both sides)")
        out
      },
      Some("""WITH cut AS (
          SELECT DATE_TRUNC('day', MAX(ts)) - INTERVAL 2 DAY AS c FROM events),
        a AS (SELECT user_id, event_id AS click_id, ts FROM events, cut
              WHERE event_type <> 'purchase' AND ts >= c),
        b AS (SELECT user_id, event_id AS buy_id, ts FROM events, cut
              WHERE event_type = 'purchase' AND ts >= c)
        SELECT b.buy_id, a.click_id
        FROM b JOIN a ON a.user_id = b.user_id
          AND a.ts BETWEEN b.ts - INTERVAL 1 DAY AND b.ts"""),
      "event-time interval join of TWO graft-changes feeds (clicks × " +
        "purchases), both sides watermarked; whole late commits dropped " +
        "per side; oracle = relational recompute over the non-late slices")
  )
}
