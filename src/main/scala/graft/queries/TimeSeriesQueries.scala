package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ts.TimeSeriesOps

/** Time-series coverage over `events` (SURVEY §2.8): LOCF, grid resample
  * with linear interpolation, as-of join, tumbling windows, sessionization,
  * and the windowed (non-recursive) hash-chain form.
  */
object TimeSeriesQueries {

  val all: Seq[Q] = Seq(
    Q("q30_locf",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .withColumn("purchase_value",
            when(col("event_type") === "purchase", col("value")))
        TimeSeriesOps.locf(ev, "user_id", "ts", "event_id",
            "purchase_value", "last_purchase_value")
          .select("event_id", "user_id", "last_purchase_value")
      },
      Some("""SELECT event_id, user_id,
        LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        FROM events"""),
      "LOCF carry-forward (TsCollection.cs:130-185) as a single window pass"),

    Q("q31_resample_interp",
      (s, dir) => {
        // dedupe exact (user, ts) collisions so neighbor picks are unique
        val obs = Tables.load(s, dir, "events")
          .groupBy("user_id", "ts").agg(max(col("value")).as("value"))
        TimeSeriesOps.resampleLinear(obs, "user_id", "ts", "value", 3600L)
          .select(col("user_id"), unix_micros(col("grid_ts")).as("grid_us"),
            round(col("value"), 6).as("value"), col("interpolated"))
      },
      Some("""WITH obs AS (
          SELECT user_id, ts, MAX(value) AS value FROM events GROUP BY user_id, ts),
        bounds AS (
          SELECT user_id, EPOCH_US(MIN(ts)) // 1000000 AS t0,
                 EPOCH_US(MAX(ts)) // 1000000 AS t1
          FROM obs GROUP BY user_id),
        grid AS (
          SELECT user_id,
            UNNEST(RANGE(((t0 + 3599) // 3600) * 3600, t1 + 1, 3600)) AS gsec
          FROM bounds),
        g AS (SELECT user_id, MAKE_TIMESTAMP(gsec * 1000000) AS gts FROM grid),
        prv AS (
          SELECT g.user_id, g.gts, o.ts AS pt, o.value AS pv
          FROM g ASOF LEFT JOIN obs o
            ON g.user_id = o.user_id AND g.gts >= o.ts),
        nxt AS (
          SELECT g.user_id, g.gts, o.ts AS nt, o.value AS nv
          FROM g ASOF LEFT JOIN obs o
            ON g.user_id = o.user_id AND g.gts <= o.ts)
        SELECT p.user_id, EPOCH_US(p.gts) AS grid_us,
          ROUND(CASE
            WHEN p.pt = p.gts THEN p.pv
            WHEN n.nt IS NULL THEN p.pv
            WHEN p.pt IS NULL THEN NULL
            ELSE p.pv + (n.nv - p.pv)
              * CAST(EPOCH_US(p.gts) - EPOCH_US(p.pt) AS DOUBLE)
              / CAST(EPOCH_US(n.nt) - EPOCH_US(p.pt) AS DOUBLE)
          END, 6) AS value,
          (p.pt IS NULL OR p.pt <> p.gts) AS interpolated
        FROM prv p JOIN nxt n ON p.user_id = n.user_id AND p.gts = n.gts"""),
      "grid resample + linear interpolation (TsCollection.cs:188-233)"),

    Q("q32_asof_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id")
        val errors = ev.filter(col("event_type") === "error")
          .groupBy("user_id", "ts")
          .agg(max(col("value")).as("last_error_value"))
        TimeSeriesOps.asofJoinBackward(purchases, errors,
            "user_id", "ts", "event_id", Seq("last_error_value"))
          .select("event_id", "user_id", "last_error_value")
      },
      Some("""WITH p AS (
          SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
        e AS (
          SELECT user_id, ts, MAX(value) AS last_error_value
          FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id, e.last_error_value
        FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts >= e.ts"""),
      "as-of join via union + one window pass (no per-row lookups)"),

    Q("q33_tumbling_window",
      (s, dir) =>
        Tables.load(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
          .select(unix_micros(col("w.start")).as("window_start_us"),
            col("event_type"), col("n"), col("total")),
      Some("""SELECT EPOCH_US(DATE_TRUNC('hour', ts)) AS window_start_us,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2"""),
      "tumbling event-time window aggregation (batch form of §2.8 streaming)"),

    Q("q34_sessionize",
      (s, dir) => {
        val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        Tables.load(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
          .withColumn("session_idx",
            sum(col("new_session")).over(
              wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min(unix_micros(col("ts"))).as("session_start_us"),
            (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
              .as("duration_us"))
      },
      Some("""WITH marked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN LAG(EPOCH_US(ts), 1) OVER w IS NULL
                   OR EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
          SELECT user_id, ts,
            CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
          FROM marked)
        SELECT user_id, session_idx, COUNT(*) AS n_events,
          MIN(EPOCH_US(ts)) AS session_start_us,
          MAX(EPOCH_US(ts)) - MIN(EPOCH_US(ts)) AS duration_us
        FROM numbered GROUP BY user_id, session_idx"""),
      "session windows (gaps-and-islands; session_window streaming twin)"),

    // Encode -> decode -> aggregate must equal aggregating the raw rows:
    // the oracle computes the same aggregate straight from events, so the
    // identity is checked distributed (BaseDeltaT.cs round-trip).
    Q("q36_delta_roundtrip",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          // dedupe exact (user, ts) collisions: the decode contract is a
          // set of points per key, ordered by time
          .groupBy("user_id", "ts").agg(max(col("value")).as("value"))
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
        val decoded = graft.ts.DeltaEncoding.decode(
          graft.ts.DeltaEncoding.encode(ev, "user_id", "ts_us", "value"))
        decoded.groupBy(col("key").as("user_id"))
          .agg(count(lit(1)).as("n_points"),
            min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
            sum(col("value").cast("decimal(28,8)")).cast("double").as("total"))
      },
      Some("""WITH obs AS (
          SELECT user_id, ts, MAX(value) AS value FROM events GROUP BY user_id, ts)
        SELECT user_id, COUNT(*) AS n_points,
          MIN(EPOCH_US(ts)) AS first_us, MAX(EPOCH_US(ts)) AS last_us,
          CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total
        FROM obs GROUP BY user_id"""),
      "delta-of-timestamp encode/decode round-trip (TimeSeries/BaseDeltaT, " +
        "DeltaT.cs:14-26) checked through aggregates over the decoded rows"),

    Q("q35_hash_chain",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.load(s, dir, "events")
          .withColumn("data", col("value").cast("decimal(18,2)").cast("string"))
          .withColumn("hash",
            sha2(concat_ws("-", unix_micros(col("ts")).cast("string"),
              col("data")), 256))
          .withColumn("previous_hash",
            coalesce(lag(col("hash"), 1).over(w), lit("")))
          .select("event_id", "user_id", "hash", "previous_hash")
      },
      Some("""SELECT event_id, user_id,
        SHA256(CAST(EPOCH_US(ts) AS VARCHAR) || '-'
          || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)) AS hash,
        COALESCE(LAG(SHA256(CAST(EPOCH_US(ts) AS VARCHAR) || '-'
          || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)), 1)
          OVER (PARTITION BY user_id ORDER BY ts, event_id), '') AS previous_hash
        FROM events"""),
      "windowed hash-link audit (Blockchain/BlockCollection.cs:138-162); " +
        "the recursive build is HashChain.build (ScalaTest-verified)")
  )
}
