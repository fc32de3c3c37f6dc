package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator coverage (SURVEY.md §2.1-§2.7): scan, filter with
  * pushdown, projection/alias, equi-joins (broadcast + shuffle), semi/anti
  * joins, grouped/global aggregation, HAVING, DISTINCT, set ops, rollup,
  * window functions, ORDER BY/LIMIT top-k, string/date/conditional scalar
  * functions.
  *
  * Mirrors the reference's surface — e.g. index-seek/range/IN/LIKE scans
  * (`LiteDB/Engine/Query/IndexQuery` classes) become pushed-down parquet
  * predicates; `INCLUDE` FK hydration (`LiteDB/Engine/Query/Pipeline/
  * BasePipe.cs:46-133`) becomes a broadcast left join.
  */
object RelationalQueries {

  /** Sum doubles exactly: accumulate in decimal, return double. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(28,8)")).cast("double")

  val all: Seq[Q] = Seq(
    Q("q01_group_agg",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            // multiply EXACT decimals: casting the double product can land
            // on a .xxxxxxxx5 tie that Spark (HALF_UP) and DuckDB round
            // differently — surfaced at sf0.1
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(8,2)"))
              .cast("double").as("sum_disc_price"),
            (sum(col("l_quantity").cast("decimal(28,8)")).cast("double") /
              count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      "TPC-H Q1-style grouped aggregation; partial (map-side) agg + exact decimal sums"),

    Q("q02_filter_project",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
            col("l_discount") > 0.05 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05
          AND l_returnflag = 'R'"""),
      "predicate pushdown + column pruning (the reference's index-seek path)"),

    Q("q03_join_broadcast_dims",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"),
            dsum(col("c_acctbal")).as("sum_bal"))
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name"""),
      "snowflake dim joins — both dims broadcast (no shuffle of the fact side)"),

    Q("q04_join_fact_fact",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val li = Tables.load(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount")).cast("decimal(8,2)"))
              .cast("double").as("revenue"))
      },
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority"""),
      "large-side equi-join: shuffle hash/SMJ on the join key, AQE-planned"),

    Q("q05_having",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 5),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5"""),
      "GROUP BY + HAVING (GroupByPipe.cs:112-146 semantics)"),

    Q("q06_topk",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      "top-k: Spark plans TakeOrderedAndProject (no global sort)"),

    Q("q07_distinct",
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .select("c_mktsegment", "c_nationkey").distinct(),
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"),
      "DISTINCT (Methods/Misc.cs:206-214) as partial-agg dedup"),

    Q("q08_except",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").select("c_custkey")
        val o = Tables.load(s, dir, "orders")
          .select(col("o_custkey").as("c_custkey"))
        c.except(o)
      },
      Some("""SELECT c_custkey FROM customer
        EXCEPT SELECT o_custkey AS c_custkey FROM orders"""),
      "set op EXCEPT (Methods/Misc.cs:198-204); customers with no orders"),

    Q("q09_semi_anti",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val big = Tables.load(s, dir, "orders")
          .filter(col("o_totalprice") > 400000).select("o_custkey")
        val semi = c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_big").as("kind"))
        val anti = c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_big").as("kind"))
        semi.unionAll(anti)
      },
      Some("""SELECT c_custkey, 'has_big' AS kind FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        UNION ALL
        SELECT c_custkey, 'no_big' AS kind FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)"""),
      "EXISTS/NOT EXISTS as left_semi/left_anti joins (TableCollection.Exists)"),

    Q("q10_string_funcs",
      (s, dir) =>
        Tables.load(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            lower(col("p_type")).as("ltype"),
            substring(col("p_name"), 1, 5).as("name5"),
            regexp_replace(col("p_brand"), "#", "-").as("brand2"),
            lpad(col("p_size").cast("string"), 4, "0").as("size4"),
            length(col("p_name")).as("name_len"),
            size(split(col("p_name"), " ")).as("n_words"),
            trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
            col("p_name").startsWith("small").as("is_small"),
            col("p_name").contains("widget").as("has_widget"),
            col("p_type").like("ECO%").as("is_eco")),
      Some("""SELECT p_partkey, UPPER(p_name) AS uname, LOWER(p_type) AS ltype,
        SUBSTRING(p_name, 1, 5) AS name5,
        REPLACE(p_brand, '#', '-') AS brand2,
        LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size4,
        LENGTH(p_name) AS name_len,
        LEN(STRING_SPLIT(p_name, ' ')) AS n_words,
        TRIM('  ' || p_brand || '  ') AS trimmed,
        p_name LIKE 'small%' AS is_small,
        CONTAINS(p_name, 'widget') AS has_widget,
        p_type LIKE 'ECO%' AS is_eco
        FROM part"""),
      "string surface (Methods/String.cs) incl. LIKE / contains / startswith"),

    Q("q11_date_funcs",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
            datediff(lit("2002-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("age_days"),
            date_trunc("month", col("o_orderdate")).cast("date")
              .as("order_month")),
      Some("""SELECT o_orderkey,
        YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
        CAST(o_orderdate AS DATE) + 30 AS due_date,
        DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
        CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month
        FROM orders"""),
      "date surface (Methods/Date.cs): parts, DATEADD, DATEDIFF, trunc"),

    Q("q12_conditional",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") > 300000, "high")
              .when(col("o_totalprice") > 100000, "mid")
              .otherwise("low").as("bucket"),
            coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
              .as("status2"),
            when(col("o_orderstatus") === "F", col("o_totalprice"))
              .otherwise(lit(0.0)).as("finished_price")),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'high'
             WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS bucket,
        COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status2,
        CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS finished_price
        FROM orders"""),
      "IIF/COALESCE/CASE (Methods/Misc.cs:143-158)"),

    Q("q13_in_between",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("A", "R") &&
            col("l_quantity").between(10, 20))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty")),
      Some("""SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
        GROUP BY l_returnflag"""),
      "IN + BETWEEN pushdown (IndexIn.cs / IndexRange.cs equivalents)"),

    Q("q14_minmax_firstlast",
      (s, dir) =>
        Tables.load(s, dir, "orders")
          .groupBy("o_orderstatus")
          .agg(
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_orderdate").cast("date")).as("first_date"),
            max(col("o_orderdate").cast("date")).as("last_date"),
            // composite (date, key) ordering as one bigint: unique => deterministic
            min_by(col("o_orderkey"),
              unix_timestamp(col("o_orderdate")) * 100000000L + col("o_orderkey"))
              .as("first_order"),
            max_by(col("o_orderkey"),
              unix_timestamp(col("o_orderdate")) * 100000000L + col("o_orderkey"))
              .as("last_order")),
      Some("""SELECT o_orderstatus,
        MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        CAST(MIN(o_orderdate) AS DATE) AS first_date,
        CAST(MAX(o_orderdate) AS DATE) AS last_date,
        ARG_MIN(o_orderkey, (EPOCH_US(o_orderdate) // 1000000) * 100000000 + o_orderkey) AS first_order,
        ARG_MAX(o_orderkey, (EPOCH_US(o_orderdate) // 1000000) * 100000000 + o_orderkey) AS last_order
        FROM orders GROUP BY o_orderstatus"""),
      "MIN/MAX + FIRST/LAST-in-order (Aggregate.cs:24-70) via min_by/max_by"),

    Q("q15_rollup",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer").as("c")
        val n = Tables.load(s, dir, "nation").as("n")
        c.join(broadcast(n), col("c.c_nationkey") === col("n.n_nationkey"))
          .rollup(col("c.c_mktsegment").as("c_mktsegment"),
            col("n.n_name").as("n_name"))
          .agg(count(lit(1)).as("n"), dsum(col("c.c_acctbal")).as("bal"))
      },
      Some("""SELECT c_mktsegment, n_name, COUNT(*) AS n,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(c_mktsegment, n_name)"""),
      "ROLLUP grouping sets (free capability beyond the reference, SURVEY §2.4)"),

    Q("q16_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .select(
            col("o_orderkey"), col("o_custkey"),
            row_number().over(w).as("rn"),
            lag(col("o_orderkey"), 1).over(w).as("prev_order"),
            sum(col("o_totalprice").cast("decimal(28,8)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"))
      },
      Some("""SELECT o_orderkey, o_custkey,
        ROW_NUMBER() OVER w AS rn,
        LAG(o_orderkey, 1) OVER w AS prev_order,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""),
      "ranking/lag/running window (SURVEY §2.5 — new capability vs reference)"),

    Q("q17_offset_limit",
      (s, dir) =>
        Tables.load(s, dir, "customer")
          .orderBy(col("c_custkey"))
          .select("c_custkey", "c_name")
          .offset(20).limit(10),
      Some("""SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey LIMIT 10 OFFSET 20"""),
      "OFFSET/LIMIT paging (BasePipe.cs:166, QueryPipe.cs:52-57)"),

    Q("q18_global_agg",
      (s, dir) =>
        Tables.load(s, dir, "lineitem")
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            dsum(col("l_extendedprice")).as("total_price"),
            min(col("l_shipdate").cast("date")).as("min_ship"),
            max(col("l_shipdate").cast("date")).as("max_ship")),
      Some("""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS total_price,
        CAST(MIN(l_shipdate) AS DATE) AS min_ship,
        CAST(MAX(l_shipdate) AS DATE) AS max_ship
        FROM lineitem"""),
      "select-all global aggregate (QueryPipe.cs:103-121)"),

    Q("q19_ref_semantics",
      (s, dir) => {
        import graft.functions.RefFunctions._
        // mixed string column: numeric strings + 'N/A' markers — the
        // reference's AVG/SUM silently skip non-numerics
        val ev = Tables.load(s, dir, "events")
          .withColumn("v_str", when(col("event_type") === "error", lit("N/A"))
            .otherwise(col("value").cast("decimal(18,2)").cast("string")))
        ev.groupBy("user_id").agg(
          sumLenient(col("v_str")).as("sum_v"),
          avgLenient(col("v_str")).as("avg_v"),
          count(when(isNumeric(col("v_str")), 1)).as("n_numeric"),
          max(dateDiffTrunc("hour", col("ts"),
            lit("2024-02-01 00:00:00").cast("timestamp"))).as("max_age_h"))
      },
      Some(s"""WITH e AS (SELECT user_id, ts,
          CASE WHEN event_type = 'error' THEN 'N/A'
               ELSE CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END AS v_str
          FROM events),
        n AS (SELECT user_id, ts, v_str,
          REGEXP_MATCHES(TRIM(v_str),
            '^[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?$$') AS is_num FROM e)
        SELECT user_id,
          CAST(SUM(CASE WHEN is_num THEN CAST(v_str AS DECIMAL(28,8)) END)
            AS DOUBLE) AS sum_v,
          CAST(SUM(CASE WHEN is_num THEN CAST(v_str AS DECIMAL(28,8)) END)
            AS DOUBLE) / COUNT(CASE WHEN is_num THEN 1 END) AS avg_v,
          COUNT(CASE WHEN is_num THEN 1 END) AS n_numeric,
          MAX((EPOCH_US(TIMESTAMP '2024-02-01 00:00:00') - EPOCH_US(ts))
            // 3600000000) AS max_age_h
        FROM n GROUP BY user_id"""),
      "pinned reference quirks: lenient SUM/AVG (Aggregate.cs:76-114) + " +
        "truncating DATEDIFF (Date.cs:108-130)"),

    // Z-order (Morton) layout key — the multi-column data-skipping
    // layout: interleave the bits of two dimensions so each file of a
    // z-sorted write covers a small RECTANGLE of (a, b) space and
    // parquet min/max stats prune scans on EITHER column. The key is
    // pure long arithmetic (core/Layout.zValue — shifts and masks, no
    // UDF); the per-cell min/max spans in the output ARE the locality
    // proof (every 1024-key cell covers a 32x32 rectangle of the
    // 256x256 grid). Shape: map-side key + ONE partial-agg shuffle.
    Q("q110_zorder_key",
      (s, dir) => {
        val li = Tables.load(s, dir, "lineitem")
        val a = col("l_orderkey") % 256
        val b = col("l_partkey") % 256
        li.select(graft.core.Layout.zValue(a, b, bits = 8).as("z"),
            a.as("a"), b.as("b"))
          .groupBy(shiftright(col("z"), 10).as("z_cell"))
          .agg(count(lit(1)).as("n"),
            min(col("a")).as("a_min"), max(col("a")).as("a_max"),
            min(col("b")).as("b_min"), max(col("b")).as("b_max"))
      },
      Some(zorderOracleSql),
      "Z-order layout key: bit-interleaved (orderkey, partkey) cells " +
        "with their min/max rectangles — the multi-column data-skipping " +
        "layout, computed as pure codegen long arithmetic"),

    Q("q119_sys_table_stats",
      (s, dir) => {
        val tables = Seq("region", "nation", "customer", "supplier",
          "part", "orders", "lineitem", "events", "documents", "embeddings")
        graft.catalog.SystemCollections
          .tableStats(s, tables.map(t => t -> s"$dir/$t.parquet"))
          .select(col("tbl"), col("num_rows"))
      },
      Some(Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        .map(t => s"SELECT '$t' AS tbl, COUNT(*) AS num_rows FROM $t")
        .mkString("\n        UNION ALL ")),
      "$dump system collection (SysDump.cs / SysPageList.cs analog): " +
        "per-table row counts from the distributed parquet-footer " +
        "manifest — zero data pages read; must equal COUNT(*)"),

    // PIVOT to the bounded event-type taxonomy. Shipped as conditional
    // aggregation — count(when(type=t)) per value — which is ONE shuffle
    // of |users| pre-aggregated rows. The .pivot(values) API plans a
    // (key, type) pre-aggregate + pivotfirst = TWO exchanges, and an
    // *inferred* value list adds a distinct-collect job on top; PlanSpec
    // gates the 1-exchange form, QueriesSpec pins that it is row-equal
    // to the .pivot API.
    Q("q130_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val aggs = types.map(t =>
          count(when(col("event_type") === t, 1)).as(s"n_$t"))
        Tables.load(s, dir, "events")
          .groupBy("user_id")
          .agg(aggs.head, aggs.tail: _*)
      },
      Some("""SELECT user_id,
        COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events GROUP BY 1"""),
      "PIVOT to the bounded type taxonomy (conditional-aggregation form: " +
        "one shuffle; row-equal to the .pivot API, which plans two)"),

    // UNPIVOT (melt): wide metric columns to (key, metric, val) rows via
    // the native unpivot operator — an in-plan Expand, never a UNION of
    // per-column scans (which would read the table K times).
    Q("q131_unpivot",
      (s, dir) =>
        Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_size").cast("double").as("size"),
            col("p_retailprice").as("retailprice"))
          .unpivot(Array(col("p_partkey")),
            Array(col("size"), col("retailprice")), "metric", "val"),
      Some("""SELECT p_partkey, 'size' AS metric,
          CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val
        FROM part"""),
      "UNPIVOT/melt via the native operator (single scan + Expand; the " +
        "SQL-92 UNION-ALL form the oracle uses reads the table per metric)")
  )

  /** DuckDB replica of Layout.zValue(bits=8) over the same mod-256
    * dimensions: the interleave is spelled as the same shift/mask/add
    * terms the Scala fold produces. Generated, not hand-written.
    */
  lazy val zorderOracleSql: String = {
    val terms = (0 until 8).flatMap(i => Seq(
      s"(((a >> $i) & 1) << ${2 * i})", s"(((b >> $i) & 1) << ${2 * i + 1})"))
    s"""WITH m AS (
        SELECT l_orderkey % 256 AS a, l_partkey % 256 AS b FROM lineitem),
      z AS (SELECT a, b, (${terms.mkString(" + ")}) AS z FROM m)
      SELECT CAST(z >> 10 AS BIGINT) AS z_cell, COUNT(*) AS n,
        MIN(a) AS a_min, MAX(a) AS a_max, MIN(b) AS b_min, MAX(b) AS b_max
      FROM z GROUP BY 1"""
  }
}
