package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the event-analytics family (q121-q126); full value
  * parity is the driver's DuckDB gate.
  */
class EventQueriesSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, Sf0001)

  test("q121 funnel: stage k reached iff t_k set, and times strictly advance") {
    val rows = run("q121_funnel_steps").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("reached_stage")
      val ts = Seq("t1_us", "t2_us", "t3_us").map(c =>
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c)))
      assert(ts.count(_.isDefined) == stage,
        s"stage $stage but times $ts for user ${r.getAs[Long]("user_id")}")
      ts.flatten.sliding(2).foreach {
        case Seq(a, b) => assert(a < b, s"non-advancing funnel times $ts")
        case _ =>
      }
    }
  }

  test("q123 band range join equals the naive nested-loop form") {
    val banded = run("q123_band_range_join")
    val part = graft.core.Tables.load(spark, Sf0001, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val naive = graft.core.Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_extendedprice"))
      .crossJoin(part)
      .filter(col("l_extendedprice")
        .between(col("p_retailprice") * 0.99, col("p_retailprice") * 1.01))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_close"))
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("q126 hopping windows: every event lands in exactly 4 windows") {
    val perType = run("q126_hopping_window")
      .groupBy("event_type").agg(sum(col("n")).as("window_rows"))
    val events = graft.core.Tables.load(spark, Sf0001, "events")
      .groupBy("event_type").agg((count(lit(1)) * 4).as("expected"))
    val bad = perType.join(events, "event_type")
      .filter(col("window_rows") =!= col("expected"))
    assert(bad.count() == 0)
  }

  test("q125 attribution: purchase credit conserves the purchase count") {
    val attributed = run("q125_last_touch_attribution")
      .agg(sum(col("n_purchases"))).collect()(0).getLong(0)
    val purchases = graft.core.Tables.load(spark, Sf0001, "events")
      .filter(col("event_type") === "purchase").count()
    assert(attributed == purchases)
  }

  test("q129 training order: offsets are a dense permutation per shard " +
    "and the order is reproducible") {
    val a = run("q129_training_order").collect()
    val b = run("q129_training_order").collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    a.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      val offs = rows.map(_.getAs[Long]("offset")).sorted
      assert(offs.sameElements(offs.indices.map(_.toLong)))
    }
  }

  test("q133 transition matrix: each row's outgoing probabilities sum to 1") {
    val rows = run("q133_transition_matrix").collect()
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (t, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$t sums to $total")
    }
  }

  test("q132 paths: every step is a known type and each event starts at " +
    "most one path") {
    val types = Set("click", "error", "purchase", "signup", "view")
    val rows = run("q132_event_paths").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("step1", "step2", "step3").foreach(c =>
        assert(types(r.getAs[String](c))))
    }
    val nPaths = rows.map(_.getAs[Long]("n")).sum
    val nEvents = graft.core.Tables.load(spark, Sf0001, "events").count()
    assert(nPaths <= nEvents)
  }

  test("q134 outliers: bounded by the group size and mean inside the " +
    "value range") {
    val ev = graft.core.Tables.load(spark, Sf0001, "events")
      .agg(min(col("value")), max(col("value"))).collect()(0)
    val (lo, hi) = (ev.getDouble(0), ev.getDouble(1))
    run("q134_zscore_outliers").collect().foreach { r =>
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      val m = r.getAs[Double]("mean_r")
      assert(m >= lo && m <= hi)
    }
  }

  test("zscoreOutlierCounts: zero-variance and single-row groups report " +
    "ZERO outliers (NaN z-scores must not flag everything)") {
    import spark.implicits._
    val df = (Seq.fill(50)(("const", 7.0)) ++ Seq(("single", 3.0)) ++
      (1 to 50).map(i => ("vary", i.toDouble)) :+ ("vary", 1e6))
      .toDF("event_type", "value")
    val out = graft.operators.EventOps
      .zscoreOutlierCounts(df, "event_type", "value")
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_outliers")).toMap
    assert(out("const") == 0, out)
    assert(out("single") == 0, out)
    assert(out("vary") == 1, out) // the 1e6 spike, and only it
  }

  test("q135 survives partial funnels: a user stuck at stage 2 yields " +
    "null t3/t4, not an ANSI array error") {
    import spark.implicits._
    val evs = Seq(
      (1L, 100L, 1L, "signup"), (1L, 200L, 2L, "view"), // stops at 2
      (2L, 50L, 3L, "view")) // never signs up: stage 0
      .toDF("user_id", "us", "event_id", "event_type")
    val out = graft.operators.EventOps.funnelN(
        evs, Seq("signup", "view", "click", "purchase"))
      .select(col("user_id"), col("reached_stage"),
        try_element_at(col("stage_ts"), lit(3)).as("t3"),
        try_element_at(col("stage_ts"), lit(4)).as("t4"))
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Int]("reached_stage") == 2)
    assert(out(1L).isNullAt(out(1L).fieldIndex("t3")))
    assert(out(2L).getAs[Int]("reached_stage") == 0)
  }

  test("q124 co-occurrence: pairs are ordered and support <= user count") {
    val rows = run("q124_type_cooccurrence").collect()
    val nUsers = graft.core.Tables.load(spark, Sf0001, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_users") <= nUsers)
    }
  }
}
