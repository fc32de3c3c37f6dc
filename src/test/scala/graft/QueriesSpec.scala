package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + golden checks for the query catalog (full oracle parity is the
  * driver's DuckDB gate; these pin cheap invariants and quirky semantics).
  */
class QueriesSpec extends AnyFunSuite {
  import SparkSessionFixture._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, Sf0001)

  test("every catalog query runs and most return rows at sf0.001") {
    val counts = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n).count())
    val empty = counts.filter(_._2 == 0).map(_._1)
    // q08/q52 can legitimately be empty (no orphans/dups in clean data)
    assert(empty.toSet.subsetOf(Set("q08_except", "q52_fk_validate")),
      s"unexpectedly empty: $empty")
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q01 grouped agg: groups are the 6 (returnflag, linestatus) pairs") {
    assert(run("q01_group_agg").count() == 6)
  }

  test("q06 top-k is ordered desc and unique") {
    val prices = run("q06_topk").collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q30 LOCF never rewinds: carried value only changes at purchases") {
    val df = run("q30_locf")
    // every non-null carried value must equal some purchase value of that user
    val ev = graft.core.Tables.load(spark, Sf0001, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value").as("pv")).distinct()
    val bad = df.filter(col("last_purchase_value").isNotNull)
      .join(purchases,
        df("user_id") === purchases("user_id") &&
          df("last_purchase_value") === purchases("pv"), "left_anti")
    assert(bad.count() == 0)
  }

  test("q35 hash chain: previous_hash of first row per user is empty") {
    val firsts = run("q35_hash_chain")
      .groupBy("user_id").agg(count(when(col("previous_hash") === "", 1)).as("n_genesis"))
    assert(firsts.filter(col("n_genesis") =!= 1).count() == 0)
  }

  test("q130: the conditional-aggregation pivot is row-equal to the " +
    ".pivot API form") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val api = graft.core.Tables.load(spark, Sf0001, "events")
      .groupBy("user_id").pivot("event_type", types).agg(count(lit(1)))
      .select(col("user_id") +: types.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
    val shipped = run("q130_pivot")
    assert(shipped.exceptAll(api).isEmpty && api.exceptAll(shipped).isEmpty)
  }

  test("entry() returns the flattened include join") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("person", "amount"))
    assert(df.count() > 0)
  }

  test("q102: no near-dup cluster straddles the train/heldout split") {
    val df = run("q102_leakage_free_split")
    val straddling = df.groupBy("canonical_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddling.count() == 0)
    // the md5 split hash lands near the 80/20 target
    val n = df.count().toDouble
    val train = df.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.7 && train / n < 0.9, s"train frac ${train / n}")
  }

  test("q101: selected docs fit the budget; selection is non-trivial") {
    val df = run("q101_token_budget")
    val sel = df.filter(col("selected"))
      .agg(sum(col("n_toks"))).head().getLong(0)
    assert(sel <= 20000L)
    val nSel = df.filter(col("selected")).count()
    assert(nSel > 0 && nSel < df.count())
  }

  test("q111: every fused row comes from at least one source list") {
    val rows = run("q111_hybrid_rrf").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (lx, vx) = (r.getAs[Int]("lex_rank"), r.getAs[Int]("vec_rank"))
      assert(lx > 0 || vx > 0, r.toString)
      assert(lx <= 20 && vx <= 20, r.toString)
      // rrf matches its rank definition exactly
      val expect =
        (if (lx > 0) math.round(1e9 / (60 + lx)) else 0L) +
          (if (vx > 0) math.round(1e9 / (60 + vx)) else 0L)
      assert(r.getAs[Long]("rrf_n9") == expect, r.toString)
    }
  }

  test("q112: admit verdict is exactly 'no near-dup match in the corpus'") {
    val rows = run("q112_incremental_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("admit") == (r.getAs[Long]("n_dups") == 0L),
        r.toString)
      assert((r.getAs[Double]("max_containment") >= 0.5) ==
        !r.getAs[Boolean]("admit"), r.toString)
    }
  }
}
