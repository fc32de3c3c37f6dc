package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the plans that must hold at 100 TB — filters
  * pushed to the parquet scan, dims broadcast (no fact shuffle), top-k as
  * TakeOrderedAndProject (no global sort), aggregates with a map-side
  * partial phase, native vector expressions inside codegen.
  */
class PlanSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import graft.plans.PlanGates
  import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
  import org.apache.spark.sql.execution.TakeOrderedAndProjectExec

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  private def df(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  // typed shape helpers (PlanGates walks through AQE/stage/cache
  // wrappers) — join-strategy and exchange gates assert NODES, never
  // rendered-plan substrings; expression-level checks (partial_,
  // PushedFilters, codegen names) stay string-based by design
  private def assertBroadcastOnly(name: String): Unit =
    PlanGates.assertBroadcastProbe(df(name), name)
  private def assertNoShuffledJoin(name: String): Unit = {
    val d = df(name)
    assert(!PlanGates.has[SortMergeJoinExec](d) &&
      !PlanGates.has[ShuffledHashJoinExec](d),
      d.queryExecution.executedPlan.toString)
  }
  private def assertNoJoin(name: String): Unit = {
    val d = df(name)
    assert(PlanGates
      .nodesOf[org.apache.spark.sql.execution.joins.BaseJoinExec](d).isEmpty,
      d.queryExecution.executedPlan.toString)
  }

  test("q02: filters reach the parquet scan (PushedFilters)") {
    val p = plan("q02_filter_project")
    // plan string truncates the list; presence of the leading pushed
    // filters proves the scan-level pushdown happened
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount), IsNotNull(l_returnflag), GreaterThanOrEqual"), p)
  }

  test("q02: scan reads only the projected+filtered columns") {
    val p = plan("q02_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(!readSchema.contains("l_tax"), readSchema)
  }

  test("q03: both dimension joins are broadcast (fact side never shuffles)") {
    val d = df("q03_join_broadcast_dims")
    assert(PlanGates.countOf[BroadcastHashJoinExec](d) == 2,
      d.queryExecution.executedPlan.toString)
    assertNoShuffledJoin("q03_join_broadcast_dims")
  }

  test("q06: top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(PlanGates.has[TakeOrderedAndProjectExec](df("q06_topk")))
  }

  test("q01: aggregation has a map-side partial phase") {
    val p = plan("q01_group_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p)
  }

  test("q40: cosine scan uses the native codegen expression") {
    val p = plan("q40_cosine_topk")
    assert(p.contains("cosine_similarity"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("q54: INCLUDE hydration broadcasts the dimension") {
    assertBroadcastOnly("q54_include_hydrate")
  }

  test("q09: semi/anti joins stay semi/anti (no row explosion)") {
    val d = df("q09_semi_anti")
    assert(PlanGates.joinsOfType(d,
      org.apache.spark.sql.catalyst.plans.LeftSemi).nonEmpty)
    assert(PlanGates.joinsOfType(d,
      org.apache.spark.sql.catalyst.plans.LeftAnti).nonEmpty)
  }

  test("q47: IVF assignment is a per-row fold — no join, no window, no exchange") {
    val p = plan("q47_ann_ivf")
    // the centroids ride in the plan as one literal array; assignment must
    // not expand rows (old form: crossJoin ×nlist + row_number argmin)
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q45: embedding near-dup pairs never do an unblocked self-join") {
    val exec = SparkEntry.queries("q45_embed_dup_pairs")(spark, Sf0001)
      .queryExecution.executedPlan
    val p = exec.toString
    // candidate generation must be an equi-join on the bounded (cell,
    // label) block key — never a cross/nested-loop pair expansion
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.exists(l => l.contains("ShuffledHashJoin") &&
      l.contains("cell")), p)
    // both self-join sides canonicalize to the SAME exchange (sameResult is
    // the check AQE's runtime exchange-reuse applies), so the assignment +
    // shuffle runs once, not once per join side. AdaptiveSparkPlanExec has
    // no children — collect over its pre-adaptive input plan.
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    val exs = inner.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exs.size == 2 && exs.head.sameResult(exs.last), p)
  }

  test("q77: ingest-time IVF — probe filter prunes partitions at the scan, " +
      "no inline assignment expression in the query plan") {
    val exec = SparkEntry.queries("q77_ann_ivf_bucketed")(spark, Sf0001)
      .queryExecution.executedPlan
    val p = exec.toString
    // cell was materialized at write: the probe-side plan must not contain
    // the O(nlist) assignment tree (least over (l2, cid) structs)
    assert(!p.contains("least("), p)
    assert(!p.contains("l2_distance"), p)
    // the isin(probes) filter is a partition filter: only the 2 probed
    // cell directories are read (nProbe=2 of the table's cell partitions)
    assert(p.contains("PartitionFilters") && p.contains("cell"), p)
    val scans = exec.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, p)
    assert(scans.head.selectedPartitions.partitionCount == 2, p)
  }

  test("q46: blocked clustering is one shuffle (no iterative exchanges)") {
    // count Exchange operators downstream of the pair aggregation: the
    // union-find stage adds exactly one (on the block key)
    val p = plan("q46_dup_clusters")
    assert(p.contains("MapGroups") || p.contains("mapGroups") ||
      p.contains("FlatMapGroups"), p)
  }

  test("q43: LSH bucket filter prunes before the cosine top-k") {
    val p = plan("q43_ann_lsh")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q84: the corpus side of decontamination joins only via broadcast") {
    // eval buckets, candidates, and eval shingle sets all broadcast; the
    // 100 TB corpus scan must never feed a shuffled join
    assertBroadcastOnly("q84_fuzzy_decontam")
  }

  test("q82: kmeans step is one aggregation — fold assignment, no join") {
    val p = plan("q82_kmeans_step")
    assert(p.contains("HashAggregate") && p.contains("partial_"), p)
    assertNoJoin("q82_kmeans_step")
    assert(!p.contains("Window"), p)
  }

  test("q95: the Gopher rule filter is a shuffle-free projection") {
    val p = plan("q95_gopher_rules")
    assert(!p.contains("Exchange"), p)
    assertNoJoin("q95_gopher_rules")
    assert(!p.contains("Window"), p)
  }

  test("q97: bloom probe never shuffles the corpus side") {
    // build-side exchanges are bounded (<= m/32 words); the probe path
    // must be broadcast-only — no sort-merge / shuffled-hash join
    assertNoShuffledJoin("q97_bloom_blocklist")
  }

  test("q99: native winnowing is a shuffle-free codegen map") {
    val p = plan("q99_winnowing")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("winnow_fps"), p)
  }

  test("q98: the classifier step is one partial-agg aggregation, no join") {
    val p = plan("q98_logreg_quality_step")
    assert(p.contains("partial_"), p)
    assertNoJoin("q98_logreg_quality_step")
    assert(!p.contains("Window"), p)
  }

  test("q103: all data-quality rules ride one aggregation, no join") {
    val p = plan("q103_data_quality")
    assert(p.contains("partial_"), p)
    assertNoJoin("q103_data_quality")
  }

  test("q104: SCD2's two window passes share one key-partitioned shuffle") {
    val p = plan("q104_scd2_history")
    assertNoJoin("q104_scd2_history")
    assert(p.split("Exchange").length - 1 <= 1, p)
  }

  test("q105: quantization is a shuffle-free map") {
    val p = plan("q105_embedding_quantize")
    assert(!p.contains("Exchange"), p)
    assertNoJoin("q105_embedding_quantize")
  }

  test("q106: BM25 top-k is TakeOrdered; model joins never sort-merge") {
    val d = df("q106_bm25_topk")
    assert(PlanGates.has[TakeOrderedAndProjectExec](d))
    // idf/stats attach by broadcast — the (doc, term) side never
    // shuffles for them (its only exchange is its own partial agg)
    assert(!PlanGates.has[SortMergeJoinExec](d))
  }

  test("q108: the vocab membership probe broadcasts the bounded vocab") {
    assertBroadcastOnly("q108_oov_rate")
    // the vocab itself comes from TakeOrdered partials, not a global sort
    assert(PlanGates.has[TakeOrderedAndProjectExec](df("q108_oov_rate")))
  }

  test("q112: the corpus side of incremental dedup joins only via broadcast") {
    // the increment (batch) is the small side everywhere; the corpus
    // stream must never sort-merge / shuffle-hash against it
    assertNoShuffledJoin("q112_incremental_dedup")
  }

  test("q113: the BPE merge loop runs on the vocab side only (broadcast back)") {
    val qe = SparkEntry.queries("q113_bpe_encode")(spark, Sf0001).queryExecution
    val p = qe.executedPlan.toString
    // the re-attach broadcasts the encoded vocab; the corpus-sized token
    // stream never sorts/shuffles for it
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the REPLACE chain sits above the distinct-vocab Aggregate — i.e.
    // inside the Aggregate's own output expressions or a Project over it
    // — never on the corpus stream (whose branch has no Aggregate below
    // the join). The optimized logical plan prints expressions in full.
    val lp = qe.optimizedPlan.toString
    val replaceLines = lp.linesIterator.filter(_.contains("replace(")).toSeq
    assert(replaceLines.nonEmpty, lp)
    assert(replaceLines.forall(_.contains("Aggregate [w")),
      "replace chain must be attached to the vocab aggregate branch\n" + lp)
  }

  test("q110: the z-order key is map-side — one partial-agg exchange total") {
    val p = plan("q110_zorder_key")
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("partial_"), p)
    assert(p.split("Exchange").length - 1 <= 1, p)
  }

  test("q120: simhash banding self-joins in-bucket on one reused exchange " +
      "(never a cross pair expansion)") {
    val exec = SparkEntry.queries("q120_simhash_neardup")(spark, Sf0001)
      .queryExecution.executedPlan
    val p = exec.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.exists(l => l.contains("ShuffledHashJoin") &&
      l.contains("bucket")), p)
    // both sides of the in-bucket self-join canonicalize to the SAME
    // bucket-partitioned exchange (the q45 pattern): the fingerprint
    // computation + explode + shuffle runs once, not once per side
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    val exs = inner.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("bucket") => e
    }
    assert(exs.size == 2 && exs.head.sameResult(exs.last), p)
  }

  test("q121: the funnel fold is ONE shuffle with a map-side partial " +
    "collect, and the stage filter is pushed to the scan") {
    val p = plan("q121_funnel_steps")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_collect_list"), p)
    assert(p.contains("PushedFilters: [In(event_type"), p)
  }

  test("q123: the banded range join plans as an equi-join on the band " +
    "key, never a nested-loop or cartesian") {
    val df = SparkEntry.queries("q123_band_range_join")(spark, Sf0001)
    // typed gate (PlanGates): no pair-explosion node anywhere in the
    // adaptive-unwrapped plan
    graft.plans.PlanGates.assertNoPairExplosion(df, "q123")
    // and the band join really is an equi hash join keyed on the grid
    // bucket (_b) — typed node, string only for the key name
    val hashJoins = (graft.plans.PlanGates
      .nodesOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec](df)
      .map(j => j.leftKeys ++ j.rightKeys) ++
      graft.plans.PlanGates
        .nodesOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec](df)
        .map(j => j.leftKeys ++ j.rightKeys))
    assert(hashJoins.exists(_.exists(_.toString.contains("_b"))),
      df.queryExecution.executedPlan.toString)
  }

  test("q126: hopping windows expand in-plan (Expand), not via a join " +
    "against a window table") {
    val p = plan("q126_hopping_window")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p)
  }

  test("q130: explicit-value pivot is ONE hash aggregate with a map-side " +
    "partial (no distinct-collect pre-job, no extra exchange)") {
    val p = plan("q130_pivot")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_pivotfirst") || p.contains("partial_count"), p)
  }

  test("q131: unpivot is a single scan + Expand, not per-metric unions") {
    val p = plan("q131_unpivot")
    assert(p.contains("Expand"), p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q132/q133: path mining reads the events scan once — leads ride " +
    "one window pass, no self-join") {
    for (q <- Seq("q132_event_paths", "q133_transition_matrix")) {
      val p = plan(q)
      assert("FileScan parquet".r.findAllIn(p).size == 1, s"$q: $p")
      assert(!p.contains("Join"), s"$q: $p")
    }
  }

  test("q134: the per-type stats come back via broadcast — the event " +
    "stream never sort-merges") {
    val p = plan("q134_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
