package graft.plans

import scala.reflect.ClassTag

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** TYPED physical-plan gates — the load-bearing scale invariants
  * (state probes stay broadcast, range joins never nested-loop, scans
  * keep their pushdown) asserted by pattern-matching `SparkPlan` nodes
  * instead of substring-matching `executedPlan.toString`: a Spark
  * version bump that renames a node, or a plan that happens to carry
  * the substring elsewhere, turns a string gate into a false pass/fail.
  * Shared by the in-query gates (StreamingDedup's probe shape, q123's
  * no-BNLJ band join) and the spec-side plan assertions.
  *
  * All collectors traverse THROUGH adaptive wrappers: with AQE on,
  * `executedPlan` is an [[AdaptiveSparkPlanExec]] whose current plan
  * hangs off a field, not `children`, and materialized stages hide
  * their subtree behind [[QueryStageExec]] — `plan.collect` alone sees
  * neither.
  */
object PlanGates {

  /** Every node of `plan`, descending through AQE wrappers, query
    * stages, and exchange reuse.
    */
  def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      // a persist() hides its subtree behind the cached relation — the
      // gated shape (e.g. StreamingDedup's probe) lives inside it
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(c.relation.cachedPlan)
      case p => p.children
    }
    plan +: kids.flatMap(allNodes)
  }

  def allNodes(df: Dataset[_]): Seq[SparkPlan] =
    allNodes(df.queryExecution.executedPlan)

  /** Nodes of type `T` anywhere in the (adaptive-unwrapped) plan. */
  def nodesOf[T <: SparkPlan : ClassTag](df: Dataset[_]): Seq[T] =
    allNodes(df).collect { case t: T => t }

  def countOf[T <: SparkPlan : ClassTag](df: Dataset[_]): Int =
    nodesOf[T](df).size

  def has[T <: SparkPlan : ClassTag](df: Dataset[_]): Boolean =
    nodesOf[T](df).nonEmpty

  private def fail(label: String, want: String, df: Dataset[_]): Nothing =
    throw new IllegalStateException(
      s"$label: $want\n${df.queryExecution.executedPlan}")

  /** The plan must probe through at least one BroadcastHashJoin and —
    * the actual scale invariant — must NOT fall back to a shuffled
    * join (sort-merge or shuffled-hash would reshuffle the table-scale
    * side every run).
    */
  def assertBroadcastProbe(df: Dataset[_], label: String): Unit = {
    if (!has[BroadcastHashJoinExec](df))
      fail(label, "expected a BroadcastHashJoin probe; the plan lost " +
        "its broadcast shape", df)
    if (has[SortMergeJoinExec](df) || has[ShuffledHashJoinExec](df))
      fail(label, "the probe degraded to a shuffled join (sort-merge / " +
        "shuffled-hash) — the table-scale side would reshuffle", df)
  }

  /** No pair-explosion shapes anywhere: neither a cartesian product nor
    * a broadcast nested-loop join (the planner's fallback for non-equi
    * joins — quadratic scan work at scale).
    */
  def assertNoPairExplosion(df: Dataset[_], label: String): Unit = {
    if (has[BroadcastNestedLoopJoinExec](df))
      fail(label, "plan contains a BroadcastNestedLoopJoin (non-equi " +
        "fallback; quadratic at scale)", df)
    if (has[CartesianProductExec](df))
      fail(label, "plan contains a CartesianProduct", df)
  }

  /** Both: the bounded side broadcasts AND nothing explodes. */
  def assertBroadcastOnly(df: Dataset[_], label: String): Unit = {
    assertBroadcastProbe(df, label)
    assertNoPairExplosion(df, label)
  }

  /** Every join node (any physical strategy) with the given logical
    * join type — e.g. count the LeftAnti joins a masked read plans.
    */
  def joinsOfType(df: Dataset[_],
      jt: org.apache.spark.sql.catalyst.plans.JoinType)
      : Seq[org.apache.spark.sql.execution.joins.BaseJoinExec] =
    nodesOf[org.apache.spark.sql.execution.joins.BaseJoinExec](df)
      .filter(_.joinType == jt)

  /** The scan-level PUSHED filters of every file scan of format
    * `scanKind` ("orc", "parquet", "csv", ...) — typed at the node
    * level for both planner paths: V1 `FileSourceScanExec` (the default
    * for Spark's built-in formats, keyed by its relation's FileFormat)
    * and V2 `BatchScanExec` (keyed by its Scan class). String matching
    * only against the class names the nodes themselves report, never
    * the rendered plan.
    */
  def pushedFilters(df: Dataset[_], scanKind: String): Seq[String] = {
    val kind = scanKind.toLowerCase
    val v1 = nodesOf[org.apache.spark.sql.execution.FileSourceScanExec](df)
      .filter(_.relation.fileFormat.getClass.getSimpleName.toLowerCase
        .contains(kind))
      // pushedDownFilters is protected on the node; its metadata map is
      // the node's own structured surface for exactly this field
      .flatMap(_.metadata.get("PushedFilters").toSeq
        .flatMap(_.stripPrefix("[").stripSuffix("]").split(", ").toSeq)
        .filter(_.nonEmpty))
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val v2 = nodesOf[BatchScanExec](df)
      .filter(_.scan.getClass.getSimpleName.toLowerCase.contains(kind))
      .flatMap { b =>
        b.scan match {
          case o: org.apache.spark.sql.execution.datasources.v2.orc.OrcScan =>
            o.pushedFilters.map(_.toString).toSeq
          case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
            p.pushedFilters.map(_.toString).toSeq
          case _ => Nil
        }
      }
    v1 ++ v2
  }

  /** Back-compat alias of [[pushedFilters]]. */
  def v2PushedFilters(df: Dataset[_], scanKind: String): Seq[String] =
    pushedFilters(df, scanKind)
}
