package graft.streaming

import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Scheduled "continuous" queries (SURVEY §2.8:
  * `Iot.Database/Queries/QueryExecutionService.cs:12-128` — a registry of
  * QueryConfiguration{Query, IntervalMilliseconds, OnSuccess/OnFailure}
  * re-executed by a 1 s timer, last result cached).
  *
  * Same contract here: register a DataFrame-producing function with an
  * interval; a scheduler re-runs it, caches the collected `lastResult`,
  * and invokes callbacks. Queries run as ordinary Spark jobs, so they
  * scale with the cluster; the scheduler only triggers them.
  * (The reference's slot-17/slot-14 coupling — a point value fed from a
  * registered query, IotValue.cs:299-327 — is the `lastResult` read.)
  */
final class ContinuousQueryService(spark: SparkSession, poolSize: Int = 2) {

  /** `maxResultRows` bounds what each tick collects to the driver: the
    * reference caches LastResult on a single node where the query IS the
    * engine's output; here a registered `SELECT *` over a fact table would
    * otherwise OOM the driver on a timer. 150 mirrors the reference's
    * slot-14 feed limit (IotValue.cs:299-327). Register an aggregate (or
    * write to a result table and keep a handle) for larger results.
    */
  final case class Config(
      name: String,
      query: SparkSession => DataFrame,
      intervalMillis: Long,
      onSuccess: Seq[Row] => Unit = _ => (),
      onFailure: Throwable => Unit = _ => (),
      maxResultRows: Int = 150)

  final class State(val config: Config) {
    @volatile private[ContinuousQueryService] var handle: ScheduledFuture[_] = _
    @volatile var lastResult: Seq[Row] = Nil
    @volatile var lastError: Option[Throwable] = None
    @volatile var executions: Long = 0L
  }

  private val scheduler = Executors.newScheduledThreadPool(poolSize, r => {
    val t = new Thread(r, "graft-continuous-query"); t.setDaemon(true); t
  })
  private val states = new ConcurrentHashMap[String, State]()

  def register(config: Config): Unit = {
    val st = new State(config)
    require(states.putIfAbsent(config.name, st) == null,
      s"duplicate query: ${config.name}")
    st.handle = scheduler.scheduleAtFixedRate(
      () => runOnce(config.name),
      0L, config.intervalMillis, TimeUnit.MILLISECONDS)
  }

  private def runOnce(name: String): Unit = {
    val st = states.get(name)
    if (st == null) return
    try {
      // limit() plans as a bounded collect (CollectLimit) — the cap is
      // enforced executor-side, not by truncating an unbounded collect
      val rows = st.config.query(spark)
        .limit(st.config.maxResultRows).collect().toSeq
      st.lastResult = rows
      st.lastError = None
      st.executions += 1
      st.config.onSuccess(rows)
    } catch {
      case t: Throwable =>
        st.lastError = Some(t)
        st.config.onFailure(t)
    }
  }

  /** Cached last result (the reference's `LastResult`). */
  def lastResult(name: String): Seq[Row] =
    Option(states.get(name)).map(_.lastResult).getOrElse(Nil)

  def executions(name: String): Long =
    Option(states.get(name)).map(_.executions).getOrElse(0L)

  def lastError(name: String): Option[Throwable] =
    Option(states.get(name)).flatMap(_.lastError)

  def unregister(name: String): Unit =
    Option(states.remove(name)).foreach(_.handle.cancel(false))

  def registered: Seq[String] = states.keySet().asScala.toSeq.sorted

  def shutdown(): Unit = {
    states.values().asScala.foreach(_.handle.cancel(false))
    states.clear()
    scheduler.shutdownNow()
  }
}
