package graft.core

import org.apache.spark.sql.SparkSession

/** Job labelling (optimization guide §1.5): wrap a library phase so its
  * Spark jobs carry a `spark.job.description` naming the phase — the
  * UI, listeners, and graft.ProfileQuery then attribute wall time to
  * engine phases (staging write, constraint check, hit-file probe, feed
  * stage, ...) instead of to whatever callsite the thread happened to
  * inherit (streaming threads pin their callsite to the query start, so
  * stage names alone cannot attribute foreachBatch work).
  *
  * Thread-local set/restore: concurrent phases (validate || stage) each
  * label their own thread's jobs and never clobber each other.
  */
object JobLabel {
  def apply[T](spark: SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft: $label")
    try body
    finally sc.setJobDescription(prev)
  }
}
