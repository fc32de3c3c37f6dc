package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (optimization guide §1): run one or more catalog
  * queries under a SparkListener and attribute wall time to Spark jobs
  * by submission callsite — plus the "no job running" gap, which is
  * driver-side work (commit I/O, footer harvest, planning, checkpoint
  * writes). Usage:
  *
  *   runMain graft.ProfileQuery <sfDir> <q1,q2,...> [repeat]
  *
  * Same session shape as graft.Bench so numbers are comparable.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args(1).split(",").toSeq
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.load(spark, sfDir, "region").count()

    final case class J(var start: Long = 0L, var end: Long = 0L,
        var site: String = "?", var desc: String = "")
    val jobs = new TrieMap[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(js.jobId, J())
        j.start = js.time
        j.site = Option(js.properties.getProperty("callSite.short")).getOrElse("?")
        j.desc = Option(js.properties.getProperty("spark.job.description"))
          .getOrElse("")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
    })

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known e.g. " +
          SparkEntry.queries.keys.take(5).mkString(",")))
      (1 to repeat).foreach { it =>
        jobs.clear()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // let listener events drain
        val done = jobs.values.filter(_.end > 0).toSeq
        val sumJobs = done.map(j => j.end - j.start).sum / 1e3
        // union of job intervals → the wall fraction with NO job running
        // is driver-side work
        val iv = done.map(j => (j.start, j.end)).sortBy(_._1)
        val covered = iv.foldLeft((0L, Long.MinValue)) {
          case ((acc, hi), (s, e)) =>
            if (s > hi) (acc + (e - s), e)
            else if (e > hi) (acc + (e - hi), e)
            else (acc, hi)
        }._1 / 1e3
        println(f"[profile] == $name#$it rows=$rows wall=$wall%.2f s " +
          f"jobs=${done.size} sum=$sumJobs%.2f s covered=$covered%.2f s " +
          f"gap=${wall - covered}%.2f s")
        done.groupBy(j => (j.site, j.desc)).toSeq
          .map { case ((site, desc), js) =>
            (js.map(j => j.end - j.start).sum / 1e3, js.size, site, desc) }
          .sortBy(-_._1).take(40)
          .foreach { case (t, c, site, desc) =>
            val d = if (desc.nonEmpty && desc != name) s"  [$desc]" else ""
            println(f"[profile]   $t%8.3f s n=$c%-4d $site$d")
          }
      }
    }
    spark.stop()
  }
}
