package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only ANN quality probe for the SCALE.md record: measure IVF
  * recall@k and probe cost on a data directory's embeddings table.
  *
  *   runMain graft.RecallProbe <dir> [nlist] [nProbe] [k] [nQueries]
  *
  * Prints one JSON line: {"dir":…,"n":…,"nlist":…,"n_probe":…,
  * "recall_at_k":…,"scan_fraction":…,"brute_ms":…,"ivf_ms":…}.
  * The timing pair is the per-query mean wall time of the brute-force
  * top-k vs the IVF probe over the same cached assignment — the
  * speed-for-recall trade the SCALE.md table reports.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 20
    val nProbe = if (args.length > 2) args(2).toInt else 4
    val k = if (args.length > 3) args(3).toInt else 10
    val nQueries = if (args.length > 4) args(4).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Similarity
    val e = graft.core.Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
    val n = e.count()
    // train ONCE: the quality measurement and the timing loop share the
    // same (deterministic) centroids
    val cents = Similarity.kmeansTrain(e, "vec_id", "embedding", nlist, 3)
    val (recall, scanned) = Similarity.recallAtK(
      e, "vec_id", "embedding", nlist, nProbe, k, nQueries, Some(cents))
    val assigned = Similarity.ivfAssign(e, "vec_id", "embedding", cents).cache()
    assigned.count()
    val qs = assigned.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val bruteMs = qs.map { case (qid, qv) => timeMs(
      Similarity.cosineTopK(assigned.filter(col("vec_id") =!= qid),
        "vec_id", "embedding", qv, k).collect()) }.sum / qs.length
    val ivfMs = qs.map { case (qid, qv) => timeMs(
      Similarity.ivfTopK(assigned.filter(col("vec_id") =!= qid),
        "vec_id", "embedding", qv, k, cents, nProbe).collect()) }.sum / qs.length

    println(s"""{"dir":"$dir","n":$n,"nlist":$nlist,"n_probe":$nProbe""" +
      s""","k":$k,"n_queries":$nQueries""" +
      f""","recall_at_k":$recall%.4f,"scan_fraction":$scanned%.4f""" +
      f""","brute_ms":$bruteMs%.1f,"ivf_ms":$ivfMs%.1f}""")
    spark.stop()
  }
}
