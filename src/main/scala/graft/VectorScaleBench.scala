package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev-only IVF-at-production-scale measurement (the SCALE.md vector
  * record): synthesize N clustered vectors (deterministic — seeded
  * driver-side centers + hash-based per-row noise), train k-means at
  * production nlist on a SAMPLE (the offline-training shape: Lloyd cost
  * is sample-bound, not corpus-bound), assign the full corpus once
  * (ingest-time `cell`), then measure recall@k and scan fraction for
  * brute-force-vs-IVF over the SAME data.
  *
  *   runMain graft.VectorScaleBench [n] [nlist] [sample] [iters]
  *
  * Prints one JSON line per probed nProbe.
  */
object VectorScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nlist = if (args.length > 1) args(1).toInt else 1024
    val sampleN = if (args.length > 2) args(2).toInt else 50000
    val iters = if (args.length > 3) args(3).toInt else 2
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    // ground-truth cluster structure: nlist seeded centers; every row's
    // vector = center(id % nlist) + small hash noise (fully
    // deterministic, so reruns measure the same corpus)
    val rnd = new scala.util.Random(42)
    val centers: Seq[Seq[Float]] =
      Seq.fill(nlist)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val c2d = typedLit(centers)
    def synth(rows: Long): DataFrame =
      spark.range(rows).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          p => element_at(
            element_at(c2d, (col("id") % nlist).cast("int") + 1),
            p.cast("int")) +
            (pmod(hash(col("id"), p), lit(1000)).cast("float") / lit(10000f)))
          .cast("array<float>").as("embedding"))

    def timed[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[vecbench] $what%-18s $s%.1f s")
      (r, s)
    }

    val corpus = synth(n).cache()
    corpus.count() // materialize generation outside the timings

    // offline training on a bounded sample — nlist scales with the
    // corpus but Lloyd's cost scales with the SAMPLE
    val sample = corpus.filter(col("vec_id") % (n / sampleN).max(1) === 0)
    val (cents, trainSec) = timed(s"train k=$nlist")(
      Similarity.kmeansTrain(sample, "vec_id", "embedding", nlist, iters))

    // ingest-time assignment of the FULL corpus (the one pass whose
    // cost is corpus×nlist — measured, because at nlist=1024 the
    // assignment expression is a 1024-way codegen fold)
    val (assigned, assignSec) = timed(s"assign n=$n") {
      val a = Similarity.ivfAssign(corpus, "vec_id", "embedding", cents)
        .cache()
      a.count()
      a
    }

    // spread queries across the corpus; fall back to the first rows for
    // tiny smoke-sized n (an empty query set would NaN the recall)
    val step = math.max(1, n / 10)
    val qs0 = assigned.filter(col("vec_id") % lit(step) === lit(3 % step))
      .limit(10).select(col("vec_id"), col("embedding")).collect()
    val qs = (if (qs0.nonEmpty) qs0
      else assigned.orderBy(col("vec_id")).limit(10)
        .select(col("vec_id"), col("embedding")).collect())
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(qs.nonEmpty, s"no query vectors at n=$n")
    for (nProbe <- Seq(8, 16, 32)) {
      val (per, probeSec) = timed(s"probe np=$nProbe") {
        qs.map { case (qid, qv) =>
          val others = assigned.filter(col("vec_id") =!= qid)
          val brute = Similarity.cosineTopK(
            others, "vec_id", "embedding", qv, 10)
            .select(col("vec_id").cast("long")).collect()
            .map(_.getLong(0)).toSet
          val approx = Similarity.ivfTopK(
            others, "vec_id", "embedding", qv, 10, cents, nProbe)
            .select(col("vec_id").cast("long")).collect()
            .map(_.getLong(0)).toSet
          val probes = Similarity.nearestCentroids(qv, cents, nProbe)
          val scanned = assigned.filter(col("cell").isin(probes: _*))
            .count().toDouble / n
          (brute.intersect(approx).size / 10.0, scanned)
        }.toSeq
      }
      val recall = per.map(_._1).sum / per.size
      val scan = per.map(_._2).sum / per.size
      println(f"""{"metric":"ivf_scale","n":$n,"nlist":$nlist,""" +
        f""""sample":$sampleN,"iters":$iters,"n_probe":$nProbe,""" +
        f""""recall_at_10":$recall%.3f,"scan_fraction":$scan%.4f,""" +
        f""""train_sec":$trainSec%.1f,"assign_sec":$assignSec%.1f,""" +
        f""""probe_sec_10q":$probeSec%.1f}""")
    }
    spark.stop()
  }
}
