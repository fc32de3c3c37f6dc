package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only embeddings scale-up for the ANN recall probe at non-toy N:
  * replicate a directory's embeddings table `factor`× with a
  * DETERMINISTIC small per-replica jitter.
  *
  *   runMain graft.EmbScale <srcDir> <dstDir> <factor> [jitter]
  *
  * Why jitter instead of GenScale's exact copies: identical vectors
  * produce cosine TIES, so a brute-force top-k and an IVF top-k can
  * legitimately disagree on tie-breaks and recall@k reads artificially
  * low. A ±jitter/2 perturbation (sin over (vec_id, position, replica)
  * — codegen-able, reproducible, no RNG) keeps every replica in the
  * source's cluster topology while making neighbors unambiguous.
  * Replica 0 stays byte-exact.
  */
object EmbScale {
  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val jitter = if (args.length > 3) args(3).toDouble else 0.05
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.core.Tables.load(spark, src, "embeddings")
    val vecBase = e.agg(max(col("vec_id"))).head().getLong(0) + 1
    val out = e.crossJoin(spark.range(factor).select(col("id").as("_r")))
      .select(
        (col("vec_id") + col("_r") * vecBase).as("vec_id"),
        when(col("_r") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * lit(7.3) + i.cast("double") * lit(1.7) +
              col("_r") * lit(13.1)) * lit(jitter)).cast("float")))
          .as("embedding"),
        col("label"))
      .repartition(32)
    out.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[embscale] ${spark.read.parquet(s"$dst/embeddings.parquet").count()} vectors")
    spark.stop()
  }
}
