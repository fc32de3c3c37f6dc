package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the at-rest encryption overhead (`core.FileCrypto`, PME
  * AES-GCM) against plaintext on the same data: stage-write and
  * scan-aggregate times over lineitem at the given SF dir.
  *
  * Usage: `sbt "runMain graft.CryptoBench /root/testdata/sf0.1"` —
  * prints one JSON line; results recorded in SCALE.md.
  */
object CryptoBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .appName("graft-crypto-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val df = graft.core.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
          "l_shipdate", "l_discount")
      df.count() // warm the source read

      def run(opts: Map[String, String]): (Double, Double) = {
        val root = java.nio.file.Files
          .createTempDirectory("graft-cbench").toString
        val log = new graft.catalog.TxLog(spark, root, opts)
        val t0 = System.nanoTime()
        log.commit(Seq(graft.catalog.TxLog.Put("lineitem",
          log.stage("lineitem", df))))
        val tw = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        log.read("lineitem").get
          .groupBy(col("l_orderkey") % 7)
          .agg(sum(col("l_quantity")), avg(col("l_extendedprice")),
            count(col("l_discount")))
          .collect()
        val tr = (System.nanoTime() - t1) / 1e9
        (tw, tr)
      }

      val enc = graft.core.FileCrypto.options("bench-passphrase", "bench-salt")
      // alternate and keep the min of 3 to damp machine noise
      val plain = (1 to 3).map(_ => run(Map.empty))
      val crypt = (1 to 3).map(_ => run(enc))
      val (pw, pr) = (plain.map(_._1).min, plain.map(_._2).min)
      val (cw, cr) = (crypt.map(_._1).min, crypt.map(_._2).min)
      println(f"""{"metric":"crypto_overhead","sf_dir":"$dir","plain_write_s":$pw%.3f,"enc_write_s":$cw%.3f,"plain_read_s":$pr%.3f,"enc_read_s":$cr%.3f,"write_ratio":${cw / pw}%.3f,"read_ratio":${cr / pr}%.3f}""")
    } finally spark.stop()
  }
}
