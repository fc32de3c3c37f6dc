package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.chain.HashChain

class HashChainSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def mkChain() = {
    val rows = Seq(
      ("p1", 1000L, 1L, "v=10"),
      ("p1", 2000L, 2L, "v=20"),
      ("p1", 3000L, 3L, "v=30"),
      ("p2", 1500L, 4L, "v=99")
    ).toDF("key", "ts_us", "id", "data")
    HashChain.build(spark, rows, "key", "ts_us", "id", "data")
  }

  test("build: genesis previous_hash empty; hash covers predecessor") {
    val c = mkChain().orderBy("id").collect()
    assert(c(0).getAs[String]("previous_hash") == "")
    assert(c(1).getAs[String]("previous_hash") == c(0).getAs[String]("hash"))
    assert(c(2).getAs[String]("previous_hash") == c(1).getAs[String]("hash"))
    assert(c(3).getAs[String]("previous_hash") == "") // p2 genesis
  }

  test("verify: untampered chain is fully valid") {
    val v = HashChain.verify(mkChain(), "key", "ts_us", "id", "data")
    assert(v.filter(!col("hash_valid") || !col("link_valid")).count() == 0)
  }

  test("verify: tampering a row's data flips its hash_valid") {
    val tampered = mkChain().withColumn("data",
      when(col("id") === 2L, lit("v=9999")).otherwise(col("data")))
    val v = HashChain.verify(tampered, "key", "ts_us", "id", "data")
      .filter(!col("hash_valid")).select("id").as[Long].collect().toSeq
    assert(v == Seq(2L))
  }

  test("verify: rewriting a hash breaks the successor's link") {
    val tampered = mkChain().withColumn("hash",
      when(col("id") === 2L, lit("deadbeef")).otherwise(col("hash")))
    val v = HashChain.verify(tampered, "key", "ts_us", "id", "data")
    assert(v.filter(!col("hash_valid")).select("id").as[Long].collect().toSeq == Seq(2L))
    assert(v.filter(!col("link_valid")).select("id").as[Long].collect().toSeq == Seq(3L))
  }
}
