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

  // a longer two-key chain for the incremental-cursor cases: p1 has 6
  // blocks, p2 has 3
  private def mkLong() = {
    val rows = ((1 to 6).map(i => ("p1", i * 1000L, i.toLong, s"a=$i")) ++
      (1 to 3).map(i => ("p2", i * 1000L, (100 + i).toLong, s"b=$i")))
      .toDF("key", "ts_us", "id", "data")
    HashChain.build(spark, rows, "key", "ts_us", "id", "data")
  }

  test("verifyIncremental checks only rows past the cursor and agrees " +
      "with the full verify on them") {
    val chain = mkLong()
    // cursor = frontier after the first 4 p1 blocks + 2 p2 blocks
    val prefix = chain.filter(
      (col("key") === "p1" && col("ts_us") <= 4000L) ||
        (col("key") === "p2" && col("ts_us") <= 2000L))
    val cursor = HashChain.cursorFrom(prefix, "key", "ts_us", "id")
    val inc = HashChain.verifyIncremental(
      chain, cursor, "key", "ts_us", "id", "data")
    // exactly the suffix rows, all valid
    assert(inc.select("id").as[Long].collect().toSet == Set(5L, 6L, 103L))
    assert(inc.filter(!col("hash_valid") || !col("link_valid")).count() == 0)
    // agreement with the full verify restricted to the suffix
    val full = HashChain.verify(chain, "key", "ts_us", "id", "data")
      .filter(col("id").isin(5L, 6L, 103L))
      .select("id", "hash_valid", "link_valid")
      .as[(Long, Boolean, Boolean)].collect().toSet
    assert(inc.select("id", "hash_valid", "link_valid")
      .as[(Long, Boolean, Boolean)].collect().toSet == full)
  }

  test("verifyIncremental: tamper in the new suffix is caught; tampering " +
      "the frontier hash breaks the first new row's link") {
    val chain = mkLong()
    val cursor = HashChain.cursorFrom(
      chain.filter(col("key") === "p1" && col("ts_us") <= 4000L),
      "key", "ts_us", "id")

    // data tamper inside the suffix → hash_valid false on that row
    val t1 = chain.withColumn("data",
      when(col("id") === 5L, lit("a=999")).otherwise(col("data")))
    val v1 = HashChain.verifyIncremental(t1, cursor, "key", "ts_us", "id", "data")
    assert(v1.filter(!col("hash_valid")).select("id").as[Long].collect().toSeq
      == Seq(5L))

    // history rewrite AT the frontier (block 4's hash) → the first
    // incremental row's stored previous_hash no longer matches the
    // attested frontier hash in the cursor
    val t2 = cursor.withColumn("cur_hash", lit("deadbeef"))
    val v2 = HashChain.verifyIncremental(chain, t2, "key", "ts_us", "id", "data")
    assert(v2.filter(!col("link_valid")).select("id").as[Long].collect().toSeq
      == Seq(5L))

    // a key with NO cursor row verifies from genesis (p2 fully included)
    val v3 = HashChain.verifyIncremental(chain, cursor, "key", "ts_us", "id", "data")
    assert(v3.filter(col("key") === "p2").count() == 3)
    assert(v3.filter(!col("hash_valid") || !col("link_valid")).count() == 0)
  }

  test("cursor advances across passes: second pass sees only newer rows") {
    val chain = mkLong()
    val c0 = HashChain.cursorFrom(
      chain.filter(col("ts_us") <= 2000L), "key", "ts_us", "id")
    val pass1 = HashChain.verifyIncremental(chain.filter(col("ts_us") <= 4000L),
      c0, "key", "ts_us", "id", "data")
    val c1 = HashChain.cursorFrom(
      chain.filter(col("ts_us") <= 4000L), "key", "ts_us", "id")
    val pass2 = HashChain.verifyIncremental(chain, c1, "key", "ts_us", "id", "data")
    assert(pass1.select("id").as[Long].collect().toSet == Set(3L, 4L, 103L))
    assert(pass2.select("id").as[Long].collect().toSet == Set(5L, 6L))
    assert((pass1.count() + pass2.count()) < chain.count() * 2,
      "incremental passes must not rescan the verified prefix")
  }
}
