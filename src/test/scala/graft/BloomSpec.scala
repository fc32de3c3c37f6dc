package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bloom

class BloomSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("probe never misses a built key (no false negatives)") {
    val keys = (1 to 200).map(i => s"key-$i").toDF("k")
    val bloom = Bloom.build(keys, "k", numHashes = 3, mBits = 4096)
    val hits = Bloom.probe(keys, "k", bloom, numHashes = 3, mBits = 4096)
      .filter(!col("bloom_hit")).count()
    assert(hits == 0L)
  }

  test("a saturated small filter produces false positives; a sized one few") {
    val keys = (1 to 100).map(i => s"member-$i").toDF("k")
    val probes = (1 to 500).map(i => s"absent-$i").toDF("k")
    def fpCount(mBits: Int): Long = {
      val bloom = Bloom.build(keys, "k", numHashes = 3, mBits = mBits)
      Bloom.probe(probes, "k", bloom, numHashes = 3, mBits = mBits)
        .filter(col("bloom_hit")).count()
    }
    val saturated = fpCount(128)   // (1-e^-300/128)^3 ~ 0.74 FP rate
    val sized = fpCount(8192)      // n*k/m = 0.037 -> FP ~ 5e-5
    assert(saturated > 300L, s"saturated filter FPs: $saturated")
    assert(sized < 5L, s"sized filter FPs: $sized")
  }

  test("filter row is dense and word-bounded") {
    val keys = (1 to 50).map(i => s"k$i").toDF("k")
    val row = Bloom.build(keys, "k", numHashes = 3, mBits = 1024).collect()
    assert(row.length == 1)
    val words = row(0).getSeq[Long](0)
    assert(words.length == 32) // 1024 / 32
    // every set bit sits in the 32-bit lane (no overflow into the sign half)
    assert(words.forall(w => (w & 0xFFFFFFFF00000000L) == 0L))
  }

  test("build rejects a word-unaligned size") {
    val keys = Seq("a").toDF("k")
    intercept[IllegalArgumentException] {
      Bloom.build(keys, "k", numHashes = 2, mBits = 100)
    }
  }

  test("guard passes a sized filter through unchanged, fails a saturated one") {
    val keys = (1 to 100).map(i => s"member-$i").toDF("k")
    val sized = Bloom.guard(
      Bloom.build(keys, "k", numHashes = 3, mBits = 8192), 8192)
    // value-identical to the unguarded build
    assert(sized.collect().head.getSeq[Long](0) ==
      Bloom.build(keys, "k", numHashes = 3, mBits = 8192)
        .collect().head.getSeq[Long](0))
    // requireUnsaturated agrees (the action-based twin)
    Bloom.requireUnsaturated(
      Bloom.build(keys, "k", numHashes = 3, mBits = 8192), 8192)

    val saturated = Bloom.guard(
      Bloom.build(keys, "k", numHashes = 3, mBits = 128), 128)
    val e = intercept[Exception] { saturated.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("saturated")))
    intercept[IllegalArgumentException] {
      Bloom.requireUnsaturated(
        Bloom.build(keys, "k", numHashes = 3, mBits = 128), 128)
    }
  }
}
