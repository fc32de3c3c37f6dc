package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("saltedInnerJoin preserves exact join multiplicity") {
    // hot key 1 has 1000 rows; plain vs salted join must agree exactly
    val left = ((1 to 1000).map(i => (1L, i)) ++ Seq((2L, 0), (3L, 0)))
      .toDF("k", "payload")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).groupBy("k", "tag")
      .count().orderBy("k").as[(Long, String, Long)].collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", buckets = 8)
      .groupBy("k", "tag").count().orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(salted == plain)
    assert(salted == Seq((1L, "a", 1000L), (2L, "b", 1L)))
  }

  test("hotKeys flags only the skewed key") {
    val df = ((1 to 1000).map(_ => Tuple1(1L)) ++ (2 to 20).map(i => Tuple1(i.toLong)))
      .toDF("k")
    val hot = SkewJoin.hotKeys(df, "k").select("k").as[Long].collect().toSeq
    assert(hot == Seq(1L))
  }
}
