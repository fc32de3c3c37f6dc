package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

class LayoutSpec extends AnyFunSuite {
  import SparkSessionFixture._

  test("bucketed join on the bucket key has no shuffle exchange") {
    val o = Tables.load(spark, Sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, Sf0001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Layout.saveBucketed(o, "orders_b", "o_orderkey", 8)
    Layout.saveBucketed(li, "lineitem_b", "o_orderkey", 8)
    try {
      val joined = Layout.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() ==
        Tables.load(spark, Sf0001, "lineitem").count()) // FK: every line matches
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("date partitioning prunes partitions under a date predicate") {
    val tmp = Files.createTempDirectory("graft-layout").toString
    val ev = Tables.load(spark, Sf0001, "events")
      .withColumn("date", to_date(col("ts")))
    Layout.writeDatePartitioned(ev, "date", s"$tmp/events")
    val read = spark.read.parquet(s"$tmp/events")
      .filter(col("date") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    // partition filter present; pruned scan reads a single partition dir
    assert(plan.contains("PartitionFilters: [isnotnull(date"), plan)
    assert(read.count() ==
      ev.filter(col("date") === "2024-01-05").count())
  }
}
