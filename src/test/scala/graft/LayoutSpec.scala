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

  test("zValue interleaves bits: golden cases match the reference interleave") {
    import spark.implicits._
    // z(5=101b, 3=011b): a bits land at even positions, b at odd ->
    // 1 + 2 + 8 + 16 = 27; corners pin the orientation and the range.
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (255L, 255L))
      .toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows((0L, 0L)) == 0L)
    assert(rows((1L, 0L)) == 1L)
    assert(rows((0L, 1L)) == 2L)
    assert(rows((5L, 3L)) == 27L)
    assert(rows((255L, 255L)) == 65535L)
  }

  test("zValueN: k-dim interleave matches zValue at k=2 bit-for-bit; " +
      "3-dim golden cases pin the bit layout") {
    import spark.implicits._
    val two = Seq((5L, 3L), (255L, 0L), (7L, 7L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z2"),
        Layout.zValueN(Seq(col("a"), col("b")), 8).as("zn"))
      .collect()
    two.foreach(r => assert(r.getLong(0) == r.getLong(1),
      "zValueN(2 cols) must be the same curve as zValue"))
    // 3-dim: bit j of dim d lands at j*3 + d.
    // (1,0,0) -> bit0=1; (0,1,0) -> bit1=2; (0,0,1) -> bit2=4;
    // (1,1,1) -> 7; (2,0,0) -> bit3 = 8
    val three = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (1L, 1L, 1L), (2L, 0L, 0L)).toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        Layout.zValueN(Seq(col("a"), col("b"), col("c")), 8).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(three((1L, 0L, 0L)) == 1L)
    assert(three((0L, 1L, 0L)) == 2L)
    assert(three((0L, 0L, 1L)) == 4L)
    assert(three((1L, 1L, 1L)) == 7L)
    assert(three((2L, 0L, 0L)) == 8L)
  }

  test("zValue saturates out-of-range values instead of wrapping") {
    import spark.implicits._
    val rows = Seq((256L, 0L), (100000L, -5L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0))
    // 256 clamps to 255 (top cell), never to 0's key; negatives clamp to 0
    val z255_0 = (0 until 8).map(i => 1L << (2 * i)).sum
    assert(rows(0) == z255_0)
    assert(rows(1) == z255_0)
  }

  test("z-ordered write clusters both dimensions per output file") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-zorder").toString
    // full 256x256 grid, shuffled arrival order
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
      .repartition(32)
    Layout.writeZOrdered(grid, "a", "b", s"$tmp/z", files = 16, bits = 8)
    val spans = spark.read.parquet(s"$tmp/z")
      .groupBy(input_file_name().as("f"))
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .agg(avg(col("sa")).as("ma"), avg(col("sb")).as("mb"),
        count(lit(1)).as("nf"))
      .collect()(0)
    // each of the ~16 files covers a small rectangle: BOTH mean spans
    // far below the 255 global span (a single-column sort would leave
    // the other dimension's span at ~255)
    assert(spans.getLong(2) >= 8, spans.toString)
    assert(spans.getDouble(0) < 128.0, spans.toString)
    assert(spans.getDouble(1) < 128.0, spans.toString)
    // round-trip completeness
    assert(spark.read.parquet(s"$tmp/z").count() == 65536)
  }

  test("compact collapses many small files into right-sized few, same data") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val src = Tables.load(spark, Sf0001, "orders")
    src.repartition(64).write.parquet(s"$tmp/t")
    val dir = new java.io.File(s"$tmp/t")
    def nFiles = dir.listFiles().count(_.getName.endsWith(".parquet"))
    val before = nFiles
    assert(before >= 32, s"expected many small files, got $before")
    val checksum = spark.read.parquet(s"$tmp/t")
      .agg(sum(col("o_orderkey")), count(lit(1))).collect()(0)
    Layout.compact(spark, s"$tmp/t", targetBytes = 512L * 1024 * 1024)
    assert(nFiles < before / 8, s"compacted to $nFiles files")
    val after = spark.read.parquet(s"$tmp/t")
      .agg(sum(col("o_orderkey")), count(lit(1))).collect()(0)
    assert(after == checksum)
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
