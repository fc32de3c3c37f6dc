package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.model.{IotValue, Units}

class ModelSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("resolvePriority returns first non-null slot and its index") {
    val df = Seq(
      (1L, Seq[(Option[String], Option[Timestamp])](
        (None, None), (None, None), (Some("mid"), Some(t0)),
        (None, None), (Some("low"), Some(t0)))),
      (2L, Seq[(Option[String], Option[Timestamp])]((None, None), (None, None)))
    ).toDF("id", "raw")
      .withColumn("slots", expr("transform(raw, r -> struct(r._1 as value, r._2 as ts))"))
    val rows = df.select($"id",
        IotValue.resolvePriority($"slots").as("v"),
        IotValue.resolvedPriorityIndex($"slots").as("p"))
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.get(2))))).toMap
    assert(rows(1L) == ((Some("mid"), Some(3))))
    assert(rows(2L) == ((None, None)))
  }

  test("writeAllowed enforces AllowManualOperator and Priority9Only") {
    val df = Seq(
      (1, 0),                                   // slot1 without flag -> false
      (1, IotValue.AllowManualOperator),        // slot1 with flag -> true
      (8, 0),                                   // slot8 without flag -> false
      (9, IotValue.Priority9Only),              // slot9 under p9only -> true
      (5, IotValue.Priority9Only),              // other slot under p9only -> false
      (5, 0)                                    // plain -> true
    ).toDF("p", "flags")
    val out = df.select(IotValue.writeAllowed($"p", $"flags")).as[Boolean].collect().toSeq
    assert(out == Seq(false, true, false, true, false, true))
  }

  test("query-driven slot 14: fed from a continuous query's lastResult") {
    import org.apache.spark.sql.functions.{count => fcount}
    val svc = new graft.streaming.ContinuousQueryService(spark)
    try {
      svc.register(svc.Config("n_customers",
        s => graft.core.Tables.load(s, Sf0001, "customer")
          .agg(fcount(lit(1))), intervalMillis = 60000L))
      val deadline = System.currentTimeMillis() + 30000
      while (svc.executions("n_customers") < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val fed = svc.lastResult("n_customers").head.getLong(0).toString

      // a point with only the Default slot set; feeding slot 14 (higher
      // priority) must win resolution; an empty feed must not
      val df = Seq(Tuple1(
        (1 to 17).map(p => (if (p == 15) "fallback" else null, null: Timestamp))))
        .toDF("raw")
        .withColumn("slots", expr("transform(raw, r -> struct(r._1 as value, r._2 as ts))"))
      val resolved = df.select(
        IotValue.resolvePriority(
          IotValue.withQueryDrivenSlot($"slots", lit(fed), lit(t0))).as("v"),
        IotValue.resolvedPriorityIndex(
          IotValue.withQueryDrivenSlot($"slots", lit(fed), lit(t0))).as("p"),
        IotValue.resolvePriority(
          IotValue.withQueryDrivenSlot($"slots",
            lit(null).cast("string"), lit(t0))).as("unfed"))
        .head()
      assert(resolved.getString(0) == "150")
      assert(resolved.getInt(1) == IotValue.QueryDrivenSlot)
      assert(resolved.getString(2) == "fallback")
    } finally svc.shutdown()
  }

  test("unit conversion: celsius->fahrenheit and inverse round-trip") {
    val df = Seq(("degrees_celsius", 100.0), ("degrees_fahrenheit", 212.0))
      .toDF("unit", "v")
    val f = Units.convert(spark, df, "v", "unit", "degrees_fahrenheit", "out")
      .select("out").as[Double].collect().toSeq
    assert(f == Seq(212.0, 212.0))
    val c = Units.convert(spark, df, "v", "unit", "degrees_celsius", "out")
      .select("out").as[Double].collect().toSeq
    assert(math.abs(c(0) - 100.0) < 1e-9 && math.abs(c(1) - 100.0) < 1e-9)
  }

  test("registry covers the reference's full unit inventory") {
    // 435 distinct units (the reference declares each twice), 1219 affine
    // conversions + identities; spot-check groups and symbols
    assert(graft.model.UnitsData.units.size == 435)
    assert(graft.model.UnitsData.conversions.size == 1219)
    assert(Units.unitInfo("degrees_celsius") == (("Temperature", "\u00b0C")))
    assert(Units.unitInfo("meters_per_second_per_second")._1 == "Acceleration")
    // mirrors the reference registry faithfully, including its
    // idiosyncratic directions (kilojoules' dict: {"joules", "value*1000"})
    assert(Units.defaultRules.exists(r =>
      r.from == "joules" && r.to == "kilojoules" && r.factor == 1000.0))
    assert(Units.defaultRules.exists(r =>
      r.from == "degrees_kelvin" && r.to == "degrees_fahrenheit" &&
        r.factor == 1.8 && r.offset == -459.67))
  }

  test("convertLit: unknown pair yields null") {
    val out = spark.range(1)
      .select(Units.convertLit(lit(1.0), "degrees_celsius", "us_gallons"))
      .collect()(0)
    assert(out.isNullAt(0))
  }

  test("slot 17 (QueryConfiguration) never resolves (IotValue.cs Value getter)") {
    // only slot 17 populated -> resolution is empty, like the reference's
    // `i < Values.Length - 1` loop
    val onlyQuery = (1 to 17).map(i =>
      if (i == 17) (Some("cfg"), Some(t0)) else (None: Option[String], None: Option[Timestamp]))
    val with16 = (1 to 17).map(i =>
      if (i == 16 || i == 17) (Some(s"v$i"), Some(t0))
      else (None: Option[String], None: Option[Timestamp]))
    val df = Seq((1L, onlyQuery), (2L, with16)).toDF("id", "raw")
      .withColumn("slots", expr("transform(raw, r -> struct(r._1 as value, r._2 as ts))"))
    val rows = df.select($"id",
        IotValue.resolvePriority($"slots").as("v"),
        IotValue.resolvedPriorityIndex($"slots").as("p"))
      .collect().map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.get(2))))).toMap
    assert(rows(1L) == ((None, None)))
    assert(rows(2L) == ((Some("v16"), Some(16))))
  }

  test("password-value hashing (IotValue.cs:1117-1145): null/empty pass " +
      "through, others SHA-256; isHash and passwordMatches agree") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Some("s3cret")), (2L, Some("")), (3L, None))
      .toDF("id", "pw")
    val hashed = df.select($"id", IotValue.toPasswordHash($"pw").as("h"))
    val rows = hashed.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // golden: sha256("s3cret")
    val expect = java.security.MessageDigest.getInstance("SHA-256")
      .digest("s3cret".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows(1L).contains(expect))
    assert(rows(2L).contains("")) // empty = "no password", distinct from null
    assert(rows(3L).isEmpty)
    assert(hashed.filter(IotValue.isHash($"h")).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(hashed.filter(IotValue.passwordMatches($"h", "s3cret"))
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(hashed.filter(IotValue.passwordMatches($"h", "wrong")).isEmpty)
  }
}
