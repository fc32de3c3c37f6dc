package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.RefFunctions._

/** Golden tests pinning the reference's quirky semantics (SURVEY §5 item 1:
  * AVG skips non-numerics Aggregate.cs:76-97, DATEDIFF truncation
  * Date.cs:108-130, case-insensitive LIKE).
  */
class RefFunctionsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dateDiffTrunc truncates total units toward zero") {
    val df = Seq(
      ("h25", ts("2024-01-01 00:00:00"), ts("2024-01-02 01:59:59")),
      ("neg", ts("2024-01-02 01:59:59"), ts("2024-01-01 00:00:00")),
      ("d0", ts("2024-01-01 10:00:00"), ts("2024-01-02 09:59:59"))
    ).toDF("k", "a", "b")
    val out = df.select($"k",
      dateDiffTrunc("hour", $"a", $"b").as("h"),
      dateDiffTrunc("day", $"a", $"b").as("d")).as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("h25") == ((25L, 1L)))  // 25:59:59 -> 25 hours, 1 day
    assert(out("neg") == ((-25L, -1L))) // truncation toward zero, not floor
    assert(out("d0") == ((23L, 0L)))   // 23:59:59 -> 0 full days
  }

  test("dateDiffTrunc month/year use calendar difference with day adjust") {
    val df = Seq(
      ("m", ts("2024-01-15 00:00:00"), ts("2024-03-14 00:00:00")), // 1 month
      ("m2", ts("2024-01-15 00:00:00"), ts("2024-03-15 00:00:00")), // 2 months
      ("y", ts("2020-06-10 00:00:00"), ts("2024-06-09 00:00:00")), // 3 years
      ("y2", ts("2020-06-10 00:00:00"), ts("2024-06-10 00:00:00")) // 4 years
    ).toDF("k", "a", "b")
    val out = df.select($"k",
      dateDiffTrunc("month", $"a", $"b").as("m"),
      dateDiffTrunc("year", $"a", $"b").as("y")).as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("m") == ((1L, 0L)))
    assert(out("m2") == ((2L, 0L)))
    assert(out("y") == ((47L, 3L)))
    assert(out("y2") == ((48L, 4L)))
  }

  test("dateDiffTrunc month/year mirror the reference for end < start " +
    "(MonthDifference truncates toward zero; YearDifference only ever " +
    "decrements — its negative asymmetry is the reference's own)") {
    // expectations hand-computed from DateExtensions.cs:23-52
    val df = Seq(
      // compMonth=-2, frac=(15-20)/-31=+0.161 -> trunc(-1.839) = -1
      ("m_neg_adj", ts("2024-03-15 00:00:00"), ts("2024-01-20 00:00:00")),
      // compMonth=-2, frac=(15-10)/-31=-0.161 -> trunc(-2.161) = -2
      ("m_neg", ts("2024-03-15 00:00:00"), ts("2024-01-10 00:00:00")),
      // compMonth=1, end Feb1->Mar1 leap: frac=(31-1)/-29=-1.034 -> 0
      ("m_clamp", ts("2024-01-31 00:00:00"), ts("2024-02-01 00:00:00"))
    ).toDF("k", "a", "b")
    val m = df.select($"k", dateDiffTrunc("month", $"a", $"b").as("m"))
      .as[(String, Long)].collect().toMap
    assert(m("m_neg_adj") == -1L)
    assert(m("m_neg") == -2L)
    assert(m("m_clamp") == 0L)
    // years=-2; endMonth(8) > startMonth(6): the reference does NOT
    // increment toward zero -> stays -2
    val y = Seq(("y_neg", ts("2024-06-10 00:00:00"), ts("2022-08-05 00:00:00")))
      .toDF("k", "a", "b")
      .select(dateDiffTrunc("year", $"a", $"b")).as[Long].head()
    assert(y == -2L)
  }

  test("sumLenient/avgLenient skip non-numeric values silently") {
    val df = Seq("10", "oops", "2.5", "", "N/A", "-0.5").toDF("v")
    val (s, a) = df.agg(sumLenient($"v").as("s"), avgLenient($"v").as("a"))
      .as[(Double, Double)].head()
    assert(s == 12.0)
    assert(a == 4.0) // 12 / 3 numeric values, NOT / 6
  }

  test("sqlLike is case-insensitive with %/_ wildcards") {
    val df = Seq("Customer#001", "SUPPLIER#9", "part").toDF("v")
    val got = df.filter(sqlLike($"v", "CUST%")).as[String].collect().toSeq
    assert(got == Seq("Customer#001"))
    assert(df.filter(sqlLike($"v", "p_rt")).count() == 1)
  }

  test("formatNet covers the .NET subset") {
    val df = Seq((42L, 1234.567)).toDF("i", "d")
    val row = df.select(
      formatNet($"i", "D5").as("d5"),
      formatNet($"d", "N2").as("n2"),
      formatNet($"d", "F1").as("f1"),
      formatNet($"i", "X").as("x"),
      formatNet($"d", "0.00").as("mask")).head()
    assert(row.getString(0) == "00042")
    assert(row.getString(1) == "1,234.57")
    assert(row.getString(2) == "1234.6")
    assert(row.getString(3) == "2A")
    assert(row.getString(4) == "1234.57")
    // D/X are MINIMUM widths (never truncate) and the sign precedes
    // the zero padding, as in .NET
    val widths = Seq((12345L, -42L, 1048575L)).toDF("big", "neg", "hex")
      .select(formatNet($"big", "D3").as("d3"),
        formatNet($"neg", "D4").as("dneg"),
        formatNet($"hex", "X4").as("xbig"),
        formatNet(lit(255L), "X4").as("xpad")).head()
    assert(widths.getString(0) == "12345")
    assert(widths.getString(1) == "-0042")
    assert(widths.getString(2) == "FFFFF")
    assert(widths.getString(3) == "00FF")
  }

  test("formatNet accepts time-only date patterns") {
    val ts = Seq(java.sql.Timestamp.valueOf("2024-03-05 14:07:09.123"))
      .toDF("ts")
    val r = ts.select(
      formatNet($"ts", "HH:mm:ss").as("t1"),
      formatNet($"ts", "HH:mm:ss.fff").as("t2")).head()
    assert(r.getAs[String]("t1") == "14:07:09")
    assert(r.getAs[String]("t2") == "14:07:09.123")
  }

  test("formatNet general surface: sections, scaling, literals, G/R/C " +
      "(the full Methods/String.cs FORMAT parity)") {
    val df = Seq((1234.5, -1234.5, 0.0)).toDF("p", "n", "z")
    val r = df.select(
      formatNet($"n", "#,##0.00;(#,##0.00)").as("paren_neg"),
      formatNet($"z", "0.00;(0.00);'zero'").as("zero_sec"),
      formatNet(lit(0.086), "00%").as("pct_mask"),
      formatNet(lit(1500000.0), "#,,").as("scaled"),
      formatNet($"p", "$#,##0.00 'end'").as("lits"),
      formatNet(lit(0.45), "#.##").as("hash_int"),
      formatNet(lit(-1.25), "0.0").as("neg_single"),
      formatNet(lit(123.456), "G").as("g_plain"),
      formatNet(lit(0.0000023), "G").as("g_sci"),
      formatNet(lit(123.4567), "G4").as("g4"),
      formatNet($"p", "C").as("cur"),
      formatNet($"n", "C").as("cur_neg"),
      formatNet(lit(1.5), "R").as("roundtrip")).head()
    assert(r.getAs[String]("paren_neg") == "(1,234.50)")
    assert(r.getAs[String]("zero_sec") == "zero")
    assert(r.getAs[String]("pct_mask") == "09%")
    assert(r.getAs[String]("scaled") == "2") // two scaling commas = /1e6
    assert(r.getAs[String]("lits") == "$1,234.50 end")
    assert(r.getAs[String]("hash_int") == ".45") // '#' int part: zero -> empty
    assert(r.getAs[String]("neg_single") == "-1.3") // away-from-zero
    assert(r.getAs[String]("g_plain") == "123.456")
    assert(r.getAs[String]("g_sci") == "2.3E-06")
    assert(r.getAs[String]("g4") == "123.5")
    assert(r.getAs[String]("cur") == "¤1,234.50")
    assert(r.getAs[String]("cur_neg") == "(¤1,234.50)")
    assert(r.getAs[String]("roundtrip") == "1.5")
    // nulls propagate; garbage formats fail at PLAN time, not in a task
    assert(df.select(formatNet(lit(null).cast("double"), "G")).head()
      .isNullAt(0))
    intercept[IllegalArgumentException] {
      graft.functions.NetFormat.parse("0.0;0.0;0.0;0.0") // 4 sections
    }
  }

  test("formatNet extended surface: scientific, percent, masks, dates") {
    val df = Seq((1052.0329112756, 0.50125, 1234.5, 1.5))
      .toDF("sci", "pct", "grp", "opt")
    val r = df.select(
      formatNet($"sci", "E").as("e_def"),
      formatNet($"sci", "E2").as("e2"),
      formatNet($"sci", "e3").as("e3"),
      formatNet($"pct", "P").as("p_def"),
      formatNet($"pct", "P1").as("p1"),
      formatNet($"grp", "#,##0.00").as("grouped"),
      formatNet($"opt", "0.##").as("opt2"),
      formatNet(lit(1.0), "0.##").as("opt_trim"),
      formatNet($"grp", "x").as("hex_lower")).head()
    // .NET scientific pads the exponent to 3 digits
    assert(r.getAs[String]("e_def") == "1.052033E+003")
    assert(r.getAs[String]("e2") == "1.05E+003")
    assert(r.getAs[String]("e3") == "1.052e+003")
    // invariant-culture percent pattern "n %" (0.50125*100 is
    // 50.1249999... in binary, so 2-decimal rounding gives .12)
    assert(r.getAs[String]("p_def") == "50.12 %")
    assert(r.getAs[String]("p1") == "50.1 %")
    assert(r.getAs[String]("grouped") == "1,234.50")
    // '#' placeholders trim trailing zeros (and a bare point)
    assert(r.getAs[String]("opt2") == "1.5")
    assert(r.getAs[String]("opt_trim") == "1")
    assert(r.getAs[String]("hex_lower") == "4d2")
    // .NET date pattern tokens (fff -> SSS, tt -> a)
    val ts = Seq(java.sql.Timestamp.valueOf("2024-03-05 14:07:09.123"))
      .toDF("ts")
    val d = ts.select(
      formatNet($"ts", "yyyy-MM-dd").as("d1"),
      formatNet($"ts", "dd/MM/yyyy HH:mm:ss").as("d2"),
      formatNet($"ts", "yyyy-MM-ddTHH:mm:ss.fff").as("d3")).head()
    assert(d.getAs[String]("d1") == "2024-03-05")
    assert(d.getAs[String]("d2") == "05/03/2024 14:07:09")
    assert(d.getAs[String]("d3") == "2024-03-05T14:07:09.123")
  }

  test("iif and extendStruct") {
    val df = Seq((1, "a")).toDF("n", "s")
      .withColumn("doc1", struct(lit(1).as("x"), lit("keep").as("y")))
      .withColumn("doc2", struct(lit(9).as("x"), lit("new").as("z")))
    val r = df.select(
      iif($"n" > 0, lit("pos"), lit("neg")).as("i"),
      extendStruct($"doc1", $"doc2", Seq("x", "y"), Seq("x", "z")).as("m"))
      .head()
    assert(r.getString(0) == "pos")
    val m = r.getStruct(1)
    assert(m.getAs[String]("y") == "keep")
    assert(m.getAs[Int]("x") == 9) // doc2 wins on collision
    assert(m.getAs[String]("z") == "new")
  }
}
