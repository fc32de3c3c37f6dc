package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, map, typedLit}
import graft.functions.{BsonFunctions => B}

/** The reference-name expression surface: semantics pinned per group
  * (0-based INDEXOF/SUBSTRING, y/M/d/h/m/s DATEADD, array set ops, type
  * constructors/predicates, ObjectId round-trip).
  */
class BsonFunctionsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  test("string surface: 0-based INDEXOF/SUBSTRING, SPLIT literal vs regex") {
    val df = Seq(("hello world", "o")).toDF("s", "sub")
    val row = df.select(
      B.indexOf($"s", $"sub"),                  // first 'o' at 0-based 4
      B.indexOf($"s", $"sub", lit(5)),          // next 'o' at 7
      B.substring($"s", lit(6)),                // "world"
      B.substring($"s", lit(0), lit(5)),        // "hello"
      B.replace($"s", "world", "there"),
      B.join(B.split($"s", " "), "-"),
      B.matchGroup($"s", "(w\\w+)"),
      B.like($"s", "HELLO%")                    // case-insensitive LIKE
    ).head()
    assert(row.getInt(0) == 4)
    assert(row.getInt(1) == 7)
    assert(row.getString(2) == "world")
    assert(row.getString(3) == "hello")
    assert(row.getString(4) == "hello there")
    assert(row.getString(5) == "hello-world")
    assert(row.getString(6) == "world")
    assert(row.getBoolean(7))
    // literal (non-regex) SPLIT: '.' must not be "any char"
    val dots = Seq("a.b.c").toDF("s")
      .select(B.split($"s", ".")).as[Seq[String]].head()
    assert(dots == Seq("a", "b", "c"))
  }

  test("date surface: DATEADD parts and truncating DATEDIFF") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-31 10:30:00")).toDF("t")
    val row = df.select(
      B.dateAdd("M", lit(1), $"t").cast("string"),   // .NET AddMonths clamps
      B.dateAdd("d", lit(1), $"t").cast("string"),
      B.dateAdd("h", lit(-10), $"t").cast("string"),
      B.year($"t"), B.month($"t"), B.day($"t"),
      B.hour($"t"), B.minute($"t"), B.second($"t")).head()
    assert(row.getString(0) == "2024-02-29 10:30:00")
    assert(row.getString(1) == "2024-02-01 10:30:00")
    assert(row.getString(2) == "2024-01-31 00:30:00")
    assert((row.getInt(3), row.getInt(4), row.getInt(5)) == ((2024, 1, 31)))
    assert((row.getInt(6), row.getInt(7), row.getInt(8)) == ((10, 30, 0)))
  }

  test("array/doc surface: ITEMS/TOP/UNION/EXCEPT/DISTINCT/EXTEND/KEYS") {
    val df = Seq((Seq(3, 1, 2, 1), Seq(2, 4))).toDF("a", "b")
    val row = df.select(
      B.top($"a", 2),
      B.union($"a", $"b"),
      B.except($"a", $"b"),
      B.distinct($"a"),
      B.sort(B.distinct($"a")),
      B.count($"a")).head()
    assert(row.getSeq[Int](0) == Seq(3, 1))
    assert(row.getSeq[Int](1) == Seq(3, 1, 2, 4))
    assert(row.getSeq[Int](2) == Seq(3, 1))
    assert(row.getSeq[Int](3) == Seq(3, 1, 2))
    assert(row.getSeq[Int](4) == Seq(1, 2, 3))
    assert(row.getInt(5) == 4)
    // EXTEND: right side wins on key collision (Misc.cs:44)
    val m = Seq(1).toDF("x").select(
      B.extend(
        map(lit("a"), lit(1), lit("b"), lit(2)),
        map(lit("b"), lit(9), lit("c"), lit(3))))
      .head().getMap[String, Int](0)
    assert(m == Map("a" -> 1, "b" -> 9, "c" -> 3))
  }

  test("type constructors, predicates, ObjectId round-trip") {
    val df = Seq(("42", "x", "2024-06-01 00:00:00")).toDF("n", "s", "d")
    val row = df.select(
      B.int32($"n"), B.double($"n"), B.boolean(lit("true")),
      B.isInt32($"n"), B.isInt32($"s"), B.isDateTime($"d"),
      B.guid()).head()
    assert(row.getInt(0) == 42)
    assert(row.getDouble(1) == 42.0)
    assert(row.getBoolean(2))
    assert(row.getBoolean(3) && !row.getBoolean(4) && row.getBoolean(5))
    assert(row.getString(6).matches("[0-9a-f-]{36}"))
    // OBJECTID embeds its creation second in the first 4 bytes
    val before = System.currentTimeMillis() / 1000 - 1
    val oidRow = spark.range(1)
      .select(B.objectId().as("oid"))
      .select(col("oid"), B.oidCreationTime(col("oid")).cast("long").as("ct"))
      .head()
    assert(oidRow.getString(0).matches("[0-9a-f]{24}"))
    val after = System.currentTimeMillis() / 1000 + 1
    assert(oidRow.getLong(1) >= before && oidRow.getLong(1) <= after)
  }

  test("DOUBLE/DECIMAL string parsing is invariant-culture (documented " +
      "divergence from the reference's NumberStyles.Any)") {
    // The reference parses cast strings with the collation's culture and
    // NumberStyles.Any (DataTypes.cs:106-188): en-US accepts thousands
    // separators ("1,234.5" -> 1234.5), parentheses negatives ("(123)" ->
    // -123), and currency symbols ("$1.50" -> 1.5). This engine uses
    // Spark's invariant cast: those forms return NULL (the reference's
    // not-convertible result), and only the invariant forms parse. Pinned
    // here so the divergence is a documented contract, not a latent
    // surprise — a pipeline migrating culture-formatted string numerics
    // must normalize separators upstream (regexp_replace) first.
    val rows = Seq("1234.5", "  42  ", "1e3", "-0.25",   // parse identically
      "1,234.5", "(123)", "$1.50", "1.234,5")            // culture forms -> NULL
      .toDF("s")
      .select(col("s"), B.double(col("s")).as("d"),
        B.decimal(col("s")).cast("double").as("dec"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(rows("1234.5") == (Some(1234.5), Some(1234.5)))
    assert(rows("  42  ") == (Some(42.0), Some(42.0)))   // whitespace trimmed
    assert(rows("1e3") == (Some(1000.0), Some(1000.0)))  // exponent accepted
    assert(rows("-0.25") == (Some(-0.25), Some(-0.25)))
    assert(rows("1,234.5") == (None, None)) // en-US thousands: ref 1234.5
    assert(rows("(123)") == (None, None))   // parentheses negative: ref -123
    assert(rows("$1.50") == (None, None))   // currency symbol: ref 1.5
    assert(rows("1.234,5") == (None, None)) // de-DE separators: ref(de) 1234.5
  }
}
