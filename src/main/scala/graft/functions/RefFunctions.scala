package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reference-semantics scalar/aggregate functions — the quirky behaviors
  * SURVEY §5/§7 pins with golden tests rather than silently diverging:
  *
  *  - DATEDIFF truncates the *total* unit count toward zero
  *    (`Methods/Date.cs:108-130`: Math.Truncate of TotalDays/Hours/…;
  *    year/month via calendar difference helpers,
  *    `LiteDB/Utils/Extensions/DateExtensions.cs`).
  *  - AVG/SUM silently skip non-numeric values
  *    (`Methods/Aggregate.cs:76-114`).
  *  - LIKE is collation/case-insensitive by default
  *    (`LiteDB/Utils/StringExtensions.cs` SqlLike with Collation).
  *  - IIF/COALESCE/LENGTH per `Methods/Misc.cs:143-173`.
  *  - FORMAT supports a .NET format-string subset
  *    (`Methods/String.cs:224`).
  */
object RefFunctions {

  /** Truncate-toward-zero division, identical in Spark and DuckDB
    * (floor-div on the absolute value, sign reapplied) — floor/trunc
    * divergence between engines only differs for negatives.
    */
  private def truncDiv(num: Column, denom: Long): Column =
    signum(num).cast("long") * floor(abs(num) / denom).cast("long")

  /** DATEDIFF(unit, start, end) with the reference's truncation semantics
    * (Date.cs:108-130). Units: second, minute, hour, day, month, year.
    */
  def dateDiffTrunc(unit: String, start: Column, end: Column): Column = {
    val us = unix_micros(end) - unix_micros(start)
    unit.toLowerCase match {
      case "second" => truncDiv(us, 1000000L)
      case "minute" => truncDiv(us, 60L * 1000000)
      case "hour" => truncDiv(us, 3600L * 1000000)
      case "day" => truncDiv(us, 86400L * 1000000)
      case "month" =>
        // DateExtensions.MonthDifference VERBATIM: calendar-month delta
        // plus a day fraction over the (negative) day count from end to
        // end.AddMonths(1), truncated toward zero. The fraction form is
        // what makes the end < start direction truncate toward zero too —
        // a day-only decrement (this function's previous form) inflated
        // negative magnitudes. add_months clamps day-of-month exactly
        // like C# AddMonths, so month-end fractions match bit-for-bit.
        val compMonth = ((year(end) - year(start)) * 12 +
          (month(end) - month(start))).cast("double")
        val dEnd = end.cast("date")
        val daysInEndMonth =
          datediff(dEnd, add_months(dEnd, 1)).cast("double")
        val m = compMonth +
          (dayofmonth(start) - dayofmonth(end)).cast("double") / daysInEndMonth
        (signum(m) * floor(abs(m))).cast("long")
      case "year" =>
        // DateExtensions.YearDifference VERBATIM — year delta with an
        // only-ever-decrement month/day adjustment. Deliberately
        // asymmetric for end < start (the reference never increments);
        // mirroring the quirk beats idealizing it.
        (year(end) - year(start) -
          when(month(end) === month(start) &&
            dayofmonth(end) < dayofmonth(start), 1)
            .when(month(end) < month(start), 1)
            .otherwise(0)).cast("long")
      case other =>
        throw new IllegalArgumentException(s"unsupported DATEDIFF unit: $other")
    }
  }

  /** Is this string value numeric (the reference's IsNumber over
    * BsonValue)? Pinned as a regex (portable across engines, unlike
    * TRY_CAST edge cases).
    */
  val NumericPattern = "^[-+]?(\\d+\\.?\\d*|\\.\\d+)([eE][-+]?\\d+)?$"
  def isNumeric(c: Column): Column = trim(c).rlike(NumericPattern)

  /** SUM skipping non-numeric values (Aggregate.cs:99-114): exact decimal
    * accumulation, double result (engine-portable).
    */
  def sumLenient(c: Column): Column =
    sum(when(isNumeric(c), c.cast("decimal(28,8)"))).cast("double")

  /** AVG skipping non-numeric values (Aggregate.cs:76-97): the divisor is
    * the count of numeric values only.
    */
  def avgLenient(c: Column): Column =
    sum(when(isNumeric(c), c.cast("decimal(28,8)"))).cast("double") /
      count(when(isNumeric(c), 1))

  /** LiteDB LIKE: case-insensitive, %/_ wildcards. */
  def sqlLike(c: Column, pattern: String): Column =
    lower(c).like(pattern.toLowerCase)

  /** IIF (Misc.cs:143). */
  def iif(cond: Column, ifTrue: Column, ifFalse: Column): Column =
    when(cond, ifTrue).otherwise(ifFalse)

  /** LENGTH over string/binary (Misc.cs:161-173); arrays/docs use
    * `lengthOfArray` (Spark Columns are untyped pre-analysis, so the
    * dispatch the reference does at runtime is two functions here).
    */
  def lengthOf(c: Column): Column = length(c)
  def lengthOfArray(c: Column): Column = size(c)

  /** FORMAT with a .NET format-string subset (String.cs:224):
    * D<n> zero-padded int, N<n>/F<n> fixed decimals (N adds thousands
    * separators), X hex uppercase, 0.00-style custom masks.
    */
  def formatNet(c: Column, fmt: String): Column = fmt match {
    case f if f.matches("[Dd]\\d+") =>
      // .NET D<n>: n MINIMUM digits, never truncating, sign BEFORE the
      // zero padding (lpad would truncate long values and misplace the
      // minus); Java's %0<w>d width counts the sign, so negatives pad
      // one wider to keep n digits
      val w = f.substring(1).toInt
      val l = c.cast("long")
      when(l < 0, format_string(s"%0${w + 1}d", l))
        .otherwise(format_string(s"%0${w}d", l))
    case f if f.matches("[Nn]\\d+") =>
      format_number(c.cast("double"), f.substring(1).toInt)
    case f if f.matches("[Ff]\\d+") =>
      format_string(s"%.${f.substring(1).toInt}f", c.cast("double"))
    case "X" => upper(hex(c.cast("long")))
    case "x" => lower(hex(c.cast("long")))
    case f if f.matches("[Xx]\\d+") =>
      // X<n>: hex zero-padded to a MINIMUM of n digits (lpad alone
      // would truncate longer values) — pinned here so integers keep
      // full 64-bit precision (the general fallback is double-typed)
      val w = math.max(f.substring(1).toInt, 1)
      val h = hex(c.cast("long"))
      val padded = when(length(h) < w, lpad(h, w, "0")).otherwise(h)
      if (f.charAt(0) == 'X') upper(padded) else lower(padded)
    case f if f.matches("[Ee]\\d*") =>
      // .NET scientific: default 6 decimals, exponent sign + >= 3 digits
      // (1.052033E+003); Java %E emits 2 exponent digits, so pad
      val d = if (f.length > 1) f.substring(1).toInt else 6
      val conv = if (f.charAt(0) == 'E') "E" else "e"
      regexp_replace(
        format_string(s"%.$d$conv", c.cast("double")),
        "([Ee][+-])(\\d{2})$", "$10$2")
    case f if f.matches("[Pp]\\d*") =>
      // percent, invariant-culture pattern "n %" (value scaled by 100,
      // grouped like N); default 2 decimals
      val d = if (f.length > 1) f.substring(1).toInt else 2
      concat(format_number(c.cast("double") * 100, d), lit(" %"))
    case f if f.matches("#,#+0(\\.0+)?") =>
      // grouped custom mask (#,##0.00): same rendering as N<d>
      val decimals = f.split("\\.") match {
        case Array(_, dec) => dec.length
        case _ => 0
      }
      format_number(c.cast("double"), decimals)
    case f if f.matches("0\\.#+") =>
      // optional-decimals mask (0.##): up to N decimals, trailing zeros
      // (and a bare point) trimmed, as .NET renders '#' placeholders
      val d = f.length - 2
      regexp_replace(
        regexp_replace(
          format_string(s"%.${d}f", c.cast("double")), "(\\.\\d*?)0+$", "$1"),
        "\\.$", "")
    case f if f.matches("0+(\\.0+)?") =>
      val parts = f.split("\\.")
      val decimals = if (parts.length > 1) parts(1).length else 0
      // %0<w>.<d>f: w is the MINIMUM total width (zero-padded), never
      // truncating — matches .NET custom-mask zero padding
      if (decimals == 0) format_string(s"%0${f.length}d", c.cast("long"))
      else format_string(s"%0${f.length}.${decimals}f", c.cast("double"))
    case f if f.matches("[yMdHmsft:\\-/ .T]+") &&
        f.exists("yMdHmsf".contains(_)) => // any date OR time token
      // (time-only patterns like HH:mm:ss are valid .NET formats too)
      // .NET custom date/time pattern over a timestamp column; tokens
      // shared with Java's DateTimeFormatter except fractional seconds
      // (f -> S) and the am/pm designator (tt -> a). Letters that are
      // literals in .NET (e.g. the ISO 'T') are reserved in Java — quote
      // whatever letter is not a translated token.
      date_format(c,
        f.replace("fff", "SSS").replace("ff", "SS").replace("f", "S")
          .replace("tt", "a")
          .replaceAll("([A-Za-z&&[^yMdHmsSa]])", "'$1'"))
    case other =>
      // the general .NET surface (Methods/String.cs:224 is literally
      // string.Format("{0:fmt}")): sections pos;neg;zero, grouping and
      // scaling masks, %/‰, interleaved literals, G/R/C — parsed and
      // validated at PLAN time (garbage fails the query build, never a
      // task), rendered per row through one codegen static call
      NetFormat.render(java.math.BigDecimal.ZERO, other)
      org.apache.spark.sql.graft.ExprShim.column(
        graft.functions.expressions.NetFormatExpr(
          org.apache.spark.sql.graft.ExprShim.expression(
            c.cast("double")), other))
  }

  /** EXTEND(a, b): struct merge, b's fields win (Misc.cs:44). */
  def extendStruct(a: Column, b: Column,
      aFields: Seq[String], bFields: Seq[String]): Column = {
    val merged = (aFields.filterNot(bFields.contains).map(f =>
      a.getField(f).as(f))) ++ bFields.map(f => b.getField(f).as(f))
    struct(merged: _*)
  }

  /** The reference's deterministic unique-row fingerprint
    * (`Base/BaseDatabase.cs:115-145` HashUniqueIdentifiers): SHA-256 hex
    * of the concatenated `name=value;` pairs. As a codegen'd column it
    * doubles as a scale-safe synthetic key / dedup id — identical bytes
    * on both engines because every value is string-cast before hashing.
    */
  def hashUniqueIdentifiers(ids: (String, Column)*): Column =
    sha2(concat(ids.flatMap { case (n, v) =>
      Seq(lit(s"$n="), v.cast("string"), lit(";"))
    }: _*), 256)

  /** Driver-side twin over literal pairs — byte-identical to the column
    * form (and to the reference for values whose `BsonValue.ToString`
    * matches their string cast).
    */
  def hashUniqueIdentifiers(ids: Seq[(String, String)]): String = {
    val raw = ids.map { case (n, v) => s"$n=$v;" }.mkString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
