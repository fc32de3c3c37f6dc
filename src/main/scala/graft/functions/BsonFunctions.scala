package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's complete expression-method surface under its own names
  * (SURVEY §2.7; `LiteDB/Document/Expression/Methods/{String,Date,Math,
  * Misc,DataTypes,Aggregate}.cs`), as thin mappings onto codegen'd Spark
  * built-ins — the lookup table a user migrating off the reference reaches
  * for. Quirky semantics (truncating DATEDIFF, lenient SUM/AVG, .NET
  * FORMAT, case-insensitive LIKE) delegate to [[RefFunctions]], which pins
  * them with golden tests.
  *
  * Naming: reference method names in upper snake (LOWER, DATEADD, …)
  * become camelCase here; argument order follows the reference.
  */
object BsonFunctions {

  // ---- String.cs ---------------------------------------------------------
  def lower(c: Column): Column = org.apache.spark.sql.functions.lower(c)
  def upper(c: Column): Column = org.apache.spark.sql.functions.upper(c)
  def ltrim(c: Column): Column = org.apache.spark.sql.functions.ltrim(c)
  def rtrim(c: Column): Column = org.apache.spark.sql.functions.rtrim(c)
  def trim(c: Column): Column = org.apache.spark.sql.functions.trim(c)
  /** INDEXOF is 0-based, -1 when absent (String.cs:83); Spark's instr is
    * 1-based, 0 when absent.
    */
  def indexOf(c: Column, sub: Column): Column = instr(c, sub) - 1
  def indexOf(c: Column, sub: Column, start: Column): Column =
    locate2(c, sub, start)
  private def locate2(c: Column, sub: Column, start0: Column): Column = {
    val loc = expr0("locate", sub, c, start0 + 1)
    loc - 1
  }
  private def expr0(fn: String, args: Column*): Column = call_function(fn, args: _*)
  /** SUBSTRING is 0-based (String.cs:109); Spark's substring is 1-based. */
  def substring(c: Column, start: Column): Column =
    c.substr(start + 1, length(c))
  def substring(c: Column, start: Column, len: Column): Column =
    c.substr(start + 1, len)
  def replace(c: Column, find: String, repl: String): Column =
    org.apache.spark.sql.functions.replace(c, lit(find), lit(repl))
  def lpad(c: Column, len: Int, pad: String): Column =
    org.apache.spark.sql.functions.lpad(c, len, pad)
  def rpad(c: Column, len: Int, pad: String): Column =
    org.apache.spark.sql.functions.rpad(c, len, pad)
  /** SPLIT(s, sep [, useRegex]) (String.cs:182/:198). */
  def split(c: Column, sep: String, useRegex: Boolean = false): Column =
    org.apache.spark.sql.functions.split(c,
      if (useRegex) sep else java.util.regex.Pattern.quote(sep))
  /** .NET-style FORMAT (String.cs:224), full general surface — RefFunctions. */
  def format(c: Column, fmt: String): Column = RefFunctions.formatNet(c, fmt)
  def join(arr: Column): Column = array_join(arr, "")
  def join(arr: Column, sep: String): Column = array_join(arr, sep)
  def isMatch(c: Column, regex: String): Column = c.rlike(regex)
  /** MATCH: first regex group capture (String.cs:271). */
  def matchGroup(c: Column, regex: String, group: Int = 1): Column =
    regexp_extract(c, regex, group)
  /** SQL LIKE with the reference's case-insensitive collation default. */
  def like(c: Column, pattern: String): Column = RefFunctions.sqlLike(c, pattern)

  // ---- Date.cs -----------------------------------------------------------
  def year(c: Column): Column = org.apache.spark.sql.functions.year(c)
  def month(c: Column): Column = org.apache.spark.sql.functions.month(c)
  def day(c: Column): Column = dayofmonth(c)
  def hour(c: Column): Column = org.apache.spark.sql.functions.hour(c)
  def minute(c: Column): Column = org.apache.spark.sql.functions.minute(c)
  def second(c: Column): Column = org.apache.spark.sql.functions.second(c)
  /** DATEADD(part, n, date) with the reference's y/M/d/h/m/s parts
    * (Date.cs:84-103).
    */
  def dateAdd(part: String, n: Column, date: Column): Column = part match {
    case "y" => timestamp_add("YEAR", n, date)
    case "M" => timestamp_add("MONTH", n, date)
    case "d" => timestamp_add("DAY", n, date)
    case "h" => timestamp_add("HOUR", n, date)
    case "m" => timestamp_add("MINUTE", n, date)
    case "s" => timestamp_add("SECOND", n, date)
    case other => throw new IllegalArgumentException(s"bad DATEADD part: $other")
  }
  /** DATEDIFF with .NET truncation semantics (Date.cs:108-130) — pinned in
    * RefFunctions.
    */
  def dateDiff(part: String, start: Column, end: Column): Column =
    RefFunctions.dateDiffTrunc(part, start, end)
  def toUtc(c: Column, tz: String): Column = to_utc_timestamp(c, tz)
  def toLocal(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  def now(): Column = current_timestamp()
  def today(): Column = current_date()

  // ---- Math.cs (the reference has exactly three) -------------------------
  def abs(c: Column): Column = org.apache.spark.sql.functions.abs(c)
  def round(c: Column, digits: Int): Column =
    org.apache.spark.sql.functions.round(c, digits)
  def pow(c: Column, p: Column): Column = org.apache.spark.sql.functions.pow(c, p)
  /** RANDOM / RANDOM(min, max) (Misc.cs:217-236). */
  def random(): Column = rand()
  // floor, not cast: int-cast truncates toward zero, which pushes the
  // (min, min+1) sliver of a negative range onto 0 — outside [min, max)
  // and non-uniform; floor keeps Random.Next's [min, max) contract
  def random(min: Int, max: Int): Column =
    floor(rand() * (max - min) + min).cast("int")

  // ---- Misc.cs: doc/array/JSON -------------------------------------------
  /** JSON(s): parse with an explicit schema (schema-on-read; the dynamic
    * BsonDocument has no Spark analog without one).
    */
  def json(c: Column, schema: org.apache.spark.sql.types.DataType): Column =
    from_json(c, schema)
  /** EXTEND over map-typed documents (Misc.cs:44): right side wins on key
    * collision (keys overlapping `b` are dropped from `a` first, so the
    * concat never sees duplicates regardless of mapKeyDedupPolicy).
    */
  def extend(a: Column, b: Column): Column =
    map_concat(map_filter(a, (k, _) => !map_contains_key(b, k)), b)
  /** ITEMS: explode an array (Misc.cs:69). */
  def items(c: Column): Column = explode(c)
  def keys(c: Column): Column = map_keys(c)
  def values(c: Column): Column = map_values(c)
  def iif(cond: Column, t: Column, f: Column): Column = RefFunctions.iif(cond, t, f)
  def coalesce(cs: Column*): Column = org.apache.spark.sql.functions.coalesce(cs: _*)
  /** LENGTH over string/binary (Misc.cs:161). */
  def lengthOf(c: Column): Column = length(c)
  /** LENGTH over array/doc. */
  def count(c: Column): Column = size(c)
  /** TOP(arr, n): first n elements (Misc.cs:175). */
  def top(arr: Column, n: Int): Column = slice(arr, 1, n)
  /** UNION/EXCEPT/CONCAT/DISTINCT over arrays (Misc.cs:94-214). */
  def union(a: Column, b: Column): Column = array_union(a, b)
  def except(a: Column, b: Column): Column = array_except(a, b)
  def concat(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.concat(a, b)
  def distinct(a: Column): Column = array_distinct(a)
  /** Higher-order MAP / FILTER / SORT with lambdas
    * (BsonExpressionFunctions.cs:13-66).
    */
  def map(arr: Column, f: Column => Column): Column = transform(arr, f)
  def filterArr(arr: Column, p: Column => Column): Column =
    org.apache.spark.sql.functions.filter(arr, p)
  def sort(arr: Column): Column = array_sort(arr)

  // ---- DataTypes.cs: constructors / casts / predicates -------------------
  // try_cast, not cast: the reference's converters return BsonValue.Null
  // when a value cannot convert (DataTypes.cs:106-188); under Spark 4's
  // ANSI default a plain cast would instead THROW on the first bad string.
  // String parsing is invariant-culture — NumberStyles.Any forms
  // ("1,234.5", "(123)", "$1.50") return null here; pinned in
  // BsonFunctionsSpec as a documented divergence.
  def int32(c: Column): Column = c.try_cast("int")
  def int64(c: Column): Column = c.try_cast("long")
  def double(c: Column): Column = c.try_cast("double")
  def decimal(c: Column): Column = c.try_cast("decimal(38,18)")
  def string(c: Column): Column = c.cast("string")
  def boolean(c: Column): Column = c.try_cast("boolean")
  def datetime(c: Column): Column = c.try_cast("timestamp")
  /** GUID() / GUID(s) (DataTypes.cs:31/:269). */
  def guid(): Column = expr("uuid()")
  def guid(c: Column): Column = org.apache.spark.sql.functions.lower(c)
  /** OBJECTID(): 12-byte hex id — 4-byte unix seconds + 8 random bytes
    * (Misc.cs / ObjectId semantics). Non-deterministic like the reference.
    */
  def objectId(): Column =
    org.apache.spark.sql.functions.concat(
      org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.lpad(
          hex(unix_timestamp().cast("int")), 8, "0")),
      substring(md5(uuid()), lit(0), lit(16)))
  private def uuid(): Column = expr("uuid()")
  /** OID_CREATIONTIME: first 4 bytes of an ObjectId are unix seconds
    * (Misc.cs:130).
    */
  def oidCreationTime(oid: Column): Column =
    timestamp_seconds(conv(org.apache.spark.sql.functions.substring(oid, 1, 8), 16, 10).cast("long"))
  /** IS_* type predicates (DataTypes.cs:441-516): with static schemas most
    * are compile-time; the value-level forms test castability.
    */
  def isNull(c: Column): Column = c.isNull
  // regex AND range: digits alone admit values whose int32()/int64()
  // conversion overflows to null (e.g. "3000000000" for int32), breaking
  // the "predicate gates the cast" contract
  def isInt32(c: Column): Column =
    org.apache.spark.sql.functions.trim(c.cast("string")).rlike("^[+-]?\\d+$") &&
      int32(c).isNotNull
  def isInt64(c: Column): Column =
    org.apache.spark.sql.functions.trim(c.cast("string")).rlike("^[+-]?\\d+$") &&
      int64(c).isNotNull
  def isDouble(c: Column): Column = RefFunctions.isNumeric(c.cast("string"))
  def isString(c: Column): Column = c.cast("string").isNotNull
  def isBoolean(c: Column): Column =
    org.apache.spark.sql.functions.lower(c.cast("string")).isin("true", "false")
  def isDateTime(c: Column): Column =
    call_function("try_to_timestamp", c.cast("string")).isNotNull
}
