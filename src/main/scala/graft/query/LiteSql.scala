package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** LiteDB SQL dialect translator (SURVEY §3.1: `LiteDB/Client/SqlParser/
  * Commands/Select.cs:26-179` grammar — `SELECT <expr> [INTO ...] FROM
  * <collection> [INCLUDE ...] [WHERE ...] [GROUP BY ...] [HAVING ...]
  * [ORDER BY ... [ASC|DESC]] [LIMIT n [OFFSET m]]`).
  *
  * The dialect delta handled here; everything else passes through to
  * Spark SQL (Catalyst IS the engine):
  *  - `$.path.to.field` → `path.to.field`, bare `$` → `*`
  *    (BsonExpressionOperators MEMBER_PATH)
  *  - `INCLUDE child` → LEFT JOIN over the FK registry
  *    (BasePipe.cs:46-133 hydration)
  *  - `LIMIT n OFFSET m` → Spark's `LIMIT n OFFSET m` (order swapped —
  *    Spark puts OFFSET before LIMIT's effect; semantics preserved)
  */
final class LiteSql(
    spark: SparkSession,
    tables: Map[String, DataFrame],
    foreignKeys: Map[(String, String), (String, String)]) {

  // DML (INSERT/UPDATE/DELETE) rebinds the table's view, mirroring the
  // reference's mutable collections (SqlParser dispatch, SqlParser.cs:32-49)
  private var current: Map[String, DataFrame] = tables
  current.foreach { case (n, df) => df.createOrReplaceTempView(n) }

  def table(name: String): DataFrame = current(name.toLowerCase)

  def run(liteSql: String): DataFrame = spark.sql(translate(liteSql))

  /** Full command dispatch by first keyword (SqlParser.cs:32-49; the
    * storage-engine commands CHECKPOINT/REBUILD/PRAGMA/BEGIN/COMMIT have
    * no analog — Parquet/Delta owns storage). DML returns a 1-row frame
    * with the affected-row count, like the reference's ExecuteNonQuery.
    */
  def execute(liteSql: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, when}
    import spark.implicits._
    // whitespace is collapsed OUTSIDE quotes only — a quoted literal's
    // tabs/double spaces are data, not syntax
    val sql = replaceOutsideQuotes(liteSql.trim, _.replaceAll("\\s+", " "))
    val kw = sql.takeWhile(!_.isWhitespace).toUpperCase
    kw match {
      case "SELECT" => run(sql)
      case "EXPLAIN" =>
        spark.sql("EXPLAIN FORMATTED " + translate(sql.drop("EXPLAIN".length)))
      case "INSERT" =>
        // INSERT INTO <col> VALUES {doc} [, {doc}] (Commands/Insert.cs)
        val m = "(?is)^INSERT\\s+INTO\\s+(\\w+)\\s+VALUES\\s+(.+)$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad INSERT: $sql"))
        val name = m.group(1).toLowerCase
        val docs = splitTopLevelDocs(m.group(2))
        val incoming = spark.read.json(docs.toDS())
        require(!incoming.columns.contains("_corrupt_record"),
          s"malformed INSERT document(s): ${docs.mkString("; ")}")
        val merged = current(name).unionByName(incoming, allowMissingColumns = true)
        rebind(name, merged)
        Seq(docs.size.toLong).toDF("n_affected")
      case "UPDATE" =>
        // UPDATE <col> SET <path>=<expr>[,...] [WHERE <pred>] (Update.cs);
        // SET/WHERE split is quote-aware (a literal 'works where needed'
        // must not open a WHERE clause)
        val m = "(?i)^UPDATE\\s+(\\w+)\\s+SET\\s+(.+)$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad UPDATE: $sql"))
        val name = m.group(1).toLowerCase
        val (setPart, wherePart) = splitAtKeyword(m.group(2), "WHERE")
        val pred = wherePart.map(w => expr(translateExpr(w))).getOrElse(lit(true))
        val df = current(name)
        val n = df.filter(coalesce(pred, lit(false))).count()
        // the reference applies ONE transform document per row: predicate
        // and every SET expression evaluate against the ORIGINAL values
        // (so `SET a = b, b = a` swaps) — compute them all first, then
        // rebind the targets
        val assignments = splitTopLevel(setPart, ',').map { a =>
          val eq = indexOfCharOutsideQuotes(a, '=')
          require(eq > 0, s"bad SET assignment: $a")
          (a.substring(0, eq).trim.stripPrefix("$.").trim,
            expr(translateExpr(a.substring(eq + 1))))
        }
        val staged = df.select(
          org.apache.spark.sql.functions.col("*") +:
            coalesce(pred, lit(false)).as("_pred") +:
            assignments.zipWithIndex.map { case ((_, rhs), i) =>
              rhs.as(s"_rhs$i")
            }: _*)
        val updated = assignments.zipWithIndex.foldLeft(staged) {
          case (d, ((target, _), i)) =>
            // LiteDB's UPDATE creates missing paths (Commands/Update.cs):
            // a new column starts null on non-matching rows
            val prev = if (df.columns.contains(target))
              org.apache.spark.sql.functions.col(target)
            else lit(null)
            d.withColumn(target,
              when(org.apache.spark.sql.functions.col("_pred"),
                org.apache.spark.sql.functions.col(s"_rhs$i")).otherwise(prev))
        }.drop("_pred" +: assignments.indices.map(i => s"_rhs$i"): _*)
        rebind(name, updated)
        Seq(n).toDF("n_affected")
      case "DELETE" =>
        // DELETE <col> WHERE <pred> (Commands/Delete.cs); NULL-predicate
        // rows are kept, not deleted (SQL three-valued semantics)
        val m = "(?i)^DELETE\\s+(\\w+)(?:\\s+WHERE\\s+(.+))?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad DELETE: $sql"))
        val name = m.group(1).toLowerCase
        val df = current(name)
        val pred = Option(m.group(2))
          .map(w => expr(translateExpr(w))).getOrElse(lit(true))
        val hit = coalesce(pred, lit(false))
        val n = df.filter(hit).count()
        rebind(name, df.filter(!hit))
        Seq(n).toDF("n_affected")
      case other => throw new IllegalArgumentException(
        s"unsupported command $other (storage-engine commands have no analog)")
    }
  }

  private def rebind(name: String, df: DataFrame): Unit = {
    current = current.updated(name, df)
    df.createOrReplaceTempView(name)
  }

  /** $-path translation only (for WHERE/SET fragments). */
  def translateExpr(fragment: String): String =
    replaceOutsideQuotes(fragment.trim, s => s
      .replaceAll("\\$\\.([A-Za-z_][A-Za-z0-9_.]*)", "$1"))

  /** One quote-state core for every scanner in this class: mask(i) is
    * true when position i sits inside a single- OR double-quoted run
    * (opening char remembered; backslash escapes honored inside double
    * quotes — JSON/Spark-SQL string semantics).
    */
  private def quoteMask(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        m(i) = true
        if (c == '\\' && quote == '"' && i + 1 < s.length) {
          m(i + 1) = true; i += 1
        } else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') { quote = c; m(i) = true }
      i += 1
    }
    m
  }

  /** Split at the first whole-word keyword outside quotes; returns
    * (before, Some(after)) or (whole, None).
    */
  private def splitAtKeyword(s: String, kw: String): (String, Option[String]) = {
    val mask = quoteMask(s)
    var i = 0
    while (i < s.length) {
      if (!mask(i) && i + kw.length <= s.length &&
          s.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
          (i + kw.length >= s.length ||
            !Character.isLetterOrDigit(s.charAt(i + kw.length))))
        return (s.substring(0, i).trim, Some(s.substring(i + kw.length).trim))
      i += 1
    }
    (s.trim, None)
  }

  /** First index of `c` outside quoted strings; -1 if absent. */
  private def indexOfCharOutsideQuotes(s: String, c: Char): Int = {
    val mask = quoteMask(s)
    var i = 0
    while (i < s.length) {
      if (!mask(i) && s.charAt(i) == c) return i
      i += 1
    }
    -1
  }

  /** Split `{...},{...}` at top level (brace-depth + quote aware). */
  private def splitTopLevelDocs(s: String): Seq[String] = {
    val mask = quoteMask(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!mask(i)) {
        if (c == '{' || c == '[') depth += 1
        else if (c == '}' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) {
          out += s.substring(start, i).trim; start = i + 1
        }
      }
      i += 1
    }
    out += s.substring(start).trim
    out.filter(_.nonEmpty).toSeq
  }

  /** Split on `sep` outside quotes AND outside parentheses/brackets (a
    * comma inside ROUND(x, 0) is an argument separator, not a SET-list
    * delimiter).
    */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val mask = quoteMask(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!mask(i)) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && c == sep) {
          out += s.substring(start, i); start = i + 1
        }
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Translate a LiteDB SELECT into Spark SQL text. */
  def translate(liteSql: String): String = {
    // whitespace collapses OUTSIDE quotes only (a multi-space literal in a
    // WHERE clause is data); same rule as execute()
    var sql = replaceOutsideQuotes(liteSql.trim, _.replaceAll("\\s+", " "))

    // $-paths (outside quotes): `$.a.b` -> `a.b`; lone `$` -> `*`
    sql = replaceOutsideQuotes(sql, s => s
      .replaceAll("\\$\\.([A-Za-z_][A-Za-z0-9_.]*)", "$1")
      .replaceAll("(?<![A-Za-z0-9_])\\$(?![A-Za-z0-9_.])", "*"))

    // INCLUDE list -> LEFT JOINs after FROM
    val IncRe = "(?i)\\bFROM\\s+(\\w+)\\s+INCLUDE\\s+([\\w\\s,]+?)(?=(?i:WHERE|GROUP|HAVING|ORDER|LIMIT|OFFSET|$))".r
    sql = IncRe.replaceAllIn(sql, m => {
      val base = m.group(1).toLowerCase
      val joins = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).map { child =>
        val (pk, fk) = foreignKeys.getOrElse((base, child.toLowerCase),
          throw new IllegalArgumentException(s"no FK between $base and $child"))
        s"LEFT JOIN ${child.toLowerCase} ON $base.$pk = ${child.toLowerCase}.$fk"
      }
      s"FROM $base ${joins.mkString(" ")} "
    })
    sql
  }

  /** Apply `f` to each maximal run OUTSIDE quoted strings (single- or
    * double-quoted, per quoteMask), passing quoted runs through verbatim.
    */
  private def replaceOutsideQuotes(s: String, f: String => String): String = {
    val mask = quoteMask(s)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val start = i
      val inQ = mask(i)
      while (i < s.length && mask(i) == inQ) i += 1
      val seg = s.substring(start, i)
      sb ++= (if (inQ) seg else f(seg))
    }
    sb.toString
  }
}

object LiteSql {
  def apply(spark: SparkSession, sfDir: String): LiteSql =
    new LiteSql(spark,
      Tables.names.map(n => n -> Tables.load(spark, sfDir, n)).toMap,
      GraftQueryEngine.foreignKeys)
}
