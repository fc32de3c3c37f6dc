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
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    import spark.implicits._
    val sql = liteSql.trim.replaceAll("\\s+", " ")
    val kw = sql.takeWhile(!_.isWhitespace).toUpperCase
    kw match {
      case "SELECT" => run(sql)
      case "EXPLAIN" =>
        spark.sql("EXPLAIN FORMATTED " + translate(sql.drop("EXPLAIN".length)))
      case "INSERT" =>
        // INSERT INTO <col> VALUES {doc} [, {doc}] (Commands/Insert.cs)
        val m = "(?i)^INSERT\\s+INTO\\s+(\\w+)\\s+VALUES\\s+(.+)$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad INSERT: $sql"))
        val name = m.group(1).toLowerCase
        val docs = splitTopLevelDocs(m.group(2))
        val incoming = spark.read.json(docs.toDS())
        val merged = current(name).unionByName(incoming, allowMissingColumns = true)
        rebind(name, merged)
        Seq(docs.size.toLong).toDF("n_affected")
      case "UPDATE" =>
        // UPDATE <col> SET <path>=<expr>[,...] [WHERE <pred>] (Update.cs)
        val m = "(?i)^UPDATE\\s+(\\w+)\\s+SET\\s+(.+?)(?:\\s+WHERE\\s+(.+))?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad UPDATE: $sql"))
        val name = m.group(1).toLowerCase
        val pred = Option(m.group(3))
          .map(w => expr(translateExpr(w))).getOrElse(lit(true))
        val df = current(name)
        val n = df.filter(pred).count()
        val updated = splitOutsideQuotesTop(m.group(2), ',').foldLeft(df) { (d, a) =>
          val Array(path, rhs) = a.split("=", 2)
          d.withColumn(path.trim.stripPrefix("$.").trim,
            when(pred, expr(translateExpr(rhs))).otherwise(col(path.trim.stripPrefix("$.").trim)))
        }
        rebind(name, updated)
        Seq(n).toDF("n_affected")
      case "DELETE" =>
        // DELETE <col> WHERE <pred> (Commands/Delete.cs)
        val m = "(?i)^DELETE\\s+(\\w+)(?:\\s+WHERE\\s+(.+))?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad DELETE: $sql"))
        val name = m.group(1).toLowerCase
        val df = current(name)
        val pred = Option(m.group(2))
          .map(w => expr(translateExpr(w))).getOrElse(lit(true))
        val n = df.filter(pred).count()
        rebind(name, df.filter(!pred))
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

  /** Split `{...},{...}` at top level (brace-depth + quote aware). */
  private def splitTopLevelDocs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQ = false
    var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '\'' || c == '"') inQ = !inQ
      else if (!inQ && (c == '{' || c == '[')) depth += 1
      else if (!inQ && (c == '}' || c == ']')) depth -= 1
      else if (!inQ && c == ',' && depth == 0) {
        out += s.substring(start, i).trim; start = i + 1
      }
    }
    out += s.substring(start).trim
    out.filter(_.nonEmpty).toSeq
  }

  private def splitOutsideQuotesTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inQ = false
    var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == sep) { out += s.substring(start, i); start = i + 1 }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Translate a LiteDB SELECT into Spark SQL text. */
  def translate(liteSql: String): String = {
    var sql = liteSql.trim.replaceAll("\\s+", " ")

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

  private def replaceOutsideQuotes(s: String, f: String => String): String = {
    val sb = new StringBuilder
    var start = 0
    var inQ = false
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '\'') {
        val seg = s.substring(start, i)
        sb ++= (if (inQ) seg else f(seg))
        if (i < s.length) sb += '\''
        inQ = !inQ
        start = i + 1
      }
      i += 1
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
