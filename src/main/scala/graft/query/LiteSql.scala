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

  tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }

  def run(liteSql: String): DataFrame = spark.sql(translate(liteSql))

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
