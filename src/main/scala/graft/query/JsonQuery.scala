package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serialized-query execution (SURVEY §2.10: the reference's Remote.Linq
  * `QueryBuilder.ExecuteQuery` accepts a JSON-serialized expression tree,
  * and exports table schemas as JSON "for GPT consumption",
  * `Queries/QueryBuilder.cs:20-100`).
  *
  * Here the serialized form is a small JSON IR (table / where / select /
  * orderBy / limit / include), lowered through the same machinery as the
  * NL engine — Spark SQL types are the schema language, so `schemaJson`
  * is the export side. LLM-facing by construction: the IR is flat,
  * validatable, and engine-agnostic.
  *
  * {{{
  * {"table": "customer",
  *  "where": [{"field": "c_acctbal", "op": ">", "value": "5000"},
  *            {"field": "c_name", "op": "contains", "value": "'a'", "conj": "AND"}],
  *  "select": [{"name": "c_custkey"}, {"name": "c_name", "alias": "person"}],
  *  "include": {"table": "orders", "as": "orders_Data"},
  *  "orderBy": {"field": "c_custkey", "desc": false},
  *  "limit": 10}
  * }}}
  */
object JsonQuery {

  /** Execute a JSON-IR query against the engine's tables. The IR lowers
    * straight to the parser's AST (never through query TEXT), so a value
    * like "5000 LIMIT 1" stays a literal instead of injecting a clause.
    */
  def run(engine: NaturalQuery, json: String): DataFrame =
    engine.run(toParsed(parse(json)))

  /** IR -> parser AST. */
  def toParsed(ir: Ir): NaturalQuery.Parsed =
    NaturalQuery.Parsed(
      find = Seq(ir.table),
      joins = Nil,
      where = ir.where,
      select = ir.select,
      includes = ir.include.map { case (t, w) =>
        NaturalQuery.Include(t, w, Nil)
      }.toSeq,
      innerJoin = None,
      orderBy = ir.orderBy.map { case (f, desc) => (f, !desc) },
      limit = ir.limit)

  /** Schema export for LLM consumption (`df.schema.json` is the contract —
    * the Spark-native analog of the reference's JSON schema dump).
    */
  def schemaJson(df: DataFrame): String = df.schema.json

  // ---- JSON IR -----------------------------------------------------------

  final case class Ir(
      table: String,
      where: Seq[NaturalQuery.Cond],
      select: Seq[NaturalQuery.Sel],
      include: Option[(String, Seq[NaturalQuery.Cond])],
      orderBy: Option[(String, Boolean)],
      limit: Option[Int])

  /** Debug/display form of the IR in the NL grammar (execution goes
    * through `toParsed`, not this text).
    */
  def toNaturalQuery(ir: Ir): String = {
    val sb = new StringBuilder(s"FIND ${ir.table}")
    def conds(cs: Seq[NaturalQuery.Cond]): String =
      cs.zipWithIndex.map { case (c, i) =>
        val prefix = if (i == 0) "" else s" ${c.conj} "
        val body = c.value match {
          case Some(v) => s"${c.field} ${c.op} $v"
          case None => s"${c.field} ${c.op}"
        }
        prefix + body
      }.mkString
    if (ir.where.nonEmpty) sb ++= s" WHERE ${conds(ir.where)}"
    if (ir.select.nonEmpty)
      sb ++= " SELECT " + ir.select.map(s =>
        s.alias.map(a => s"${s.name} as $a").getOrElse(s.name)).mkString(", ")
    ir.include.foreach { case (t, w) =>
      sb ++= s" INCLUDE $t"
      if (w.nonEmpty) sb ++= s" WHERE ${conds(w)}"
    }
    ir.orderBy.foreach { case (f, desc) =>
      sb ++= s" ORDER BY $f${if (desc) " DESC" else ""}"
    }
    ir.limit.foreach(n => sb ++= s" LIMIT $n")
    sb.toString
  }

  /** Minimal JSON parser for the flat IR (no external JSON lib on the
    * classpath beyond Spark's shaded ones; the grammar is small and
    * strictly validated).
    */
  def parse(json: String): Ir = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    def str(v: JValue): String = v match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"expected string, got $other")
    }
    def conds(v: JValue): Seq[NaturalQuery.Cond] = v match {
      case JArray(items) => items.map { item =>
        NaturalQuery.Cond(
          str(item \ "field"),
          str(item \ "op"),
          (item \ "value").toOption.map(str),
          (item \ "conj").toOption.map(str).getOrElse("AND"))
      }
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad where: $other")
    }
    val sels = (root \ "select") match {
      case JArray(items) => items.map(i =>
        NaturalQuery.Sel(str(i \ "name"), (i \ "alias").toOption.map(str)))
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad select: $other")
    }
    val include = (root \ "include").toOption.map(i =>
      (str(i \ "table"), conds(i \ "where")))
    val orderBy = (root \ "orderBy").toOption.map(o =>
      (str(o \ "field"), (o \ "desc").toOption.exists {
        case JBool(b) => b
        case _ => false
      }))
    val limit = (root \ "limit").toOption.map {
      case JInt(n) => n.toInt
      case JLong(n) => n.toInt
      case other => throw new IllegalArgumentException(s"bad limit: $other")
    }
    Ir(str(root \ "table"), conds(root \ "where"), sels, include, orderBy, limit)
  }
}
