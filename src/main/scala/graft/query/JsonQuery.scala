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
    * Grouped-aggregate IRs lower the relational core through the AST, then
    * apply groupBy/agg as Column operations (still never through text).
    */
  def run(engine: NaturalQuery, json: String): DataFrame = {
    val ir = parse(json)
    if (ir.groupBy.isEmpty && ir.aggs.isEmpty) engine.run(toParsed(ir))
    else {
      // ORDER BY / LIMIT apply to the aggregated result, not the core
      val base = engine.run(
        toParsed(ir).copy(select = Nil, orderBy = None, limit = None))
      val keys = ir.groupBy.map(f =>
        col(f).as(NaturalQuery.splitQualified(f)._2))
      val aggCols = ir.aggs.map { a =>
        def field = col(a.field.getOrElse(throw new IllegalArgumentException(
          s"agg ${a.fn} needs a field")))
        (a.fn.toLowerCase match {
          case "count" => a.field.map(f => count(col(f))).getOrElse(count(lit(1)))
          case "sum" => sum(field)
          case "avg" => avg(field)
          case "min" => min(field)
          case "max" => max(field)
          case other =>
            throw new IllegalArgumentException(s"unknown agg fn: $other")
        }).as(a.alias)
      }
      require(aggCols.nonEmpty, "groupBy requires at least one agg")
      var out = base.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
      ir.orderBy.foreach { case (f, desc) =>
        val c = col(out.columns.find(_.equalsIgnoreCase(f)).getOrElse(f))
        out = out.orderBy(if (desc) c.desc else c.asc)
      }
      ir.limit.foreach(n => out = out.limit(n))
      out
    }
  }

  /** IR -> parser AST. */
  def toParsed(ir: Ir): NaturalQuery.Parsed =
    NaturalQuery.Parsed(
      find = ir.tables,
      joins = ir.on,
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

  final case class Agg(fn: String, field: Option[String], alias: String)

  /** `tables` holds 1..3 table names (`"table"` or `"tables"` in JSON);
    * 2+ tables require `on` join conditions (the NL dual/triple ON form,
    * `Queries/QueryEngine2/3.cs`). `groupBy`+`aggs` add the reference's
    * grouped-aggregate surface.
    */
  final case class Ir(
      tables: Seq[String],
      on: Seq[NaturalQuery.JoinOn],
      where: Seq[NaturalQuery.Cond],
      select: Seq[NaturalQuery.Sel],
      include: Option[(String, Seq[NaturalQuery.Cond])],
      groupBy: Seq[String],
      aggs: Seq[Agg],
      orderBy: Option[(String, Boolean)],
      limit: Option[Int]) {
    def table: String = tables.head
  }

  /** Debug/display form of the IR in the NL grammar (execution goes
    * through `toParsed`, not this text).
    */
  def toNaturalQuery(ir: Ir): String = {
    val sb = new StringBuilder(s"FIND ${ir.tables.mkString(", ")}")
    if (ir.on.nonEmpty)
      sb ++= " ON " + ir.on.map(j => s"${j.left} = ${j.right}").mkString(" AND ")
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
    val tables = (root \ "tables") match {
      case JArray(items) => items.map(str)
      case JNothing => Seq(str(root \ "table"))
      case other => throw new IllegalArgumentException(s"bad tables: $other")
    }
    val on = (root \ "on") match {
      case JArray(items) => items.map(i =>
        NaturalQuery.JoinOn(str(i \ "left"), str(i \ "right")))
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad on: $other")
    }
    val groupBy = (root \ "groupBy") match {
      case JArray(items) => items.map(str)
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad groupBy: $other")
    }
    val aggs = (root \ "agg") match {
      case JArray(items) => items.map(i => Agg(
        str(i \ "fn"),
        (i \ "field").toOption.map(str),
        str(i \ "alias")))
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad agg: $other")
    }
    Ir(tables, on, conds(root \ "where"), sels, include, groupBy, aggs,
      orderBy, limit)
  }
}
