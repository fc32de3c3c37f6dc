package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * apply groupBy/agg/having as Column operations; computed select
    * entries lower their own expression AST (`ExprIr`) — still never
    * through text anywhere.
    */
  def run(engine: NaturalQuery, json: String): DataFrame = {
    val ir = parse(json)
    if (ir.groupBy.isEmpty && ir.aggs.isEmpty) {
      if (ir.computed.isEmpty) engine.run(toParsed(ir))
      else {
        // computed selects apply after the relational core; ORDER BY /
        // LIMIT move with them so ordering can reference computed aliases
        val base = engine.run(
          toParsed(ir).copy(select = Nil, orderBy = None, limit = None))
        // emit in DECLARED order — a positional consumer of the IR must
        // see plain and computed entries exactly where it declared them
        val cols = ir.selectOrdered.map {
          case Left(s) => col(resolve(base, s.name))
            .as(s.alias.getOrElse(NaturalQuery.splitQualified(s.name)._2))
          case Right((e, alias)) => lowerExpr(base, e).as(alias)
        }
        orderLimit(base.select(cols: _*), ir)
      }
    } else {
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
      // HAVING: predicates over group keys / agg aliases (GroupByPipe.cs
      // having over the aggregated document), compiled from the same Cond
      // AST as WHERE — groups (anyOf/allOf) recurse
      NaturalQuery.combine(ir.having, compileOn(out))
        .foreach(h => out = out.filter(h))
      // computed select entries over the aggregated frame (group keys +
      // agg aliases in scope), appended to the output
      if (ir.computed.nonEmpty)
        out = out.select(col("*") +: ir.computed.map { case (e, alias) =>
          lowerExpr(out, e).as(alias)
        }: _*)
      orderLimit(out, ir)
    }
  }

  private def orderLimit(df: DataFrame, ir: Ir): DataFrame = {
    var out = df
    ir.orderBy.foreach { case (f, desc) =>
      val c = col(resolve(out, f))
      out = out.orderBy(if (desc) c.desc else c.asc)
    }
    ir.limit.foreach(n => out = out.limit(n))
    out
  }

  private def resolve(df: DataFrame, name: String): String =
    df.columns.find(_.equalsIgnoreCase(name)).getOrElse(name)

  /** Compile a Cond tree against a materialized frame (the HAVING path —
    * binary comparison only; engine collation applies to WHERE inside the
    * relational core, not to post-aggregate predicates).
    */
  private def compileOn(df: DataFrame)(c: NaturalQuery.Cond): Column =
    if (c.group.nonEmpty)
      NaturalQuery.combine(c.group, compileOn(df)).getOrElse(lit(true))
    else NaturalQuery.condToColumn(c, col(resolve(df, c.field)))

  // ---- computed select expressions (AST, not text) -----------------------

  /** Expression AST for computed select entries — the Remote.Linq
    * expression-tree analog (`Queries/QueryBuilder.cs:20-56`): column
    * refs, literals, and a fixed function whitelist, serialized as
    * `{"col": "x"} | {"lit": v} | {"fn": "mul", "args": [...]}`.
    */
  sealed trait ExprIr
  final case class ColRef(name: String) extends ExprIr
  final case class LitVal(value: Any) extends ExprIr
  final case class Call(fn: String, args: Seq[ExprIr]) extends ExprIr

  private def lowerExpr(df: DataFrame, e: ExprIr): Column = e match {
    case ColRef(n) => col(resolve(df, n))
    case LitVal(v) => lit(v)
    case Call(fn, args) =>
      def a(i: Int) = lowerExpr(df, args(i))
      def all = args.map(lowerExpr(df, _))
      def arity(n: Int): Unit = require(args.size == n,
        s"$fn expects $n args, got ${args.size}")
      fn.toLowerCase match {
        case "add" => arity(2); a(0) + a(1)
        case "sub" => arity(2); a(0) - a(1)
        case "mul" => arity(2); a(0) * a(1)
        case "div" => arity(2); a(0) / a(1)
        case "mod" => arity(2); a(0) % a(1)
        case "neg" => arity(1); -a(0)
        case "abs" => arity(1); abs(a(0))
        case "round" => arity(2); round(a(0), args(1) match {
          case LitVal(n: Long) => n.toInt
          case LitVal(n: Int) => n
          case other => throw new IllegalArgumentException(
            s"round scale must be an integer literal, got $other")
        })
        case "concat" => concat(all: _*)
        case "upper" => arity(1); upper(a(0))
        case "lower" => arity(1); lower(a(0))
        case "length" => arity(1); length(a(0))
        case "coalesce" => coalesce(all: _*)
        case other =>
          throw new IllegalArgumentException(s"unknown expr fn: $other")
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
      limit: Option[Int],
      having: Seq[NaturalQuery.Cond] = Nil,
      computed: Seq[(ExprIr, String)] = Nil,
      // plain + computed select entries in DECLARED order (Left = plain,
      // Right = computed) — the projection a positional consumer sees
      selectOrdered: Seq[Either[NaturalQuery.Sel, (ExprIr, String)]] = Nil) {
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
        val body =
          if (c.group.nonEmpty) s"(${conds(c.group)})"
          else c.value match {
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
    // a condition is a leaf {"field","op","value","conj"} or a nested
    // group {"anyOf": [...]} / {"allOf": [...]} — children default to the
    // group's conjunction (OR inside anyOf, AND inside allOf), explicit
    // "conj" still wins; groups nest arbitrarily
    def cond(item: JValue, defaultConj: String): NaturalQuery.Cond = {
      val conj = (item \ "conj").toOption.map(str).getOrElse(defaultConj)
      (item \ "anyOf", item \ "allOf") match {
        case (JArray(children), JNothing) =>
          require(children.nonEmpty, "anyOf needs at least one condition")
          NaturalQuery.Cond("", "group", None, conj,
            group = children.map(cond(_, "OR")))
        case (JNothing, JArray(children)) =>
          require(children.nonEmpty, "allOf needs at least one condition")
          NaturalQuery.Cond("", "group", None, conj,
            group = children.map(cond(_, "AND")))
        case (JNothing, JNothing) =>
          NaturalQuery.Cond(
            str(item \ "field"),
            str(item \ "op"),
            (item \ "value").toOption.map(str),
            conj)
        case other => throw new IllegalArgumentException(
          s"condition cannot be both anyOf and allOf: $item")
      }
    }
    def conds(v: JValue): Seq[NaturalQuery.Cond] = v match {
      case JArray(items) => items.map(cond(_, "AND"))
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad where: $other")
    }
    def exprIr(v: JValue): ExprIr = (v \ "col", v \ "lit", v \ "fn") match {
      case (c, JNothing, JNothing) if c != JNothing => ColRef(str(c))
      case (JNothing, l, JNothing) if l != JNothing => LitVal(l match {
        case JString(s) => s
        case JInt(n) => n.toLong
        case JLong(n) => n
        case JDouble(d) => d
        case JDecimal(d) => d.toDouble
        case JBool(b) => b
        case other => throw new IllegalArgumentException(s"bad lit: $other")
      })
      case (JNothing, JNothing, f) if f != JNothing =>
        Call(str(f), (v \ "args") match {
          case JArray(items) => items.map(exprIr)
          case JNothing => Nil
          case other => throw new IllegalArgumentException(s"bad args: $other")
        })
      case _ => throw new IllegalArgumentException(
        s"expr must be exactly one of col/lit/fn: $v")
    }
    val selectItems = (root \ "select") match {
      case JArray(items) => items
      case JNothing => Nil
      case other => throw new IllegalArgumentException(s"bad select: $other")
    }
    val selectOrdered: Seq[Either[NaturalQuery.Sel, (ExprIr, String)]] =
      selectItems.map { i =>
        if ((i \ "expr") == JNothing)
          Left(NaturalQuery.Sel(str(i \ "name"), (i \ "alias").toOption.map(str)))
        else Right((exprIr(i \ "expr"), str(i \ "alias")))
      }
    val sels = selectOrdered.collect { case Left(s) => s }
    val computed = selectOrdered.collect { case Right(c) => c }
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
    // a multi-table IR without join conditions would otherwise silently
    // query only tables.head (NaturalQuery.run dispatches on joins)
    if (tables.size > 1 && on.size != tables.size - 1)
      throw new IllegalArgumentException(
        s"${tables.size} tables require ${tables.size - 1} 'on' condition(s), got ${on.size}")
    val having = conds(root \ "having")
    if (having.nonEmpty && aggs.isEmpty)
      throw new IllegalArgumentException("having requires groupBy + agg")
    Ir(tables, on, conds(root \ "where"), sels, include, groupBy, aggs,
      orderBy, limit, having, computed, selectOrdered)
  }
}
