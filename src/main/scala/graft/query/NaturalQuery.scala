package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Natural-language query engine re-expressing the reference's
  * FIND/WHERE/SELECT/INCLUDE/INNERJOIN/ORDER BY/LIMIT grammar
  * (`Iot.Database/Queries/QueryEngine.cs:285-375` parse,
  * `QueryEngine2.cs:55-133` dual `FIND t1,t2 ON …`,
  * `QueryEngine3.cs:65-145` triple) — lowered onto DataFrame ops so
  * Catalyst plans the joins (the reference's FindAll-then-filter and
  * nested-loop joins become pushed-down scans + hash joins; its 2-child
  * INNERJOIN cap, QueryEngine.cs:887-920, is intentionally NOT replicated —
  * see SURVEY §3.3).
  *
  * Grammar (case-insensitive keywords):
  * {{{
  * FIND <table> [WHERE <cond> [AND|OR <cond>]...]
  *   [SELECT <col [as alias]>, ...]
  *   [INCLUDE <child> [WHERE <cond>...] [SELECT ...]]...
  *   [INNERJOIN as <alias> select <col, ...>]
  *   [ORDER BY <col> [ASC|DESC]] [LIMIT <n>]
  *
  * FIND <t1>, <t2> ON <t1.c> = <t2.c> [AND <c2>] [WHERE ...] [SELECT ...]
  * FIND <t1>, <t2>, <t3> ON <cond> AND <cond> [WHERE ...] [SELECT ...]
  * }}}
  * Predicates: = != > >= < <= contains startswith endswith,
  * `not contains/startswith/endswith`, `is null`, `is not null`, `is empty`
  * (QueryEngine.cs:402-564).
  */
final class NaturalQuery(
    spark: SparkSession,
    loader: String => Option[DataFrame],
    /** (parent, child) -> (parent PK column, child FK column). */
    foreignKeys: Map[(String, String), (String, String)],
    /** String comparison semantics for predicates and ORDER BY: Binary
      * (default) or IgnoreCase (the reference's default collation).
      */
    collation: graft.core.Collation = graft.core.Collation.Binary) {

  /** Eager-map form (tests, ad-hoc frames). */
  def this(spark: SparkSession, tables: Map[String, DataFrame],
      foreignKeys: Map[(String, String), (String, String)]) =
    this(spark, tables.get(_): Option[DataFrame], foreignKeys)

  /** Eager-map form with explicit collation. */
  def this(spark: SparkSession, tables: Map[String, DataFrame],
      foreignKeys: Map[(String, String), (String, String)],
      collation: graft.core.Collation) =
    this(spark, tables.get(_): Option[DataFrame], foreignKeys, collation)

  import NaturalQuery._

  // resolve lazily and memoize: a query touches 1-3 tables, so eagerly
  // loading the whole catalog (10 parquet footer reads) per query would
  // dominate small-query latency
  private val resolved = scala.collection.mutable.Map.empty[String, DataFrame]

  def table(name: String): DataFrame = {
    val key = name.toLowerCase
    resolved.getOrElseUpdate(key, loader(key).getOrElse(
      throw new IllegalArgumentException(s"unknown table: $name")))
  }

  private def fk(parent: String, child: String): (String, String) =
    foreignKeys.getOrElse((parent.toLowerCase, child.toLowerCase),
      throw new IllegalArgumentException(s"no FK between $parent and $child"))

  /** Parse and execute a natural query, returning the lowered DataFrame. */
  def run(query: String): DataFrame = run(parse(query))

  /** Execute a pre-built AST (the JsonQuery path lowers its IR straight to
    * Parsed, so IR values can never inject query structure).
    */
  def run(q: Parsed): DataFrame = q.joins match {
    case Nil => runSingle(q)
    case _ => runMulti(q)
  }

  private def resolveCol(df: DataFrame, name: String): String =
    df.columns.find(_.equalsIgnoreCase(name)).getOrElse(name)

  // ---- single-table form (+ INCLUDE / INNERJOIN) --------------------------

  private def runSingle(q: Parsed): DataFrame = {
    val t = q.find.head
    var primary = table(t)
    combine(q.where, c => compile(c, primary))
      .foreach(w => primary = primary.filter(w))

    // parent projection; FK-join keys must survive SELECT, so keep them
    // under their own names and drop the extras at the end
    val neededPks = q.includes.map(inc => fk(t, inc.table)._1).distinct
    val keptPks = q.select match {
      case Nil => Nil
      case cols => neededPks.filterNot(pk => cols.exists(c =>
        c.alias.getOrElse(c.name).equalsIgnoreCase(pk) ||
          c.name.equalsIgnoreCase(pk)))
    }
    val projected = q.select match {
      case Nil => primary
      case cols =>
        val chosen = cols.map(s => primary.col(resolveCol(primary, s.name))
          .as(s.alias.getOrElse(s.name)))
        val keep = keptPks.map(pk => primary.col(resolveCol(primary, pk)))
        primary.select(chosen ++ keep: _*)
    }

    def filteredChild(inc: Include): DataFrame = {
      var child = table(inc.table)
      combine(inc.where, c => compile(c, child))
        .foreach(w => child = child.filter(w))
      child
    }

    // INCLUDEs: per reference, children nest as `<table>_Data`; with
    // INNERJOIN the parent+child rows flatten instead (all children — the
    // reference's 2-row cap is an acknowledged quirk we do not keep)
    val withIncludes =
      if (q.innerJoin.isEmpty) {
        q.includes.foldLeft(projected) { (acc, inc) =>
          val (pk, fkCol) = fk(t, inc.table)
          val child = filteredChild(inc)
          val childCols = inc.select match {
            case Nil => child.columns.toSeq.map(n => col(n))
            case cols => cols.map(s => col(resolveCol(child, s.name))
              .as(s.alias.getOrElse(s.name)))
          }
          val nested = child
            .select(col(resolveCol(child, fkCol)).as("_fk"),
              struct(childCols: _*).as("_child"))
            .groupBy("_fk")
            .agg(collect_list(col("_child")).as(s"${inc.table}_Data"))
          acc.join(nested, acc(resolveCol(acc, pk)) === nested("_fk"), "left")
            .drop("_fk")
        }
      } else {
        val ij = q.innerJoin.get
        val joined = q.includes.foldLeft(projected) { (acc, inc) =>
          val (pk, fkCol) = fk(t, inc.table)
          val child = filteredChild(inc)
          val fkTmp = s"_fk_${inc.table}"
          val childSel = inc.select match {
            case Nil => child.withColumnRenamed(resolveCol(child, fkCol), fkTmp)
            case cols => child.select(
              col(resolveCol(child, fkCol)).as(fkTmp) +:
                cols.map(s => col(resolveCol(child, s.name))
                  .as(s.alias.getOrElse(s.name))): _*)
          }
          acc.join(childSel, acc(resolveCol(acc, pk)) === childSel(fkTmp),
            "inner").drop(fkTmp)
        }
        if (ij.select.nonEmpty)
          joined.select(ij.select.map(s => joined.col(resolveCol(joined, s.name))
            .as(s.alias.getOrElse(s.name))): _*)
        else joined
      }
    val cleaned =
      if (q.innerJoin.exists(_.select.nonEmpty)) withIncludes
      else keptPks.foldLeft(withIncludes)((d, pk) => d.drop(pk))
    orderLimit(cleaned, q)
  }

  // ---- dual/triple ON form ------------------------------------------------

  private def runMulti(q: Parsed): DataFrame = {
    require(q.find.size >= 2, "ON form requires 2+ tables")
    val aliased = q.find.map(t => t -> table(t).as(t)).toMap
    var df = aliased(q.find.head)
    val remaining = scala.collection.mutable.Set(q.find.tail: _*)
    val joined = scala.collection.mutable.Set(q.find.head)
    // each ON condition `a.x = b.y` joins the next table in declared order
    // (QueryEngine3.cs:390-628: second join may target table1 or table2)
    q.joins.foreach { j =>
      val (lt, lc) = splitQualified(j.left)
      val (rt, rc) = splitQualified(j.right)
      val (newT, newC, oldT, oldC) =
        if (joined.contains(lt) && remaining.contains(rt)) (rt, rc, lt, lc)
        else if (joined.contains(rt) && remaining.contains(lt)) (lt, lc, rt, rc)
        else throw new IllegalArgumentException(
          s"ON ${j.left} = ${j.right} does not connect a new table")
      df = df.join(aliased(newT), col(s"$oldT.$oldC") === col(s"$newT.$newC"),
        "inner")
      joined += newT; remaining -= newT
    }
    combine(q.where, compileQualified(df)).foreach(w => df = df.filter(w))
    val out = q.select match {
      case Nil => df
      case cols => df.select(cols.map { s =>
        col(s.name).as(s.alias.getOrElse(splitQualified(s.name)._2))
      }: _*)
    }
    orderLimit(out, q)
  }

  private def orderLimit(df: DataFrame, q: Parsed): DataFrame = {
    val ordered = q.orderBy match {
      case Some((c, asc)) =>
        val name = df.columns.find(_.equalsIgnoreCase(c)).getOrElse(c)
        // collation applies only to string-typed sort keys (lower() on a
        // numeric would compare its string form)
        val isString = df.schema.fields.exists(f =>
          f.name == name && f.dataType == org.apache.spark.sql.types.StringType)
        val cc = if (isString) collation.key(col(name)) else col(name)
        df.orderBy(if (asc) cc.asc else cc.desc)
      case None => df
    }
    q.limit.map(ordered.limit).getOrElse(ordered)
  }

  // ---- predicate compilation ---------------------------------------------

  private def compile(c: Cond, df: DataFrame): Column =
    if (c.group.nonEmpty)
      combine(c.group, compile(_: Cond, df)).getOrElse(lit(true))
    else {
      // resolve case-insensitively against the actual schema
      val name = df.columns.find(_.equalsIgnoreCase(c.field)).getOrElse(c.field)
      condToColumn(c, col(name), collation, isStringField(df, name))
    }

  private def compileQualified(df: DataFrame)(c: Cond): Column =
    if (c.group.nonEmpty)
      combine(c.group, compileQualified(df)).getOrElse(lit(true))
    else condToColumn(c, col(c.field), collation, isStringField(df, c.field))

  /** Whether a (possibly qualified or nested) field resolves to StringType
    * in `df` — collation must only rewrite genuinely-string comparisons
    * (lower() on a numeric column would compare its string form). Unknown
    * fields default to string so the error surfaces at analysis, unchanged.
    */
  private def isStringField(df: DataFrame, name: String): Boolean =
    scala.util.Try(df.select(col(name)).schema.head.dataType ==
      org.apache.spark.sql.types.StringType).getOrElse(true)
}

object NaturalQuery {

  final case class Sel(name: String, alias: Option[String])
  /** One predicate (leaf), or — when `group` is non-empty — a parenthesized
    * condition group whose children combine with their own conjunctions
    * (the serialized-IR `anyOf`/`allOf` nodes; the NL parser only emits
    * leaves). `conj` is always relative to the PREVIOUS sibling.
    */
  final case class Cond(field: String, op: String, value: Option[String],
      conj: String /* AND | OR relative to previous */,
      group: Seq[Cond] = Nil)
  final case class Include(table: String, where: Seq[Cond], select: Seq[Sel])
  final case class JoinOn(left: String, right: String)
  final case class InnerJoin(alias: Option[String], select: Seq[Sel])
  final case class Parsed(
      find: Seq[String], joins: Seq[JoinOn], where: Seq[Cond],
      select: Seq[Sel], includes: Seq[Include], innerJoin: Option[InnerJoin],
      orderBy: Option[(String, Boolean)], limit: Option[Int])

  private val TopKeywords = Seq("INNERJOIN", "INCLUDE", "ORDER BY", "LIMIT")

  def splitQualified(s: String): (String, String) = {
    val i = s.indexOf('.')
    if (i < 0) ("", s) else (s.substring(0, i).toLowerCase, s.substring(i + 1))
  }

  /** Combine a condition sequence (each tagged with its conjunction) into a
    * single Column, given a per-condition compiler.
    */
  def combine(conds: Seq[Cond], one: Cond => Column): Option[Column] =
    conds.foldLeft(Option.empty[Column]) { (acc, c) =>
      val cc = one(c)
      acc match {
        case None => Some(cc)
        case Some(prev) => Some(if (c.conj == "OR") prev || cc else prev && cc)
      }
    }

  def condToColumn(c: Cond, column: Column): Column =
    condToColumn(c, column, graft.core.Collation.Binary)

  def condToColumn(c: Cond, column: Column,
      collation: graft.core.Collation): Column =
    condToColumn(c, column, collation, columnIsString = true)

  def condToColumn(c: Cond, column: Column,
      collation: graft.core.Collation, columnIsString: Boolean): Column = {
    def raw = c.value.getOrElse(
      throw new IllegalArgumentException(s"${c.op} needs a value"))
    // collation applies exactly when the comparison IS a string comparison:
    // the literal side is a string AND the column is string-typed (a quoted
    // non-numeric literal against a numeric column must keep the numeric
    // cast comparison, not become lower(numeric) lexicographic)
    def cmp: (Column, Any) = typedValue(raw) match {
      case s: String if columnIsString => (collation.key(column), collation.key(s))
      case other => (column, other)
    }
    def v = collation.key(typedValue(raw).toString) // string ops
    def sCol = collation.key(column)
    c.op match {
      case "=" => cmp._1 === cmp._2
      case "!=" => cmp._1 =!= cmp._2
      case ">" => cmp._1 > cmp._2
      case ">=" => cmp._1 >= cmp._2
      case "<" => cmp._1 < cmp._2
      case "<=" => cmp._1 <= cmp._2
      case "contains" => sCol.contains(v)
      case "startswith" => sCol.startsWith(v)
      case "endswith" => sCol.endsWith(v)
      case "not contains" => !sCol.contains(v)
      case "not startswith" => !sCol.startsWith(v)
      case "not endswith" => !sCol.endsWith(v)
      case "is null" => column.isNull
      case "is not null" => column.isNotNull
      case "is empty" => length(column) === 0
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  private def typedValue(raw: String): Any = {
    val s = raw.trim
    if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1)
    else if (s.matches("[-+]?\\d+")) s.toLong
    else if (s.matches("[-+]?\\d*\\.\\d+")) s.toDouble
    else if (s.equalsIgnoreCase("true")) true
    else if (s.equalsIgnoreCase("false")) false
    else s
  }

  // ---- parsing ------------------------------------------------------------

  def parse(query: String): Parsed = {
    val trimmed = query.trim.replaceAll("\\s+", " ")
    // segment at top-level keywords, skipping quoted literals: a WHERE
    // value like 'no limit' must not start a LIMIT segment
    final case class Mark(start: Int, end: Int, kw: String)
    val marks = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Mark]
      var inQ = false
      var i = 0
      while (i < trimmed.length) {
        if (trimmed.charAt(i) == '\'') { inQ = !inQ; i += 1 }
        else if (!inQ) TopKeywords.find(kw =>
            matchesKeyword(trimmed, i, kw)) match {
          case Some(kw) => out += Mark(i, i + kw.length, kw.toUpperCase); i += kw.length
          case None => i += 1
        }
        else i += 1
      }
      out.toList
    }
    val headEnd = marks.headOption.map(_.start).getOrElse(trimmed.length)
    val head = trimmed.substring(0, headEnd).trim
    val segments = marks.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < marks.size) marks(i + 1).start else trimmed.length
      (m.kw, trimmed.substring(m.end, end).trim)
    }

    val (find, joins, where, select) = parseHead(head)
    var includes = Vector.empty[Include]
    var innerJoin = Option.empty[InnerJoin]
    var orderBy = Option.empty[(String, Boolean)]
    var limit = Option.empty[Int]

    segments.foreach {
      case ("INCLUDE", body) =>
        val (t, w, sel) = parseIncludeBody(body)
        includes :+= Include(t, w, sel)
      case ("INNERJOIN", body) =>
        innerJoin = Some(parseInnerJoin(body))
      case ("ORDER BY", body) =>
        val parts = body.split("\\s+")
        val asc = parts.length < 2 || !parts(1).equalsIgnoreCase("desc")
        orderBy = Some((parts(0), asc))
      case ("LIMIT", body) =>
        limit = Some(body.split("\\s+")(0).toInt)
      case _ =>
    }
    Parsed(find, joins, where, select, includes, innerJoin, orderBy, limit)
  }

  private def parseHead(head: String)
      : (Seq[String], Seq[JoinOn], Seq[Cond], Seq[Sel]) = {
    val FindRe = "(?i)^FIND\\s+(.*)$".r
    val rest = head match {
      case FindRe(r) => r
      case _ => throw new IllegalArgumentException(
        s"query must start with FIND: $head")
    }
    // ON / WHERE / SELECT split
    val onIdx = indexOfKeyword(rest, "ON")
    val whereIdx = indexOfKeyword(rest, "WHERE")
    val selectIdx = indexOfKeyword(rest, "SELECT")
    val tableEnd = Seq(onIdx, whereIdx, selectIdx).filter(_ >= 0) match {
      case Nil => rest.length
      case xs => xs.min
    }
    val tables = rest.substring(0, tableEnd).split(",").map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSeq
    val joins =
      if (onIdx >= 0) {
        val end = Seq(whereIdx, selectIdx).filter(i => i > onIdx) match {
          case Nil => rest.length
          case xs => xs.min
        }
        rest.substring(onIdx + 2, end).split("(?i)\\bAND\\b").map(_.trim)
          .filter(_.nonEmpty).map { p =>
            val sides = p.split("=").map(_.trim)
            require(sides.length == 2, s"bad ON condition: $p")
            JoinOn(sides(0), sides(1))
          }.toSeq
      } else Nil
    val where =
      if (whereIdx >= 0) {
        val end = if (selectIdx > whereIdx) selectIdx else rest.length
        parseConds(rest.substring(whereIdx + 5, end).trim)
      } else Nil
    val select =
      if (selectIdx >= 0) parseSelect(rest.substring(selectIdx + 6).trim)
      else Nil
    (tables, joins, where, select)
  }

  private def parseIncludeBody(body: String): (String, Seq[Cond], Seq[Sel]) = {
    val whereIdx = indexOfKeyword(body, "WHERE")
    val selectIdx = indexOfKeyword(body, "SELECT")
    val tEnd = Seq(whereIdx, selectIdx).filter(_ >= 0) match {
      case Nil => body.length; case xs => xs.min
    }
    val t = body.substring(0, tEnd).trim.toLowerCase
    val w = if (whereIdx >= 0) {
      val end = if (selectIdx > whereIdx) selectIdx else body.length
      parseConds(body.substring(whereIdx + 5, end).trim)
    } else Nil
    val s = if (selectIdx >= 0) parseSelect(body.substring(selectIdx + 6).trim)
      else Nil
    (t, w, s)
  }

  private def parseInnerJoin(body: String): InnerJoin = {
    // "as My Table select a, b" — alias is cosmetic (the reference uses it
    // as a result-set name only)
    val selectIdx = indexOfKeyword(body, "SELECT")
    val AsRe = "(?i)^as\\s+(.*)$".r
    val aliasPart =
      (if (selectIdx >= 0) body.substring(0, selectIdx) else body).trim
    val alias = aliasPart match {
      case AsRe(a) => Some(a.trim).filter(_.nonEmpty)
      case _ => None
    }
    val sel = if (selectIdx >= 0)
      parseSelect(body.substring(selectIdx + 6).trim) else Nil
    InnerJoin(alias, sel)
  }

  private def parseSelect(s: String): Seq[Sel] =
    s.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      val m = "(?i)^(\\S+)(?:\\s+as\\s+(.+))?$".r
      part match {
        case m(n, a) => Sel(n, Option(a).map(_.trim))
        case _ => Sel(part, None)
      }
    }.toSeq

  /** Split a WHERE body into conditions on AND/OR, respecting quoted
    * strings and parenthesized groups. The reference grammar has no
    * parentheses (QueryEngine.cs:388-578 splits flat) — groups exceed it
    * because mixed AND/OR without them is the first thing a real user
    * needs; the serialized-IR anyOf/allOf nodes already lower to the same
    * `Cond.group` shape, so the text form reuses that path unchanged.
    */
  private def parseConds(s: String): Seq[Cond] = {
    if (s.isEmpty) return Nil
    val parts = splitOutsideQuotes(s)
    parts.map { case (conj, frag) => parseCond(frag, conj) }
  }

  private def splitOutsideQuotes(s: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var conj = "AND"
    var cur = new StringBuilder
    var inQ = false
    var depth = 0
    var i = 0
    def flush(next: String): Unit = {
      val f = cur.toString.trim
      if (f.nonEmpty) out += ((conj, f))
      conj = next; cur = new StringBuilder
    }
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') { inQ = !inQ; cur += '\''; i += 1 }
      else if (!inQ && ch == '(') { depth += 1; cur += ch; i += 1 }
      else if (!inQ && ch == ')') {
        depth -= 1
        // a close with no open must fail NOW: a net-zero scan like
        // "a = 1) AND (b = 2" would otherwise pass the final balance
        // check and silently parse as one mangled leaf condition
        require(depth >= 0, s"unbalanced parentheses in condition: $s")
        cur += ch; i += 1
      }
      else if (!inQ && depth == 0 && matchesKeyword(s, i, "AND") &&
          !matchesNotPrefix(cur.toString)) { flush("AND"); i += 3 }
      else if (!inQ && depth == 0 && matchesKeyword(s, i, "OR")) { flush("OR"); i += 2 }
      else { cur += ch; i += 1 }
    }
    require(depth == 0, s"unbalanced parentheses in condition: $s")
    flush("AND")
    out.toSeq
  }

  /** Whether `s` is one whole parenthesized group — its first '(' closes
    * at its last character (quote-aware), so stripping the outer pair is
    * safe. `(a=1) x (b=2)` is NOT whole even though it starts and ends
    * with parens.
    */
  private def isWholeGroup(s: String): Boolean = {
    if (!(s.startsWith("(") && s.endsWith(")"))) return false
    var inQ = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\'') inQ = !inQ
      else if (!inQ && ch == '(') depth += 1
      else if (!inQ && ch == ')') {
        depth -= 1
        if (depth == 0) return i == s.length - 1
      }
      i += 1
    }
    false
  }

  /** `is not null` contains "not", and `x != 'a and b'` is quoted — the only
    * AND we must not split on is inside `is ... null` phrasing, which never
    * contains AND; this hook exists for future phrase ops.
    */
  private def matchesNotPrefix(prefix: String): Boolean = false

  /** First index of a whole-word keyword outside quoted strings; -1 if
    * absent.
    */
  private def indexOfKeyword(s: String, kw: String): Int = {
    var inQ = false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') inQ = !inQ
      else if (!inQ && matchesKeyword(s, i, kw)) return i
      i += 1
    }
    -1
  }

  private def matchesKeyword(s: String, i: Int, kw: String): Boolean = {
    if (i + kw.length > s.length) return false
    if (!s.regionMatches(true, i, kw, 0, kw.length)) return false
    // '_' is an identifier char: without it, a field like `limit_score`
    // would be parsed as the LIMIT keyword mid-identifier
    def ident(c: Char) = c == '_' || Character.isLetterOrDigit(c)
    val beforeOk = i == 0 || !ident(s.charAt(i - 1))
    val after = i + kw.length
    val afterOk = after >= s.length || !ident(s.charAt(after))
    beforeOk && afterOk
  }

  private def parseCond(frag: String, conj: String): Cond = {
    val f = frag.trim
    if (isWholeGroup(f))
      return Cond("", "group", None, conj,
        group = parseConds(f.substring(1, f.length - 1).trim))
    val lower = f.toLowerCase
    // phrase predicates first
    val phraseOps = Seq("is not null", "is null", "is empty")
    phraseOps.find(p => lower.endsWith(" " + p)).foreach { p =>
      return Cond(f.substring(0, f.length - p.length - 1).trim, p, None, conj)
    }
    val wordOps = Seq("not contains", "not startswith", "not endswith",
      "contains", "startswith", "endswith")
    for (op <- wordOps) {
      // quote-aware whole-word search: 'a contains b' as a literal value
      // must not be treated as the operator
      val idx = indexOfKeyword(f, op)
      if (idx > 0)
        return Cond(f.substring(0, idx).trim, op,
          Some(f.substring(idx + op.length).trim), conj)
    }
    val symOps = Seq(">=", "<=", "!=", "=", ">", "<")
    for (op <- symOps) {
      val idx = indexOfOutsideQuotes(f, op)
      if (idx > 0)
        return Cond(f.substring(0, idx).trim, op,
          Some(f.substring(idx + op.length).trim), conj)
    }
    throw new IllegalArgumentException(s"cannot parse condition: $frag")
  }

  /** First index of a literal substring outside quoted strings; -1 if
    * absent (no word-boundary requirement — used for symbolic operators).
    */
  private def indexOfOutsideQuotes(s: String, op: String): Int = {
    var inQ = false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') { inQ = !inQ; i += 1 }
      else if (!inQ && s.regionMatches(i, op, 0, op.length)) return i
      else i += 1
    }
    -1
  }
}
