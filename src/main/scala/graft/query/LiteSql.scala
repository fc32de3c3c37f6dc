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
    foreignKeys: Map[(String, String), (String, String)],
    collation: graft.core.Collation = graft.core.Collation.Binary,
    admin: Option[LiteSql.Admin] = None) {

  def this(spark: SparkSession, tables: Map[String, DataFrame],
      foreignKeys: Map[(String, String), (String, String)]) =
    this(spark, tables, foreignKeys, graft.core.Collation.Binary, None)

  def this(spark: SparkSession, tables: Map[String, DataFrame],
      foreignKeys: Map[(String, String), (String, String)],
      collation: graft.core.Collation) =
    this(spark, tables, foreignKeys, collation, None)

  // DML (INSERT/UPDATE/DELETE) rebinds the table's view, mirroring the
  // reference's mutable collections (SqlParser dispatch, SqlParser.cs:32-49).
  // The engine collation applies at view registration (Collation.collate
  // retags string columns with Spark's native collated types), so EVERY
  // comparison in the translated SQL — WHERE, GROUP BY, ORDER BY, JOIN,
  // LIKE — follows it, exactly as the reference collates engine-wide
  // (LiteDB/Utils/Collation.cs via BsonValue.CompareTo).
  private var current: Map[String, DataFrame] =
    tables.map { case (n, df) => n -> collation.collate(df) }
  // mutable twin of the constructor FK registry: in-memory RENAME
  // COLLECTION re-keys entries so INCLUDE keeps resolving declared keys
  // (the facade path instead rebuilds the whole engine with a fresh map)
  private var fks: Map[(String, String), (String, String)] = foreignKeys
  refreshViews()

  /** Temp views are session-global, so another live LiteSql instance (e.g.
    * one with a different collation) may have re-registered the same
    * names since this instance last ran. Re-assert OUR bindings before
    * every command — interleaved sequential use of multiple instances on
    * one session then stays correct (concurrent use of one SparkSession's
    * catalog is inherently racy and out of scope).
    */
  private def refreshViews(): Unit =
    current.foreach { case (n, df) => df.createOrReplaceTempView(n) }

  def table(name: String): DataFrame = current(name.toLowerCase)

  def run(liteSql: String): DataFrame = {
    refreshViews()
    spark.sql(translate(liteSql))
  }

  /** [[run]] with positional `@0 @1 …` parameters bound injection-safe
    * (see [[LiteSql.bindParams]]).
    */
  def run(liteSql: String, params: Seq[Any]): DataFrame =
    run(LiteSql.bindParams(liteSql, params, Map.empty))

  /** [[run]] with named `@name` parameters. */
  def run(liteSql: String, named: Map[String, Any]): DataFrame =
    run(LiteSql.bindParams(liteSql, Nil, named))

  /** [[execute]] with positional `@0 @1 …` parameters — the
    * reference's `LiteDatabase.Execute(sql, args)`.
    */
  def execute(liteSql: String, params: Seq[Any]): DataFrame =
    execute(LiteSql.bindParams(liteSql, params, Map.empty))

  /** [[execute]] with named `@name` parameters — the reference's
    * `Execute(sql, BsonDocument)`.
    */
  def execute(liteSql: String, named: Map[String, Any]): DataFrame =
    execute(LiteSql.bindParams(liteSql, Nil, named))

  /** Full command dispatch by first keyword (SqlParser.cs:32-49):
    * SELECT/EXPLAIN/INSERT/UPDATE/DELETE here; DROP/RENAME/CREATE INDEX/
    * PRAGMA/CHECKPOINT/REBUILD parse here and act through the [[LiteSql.Admin]]
    * hook (the owning GraftDatabase), as do BEGIN/COMMIT/ROLLBACK
    * (buffered statements publish as ONE atomic commit-log version on
    * COMMIT). DML returns a 1-row frame with the
    * affected-row count, like the reference's ExecuteNonQuery; DDL
    * returns a 1-row `result` boolean like BsonDataReader(result).
    */
  def execute(liteSql: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, expr, lit, lower, split, when}
    import spark.implicits._
    // whitespace is collapsed OUTSIDE quotes only — a quoted literal's
    // tabs/double spaces are data, not syntax
    val sql = replaceOutsideQuotes(liteSql.trim, _.replaceAll("\\s+", " "))
    val kw = sql.takeWhile(!_.isWhitespace).toUpperCase
    lastChangedRowsVar = Map.empty
    lastDeletedRowsVar = Map.empty
    lastSetTargetsVar = Nil
    lastHadInsertsVar = false
    refreshViews() // see run(): another instance may hold the view names
    kw match {
      case "SELECT" =>
        // SELECT {expr} [INTO {newcollection}[:{autoId}]] FROM ...
        // (Select.cs:15): with INTO, run the query, land its rows in the
        // target collection (append when it exists, like the reference's
        // ExecuteQueryInto insert loop), and return the inserted count.
        // The :autoId tag parses and is ignored — collections here carry
        // natural PKs, not engine-assigned ObjectIds.
        val IntoRe = "(?i)^(\\w+)(\\s*:\\s*\\w+)?\\s+(FROM\\b.*)$".r
        splitAtKeyword(sql, "INTO") match {
          case (head, Some(rest)) if IntoRe.findFirstMatchIn(rest).isDefined =>
            val m = IntoRe.findFirstMatchIn(rest).get
            val target = m.group(1).toLowerCase
            // pin the result rows before counting: count() and the later
            // persist are separate Spark actions, and for a
            // nondeterministic query (LIMIT without ORDER BY, random
            // exprs) a recompute could land DIFFERENT rows than the
            // n_affected reported. localCheckpoint materializes once —
            // also halving the work for deterministic queries.
            val out = run(head + " " + m.group(3)).localCheckpoint(eager = true)
            val n = out.count()
            val incoming = collation.collate(out)
            val merged = current.get(target)
              .map(_.unionByName(incoming, allowMissingColumns = true))
              .getOrElse(incoming)
            rebind(target, merged)
            lastChangedRowsVar += target ->
              merged.limit(0).unionByName(incoming, allowMissingColumns = true)
            lastHadInsertsVar = true
            Seq(n).toDF("n_affected")
          case _ => run(sql)
        }
      case "EXPLAIN" =>
        spark.sql("EXPLAIN FORMATTED " + translate(sql.drop("EXPLAIN".length)))
      case "INSERT" =>
        // INSERT INTO <col> VALUES {doc} [, {doc}] (Commands/Insert.cs)
        val m = "(?is)^INSERT\\s+INTO\\s+(\\w+)\\s+VALUES\\s+(.+)$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad INSERT: $sql"))
        val name = m.group(1).toLowerCase
        val docs = splitTopLevelDocs(m.group(2))
        val incomingRaw = spark.read.json(docs.toDS())
        require(!incomingRaw.columns.contains("_corrupt_record"),
          s"malformed INSERT document(s): ${docs.mkString("; ")}")
        // collate BEFORE the union: the registered view's string columns
        // carry the engine collation and Spark 4 refuses to union
        // collated with plain strings (INCOMPATIBLE_COLUMN_TYPE)
        val incoming = collation.collate(incomingRaw)
        // INSERT INTO an unknown collection CREATES it, like the
        // reference's lazy collection materialization (Insert.cs via
        // LiteEngine.Insert) — the first document set defines the schema
        val merged = current.get(name)
          .map(_.unionByName(incoming, allowMissingColumns = true))
          .getOrElse(incoming)
        rebind(name, merged)
        // the inserted rows aligned to the merged schema (missing cols
        // null) — what a persisting caller validates as "new"
        lastChangedRowsVar += name ->
          merged.limit(0).unionByName(incoming, allowMissingColumns = true)
        lastHadInsertsVar = true
        Seq(docs.size.toLong).toDF("n_affected")
      case "UPDATE" =>
        // UPDATE <col> SET <path>=<expr>[,...] [WHERE <pred>] (Update.cs);
        // SET/WHERE split is quote-aware (a literal 'works where needed'
        // must not open a WHERE clause)
        val m = "(?i)^UPDATE\\s+(\\w+)\\s+SET\\s+(.+)$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad UPDATE: $sql"))
        val name = m.group(1).toLowerCase
        // UPDATE on an unknown collection affects 0 documents, like the
        // reference (no lazy creation on update)
        if (!current.contains(name)) return Seq(0L).toDF("n_affected")
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
        val applied = assignments.zipWithIndex.foldLeft(staged) {
          case (d, ((target, _), i)) =>
            // LiteDB's UPDATE creates missing paths (Commands/Update.cs):
            // a new column starts null on non-matching rows
            val prev = if (df.columns.contains(target))
              org.apache.spark.sql.functions.col(target)
            else lit(null)
            d.withColumn(target,
              when(org.apache.spark.sql.functions.col("_pred"),
                org.apache.spark.sql.functions.col(s"_rhs$i")).otherwise(prev))
        }
        val helperCols = "_pred" +: assignments.indices.map(i => s"_rhs$i")
        val updated = applied.drop(helperCols: _*)
        rebind(name, updated)
        lastChangedRowsVar += name ->
          applied.filter(org.apache.spark.sql.functions.col("_pred"))
            .drop(helperCols: _*)
        lastSetTargetsVar = assignments.map(_._1)
        Seq(n).toDF("n_affected")
      case "DELETE" =>
        // DELETE <col> WHERE <pred> (Commands/Delete.cs); NULL-predicate
        // rows are kept, not deleted (SQL three-valued semantics)
        val m = "(?i)^DELETE\\s+(\\w+)(?:\\s+WHERE\\s+(.+))?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad DELETE: $sql"))
        val name = m.group(1).toLowerCase
        // DELETE on an unknown collection affects 0 documents (reference)
        if (!current.contains(name)) return Seq(0L).toDF("n_affected")
        val df = current(name)
        val pred = Option(m.group(2))
          .map(w => expr(translateExpr(w))).getOrElse(lit(true))
        val hit = coalesce(pred, lit(false))
        val n = df.filter(hit).count()
        rebind(name, df.filter(!hit))
        lastDeletedRowsVar += name -> df.filter(hit)
        Seq(n).toDF("n_affected")
      case "MERGE" =>
        executeMerge(sql)
      case "DROP" =>
        // DROP INDEX {collection}.{indexName} | DROP COLLECTION {name}
        // (SqlParser.cs ParseDrop). Index names resolve through the
        // facade's name→column registry (GraftDatabase.indexDefs), so
        // the reference-compatible sequence CREATE INDEX ix ON c (a);
        // DROP INDEX c.ix works; a bare column name still resolves for
        // indexes registered without an explicit name.
        val IdxRe = "(?i)^DROP INDEX (\\w+)\\.(\\w+)\\s*;?$".r
        val ColRe = "(?i)^DROP COLLECTION (\\w+)\\s*;?$".r
        sql match {
          case IdxRe(c, ix) =>
            val ok = admin.map(_.dropIndex(c.toLowerCase, ix)).getOrElse(
              throw new UnsupportedOperationException(
                "DROP INDEX needs a database-backed engine (GraftDatabase.sql)"))
            Seq(ok).toDF("result")
          case ColRe(c) =>
            val name = c.toLowerCase
            val existedInMem = current.contains(name)
            // admin (the facade) is authoritative about persisted state;
            // the in-memory view map unbinds either way
            val ok = admin.map(_.dropCollection(name)).getOrElse(existedInMem)
            if (existedInMem) {
              current -= name
              dirtyNames -= name
              spark.catalog.dropTempView(name)
            }
            Seq(ok).toDF("result")
          case _ => throw new IllegalArgumentException(
            s"bad DROP (expected DROP INDEX c.ix | DROP COLLECTION c): $sql")
        }
      case "RENAME" =>
        // RENAME COLLECTION {name} TO {newName} (SqlParser.cs ParseRename)
        val m = "(?i)^RENAME COLLECTION (\\w+) TO (\\w+)\\s*;?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(s"bad RENAME: $sql"))
        val (from, to) = (m.group(1).toLowerCase, m.group(2).toLowerCase)
        require(!current.contains(to),
          s"cannot rename $from to $to: target collection exists")
        val ok = admin match {
          case Some(a) =>
            // the facade moves the directory, so this instance's cached
            // frame for `from` (a file-listing snapshot of the OLD path)
            // is dead — unbind it; the facade rebuilds the engine fresh
            val r = a.renameCollection(from, to)
            current.get(from).foreach { _ =>
              current -= from
              spark.catalog.dropTempView(from)
            }
            dirtyNames -= from
            r
          case None =>
            // in-memory rename: re-key the view map (frames stay valid)
            // AND the FK registry, so INCLUDE against the renamed
            // collection still resolves the declared keys instead of
            // silently failing over to convention-based guessing
            current.get(from) match {
              case Some(df) =>
                current = current - from + (to -> df)
                spark.catalog.dropTempView(from)
                df.createOrReplaceTempView(to)
                if (dirtyNames(from)) dirtyNames = dirtyNames - from + to
                fks = fks.map { case ((p, c), v) =>
                  (if (p == from) to else p, if (c == from) to else c) -> v
                }
                true
              case None => false
            }
        }
        Seq(ok).toDF("result")
      case "CREATE" =>
        // CREATE [UNIQUE] INDEX {name} ON {collection} ({expr})
        // (SqlParser.cs ParseCreate). The index expression must reduce to
        // a single column: the lakehouse "index" is a range-clustered
        // sorted layout on that column (GraftDatabase.ensureIndex), and a
        // computed expression has no stored column to cluster on.
        val m = ("(?i)^CREATE (UNIQUE )?INDEX (\\w+) ON (\\w+) " +
          "\\((.+)\\)\\s*;?$").r.findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(
              s"bad CREATE (expected CREATE [UNIQUE] INDEX ix ON c (expr)): $sql"))
        val unique = m.group(1) != null
        val ixName = m.group(2)
        val coll = m.group(3).toLowerCase
        val column = translateExpr(m.group(4).trim)
        require(column.matches("[A-Za-z_][A-Za-z0-9_.]*"),
          s"index expression must be a plain column path, got: $column")
        val ok = admin.map(_.ensureIndex(coll, ixName, column, unique))
          .getOrElse(throw new UnsupportedOperationException(
            "CREATE INDEX needs a database-backed engine (GraftDatabase.sql)"))
        Seq(ok).toDF("result")
      case "PRAGMA" =>
        // PRAGMA NAME | PRAGMA NAME = VALUE (SqlParser.cs ParsePragma)
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "PRAGMA needs a database-backed engine (GraftDatabase.sql)"))
        val SetRe = "(?i)^PRAGMA (\\w+)\\s*=\\s*(.+?)\\s*;?$".r
        val GetRe = "(?i)^PRAGMA (\\w+)\\s*;?$".r
        sql match {
          case SetRe(n, raw) =>
            val v: Any =
              raw.toLongOption.getOrElse[Any](
                raw.toBooleanOption.getOrElse[Any](
                  raw.stripPrefix("'").stripSuffix("'")
                    .stripPrefix("\"").stripSuffix("\"")))
            a.setPragma(n, v)
            Seq(true).toDF("result")
          case GetRe(n) =>
            Seq((n.toUpperCase, String.valueOf(a.pragma(n))))
              .toDF("name", "value")
          case _ => throw new IllegalArgumentException(s"bad PRAGMA: $sql")
        }
      case "CHECKPOINT" | "REBUILD" =>
        // CHECKPOINT flushes the WAL, REBUILD rewrites the datafile
        // (SqlParser.cs). The parquet-store analog of both is small-file
        // compaction maintenance; returns the number of compacted tables.
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          s"$kw needs a database-backed engine (GraftDatabase.sql)"))
        Seq(a.checkpoint().size.toLong).toDF("n_affected")
      case "VACUUM" =>
        // VACUUM [RETAIN n VERSIONS] [RETAIN h HOURS] — reclaim files
        // no retained version references (the lakehouse GC; dialect
        // extension). VERSIONS bounds the kept history depth; HOURS
        // overrides the in-flight age grace (RETAIN 0 HOURS = reclaim
        // immediately, the Delta-style test/maintenance knob). Returns
        // the number of reclaimed paths.
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "VACUUM needs a database-backed engine (GraftDatabase.sql)"))
        val keep = "(?i)\\bRETAIN\\s+(\\d+)\\s+VERSIONS?\\b".r
          .findFirstMatchIn(sql).map(_.group(1).toInt)
        val hours = "(?i)\\bRETAIN\\s+(\\d+)\\s+HOURS?\\b".r
          .findFirstMatchIn(sql).map(_.group(1).toLong * 3600L * 1000L)
        Seq(a.vacuumStore(keep, hours).toLong).toDF("n_affected")
      case "DESCRIBE" =>
        // DESCRIBE HISTORY [collection] — the commit log as a result
        // set (version, action, target, n_files), optionally filtered
        // to one collection's actions (the lakehouse DESCRIBE HISTORY).
        val dm = "(?i)^DESCRIBE\\s+HISTORY(?:\\s+(\\w+))?\\s*;?$".r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(
              s"expected DESCRIBE HISTORY [collection]: $sql"))
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "DESCRIBE HISTORY needs a database-backed engine"))
        val h = a.historyFrame
        // match the WHOLE identifier, not a prefix: `cust` must not
        // also return `customer` rows. Targets are `t`, `t(-N)`/`t(f)`
        // (PATCH/DVC suffixes), or `old->new` (REN) — compare each form
        // exactly
        Option(dm.group(1)).map(_.toLowerCase)
          .fold(h)(t => h.filter {
            val lt = lower(col("target"))
            lt === t || lt.startsWith(s"$t(") ||
              (lt.contains("->") &&
                (element_at(split(lt, "->"), 1) === t ||
                  element_at(split(lt, "->"), 2) === t))
          })
      case "BEGIN" | "COMMIT" | "ROLLBACK" =>
        // BEGIN/COMMIT/ROLLBACK [TRANS|TRANSACTION] (SqlParser.cs:32-41
        // → LiteEngine.BeginTrans/Commit/Rollback): statements between
        // BEGIN and COMMIT publish as ONE atomic commit in the storage
        // log; the boolean result mirrors the reference (false for
        // BEGIN-inside-tx or COMMIT/ROLLBACK-without-tx)
        require(sql.matches(s"(?i)$kw(\\s+TRANS(ACTION)?)?\\s*;?"),
          s"bad $kw (expected $kw [TRANS|TRANSACTION]): $sql")
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          s"$kw needs a database-backed engine (GraftDatabase.sql)"))
        val ok = kw match {
          case "BEGIN"    => a.beginTrans()
          case "COMMIT"   => a.commitTrans()
          case "ROLLBACK" => a.rollbackTrans()
        }
        Seq(ok).toDF("result")
      case "OPTIMIZE" =>
        // OPTIMIZE {collection} [ZORDER BY (a, b[, c[, d]])] — bin-pack
        // the table's small files into right-sized ones, or rewrite the
        // whole table clustered on the Morton interleave of 2-4
        // columns (dialect extension; the store-level analog of the
        // reference's REBUILD, but file-granular and non-blocking)
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "OPTIMIZE needs a database-backed engine (GraftDatabase.sql)"))
        val zm = ("(?i)^OPTIMIZE (\\w+)\\s+ZORDER\\s+BY\\s*" +
          "\\(([\\w\\s,]+)\\)\\s*;?$").r
          .findFirstMatchIn(sql)
        val (b, after) = zm match {
          case Some(z) => a.optimizeZorderCollection(z.group(1).toLowerCase,
            z.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          case None =>
            val m = "(?i)^OPTIMIZE (\\w+)\\s*;?$".r.findFirstMatchIn(sql)
              .getOrElse(throw new IllegalArgumentException(
                s"bad OPTIMIZE (expected OPTIMIZE collection " +
                  s"[ZORDER BY (a, b)]): $sql"))
            a.optimizeCollection(m.group(1).toLowerCase)
        }
        Seq((b.toLong, after.toLong)).toDF("files_before", "files_after")
      case "ALTER" =>
        // ALTER COLLECTION {c} ADD COLUMN {name} {type}
        //                     | RENAME COLUMN {a} TO {b}
        //                     | DROP COLUMN {a}
        //                     | ALTER COLUMN {a} TYPE {type}
        // — all metadata-only schema evolution (dialect extensions): no
        // data file is touched; adds null-fill on read, renames map to
        // the stable physical name, drops tombstone it, widenings
        // upcast at scan time
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "ALTER needs a database-backed engine (GraftDatabase.sql)"))
        val add = ("(?i)^ALTER COLLECTION (\\w+) ADD COLUMN (\\w+) " +
          "([\\w()<>, ]+?)\\s*;?$").r
        val ren = "(?i)^ALTER COLLECTION (\\w+) RENAME COLUMN (\\w+) TO (\\w+)\\s*;?$".r
        val drp = "(?i)^ALTER COLLECTION (\\w+) DROP COLUMN (\\w+)\\s*;?$".r
        val wid = ("(?i)^ALTER COLLECTION (\\w+) ALTER COLUMN (\\w+) TYPE " +
          "([\\w()<>, ]+?)\\s*;?$").r
        sql match {
          case add(c, col0, tpe) => a.addColumn(c.toLowerCase, col0, tpe.trim)
          case ren(c, from, to)  => a.renameColumn(c.toLowerCase, from, to)
          case drp(c, col0)      => a.dropColumn(c.toLowerCase, col0)
          case wid(c, col0, tpe) => a.widenColumn(c.toLowerCase, col0, tpe.trim)
          case _ => throw new IllegalArgumentException(
            "bad ALTER (expected ALTER COLLECTION c ADD COLUMN name type " +
              "| RENAME COLUMN a TO b | DROP COLUMN a " +
              s"| ALTER COLUMN a TYPE type): $sql")
        }
        Seq(true).toDF("result")
      case "RESTORE" =>
        // RESTORE {collection} TO VERSION {v} | TO TIMESTAMP AS OF
        // '<ts>' — metadata-only rollback (dialect extension): rebinds
        // the historical file list as a NEW commit, so the undone
        // states stay time-travelable
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "RESTORE needs a database-backed engine (GraftDatabase.sql)"))
        val vm = "(?i)^RESTORE (\\w+) TO VERSION (\\d+)\\s*;?$".r
          .findFirstMatchIn(sql)
        val tm = ("(?i)^RESTORE (\\w+) TO TIMESTAMP\\s+AS\\s+OF\\s+" +
          "'([^']+)'\\s*;?$").r.findFirstMatchIn(sql)
        (vm, tm) match {
          case (Some(m), _) =>
            a.restoreCollection(m.group(1).toLowerCase, m.group(2).toLong)
          case (_, Some(m)) =>
            a.restoreCollection(m.group(1).toLowerCase,
              a.versionAtTime(LiteSql.parseTsLiteralMs(m.group(2),
                spark.sessionState.conf.sessionLocalTimeZone)))
          case _ => throw new IllegalArgumentException(
            "bad RESTORE (expected RESTORE c TO VERSION v | " +
              s"TO TIMESTAMP AS OF 'ts'): $sql")
        }
        Seq(true).toDF("result")
      case "CLONE" =>
        // CLONE COLLECTION {src} TO {dst} [VERSION AS OF v |
        // TIMESTAMP AS OF '<ts>'] — zero-copy shallow clone (dialect
        // extension): one metadata-only commit, O(1) in data; the
        // historical forms clone the state AT that version/instant
        val m = ("(?i)^CLONE COLLECTION (\\w+) TO (\\w+)" +
          "(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)" +
          "|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')?\\s*;?$").r
          .findFirstMatchIn(sql).getOrElse(
            throw new IllegalArgumentException(
              "bad CLONE (expected CLONE COLLECTION src TO dst " +
                s"[VERSION AS OF v | TIMESTAMP AS OF 'ts']): $sql"))
        val a = admin.getOrElse(throw new UnsupportedOperationException(
          "CLONE needs a database-backed engine (GraftDatabase.sql)"))
        val version: Long =
          if (m.group(3) != null) m.group(3).toLong
          else if (m.group(4) != null)
            a.versionAtTime(LiteSql.parseTsLiteralMs(m.group(4),
              spark.sessionState.conf.sessionLocalTimeZone))
          else -1L
        val ok = a.cloneCollectionAt(m.group(1).toLowerCase,
          m.group(2).toLowerCase, version)
        Seq(ok).toDF("result")
      case other => throw new IllegalArgumentException(
        s"unsupported command $other")
    }
  }

  /** `MERGE INTO target [AS t] USING source [AS s] ON <cond>
    *   { WHEN MATCHED [AND <cond>] THEN UPDATE SET a=<expr>,...
    *   | WHEN MATCHED [AND <cond>] THEN DELETE
    *   | WHEN NOT MATCHED [AND <cond>] THEN INSERT * | (cols) VALUES (exprs) }+`
    *
    * The general form of the reference's per-document Upsert
    * (`Table/TableCollection.cs:1195-1240` resolves each incoming doc to
    * update-or-insert by PK) lifted to set semantics, and the lakehouse-
    * parity twin of OPTIMIZE/CLONE/RESTORE. ANSI behavior: clauses test
    * in ORDER and the first hit wins per row; a target row matching
    * MULTIPLE source rows is an error (checked when the target's PK is
    * known through the admin hook); unmatched-by-every-clause rows pass
    * through unchanged. A persisting caller (GraftDatabase.sql) lands
    * the whole statement as ONE file-granular commit: only target files
    * holding a touched PK rewrite, inserts append.
    *
    * Returns the standard 1-row `n_affected` frame counting updates +
    * deletes + inserts. Limitation: an UNPARENTHESIZED `CASE WHEN`
    * inside a clause condition would split the clause scan — wrap such
    * expressions in parentheses.
    */
  private def executeMerge(sql: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{coalesce, col, count, expr, lit,
      monotonically_increasing_id, when}
    import spark.implicits._
    val H = ("(?is)^MERGE\\s+INTO\\s+(\\w+)(?:\\s+AS\\s+(\\w+))?\\s+" +
      "USING\\s+(\\w+)(?:\\s+AS\\s+(\\w+))?\\s+ON\\s+(.+)$").r
    val m = H.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException(
        s"bad MERGE (expected MERGE INTO t USING s ON cond WHEN ...): $sql"))
    val target = m.group(1).toLowerCase
    val tA = Option(m.group(2)).getOrElse(target)
    val source = m.group(3).toLowerCase
    val sA = Option(m.group(4)).getOrElse(source)
    require(current.contains(source), s"MERGE source '$source' does not exist")
    require(tA != sA,
      "MERGE: target and source aliases must differ (use AS)")
    // clause scan: split at top-level WHEN (paren + quote aware)
    val parts = splitAllAtKeywordTopLevel(m.group(5), "WHEN")
    val onCond = parts.head
    require(parts.size > 1, s"MERGE needs at least one WHEN clause: $sql")

    sealed trait Cl { def cond: Option[String] }
    case class Upd(cond: Option[String], sets: Seq[(String, String)]) extends Cl
    case class Del(cond: Option[String]) extends Cl
    case class Ins(cond: Option[String],
        colsVals: Option[(Seq[String], Seq[String])]) extends Cl // None = *
    // the lakehouse-standard third family: target rows with NO source
    // match (full-sync replication in one statement — pairs with the
    // change feed). UPDATE/DELETE only; conditions and SET expressions
    // see target columns alone (there is no source row).
    case class SUpd(cond: Option[String],
        sets: Seq[(String, String)]) extends Cl
    case class SDel(cond: Option[String]) extends Cl
    val MatchedRe = "(?is)^MATCHED(?:\\s+AND\\s+(.+))?$".r
    val NotMatchedRe =
      "(?is)^NOT\\s+MATCHED(?:\\s+BY\\s+TARGET)?(?:\\s+AND\\s+(.+))?$".r
    val NotMatchedBySrcRe =
      "(?is)^NOT\\s+MATCHED\\s+BY\\s+SOURCE(?:\\s+AND\\s+(.+))?$".r
    def parseSets(s: String): Seq[(String, String)] =
      splitTopLevel(s, ',').map { a =>
        val eq = indexOfCharOutsideQuotes(a, '=')
        require(eq > 0, s"bad MERGE SET assignment: $a")
        (a.substring(0, eq).trim.stripPrefix("$.").trim,
          a.substring(eq + 1).trim)
      }
    val clauses: Seq[Cl] = parts.tail.map { c =>
      val (head, thenOpt) = splitAtKeywordTopLevel(c, "THEN")
      val act = thenOpt.getOrElse(throw new IllegalArgumentException(
        s"MERGE WHEN clause without THEN: $c")).trim
      head.trim match {
        case MatchedRe(cnd) =>
          if (act.equalsIgnoreCase("DELETE")) Del(Option(cnd))
          else {
            val sm = "(?is)^UPDATE\\s+SET\\s+(.+)$".r.findFirstMatchIn(act)
              .getOrElse(throw new IllegalArgumentException(
                s"MERGE WHEN MATCHED expects UPDATE SET or DELETE: $act"))
            Upd(Option(cnd), parseSets(sm.group(1)))
          }
        case NotMatchedBySrcRe(cnd) =>
          if (act.equalsIgnoreCase("DELETE")) SDel(Option(cnd))
          else {
            val sm = "(?is)^UPDATE\\s+SET\\s+(.+)$".r.findFirstMatchIn(act)
              .getOrElse(throw new IllegalArgumentException(
                s"MERGE WHEN NOT MATCHED BY SOURCE expects UPDATE SET " +
                  s"or DELETE: $act"))
            SUpd(Option(cnd), parseSets(sm.group(1)))
          }
        case NotMatchedRe(cnd) =>
          if (act.equalsIgnoreCase("INSERT *") || act.equalsIgnoreCase("INSERT"))
            Ins(Option(cnd), None)
          else {
            val im = ("(?is)^INSERT\\s*\\(([^)]*)\\)\\s*VALUES\\s*" +
              "\\((.+)\\)\\s*$").r.findFirstMatchIn(act)
              .getOrElse(throw new IllegalArgumentException(
                s"MERGE WHEN NOT MATCHED expects INSERT * or " +
                  s"INSERT (cols) VALUES (exprs): $act"))
            val cols = im.group(1).split(',').map(
              _.trim.stripPrefix("$.").trim).toSeq
            val vals = splitTopLevel(im.group(2), ',')
            require(cols.size == vals.size,
              s"MERGE INSERT: ${cols.size} columns but ${vals.size} values")
            Ins(Option(cnd), Some((cols, vals)))
          }
        case other => throw new IllegalArgumentException(
          s"bad MERGE WHEN clause: WHEN $other")
      }
    }

    val src = current(source)
    // MERGE into an unknown collection: every source row is NOT MATCHED
    // (lazy creation, like INSERT's) — the target starts empty with the
    // source's shape so ON/clause expressions still resolve
    val tgt = current.getOrElse(target, src.limit(0))
    val tCols = tgt.columns.toSeq
    val tdf = tgt.alias(tA)
    val sdf = src.alias(sA)
    val on = expr(translateExpr(onCond))
    def cnd(o: Option[String]): Column =
      o.map(c => coalesce(expr(translateExpr(c)), lit(false)))
        .getOrElse(lit(true))

    // ANSI cardinality: one target row may match at most one source
    // row. ONE pass over the inner join: tag each target row with a
    // plan-local id, count matches per id, and probe for any id with
    // ≥2 — one Spark action instead of the old pair-count + semi-count
    // double scan. Key-free (no PK or admin needed, no column-casing
    // dependence); the id never leaves this check's plan, so
    // monotonically_increasing_id's cross-action instability is moot.
    if (!tgt.isEmpty) {
      val multi = tdf
        .withColumn("_graft_tid", monotonically_increasing_id())
        .join(sdf, on, "inner")
        .groupBy(col("_graft_tid")).agg(count(lit(1)).as("_graft_n"))
        .filter(col("_graft_n") > 1).limit(1)
      require(multi.isEmpty,
        "MERGE: a target row matched multiple source rows (ON is not " +
          "unique over the source)")
    }

    val mClauses = clauses.collect { case u: Upd => u: Cl; case d: Del => d: Cl }
    val nmClauses = clauses.collect { case i: Ins => i }
    val sClauses = clauses.collect { case u: SUpd => u: Cl; case d: SDel => d: Cl }
    // output schema: target columns plus any NEW columns a SET/INSERT
    // introduces (LiteDB UPDATE creates missing paths; same here).
    // INSERT * with a WIDER source auto-merges the extra columns into
    // the target (the lakehouse autoMerge): a persisting caller widens
    // the stored schema with ONE SCH action in the same file-granular
    // commit — old files null-fill under the pin, nothing rewrites
    val newCols = (mClauses.collect { case Upd(_, sets) => sets.map(_._1) }
      .flatten ++
      sClauses.collect { case SUpd(_, sets) => sets.map(_._1) }.flatten ++
      nmClauses.flatMap(_.colsVals.map(_._1)
        .getOrElse(src.columns.toSeq)))
      .filterNot(c => tCols.exists(_.equalsIgnoreCase(c))).distinct
    val outCols = tCols ++ newCols
    // ANSI MERGE: source-derived values cast to the TARGET column's
    // type (Spark's own MERGE INTO does the same under its store-
    // assignment policy) — the target schema stays fixed, so a
    // persisting caller keeps the commit file-granular instead of
    // widening the schema and rewriting every live file. Under ANSI
    // mode an overflowing value throws rather than wraps.
    val tType = tgt.schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    def toT(c: String, v: Column): Column =
      tType.get(c.toLowerCase).map(v.cast).getOrElse(v)
    def baseVal(c: String): Column =
      if (tCols.exists(_.equalsIgnoreCase(c))) col(s"$tA.$c") else lit(null)

    // first-hit-wins chains over the matched pairs (built right-to-left)
    val pairs = tdf.join(sdf, on, "inner")
    val act = mClauses.foldRight(lit("keep"): Column) { (c, els) =>
      c match {
        case Upd(o, _) => when(cnd(o), lit("update")).otherwise(els)
        case Del(o) => when(cnd(o), lit("delete")).otherwise(els)
        case _ => els
      }
    }
    def valueOf(c: String): Column = mClauses.foldRight(baseVal(c)) {
      (cl, els) => cl match {
        case Upd(o, sets) =>
          val rhs = sets.find(_._1.equalsIgnoreCase(c))
            .map(x => expr(translateExpr(x._2))).getOrElse(baseVal(c))
          when(cnd(o), rhs).otherwise(els)
        case Del(o) => when(cnd(o), baseVal(c)).otherwise(els)
        case _ => els
      }
    }
    val matchedOut = pairs.select(
      outCols.map(c => toT(c, valueOf(c)).as(c)) :+ act.as("_graft_act"): _*)
    val matchedKept = matchedOut.filter(col("_graft_act") =!= "delete")
      .drop("_graft_act")

    // NOT MATCHED BY SOURCE: first-hit-wins chain over the target rows
    // with no source match — conditions and SET values see target
    // columns only (there is no source row to reference)
    def tgtVal(c: String): Column =
      if (tCols.exists(_.equalsIgnoreCase(c))) col(c) else lit(null)
    val sAct = sClauses.foldRight(lit("keep"): Column) { (c, els) =>
      c match {
        case SUpd(o, _) => when(cnd(o), lit("update")).otherwise(els)
        case SDel(o) => when(cnd(o), lit("delete")).otherwise(els)
        case _ => els
      }
    }
    def sValueOf(c: String): Column = sClauses.foldRight(tgtVal(c)) {
      (cl, els) => cl match {
        case SUpd(o, sets) =>
          val rhs = sets.find(_._1.equalsIgnoreCase(c))
            .map(x => expr(translateExpr(x._2))).getOrElse(tgtVal(c))
          when(cnd(o), rhs).otherwise(els)
        case SDel(o) => when(cnd(o), tgtVal(c)).otherwise(els)
        case _ => els
      }
    }
    val unmatchedTOut = tdf.join(sdf, on, "left_anti")
      .select(outCols.map(c => toT(c, sValueOf(c)).as(c)) :+
        sAct.as("_graft_act"): _*)
    val unmatchedT = unmatchedTOut.filter(col("_graft_act") =!= "delete")
      .drop("_graft_act")

    // NOT MATCHED source rows through the first insert clause that fires
    val unmatchedS = sdf.join(tdf, on, "left_anti")
    val sCols = src.columns.toSeq
    val insIdx = nmClauses.zipWithIndex.foldRight(lit(-1): Column) {
      case ((c, i), els) => when(cnd(c.cond), lit(i)).otherwise(els)
    }
    def insValue(c: String, cl: Ins): Column = cl.colsVals match {
      case None => // INSERT *: same-named source columns, rest null
        if (sCols.exists(_.equalsIgnoreCase(c))) col(c) else lit(null)
      case Some((cols, vals)) =>
        cols.indexWhere(_.equalsIgnoreCase(c)) match {
          case -1 => lit(null)
          case i => expr(translateExpr(vals(i)))
        }
    }
    val inserts =
      if (nmClauses.isEmpty) None
      else Some(unmatchedS.select(
        outCols.map { c =>
          toT(c, nmClauses.zipWithIndex.foldRight(lit(null): Column) {
            case ((cl, i), els) => when(insIdx === i, insValue(c, cl))
              .otherwise(els)
          }).as(c)
        } :+ insIdx.as("_graft_ins"): _*)
        .filter(col("_graft_ins") >= 0).drop("_graft_ins"))

    val nAffected = matchedOut.filter(col("_graft_act") =!= "keep").count() +
      (if (sClauses.isEmpty) 0L
       else unmatchedTOut.filter(col("_graft_act") =!= "keep").count()) +
      inserts.map(_.count()).getOrElse(0L)
    val merged0 = matchedKept.unionByName(unmatchedT,
      allowMissingColumns = true)
    val merged = inserts
      .map(i => merged0.unionByName(i, allowMissingColumns = true))
      .getOrElse(merged0)
    rebind(target, merged)
    val updated = matchedOut.filter(col("_graft_act") === "update")
      .drop("_graft_act")
    val updatedAll =
      if (sClauses.isEmpty) updated
      else updated.unionByName(
        unmatchedTOut.filter(col("_graft_act") === "update")
          .drop("_graft_act"), allowMissingColumns = true)
    lastChangedRowsVar += target -> inserts
      .map(i => updatedAll.unionByName(i, allowMissingColumns = true))
      .getOrElse(updatedAll)
    val deleted = matchedOut.filter(col("_graft_act") === "delete")
      .drop("_graft_act")
    lastDeletedRowsVar += target -> (
      if (sClauses.isEmpty) deleted
      else deleted.unionByName(
        unmatchedTOut.filter(col("_graft_act") === "delete")
          .drop("_graft_act"), allowMissingColumns = true))
    lastSetTargetsVar =
      (mClauses.collect { case Upd(_, sets) => sets.map(_._1) } ++
        sClauses.collect { case SUpd(_, sets) => sets.map(_._1) }).flatten
    lastHadInsertsVar = nmClauses.nonEmpty
    Seq(nAffected).toDF("n_affected")
  }

  /** [[splitAllAtKeywordTopLevel]] restricted to the FIRST top-level
    * occurrence (a `THEN` inside `(CASE WHEN ... THEN ...)` is
    * expression text, not clause syntax). Later occurrences rejoin with
    * single-space keywords — whitespace-insensitive to SQL, and
    * `execute` pre-collapses whitespace anyway.
    */
  private def splitAtKeywordTopLevel(s: String,
      kw: String): (String, Option[String]) =
    splitAllAtKeywordTopLevel(s, kw) match {
      case Seq(only) => (only, None)
      case head +: rest => (head, Some(rest.mkString(s" $kw ")))
    }

  /** Split at EVERY top-level occurrence of `kw` (word-boundary, quote
    * AND paren/bracket aware — a parenthesized `CASE WHEN` never splits
    * a MERGE clause scan).
    */
  private def splitAllAtKeywordTopLevel(s: String, kw: String): Seq[String] = {
    val mask = quoteMask(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      if (!mask(i)) {
        val c = s.charAt(i)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && i + kw.length <= s.length &&
            s.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
            (i + kw.length >= s.length ||
              !isIdentChar(s.charAt(i + kw.length)))) {
          out += s.substring(start, i).trim
          start = i + kw.length
          i += kw.length - 1
        }
      }
      i += 1
    }
    out += s.substring(start).trim
    out.toSeq
  }

  private def rebind(name: String, df: DataFrame): Unit = {
    // re-collate: INSERT merges in plain (binary) string columns
    val collated = collation.collate(df)
    current = current.updated(name, collated)
    dirtyNames += name
    collated.createOrReplaceTempView(name)
  }

  private var dirtyNames: Set[String] = Set.empty
  private var lastChangedRowsVar: Map[String, DataFrame] = Map.empty
  private var lastDeletedRowsVar: Map[String, DataFrame] = Map.empty
  private var lastSetTargetsVar: Seq[String] = Nil
  private var lastHadInsertsVar: Boolean = false

  /** Tables rebound by DML since construction (name -> current state) —
    * what a persisting caller (GraftDatabase.sql) must write back.
    */
  def modified: Map[String, DataFrame] = dirtyNames.map(n => n -> current(n)).toMap

  /** The rows the LAST execute() actually inserted/updated (per table) —
    * the incoming set a persisting caller validates constraints against,
    * so pre-existing rows (e.g. orphans a cascade-free SQL DELETE left)
    * never re-fail validation.
    */
  def changedRows: Map[String, DataFrame] = lastChangedRowsVar

  /** The rows the LAST execute() deleted (per table) — kept separate
    * from [[changedRows]] because deleted rows must NOT re-enter
    * constraint validation (they are gone from the result state); a
    * persisting caller uses them to locate the files a DELETE touched.
    */
  def deletedRows: Map[String, DataFrame] = lastDeletedRowsVar

  /** SET target columns of the last UPDATE (for PK-immutability checks). */
  def lastSetTargets: Seq[String] = lastSetTargetsVar

  /** True when the last statement could have added NEW primary keys
    * (INSERT, SELECT INTO, MERGE with an INSERT clause) — a persisting
    * caller must then commit ABSOLUTE, never as a commuting patch: two
    * concurrent patch-commits could both land the same new PK (the
    * write-skew the patch gate exists to prevent).
    */
  def lastHadInserts: Boolean = lastHadInsertsVar

  /** $-path translation only (for WHERE/SET fragments): member paths plus
    * the array segments documented on translateDollarPaths.
    */
  def translateExpr(fragment: String): String =
    translateDollarPaths(fragment.trim, itemVar = None, depth = 0)

  private def isIdentStart(c: Char) = c == '_' || Character.isLetter(c)
  private def isIdentChar(c: Char) = c == '_' || Character.isLetterOrDigit(c)
  private val IntRe = "-?\\d+".r

  /** Translate every `$`-rooted LiteDB path in `s` to a Spark SQL
    * expression (quote-aware; quoted literals pass through):
    *   - `$.a.b`            -> `a.b`; lone `$` -> `*`
    *   - `$.arr[2]`         -> `try_element_at(arr, 3)` (0-based in the
    *     dialect, 1-based in Spark; out-of-bounds -> NULL, matching
    *     ARRAY_INDEX, BsonExpressionOperators.cs:269-296)
    *   - `$.arr[-1]`        -> `try_element_at(arr, -1)` (from the end)
    *   - `$.arr[*].f`       -> `transform(arr, _e -> _e.f)` (all items,
    *     ARRAY_FILTER index=MaxValue, BsonExpressionOperators.cs:301-329)
    *   - `$.arr[@.x > 1]`   -> `filter(arr, _it -> _it.x > 1)` where `@`
    *     is the current item (`@` alone for scalar arrays)
    * Segments compose: `$.a[0].b[@.c > 1].d` nests accordingly. When
    * `itemVar` is set, `@`-rooted paths resolve against that lambda
    * variable (used inside filter contents; depth suffixes keep nested
    * lambda variables distinct).
    */
  private def translateDollarPaths(s: String, itemVar: Option[String],
      depth: Int): String = {
    val mask = quoteMask(s)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val lambda =
        if (!mask(i) && isIdentStart(c) &&
            (i == 0 || !isIdentChar(s.charAt(i - 1))))
          tryRewriteLambdaFn(s, mask, i, itemVar, depth)
        else None
      if (lambda.isDefined) {
        val (sql, next) = lambda.get
        sb ++= sql
        i = next
      } else if (!mask(i) && c == '$' &&
          (i == 0 || !isIdentChar(s.charAt(i - 1)))) {
        if (i + 1 < s.length && s.charAt(i + 1) == '.' &&
            i + 2 < s.length && isIdentStart(s.charAt(i + 2))) {
          val (expr, next) = parsePath(s, mask, i + 2, rootPrefix = "", depth)
          sb ++= expr
          i = next
        } else if (i + 1 >= s.length ||
            (!isIdentChar(s.charAt(i + 1)) && s.charAt(i + 1) != '.')) {
          sb += '*'; i += 1 // lone $ -> all columns
        } else { sb += c; i += 1 }
      } else if (!mask(i) && c == '@' && itemVar.isDefined &&
          (i == 0 || !isIdentChar(s.charAt(i - 1)))) {
        if (i + 1 < s.length && s.charAt(i + 1) == '.' &&
            i + 2 < s.length && isIdentStart(s.charAt(i + 2))) {
          val (expr, next) =
            parsePath(s, mask, i + 2, rootPrefix = itemVar.get + ".", depth)
          sb ++= expr
          i = next
        } else { sb ++= itemVar.get; i += 1 } // lone @ -> the item itself
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** The reference's explicit enumerable functions
    * (`BsonExpressionParser.cs:1166-1280` — `MAP(items[*] => @.Name)`,
    * `FILTER(arr => @.x > 1)`, `SORT(arr => @.key [, order])`, where
    * `@` is the current item): rewritten to Spark's higher-order
    * functions (`transform` / `filter` / `array_sort` with a
    * comparator). Fires only when a top-level `=>` sits inside the
    * parens, so Spark's own `filter(arr, x -> ...)` builtin — and any
    * plain call named MAP/FILTER/SORT — passes through untouched.
    * Returns (sql, indexAfterCloseParen) or None to fall through.
    * SORT's optional second argument: `-1` / `'desc'` sorts descending
    * (`BsonExpressionFunctions.SORT` order parameter); nulls first in
    * ascending order, like the reference's BsonValue comparison placing
    * null lowest.
    */
  private def tryRewriteLambdaFn(s: String, mask: Array[Boolean], start: Int,
      itemVar: Option[String], depth: Int): Option[(String, Int)] = {
    var i = start
    while (i < s.length && isIdentChar(s.charAt(i))) i += 1
    val word = s.substring(start, i).toUpperCase
    if (word != "MAP" && word != "FILTER" && word != "SORT") return None
    if (i >= s.length || s.charAt(i) != '(') return None
    val close = matchParen(s, mask, i)
    val content = s.substring(i + 1, close)
    // top-level `=>` (quote + paren/bracket aware); absent -> not ours
    val cMask = quoteMask(content)
    var d = 0
    var arrow = -1
    var j = 0
    while (j < content.length - 1 && arrow < 0) {
      if (!cMask(j)) {
        val ch = content.charAt(j)
        if (ch == '(' || ch == '[') d += 1
        else if (ch == ')' || ch == ']') d -= 1
        else if (d == 0 && ch == '=' && content.charAt(j + 1) == '>' &&
            (j == 0 || content.charAt(j - 1) != '<' &&
              content.charAt(j - 1) != '>' && content.charAt(j - 1) != '='))
          arrow = j
      }
      j += 1
    }
    if (arrow < 0) return None
    val input = translateDollarPaths(content.substring(0, arrow).trim,
      itemVar, depth)
    val rest = content.substring(arrow + 2).trim
    val sfx = if (depth == 0) "" else (depth + 1).toString
    word match {
      case "MAP" | "FILTER" =>
        val v = s"_it$sfx"
        val body = translateDollarPaths(rest, Some(v), depth + 1)
        val fn = if (word == "MAP") "transform" else "filter"
        Some((s"$fn($input, $v -> $body)", close + 1))
      case _ => // SORT: [itemExpr [, order]]
        val segs = splitTopLevel(rest, ',')
        val (keyExpr, desc) = segs match {
          case Seq(k) => (k, false)
          case Seq(k, o) =>
            val ord = o.trim.stripPrefix("'").stripSuffix("'")
            (k, ord == "-1" || ord.equalsIgnoreCase("desc"))
          case _ => throw new IllegalArgumentException(
            s"bad SORT (expected SORT(arr => key [, order])): $content")
        }
        val (l, r) = (s"_l$sfx", s"_r$sfx")
        val kl = translateDollarPaths(keyExpr, Some(l), depth + 1)
        val kr = translateDollarPaths(keyExpr, Some(r), depth + 1)
        val (lt, gt) = if (desc) ("1", "-1") else ("-1", "1")
        Some((s"array_sort($input, ($l, $r) -> CASE " +
          s"WHEN ($kl) IS NULL AND ($kr) IS NULL THEN 0 " +
          s"WHEN ($kl) IS NULL THEN $lt WHEN ($kr) IS NULL THEN $gt " +
          s"WHEN ($kl) < ($kr) THEN $lt WHEN ($kl) > ($kr) THEN $gt " +
          "ELSE 0 END)", close + 1))
    }
  }

  /** Index of the `)` matching the `(` at `open` (depth + quote aware). */
  private def matchParen(s: String, mask: Array[Boolean], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (!mask(i)) {
        if (s.charAt(i) == '(') depth += 1
        else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced ( in: $s")
  }

  /** Parse one member chain (with optional bracket segments) starting at
    * an identifier char; returns (sql expression, index after the path).
    */
  private def parsePath(s: String, mask: Array[Boolean], start: Int,
      rootPrefix: String, depth: Int): (String, Int) = {
    var i = start
    def members(): String = {
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      var go = true
      while (go && i < s.length && isIdentStart(s.charAt(i))) {
        val b = i
        while (i < s.length && isIdentChar(s.charAt(i))) i += 1
        names += s.substring(b, i)
        if (i + 1 < s.length && s.charAt(i) == '.' &&
            isIdentStart(s.charAt(i + 1))) i += 1
        else go = false
      }
      names.mkString(".")
    }
    var expr = rootPrefix + members()
    while (i < s.length && s.charAt(i) == '[') {
      val close = matchBracket(s, mask, i)
      val content = s.substring(i + 1, close).trim
      i = close + 1
      val cont =
        if (i + 1 < s.length && s.charAt(i) == '.' &&
            isIdentStart(s.charAt(i + 1))) {
          i += 1; Some(members())
        } else None
      val sfx = if (depth == 0) "" else (depth + 1).toString
      expr = content match {
        case "*" =>
          cont.map(f => s"transform($expr, _e$sfx -> _e$sfx.$f)").getOrElse(expr)
        case IntRe() =>
          val n = content.toLong
          val idx = if (n >= 0) n + 1 else n
          val e = s"try_element_at($expr, $idx)"
          cont.map(f => s"$e.$f").getOrElse(e)
        case _ =>
          val v = s"_it$sfx"
          val inner = translateDollarPaths(content, Some(v), depth + 1)
          val f = s"filter($expr, $v -> $inner)"
          cont.map(g => s"transform($f, _e$sfx -> _e$sfx.$g)").getOrElse(f)
      }
    }
    (expr, i)
  }

  /** Index of the `]` matching the `[` at `open` (bracket-depth + quote
    * aware).
    */
  private def matchBracket(s: String, mask: Array[Boolean], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (!mask(i)) {
        if (s.charAt(i) == '[') depth += 1
        else if (s.charAt(i) == ']') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced [ in: $s")
  }

  /** GROUP BY's `@key` alias: the reference binds the group key value as
    * the `key` parameter visible to SELECT/HAVING expressions
    * (GroupByPipe.cs:28-106) — substituted here with the parenthesized
    * GROUP BY expression text (then translated like any expression).
    */
  private def substituteGroupKey(s: String): String =
    splitAtKeyword(s, "GROUP BY")._2 match {
      case None => s
      case Some(after) =>
        val grpText = Seq("HAVING", "ORDER", "LIMIT", "OFFSET")
          .foldLeft(after)((acc, kw) => splitAtKeyword(acc, kw)._1).trim
        val mask = quoteMask(s)
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          if (!mask(i) && s.regionMatches(true, i, "@key", 0, 4) &&
              (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
              (i + 4 >= s.length || !isIdentChar(s.charAt(i + 4)))) {
            sb ++= "(" + grpText + ")"; i += 4
          } else { sb += s.charAt(i); i += 1 }
        }
        sb.toString
    }

  /** One quote-state core for every scanner in this class: mask(i) is
    * true when position i sits inside a single- OR double-quoted run
    * (opening char remembered; backslash escapes honored inside double
    * quotes — JSON/Spark-SQL string semantics).
    */
  private def quoteMask(s: String): Array[Boolean] =
    LiteSql.quoteMaskStatic(s)

  /** Split at the first whole-word keyword outside quotes; returns
    * (before, Some(after)) or (whole, None).
    */
  private def splitAtKeyword(s: String, kw: String): (String, Option[String]) = {
    val mask = quoteMask(s)
    var i = 0
    while (i < s.length) {
      // isIdentChar (incl. '_'): a column like `where_clause` must not
      // split at its keyword prefix
      if (!mask(i) && i + kw.length <= s.length &&
          s.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !isIdentChar(s.charAt(i - 1))) &&
          (i + kw.length >= s.length ||
            !isIdentChar(s.charAt(i + kw.length))))
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

    // `SELECT ... FOR UPDATE` (the reference parses it into the Query
    // IR, `Client/SqlParser/Commands/Select.cs` ForUpdate): under
    // snapshot-MVCC readers never block writers and writers conflict at
    // commit, so the clause is accepted and ignored — not a parse error
    sql = "(?i)\\s+FOR\\s+UPDATE\\s*;?\\s*$".r.replaceAllIn(sql, "")

    // Time travel by wall clock: `FROM <t> TIMESTAMP AS OF '<ts>'`
    // resolves the literal to the latest commit at or before it (the
    // lakehouse-standard sibling of VERSION AS OF; commit stamps ride
    // every version file). Wall-clock literals without a zone read in
    // the SESSION timezone, like every other timestamp the engine
    // parses.
    val TasofRe = ("(?i)\\b(FROM|JOIN)\\s+(\\w+)\\s+TIMESTAMP\\s+AS\\s+OF" +
      "\\s+'([^']+)'").r
    sql = TasofRe.replaceAllIn(sql, m => {
      val (kw, t, litS) = (m.group(1), m.group(2).toLowerCase, m.group(3))
      val a = admin.getOrElse(throw new UnsupportedOperationException(
        "TIMESTAMP AS OF needs a database-backed engine (GraftDatabase.sql)"))
      val ms = LiteSql.parseTsLiteralMs(litS,
        spark.sessionState.conf.sessionLocalTimeZone)
      val df = a.tableAtTime(t, ms).getOrElse(
        throw new IllegalArgumentException(
          s"table '$t' does not exist as of '$litS'"))
      // view keyed by the RESOLVED epoch millis (hex — always a valid
      // identifier): distinct literals naming the same instant share a
      // snapshot harmlessly; string-hash collisions would silently
      // alias DIFFERENT snapshots
      val view = s"${t}__tasof_${java.lang.Long.toHexString(ms)}"
      collation.collate(df).createOrReplaceTempView(view)
      s"$kw $view"
    })

    // Time travel: `FROM <t> VERSION AS OF <v>` binds a view of the
    // table at committed log version v (GraftDatabase.tableAt — needs a
    // database-backed engine). The view name is version-suffixed, so it
    // never clobbers the live binding and two versions can join.
    val VasofRe = "(?i)\\bFROM\\s+(\\w+)\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\b".r
    sql = VasofRe.replaceAllIn(sql, m => {
      val (t, v) = (m.group(1).toLowerCase, m.group(2).toLong)
      val a = admin.getOrElse(throw new UnsupportedOperationException(
        "VERSION AS OF needs a database-backed engine (GraftDatabase.sql)"))
      val df = a.tableAt(t, v).getOrElse(throw new IllegalArgumentException(
        s"table '$t' does not exist at version $v"))
      val view = s"${t}__vasof_$v"
      collation.collate(df).createOrReplaceTempView(view)
      s"FROM $view"
    })

    // GROUP BY's @key alias substitutes BEFORE path translation, so the
    // substituted group expression translates like any other
    sql = substituteGroupKey(sql)

    // $-paths (outside quotes): member paths, array index/filter segments
    sql = translateDollarPaths(sql, itemVar = None, depth = 0)

    // INCLUDE list -> LEFT JOINs after FROM. The terminating keyword must
    // be a WHOLE word after whitespace: without \b a child named
    // `workorders` would be truncated at the OR of ORDER, and a
    // multi-child list could stop mid-identifier.
    val IncRe = ("(?i)\\bFROM\\s+(\\w+)\\s+INCLUDE\\s+([\\w\\s,]+?)" +
      "(?=\\s+(?:WHERE|GROUP|HAVING|ORDER|LIMIT|OFFSET)\\b|\\s*$)").r
    sql = IncRe.replaceAllIn(sql, m => {
      val base = m.group(1).toLowerCase
      val joins = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).map { child =>
        val (pk, fk) = fks.getOrElse((base, child.toLowerCase),
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

  /** Bind `@`-parameters into a statement — the reference's
    * `LiteDatabase.Execute(sql, args)` overloads (PARAMETER_PATH,
    * `BsonExpressionOperators.cs:219`): `@0 @1 …` positional, `@name`
    * named. Parameters lower to TYPE-CORRECT literals BEFORE any
    * parsing, so a string parameter is always data, never syntax (the
    * injection-safe path — quotes and backslashes inside it are
    * escaped). `@` tokens the call does NOT bind pass through
    * untouched: the dialect's lambda item (`@`) and GROUP BY alias
    * (`@key`) keep working; a bound name shadows them.
    */
  def bindParams(sql: String, positional: Seq[Any],
      named: Map[String, Any]): String = {
    if (positional.isEmpty && named.isEmpty) return sql
    val mask = quoteMaskStatic(sql)
    def identChar(c: Char) = c == '_' || Character.isLetterOrDigit(c)
    val sb = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!mask(i) && c == '@' && i + 1 < sql.length &&
          identChar(sql.charAt(i + 1)) &&
          (i == 0 || !identChar(sql.charAt(i - 1)))) {
        var j = i + 1
        while (j < sql.length && identChar(sql.charAt(j))) j += 1
        val name = sql.substring(i + 1, j)
        val bound: Option[Any] =
          // length-guarded: an all-digit token past Int range must pass
          // through unbound, never throw in toInt
          if (name.length <= 9 && name.forall(_.isDigit) &&
              name.toInt < positional.length)
            Some(positional(name.toInt))
          else named.get(name)
        bound match {
          case Some(v) => sb ++= renderParam(v); i = j
          case None => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** One parameter value as a type-correct Spark SQL literal. Plain
    * strings render double-quoted; a string carrying a quote,
    * backslash, or control char renders as `decode(X'…', 'UTF-8')`
    * instead — backslash escapes flip meaning under
    * `spark.sql.parser.escapedStringLiterals` and doubled quotes are
    * NOT an escape in that legacy mode (measured on Spark 4.1:
    * `"a""b"` parses to `a""b`), so a hex literal is the only
    * rendering that is injection-proof in BOTH parser modes.
    * Doubles/floats round-trip through CAST (NaN/∞-safe); timestamps
    * render tz-independent as `timestamp_micros`.
    */
  def renderParam(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => renderParam(x)
    case s: String =>
      if (s.exists(c => c == '"' || c == '\\' || c < ' '))
        "decode(X'" + s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => f"${b & 0xff}%02X").mkString + "', 'UTF-8')"
      else "\"" + s + "\""
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => s"CAST('$d' AS DOUBLE)"
    case f: Float => s"CAST('$f' AS FLOAT)"
    case bd: BigDecimal => bd.bigDecimal.toPlainString + "BD"
    case bd: java.math.BigDecimal => bd.toPlainString + "BD"
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      s"timestamp_micros(${i.getEpochSecond * 1000000L + i.getNano / 1000}L)"
    case i: java.time.Instant =>
      s"timestamp_micros(${i.getEpochSecond * 1000000L + i.getNano / 1000}L)"
    case d: java.time.LocalDateTime =>
      s"TIMESTAMP_NTZ '${d.toString.replace('T', ' ')}'"
    case d: java.sql.Date => s"DATE '$d'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case b: Array[Byte] =>
      "X'" + b.map(x => f"${x & 0xff}%02X").mkString + "'"
    case a: Seq[_] => a.map(renderParam).mkString("array(", ", ", ")")
    case a: Array[_] => a.map(renderParam).mkString("array(", ", ", ")")
    case other => throw new IllegalArgumentException(
      s"unsupported parameter type: ${other.getClass.getName}")
  }

  /** [[LiteSql.quoteMask]]'s logic, shared with the instance method. */
  private[query] def quoteMaskStatic(s: String): Array[Boolean] = {
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

  /** Epoch millis of a `TIMESTAMP AS OF` literal. Accepts ISO instants
    * (trailing Z / offset), `yyyy-MM-dd HH:mm:ss[.fff]`, and bare
    * dates (midnight); zone-less forms read in `sessionTz` — the same
    * wall-clock convention as every other timestamp the session
    * parses.
    */
  def parseTsLiteralMs(s: String, sessionTz: String): Long = {
    val zone = java.time.ZoneId.of(sessionTz)
    val t = s.trim
    val inst =
      try java.time.Instant.parse(t)
      catch {
        case _: Exception =>
          try java.time.OffsetDateTime.parse(t).toInstant
          catch {
            case _: Exception =>
              try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
                .atZone(zone).toInstant
              catch {
                case _: Exception =>
                  try java.time.LocalDate.parse(t).atStartOfDay(zone)
                    .toInstant
                  catch {
                    case _: Exception => throw new IllegalArgumentException(
                      s"TIMESTAMP AS OF: cannot parse timestamp '$s'")
                  }
              }
          }
      }
    inst.toEpochMilli
  }

  /** Storage-side hooks for the DDL/admin commands (`SqlParser.cs:38-49`
    * dispatch): the SQL layer parses, the owning database acts. A
    * standalone LiteSql (no admin) still supports in-memory DROP/RENAME
    * COLLECTION on its view map; index/pragma/checkpoint commands need
    * the facade because they are storage-layout concerns.
    */
  trait Admin {
    def dropCollection(name: String): Boolean
    def renameCollection(name: String, newName: String): Boolean
    /** Register/rebuild a named index over one column (the reference
      * keys indexes by NAME — `SqlParser/Commands/Create.cs` — so DROP
      * INDEX can resolve `collection.indexName` later).
      */
    def ensureIndex(collection: String, indexName: String, column: String,
        unique: Boolean): Boolean
    /** Drop by index name (or, for unnamed registrations, column name). */
    def dropIndex(collection: String, indexName: String): Boolean
    def pragma(name: String): Any
    def setPragma(name: String, value: Any): Unit
    def checkpoint(): Seq[String]
    /** BEGIN/COMMIT/ROLLBACK (LiteEngine.BeginTrans/Commit/Rollback):
      * false on BEGIN-inside-tx or COMMIT/ROLLBACK-without-tx.
      */
    def beginTrans(): Boolean
    def commitTrans(): Boolean
    def rollbackTrans(): Boolean
    /** Time travel: the table as of a committed log version (None when
      * it did not exist at that version).
      */
    def tableAt(name: String, version: Long): Option[DataFrame]
    /** Time travel by wall clock: the table as of the latest commit at
      * or before `epochMs`.
      */
    def tableAtTime(name: String, epochMs: Long): Option[DataFrame]
    /** Bin-pack the collection's small files; (filesBefore, filesAfter). */
    def optimizeCollection(name: String): (Int, Int)
    /** Full-table rewrite clustered on the Morton interleave of two
      * columns (multi-column data-skipping layout).
      */
    def optimizeZorderCollection(name: String,
        cols: Seq[String]): (Int, Int)
    /** Zero-copy shallow clone src → dst (metadata-only commit). */
    def cloneCollection(src: String, dst: String): Boolean
    /** [[cloneCollection]] of the state AT a version (-1 = head). */
    def cloneCollectionAt(src: String, dst: String, version: Long): Boolean
    /** Latest version committed at or before the instant (epoch ms). */
    def versionAtTime(epochMs: Long): Long
    /** Metadata-only ADD COLUMN; `ddlType` is a Spark DDL type name. */
    def addColumn(name: String, column: String, ddlType: String): Unit
    /** Metadata-only column rename (constraints/indexes re-key). */
    def renameColumn(name: String, from: String, to: String): Unit
    /** Metadata-only column drop (tombstoned in the pin). */
    def dropColumn(name: String, column: String): Unit
    /** Metadata-only lossless type widening. */
    def widenColumn(name: String, column: String, ddlType: String): Unit
    /** Metadata-only rollback to a committed version (a NEW commit). */
    def restoreCollection(name: String, version: Long): Unit
    /** Reclaim files unreferenced by retained versions; returns the
      * reclaimed path count. None = the store's defaults (version
      * depth / in-flight age grace).
      */
    def vacuumStore(keepVersions: Option[Int], minAgeMs: Option[Long]): Int
    /** The commit log as (version, action, target, n_files). */
    def historyFrame: DataFrame
  }

  def apply(spark: SparkSession, sfDir: String): LiteSql =
    apply(spark, sfDir, graft.core.Collation.Binary)

  // the full-catalog table map costs 10 parquet footer reads; memoize it
  // per (session, dir) so repeated LiteSql construction (one per query in
  // the bench/verify drivers) pays it once. DataFrames are immutable
  // plans — DML inside one LiteSql instance rebinds its own views, never
  // these cached frames.
  // NOTE: entries live for the process; a rewritten data directory (e.g. a
  // regenerated test dir) serves stale file listings until invalidated.
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), Map[String, org.apache.spark.sql.DataFrame]]

  /** Drop cached table maps — all of them, or one data directory's. Call
    * after rewriting a directory in place or stopping a session.
    */
  def invalidateCache(dir: Option[String] = None): Unit = dir match {
    case None => tableCache.clear()
    case Some(d) => tableCache.keySet.removeIf(_._2 == d)
  }

  def apply(spark: SparkSession, sfDir: String,
      collation: graft.core.Collation): LiteSql = {
    val tables = tableCache.computeIfAbsent((spark, sfDir), { case (s, dir) =>
      Tables.names.map(n => n -> Tables.load(s, dir, n)).toMap
    })
    new LiteSql(spark, tables, GraftQueryEngine.foreignKeys, collation)
  }
}
