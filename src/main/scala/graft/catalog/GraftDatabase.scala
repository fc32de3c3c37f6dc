package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dml.ConstrainedDml
import graft.dml.ConstrainedDml.TableDef
import graft.ts.TimeSeriesOps

/** Database facade mirroring the reference's `IotDatabase`
  * (`Iot.Database/IotDatabase.cs:25-161`): a named directory tree with
  * `Tables/`, `TimeSeries/`, `Files/` sub-stores; typed table accessors;
  * constraint-checked writes.
  *
  * Storage is parquet directories (one per table, date-partitioned for the
  * time-series store) — the layout that scales to a cluster; swapping in a
  * transactional table format only changes `write`/`read` here.
  */
final class GraftDatabase private (
    val spark: SparkSession, val name: String, val root: String,
    val collation: graft.core.Collation) {

  private val tablesDir = s"$root/Tables"
  private val tsDir = s"$root/TimeSeries"
  private val filesDir = s"$root/Files"
  Seq(tablesDir, tsDir, filesDir)
    .foreach(d => Files.createDirectories(Paths.get(d)))

  private var defs: Map[String, TableDef] = Map.empty

  /** Declare a table with its constraints (the reference declares via
    * attributes on the CLR type; here via TableDef).
    */
  def defineTable(tdef: TableDef): GraftDatabase = {
    defs += tdef.name -> tdef
    this
  }

  def tableDef(name: String): TableDef =
    defs.getOrElse(name, TableDef(name, "id"))

  def tablePath(name: String): String = s"$tablesDir/$name"

  def tableExists(name: String): Boolean =
    Files.exists(Paths.get(tablePath(name), "_SUCCESS")) ||
      (Files.exists(Paths.get(tablePath(name))) &&
        Files.list(Paths.get(tablePath(name))).findFirst().isPresent)

  /** Read a table (empty-schema error if absent, like reference's lazy
    * collection creation — callers insert first).
    */
  def table(name: String): DataFrame = spark.read.parquet(tablePath(name))

  /** Constraint-checked insert (CheckConstraints + insert,
    * TableCollection.cs:922-1070).
    */
  def insert(name: String, rows: DataFrame): Unit = {
    val tdef = tableDef(name)
    val existing = if (tableExists(name)) Some(table(name)) else None
    val parents = tdef.fks.map(fk => fk.parentTable -> table(fk.parentTable)).toMap
    val violations =
      ConstrainedDml.validateInsert(spark, tdef, rows, existing, parents)
    if (violations.nonEmpty)
      throw new IllegalStateException(s"constraint violations: $violations")
    rows.write.mode("append").parquet(tablePath(name))
  }

  /** Upsert by the table's PK (TableCollection.cs:1195-1240). */
  def upsert(name: String, rows: DataFrame): Unit = {
    val tdef = tableDef(name)
    val merged =
      if (tableExists(name)) ConstrainedDml.upsert(table(name), rows, tdef.pk)
      else rows
    writeReplace(name, merged)
  }

  /** Update existing documents by PK (TableCollection.cs:1256-1298):
    * incoming rows replace same-PK rows; rows whose PK is absent are
    * IGNORED (the reference returns false for them — update never
    * inserts; that is `upsert`). Returns the number of rows replaced.
    */
  def update(name: String, rows: DataFrame): Long = {
    val tdef = tableDef(name)
    if (!tableExists(name)) return 0L
    val existing = table(name)
    val matched = rows.join(existing.select(col(tdef.pk)), Seq(tdef.pk),
      "left_semi")
    val n = matched.count()
    if (n > 0)
      writeReplace(name, ConstrainedDml.upsert(existing, matched, tdef.pk))
    n
  }

  /** UpdateMany with column transforms over rows matching `predicate`
    * (TableCollection.cs:1305-1328, `UPDATE ... SET col = expr WHERE ...`):
    * each (column -> expression) applies only where the predicate holds;
    * other rows pass through unchanged.
    */
  def updateMany(name: String, predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Unit =
    writeReplace(name, ConstrainedDml.updateWhere(table(name), predicate, set))

  /** Set one column on ALL documents (TableCollection.cs:1150 SetAll —
    * lowered there as UpdateMany over `_id > 0`).
    */
  def setAll(name: String, columnName: String, value: Any): Unit =
    updateMany(name, lit(true), Map(columnName -> lit(value)))

  /** PK point lookup (TableCollection.cs:739 FindById). */
  def findById(name: String, id: Any): Option[org.apache.spark.sql.Row] =
    table(name).filter(col(tableDef(name).pk) === lit(id)).take(1).headOption

  /** Delete with FK actions (cascade/restrict/set-null walk,
    * TableCollection.cs:316-460), persisting every affected table.
    */
  def delete(name: String, predicate: org.apache.spark.sql.Column): Unit = {
    val states = defs.map { case (n, d) => n -> ((table(n), d)) }
    val updated = ConstrainedDml.deleteCascade(spark, states, name, predicate)
    // two-phase swap: every new state's plan reads the CURRENT directories
    // (possibly of other affected tables), so all temp writes must finish
    // before any directory is replaced
    val tmps = updated.map { case (n, df) =>
      val tmp = Paths.get(tablePath(n) + "_tmp_swap")
      df.write.mode("overwrite").parquet(tmp.toString)
      n -> tmp
    }
    tmps.foreach { case (n, tmp) =>
      val dst = Paths.get(tablePath(n))
      deleteRecursively(dst)
      Files.move(tmp, dst)
    }
  }

  private def writeReplace(name: String, df: DataFrame): Unit = {
    // write-to-temp then swap: the plan reads the directory being replaced,
    // so overwrite-in-place would corrupt it, and collect()-then-rewrite
    // does not scale — the temp write is fully distributed
    val dst = Paths.get(tablePath(name))
    val tmp = Paths.get(tablePath(name) + "_tmp_swap")
    df.write.mode("overwrite").parquet(tmp.toString)
    deleteRecursively(dst)
    Files.move(tmp, dst)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  /** Versioned file store under `Files/` (the reference's
    * `IotDatabase.Files` check-in/check-out surface,
    * `FileManager/FileCollection.cs`).
    */
  lazy val fileStore: graft.sources.FileStore =
    new graft.sources.FileStore(spark, filesDir)

  /** Typed fluent query over a table (the reference's
    * `col.Query().Where(...).OrderBy(...).Select(...)` surface,
    * `LiteQueryable`, SURVEY §3.2). The database collation applies to the
    * base table (Collation.collate retags string columns with Spark's
    * native collated types), so every predicate/order/select Column the
    * caller chains compares under it — the reference's engine-wide
    * collation, without per-predicate rewrites.
    */
  def query(name: String): FluentQuery =
    new FluentQuery(collation.collate(table(name)))

  /** Ingest raw JSON documents as a dynamic table (the reference's raw
    * BsonDocument collections): `pinned` fields become typed columns, the
    * rest rides the `_overflow` JSON column (see DynamicDocs).
    */
  def insertDocuments(name: String, docs: Seq[String],
      pinned: org.apache.spark.sql.types.StructType): Unit = {
    val incoming = DynamicDocs.fromJson(spark, docs, pinned)
    val merged = if (tableExists(name))
      table(name).unionByName(incoming, allowMissingColumns = true)
    else incoming
    writeReplace(name, merged)
  }

  /** Find over a dynamic table: pinned columns filter natively, overflow
    * fields via JSON lookup (TableCollection.Find(columnName, value)).
    */
  def findDocuments(name: String, field: String, value: Any): DataFrame =
    DynamicDocs.find(table(name), field, value)

  // ---- time-series store (TimeSeries/ subtree, SURVEY §2.8) --------------

  /** Append points (point_guid, ts, value[, priority]) to the TS store,
    * date-partitioned.
    */
  def tsAppend(points: DataFrame): Unit =
    points.withColumn("date", to_date(col("ts")))
      .write.mode("append").partitionBy("date").parquet(tsDir)

  /** Range read with LOCF (GetTimeSeries(start, end),
    * TsCollection.cs:130-185). Partition pruning applies via the date
    * column derived from the bounds.
    */
  def tsRange(guid: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp): DataFrame =
    spark.read.parquet(tsDir)
      .filter(col("point_guid") === guid &&
        col("date").between(to_date(lit(start)), to_date(lit(end))) &&
        col("ts").between(lit(start), lit(end)))

  /** Interval read with linear interpolation (GetTimeSeries(start, end,
    * interval), TsCollection.cs:188-233).
    */
  def tsResample(guid: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp, stepSeconds: Long): DataFrame =
    TimeSeriesOps.resampleLinear(
      // collapse exact-timestamp duplicates (ingest-time dedup in the
      // reference, TsCollection.cs:43-103) so neighbor picks are unique
      tsRange(guid, start, end).groupBy("point_guid", "ts")
        .agg(max(col("value")).as("value")),
      "point_guid", "ts", "value", stepSeconds)

  // ---- LiteDB SQL dialect over this database's tables --------------------

  /** Run a LiteDB-dialect SQL statement ($-paths, INCLUDE, GROUP BY
    * @key, INSERT/UPDATE/DELETE/EXPLAIN) against this database's
    * declared tables — the facade twin of `db.Execute(sql)` in the
    * reference. FK declarations from `defineTable` feed INCLUDE's join
    * resolution; the database's collation applies to every comparison.
    */
  def sql(liteSql: String): DataFrame = {
    val loaded = defs.keys.filter(tableExists)
      .map(n => n -> table(n)).toMap
    val fks = defs.values.flatMap(td => td.fks.map(fk =>
      (fk.parentTable, td.name) -> (fk.parentCol, fk.childCol))).toMap
    new graft.query.LiteSql(spark, loaded, fks, collation).run(liteSql)
  }

  // ---- natural-language query over this database's tables ----------------

  /** Run a FIND/WHERE/SELECT/INCLUDE/INNERJOIN natural-language query
    * against this database's tables — the facade twin of `db.Query(...)`
    * in the reference, with INCLUDE joins resolved from `defineTable`
    * FK declarations and the database collation applied.
    */
  def find(nlQuery: String): DataFrame = {
    val fks = defs.values.flatMap(td => td.fks.map(fk =>
      (fk.parentTable, td.name) -> (fk.parentCol, fk.childCol))).toMap
    new graft.query.NaturalQuery(spark,
      (n: String) => if (tableExists(n)) Some(table(n)) else None,
      fks, collation).run(nlQuery)
  }

  // ---- corpus curation (training-data pipeline, COVERAGE §LLM ops) -------

  /** Run the end-to-end curation DAG over a documents table (doc_id,
    * text, lang, n_chars) against an eval set, landing
    * verdicts/curated/manifest under this database's directory. See
    * `pipeline.CurationPipeline` for the stage list and scale shapes.
    */
  def curate(docsTable: String, evalDocs: DataFrame,
      cfg: graft.pipeline.CurationPipeline.Config =
        graft.pipeline.CurationPipeline.Config()): DataFrame =
    graft.pipeline.CurationPipeline.write(
      spark, table(docsTable), evalDocs, s"$root/Curation", cfg)
}

object GraftDatabase {
  /** Open/create a database directory (IotDatabase.cs:149-161 tree). */
  def apply(spark: SparkSession, name: String, baseDir: String): GraftDatabase =
    apply(spark, name, baseDir, graft.core.Collation.Binary)

  /** Open with an explicit engine collation (the reference's constructor
    * takes a Collation; its default is case-insensitive).
    */
  def apply(spark: SparkSession, name: String, baseDir: String,
      collation: graft.core.Collation): GraftDatabase =
    new GraftDatabase(spark, name, s"$baseDir/$name", collation)
}
