package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.dml.ConstrainedDml.TableDef

/** The reference's `IotSimpleDb<T>` (`IotSimpleDb.cs:6-24`): the
  * zero-ceremony facade — open a path, get exactly one collection with
  * the full table surface. Here the single collection is a declared
  * `TableDef` on a `GraftDatabase` rooted under the path, and the
  * wrapper scopes the facade's DML/query surface to it; `db` exposes
  * the full database for anything beyond the one-table shape.
  */
final class GraftSimpleDb private (val db: GraftDatabase,
    val tableName: String) {

  def all: DataFrame = db.table(tableName)
  def count(): Long = db.count(tableName)
  def insert(rows: DataFrame): Unit = db.insert(tableName, rows)
  def upsert(rows: DataFrame): Unit = db.upsert(tableName, rows)
  def update(rows: DataFrame): Long = db.update(tableName, rows)
  def updateMany(predicate: Column, set: Map[String, Column]): Long =
    db.updateMany(tableName, predicate, set)
  def delete(predicate: Column): Unit = db.delete(tableName, predicate)
  def findById(id: Any): Option[org.apache.spark.sql.Row] =
    db.findById(tableName, id)
  def query: FluentQuery = db.query(tableName)
}

object GraftSimpleDb {

  /** Open (or create) the one-collection database under `baseDir` —
    * `IotSimpleDb(path, name, password)`, with the collection named
    * after the entity like the reference's `typeof(T).Name` default.
    */
  def apply(spark: SparkSession, baseDir: String, tdef: TableDef,
      password: Option[String] = None): GraftSimpleDb = {
    val db = GraftDatabase(spark, tdef.name, baseDir,
      graft.core.Collation.Binary, password).defineTable(tdef)
    new GraftSimpleDb(db, tdef.name)
  }
}
