package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed fluent query builder mirroring the reference's `LiteQueryable`
  * chain (`LiteDB/Client/Database/LiteQueryable.cs:38-232`, SURVEY §3.2):
  * Include/Where/OrderBy/Select/Offset/Limit accumulate an IR; terminal
  * ops (toDf/first/count/exists/into) execute it. Lowering is plain
  * DataFrame ops, so Catalyst optimizes the accumulated query as one plan.
  */
final class FluentQuery private[catalog] (
    base: DataFrame,
    wheres: Seq[Column] = Nil,
    includes: Seq[(DataFrame, String, String, String)] = Nil, // (child, baseKey, childKey, asName)
    orderBys: Seq[Column] = Nil,
    selects: Seq[Column] = Nil,
    offsetN: Int = 0,
    limitN: Option[Int] = None,
    // retags child frames to the base's engine collation: joining a
    // collated string key against a plain one is an analysis error in
    // Spark 4 (INDETERMINATE_COLLATION)
    collate: DataFrame => DataFrame = identity) {

  private def copy(
      wheres: Seq[Column] = wheres,
      includes: Seq[(DataFrame, String, String, String)] = includes,
      orderBys: Seq[Column] = orderBys, selects: Seq[Column] = selects,
      offsetN: Int = offsetN, limitN: Option[Int] = limitN) =
    new FluentQuery(base, wheres, includes, orderBys, selects, offsetN,
      limitN, collate)

  /** AND-accumulating predicate (LiteQueryable.Where). */
  def where(cond: Column): FluentQuery = copy(wheres = wheres :+ cond)

  /** FK hydration: left-join `child` rows on base.baseKey = child.childKey,
    * nested as an array column `asName` (the INCLUDE of §2.3). Keys are
    * resolved by name against the accumulated plan, so the same table can
    * be re-read or pre-filtered safely.
    */
  def include(child: DataFrame, baseKey: String, childKey: String,
      asName: String): FluentQuery =
    copy(includes = includes :+ ((child, baseKey, childKey, asName)))

  def orderBy(cols: Column*): FluentQuery = copy(orderBys = orderBys ++ cols)

  def select(cols: Column*): FluentQuery = copy(selects = selects ++ cols)

  def offset(n: Int): FluentQuery = copy(offsetN = n)

  def limit(n: Int): FluentQuery = copy(limitN = Some(n))

  /** Lower the accumulated IR to a DataFrame. */
  def toDf: DataFrame = {
    var df = base
    wheres.foreach(w => df = df.filter(w))
    includes.foreach { case (childRaw, baseKey, childKey, asName) =>
      val child = collate(childRaw)
      // aggregate the child side first, then left-join the per-key arrays:
      // a parent with no children gets an empty array (not a single
      // all-null struct), and the shuffle is on the child table only —
      // the base row set never needs to be grouped or unique
      val childArrayType = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(child.schema.fields))
      val childAgg = child.groupBy(col(childKey).as("__graft_ck"))
        .agg(collect_list(struct(child.columns.toIndexedSeq.map(child(_)): _*)).as(asName))
      df = df.join(childAgg, df(baseKey) === childAgg("__graft_ck"), "left")
        .drop("__graft_ck")
        .withColumn(asName, coalesce(col(asName), array().cast(childArrayType)))
    }
    if (orderBys.nonEmpty) df = df.orderBy(orderBys: _*)
    if (selects.nonEmpty) df = df.select(selects: _*)
    if (offsetN > 0) df = df.offset(offsetN)
    limitN.foreach(n => df = df.limit(n))
    df
  }

  // terminal ops (LiteQueryable.cs:244-412)
  def count(): Long = toDf.count()
  def exists(): Boolean = !toDf.isEmpty
  def first(): org.apache.spark.sql.Row = toDf.head()
  def firstOption(): Option[org.apache.spark.sql.Row] = toDf.take(1).headOption
  /** SELECT INTO (QueryExecutor.ExecuteQueryInto). */
  def into(path: String): Unit = toDf.write.mode("overwrite").parquet(path)
}
