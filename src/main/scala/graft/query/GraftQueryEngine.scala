package graft.query

import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** NaturalQuery engine wired to the driver's test schema: FK edges follow
  * the TPC-H-ish star (the reference infers FKs from `<Parent>Id` naming,
  * `Queries/QueryEngine3.cs:271-306`; here the registry is explicit).
  */
object GraftQueryEngine {

  val foreignKeys: Map[(String, String), (String, String)] = Map(
    ("customer", "orders") -> ("c_custkey", "o_custkey"),
    ("orders", "lineitem") -> ("o_orderkey", "l_orderkey"),
    ("nation", "customer") -> ("n_nationkey", "c_nationkey"),
    ("nation", "supplier") -> ("n_nationkey", "s_nationkey"),
    ("region", "nation") -> ("r_regionkey", "n_regionkey"))

  def apply(spark: SparkSession, sfDir: String): NaturalQuery =
    apply(spark, sfDir, graft.core.Collation.Binary)

  /** Engine-level collation flag: pass Collation.IgnoreCase to match the
    * reference's default case-insensitive string comparisons.
    */
  def apply(spark: SparkSession, sfDir: String,
      collation: graft.core.Collation): NaturalQuery =
    // lazy per-table loader: an NL query touches 1-3 tables; loading the
    // whole catalog eagerly costs ~10 parquet footer reads per query
    new NaturalQuery(spark,
      (n: String) => if (Tables.names.contains(n))
        Some(Tables.load(spark, sfDir, n)) else None,
      foreignKeys, collation)
}
