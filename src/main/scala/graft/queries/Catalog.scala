package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle SQL over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *   - Every aggregate over doubles accumulates in DECIMAL (exact) and the
  *     final column is cast to DOUBLE in BOTH engines, so floating-point
  *     summation order can never flip a bit.
  *   - Every computed column is aliased to the same name on both sides
  *     (the driver sorts columns by name before hashing).
  *   - Timestamps in outputs are converted to epoch micros (BIGINT) or DATE
  *     to avoid us-vs-ns physical-type mismatches between engines.
  *   - Top-k queries always carry a unique tiebreak column in the ordering.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Shared DuckDB-oracle SQL fragments. */
object OracleSql {

  /** Decodes the first `digits` hex chars of SQL expression `h` into a
    * BIGINT — the oracle-side twin of `TextFunctions.hash48` (digits=12)
    * / the 24-bit md5 buckets (digits=6). ONE definition so the decode
    * can never drift out of sync with the Scala hash across queries.
    */
  def hexToBigint(h: String, digits: Int): String =
    (1 to digits).map(k =>
      s"(STRPOS('0123456789abcdef', SUBSTR($h, $k, 1)) - 1) * " +
        (1L << (4 * (digits - k)))).mkString(" + ")
}

object Catalog {
  def all: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ TimeSeriesQueries.all ++
      EventQueries.all ++ VectorQueries.all ++ DomainQueries.all ++
      NaturalQueries.all ++ PipelineQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
