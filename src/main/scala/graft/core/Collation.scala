package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lower}
import org.apache.spark.sql.types.StringType

/** String comparison semantics (SURVEY §2.7). The reference compares all
  * strings through a configurable collation that is case-INSENSITIVE by
  * default (`LiteDB/Utils/Collation.cs`, `Collation.Default` =
  * CurrentCulture/IgnoreCase); this engine pins UTF8-binary by default —
  * the Spark-native, codegen-friendly choice — and offers IgnoreCase as an
  * opt-in engine flag for reference-matching behavior.
  *
  * Implemented by expression LOWERING, never UDFs: string operands are
  * wrapped in `lower()` at plan-construction time, so predicates stay
  * codegen'd Catalyst expressions, scan pushdown still applies to the
  * surrounding plan, and no stored data is rewritten. Equality, ordering,
  * and grouping all route through `key`.
  */
sealed trait Collation {
  /** Normalization applied to a string-typed column before equality,
    * ordering, or grouping (identity for Binary).
    */
  def key(c: Column): Column

  /** Same normalization for a driver-side string constant. */
  def key(s: String): String

  /** Table-level collation: retag every top-level StringType column so ALL
    * downstream comparisons — WHERE, GROUP BY, ORDER BY, JOIN keys, LIKE —
    * follow this collation, with original values preserved in outputs.
    * This is how the reference collates (engine-wide via
    * `BsonValue.CompareTo`, not per-predicate), realized through Spark's
    * native collated string types (`UTF8_LCASE`): comparisons stay
    * codegen'd Catalyst expressions and no data is rewritten — the
    * collation is type metadata the optimizer understands.
    */
  def collate(df: DataFrame): DataFrame
}

object Collation {

  /** UTF8-binary (the engine default): byte-wise comparisons. */
  case object Binary extends Collation {
    def key(c: Column): Column = c
    def key(s: String): String = s
    def collate(df: DataFrame): DataFrame = df
  }

  /** The reference's default: ordinal ignore-case comparisons. */
  case object IgnoreCase extends Collation {
    def key(c: Column): Column = lower(c)
    def key(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
    def collate(df: DataFrame): DataFrame = {
      val hasString = df.schema.fields.exists(_.dataType == StringType)
      if (!hasString) df
      else df.select(df.schema.fields.toIndexedSeq.map { f =>
        if (f.dataType == StringType)
          org.apache.spark.sql.functions.collate(col(f.name), "UTF8_LCASE")
            .as(f.name)
        else col(f.name)
      }: _*)
    }
  }
}
