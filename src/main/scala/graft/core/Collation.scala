package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lower

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
}

object Collation {

  /** UTF8-binary (the engine default): byte-wise comparisons. */
  case object Binary extends Collation {
    def key(c: Column): Column = c
    def key(s: String): String = s
  }

  /** The reference's default: ordinal ignore-case comparisons. */
  case object IgnoreCase extends Collation {
    def key(c: Column): Column = lower(c)
    def key(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
  }
}
