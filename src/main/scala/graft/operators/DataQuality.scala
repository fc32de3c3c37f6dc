package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the ingest-side
  * QA gate of a large pipeline (null/range/domain/referential checks
  * before data is admitted to the corpus).
  *
  * Scale shape (100 TB): ALL rules evaluate in ONE pass — a single
  * map + global aggregation whose partial sums combine map-side, so the
  * report costs one scan regardless of rule count. The per-rule unpivot
  * happens on the single result row. A NULL rule verdict counts as a
  * violation (SQL three-valued logic would otherwise let nulls slide
  * through a range check).
  */
object DataQuality {

  /** One report row per rule: (rule, n_rows, n_violations, pass). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation required")
    // coalesce(sum, 0): on an EMPTY frame sum yields null per rule, which
    // would read as neither pass nor fail (and NPE a getBoolean) — an
    // empty increment is zero violations, reported explicitly
    val aggs = rules.map { case (name, pred) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)),
        lit(0L)).as(s"_v_$name")
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*)
    row.select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("rule"), col("_n").as("n_rows"),
          col(s"_v_$name").as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }
}
