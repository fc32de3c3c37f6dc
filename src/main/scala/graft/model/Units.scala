package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unit conversion (SURVEY §1.4, `Iot.Database/IotValueUnits/Units.cs`,
  * `IotUnit.cs:27-61`): the reference compiles per-unit string formulas of
  * the form `value * k + b`. Here conversions are rows in a broadcast
  * lookup `(from_unit, to_unit, factor, offset)` and `convert` is the
  * single expression `value * factor + offset` — join stays broadcast at
  * any fact-table scale.
  *
  * The full 869-unit registry is data, not code; this ships the common
  * groups and an extension point (`withRules`).
  */
object Units {

  final case class Rule(from: String, to: String, factor: Double, offset: Double)

  /** The reference's full registry (435 distinct units, 1219 affine
    * conversions), generated into `UnitsData` by `tools/gen_units.py` with
    * exact-rational coefficient extraction, plus an identity rule per
    * unit. The 13 reciprocal temperature-rate formulas in the reference
    * (e.g. minutes_per_degree_kelvin <- degrees_celsius_per_hour) are
    * non-affine reference artifacts and are excluded.
    */
  val defaultRules: Seq[Rule] = {
    val generated = UnitsData.conversions.map(r =>
      Rule(r.from, r.to, r.factor, r.offset))
    val identity = UnitsData.units.map(u => Rule(u.name, u.name, 1.0, 0.0))
    generated ++ identity
  }

  /** Unit metadata lookup (group, display symbol) per the reference. */
  val unitInfo: Map[String, (String, String)] =
    UnitsData.units.map(u => u.name -> ((u.group, u.symbol))).toMap

  def rulesDf(spark: SparkSession, rules: Seq[Rule] = defaultRules): DataFrame = {
    import spark.implicits._
    rules.toDF("from_unit", "to_unit", "factor", "offset")
  }

  /** Convert `df.valueCol` from `fromUnitCol`'s unit to `toUnit` via a
    * broadcast join against the rules table. Rows with no rule get null.
    */
  def convert(spark: SparkSession, df: DataFrame, valueCol: String,
      fromUnitCol: String, toUnit: String,
      outCol: String, rules: Seq[Rule] = defaultRules): DataFrame = {
    val r = rulesDf(spark, rules).filter(col("to_unit") === toUnit)
    df.join(broadcast(r), df(fromUnitCol) === r("from_unit"), "left")
      .withColumn(outCol, col(valueCol) * col("factor") + col("offset"))
      .drop("from_unit", "to_unit", "factor", "offset")
  }

  /** Pure-expression conversion when both units are compile-time known. */
  def convertLit(value: Column, from: String, to: String): Column = {
    defaultRules.find(r => r.from == from && r.to == to) match {
      case Some(r) => value * r.factor + r.offset
      case None => lit(null).cast("double")
    }
  }
}
