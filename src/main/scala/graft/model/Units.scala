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

  /** Core conversion rules (linear `v*factor+offset`, both directions). */
  val defaultRules: Seq[Rule] = {
    val oneWay = Seq(
      // temperature
      Rule("degC", "degF", 1.8, 32.0),
      Rule("degC", "kelvin", 1.0, 273.15),
      // length
      Rule("meters", "feet", 3.280839895013123, 0.0),
      Rule("meters", "inches", 39.37007874015748, 0.0),
      Rule("kilometers", "meters", 1000.0, 0.0),
      Rule("miles", "meters", 1609.344, 0.0),
      // mass
      Rule("kilograms", "pounds", 2.2046226218487757, 0.0),
      Rule("tons", "kilograms", 1000.0, 0.0),
      // pressure
      Rule("pascals", "kilopascals", 0.001, 0.0),
      Rule("bars", "pascals", 100000.0, 0.0),
      Rule("psi", "pascals", 6894.757293168361, 0.0),
      // power / energy
      Rule("kilowatts", "watts", 1000.0, 0.0),
      Rule("horsepower", "watts", 745.6998715822702, 0.0),
      Rule("kilowatt_hours", "joules", 3600000.0, 0.0),
      // time
      Rule("minutes", "seconds", 60.0, 0.0),
      Rule("hours", "seconds", 3600.0, 0.0),
      Rule("days", "hours", 24.0, 0.0),
      // volume / flow
      Rule("liters", "cubic_meters", 0.001, 0.0),
      Rule("gallons_us", "liters", 3.785411784, 0.0),
      // velocity
      Rule("kilometers_per_hour", "meters_per_second", 1.0 / 3.6, 0.0),
      Rule("miles_per_hour", "meters_per_second", 0.44704, 0.0))
    val inverted = oneWay.map(r =>
      Rule(r.to, r.from, 1.0 / r.factor, -r.offset / r.factor))
    val identity = (oneWay.flatMap(r => Seq(r.from, r.to)).distinct)
      .map(u => Rule(u, u, 1.0, 0.0))
    oneWay ++ inverted ++ identity
  }

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
