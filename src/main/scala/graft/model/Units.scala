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
      Rule("miles_per_hour", "meters_per_second", 0.44704, 0.0),
      // area
      Rule("square_meters", "square_feet", 10.763910416709722, 0.0),
      Rule("hectares", "square_meters", 10000.0, 0.0),
      Rule("acres", "square_meters", 4046.8564224, 0.0),
      // frequency
      Rule("kilohertz", "hertz", 1000.0, 0.0),
      Rule("megahertz", "hertz", 1000000.0, 0.0),
      Rule("per_minute", "hertz", 1.0 / 60.0, 0.0),
      // angle
      Rule("degrees_angular", "radians", math.Pi / 180.0, 0.0),
      Rule("revolutions", "radians", 2.0 * math.Pi, 0.0),
      // energy (more)
      Rule("btus", "joules", 1055.05585262, 0.0),
      Rule("calories", "joules", 4.184, 0.0),
      Rule("watt_hours", "joules", 3600.0, 0.0),
      Rule("megajoules", "joules", 1000000.0, 0.0),
      // power (more)
      Rule("btus_per_hour", "watts", 0.29307107017222222, 0.0),
      Rule("tons_refrigeration", "watts", 3516.8528420667, 0.0),
      Rule("megawatts", "watts", 1000000.0, 0.0),
      // pressure (more)
      Rule("inches_of_water", "pascals", 248.84, 0.0),
      Rule("millimeters_of_mercury", "pascals", 133.322387415, 0.0),
      Rule("hectopascals", "pascals", 100.0, 0.0),
      // volume (more)
      Rule("cubic_feet", "cubic_meters", 0.028316846592, 0.0),
      Rule("milliliters", "liters", 0.001, 0.0),
      // flow
      Rule("cubic_feet_per_minute", "cubic_meters_per_second", 0.028316846592 / 60.0, 0.0),
      Rule("liters_per_second", "cubic_meters_per_second", 0.001, 0.0),
      Rule("gallons_us_per_minute", "liters_per_second", 3.785411784 / 60.0, 0.0),
      // electrical
      Rule("kilovolts", "volts", 1000.0, 0.0),
      Rule("milliamperes", "amperes", 0.001, 0.0),
      Rule("kilohms", "ohms", 1000.0, 0.0),
      Rule("kilovolt_amperes", "volt_amperes", 1000.0, 0.0),
      // data
      Rule("kilobytes", "bytes", 1000.0, 0.0),
      Rule("megabytes", "bytes", 1000000.0, 0.0),
      Rule("kilobits_per_second", "bits_per_second", 1000.0, 0.0),
      // mass flow / density adjacent
      Rule("grams", "kilograms", 0.001, 0.0),
      Rule("kilograms_per_hour", "kilograms_per_second", 1.0 / 3600.0, 0.0),
      // luminous
      Rule("kilolux", "luxes", 1000.0, 0.0),
      // percent / dimensionless
      Rule("percent", "ratio", 0.01, 0.0),
      Rule("parts_per_million", "ratio", 0.000001, 0.0))
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
