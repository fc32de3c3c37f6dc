package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dynamic (schemaless) document tables — the reference's raw
  * `BsonDocument` collections (`Table/TableCollection.cs:666-703`
  * `Find(columnName, value)`, `LiteDB/Document/BsonValue.cs` ordered
  * string→value maps), on Spark's schema-full substrate (SURVEY §1.2 /
  * §7 "What's hard"): a PINNED StructType holds the declared columns and
  * everything else rides in a JSON overflow column, so per-row extra
  * fields survive ingestion and stay queryable.
  *
  * Layout: pinned columns (typed, columnar, pushdown-friendly) +
  * `_overflow` (JSON string of the undeclared remainder; empty object
  * when none). Queries against pinned fields are ordinary Catalyst
  * predicates; overflow fields resolve via `get_json_object` — slower by
  * construction, which is the honest cost of schemaless fields on a
  * columnar engine (promote hot fields into the pinned schema).
  */
object DynamicDocs {

  val OverflowCol = "_overflow"

  /** Ingest raw JSON documents: pinned fields become typed columns,
    * the undeclared remainder lands in `_overflow`.
    */
  def fromJson(spark: SparkSession, docs: Seq[String],
      pinned: StructType): DataFrame = {
    import spark.implicits._
    fromJson(spark, docs.toDS(), pinned)
  }

  /** Distributed ingest form: a Dataset of JSON strings (a stream batch, a
    * raw-text table) — the inference pass and all per-row work run on the
    * executors; nothing collects.
    */
  def fromJson(spark: SparkSession, docs: org.apache.spark.sql.Dataset[String],
      pinned: StructType): DataFrame = {
    val raw = spark.read.json(docs)
    // case-INSENSITIVE pinned matching, agreeing with find/field's
    // equalsIgnoreCase resolution: a doc field "userid" must populate a
    // pinned "userId" column, not land unqueryably in the overflow
    val rawByLower = raw.columns.map(c => c.toLowerCase -> c).toMap
    val typed = pinned.fields.map(f =>
      (rawByLower.get(f.name.toLowerCase) match {
        case Some(rc) => col(rc).cast(f.dataType)
        case None => lit(null).cast(f.dataType)
      }).as(f.name))
    val pinnedLower = pinned.fields.map(_.name.toLowerCase).toSet
    val extraCols = raw.columns
      .filterNot(c => pinnedLower.contains(c.toLowerCase)).sorted
    val overflow =
      if (extraCols.isEmpty) lit("{}")
      else to_json(struct(extraCols.map(col): _*))
    raw.select(typed :+ overflow.as(OverflowCol): _*)
  }

  /** The reference's `Find(columnName, value, comparisonType)` modes
    * (`Base/Comparison.cs`, applied over AsString at
    * `TableCollection.cs:666-700`).
    */
  sealed trait Comparison
  object Comparison {
    case object Equals extends Comparison
    case object StartsWith extends Comparison
    case object EndsWith extends Comparison
    case object Contains extends Comparison
  }

  /** The reference's `Find(columnName, value[, comparisonType])` over a
    * dynamic table: pinned columns filter natively; anything else is
    * looked up in the overflow JSON (string-compared, like BsonValue's
    * loose equality on mixed per-row types). The non-equals modes
    * compare as strings like the reference's AsString dispatch — and
    * under the Binary default stay pushdown-friendly (StartsWith maps
    * to a prefix filter the parquet scan can use).
    *
    * String comparisons route through the engine `collation` like
    * query() does (the reference collates engine-wide; its default is
    * IgnoreCase) — under IgnoreCase both sides are lowered, which
    * trades the prefix pushdown for reference-matching semantics.
    * Typed (non-string) pinned equality ignores collation.
    */
  def find(df: DataFrame, field: String, value: Any,
      comparison: Comparison = Comparison.Equals,
      collation: graft.core.Collation = graft.core.Collation.Binary)
      : DataFrame = {
    def k(c: Column): Column = collation.key(c)
    val litStr = k(lit(value).cast("string"))
    def cmp(c: Column, typedEquals: Boolean): Column = comparison match {
      case Comparison.Equals =>
        if (typedEquals) c === lit(value) else k(c) === litStr
      case Comparison.StartsWith => k(c.cast("string")).startsWith(litStr)
      case Comparison.EndsWith => k(c.cast("string")).endsWith(litStr)
      case Comparison.Contains => k(c.cast("string")).contains(litStr)
    }
    resolve(df, field) match {
      case Left(c) =>
        val stringTyped = df.schema.fields
          .find(_.name.equalsIgnoreCase(field))
          .exists(_.dataType ==
            org.apache.spark.sql.types.StringType)
        if (comparison == Comparison.Equals && stringTyped)
          df.filter(k(c) === litStr)
        else df.filter(cmp(c, typedEquals = true))
      case Right(path) =>
        df.filter(cmp(get_json_object(col(OverflowCol), path),
          typedEquals = false))
    }
  }

  /** Project a field regardless of where it lives (typed column or
    * overflow JSON; overflow values surface as strings).
    */
  def field(df: DataFrame, name: String): Column =
    resolve(df, name) match {
      case Left(c) => c
      case Right(path) => get_json_object(col(OverflowCol), path)
    }

  /** Promote a hot overflow field into a typed column (the schema-
    * evolution path: dynamic first, columnar once it matters).
    */
  def promote(df: DataFrame, name: String,
      dataType: org.apache.spark.sql.types.DataType): DataFrame =
    resolve(df, name) match {
      case Left(_) => df
      case Right(path) =>
        df.withColumn(name,
          get_json_object(col(OverflowCol), path).cast(dataType))
    }

  private def resolve(df: DataFrame, name: String): Either[Column, String] =
    df.columns.find(_.equalsIgnoreCase(name)) match {
      case Some(c) if c != OverflowCol => Left(col(c))
      case _ => Right(s"$$.$name")
    }
}
