package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.catalog.DynamicDocs

/** Dynamic-document semantics (TableCollection.Find over raw BsonDocument
  * collections): pinned fields are typed columns, undeclared fields ride
  * the JSON overflow and stay findable/promotable.
  */
class DynamicDocsSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val pinned = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private lazy val docs = DynamicDocs.fromJson(spark, Seq(
    """{"id": 1, "name": "ann", "age": 30, "city": "berlin"}""",
    """{"id": 2, "name": "bob", "age": 41}""",
    """{"id": 3, "name": "cal"}"""), pinned)

  test("pinned fields are typed columns; the remainder rides _overflow") {
    assert(docs.schema.fieldNames.toSeq == Seq("id", "name", "_overflow"))
    assert(docs.schema("id").dataType == LongType)
    val over = docs.orderBy("id").select("_overflow").as[String].collect().toSeq
    assert(over(0).contains("\"city\":\"berlin\"") && over(0).contains("\"age\":30"))
    assert(!over(1).contains("city"))
  }

  test("find works on pinned and overflow fields alike") {
    assert(DynamicDocs.find(docs, "name", "bob")
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(DynamicDocs.find(docs, "city", "berlin")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(DynamicDocs.find(docs, "age", 41)
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(DynamicDocs.find(docs, "nosuch", "x").count() == 0)
  }

  test("find comparison modes (Base/Comparison.cs): StartsWith/EndsWith/" +
      "Contains on pinned and overflow fields") {
    import DynamicDocs.Comparison._
    assert(DynamicDocs.find(docs, "name", "b", StartsWith)
      .select("id").as[Long].collect().toSeq == Seq(2L)) // bob
    assert(DynamicDocs.find(docs, "name", "nn", EndsWith)
      .select("id").as[Long].collect().toSeq == Seq(1L)) // ann
    assert(DynamicDocs.find(docs, "name", "o", Contains)
      .select("id").as[Long].collect().toSeq == Seq(2L)) // bob
    // overflow field (city rides _overflow)
    assert(DynamicDocs.find(docs, "city", "ber", StartsWith)
      .select("id").as[Long].collect().toSeq == Seq(1L)) // berlin
    assert(DynamicDocs.find(docs, "city", "lin", EndsWith)
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(DynamicDocs.find(docs, "city", "zzz", Contains).count() == 0)
  }

  test("find routes the engine collation: IgnoreCase matches across case " +
      "on pinned and overflow fields; Binary stays case-sensitive") {
    import DynamicDocs.Comparison._
    import graft.core.Collation
    // Binary (default): no cross-case hits
    assert(DynamicDocs.find(docs, "name", "BOB").count() == 0)
    assert(DynamicDocs.find(docs, "name", "B", StartsWith).count() == 0)
    // IgnoreCase (the reference's default collation)
    assert(DynamicDocs.find(docs, "name", "BOB", Equals, Collation.IgnoreCase)
      .select("id").as[Long].collect().toSeq == Seq(2L))
    assert(DynamicDocs.find(docs, "name", "B", StartsWith,
      Collation.IgnoreCase).select("id").as[Long].collect().toSeq == Seq(2L))
    assert(DynamicDocs.find(docs, "city", "BER", StartsWith,
      Collation.IgnoreCase).select("id").as[Long].collect().toSeq == Seq(1L))
    assert(DynamicDocs.find(docs, "city", "BERLIN", Equals,
      Collation.IgnoreCase).select("id").as[Long].collect().toSeq == Seq(1L))
    // typed (non-string) equality is collation-independent
    assert(DynamicDocs.find(docs, "id", 2L, Equals, Collation.IgnoreCase)
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("promote lifts an overflow field into a typed column") {
    val promoted = DynamicDocs.promote(docs, "age", IntegerType)
    assert(promoted.schema("age").dataType == IntegerType)
    val ages = promoted.orderBy("id").select("age")
      .collect().map(r => Option(r.get(0))).toSeq
    assert(ages == Seq(Some(30), Some(41), None))
    // promoting an already-pinned field is a no-op
    assert(DynamicDocs.promote(docs, "name", StringType).schema.size == 3)
  }
}
