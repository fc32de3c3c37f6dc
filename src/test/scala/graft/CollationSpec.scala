package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Collation
import graft.query.NaturalQuery

/** Golden behavior of the engine collation flag vs the reference's default
  * case-insensitive `Collation` (`LiteDB/Utils/Collation.cs`): equality,
  * ordering, and grouping on mixed-case strings. The engine default stays
  * UTF8-binary — IgnoreCase is strictly opt-in.
  */
class CollationSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def people = Seq(
    (1L, "Alice"), (2L, "ALICE"), (3L, "alice"), (4L, "Bob"), (5L, "bob"))
    .toDF("id", "name")

  private def engine(c: Collation) =
    new NaturalQuery(spark, Map("people" -> people),
      Map.empty[(String, String), (String, String)], c)

  test("equality: IgnoreCase matches all case variants; Binary stays exact") {
    // reference behavior: 'alice' == 'ALICE' under the default collation
    val ci = engine(Collation.IgnoreCase)
      .run("FIND people WHERE name = 'Alice' SELECT id")
    assert(ci.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val bin = engine(Collation.Binary)
      .run("FIND people WHERE name = 'Alice' SELECT id")
    assert(bin.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("string predicates: contains/startswith honor the collation") {
    val ci = engine(Collation.IgnoreCase)
      .run("FIND people WHERE name startswith 'AL' SELECT id")
    assert(ci.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val bin = engine(Collation.Binary)
      .run("FIND people WHERE name startswith 'AL' SELECT id")
    assert(bin.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("numeric comparisons are untouched by collation") {
    val ci = engine(Collation.IgnoreCase).run("FIND people WHERE id >= 4 SELECT id")
    assert(ci.collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
  }

  test("ordering: IgnoreCase sorts case variants together") {
    // binary order puts ALL uppercase first ('B' < 'a'); the reference's
    // collation interleaves case variants
    val ci = engine(Collation.IgnoreCase)
      .run("FIND people SELECT id, name ORDER BY name")
      .collect().map(_.getString(1)).toSeq
    assert(ci.take(3).forall(_.equalsIgnoreCase("alice")))
    assert(ci.drop(3).forall(_.equalsIgnoreCase("bob")))
    val bin = engine(Collation.Binary)
      .run("FIND people SELECT id, name ORDER BY name")
      .collect().map(_.getString(1)).toSeq
    assert(bin.head == "ALICE") // uppercase sorts before any lowercase
  }

  test("grouping: Collation.key merges case variants (lowering, no UDF)") {
    val g = people
      .groupBy(Collation.IgnoreCase.key(col("name")).as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g == Map("alice" -> 3L, "bob" -> 2L))
    val plan = people
      .groupBy(Collation.IgnoreCase.key(col("name")))
      .agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("lower("), plan) // expression lowering, not a UDF
  }
}
