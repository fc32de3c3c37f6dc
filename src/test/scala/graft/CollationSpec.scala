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

  test("quoted literal against a numeric column keeps the numeric " +
      "comparison under IgnoreCase (no lower(id) lexicographic)") {
    // degenerate input: a QUOTED value against a numeric column — the
    // collation must not rewrite the column to lower(id) (which would
    // compare lexicographically: '5' < '10' is false as strings)
    val ci = engine(Collation.IgnoreCase)
      .run("FIND people WHERE id < '10' SELECT id")
    assert(ci.count() == 5) // numeric comparison: every id 1..5 < 10
    val plan = engine(Collation.IgnoreCase)
      .run("FIND people WHERE id < '10' SELECT id")
      .queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("lower("), plan)
  }

  test("LiteSql: engine collation applies to every comparison in the " +
      "dialect (WHERE, GROUP BY, ORDER BY)") {
    val mk = (c: Collation) => new graft.query.LiteSql(
      spark, Map("people" -> people),
      Map.empty[(String, String), (String, String)], c)
    // WHERE equality
    val ci = mk(Collation.IgnoreCase)
    assert(ci.run("SELECT id FROM people WHERE name = 'alice'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    // GROUP BY merges case variants (representative value is one of them)
    val g = ci.run(
      "SELECT name, COUNT(*) AS n FROM people GROUP BY name")
      .collect().map(r => r.getString(0).toLowerCase -> r.getLong(1)).toMap
    assert(g == Map("alice" -> 3L, "bob" -> 2L))
    // ORDER BY interleaves case variants
    val ord = ci.run("SELECT name FROM people ORDER BY name, id")
      .collect().map(_.getString(0)).toSeq
    assert(ord.take(3).forall(_.equalsIgnoreCase("alice")), ord)
    // binary default unchanged
    val bin = mk(Collation.Binary)
    assert(bin.run("SELECT id FROM people WHERE name = 'alice'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("LiteSql instances with different collations stay isolated on one " +
      "session (views re-asserted per command)") {
    val mk = (c: Collation) => new graft.query.LiteSql(
      spark, Map("people" -> people),
      Map.empty[(String, String), (String, String)], c)
    val ci = mk(Collation.IgnoreCase)
    val bin = mk(Collation.Binary) // constructed LAST — re-registered views
    // the earlier instance must still see ITS collation, not bin's
    assert(ci.run("SELECT id FROM people WHERE name = 'alice'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(bin.run("SELECT id FROM people WHERE name = 'alice'")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // and again after the other instance ran
    assert(ci.run("SELECT id FROM people WHERE name = 'alice'")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("FluentQuery via GraftDatabase: database collation applies to " +
      "chained predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_coll").toString
    val db = graft.catalog.GraftDatabase(spark, "colldb", dir,
      Collation.IgnoreCase)
    db.insert("people", people)
    val ids = db.query("people").where(col("name") === "ALICE")
      .select(col("id")).toDf.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
    // binary default unchanged
    val dbBin = graft.catalog.GraftDatabase(spark, "colldb_bin", dir)
    dbBin.insert("people", people)
    val idsBin = dbBin.query("people").where(col("name") === "ALICE")
      .select(col("id")).toDf.collect().map(_.getLong(0)).toSeq
    assert(idsBin == Seq(2L))
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
