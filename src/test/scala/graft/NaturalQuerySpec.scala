package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.{GraftQueryEngine, NaturalQuery}

class NaturalQuerySpec extends AnyFunSuite {
  import SparkSessionFixture._

  private lazy val engine = GraftQueryEngine(spark, Sf0001)

  test("parser: full grammar round-trips") {
    val p = NaturalQuery.parse(
      "FIND Customer WHERE Age > 25 AND Name contains 'an' " +
        "SELECT Name as Person, Age " +
        "INCLUDE Order WHERE Amount > 150 SELECT Amount " +
        "INNERJOIN as My Table SELECT Person, Amount " +
        "ORDER BY Name DESC LIMIT 10")
    assert(p.find == Seq("customer"))
    assert(p.where.map(c => (c.field, c.op, c.value)) == Seq(
      ("Age", ">", Some("25")), ("Name", "contains", Some("'an'"))))
    assert(p.select == Seq(NaturalQuery.Sel("Name", Some("Person")),
      NaturalQuery.Sel("Age", None)))
    assert(p.includes.size == 1)
    assert(p.includes.head.table == "order")
    assert(p.innerJoin.exists(_.alias.contains("My Table")))
    assert(p.orderBy.contains(("Name", false)))
    assert(p.limit.contains(10))
  }

  test("parser: dual ON form") {
    val p = NaturalQuery.parse(
      "FIND t1, t2 ON t1.x = t2.y WHERE t1.a >= 5 SELECT t1.a, t2.b")
    assert(p.find == Seq("t1", "t2"))
    assert(p.joins == Seq(NaturalQuery.JoinOn("t1.x", "t2.y")))
  }

  test("parser: phrase predicates") {
    val p = NaturalQuery.parse(
      "FIND t WHERE a is null AND b is not null AND c is empty " +
        "AND d not contains 'x'")
    assert(p.where.map(_.op) ==
      Seq("is null", "is not null", "is empty", "not contains"))
  }

  test("single-table query matches direct DataFrame result") {
    val got = engine.run(
      "FIND customer WHERE c_acctbal > 5000 SELECT c_custkey, c_name as person")
    val want = graft.core.Tables.load(spark, Sf0001, "customer")
      .filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name").as("person"))
    assert(got.columns.toSeq == Seq("c_custkey", "person"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("OR conjunction is not an implicit AND") {
    val n = engine.run(
      "FIND customer WHERE c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY'")
      .count()
    val building = engine.run("FIND customer WHERE c_mktsegment = 'BUILDING'").count()
    assert(n > building)
  }

  test("INCLUDE nests children as <table>_Data with WHERE applied") {
    val df = engine.run(
      "FIND customer WHERE c_acctbal > 9500 " +
        "SELECT c_custkey INCLUDE orders WHERE o_totalprice > 300000")
    assert(df.columns.toSeq == Seq("c_custkey", "orders_Data"))
    // every nested order must satisfy the child predicate
    val bad = df.select(explode(col("orders_Data")).as("o"))
      .filter(col("o.o_totalprice") <= 300000)
    assert(bad.count() == 0)
  }

  test("INNERJOIN flattens without the reference's 2-child cap") {
    val df = engine.run(
      "FIND customer SELECT c_custkey, c_name as person " +
        "INCLUDE orders SELECT o_totalprice as amount " +
        "INNERJOIN as t SELECT person, amount")
    assert(df.columns.toSeq == Seq("person", "amount"))
    // some customer at sf0.001 has >2 orders; all must survive the flatten
    val maxPerCustomer = df.groupBy("person").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerCustomer > 2, s"flatten capped children at $maxPerCustomer")
  }

  test("unknown table and bad conditions raise informative errors") {
    intercept[IllegalArgumentException](engine.run("FIND nosuch"))
    intercept[IllegalArgumentException](
      engine.run("FIND customer WHERE ???"))
    intercept[IllegalArgumentException](
      NaturalQuery.parse("customer WHERE x = 1"))
  }

  test("parser: quoted literals hide keywords and operators") {
    // top-level keywords inside a quoted value must not open a segment
    val p = NaturalQuery.parse(
      "FIND customer WHERE c_comment = 'no limit order by here' LIMIT 5")
    assert(p.where.map(c => (c.field, c.op, c.value)) ==
      Seq(("c_comment", "=", Some("'no limit order by here'"))))
    assert(p.limit.contains(5))
    assert(p.orderBy.isEmpty && p.includes.isEmpty)

    // INCLUDE inside quotes stays a value
    val p2 = NaturalQuery.parse("FIND t WHERE note = 'please include tax'")
    assert(p2.includes.isEmpty)
    assert(p2.where.head.value.contains("'please include tax'"))

    // symbolic and word operators inside quoted values are not operators
    val p3 = NaturalQuery.parse("FIND t WHERE name = 'a != b'")
    assert(p3.where.map(c => (c.field, c.op, c.value)) ==
      Seq(("name", "=", Some("'a != b'"))))
    val p4 = NaturalQuery.parse("FIND t WHERE name = 'x contains y'")
    assert(p4.where.map(c => (c.field, c.op, c.value)) ==
      Seq(("name", "=", Some("'x contains y'"))))
  }

  test("JsonQuery: IR round-trips through the NL lowering; schema exports") {
    import graft.query.JsonQuery
    val json = """{"table": "customer",
      "where": [{"field": "c_acctbal", "op": ">", "value": "5000"}],
      "select": [{"name": "c_custkey"}, {"name": "c_name", "alias": "person"}],
      "include": {"table": "orders",
        "where": [{"field": "o_totalprice", "op": ">", "value": "100000"}]},
      "orderBy": {"field": "c_custkey", "desc": false},
      "limit": 5}"""
    val ir = JsonQuery.parse(json)
    assert(JsonQuery.toNaturalQuery(ir) ==
      "FIND customer WHERE c_acctbal > 5000 SELECT c_custkey, c_name as person " +
        "INCLUDE orders WHERE o_totalprice > 100000 ORDER BY c_custkey LIMIT 5")
    val df = JsonQuery.run(engine, json)
    assert(df.count() == 5)
    assert(df.columns.contains("person") && df.columns.contains("orders_Data"))
    // schema export is Spark's canonical JSON schema
    val schema = JsonQuery.schemaJson(df)
    assert(schema.contains("\"person\"") && schema.contains("struct"))
    // malformed IR is rejected, not mis-executed
    intercept[IllegalArgumentException](JsonQuery.parse("""{"where": []}"""))
  }

  test("JsonQuery: multi-join + grouped-aggregate IR matches direct SQL") {
    import graft.query.JsonQuery
    val got = JsonQuery.run(engine,
      """{"tables": ["customer", "orders"],
          "on": [{"left": "customer.c_custkey", "right": "orders.o_custkey"}],
          "where": [{"field": "orders.o_totalprice", "op": ">", "value": "100000"}],
          "groupBy": ["customer.c_mktsegment"],
          "agg": [{"fn": "count", "alias": "n"},
                  {"fn": "max", "field": "orders.o_totalprice", "alias": "top"}],
          "orderBy": {"field": "c_mktsegment", "desc": false}}""")
    val c = graft.core.Tables.load(spark, Sf0001, "customer")
    val o = graft.core.Tables.load(spark, Sf0001, "orders")
    val want = c.join(o, c("c_custkey") === o("o_custkey"))
      .filter(col("o_totalprice") > 100000)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), max("o_totalprice").as("top"))
      .orderBy("c_mktsegment")
    assert(got.columns.toSeq == Seq("c_mktsegment", "n", "top"))
    assert(got.collect().toSeq == want.collect().toSeq)
    // unknown agg functions are rejected (whitelist, never query text)
    intercept[IllegalArgumentException](JsonQuery.run(engine,
      """{"table": "customer", "groupBy": ["c_mktsegment"],
          "agg": [{"fn": "exec", "alias": "x"}]}"""))
  }

  test("JsonQuery: multi-table IR without 'on' is rejected, not silently " +
      "single-table") {
    import graft.query.JsonQuery
    val err = intercept[IllegalArgumentException](JsonQuery.parse(
      """{"tables": ["customer", "orders"]}"""))
    assert(err.getMessage.contains("'on'"))
    intercept[IllegalArgumentException](JsonQuery.parse(
      """{"tables": ["region", "nation", "customer"],
          "on": [{"left": "region.r_regionkey", "right": "nation.n_regionkey"}]}"""))
  }

  test("JsonQuery: anyOf condition groups nest and OR correctly") {
    import graft.query.JsonQuery
    val got = JsonQuery.run(engine,
      """{"table": "customer",
          "where": [
            {"anyOf": [
              {"field": "c_mktsegment", "op": "=", "value": "'BUILDING'"},
              {"field": "c_mktsegment", "op": "=", "value": "'MACHINERY'"}]},
            {"field": "c_acctbal", "op": ">", "value": "5000", "conj": "AND"}],
          "select": [{"name": "c_custkey"}]}""")
    val want = graft.core.Tables.load(spark, Sf0001, "customer")
      .filter((col("c_mktsegment") === "BUILDING" ||
        col("c_mktsegment") === "MACHINERY") && col("c_acctbal") > 5000)
    assert(got.count() == want.count() && got.count() > 0)
    // the parenthesization matters: flat OR-last would change the count
    val flatOrLast = graft.core.Tables.load(spark, Sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING" ||
        (col("c_mktsegment") === "MACHINERY" && col("c_acctbal") > 5000))
    assert(got.count() != flatOrLast.count())
    // debug rendering parenthesizes the group
    val ir = JsonQuery.parse(
      """{"table": "t", "where": [{"anyOf": [
          {"field": "a", "op": "=", "value": "1"},
          {"field": "b", "op": "=", "value": "2"}]}]}""")
    assert(JsonQuery.toNaturalQuery(ir) == "FIND t WHERE (a = 1 OR b = 2)")
  }

  test("JsonQuery: HAVING filters aggregated groups; computed selects " +
      "lower an expression AST") {
    import graft.query.JsonQuery
    val got = JsonQuery.run(engine,
      """{"table": "orders",
          "groupBy": ["o_orderstatus"],
          "agg": [{"fn": "count", "alias": "n"}],
          "having": [{"field": "n", "op": ">", "value": "100"}],
          "select": [{"expr": {"fn": "concat",
            "args": [{"lit": "s:"}, {"col": "o_orderstatus"}]}, "alias": "tag"}]}""")
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n") > 100))
    assert(rows.forall(r => r.getAs[String]("tag") ==
      "s:" + r.getAs[String]("o_orderstatus")))
    // having without aggregates is malformed
    intercept[IllegalArgumentException](JsonQuery.parse(
      """{"table": "orders", "having": [{"field": "n", "op": ">", "value": "1"}]}"""))
    // unknown expression functions are rejected (whitelist, never text)
    intercept[IllegalArgumentException](JsonQuery.run(engine,
      """{"table": "customer",
          "select": [{"expr": {"fn": "system", "args": []}, "alias": "x"}]}"""))
  }

  test("JsonQuery: mixed plain/computed selects keep declared column order") {
    import graft.query.JsonQuery
    val got = JsonQuery.run(engine,
      """{"table": "customer",
          "select": [
            {"expr": {"fn": "upper", "args": [{"col": "c_name"}]}, "alias": "u"},
            {"name": "c_custkey"},
            {"expr": {"fn": "concat",
              "args": [{"lit": "k"}, {"col": "c_custkey"}]}, "alias": "tag"}],
          "limit": 1}""")
    // a positional consumer of the IR must see (u, c_custkey, tag)
    assert(got.columns.toSeq == Seq("u", "c_custkey", "tag"))
  }

  test("parser: parenthesized WHERE groups nest and bind correctly") {
    val p = NaturalQuery.parse(
      "FIND t WHERE (a = 1 OR b = 2) AND (c = 3 OR (d = 4 AND e = 5))")
    assert(p.where.size == 2)
    val g1 = p.where(0)
    assert(g1.group.map(c => (c.field, c.conj)) == Seq(("a", "AND"), ("b", "OR")))
    val g2 = p.where(1)
    assert(g2.conj == "AND")
    assert(g2.group.head.field == "c")
    // nested group inside the second group
    assert(g2.group(1).conj == "OR" && g2.group(1).group.map(_.field) == Seq("d", "e"))
  }

  test("parenthesized groups change semantics vs the flat split") {
    // flat: a OR b AND c == ((a OR b) AND c) under left-fold = 0 rows for
    // a contradictory (b AND c); the group form a OR (b AND c) keeps all
    // of a — deterministic discriminator on any data with BUILDING rows
    val flat = engine.run(
      "FIND customer WHERE c_mktsegment = 'BUILDING' OR c_custkey > 0 " +
        "AND c_custkey < 0").count()
    val grouped = engine.run(
      "FIND customer WHERE c_mktsegment = 'BUILDING' OR " +
        "(c_custkey > 0 AND c_custkey < 0)").count()
    val building = graft.core.Tables.load(spark, Sf0001, "customer")
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(building > 0)
    assert(flat == 0L)
    assert(grouped == building)
  }

  test("parens inside quoted literals are not group delimiters") {
    val p = NaturalQuery.parse("FIND t WHERE a = '(not a group' AND b = 'x)'")
    assert(p.where.map(_.field) == Seq("a", "b"))
    intercept[IllegalArgumentException](
      NaturalQuery.parse("FIND t WHERE (a = 1 OR b = 2"))
    // close-before-open nets to zero depth — must still be rejected, not
    // silently parsed as one mangled leaf condition
    intercept[IllegalArgumentException](
      NaturalQuery.parse("FIND t WHERE a = 1) AND (b = 2"))
  }
}
