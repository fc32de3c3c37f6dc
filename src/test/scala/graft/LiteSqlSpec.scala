package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.LiteSql

class LiteSqlSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private lazy val engine = LiteSql(spark, Sf0001)

  test("$-path and bare $ translate") {
    val t = engine.translate(
      "SELECT $.c_name, UPPER($.c_mktsegment) FROM customer WHERE $.c_acctbal > 100")
    assert(t == "SELECT c_name, UPPER(c_mktsegment) FROM customer WHERE c_acctbal > 100")
    assert(engine.translate("SELECT $ FROM region") == "SELECT * FROM region")
  }

  test("$ inside string literals is untouched") {
    val t = engine.translate("SELECT $.c_name FROM customer WHERE c_name = 'a$.b'")
    assert(t.contains("'a$.b'"))
    assert(t.startsWith("SELECT c_name"))
  }

  test("array index paths: 0-based, negative, out-of-bounds null") {
    assert(engine.translate("SELECT $.arr[0] FROM t")
      == "SELECT try_element_at(arr, 1) FROM t")
    assert(engine.translate("SELECT $.a.b[2].c FROM t")
      == "SELECT try_element_at(a.b, 3).c FROM t")
    assert(engine.translate("SELECT $.arr[-1] FROM t")
      == "SELECT try_element_at(arr, -1) FROM t")
    // semantics: ARRAY_INDEX (BsonExpressionOperators.cs:269-296)
    val r = spark.sql(
      engine.translate("SELECT $.v[0] AS a, $.v[-1] AS b, $.v[9] AS c " +
        "FROM (SELECT ARRAY(10, 20, 30) AS v)")).head()
    assert(r.getInt(0) == 10 && r.getInt(1) == 30 && r.isNullAt(2))
  }

  test("array filter paths: @ item expressions and [*] with continuation") {
    assert(engine.translate("SELECT $.items[@.x > 1] FROM t")
      == "SELECT filter(items, _it -> _it.x > 1) FROM t")
    assert(engine.translate("SELECT $.items[@.x > 1].y FROM t")
      == "SELECT transform(filter(items, _it -> _it.x > 1), _e -> _e.y) FROM t")
    assert(engine.translate("SELECT $.nums[@ >= 5] FROM t")
      == "SELECT filter(nums, _it -> _it >= 5) FROM t")
    assert(engine.translate("SELECT $.items[*].y FROM t")
      == "SELECT transform(items, _e -> _e.y) FROM t")
    // a quoted ']' inside the filter is data, not a closing bracket
    assert(engine.translate("SELECT $.tags[@ = 'a]b'] FROM t")
      == "SELECT filter(tags, _it -> _it = 'a]b') FROM t")
    // semantics: ARRAY_FILTER (BsonExpressionOperators.cs:301-329)
    val r = spark.sql(engine.translate(
      "SELECT $.items[@.x > 1].y AS ys, SIZE($.nums[@ >= 5]) AS n FROM " +
        "(SELECT ARRAY(NAMED_STRUCT('x', 1, 'y', 'a'), NAMED_STRUCT('x', 2, 'y', 'b'), " +
        "NAMED_STRUCT('x', 3, 'y', 'c')) AS items, ARRAY(3, 5, 7) AS nums)")).head()
    assert(r.getSeq[String](0) == Seq("b", "c") && r.getInt(1) == 2)
  }

  test("GROUP BY @key resolves to the group expression (GroupByPipe.cs)") {
    val t = engine.translate(
      "SELECT @key AS seg, COUNT(*) AS n FROM customer GROUP BY $.c_mktsegment")
    assert(t ==
      "SELECT (c_mktsegment) AS seg, COUNT(*) AS n FROM customer GROUP BY c_mktsegment")
    val got = engine.run(
      "SELECT @key AS seg, COUNT(*) AS n FROM customer GROUP BY $.c_mktsegment " +
        "ORDER BY seg")
    val want = spark.sql(
      """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
         GROUP BY c_mktsegment ORDER BY seg""")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("INCLUDE lowers to a left join over the FK registry") {
    val t = engine.translate(
      "SELECT $.c_name, $.o_totalprice FROM customer INCLUDE orders WHERE $.o_totalprice > 1000")
    assert(t.contains(
      "FROM customer LEFT JOIN orders ON customer.c_custkey = orders.o_custkey"))
  }

  test("full query executes and matches direct Spark SQL") {
    val got = engine.run(
      "SELECT $.c_mktsegment, COUNT(*) AS n FROM customer " +
        "WHERE $.c_acctbal > 1000 GROUP BY $.c_mktsegment " +
        "ORDER BY n DESC LIMIT 3")
    val want = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
         WHERE c_acctbal > 1000 GROUP BY c_mktsegment
         ORDER BY n DESC LIMIT 3""")
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("INCLUDE query end-to-end: hydrated rows count matches manual join") {
    val got = engine.run(
      "SELECT $.c_custkey, $.o_orderkey FROM customer INCLUDE orders").count()
    val c = graft.core.Tables.load(spark, Sf0001, "customer")
    val o = graft.core.Tables.load(spark, Sf0001, "orders")
    val want = c.join(o, c("c_custkey") === o("o_custkey"), "left").count()
    assert(got == want)
  }

  test("unknown INCLUDE target raises") {
    intercept[IllegalArgumentException](
      engine.translate("SELECT $ FROM customer INCLUDE nosuch"))
  }

  test("DML dispatch: INSERT / UPDATE / DELETE / EXPLAIN") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("friend" -> Seq((1L, "ann", 30L), (2L, "bob", 40L))
        .toDF("id", "name", "age")),
      Map.empty)

    // INSERT INTO ... VALUES {doc},{doc} (Commands/Insert.cs)
    val ins = fresh.execute(
      """INSERT INTO friend VALUES {"id": 3, "name": "cal", "age": 22}, {"id": 4, "name": "dee", "age": 35}""")
    assert(ins.head().getLong(0) == 2)
    assert(fresh.table("friend").count() == 4)

    // UPDATE ... SET with $-path expr + WHERE (Commands/Update.cs)
    val upd = fresh.execute(
      "UPDATE friend SET $.name = UPPER($.name) WHERE $.age > 30")
    assert(upd.head().getLong(0) == 2)
    val names = fresh.table("friend").orderBy("id")
      .select("name").as[String].collect().toSeq
    assert(names == Seq("ann", "BOB", "cal", "DEE"))

    // DELETE ... WHERE (Commands/Delete.cs)
    val del = fresh.execute("DELETE friend WHERE $.age < 25")
    assert(del.head().getLong(0) == 1)
    assert(fresh.table("friend").select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L))

    // EXPLAIN passes through to Catalyst's plan printer
    val plan = fresh.execute("EXPLAIN SELECT $.name FROM friend")
      .head().getString(0)
    assert(plan.contains("Physical Plan"))

    // storage-layout commands need a database-backed engine: an
    // admin-less instance parses them but cannot act
    intercept[UnsupportedOperationException](fresh.execute("CHECKPOINT"))
    intercept[UnsupportedOperationException](fresh.execute("REBUILD"))
    intercept[UnsupportedOperationException](fresh.execute("PRAGMA USER_VERSION"))
    intercept[UnsupportedOperationException](
      fresh.execute("CREATE INDEX ix_age ON friend (age)"))
    intercept[UnsupportedOperationException](
      fresh.execute("DROP INDEX friend.ix_age"))
    intercept[UnsupportedOperationException](fresh.execute("BEGIN TRANS"))
    intercept[UnsupportedOperationException](fresh.execute("COMMIT"))
    intercept[UnsupportedOperationException](fresh.execute("ROLLBACK"))
    // malformed transaction statements are parse errors, not dispatches
    intercept[IllegalArgumentException](fresh.execute("BEGIN banana"))
    // VACUUM / DESCRIBE HISTORY are real dispatches now — storage
    // concerns, refused without a database-backed engine
    intercept[UnsupportedOperationException](fresh.execute("VACUUM"))
    intercept[UnsupportedOperationException](
      fresh.execute("DESCRIBE HISTORY friend"))
    // anything else is still an unsupported command
    intercept[IllegalArgumentException](fresh.execute("SHRINK friend"))
  }

  test("INSERT creates an unknown collection lazily; UPDATE/DELETE on an " +
      "unknown collection affect 0 docs (reference lazy-materialization)") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("friend" -> Seq((1L, "ann")).toDF("id", "name")), Map.empty)

    // UPDATE/DELETE on a collection that does not exist: 0 affected, no error
    assert(fresh.execute("UPDATE ghosts SET $.x = 1").head().getLong(0) == 0)
    assert(fresh.execute("DELETE ghosts WHERE $.x = 1").head().getLong(0) == 0)

    // INSERT INTO an unknown collection creates it with the docs' schema
    val ins = fresh.execute(
      """INSERT INTO pets VALUES {"id": 1, "kind": "cat"}, {"id": 2, "kind": "dog"}""")
    assert(ins.head().getLong(0) == 2)
    assert(fresh.run("SELECT $.kind FROM pets WHERE $.id = 2")
      .as[String].head() == "dog")
    // and the new collection participates in later DML
    assert(fresh.execute("DELETE pets WHERE $.kind = 'cat'")
      .head().getLong(0) == 1)
    assert(fresh.table("pets").count() == 1)
  }

  test("SELECT INTO lands query results as a collection (Select.cs INTO " +
      "clause, ExecuteQueryInto); append on existing; :autoId parses") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("friend" -> Seq((1L, "ann", 30L), (2L, "bob", 40L), (3L, "cal", 22L))
        .toDF("id", "name", "age")),
      Map.empty)

    // create a new collection from a filtered projection
    val n = fresh.execute(
      "SELECT $.id, $.name INTO elders FROM friend WHERE $.age > 25")
    assert(n.head().getLong(0) == 2)
    assert(fresh.run("SELECT $ FROM elders").count() == 2)
    assert(fresh.table("elders").columns.toSeq == Seq("id", "name"))

    // INTO an EXISTING collection appends (the reference's insert loop)
    val n2 = fresh.execute(
      "SELECT $.id, $.name INTO elders FROM friend WHERE $.age < 25")
    assert(n2.head().getLong(0) == 1)
    assert(fresh.table("elders").count() == 3)

    // the :autoId tag parses and is ignored (natural PKs here)
    val n3 = fresh.execute(
      "SELECT $.id INTO ids : INT FROM friend WHERE $.id = 1")
    assert(n3.head().getLong(0) == 1)
    assert(fresh.table("ids").count() == 1)

    // a quoted 'INTO' is data, not a clause
    assert(fresh.execute("SELECT $.name FROM friend WHERE $.name = 'go INTO x'")
      .count() == 0)
  }

  test("DDL dispatch without an admin: in-memory DROP/RENAME COLLECTION") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("plant" -> Seq((1L, "p1"), (2L, "p2")).toDF("id", "name"),
        "workorders" -> Seq((10L, 1L, "fix"), (11L, 2L, "oil"))
          .toDF("wid", "plant_id", "task")),
      Map(("plant", "workorders") -> (("id", "plant_id"))))

    // RENAME COLLECTION re-keys the view map AND the FK registry:
    // INCLUDE against the renamed parent still joins on the DECLARED
    // keys (id = plant_id), not convention guessing
    assert(fresh.execute("RENAME COLLECTION plant TO factory")
      .head().getBoolean(0))
    assert(fresh.run("SELECT $.name FROM factory WHERE $.id = 1").count() == 1)
    val joined = fresh.run(
      "SELECT factory.name, workorders.task FROM factory INCLUDE workorders " +
        "WHERE factory.id = 1")
    assert(joined.select("task").as[String].collect().toSeq == Seq("fix"))
    // the old name is gone
    intercept[Exception](fresh.run("SELECT $ FROM plant").collect())
    // renaming a missing collection reports false (reference: no-op)
    assert(!fresh.execute("RENAME COLLECTION plant TO ghost")
      .head().getBoolean(0))
    // renaming onto an existing collection fails loudly
    intercept[IllegalArgumentException](
      fresh.execute("RENAME COLLECTION factory TO workorders"))

    // DROP COLLECTION unbinds the view; second drop reports false
    assert(fresh.execute("DROP COLLECTION workorders").head().getBoolean(0))
    intercept[Exception](fresh.run("SELECT $ FROM workorders").collect())
    assert(!fresh.execute("DROP COLLECTION workorders").head().getBoolean(0))
    // malformed DROP is a parse error, not a silent no-op
    intercept[IllegalArgumentException](fresh.execute("DROP banana"))
  }

  test("DML edge cases: nulls, quoted keywords, function commas, new columns") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("friend" -> Seq((1L, Some("ann"), Some(30L)), (2L, Some("bob"), None),
        (3L, None, Some(22L))).toDF("id", "name", "age")),
      Map.empty)

    // NULL-predicate rows are kept by DELETE and not counted
    val del = fresh.execute("DELETE friend WHERE $.age < 25")
    assert(del.head().getLong(0) == 1)
    assert(fresh.table("friend").select("id").as[Long].collect().toSet ==
      Set(1L, 2L))

    // a quoted 'where' must not open a WHERE clause; whitespace inside the
    // literal survives
    fresh.execute("UPDATE friend SET $.name = 'works  where needed' WHERE $.id = 2")
    assert(fresh.table("friend").filter($"id" === 2)
      .select("name").as[String].head() == "works  where needed")

    // commas inside function args are not SET-list separators
    fresh.execute("UPDATE friend SET $.age = COALESCE($.age, 99), $.name = UPPER($.name) WHERE $.id = 2")
    val r2 = fresh.table("friend").filter($"id" === 2)
      .select($"age", $"name").head()
    assert(r2.getLong(0) == 99 && r2.getString(1) == "WORKS  WHERE NEEDED")

    // SET on a missing column creates it (null on non-matching rows)
    fresh.execute("UPDATE friend SET $.nickname = 'annie' WHERE $.id = 1")
    val nicks = fresh.table("friend").orderBy("id")
      .select($"nickname").collect().map(r => Option(r.getString(0))).toSeq
    assert(nicks == Seq(Some("annie"), None))

    // apostrophe inside a double-quoted JSON string is data
    val ins = fresh.execute(
      """INSERT INTO friend VALUES {"id": 7, "name": "O'Brien, Jr"}, {"id": 8, "name": "x"}""")
    assert(ins.head().getLong(0) == 2)
    assert(fresh.table("friend").filter($"id" === 7)
      .select("name").as[String].head() == "O'Brien, Jr")
  }

  test("quote semantics: double-quoted values, multi-space literals, swap") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("friend" -> Seq((1L, "a  b", 10L, 20L), (2L, "x", 30L, 40L))
        .toDF("id", "name", "lo", "hi")),
      Map.empty)

    // SELECT with a multi-space literal matches rows exactly
    assert(fresh.execute("SELECT * FROM friend WHERE $.name = 'a  b'").count() == 1)

    // double-quoted JSON strings keep their whitespace and quoted keywords
    fresh.execute("""INSERT INTO friend VALUES {"id": 3, "name": "two  spaces where", "lo": 1, "hi": 2}""")
    assert(fresh.table("friend").filter($"id" === 3)
      .select("name").as[String].head() == "two  spaces where")

    // UPDATE evaluates predicate and every SET expression against the
    // ORIGINAL row: a swap works, and a predicate over a column being
    // updated does not see the new value
    fresh.execute("UPDATE friend SET $.lo = $.hi, $.hi = $.lo WHERE $.lo < 25")
    val r1 = fresh.table("friend").filter($"id" === 1)
      .select($"lo", $"hi").head()
    assert((r1.getLong(0), r1.getLong(1)) == ((20L, 10L)))
    val r2 = fresh.table("friend").filter($"id" === 2)
      .select($"lo", $"hi").head()
    assert((r2.getLong(0), r2.getLong(1)) == ((30L, 40L)))
  }

  test("INSERT under IgnoreCase collation unions cleanly (collated vs " +
    "plain strings was an analysis error)") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("people" -> Seq((1L, "Ann")).toDF("id", "name")), Map.empty,
      graft.core.Collation.IgnoreCase)
    fresh.execute("""INSERT INTO people VALUES {"id": 2, "name": "bob"}""")
    assert(fresh.table("people").count() == 2)
    // and the engine collation actually applies to the merged rows
    assert(fresh.run("SELECT $.id FROM people WHERE $.name = 'BOB'")
      .count() == 1)
  }

  test("INCLUDE child names containing keyword substrings parse whole " +
    "(workorders must not truncate at ORDER)") {
    import graft.query.LiteSql
    val fresh = new LiteSql(spark,
      Map("plant" -> Seq((1L, "p1")).toDF("id", "name"),
        "workorders" -> Seq((10L, 1L, "fix")).toDF("wid", "plant_id", "task")),
      Map(("plant", "workorders") -> (("id", "plant_id"))))
    val out = fresh.run(
      "SELECT $.name FROM plant INCLUDE workorders WHERE $.id = 1")
    assert(out.count() == 1)
    val both = fresh.run("SELECT $.name FROM plant INCLUDE workorders")
    assert(both.count() == 1)
  }

  // ---- explicit enumerable lambdas: MAP/FILTER/SORT(arr => expr) ----------
  // (BsonExpressionParser.cs:1166-1280 — `@` is the current item)

  test("MAP/FILTER(arr => expr) rewrite to transform/filter") {
    assert(engine.translate("SELECT MAP($.items => @.x + 1) FROM t")
      == "SELECT transform(items, _it -> _it.x + 1) FROM t")
    assert(engine.translate("SELECT FILTER($.nums => @ > 2) FROM t")
      == "SELECT filter(nums, _it -> _it > 2) FROM t")
    // Spark's own builtin lambda syntax passes through untouched
    assert(engine.translate("SELECT filter(nums, x -> x > 1) FROM t")
      == "SELECT filter(nums, x -> x > 1) FROM t")
    // a `=>` inside a string literal is data, not a lambda
    assert(engine.translate("SELECT MAP($.a, '=>') FROM t")
      == "SELECT MAP(a, '=>') FROM t")
  }

  test("SORT(arr => key [, order]) rewrites to an array_sort comparator " +
      "with nulls-lowest, and nesting renames item vars") {
    val asc = engine.translate("SELECT SORT($.nums => @) FROM t")
    assert(asc.contains("array_sort(nums, (_l, _r) ->"))
    val desc = engine.translate("SELECT SORT($.items => @.k, -1) FROM t")
    assert(desc.contains("(_l.k) < (_r.k) THEN 1"))
    val nested = engine.translate("SELECT MAP($.rows => FILTER(@.tags => @ != 'x')) FROM t")
    assert(nested ==
      "SELECT transform(rows, _it -> filter(_it.tags, _it2 -> _it2 != 'x')) FROM t")
  }

  test("lambda forms evaluate (semantics vs literal arrays)") {
    val r = spark.sql(engine.translate(
      "SELECT MAP($.ns => @ * 10) AS m, FILTER($.ns => @ >= 2) AS f, " +
        "SORT($.ns => @, 'desc') AS s, SORT($.ws => @.k)[0].v AS first " +
        "FROM (SELECT ARRAY(2, 1, 3) AS ns, ARRAY(NAMED_STRUCT('k', 9, 'v', 'hi'), " +
        "NAMED_STRUCT('k', 1, 'v', 'lo')) AS ws)")).head()
    assert(r.getSeq[Int](0) == Seq(20, 10, 30))
    assert(r.getSeq[Int](1) == Seq(2, 3))
    assert(r.getSeq[Int](2) == Seq(3, 2, 1))
    assert(r.getString(3) == "lo")
    // null keys sort lowest ascending (BsonValue comparison: null < all)
    val ns = spark.sql(engine.translate(
      "SELECT SORT($.xs => @.k) AS s FROM (SELECT " +
        "ARRAY(NAMED_STRUCT('k', 2), NAMED_STRUCT('k', CAST(NULL AS INT)), " +
        "NAMED_STRUCT('k', 1)) AS xs)")).head()
    assert(ns.getSeq[org.apache.spark.sql.Row](0).map(r =>
      if (r.isNullAt(0)) -1 else r.getInt(0)) == Seq(-1, 1, 2))
  }

  test("SELECT ... FOR UPDATE is accepted and ignored (snapshot-MVCC: " +
      "readers never block; Commands/Select.cs parses ForUpdate)") {
    assert(engine.run("SELECT $.r_name FROM region FOR UPDATE").count() == 5)
    assert(engine.run("SELECT $.r_name FROM region FOR UPDATE;").count() == 5)
    // not confused by a column literally containing the words
    assert(engine.run(
      "SELECT $.r_name FROM region WHERE $.r_name != 'for update'")
      .count() == 5)
  }

  test("parameterized queries: positional @0/@1 and named @name bind " +
      "type-correct literals (Execute(sql, args) parity)") {
    // int + string positional
    val r = engine.run(
      "SELECT $.r_name FROM region WHERE $.r_regionkey = @0 OR $.r_name = @1",
      Seq(0, "ASIA"))
    assert(r.collect().map(_.getString(0)).toSet == Set("AFRICA", "ASIA"))
    // named
    val n = engine.run(
      "SELECT COUNT(*) AS n FROM customer WHERE $.c_acctbal > @minBal " +
        "AND $.c_mktsegment = @seg",
      Map[String, Any]("minBal" -> 1000.0, "seg" -> "BUILDING"))
    val direct = engine.run("SELECT COUNT(*) AS n FROM customer WHERE " +
      "c_acctbal > CAST('1000.0' AS DOUBLE) AND c_mktsegment = 'BUILDING'")
    assert(n.head.getLong(0) == direct.head.getLong(0))
    // date + array params
    assert(LiteSql.bindParams("WHERE d >= @0 AND k IN_ARRAY(@1)",
      Seq(java.time.LocalDate.parse("2024-03-01"), Seq(1, 2, 3)), Map.empty)
      == "WHERE d >= DATE '2024-03-01' AND k IN_ARRAY(array(1, 2, 3))")
    // timestamp params render tz-independent
    assert(LiteSql.bindParams("WHERE ts <= @cut", Nil,
      Map("cut" -> java.time.Instant.parse("2024-03-01T00:00:00Z")))
      == "WHERE ts <= timestamp_micros(1709251200000000L)")
  }

  test("parameter content is DATA, never syntax: injection attempts " +
      "stay inside the literal") {
    val evil = "x' OR '1'='1"
    val out = engine.run(
      "SELECT COUNT(*) AS n FROM region WHERE $.r_name = @0", Seq(evil))
    assert(out.head.getLong(0) == 0L, "the OR must not escape the literal")
    val evil2 = "\"; DROP COLLECTION region; --"
    assert(engine.run(
      "SELECT COUNT(*) AS n FROM region WHERE $.r_name = @0", Seq(evil2))
      .head.getLong(0) == 0L)
    assert(engine.run("SELECT $.r_name FROM region").count() == 5,
      "region must survive the attempted drop")
    // a backslash-heavy param round-trips byte-for-byte
    val tricky = """a\"b\\c'd"""
    val echoed = engine.run("SELECT @0 AS s FROM region LIMIT 1", Seq(tricky))
    assert(echoed.head.getString(0) == tricky)
  }

  test("unbound @ tokens pass through: lambda items and GROUP BY @key " +
      "keep working next to parameters") {
    // @ is the lambda item inside FILTER; @0 is a parameter — same query
    val r = engine.run(
      "SELECT SIZE(FILTER($.embedding => @ > @0)) AS n FROM embeddings " +
        "WHERE $.vec_id = @1", Seq(0.5, 7L))
    assert(!r.isEmpty && r.head.getInt(0) >= 0)
    // a parameter holding NULL renders as NULL
    assert(LiteSql.bindParams("SET x = @0", Seq(null), Map.empty)
      == "SET x = NULL")
    // out-of-range positional / unknown named stay untouched (and the
    // GROUP BY @key alias is never mistaken for a parameter)
    assert(LiteSql.bindParams("GROUP BY @key HAVING n > @9",
      Seq(1), Map.empty) == "GROUP BY @key HAVING n > @9")
    // an all-digit token past Int range passes through, never throws
    assert(LiteSql.bindParams("WHERE k = @12345678901", Seq(1), Map.empty)
      == "WHERE k = @12345678901")
  }
}
