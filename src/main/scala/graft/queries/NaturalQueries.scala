package graft.queries

import org.apache.spark.sql.functions._
import graft.query.GraftQueryEngine

/** The NL query surface (SURVEY §3.3) exercised end-to-end: each entry is a
  * FIND-string run through the parser + lowering, oracle-checked against
  * plain SQL.
  */
object NaturalQueries {

  val all: Seq[Q] = Seq(
    Q("q60_nl_find_where_select",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND customer WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING' " +
          "SELECT c_custkey, c_name as person, c_acctbal"),
      Some("""SELECT c_custkey, c_name AS person, c_acctbal FROM customer
        WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'"""),
      "FIND/WHERE/SELECT with aliasing (QueryEngine.cs:285-375)"),

    Q("q61_nl_string_preds",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND part WHERE p_name contains 'widget' OR p_name startswith 'small' " +
          "SELECT p_partkey, p_name"),
      Some("""SELECT p_partkey, p_name FROM part
        WHERE CONTAINS(p_name, 'widget') OR p_name LIKE 'small%'"""),
      "contains/startswith predicates incl. OR conjunction (QueryEngine.cs:402-564)"),

    // Parenthesized WHERE groups — beyond the reference (QueryEngine.cs
    // splits flat on AND/OR), but the first thing a real user hits mixing
    // conjunctions; the text form lowers to the same Cond.group nodes the
    // JSON IR's anyOf already uses (q78).
    Q("q118_nl_paren_groups",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND orders WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH') " +
          "AND (o_totalprice > 250000 OR o_orderstatus = 'P') " +
          "SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice"),
      Some("""SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
          AND (o_totalprice > 250000 OR o_orderstatus = 'P')"""),
      "parenthesized WHERE groups in the NL grammar (beyond-reference; " +
        "lowers to the JSON IR's group nodes)"),

    Q("q62_nl_innerjoin_flatten",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND customer WHERE c_acctbal > 9000 SELECT c_custkey, c_name as person " +
          "INCLUDE orders WHERE o_totalprice > 200000 SELECT o_totalprice as amount " +
          "INNERJOIN as t SELECT person, amount"),
      Some("""SELECT c_name AS person, o_totalprice AS amount
        FROM customer JOIN orders ON o_custkey = c_custkey
        WHERE c_acctbal > 9000 AND o_totalprice > 200000"""),
      "the README M0 slice: INCLUDE + INNERJOIN flatten, no 2-row cap"),

    Q("q63_nl_dual_on",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND customer, nation ON customer.c_nationkey = nation.n_nationkey " +
          "WHERE nation.n_name endswith '3' " +
          "SELECT customer.c_custkey as c_custkey, nation.n_name as n_name"),
      Some("""SELECT c_custkey, n_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey WHERE n_name LIKE '%3'"""),
      "dual-table ON join (QueryEngine2.cs:55-133) as hash join"),

    Q("q64_nl_triple_on",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND region, nation, customer " +
          "ON region.r_regionkey = nation.n_regionkey " +
          "AND nation.n_nationkey = customer.c_nationkey " +
          "WHERE customer.c_acctbal > 9900 " +
          "SELECT region.r_name as r_name, nation.n_name as n_name, " +
          "customer.c_custkey as c_custkey"),
      Some("""SELECT r_name, n_name, c_custkey FROM region
        JOIN nation ON r_regionkey = n_regionkey
        JOIN customer ON n_nationkey = c_nationkey
        WHERE c_acctbal > 9900"""),
      "triple-table ON chain (QueryEngine3.cs:390-628) as chained hash joins"),

    Q("q65_nl_order_limit",
      (s, dir) => GraftQueryEngine(s, dir).run(
        "FIND orders WHERE o_orderstatus = 'F' " +
          "SELECT o_orderkey, o_totalprice ORDER BY o_orderkey DESC LIMIT 25"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'F' ORDER BY o_orderkey DESC LIMIT 25"""),
      "ORDER BY + LIMIT lowering (QueryEngine.cs:646-671), unique sort key"),

    Q("q66_nl_nested_children",
      (s, dir) => GraftQueryEngine(s, dir)
        .run("FIND customer WHERE c_acctbal > 9500 " +
          "SELECT c_custkey, c_name INCLUDE orders WHERE o_totalprice > 300000")
        // flatten the nested orders_Data for the hash compare: count + sum
        .select(col("c_custkey"), col("c_name"),
          size(coalesce(col("orders_Data"), array())).as("n_big_orders"),
          round(aggregate(
            transform(coalesce(col("orders_Data"), array()),
              o => o.getField("o_totalprice").cast("decimal(18,2)")),
            lit(java.math.BigDecimal.ZERO).cast("decimal(38,2)"),
            (acc, x) => (acc + x).cast("decimal(38,2)")).cast("double"), 2)
            .as("big_total")),
      Some("""SELECT c_custkey, c_name,
        COUNT(o_orderkey) AS n_big_orders,
        ROUND(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE), 2) AS big_total
        FROM customer LEFT JOIN orders
          ON o_custkey = c_custkey AND o_totalprice > 300000
        WHERE c_acctbal > 9500
        GROUP BY c_custkey, c_name"""),
      "NL INCLUDE 1→N nesting (QueryEngine.cs:751-799), checked via array agg"),

    // Serialized JSON query IR (the reference's Remote.Linq "GPT Query
    // Ready" path) lowered through the same NL machinery.
    Q("q68_json_query",
      (s, dir) => graft.query.JsonQuery.run(GraftQueryEngine(s, dir),
        """{"table": "customer",
            "where": [{"field": "c_acctbal", "op": ">", "value": "8000"},
                      {"field": "c_mktsegment", "op": "=", "value": "'MACHINERY'", "conj": "AND"}],
            "select": [{"name": "c_custkey"},
                       {"name": "c_name", "alias": "person"},
                       {"name": "c_acctbal"}],
            "orderBy": {"field": "c_custkey", "desc": true},
            "limit": 50}"""),
      Some("""SELECT c_custkey, c_name AS person, c_acctbal FROM customer
        WHERE c_acctbal > 8000 AND c_mktsegment = 'MACHINERY'
        ORDER BY c_custkey DESC LIMIT 50"""),
      "JSON-serialized query IR (QueryBuilder.cs:20-56) executed via the " +
        "NL lowering; schema export = df.schema.json"),

    Q("q67_lite_sql",
      (s, dir) => graft.query.LiteSql(s, dir).run(
        "SELECT $.c_mktsegment, COUNT(*) AS n_cust, " +
          "CAST(SUM(CAST($.c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS bal " +
          "FROM customer WHERE $.c_acctbal > 1000 " +
          "GROUP BY $.c_mktsegment"),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_cust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS bal
        FROM customer WHERE c_acctbal > 1000 GROUP BY c_mktsegment"""),
      "LiteDB SQL dialect ($-paths) translated to Spark SQL (SqlParser/Select.cs)"),

    // Dialect array segments + @key: `$.arr[@ > 0]` filter paths and
    // `$.arr[-1]` negative indexes (ARRAY_FILTER/ARRAY_INDEX,
    // BsonExpressionOperators.cs:269-329) lower to filter()/try_element_at;
    // GROUP BY's @key parameter (GroupByPipe.cs:28-106) resolves to the
    // group expression.
    Q("q69_lite_array_paths",
      (s, dir) => graft.query.LiteSql(s, dir).run(
        "SELECT @key AS label, COUNT(*) AS n_vecs, " +
          "CAST(SUM(SIZE($.embedding[@ > 0])) AS BIGINT) AS n_pos " +
          "FROM embeddings WHERE $.embedding[-1] > -1 GROUP BY $.label"),
      Some("""SELECT label, COUNT(*) AS n_vecs,
        CAST(SUM(LEN(LIST_FILTER(embedding, x -> x > 0))) AS BIGINT) AS n_pos
        FROM embeddings WHERE embedding[-1] > -1 GROUP BY label"""),
      "LiteDB SQL array filter/index paths + GROUP BY @key alias"),

    // Serialized IR, extended surface: dual-table ON join + grouped
    // aggregates (QueryBuilder.cs:20-100 schema-export parity — the IR now
    // covers the same relational surface as the NL dual/triple ON forms).
    Q("q75_json_multi_agg",
      (s, dir) => graft.query.JsonQuery.run(GraftQueryEngine(s, dir),
        """{"tables": ["nation", "customer"],
            "on": [{"left": "nation.n_nationkey", "right": "customer.c_nationkey"}],
            "where": [{"field": "customer.c_acctbal", "op": ">", "value": "0"}],
            "groupBy": ["nation.n_name"],
            "agg": [{"fn": "count", "alias": "n_cust"},
                    {"fn": "max", "field": "customer.c_acctbal", "alias": "max_bal"}],
            "orderBy": {"field": "n_name", "desc": false}}"""),
      Some("""SELECT n_name, COUNT(*) AS n_cust, MAX(c_acctbal) AS max_bal
        FROM nation JOIN customer ON n_nationkey = c_nationkey
        WHERE c_acctbal > 0 GROUP BY n_name ORDER BY n_name"""),
      "JSON IR multi-join + grouped aggregates, lowered AST-first " +
        "(count/sum/avg/min/max whitelist; never through query text)"),

    // Serialized IR, residual Remote.Linq surface: nested anyOf condition
    // groups (parenthesized OR), HAVING over aggregates, and computed
    // select entries as an expression AST ({"fn","args"} trees) — every
    // piece lowered AST-first, never through query text.
    Q("q78_json_groups_having",
      (s, dir) => graft.query.JsonQuery.run(GraftQueryEngine(s, dir),
        """{"table": "orders",
            "where": [
              {"anyOf": [
                {"field": "o_orderpriority", "op": "=", "value": "'1-URGENT'"},
                {"field": "o_orderpriority", "op": "=", "value": "'2-HIGH'"}]},
              {"field": "o_totalprice", "op": ">", "value": "1000", "conj": "AND"}],
            "groupBy": ["o_orderstatus"],
            "agg": [{"fn": "count", "alias": "n"},
                    {"fn": "max", "field": "o_totalprice", "alias": "max_price"}],
            "having": [{"field": "n", "op": ">", "value": "100"}],
            "select": [
              {"expr": {"fn": "mul", "args": [{"col": "max_price"}, {"lit": 2}]},
               "alias": "double_max"},
              {"expr": {"fn": "concat", "args": [{"lit": "s:"}, {"col": "o_orderstatus"}]},
               "alias": "tag"}],
            "orderBy": {"field": "o_orderstatus", "desc": false}}"""),
      Some("""SELECT o_orderstatus, COUNT(*) AS n, MAX(o_totalprice) AS max_price,
          MAX(o_totalprice) * 2 AS double_max, 's:' || o_orderstatus AS tag
        FROM orders
        WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
          AND o_totalprice > 1000
        GROUP BY o_orderstatus HAVING COUNT(*) > 100
        ORDER BY o_orderstatus"""),
      "JSON IR anyOf groups + HAVING + computed select expression trees " +
        "(Remote.Linq QueryBuilder.cs:20-56 residual surface)")
  )
}
