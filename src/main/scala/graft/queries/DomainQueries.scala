package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.model.{IotValue, Units}

/** IoT-domain semantics (SURVEY §1): unit conversion, priority-slot
  * resolution, FK-constraint validation jobs, cascade-delete planning,
  * INCLUDE hydration and 1→N child nesting.
  */
object DomainQueries {

  val all: Seq[Q] = Seq(
    Q("q50_unit_convert",
      (s, dir) => {
        // assign a unit per row (3-way: celsius / kelvin / fahrenheit),
        // convert everything to degrees_fahrenheit via the broadcast rules
        // table (the full 435-unit / 1219-rule registry from Units.cs)
        val ev = Tables.load(s, dir, "events")
          .withColumn("unit",
            when(col("user_id") % 3 === 0, "degrees_celsius")
              .when(col("user_id") % 3 === 1, "degrees_kelvin")
              .otherwise("degrees_fahrenheit"))
        Units.convert(s, ev, "value", "unit", "degrees_fahrenheit", "value_f")
          .select(col("event_id"), col("unit"),
            round(col("value_f"), 6).as("value_f"))
      },
      // factors mirror the registry's exact affine coefficients:
      // C->F = v*1.8+32; K->F = v*1.8-459.67
      Some("""SELECT event_id,
        CASE WHEN user_id % 3 = 0 THEN 'degrees_celsius'
             WHEN user_id % 3 = 1 THEN 'degrees_kelvin'
             ELSE 'degrees_fahrenheit' END AS unit,
        ROUND(CASE WHEN user_id % 3 = 0 THEN value * 1.8 + 32.0
                   WHEN user_id % 3 = 1 THEN value * 1.8 + (-459.67)
                   ELSE value * 1.0 + 0.0 END, 6) AS value_f
        FROM events"""),
      "broadcast unit-conversion (IotUnit.cs:27-61 formulas as a rules table)"),

    Q("q51_priority_resolve",
      (s, dir) => {
        // synthesize a 17-slot priority array: slot 9 (ControlStrategy)
        // holds value*2 for purchases, slot 15 (Default) always holds value
        val ev = Tables.load(s, dir, "events")
        val slotVal = (p: Int) => p match {
          case 9 => when(col("event_type") === "purchase",
            (col("value") * 2).cast("decimal(18,2)").cast("string"))
          case 15 => col("value").cast("decimal(18,2)").cast("string")
          case _ => lit(null).cast("string")
        }
        val slots = array((1 to IotValue.NumSlots).map(p =>
          struct(slotVal(p).as("value"), col("ts").as("ts"))): _*)
        ev.withColumn("slots", slots)
          .select(col("event_id"),
            IotValue.resolvePriority(col("slots")).as("resolved"),
            IotValue.resolvedPriorityIndex(col("slots")).as("priority"))
      },
      Some("""SELECT event_id,
        CASE WHEN event_type = 'purchase'
          THEN CAST(CAST(value * 2 AS DECIMAL(18,2)) AS VARCHAR)
          ELSE CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END AS resolved,
        CASE WHEN event_type = 'purchase' THEN 9 ELSE 15 END AS priority
        FROM events"""),
      "17-slot priority resolution (IotValue.cs:299-343) as a pure expression"),

    Q("q52_fk_validate",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .select(lit("orphan_order").as("kind"), col("o_orderkey").as("key"))
        val dupes = c.groupBy("c_custkey").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .select(lit("dup_customer").as("kind"), col("c_custkey").as("key"))
        orphans.unionByName(dupes)
          .groupBy("kind").agg(count(lit(1)).as("n_violations"))
      },
      Some("""WITH v AS (
          SELECT 'orphan_order' AS kind, o_orderkey AS key FROM orders
          WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
          UNION ALL
          SELECT 'dup_customer' AS kind, c_custkey AS key FROM customer
          GROUP BY c_custkey HAVING COUNT(*) > 1)
        SELECT kind, COUNT(*) AS n_violations FROM v GROUP BY kind"""),
      "FK/unique constraint validation (TableCollection.cs:922-978) as anti-join jobs"),

    Q("q53_cascade_plan",
      (s, dir) => {
        // cascade-delete plan (TableCollection.cs:316-460): deleting
        // customers with c_acctbal < 100 — count affected rows per table
        val doomed = Tables.load(s, dir, "customer")
          .filter(col("c_acctbal") < 100).select("c_custkey")
        val orders = Tables.load(s, dir, "orders")
          .join(doomed, col("o_custkey") === col("c_custkey"), "left_semi")
        val lineitems = Tables.load(s, dir, "lineitem")
          .join(orders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
        val s1 = doomed.agg(count(lit(1)).as("n_rows"))
          .select(lit("customer").as("table_name"), col("n_rows"))
        val s2 = orders.agg(count(lit(1)).as("n_rows"))
          .select(lit("orders").as("table_name"), col("n_rows"))
        val s3 = lineitems.agg(count(lit(1)).as("n_rows"))
          .select(lit("lineitem").as("table_name"), col("n_rows"))
        s1.unionByName(s2).unionByName(s3)
      },
      Some("""WITH doomed AS (SELECT c_custkey FROM customer WHERE c_acctbal < 100),
        del_orders AS (SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM doomed))
        SELECT 'customer' AS table_name, (SELECT COUNT(*) FROM doomed) AS n_rows
        UNION ALL
        SELECT 'orders', (SELECT COUNT(*) FROM del_orders)
        UNION ALL
        SELECT 'lineitem', (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders))"""),
      "cascade-delete planning in dependency order (semi-join set closure)"),

    Q("q54_include_hydrate",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("c_name"), lit("$missing")).as("c_name"),
            coalesce(col("c_mktsegment"), lit("$missing")).as("c_mktsegment"))
      },
      Some("""SELECT o_orderkey,
        COALESCE(c_name, '$missing') AS c_name,
        COALESCE(c_mktsegment, '$missing') AS c_mktsegment
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey"""),
      "INCLUDE $ref hydration (BasePipe.cs:46-133) incl. $missing marker"),

    Q("q55_nested_children",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            concat_ws(",",
              sort_array(collect_list(col("o_orderkey"))))
              .as("order_keys"))
      },
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey) FILTER (o_orderkey IS NOT NULL)), ','), '') AS order_keys
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name"""),
      "NL INCLUDE 1→N child nesting (QueryEngine.cs:751-799) via collect_list"),

    Q("q56_current_state",
      (s, dir) => {
        // IotValue current state from the event history: purchases write
        // slot 9 (ControlStrategy) with value*2, every event writes slot 15
        // (Default); latest write per slot wins; resolve = first non-null
        val ev = Tables.load(s, dir, "events")
        val writes = ev.select(col("user_id"),
            when(col("event_type") === "purchase", 9).otherwise(15).as("priority"),
            when(col("event_type") === "purchase",
              (col("value") * 2).cast("decimal(18,2)").cast("string"))
              .otherwise(col("value").cast("decimal(18,2)").cast("string"))
              .as("value"),
            unix_micros(col("ts")).as("tsUs"), col("event_id").as("tie"))
        graft.model.PrioritySlots.currentState(s, writes, "user_id")
          .select(col("key").as("user_id"), col("resolved"), col("priority"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
          -- HUGEINT composite (ts, event_id) key: a BIGINT encoding with
          -- event_id % 100000 wraps the tiebreak once ids reach 1e5 and
          -- can resolve same-ts writes to the wrong 'latest'
          (EPOCH_US(ts) - EPOCH_US(TIMESTAMP '2024-01-01'))::HUGEINT
            * 1000000000000 + event_id AS ord
          FROM events)
        SELECT user_id,
          COALESCE(
            ARG_MAX(CAST(CAST(value * 2 AS DECIMAL(18,2)) AS VARCHAR), ord)
              FILTER (WHERE event_type = 'purchase'),
            ARG_MAX(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), ord)
              FILTER (WHERE event_type <> 'purchase')) AS resolved,
          CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
               THEN 9 ELSE 15 END AS priority
        FROM e GROUP BY user_id"""),
      "17-slot current state via a typed Aggregator (latest write per slot, " +
        "order-independent merge) + priority resolution"),

    Q("q76_dynamic_docs",
      (s, dir) => {
        import org.apache.spark.sql.types._
        import graft.catalog.DynamicDocs
        // Heterogeneous JSON corpus from the documents table: to_json omits
        // null fields, so short docs carry no n_chars key and non-en docs no
        // region key — genuinely schemaless per-row shapes.
        val docs = Tables.load(s, dir, "documents")
        val json = {
          import s.implicits._
          docs.select(to_json(struct(
            col("doc_id"), col("lang"), col("source"),
            when(col("n_chars") > 300, col("n_chars")).as("n_chars"),
            when(col("lang") === "en",
              concat(lit("r"), col("doc_id") % 5)).as("region"))).as("value"))
            .as[String]
        }
        // Pin (doc_id, lang); source/n_chars/region ride in _overflow.
        val dyn = DynamicDocs.fromJson(s, json, StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType))))
        // Find on a pinned column AND an overflow field, then promote the
        // hot overflow field to a typed column (schema-evolution path).
        val found = DynamicDocs.find(
          DynamicDocs.find(dyn, "lang", "en"), "region", "r1")
        val promoted = DynamicDocs.promote(found, "n_chars", LongType)
        promoted.select(col("doc_id"), col("lang"),
          DynamicDocs.field(promoted, "source").as("source"),
          col("n_chars"))
      },
      Some("""SELECT doc_id, lang, source,
        CASE WHEN n_chars > 300 THEN n_chars END AS n_chars
        FROM documents
        WHERE lang = 'en' AND doc_id % 5 = 1"""),
      "dynamic (schemaless) documents: pinned columns + JSON overflow, " +
        "Find on pinned+overflow fields, hot-field promotion " +
        "(TableCollection.cs:666-703 Find(columnName, value))"),

    // Column-level AES (analytic mapping of AesStream.cs password
    // encryption, SURVEY §2.11): ECB for deterministic (joinable)
    // ciphertext, GCM for production randomized+authenticated, wrong-key
    // GCM decrypt nulls out under try_aes_decrypt. All facts the oracle
    // can state about correct crypto reduce to exact counts — ciphertext
    // bytes themselves are (and must be) unpredictable to the oracle.
    Q("q127_aes_column",
      (s, dir) => {
        import graft.core.ColumnCrypto._
        val pw = "graft-secret"
        Tables.load(s, dir, "documents")
          .select(col("text"),
            decrypt(encrypt(col("text"), pw, deterministic = true), pw,
              deterministic = true).as("ecb_rt"),
            decrypt(encrypt(col("text"), pw), pw).as("gcm_rt"),
            encrypt(col("text"), pw, deterministic = true).as("ecb_ct"),
            tryDecrypt(encrypt(col("text"), pw), "wrong-password")
              .as("bad_key"))
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("ecb_rt") === col("text"), 1)).as("n_ecb_ok"),
            count(when(col("gcm_rt") === col("text"), 1)).as("n_gcm_ok"),
            countDistinct(col("ecb_ct")).as("n_distinct_cipher"),
            count(when(col("bad_key").isNull, 1)).as("n_wrong_key_null"))
      },
      // n_ecb_ok/n_gcm_ok count COUNT(text), not COUNT(*): encrypt(NULL)
      // is NULL on the Spark side, so a future fixture with NULL texts
      // must not fail the gate (the driver HAS varied fixtures before)
      Some("""SELECT COUNT(*) AS n_docs, COUNT(text) AS n_ecb_ok,
        COUNT(text) AS n_gcm_ok, COUNT(DISTINCT text) AS n_distinct_cipher,
        COUNT(*) AS n_wrong_key_null FROM documents"""),
      "column-level AES-256 round-trip (AesStream.cs password contract " +
        "as codegen aes_encrypt/aes_decrypt; deterministic-ECB ciphertext " +
        "cardinality equals plaintext cardinality, wrong-key GCM nulls)"),

    // The EXECUTED cascade (vs q53's plan): load a 3-level FK chain into
    // a log-backed GraftDatabase, run the cascading delete through the
    // facade, and read the survivors back from COMMITTED state. The
    // require() pins the ACID contract — all three tables publish in ONE
    // atomic commit-log version (TransactionService.cs:125-282 analog) —
    // so the correctness gate fails if the cascade ever splits into
    // per-table commits. Inputs are %4-sampled so the write cost stays
    // proportionate at bench scale; the oracle mirrors the sample.
    Q("q136_cascade_exec",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.{Cascade, Fk, TableDef}
        val base = java.nio.file.Files.createTempDirectory("graft-q136").toString
        val db = GraftDatabase(s, "q136", base)
          .defineTable(TableDef("customer", "c_custkey"))
          .defineTable(TableDef("orders", "o_orderkey",
            fks = Seq(Fk("o_custkey", "customer", "c_custkey", Cascade))))
          .defineTable(TableDef("lineitem", "l_rowid",
            fks = Seq(Fk("l_orderkey", "orders", "o_orderkey", Cascade))))
        db.insert("customer", Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal")))
        db.insert("orders", Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), col("o_custkey")))
        // the synthetic lineitem has no unique natural key (duplicate
        // (l_orderkey, l_linenumber) pairs exist) — assign a surrogate
        // rowid; its values never reach the output, only the counts do
        db.insert("lineitem", Tables.load(s, dir, "lineitem")
          .filter(col("l_orderkey") % 4 === 0)
          .select(monotonically_increasing_id().as("l_rowid"),
            col("l_orderkey")))
        val v0 = db.logVersion
        db.delete("customer", col("c_acctbal") < 100)
        require(db.logVersion == v0 + 1,
          s"cascade must publish as ONE atomic commit (was ${db.logVersion - v0})")
        import s.implicits._
        Seq("customer", "orders", "lineitem").map(t => (t, db.count(t)))
          .toDF("table_name", "n_rows")
          .withColumn("n_commits", lit(1L))
      },
      Some("""WITH doomed AS (
          SELECT c_custkey FROM customer WHERE c_acctbal < 100),
        o AS (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 4 = 0),
        l AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey % 4 = 0),
        del_o AS (SELECT o_orderkey FROM o
          WHERE o_custkey IN (SELECT c_custkey FROM doomed))
        SELECT 'customer' AS table_name,
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT c_custkey FROM doomed)) AS n_rows,
          CAST(1 AS BIGINT) AS n_commits
        UNION ALL
        SELECT 'orders',
          (SELECT COUNT(*) FROM o
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del_o)),
          CAST(1 AS BIGINT)
        UNION ALL
        SELECT 'lineitem',
          (SELECT COUNT(*) FROM l
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM del_o)),
          CAST(1 AS BIGINT)"""),
      "EXECUTED cascade delete through the ACID commit log: 3-level FK " +
        "chain, all affected tables in one atomic version, survivors " +
        "read from committed state (TableCollection.cs:316-460 walk + " +
        "WAL-transaction atomicity)"),

    // CREATE INDEX → range-clustered layout → PRUNED read → DROP INDEX,
    // all through the SQL dispatch (SqlParser.cs:32-49). The pruning
    // evidence is in-query: after clustering, per-file [min,max] ranges
    // on the indexed column are disjoint, so the BETWEEN probe overlaps
    // at most a quarter of the files — the require() fails if the
    // "lakehouse index" ever stops clustering. maxRecordsPerFile forces
    // a multi-file layout at test scale (at production scale the
    // 128MB-file default gives the same granularity for free).
    Q("q137_ddl_roundtrip",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q137").toString
        val db = GraftDatabase(s, "q137", base)
          .defineTable(TableDef("orders", "o_orderkey"))
        db.insert("orders", Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
        val prev = s.conf.get("spark.sql.files.maxRecordsPerFile", "0")
        try {
          s.conf.set("spark.sql.files.maxRecordsPerFile", "1000")
          require(db.sql("CREATE INDEX ix_cust ON orders (o_custkey)")
            .head().getBoolean(0), "CREATE INDEX must build")
        } finally s.conf.set("spark.sql.files.maxRecordsPerFile", prev)
        // pruning gate: files whose [min,max] o_custkey range overlaps
        // the probe window vs total files of the clustered layout
        val files = db.liveFiles("orders")
        val ranges = s.read.parquet(files: _*)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("o_custkey")).as("lo"), max(col("o_custkey")).as("hi"))
          .collect()
        val over = ranges.count(r =>
          r.getAs[Number]("lo").longValue <= 200L &&
            r.getAs[Number]("hi").longValue >= 100L)
        // the gate activates once the layout has enough files to show
        // pruning (sf0.01+); below that the whole table is one file and
        // there is nothing to prune
        require(ranges.length < 4 || over <= math.max(1, ranges.length / 4),
          s"index layout must prune: $over of ${ranges.length} files " +
            "overlap the probe range")
        val out = db.sql(
          "SELECT o_custkey, COUNT(o_orderkey) AS n_orders, " +
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
            "AS sum_price FROM orders " +
            "WHERE o_custkey BETWEEN 100 AND 200 GROUP BY o_custkey")
        val rows = out.collect() // materialize BEFORE dropping the index
        require(db.sql("DROP INDEX orders.ix_cust").head().getBoolean(0),
          "DROP INDEX must deregister")
        require(db.indexDefs("orders").isEmpty, "registry must be empty")
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            java.util.Arrays.asList(rows: _*)), out.schema)
      },
      Some("""SELECT o_custkey, COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 4 = 0 AND o_custkey BETWEEN 100 AND 200
        GROUP BY o_custkey"""),
      "SQL DDL round-trip: CREATE INDEX → range-clustered multi-file " +
        "layout (disjoint per-file min/max ⇒ row-group pruning) → " +
        "BETWEEN probe → DROP INDEX, with the pruning ratio asserted " +
        "in-query"),

    // Transparent file-at-rest encryption (AesStream.cs:50-110 →
    // Parquet Modular Encryption, core.FileCrypto): load a table into a
    // password-opened database, assert in-query that every data file
    // carries the encrypted-footer magic AND is opaque to a reader
    // without the key, then aggregate through the facade — results must
    // match the plaintext oracle exactly (encryption is transparent to
    // the query layer; AES-GCM runs inside the executor-side parquet
    // codec, never in the plan).
    Q("q138_encrypted_store",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q138").toString
        val db = GraftDatabase(s, "q138", base, graft.core.Collation.Binary,
          Some("q138-at-rest-key"))
          .defineTable(TableDef("orders", "o_orderkey"))
        db.insert("orders", Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 4 === 0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
        val files = db.liveFiles("orders")
        require(files.nonEmpty &&
          files.forall(graft.core.FileCrypto.isEncryptedFile),
          "store files must carry the encrypted-footer magic (PARE)")
        require(scala.util.Try(s.read.parquet(files.head).collect()).isFailure,
          "an encrypted file must be opaque without the key")
        db.table("orders")
          .groupBy((col("o_custkey") % 10).cast("long").as("bucket"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
        COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1"""),
      "transparent at-rest encryption: password-opened store, every file " +
        "AES-GCM-encrypted (PME) and opaque without the key, query " +
        "results identical to plaintext — the AesStream.cs analog"),

    // The EXECUTED insert→upsert→updateMany→delete chain (vs the
    // spec-only DML rows): every mutation is one commit-log version, and
    // the survivors are read back from COMMITTED state. The oracle
    // replays the same chain relationally. Mirrors TableCollection.cs
    // Insert/Upsert (:1195-1240) / UpdateMany / DeleteMany semantics on
    // the log-backed store.
    Q("q139_dml_exec",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q139").toString
        val db = GraftDatabase(s, "q139", base)
          .defineTable(TableDef("orders", "o_orderkey"))
        val src = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        db.insert("orders", src.filter(col("o_orderkey") % 5 === 0))
        val v1 = db.logVersion
        // upsert: %10==0 rows EXIST (update in place), %10==1 are NEW
        db.upsert("orders", src
          .filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 10 === 1)
          .withColumn("o_totalprice", col("o_totalprice") * 2))
        db.updateMany("orders", col("o_custkey") % 7 === 0,
          Map("o_totalprice" -> (col("o_totalprice") + 100)))
        db.delete("orders", col("o_custkey") % 11 === 0)
        require(db.logVersion == v1 + 3,
          s"upsert+update+delete must be 3 commits (was ${db.logVersion - v1})")
        db.table("orders")
          .groupBy((col("o_custkey") % 10).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""WITH base AS (
          SELECT o_orderkey, o_custkey, o_totalprice AS p
          FROM orders WHERE o_orderkey % 5 = 0),
        ups AS (
          SELECT o_orderkey, o_custkey, o_totalprice * 2 AS p
          FROM orders WHERE o_orderkey % 10 IN (0, 1)),
        merged AS (
          SELECT * FROM ups
          UNION ALL
          SELECT * FROM base
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ups)),
        upd AS (
          SELECT o_orderkey, o_custkey,
            CASE WHEN o_custkey % 7 = 0 THEN p + 100 ELSE p END AS p
          FROM merged),
        fin AS (SELECT * FROM upd WHERE o_custkey % 11 <> 0)
        SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
          COUNT(*) AS n_rows,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM fin GROUP BY 1"""),
      "EXECUTED DML chain on the ACID store: insert, key-matched upsert " +
        "(update existing + insert new in one commit), predicated " +
        "transform update, predicated delete — one log version each, " +
        "survivors read from committed state"),

    // HashUniqueIdentifiers (Base/BaseDatabase.cs:115-145): the
    // reference's deterministic row fingerprint — SHA-256 over the
    // concatenated "name=value;" pairs — as a codegen'd column,
    // byte-compared against DuckDB's sha256 of the identical
    // concatenation. Doubles as a scale-safe synthetic key: computed
    // at the scan, no shuffle, no driver involvement.
    Q("q140_unique_id_hash",
      (s, dir) => {
        import graft.functions.RefFunctions
        Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 200)
          .select(col("c_custkey"),
            RefFunctions.hashUniqueIdentifiers(
              "c_custkey" -> col("c_custkey"),
              "c_name" -> col("c_name")).as("row_hash"))
      },
      Some("""SELECT c_custkey,
        sha256('c_custkey=' || CAST(c_custkey AS VARCHAR) ||
          ';c_name=' || c_name || ';') AS row_hash
        FROM customer WHERE c_custkey <= 200"""),
      "deterministic unique-row fingerprint (HashUniqueIdentifiers): " +
        "sha256 over name=value; pairs, codegen'd at the scan on both " +
        "engines"),

    // Time travel over the commit log: three committed states (insert,
    // delete, transform-update), each read back AS OF its version — v1
    // and v2 through the facade (tableAt), v3 through the SQL dialect's
    // `FROM t VERSION AS OF v` — and summarized. Works because data
    // files are immutable and a snapshot is just a version's file
    // binding (TxLog.snapshotAt replays bounded metadata, never data);
    // the oracle recomputes each state relationally from the source.
    Q("q141_time_travel",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q141").toString
        val db = GraftDatabase(s, "q141", base)
          .defineTable(TableDef("nation", "n_nationkey"))
        db.insert("nation", Tables.load(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"), col("n_name")))
        val v1 = db.logVersion
        db.delete("nation", col("n_regionkey") === 0)
        val v2 = db.logVersion
        db.updateMany("nation", col("n_regionkey") === 1,
          Map("n_name" -> concat(col("n_name"), lit("_X"))))
        val v3 = db.logVersion
        def stats(df: org.apache.spark.sql.DataFrame, tag: Long) =
          df.agg(count(lit(1)).as("n_rows"),
            sum(when(col("n_name").endsWith("_X"), 1L).otherwise(0L))
              .as("n_marked"))
            .select(lit(tag).as("ver"), col("n_rows"), col("n_marked"))
        stats(db.tableAt("nation", v1).get, 1L)
          .unionByName(stats(db.tableAt("nation", v2).get, 2L))
          .unionByName(stats(
            db.sql(s"SELECT n_name FROM nation VERSION AS OF $v3"), 3L))
      },
      Some("""SELECT CAST(1 AS BIGINT) AS ver,
          (SELECT COUNT(*) FROM nation) AS n_rows,
          CAST(0 AS BIGINT) AS n_marked
        UNION ALL
        SELECT 2, (SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0),
          CAST(0 AS BIGINT)
        UNION ALL
        SELECT 3, (SELECT COUNT(*) FROM nation WHERE n_regionkey <> 0),
          (SELECT COUNT(*) FROM nation
            WHERE n_regionkey = 1)"""),
      "time travel: immutable files + versioned metadata make every " +
        "committed state readable AS OF its version (facade tableAt + " +
        "SQL VERSION AS OF), bounded-metadata replay, zero data copies"),

    // Row-level change feed from a snapshot DIFF: delete + append on a
    // log-backed table, then changes(v0, head) reconstructs exact
    // row-level inserts/deletes from the EXCHANGED files only — rows a
    // file-granular rewrite copied through unchanged appear on both
    // sides and cancel under exceptAll, so the feed's cost tracks the
    // churn, not the table (the Delta CDF contract, computed post-hoc).
    Q("q142_change_feed",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q142").toString
        val db = GraftDatabase(s, "q142", base)
          .defineTable(TableDef("supplier", "s_suppkey"))
        val src = Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        db.insert("supplier", src)
        val v0 = db.logVersion
        db.delete("supplier", col("s_suppkey") % 4 === 1)
        db.insert("supplier", src.filter(col("s_suppkey") % 3 === 0)
          .withColumn("s_suppkey", col("s_suppkey") + 1000000))
        val feed = db.changes("supplier", v0, db.logVersion)
        feed.groupBy(col("_change_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("s_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_acctbal"))
      },
      Some("""SELECT 'delete' AS _change_type, COUNT(*) AS n_rows,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM supplier WHERE s_suppkey % 4 = 1
        UNION ALL
        SELECT 'insert', COUNT(*),
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        FROM supplier WHERE s_suppkey % 3 = 0"""),
      "change data feed as a snapshot diff: exact row-level " +
        "inserts/deletes reconstructed from only the files EXCHANGED " +
        "between two versions (multiset exceptAll cancels rewrite " +
        "pass-through rows) — cost proportional to churn, not table size"),

    // OPTIMIZE (small-file bin-packing): six single-file appends leave a
    // small-file backlog; optimize() reads ONLY the small files,
    // coalesces them shuffle-free into ceil(bytes/target) right-sized
    // files, and commits the exchange as a RELATIVE patch (commutes with
    // concurrent disjoint-file DML, never rewrites right-sized files).
    // File counts are pinned in-query; the data must round-trip exactly.
    Q("q143_optimize",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q143").toString
        val db = GraftDatabase(s, "q143", base)
          .defineTable(TableDef("part", "p_partkey"))
        val src = Tables.load(s, dir, "part").filter(col("p_partkey") <= 1200)
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        (0 until 6).foreach(i =>
          db.insert("part", src.filter(col("p_partkey") % 6 === i)
            .repartition(1)))
        val (fb, fa) = db.optimize("part")
        require(fb == 6 && fa == 1,
          s"optimize must pack 6 small files into 1 (got $fb -> $fa)")
        require(db.liveFiles("part").size == 1,
          "committed snapshot must hold exactly the packed file")
        db.table("part")
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("p_retailprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""SELECT p_brand, COUNT(*) AS n_rows,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part WHERE p_partkey <= 1200 GROUP BY 1"""),
      "lakehouse OPTIMIZE: bin-pack ONLY the small files (shuffle-free " +
        "coalesce), publish as a commuting relative patch, data " +
        "byte-exact across the repack — write amplification tracks the " +
        "backlog, not the table"),

    // Zero-copy shallow clone: one metadata-only commit binds the clone
    // to the source's immutable files (O(1) in data size — pinned
    // in-query: identical physical file lists, exactly one version
    // bump). Copy-on-write then lets the clone diverge while the source
    // is untouched — also pinned. The experiment-branch primitive a
    // 100 TB curation pipeline uses to fork a corpus for free.
    Q("q144_shallow_clone",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q144").toString
        val db = GraftDatabase(s, "q144", base)
          .defineTable(TableDef("customer", "c_custkey"))
        db.insert("customer", Tables.load(s, dir, "customer")
          .filter(col("c_custkey") <= 1000)
          .select(col("c_custkey"), col("c_acctbal")))
        val filesSrc = db.liveFiles("customer")
        val v0 = db.logVersion
        db.sql("CLONE COLLECTION customer TO customer2")
        require(db.logVersion == v0 + 1,
          "clone must be exactly one metadata-only commit")
        require(db.liveFiles("customer2") == filesSrc,
          "clone must share the source's physical files (zero copy)")
        db.delete("customer2", col("c_custkey") % 5 === 0)
        require(db.liveFiles("customer") == filesSrc,
          "source files must be untouched after clone DML (copy-on-write)")
        import s.implicits._
        def stats(t: String) = db.table(t)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_acctbal"))
          .select(lit(t).as("table_name"), col("n_rows"), col("sum_acctbal"))
        stats("customer").unionByName(stats("customer2"))
      },
      Some("""SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer WHERE c_custkey <= 1000
        UNION ALL
        SELECT 'customer2', COUNT(*),
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        FROM customer WHERE c_custkey <= 1000 AND c_custkey % 5 <> 0"""),
      "zero-copy shallow clone: metadata-only commit shares immutable " +
        "files, copy-on-write divergence leaves the source untouched, " +
        "vacuum retains any file either table still references"),

    // Schema evolution without rewrites: ALTER COLLECTION ADD COLUMN
    // commits the widened schema to the log only (pinned in-query: one
    // version bump, physical file list unchanged). Reads pin to the
    // stored schema, so pre-evolution files null-fill the column, and a
    // widening append keeps the stored schema in sync in its own
    // commit. At 100 TB the alternative is rewriting the table.
    Q("q145_schema_evolution",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q145").toString
        val db = GraftDatabase(s, "q145", base)
          .defineTable(TableDef("orders", "o_orderkey"))
        val src = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        db.insert("orders", src.filter(col("o_orderkey") % 7 === 0))
        val files0 = db.liveFiles("orders")
        val v0 = db.logVersion
        db.sql("ALTER COLLECTION orders ADD COLUMN o_tier BIGINT")
        require(db.logVersion == v0 + 1 && db.liveFiles("orders") == files0,
          "ADD COLUMN must be one metadata-only commit (no file touched)")
        db.insert("orders", src.filter(col("o_orderkey") % 7 === 3)
          .withColumn("o_tier", (col("o_custkey") % 3).cast("long")))
        db.table("orders")
          .groupBy(col("o_tier"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_custkey").cast("decimal(18,0)"))
              .cast("double").as("sum_cust"))
      },
      Some("""SELECT CAST(NULL AS BIGINT) AS o_tier, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_custkey AS DECIMAL(18,0))) AS DOUBLE) AS sum_cust
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT CAST(o_custkey % 3 AS BIGINT), COUNT(*),
          CAST(SUM(CAST(o_custkey AS DECIMAL(18,0))) AS DOUBLE)
        FROM orders WHERE o_orderkey % 7 = 3 GROUP BY 1"""),
      "metadata-only schema evolution: ADD COLUMN touches zero data " +
        "files, pre-evolution rows null-fill on pinned reads, widening " +
        "appends auto-extend the log-held schema"),

    // CDC replication over the change feed: a primary's DML replays
    // onto an independent replica database through changesSince +
    // applyChanges — each batch ONE atomic file-granular commit with an
    // idempotence marker (a replayed batch is a no-op, pinned
    // in-query), and the replica must converge EXACTLY (multiset diff
    // = 0, also pinned). The oracle replays the same chain
    // relationally.
    Q("q146_cdc_replication",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val basePrimary =
          java.nio.file.Files.createTempDirectory("graft-q146p").toString
        val baseReplica =
          java.nio.file.Files.createTempDirectory("graft-q146r").toString
        val primary = GraftDatabase(s, "q146p", basePrimary)
          .defineTable(TableDef("orders", "o_orderkey"))
        val replica = GraftDatabase(s, "q146r", baseReplica)
          .defineTable(TableDef("orders", "o_orderkey"))
        val src = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        primary.insert("orders", src.filter(col("o_orderkey") % 12 === 0))
        val (boot, c1) = primary.changesSince("orders", 0L)
        replica.applyChanges("orders", boot, "q146", 1L)
        primary.updateMany("orders", col("o_custkey") % 5 === 0,
          Map("o_totalprice" -> (col("o_totalprice") + 50)))
        primary.delete("orders", col("o_custkey") % 9 === 0)
        primary.insert("orders", src.filter(col("o_orderkey") % 12 === 3))
        val (feed, _) = primary.changesSince("orders", c1)
        replica.applyChanges("orders", feed, "q146", 2L)
        val v = replica.logVersion
        require(!replica.applyChanges("orders", feed, "q146", 2L) &&
          replica.logVersion == v,
          "a replayed batch must be an idempotent no-op")
        // multiset equality in ONE query (per-query fixed cost is the
        // bottleneck at this scale): signed counts over the union net
        // to zero for every row iff the tables are multiset-equal
        require(replica.table("orders").withColumn("_s", lit(1L))
          .unionByName(primary.table("orders").withColumn("_s", lit(-1L)))
          .groupBy(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .agg(sum(col("_s")).as("_net")).filter(col("_net") =!= 0L)
          .isEmpty, "replica must converge to the primary exactly")
        replica.table("orders")
          .groupBy((col("o_custkey") % 10).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""WITH base AS (
          SELECT o_orderkey, o_custkey, o_totalprice AS p
          FROM orders WHERE o_orderkey % 12 = 0),
        upd AS (
          SELECT o_orderkey, o_custkey,
            CASE WHEN o_custkey % 5 = 0 THEN p + 50 ELSE p END AS p
          FROM base),
        del AS (SELECT * FROM upd WHERE o_custkey % 9 <> 0),
        fin AS (
          SELECT * FROM del
          UNION ALL
          SELECT o_orderkey, o_custkey, o_totalprice AS p
          FROM orders WHERE o_orderkey % 12 = 3)
        SELECT CAST(o_custkey % 10 AS BIGINT) AS bucket,
          COUNT(*) AS n_rows,
          CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM fin GROUP BY 1"""),
      "CDC replication: change-feed batches apply to an independent " +
        "replica as atomic file-granular idempotent commits — replays " +
        "are no-ops, the replica converges exactly (both pinned " +
        "in-query), apply cost tracks batch churn"),

    // Data skipping from LOG-HELD file stats: per-file column min/max
    // harvested once from each staged file's own footer ride the commit
    // (FileStatsUtil / TxLog.Sta), so a range probe prunes the FILE
    // LIST from metadata alone — zero footer opens at read time, the
    // step beyond q137's row-group pruning (which still opens every
    // footer). The range-clustered layout makes per-file ranges
    // disjoint; the gate pins that a ~20%-of-keyspace probe scans at
    // most half the files. Results must equal the unpruned filter.
    Q("q147_data_skipping",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q147").toString
        val db = GraftDatabase(s, "q147", base)
          .defineTable(TableDef("part", "p_partkey"))
        val src = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        db.insert("part", src.repartitionByRange(8, col("p_partkey")))
        val n = db.liveFiles("part").size
        val mx = src.agg(max(col("p_partkey"))).head().getLong(0)
        val (lo, hi) = (mx / 10, 3 * mx / 10)
        val out = db.seek("part", "p_partkey", lo, hi)
        require(out.inputFiles.length <= math.max(1, n / 2),
          s"log-held stats must prune the file list: scanned " +
            s"${out.inputFiles.length} of $n files for a 20% range probe")
        out.groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("p_retailprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""WITH b AS (SELECT MAX(p_partkey) AS mx FROM part)
        SELECT p_brand, COUNT(*) AS n_rows,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part, b
        WHERE p_partkey BETWEEN (mx // 10) AND (3 * mx // 10)
        GROUP BY 1"""),
      "data skipping from log-held per-file min/max: file-list pruning " +
        "with zero read-time footer I/O (the at-1M-files difference " +
        "from row-group pruning), harvested once at stage time, " +
        "conservative for stat-less files"),

    // RESTORE: metadata-only rollback. A table mutates through delete +
    // transform-update, then rolls back to its first version — pinned
    // in-query as ZERO data movement (the restored binding IS the
    // original physical file list) and as history-preserving (the
    // undone state stays readable AS OF its version). The oracle is
    // simply the base data: a correct restore erases the mutations.
    Q("q148_restore",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q148").toString
        val db = GraftDatabase(s, "q148", base)
          .defineTable(TableDef("supplier", "s_suppkey"))
        db.insert("supplier", Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal")))
        val v1 = db.logVersion
        val files1 = db.liveFiles("supplier")
        db.delete("supplier", col("s_suppkey") % 3 === 0)
        db.updateMany("supplier", col("s_suppkey") % 5 === 0,
          Map("s_acctbal" -> (col("s_acctbal") + 1000)))
        val vMutated = db.logVersion
        db.sql(s"RESTORE supplier TO VERSION $v1")
        require(db.liveFiles("supplier") == files1,
          "restore must rebind the ORIGINAL physical files (zero copies)")
        require(db.tableAt("supplier", vMutated).get.count() <
          db.table("supplier").count(),
          "the undone state must stay time-travelable")
        db.table("supplier")
          .groupBy((col("s_nationkey") % 5).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("s_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_acctbal"))
      },
      Some("""SELECT CAST(s_nationkey % 5 AS BIGINT) AS bucket,
          COUNT(*) AS n_rows,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM supplier GROUP BY 1"""),
      "metadata-only RESTORE: rollback rebinds the historical file list " +
        "as a NEW commit (O(1) in data, history stays time-travelable, " +
        "schema + stats return with the version)"),

    // AUTOMATIC data skipping — q147 with the seek() call deleted. A
    // plain `db.sql WHERE BETWEEN` (and any `.filter`) auto-prunes its
    // file list through the session-wide StatsPruneRule, the analog of
    // LiteDB's optimizer choosing an index per AND-term with NO user
    // hint (QueryOptimization.cs:168-294). Gate: the default read path
    // provably scans <= half the files for a ~20% range probe; the
    // residual filter still runs, so results hash-match the oracle.
    Q("q149_auto_skipping",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q149").toString
        val db = GraftDatabase(s, "q149", base)
          .defineTable(TableDef("part", "p_partkey"))
        val src = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        db.insert("part", src.repartitionByRange(8, col("p_partkey")))
        val n = db.liveFiles("part").size
        val mx = src.agg(max(col("p_partkey"))).head().getLong(0)
        val (lo, hi) = (mx / 10, 3 * mx / 10)
        // the DEFAULT read path: no seek(), no hint — just SQL
        val rows = db.sql("SELECT p_partkey, p_brand, p_retailprice " +
          s"FROM part WHERE p_partkey BETWEEN $lo AND $hi")
        require(rows.inputFiles.length <= math.max(1, n / 2),
          s"auto data skipping must prune the DEFAULT read path: scanned " +
            s"${rows.inputFiles.length} of $n files for a 20% range probe")
        rows.groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("p_retailprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""WITH b AS (SELECT MAX(p_partkey) AS mx FROM part)
        SELECT p_brand, COUNT(*) AS n_rows,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part, b
        WHERE p_partkey BETWEEN (mx // 10) AND (3 * mx // 10)
        GROUP BY 1"""),
      "automatic data skipping: the session-wide optimizer rule prunes " +
        "file lists from log-held stats for ANY filter over a graft " +
        "table — db.sql / .filter / find hit the pruned list with no " +
        "seek() call (the LiteDB auto-optimizer analog)"),

    // SQL MERGE INTO — the set-semantics generalization of the
    // reference's per-document Upsert (TableCollection.cs:1195-1240
    // resolves each incoming doc to update-or-insert by PK): ANSI
    // clause order (first hit wins), conditional UPDATE/DELETE/INSERT,
    // ONE file-granular commit. DuckDB 1.0 has no MERGE statement, so
    // the oracle recomputes the merged state as the UNION ALL of its
    // three branches (updated-matched / passthrough-unmatched-target /
    // inserted-unmatched-source).
    Q("q150_merge_into",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q150").toString
        val db = GraftDatabase(s, "q150", base)
          .defineTable(TableDef("customer", "c_custkey"))
          .defineTable(TableDef("src", "k"))
        db.insert("customer", Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")))
        // per-customer spend; every 3rd key shifted out of the customer
        // range so the merge exercises NOT MATCHED inserts too
        db.insert("src", Tables.load(s, dir, "orders")
          .groupBy((col("o_custkey") +
            when(col("o_custkey") % 3 === 0, lit(1000000L)).otherwise(lit(0L)))
            .as("k"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("spend")))
        val v0 = db.logVersion
        db.sql("MERGE INTO customer USING src ON customer.c_custkey = src.k " +
          "WHEN MATCHED AND src.spend >= 200000 THEN UPDATE SET c_acctbal = src.spend " +
          "WHEN MATCHED THEN DELETE " +
          "WHEN NOT MATCHED THEN INSERT (c_custkey, c_acctbal) VALUES (src.k, src.spend)")
        require(db.logVersion == v0 + 1,
          "MERGE must land as exactly ONE commit")
        db.table("customer")
          .groupBy(coalesce(col("c_mktsegment"), lit("(new)")).as("seg"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_bal"))
      },
      Some("""WITH src AS (
          SELECT o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1000000 ELSE 0 END AS k,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY 1
        ), merged AS (
          SELECT c.c_custkey, s.spend AS c_acctbal, c.c_mktsegment
            FROM customer c JOIN src s ON c.c_custkey = s.k
            WHERE s.spend >= 200000
          UNION ALL
          SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment
            FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
            WHERE s.k IS NULL
          UNION ALL
          SELECT s.k, s.spend, NULL
            FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
            WHERE c.c_custkey IS NULL
        )
        SELECT COALESCE(c_mktsegment, '(new)') AS seg, COUNT(*) AS n_rows,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM merged GROUP BY 1"""),
      "SQL MERGE INTO (conditional UPDATE/DELETE/INSERT, first-hit-wins " +
        "clause order, ANSI multi-match check) landing as ONE " +
        "file-granular commit — the set form of TableCollection.Upsert"),

    // Explicit enumerable lambdas — the reference's MAP/FILTER/SORT
    // function-call form (`BsonExpressionParser.cs:1166-1280`, `@` is
    // the current item) lowered to Spark transform/filter/array_sort.
    // Integer/max aggregates only: no float-sum order hazards.
    Q("q152_lambda_fns",
      (s, dir) => graft.query.LiteSql(s, dir).run(
        "SELECT $.label, COUNT(*) AS n_vecs, " +
          "CAST(SUM(SIZE(FILTER($.embedding => @ > 0.5))) AS BIGINT) AS n_big, " +
          "CAST(SUM(SIZE(FILTER(MAP($.embedding => @ * 2) => @ > 1.0))) AS BIGINT) AS n_big2, " +
          "CAST(MAX(SORT($.embedding => @, -1)[0]) AS DOUBLE) AS max_v " +
          "FROM embeddings GROUP BY $.label"),
      Some("""SELECT label, COUNT(*) AS n_vecs,
        CAST(SUM(LEN(LIST_FILTER(embedding, x -> x > 0.5))) AS BIGINT) AS n_big,
        CAST(SUM(LEN(LIST_FILTER(LIST_TRANSFORM(embedding, x -> x * 2), x -> x > 1.0))) AS BIGINT) AS n_big2,
        CAST(MAX(LIST_SORT(embedding, 'DESC')[1]) AS DOUBLE) AS max_v
        FROM embeddings GROUP BY 1"""),
      "explicit MAP/FILTER/SORT(arr => expr) lambda syntax " +
        "(BsonExpressionParser.cs:1166-1280) lowered to Spark " +
        "higher-order functions; SORT uses a null-lowest comparator"),

    // Deletion vectors (merge-on-read point deletes): a 3-row delete
    // publishes tiny PK-list sidecars and rewrites NOTHING — at 100 TB
    // that is a few KB instead of copying 128 MB files. Gates: the live
    // data-file set is IDENTICAL before and after, and the delete is
    // one commit; reads subtract the mask, hash-matching the oracle.
    Q("q151_deletion_vectors",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q151").toString
        val db = GraftDatabase(s, "q151", base)
          .defineTable(TableDef("supplier", "s_suppkey"))
        db.insert("supplier", Tables.load(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
          .repartitionByRange(6, col("s_suppkey")))
        val before = db.liveFiles("supplier").sorted
        val v0 = db.logVersion
        val n = db.deleteVectorized("supplier",
          col("s_suppkey").isin(2, 5, 7))
        require(n == 3, s"expected 3 masked rows, got $n")
        require(db.logVersion == v0 + 1,
          "a deletion-vector delete must be exactly ONE commit")
        require(db.liveFiles("supplier").sorted == before,
          "a deletion-vector delete must publish ZERO rewritten data " +
            "files — the live binding must be byte-identical")
        db.table("supplier").groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("s_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_bal"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n_rows,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM supplier WHERE s_suppkey NOT IN (2, 5, 7)
        GROUP BY 1"""),
      "deletion vectors: merge-on-read point deletes stage a per-file " +
        "PK-list sidecar masked at every read surface (table/sql/seek/" +
        "time travel/change feed), reconciled by OPTIMIZE, rebound by " +
        "RESTORE, vacuum-safe — zero data-file rewrites"),

    // OPTIMIZE ZORDER BY: Morton-interleave clustering makes per-file
    // [min,max] boxes tight in BOTH dimensions, so the automatic stats
    // pruning answers a 2-D box probe from a few files — where the
    // unclustered layout provably cannot prune AT ALL (pinned
    // in-query). Gates: pre-cluster probe scans EVERY file; post-
    // cluster the same probe scans ≤ 1/4 of them; results hash-match.
    Q("q153_zorder_skipping",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q153").toString
        val db = GraftDatabase(s, "q153", base)
          .defineTable(TableDef("ev", "event_id"))
        val src = Tables.load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        db.insert("ev", src.repartition(8)) // deliberately unclustered
        val bs = src.agg(min(col("user_id")), max(col("user_id")),
          min(col("value")), max(col("value"))).head()
        val (ulo, uhi) = (bs.getLong(0) + (bs.getLong(1) - bs.getLong(0)) * 2 / 5,
          bs.getLong(0) + (bs.getLong(1) - bs.getLong(0)) * 3 / 5)
        val (vlo, vhi) = (bs.getDouble(2) + 0.4 * (bs.getDouble(3) - bs.getDouble(2)),
          bs.getDouble(2) + 0.6 * (bs.getDouble(3) - bs.getDouble(2)))
        def probe() = db.sql("SELECT event_id, user_id, value FROM ev " +
          s"WHERE user_id BETWEEN $ulo AND $uhi AND value >= $vlo AND value <= $vhi")
        val n0 = db.liveFiles("ev").size
        require(probe().inputFiles.length == n0,
          "the unclustered layout must be UNABLE to prune the 2-D box " +
            s"(scanned ${probe().inputFiles.length} of $n0)")
        // cluster into ~16 right-sized files on the (user_id, value) grid
        val bytes = db.liveFiles("ev")
          .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
        val (_, nAfter) =
          db.optimizeZorder("ev", Seq("user_id", "value"),
            targetBytes = math.max(1L, bytes / 16))
        val scanned = probe().inputFiles.length
        require(scanned <= math.max(2, nAfter / 4),
          s"z-order clustering must make the 2-D box prune: scanned " +
            s"$scanned of $nAfter files for a 20%x20% box")
        probe().groupBy((col("user_id") % 7).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("double").as("sum_v"))
      },
      Some("""WITH b AS (
          SELECT MIN(user_id) AS ulo0, MAX(user_id) AS uhi0,
                 MIN(value) AS vlo0, MAX(value) AS vhi0 FROM events)
        SELECT CAST(user_id % 7 AS BIGINT) AS bucket, COUNT(*) AS n_rows,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        FROM events, b
        WHERE user_id BETWEEN ulo0 + (uhi0 - ulo0) * 2 // 5
                          AND ulo0 + (uhi0 - ulo0) * 3 // 5
          AND value >= vlo0 + 0.4 * (vhi0 - vlo0)
          AND value <= vlo0 + 0.6 * (vhi0 - vlo0)
        GROUP BY 1"""),
      "OPTIMIZE ZORDER BY (a, b): Morton-interleave clustering rewrite " +
        "— tight per-file min/max boxes in BOTH dimensions, so the " +
        "automatic stats pruning answers 2-D box probes from a few " +
        "files (unclustered layout provably prunes nothing, pinned)"),

    // Typed TIMESTAMP data skipping — the engine's signature query
    // shape (`TimeSeries/TsCollection.cs:130-185` range read) on the
    // DEFAULT path: a plain SQL `WHERE ts BETWEEN <timestamp literals>`
    // over a time-clustered log table prunes its file list from the
    // log-held stats with no seek() and no numeric twin. The harvest
    // records timestamp bounds micros-normalized under a typed kind
    // ("tsu"), so foreign units (millis/nanos) and NTZ columns stay
    // sound; staged writes use TIMESTAMP_MICROS (INT96 footers carry
    // no stats at all).
    Q("q154_ts_skipping",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q154").toString
        val db = GraftDatabase(s, "q154", base)
          .defineTable(TableDef("log", "event_id"))
        val src = Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        db.insert("log", src.repartitionByRange(8, col("ts")))
        val n = db.liveFiles("log").size
        val b = src.agg(min(unix_micros(col("ts"))),
          max(unix_micros(col("ts")))).head()
        val (mn, mx) = (b.getLong(0), b.getLong(1))
        val (lo, hi) = (mn + (mx - mn) / 10, mn + 3 * (mx - mn) / 10)
        // plain SQL with TIMESTAMP literals — no seek(), no hint
        val rows = db.sql("SELECT event_id, ts, event_type, value FROM log " +
          s"WHERE ts BETWEEN timestamp_micros(${lo}L) " +
          s"AND timestamp_micros(${hi}L)")
        require(rows.inputFiles.length <= math.max(1, n / 2),
          "typed timestamp stats must prune the DEFAULT read path: " +
            s"scanned ${rows.inputFiles.length} of $n files for a ~20% " +
            "time range")
        rows.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("double").as("sum_v"),
            max(unix_micros(col("ts"))).as("max_ts_us"))
      },
      Some("""WITH b AS (
          SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events)
        SELECT event_type, COUNT(*) AS n_rows,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v,
          MAX(epoch_us(ts)) AS max_ts_us
        FROM events, b
        WHERE epoch_us(ts) BETWEEN mn + (mx - mn) // 10
                               AND mn + 3 * (mx - mn) // 10
        GROUP BY 1"""),
      "typed timestamp data skipping: plain SQL time-range predicates " +
        "prune file lists from micros-normalized log-held stats (the " +
        "TsCollection range-read shape with zero footer I/O at plan " +
        "time; unit- and NTZ-safe by kind-tagged stats)"),

    // TIMESTAMP AS OF — wall-clock time travel. Every commit stamps
    // its version file (TxLog.Cts); `FROM t TIMESTAMP AS OF '<ts>'`
    // resolves to the latest version at or before the instant
    // (writer-clock skew monotonized, sub-retention refused — see
    // LakehouseOpsSpec). Here two timestamp-resolved snapshots of one
    // table JOIN in a single statement; the oracle recomputes the
    // known per-row delta, so the result is wall-clock-independent.
    Q("q155_timestamp_as_of",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q155").toString
        val db = GraftDatabase(s, "q155", base)
          .defineTable(TableDef("cust", "c_custkey"))
        db.insert("cust", Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")))
        val t1 = db.commitTimeOf(db.logVersion).get
        // the next commit must stamp a strictly later millisecond
        while (System.currentTimeMillis <= t1.toEpochMilli)
          Thread.sleep(1)
        db.updateMany("cust", col("c_mktsegment") === "BUILDING",
          Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))))
        val t2 = db.commitTimeOf(db.logVersion).get
        db.sql("SELECT b.c_mktsegment AS seg, COUNT(*) AS n_rows, " +
          "CAST(SUM(CAST(b.c_acctbal - a.c_acctbal AS DECIMAL(18,2))) " +
          "AS DOUBLE) AS sum_delta " +
          s"FROM cust TIMESTAMP AS OF '$t1' a " +
          s"JOIN cust TIMESTAMP AS OF '$t2' b ON a.c_custkey = b.c_custkey " +
          "GROUP BY b.c_mktsegment")
      },
      Some("""SELECT c_mktsegment AS seg, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
            THEN CAST(100.0 AS DECIMAL(18,2))
            ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_delta
        FROM customer GROUP BY 1"""),
      "TIMESTAMP AS OF wall-clock time travel: commit-stamped version " +
        "files resolve instants to versions (skew-monotonized, " +
        "retention-guarded), and two timestamp-resolved snapshots " +
        "join in one SQL statement"),

    // Parameterized queries — the reference's `db.Execute(sql, args)`
    // overloads (PARAMETER_PATH `@name`,
    // `BsonExpressionOperators.cs:219`): parameters lower to
    // type-correct literals BEFORE parsing, the injection-safe path a
    // query builder calls. The oracle inlines the same values
    // textually (DuckDB runs plain SQL), so a binding bug — wrong
    // quoting, wrong type, token left unbound — hash-mismatches.
    Q("q156_parameterized",
      (s, dir) => graft.query.LiteSql(s, dir).run(
        "SELECT $.o_orderpriority AS pri, COUNT(*) AS n_orders, " +
          "CAST(SUM(CAST($.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
          "AS sum_price " +
          "FROM orders WHERE $.o_orderstatus = @st " +
          "AND $.o_totalprice >= @min AND $.o_orderpriority != @skip " +
          "GROUP BY pri",
        Map[String, Any]("st" -> "F", "min" -> 50000.0,
          "skip" -> "4-NOT SPECIFIED")),
      Some("""SELECT o_orderpriority AS pri, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
          AND o_orderpriority != '4-NOT SPECIFIED'
        GROUP BY 1"""),
      "parameterized SQL (@name / @0 binding, Execute(sql, args) " +
        "parity): values lower to type-correct literals before " +
        "parsing — injection-safe by construction, verified against " +
        "the textually-inlined oracle"),

    // MERGE with the full three-family clause set, including the
    // lakehouse-standard `WHEN NOT MATCHED BY SOURCE` (full-sync
    // replication in one statement): matched rows update
    // conditionally, unmatched source rows insert, unmatched TARGET
    // rows route first-hit-wins through a conditional DELETE then an
    // UPDATE. DuckDB has no MERGE, so the oracle recomputes the merged
    // state branch by branch.
    Q("q157_merge_sync",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q157").toString
        val db = GraftDatabase(s, "q157", base)
          .defineTable(TableDef("customer", "c_custkey"))
          .defineTable(TableDef("src", "k"))
        db.insert("customer", Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")))
        db.insert("src", Tables.load(s, dir, "orders")
          .groupBy((col("o_custkey") +
            when(col("o_custkey") % 3 === 0, lit(1000000L)).otherwise(lit(0L)))
            .as("k"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("spend")))
        val v0 = db.logVersion
        db.sql("MERGE INTO customer USING src ON customer.c_custkey = src.k " +
          "WHEN MATCHED AND src.spend >= 200000 THEN UPDATE SET c_acctbal = src.spend " +
          "WHEN NOT MATCHED THEN INSERT (c_custkey, c_acctbal) VALUES (src.k, src.spend) " +
          "WHEN NOT MATCHED BY SOURCE AND customer.c_acctbal < 0 THEN DELETE " +
          "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_acctbal = 0")
        require(db.logVersion == v0 + 1,
          "three-family MERGE must land as exactly ONE commit")
        db.table("customer")
          .groupBy(coalesce(col("c_mktsegment"), lit("(new)")).as("seg"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("c_acctbal").cast("decimal(18,2)"))
              .cast("double").as("sum_bal"))
      },
      Some("""WITH src AS (
          SELECT o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1000000 ELSE 0 END AS k,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY 1
        ), merged AS (
          SELECT c.c_custkey,
                 CASE WHEN s.spend >= 200000 THEN s.spend
                      ELSE c.c_acctbal END AS c_acctbal,
                 c.c_mktsegment
            FROM customer c JOIN src s ON c.c_custkey = s.k
          UNION ALL
          SELECT s.k, s.spend, NULL
            FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
            WHERE c.c_custkey IS NULL
          UNION ALL
          SELECT c.c_custkey, 0.0, c.c_mktsegment
            FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
            WHERE s.k IS NULL AND c.c_acctbal >= 0
        )
        SELECT COALESCE(c_mktsegment, '(new)') AS seg, COUNT(*) AS n_rows,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM merged GROUP BY 1"""),
      "MERGE WHEN NOT MATCHED BY SOURCE (UPDATE/DELETE, first-hit-wins " +
        "within the family): full-sync replication in one " +
        "file-granular commit, with the ANSI cardinality check folded " +
        "into a single aggregation pass"),

    // The rest of the column-DDL lifecycle, all metadata-only (one SCH
    // commit each, zero data movement — pinned in-query by file-list +
    // version checks): RENAME COLUMN maps the new logical name to the
    // stable physical name (old and new files read back as one), ALTER
    // COLUMN TYPE widens losslessly (the parquet reader upcasts narrow
    // physical data under the wide pin), DROP COLUMN tombstones the
    // field, and a re-added NAMESAKE maps to a fresh physical name so
    // old file bytes can never resurrect. Time travel below the DDL
    // still reads the old shape. At 100 TB every one of these is the
    // difference between a metadata commit and rewriting the table.
    Q("q158_column_ddl",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q158").toString
        val db = GraftDatabase(s, "q158", base)
          .defineTable(TableDef("customer", "c_custkey"))
        val src = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
          .withColumn("tier", (col("c_custkey") % 5).cast("int"))
        db.insert("customer", src.filter(col("c_custkey") % 4 === 0))
        val v1 = db.logVersion
        val files0 = db.liveFiles("customer")
        db.sql("ALTER COLLECTION customer RENAME COLUMN c_acctbal TO bal")
        db.sql("ALTER COLLECTION customer ALTER COLUMN tier TYPE BIGINT")
        db.sql("ALTER COLLECTION customer DROP COLUMN c_mktsegment")
        require(db.liveFiles("customer") == files0 &&
          db.logVersion == v1 + 3,
          "rename/widen/drop must be three metadata-only commits")
        db.sql("ALTER COLLECTION customer ADD COLUMN c_mktsegment STRING")
        db.insert("customer", src.filter(col("c_custkey") % 4 === 1)
          .withColumnRenamed("c_acctbal", "bal")
          .withColumn("tier", col("tier").cast("long")))
        db.table("customer").agg(
          count(lit(1)).as("n_rows"),
          sum(col("bal").cast("decimal(18,2)"))
            .cast("double").as("sum_bal"),
          sum(col("tier")).cast("double").as("sum_tier"),
          // the re-added namesake: wave-1 rows MUST be null (no
          // resurrection of the dropped column's file bytes)
          count(col("c_mktsegment")).as("n_seg"),
          lit(db.tableAt("customer", v1).get.columns.mkString(","))
            .as("v1_cols"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
          CAST(SUM(CAST(c_custkey % 5 AS BIGINT)) AS DOUBLE) AS sum_tier,
          COUNT(CASE WHEN c_custkey % 4 = 1 THEN c_mktsegment END) AS n_seg,
          'c_custkey,c_acctbal,c_mktsegment,tier' AS v1_cols
        FROM customer WHERE c_custkey % 4 IN (0, 1)"""),
      "metadata-only RENAME / type-widen / DROP COLUMN: logical→physical " +
        "mapping keeps both file eras readable, tombstones stop namesake " +
        "resurrection, time travel reads the pre-DDL shape"),

    // Null-count data skipping: the stage-time harvest folds per-column
    // null/non-null counts from the footers into the log-held stats, so
    // `IS [NOT] NULL` conjuncts prune file lists on the DEFAULT read
    // path — including the IsNotNull Spark's optimizer inserts under
    // every ordinary comparison. An all-null file has NO min/max entry
    // (nothing to bound), so before the counts it could never prune;
    // gated in-query at ≤ half the files.
    Q("q159_null_skipping",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q159").toString
        val db = GraftDatabase(s, "q159", base)
          .defineTable(TableDef("orders", "o_orderkey"))
        val src = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        // wave A: the note column is ENTIRELY null; wave B: never null
        db.insert("orders", src.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_note", lit(null).cast("string")))
        db.insert("orders", src.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_note",
            concat(lit("n"), col("o_custkey").cast("string"))))
        val n = db.liveFiles("orders").size
        val notNull = db.sql(
          "SELECT o_custkey, o_totalprice FROM orders WHERE o_note IS NOT NULL")
        require(notNull.inputFiles.length <= math.max(1, n / 2),
          s"IS NOT NULL must skip the all-null files: scanned " +
            s"${notNull.inputFiles.length} of $n")
        val isNull = db.sql(
          "SELECT o_orderkey FROM orders WHERE o_note IS NULL")
        require(isNull.inputFiles.length <= math.max(1, n / 2),
          s"IS NULL must skip the zero-null files: scanned " +
            s"${isNull.inputFiles.length} of $n")
        notNull.groupBy((col("o_custkey") % 7).as("g"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("sum_price"))
      },
      Some("""SELECT o_custkey % 7 AS g, COUNT(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1"""),
      "null-count data skipping: IS [NOT] NULL conjuncts (and the " +
        "implicit IsNotNull under every comparison) prune file lists " +
        "from log-held footer null counts — all-null files stop " +
        "scanning on ordinary predicates"),

    // MERGE schema evolution (the lakehouse autoMerge): INSERT * with a
    // source carrying a column the target never had widens the target
    // in the SAME single commit — one SCH action extends the pin, the
    // commit stays file-granular (untouched files never rewrite,
    // null-filling the new column on read). Pinned in-query by the
    // one-version gate; the oracle recomputes the merged state
    // relationally.
    Q("q160_merge_automerge",
      (s, dir) => {
        import graft.catalog.GraftDatabase
        import graft.dml.ConstrainedDml.TableDef
        val base = java.nio.file.Files.createTempDirectory("graft-q160").toString
        val db = GraftDatabase(s, "q160", base)
          .defineTable(TableDef("customer", "c_custkey"))
          .defineTable(TableDef("src", "c_custkey"))
        db.insert("customer", Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment")))
        db.insert("src", Tables.load(s, dir, "orders")
          .groupBy((col("o_custkey") +
            when(col("o_custkey") % 3 === 0, lit(1000000L)).otherwise(lit(0L)))
            .as("c_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("spend")))
        val v0 = db.logVersion
        db.sql("MERGE INTO customer USING src " +
          "ON customer.c_custkey = src.c_custkey " +
          "WHEN MATCHED THEN UPDATE SET c_acctbal = src.spend " +
          "WHEN NOT MATCHED THEN INSERT *")
        require(db.logVersion == v0 + 1,
          "a schema-widening MERGE must land as exactly ONE commit")
        require(db.table("customer").columns.contains("spend"),
          "INSERT * must auto-merge the source-only column")
        db.table("customer").agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("sum_bal"),
          count(col("spend")).as("n_spend"),
          sum(col("spend").cast("decimal(18,2)"))
            .cast("double").as("sum_spend"))
      },
      Some("""WITH src AS (
          SELECT o_custkey + CASE WHEN o_custkey % 3 = 0 THEN 1000000 ELSE 0 END AS k,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY 1
        ), merged AS (
          SELECT c.c_custkey,
                 CASE WHEN s.k IS NOT NULL THEN s.spend ELSE c.c_acctbal END
                   AS c_acctbal,
                 CAST(NULL AS DOUBLE) AS spend
            FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
          UNION ALL
          SELECT s.k, NULL, s.spend
            FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
            WHERE c.c_custkey IS NULL
        )
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
          COUNT(spend) AS n_spend,
          CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) AS sum_spend
        FROM merged"""),
      "MERGE INSERT * schema evolution: a wider source widens the " +
        "target with one SCH action in the same file-granular commit — " +
        "untouched files never rewrite, null-filling the new column")
  )
}
