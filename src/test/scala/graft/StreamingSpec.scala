package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{ContinuousQueryService, IngestPipeline}

case class PointEvent(key: String, ts: Timestamp, value: Double)

class StreamingSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fanOut writes fact, rollup and audit sinks per micro-batch") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PointEvent]
    mem.addData(
      PointEvent("p1", ts("2024-01-01 00:10:00"), 1.5),
      PointEvent("p1", ts("2024-01-01 00:40:00"), 2.5),
      PointEvent("p2", ts("2024-01-02 10:00:00"), 7.0))
    val q = IngestPipeline.fanOut(mem.toDF(),
      s"$tmp/fact", s"$tmp/rollup", s"$tmp/audit", s"$tmp/ckpt",
      Trigger.AvailableNow())
    q.processAllAvailable(); q.stop()

    val fact = spark.read.parquet(s"$tmp/fact")
    assert(fact.count() == 3)
    assert(fact.columns.contains("date")) // date-partitioned layout
    val rollup = spark.read.parquet(s"$tmp/rollup")
    val p1 = rollup.filter($"key" === "p1").select("n", "total")
      .as[(Long, Double)].collect().toSeq
    assert(p1 == Seq((2L, 4.0))) // both p1 events in the same hour window
    val audit = spark.read.parquet(s"$tmp/audit")
    assert(audit.count() == 3)
    assert(audit.select("hash").distinct().count() == 3)
  }

  test("hourlyAgg with watermark aggregates by event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PointEvent]
    val out = IngestPipeline.hourlyAgg(mem.toDF())
    val q = out.writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    mem.addData(
      PointEvent("k", ts("2024-01-01 05:10:00"), 1.0),
      PointEvent("k", ts("2024-01-01 05:50:00"), 2.0),
      PointEvent("k", ts("2024-01-01 06:05:00"), 10.0))
    q.processAllAvailable()
    val rows = spark.table("hourly_out")
      .select(col("window_start").cast("string"), $"n", $"total")
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 05:00:00", 2L, 3.0),
      ("2024-01-01 06:00:00", 1L, 10.0)))
  }

  test("dedupWithinWatermark drops exact (key, ts) duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PointEvent]
    val out = IngestPipeline.dedupWithinWatermark(mem.toDF())
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData(
      PointEvent("k", ts("2024-01-01 05:10:00"), 1.0),
      PointEvent("k", ts("2024-01-01 05:10:00"), 1.0), // dup
      PointEvent("k", ts("2024-01-01 05:11:00"), 2.0))
    q.processAllAvailable()
    assert(spark.table("dedup_out").count() == 2)
    q.stop()
  }

  test("dedupByContent drops same-fingerprint docs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = IngestPipeline.dedupByContent(
      mem.toDF().toDF("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("cdedup_out")
      .outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 05:00:00"), "the quick brown fox"),
      (2L, ts("2024-01-01 05:00:10"), "THE  quick   Brown fox"), // same fp
      (3L, ts("2024-01-01 05:00:20"), "something else"))
    q.processAllAvailable()
    // second batch: a re-send of doc 1's content within the watermark
    mem.addData((4L, ts("2024-01-01 05:01:00"), "the quick brown fox"))
    q.processAllAvailable()
    val ids = spark.table("cdedup_out").select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
    q.stop()
  }

  test("curationGate admits only novel, quality-passing, non-dup docs") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // >= 50 words, mean word length in [3,10], >= 2 Gopher stopwords
    val goodText =
      ("the quality corpus of training data and documents flow " * 6).trim
    val knownText =
      ("known document in the store of archived and curated records " * 6).trim
    val shortText = "too short the of"
    val storeFps = spark.createDataset(Seq(knownText))(
      org.apache.spark.sql.Encoders.STRING).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = IngestPipeline.curationGate(
      mem.toDF().toDF("doc_id", "ts", "text"), storeFps)
    val q = out.writeStream.format("memory").queryName("curation_out")
      .outputMode("append").start()
    mem.addData(
      (1L, ts("2024-01-01 05:00:00"), goodText),
      (2L, ts("2024-01-01 05:00:10"), knownText), // already in the store
      (3L, ts("2024-01-01 05:00:20"), shortText), // fails word-count rule
      (4L, ts("2024-01-01 05:00:30"), goodText)) // in-stream duplicate of 1
    q.processAllAvailable()
    val rows = spark.table("curation_out")
      .select("doc_id", "keep", "novel", "admit").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L)) // 4 never survives dedup
    assert(rows(1L) == ((true, true, true)))
    assert(rows(2L) == ((true, false, false))) // quality ok, not novel
    assert(rows(3L)._1 == false && rows(3L)._3 == false)
    q.stop()
  }

  test("ivfIngest: streamed embeddings land cell-partitioned, queries match batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.load(spark, Sf0001, "embeddings")
    val cents = e.filter(col("vec_id").between(1, 8))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val rows = e.filter(col("vec_id") > 8).limit(100)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qv = e.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-stream")
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = IngestPipeline.ivfIngest(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, s"$dir/layout", s"$dir/ckpt")
    mem.addData(rows.take(50): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(50): _*)
    q.processAllAvailable()
    q.stop()
    val layout = spark.read.parquet(s"$dir/layout")
    assert(layout.count() == 100)
    // streamed cells == batch cells for every vector
    val batchCells = graft.operators.Similarity.ivfAssign(
      e.filter(col("vec_id") > 8).limit(100), "vec_id", "embedding", cents)
      .select(col("vec_id"), col("cell").as("bcell"))
    assert(layout.join(batchCells, "vec_id")
      .filter(col("cell") =!= col("bcell")).count() == 0)
    // the probe over the streamed layout returns the batch answer
    val fromStream = graft.operators.Similarity.ivfTopK(
      layout, "vec_id", "embedding", qv, k = 5, cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromBatch = graft.operators.Similarity.ivfTopK(
      e.filter(col("vec_id") > 8).limit(100), "vec_id", "embedding", qv,
      k = 5, cents, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromStream == fromBatch)
  }

  test("StreamingSketch accumulates across micro-batches to the exact " +
      "batch-built sketch (merge law) and keeps est >= exact") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val sk = new graft.streaming.StreamingSketch(depth = 4, width = 64)
    val q = sk.attach(mem.toDF().toDF("doc_id", "text"), "text", "sketch_in")
    mem.addData((1L, "alpha beta alpha"), (2L, "beta gamma"))
    q.processAllAvailable()
    mem.addData((3L, "alpha delta delta epsilon"))
    q.processAllAvailable()
    q.stop()
    // merge law: streaming accumulator == one batch sketch of all docs
    val allDocs = Seq("alpha beta alpha", "beta gamma",
      "alpha delta delta epsilon").toDF("text")
    val wholeCounts = allDocs
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val whole = graft.operators.Sketches
      .cmsBuild(wholeCounts, "k", "cnt", 4, 64)
      .as[(Int, Int, Long)].collect().toSet
    val streamed = sk.sketch(spark).as[(Int, Int, Long)].collect().toSet
    assert(streamed == whole)
    // one-sided contract against exact counts of the whole stream
    val est = sk.estimate(wholeCounts.select("k"), "k")
      .as[(String, Long)].collect().toMap
    val exact = wholeCounts.as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) => assert(est(k) >= c, s"$k: ${est(k)} < $c") }
    assert(exact("alpha") == 3L && est("alpha") >= 3L)
  }

  test("partitionByWriteRules splits rejected priority writes to dead-letter") {
    import graft.model.IotValue._
    val writes = Seq(
      (1L, 1, 0),                     // slot 1 without AllowManualOperator -> reject
      (2L, 1, AllowManualOperator),   // allowed
      (3L, 5, Priority9Only),         // non-9 under Priority9Only -> reject
      (4L, 9, Priority9Only),         // allowed
      (5L, 15, 0)                     // plain default write -> allowed
    ).toDF("id", "priority", "flags")
    val (ok, rejected) = graft.streaming.IngestPipeline.partitionByWriteRules(writes)
    assert(ok.select("id").as[Long].collect().toSet == Set(2L, 4L, 5L))
    assert(rejected.select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("sessionAgg groups events into inactivity-gap session windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PointEvent]
    val q = IngestPipeline.sessionAgg(mem.toDF(), gap = "10 minutes")
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    mem.addData(
      PointEvent("k", ts("2024-01-01 00:00:00"), 1.0),
      PointEvent("k", ts("2024-01-01 00:05:00"), 2.0),  // same session
      PointEvent("k", ts("2024-01-01 01:00:00"), 10.0)) // new session
    q.processAllAvailable()
    val rows = spark.table("session_out")
      .select(col("session_start").cast("string"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 00:00:00", 2L, 3.0),
      ("2024-01-01 01:00:00", 1L, 10.0)))
  }

  test("StatefulPointState keeps 17-slot state across micro-batches") {
    import graft.streaming.StatefulPointState
    import graft.streaming.StatefulPointState.{PointState, Write}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Write]
    val out = StatefulPointState.track(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()

    // batch 1: default-slot write
    mem.addData(Write(1L, 15, "10.0", 1000L, 1L))
    q.processAllAvailable()
    // batch 2: higher-priority write for key 1, first write for key 2
    mem.addData(Write(1L, 9, "99.0", 2000L, 2L), Write(2L, 15, "5.0", 500L, 3L))
    q.processAllAvailable()
    // batch 3: STALE write to slot 9 (older ts) must not override
    mem.addData(Write(1L, 9, "1.0", 1500L, 4L))
    q.processAllAvailable()

    val rows = spark.table("state_out").as[PointState].collect()
    q.stop()
    val key1 = rows.filter(_.key == 1L)
    // batch 1 resolves slot 15; batches 2 and 3 resolve slot 9 = 99.0, and
    // the STALE batch-3 write (older ts) must never surface as "1.0"
    assert(key1.map(_.resolved.get).toSet == Set("10.0", "99.0"))
    assert(key1.count(_.priority.contains(9)) == 2)
    assert(!key1.exists(_.resolved.contains("1.0")))
    val key2 = rows.filter(_.key == 2L)
    assert(key2.map(r => (r.resolved.get, r.priority.get)).toSet ==
      Set(("5.0", 15)))
  }

  test("StatefulPointState never resolves slot 17 (query-config slot)") {
    import graft.streaming.StatefulPointState
    import graft.streaming.StatefulPointState.{PointState, Write}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Write]
    val out = StatefulPointState.track(spark, mem.toDS())
    val q = out.writeStream.format("memory").queryName("state17_out")
      .outputMode("update").start()
    // slot 17 stores the query configuration; a populated slot 17 with all
    // other slots empty must resolve to nothing (IotValue.cs Value getter)
    mem.addData(Write(1L, 17, "SELECT cfg", 1000L, 1L))
    q.processAllAvailable()
    mem.addData(Write(1L, 16, "fb", 2000L, 2L))
    q.processAllAvailable()
    val rows = spark.table("state17_out").as[PointState].collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows.map(r => (r.resolved, r.priority)).toSet ==
      Set((None, None), (Some("fb"), Some(16))))
  }

  test("streaming ingest into the log-backed store: foreachBatch + " +
      "insertBatch gives exactly-once table state") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = java.nio.file.Files.createTempDirectory("graft-stream-db").toString
    val db = GraftDatabase(spark, "streamdb", base)
      .defineTable(TableDef("readings", "id"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    mem.addData((1L, 0.5), (2L, 1.5))
    val q = mem.toDF().toDF("id", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        db.insertBatch("readings", batch, "stream-ingest", id); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(db.count("readings") == 2)

    // a crash-replay of batch 0 (foreachBatch's at-least-once contract)
    // must not duplicate rows — the log's txn ledger absorbs it, and
    // the skip happens BEFORE constraint validation (a replayed batch
    // would otherwise fail the PK check against its own earlier rows)
    val replay = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "value")
    assert(!db.insertBatch("readings", replay, "stream-ingest", 0L))
    assert(db.count("readings") == 2)

    // the next batch id continues normally
    assert(db.insertBatch("readings",
      Seq((3L, 2.5)).toDF("id", "value"), "stream-ingest", 1L))
    assert(db.count("readings") == 3)
  }

  test("ContinuousQueryService re-executes and caches lastResult") {
    val svc = new ContinuousQueryService(spark)
    try {
      svc.register(svc.Config(
        "cust_count",
        s => graft.core.Tables.load(s, Sf0001, "customer")
          .agg(count(lit(1)).as("n")),
        intervalMillis = 300L))
      val deadline = System.currentTimeMillis() + 30000
      while (svc.executions("cust_count") < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(svc.executions("cust_count") >= 2, "query did not re-execute")
      assert(svc.lastResult("cust_count").head.getLong(0) == 150L)
      assert(svc.lastError("cust_count").isEmpty)
      assert(svc.registered == Seq("cust_count"))
    } finally svc.shutdown()
  }

  test("ContinuousQueryService caps lastResult at maxResultRows") {
    val svc = new ContinuousQueryService(spark)
    try {
      // an unbounded SELECT * must not cache more than the cap — the
      // driver-OOM guard for registered fact-table queries
      svc.register(svc.Config(
        "all_cust",
        s => graft.core.Tables.load(s, Sf0001, "customer"),
        intervalMillis = 60000L, maxResultRows = 7))
      val deadline = System.currentTimeMillis() + 30000
      while (svc.executions("all_cust") < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(svc.executions("all_cust") >= 1)
      assert(svc.lastResult("all_cust").size == 7)
    } finally svc.shutdown()
  }

  test("ContinuousQueryService surfaces failures via lastError") {
    val svc = new ContinuousQueryService(spark)
    try {
      svc.register(svc.Config(
        "boom", s => s.read.parquet("/no/such/path"), intervalMillis = 200L))
      val deadline = System.currentTimeMillis() + 30000
      while (svc.lastError("boom").isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(svc.lastError("boom").nonEmpty)
      assert(svc.lastResult("boom").isEmpty)
    } finally svc.shutdown()
  }

  test("ContinuousQueryService callback ordering: OnSuccess fires AFTER " +
      "lastResult/executions update (QueryExecutionService.cs parity)") {
    val svc = new ContinuousQueryService(spark)
    try {
      // the callback snapshots the SERVICE state it observed — the
      // reference updates LastResult before invoking OnSuccess, so a
      // callback that reads the registry must see the fresh rows
      val observed = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, Long, Long)]() // (rowsArgValue, cachedValue, executions)
      svc.register(svc.Config(
        "ordered",
        s => { import s.implicits._; Seq(42L).toDF("n") },
        intervalMillis = 200L,
        onSuccess = rows => observed.add((
          rows.head.getLong(0),
          svc.lastResult("ordered").headOption.map(_.getLong(0)).getOrElse(-1L),
          svc.executions("ordered")))))
      val deadline = System.currentTimeMillis() + 30000
      while (observed.size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(observed.size >= 2)
      observed.forEach { case (arg, cached, execs) =>
        assert(arg == 42L && cached == 42L,
          "onSuccess must observe the already-cached result")
        assert(execs >= 1, "executions must be incremented before onSuccess")
      }
    } finally svc.shutdown()
  }

  test("ContinuousQueryService under an intermittent query: OnFailure " +
      "fires after lastError is set, lastResult stays the stale SUCCESS " +
      "value, recovery clears lastError") {
    val svc = new ContinuousQueryService(spark)
    try {
      val mode = new java.util.concurrent.atomic.AtomicInteger(0) // 0 ok,1 fail
      val failuresSeen = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Boolean, Long)]() // (errMsg, lastErrorSetAtCallback, staleVal)
      svc.register(svc.Config(
        "flaky",
        s => {
          import s.implicits._
          if (mode.get() == 1) throw new RuntimeException("tick failed")
          Seq(7L).toDF("n")
        },
        intervalMillis = 150L,
        onFailure = t => failuresSeen.add((
          t.getMessage,
          svc.lastError("flaky").nonEmpty,
          svc.lastResult("flaky").headOption.map(_.getLong(0)).getOrElse(-1L)))))

      val deadline = System.currentTimeMillis() + 30000
      // phase 1: wait for a cached success
      while (svc.executions("flaky") < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(svc.lastResult("flaky").head.getLong(0) == 7L)

      // phase 2: flip to failing; the callback must observe lastError
      // ALREADY set and lastResult still the stale success (the
      // reference keeps LastResult across failed ticks)
      mode.set(1)
      while (failuresSeen.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val (msg, errSet, stale) = failuresSeen.peek()
      assert(msg == "tick failed" && errSet,
        "onFailure must fire after lastError is recorded")
      assert(stale == 7L, "a failed tick must not clobber the cached result")
      assert(svc.lastResult("flaky").head.getLong(0) == 7L)
      val execsAtFailure = svc.executions("flaky")

      // phase 3: recover; lastError clears, executions resume
      mode.set(0)
      while ((svc.lastError("flaky").nonEmpty ||
        svc.executions("flaky") == execsAtFailure) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(svc.lastError("flaky").isEmpty, "recovery must clear lastError")
      assert(svc.executions("flaky") > execsAtFailure)
      assert(svc.lastResult("flaky").head.getLong(0) == 7L)
    } finally svc.shutdown()
  }

  test("VersionOffset equals a checkpoint-restored SerializedOffset of " +
      "the same version (no spurious restart batches)") {
    import graft.streaming.VersionOffset
    import org.apache.spark.sql.execution.streaming.SerializedOffset
    assert(VersionOffset(5L) == SerializedOffset("5"))
    assert(VersionOffset(5L).hashCode == SerializedOffset("5").json.hashCode)
    assert(VersionOffset(5L) != SerializedOffset("6"))
  }

  test("updateMany with a time-dependent predicate pins ONE row set: " +
      "the reported count matches the rows actually updated") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val db = GraftDatabase(spark, "tdep",
      Files.createTempDirectory("graft_tdep").toString)
    db.defineTable(TableDef("t", "id"))
    val now = java.time.Instant.now()
    db.insert("t", (1 to 100).map { i =>
      // half in the past, half a day in the future
      val t0 = if (i % 2 == 0) now.minusSeconds(3600) else now.plusSeconds(86400)
      (i.toLong, java.sql.Timestamp.from(t0), 0L)
    }.toDF("id", "ts", "v"))
    val n = db.updateMany("t", col("ts") < current_timestamp(),
      Map("v" -> lit(1L)))
    assert(n == 50)
    assert(db.table("t").filter(col("v") === 1L).count() == n,
      "the rewrite must update exactly the counted row set")
  }

  test("end-to-end streaming replication: readStream(graft-changes) -> " +
      "writeStream(graft-changes) with exactly-once batches") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val srcBase = Files.createTempDirectory("graft_rep_src").toString
    val dstBase = Files.createTempDirectory("graft_rep_dst").toString
    val ckpt = Files.createTempDirectory("graft_rep_ckpt").toString
    val src = GraftDatabase(spark, "srcdb", srcBase)
    val dst = GraftDatabase(spark, "dstdb", dstBase)
    src.defineTable(TableDef("ev", "id"))
    dst.defineTable(TableDef("ev", "id"))
    src.insert("ev", (1 to 50).map(i => (i.toLong, i * 10L)).toDF("id", "v"))

    def start() = spark.readStream.format("graft-changes")
      .option("baseDir", srcBase).option("name", "srcdb")
      .option("table", "ev").load()
      .writeStream.format("graft-changes")
      .option("baseDir", dstBase).option("name", "dstdb")
      .option("table", "ev").option("appId", "rep1")
      .option("checkpointLocation", ckpt)
      .start()
    def mirrored(): Boolean = dst.table("ev").withColumn("_s", lit(1L))
      .unionByName(src.table("ev").withColumn("_s", lit(-1L)))
      .groupBy(col("id"), col("v")).agg(sum(col("_s")).as("n"))
      .filter(col("n") =!= 0L).isEmpty

    val q = start()
    q.processAllAvailable()
    assert(mirrored(), "bootstrap snapshot must replicate")
    // live churn: update + delete + insert flow through as CDC rows
    src.updateMany("ev", col("id") <= 5, Map("v" -> lit(0L)))
    src.delete("ev", col("id") === 50L)
    src.insert("ev", Seq((51L, 510L)).toDF("id", "v"))
    q.processAllAvailable()
    assert(mirrored(), "live churn must replicate exactly")
    q.stop()
    // commits while the stream is DOWN, then restart from the same
    // checkpoint: only the missed versions apply, exactly once
    src.insert("ev", Seq((52L, 520L)).toDF("id", "v"))
    val q2 = start()
    q2.processAllAvailable()
    assert(mirrored(), "restart must resume and converge exactly once")
    q2.stop()
    assert(dst.table("ev").count() == 51) // 50 - 1 + 2
  }

  test("startingVersion / startingTimestamp begin the feed mid-history") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_startv").toString
    val db = GraftDatabase(spark, "startv", base)
    db.defineTable(TableDef("ev", "id"))
    db.insert("ev", Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    val v1 = db.settledLogVersion
    val t1 = db.commitTimeOf(v1).get
    while (System.currentTimeMillis <= t1.toEpochMilli) Thread.sleep(1)
    db.insert("ev", Seq((3L, 30L)).toDF("id", "v"))
    def run(opts: Map[String, String], name: String): Set[Long] = {
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "startv")
        .option("table", "ev").options(opts).load()
        .filter(col("_change_type") === "insert")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      spark.table(name).select("id").collect().map(_.getLong(0)).toSet
    }
    assert(run(Map("startingVersion" -> v1.toString), "sv_out")
      == Set(3L), "startingVersion=v1 must skip the bootstrap")
    assert(run(Map("startingTimestamp" -> t1.toString), "st_out")
      == Set(3L), "startingTimestamp at v1's stamp resolves to v1")
    assert(run(Map.empty, "sv_all") == Set(1L, 2L, 3L),
      "default still bootstraps the full snapshot")
  }

  test("graft-changes readStream source: windowed aggregate over the " +
      "change feed, exactly-once offsets across restart") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_feed_src").toString
    val ckpt = Files.createTempDirectory("graft_feed_ckpt").toString
    val db = GraftDatabase(spark, "feeddb", base)
    db.defineTable(TableDef("ev", "id"))
    db.insert("ev", Seq(
      (1L, ts("2024-03-01 10:01:00"), 5.0),
      (2L, ts("2024-03-01 10:07:00"), 7.0),
      (3L, ts("2024-03-01 10:12:00"), 9.0)).toDF("id", "ts", "v"))

    def start() = spark.readStream
      .format("graft-changes")
      .option("baseDir", base).option("name", "feeddb").option("table", "ev")
      .load()
      .filter(col("_change_type") === "insert")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .select(col("window.start").as("w"), col("n"), col("sv"))
      .writeStream.format("memory").queryName("feed_agg")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .start()

    val q = start()
    q.processAllAvailable()
    def rows() = spark.table("feed_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2)))
      .toSet
    // bootstrap batch: the initial snapshot arrives as inserts
    assert(rows() == Set(
      ("2024-03-01 10:00:00.0", 2L, 12.0), ("2024-03-01 10:10:00.0", 1L, 9.0)))
    // live commits feed through (insert + a DV delete surfaces too —
    // filtered to inserts here)
    db.insert("ev", Seq((4L, ts("2024-03-01 10:14:00"), 1.0)).toDF("id", "ts", "v"))
    db.deleteVectorized("ev", col("id") === 1L)
    q.processAllAvailable()
    assert(rows() == Set(
      ("2024-03-01 10:00:00.0", 2L, 12.0), ("2024-03-01 10:10:00.0", 2L, 10.0)))
    q.stop()
    // commits while the query is DOWN...
    db.insert("ev", Seq((5L, ts("2024-03-01 10:16:00"), 2.0)).toDF("id", "ts", "v"))
    // ...restart from the SAME checkpoint: only the missed versions
    // replay — no re-bootstrap, no double counting (exactly-once)
    val q2 = start()
    q2.processAllAvailable()
    assert(rows() == Set(
      ("2024-03-01 10:00:00.0", 2L, 12.0), ("2024-03-01 10:10:00.0", 3L, 12.0)),
      "restart must resume from the checkpointed version offset")
    q2.stop()
  }

  // ---- admission control ---------------------------------------------------

  /** Six committed versions, one single-file insert each — the backlog
    * shape a bootstrap/catch-up sees.
    */
  private def backlogDb(name: String): (graft.catalog.GraftDatabase, String) = {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory(s"graft_$name").toString
    val db = GraftDatabase(spark, name, base)
    db.defineTable(TableDef("ev", "id"))
    (1 to 6).foreach(i => db.insert("ev",
      Seq((i.toLong, i * 10L)).toDF("id", "v").repartition(1)))
    assert(db.settledLogVersion == 6L)
    (db, base)
  }

  test("table-as-state streaming dedup (the q163 pattern) is replay-" +
      "idempotent: a full re-drain of already-processed commits admits " +
      "nothing new") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_dedupsrc").toString
    val src = GraftDatabase(spark, "dedupsrc", base)
      .defineTable(TableDef("inbox", "id"))
    // fingerprints overlap ACROSS commits: b repeats in v2, c in v3
    src.insert("inbox", Seq((1L, "a"), (2L, "b")).toDF("id", "fp"))
    src.insert("inbox", Seq((3L, "b"), (4L, "c")).toDF("id", "fp"))
    src.insert("inbox", Seq((5L, "c"), (6L, "d")).toDF("id", "fp"))
    val outBase = Files.createTempDirectory("graft_dedupout").toString
    val outDb = GraftDatabase(spark, "dedupout", outBase)
      .defineTable(TableDef("admitted", "fp"))
    outDb.insert("admitted",
      Seq(("a", "corpus")).toDF("fp", "src")) // 'a' already curated
    def drain(appId: String): Unit = {
      // fresh checkpoint each call: a re-drain replays the WHOLE backlog
      // against the state table — the strongest replay shape (Spark's
      // own recovery only replays the uncommitted tail)
      val ckpt = Files.createTempDirectory("graft_dedup_ck").toString
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "dedupsrc")
        .option("table", "inbox").option("maxVersionsPerTrigger", "1").load()
        .filter(col("_change_type") === "insert").select("fp")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.streaming.StreamingDedup.admitBatch(
            outDb, "admitted", "fp", batch, appId, id)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain("dedup-a")
    def admitted() = outDb.table("admitted")
      .filter(col("src") === "stream")
      .select("fp").collect().map(_.getString(0)).toSet
    assert(admitted() == Set("b", "c", "d"),
      "first drain admits each non-corpus fingerprint exactly once")
    // mechanism 1, the ANTI-JOIN: a full re-drain under a NEW appId (the
    // txn ledger cannot skip it) re-probes every batch against the state
    // table and admits nothing
    drain("dedup-b")
    assert(admitted() == Set("b", "c", "d"),
      "a full replay against the state table must admit nothing new")
    assert(outDb.table("admitted").count() == 4,
      "no duplicate admitted rows after replay")
    // mechanism 2, the TXN LEDGER: re-drain under an ALREADY-RECORDED
    // appId — insertBatch skips every batch outright, so the log version
    // does not move (no empty commits, no probe work)
    val v = outDb.logVersion
    drain("dedup-b")
    assert(outDb.logVersion == v,
      "a ledger-skipped replay must not commit anything")
    assert(admitted() == Set("b", "c", "d"))
  }

  test("maintenance races a live stream: OPTIMIZE + vacuum churn the " +
      "source AND the state table mid-drain — exactly-once admission, " +
      "no livelock, conflicts retried not fatal") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_racesrc").toString
    val src = GraftDatabase(spark, "racesrc", base)
      .defineTable(TableDef("inbox", "id"))
    // 12 commits; fingerprints overlap across commits (f0..f4 repeat)
    (0 until 12).foreach { i =>
      src.insert("inbox", Seq((i * 2L, s"f${i % 5}"), (i * 2 + 1L, s"g$i"))
        .toDF("id", "fp"))
    }
    val outBase = Files.createTempDirectory("graft_raceout").toString
    val outDb = GraftDatabase(spark, "raceout", outBase)
      .defineTable(TableDef("admitted", "fp"))
    outDb.insert("admitted", Seq(("f0", "corpus")).toDF("fp", "src"))
    val expected = (1 to 4).map(i => s"f$i").toSet ++
      (0 until 12).map(i => s"g$i").toSet // f0 is corpus-seeded
    // MAINTENANCE runs as a separate ops process would: its own
    // database handles (own TxLog instances) over the same stores,
    // looping compaction + vacuum while the stream drains. Its commits
    // genuinely conflict with the stream's batch commits — both sides
    // retry (admitBatch's conflict loop; the loop below), neither may
    // wedge or corrupt. Vacuum retention is sized to cover the
    // consumer's lag (the documented feed contract): a keepVersions
    // smaller than the backlog would — correctly, loudly — fail the
    // cursor below the retention floor instead.
    val srcMaint = GraftDatabase(spark, "racesrc", base)
      .defineTable(TableDef("inbox", "id"))
    val outMaint = GraftDatabase(spark, "raceout", outBase)
      .defineTable(TableDef("admitted", "fp"))
    val maintConflicts = new java.util.concurrent.atomic.AtomicInteger
    val maintErrors = new java.util.concurrent.atomic.AtomicReference[Throwable]
    @volatile var stopMaint = false
    val maint = new Thread(() => {
      def safely(f: => Unit): Unit =
        try f catch {
          case _: graft.catalog.TxLog.ConflictException =>
            maintConflicts.incrementAndGet(); ()
          case e: Throwable => maintErrors.compareAndSet(null, e); ()
        }
      while (!stopMaint) {
        safely { srcMaint.optimize("inbox", 1L << 20, 1L << 20); () }
        safely { outMaint.optimize("admitted", 1L << 20, 1L << 20); () }
        // minAgeMs stays NON-ZERO against a live writer — it is the
        // in-flight-commit guard (vacuum's scaladoc): 0 would reclaim a
        // directory the racing insertBatch staged but has not yet
        // committed (reproduced here as a missing-_SUCCESS failure)
        safely { srcMaint.vacuum(keepVersions = 200, minAgeMs = 60000); () }
        safely { outMaint.vacuum(keepVersions = 200, minAgeMs = 60000); () }
        Thread.sleep(20)
      }
    }, "graft-race-maintenance")
    val retriesBefore = graft.streaming.StreamingDedup.conflictRetries.get()
    maint.start()
    try {
      val ckpt = Files.createTempDirectory("graft_race_ck").toString
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "racesrc")
        .option("table", "inbox").option("maxVersionsPerTrigger", "1").load()
        .filter(col("_change_type") === "insert").select("fp")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.streaming.StreamingDedup.admitBatch(
            outDb, "admitted", "fp", batch, "race-dedup", id)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // no-livelock bound: a wedged retry loop must fail the test, not
      // hang the suite
      assert(q.awaitTermination(300000),
        "drain did not complete within 5 minutes (livelock?)")
    } finally {
      stopMaint = true
      maint.join(10000)
    }
    assert(maintErrors.get() == null,
      s"maintenance loop failed: ${maintErrors.get()}")
    // exactly-once admission despite the churn: every non-corpus
    // fingerprint exactly once, nothing lost, nothing duplicated
    val admitted = outDb.table("admitted").filter(col("src") === "stream")
      .select("fp").collect().map(_.getString(0)).toSeq
    assert(admitted.toSet == expected,
      s"admitted ${admitted.toSet} != expected $expected")
    assert(admitted.size == expected.size, "duplicate admitted rows")
    // OPTIMIZE's pure rewrites are content-neutral: total state = seed +
    // admitted, regardless of how many compactions interleaved
    assert(outDb.table("admitted").count() == expected.size + 1L)
    val streamRetries =
      graft.streaming.StreamingDedup.conflictRetries.get() - retriesBefore
    info(s"race: stream commit retries = $streamRetries, " +
      s"maintenance conflicts = ${maintConflicts.get()}")
  }

  test("database-level feed (table=*): three tables committing " +
      "interleaved drain through ONE stream exactly-once in commit " +
      "order, rows round-tripping through the JSON envelope") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graft_mux").toString
    val db = GraftDatabase(spark, "mux", base)
      .defineTable(TableDef("a", "id"))
      .defineTable(TableDef("b", "id"))
      .defineTable(TableDef("c", "id"))
    // interleaved: a,b,c,a,b,c — plus an update (delete+insert pair)
    // and a pure delete, so every change type flows through the mux
    db.insert("a", Seq((1L, "a1"), (2L, "a2")).toDF("id", "v")) // v1
    db.insert("b", Seq((1L, "b1")).toDF("id", "v"))             // v2
    db.insert("c", Seq((1L, "c1")).toDF("id", "v"))             // v3
    db.insert("a", Seq((3L, "a3")).toDF("id", "v"))             // v4
    db.updateMany("b", col("id") === 1L, Map("v" -> lit("b1x"))) // v5
    db.delete("c", col("id") === 1L)                            // v6
    val ckpt = Files.createTempDirectory("graft_mux_ck").toString
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "mux")
      .option("table", "*").option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("mux_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("mux_out")
      .select("_table", "_change_type", "_commit_version", "_row")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSeq
    // exactly-once multiset: every change of every table, tagged with
    // the commit that produced it, nothing duplicated or lost
    def j(id: Long, v: String) = s"""{"id":$id,"v":"$v"}"""
    val expected = Set(
      ("a", "insert", 1L, j(1, "a1")), ("a", "insert", 1L, j(2, "a2")),
      ("b", "insert", 2L, j(1, "b1")),
      ("c", "insert", 3L, j(1, "c1")),
      ("a", "insert", 4L, j(3, "a3")),
      ("b", "delete", 5L, j(1, "b1")), ("b", "insert", 5L, j(1, "b1x")),
      ("c", "delete", 6L, j(1, "c1")))
    assert(rows.toSet == expected, rows.sortBy(_._3).mkString("\n"))
    assert(rows.size == expected.size, "duplicate multiplexed rows")
    // commit order is total and per-table consistent: versions ascend
    // with the actual commit sequence
    assert(rows.filter(_._1 == "a").map(_._3).distinct.sorted == Seq(1L, 4L))
    // the envelope round-trips: from_json recovers the typed rows
    val aBack = spark.table("mux_out")
      .filter(col("_table") === "a" && col("_change_type") === "insert")
      .select(from_json(col("_row"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType)))).as("r"))
      .select("r.id", "r.v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(aBack == Set((1L, "a1"), (2L, "a2"), (3L, "a3")))
  }

  test("admitBatch retries a DETERMINISTIC lost commit race: a " +
      "maintenance commit landing between its probe and its publish " +
      "conflicts, the retry re-probes the fresh state and admits " +
      "exactly once") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val outBase = Files.createTempDirectory("graft_forcedrace").toString
    val outDb = GraftDatabase(spark, "forcedrace", outBase)
      .defineTable(TableDef("admitted", "fp"))
    outDb.insert("admitted", Seq(("seed", "corpus")).toDF("fp", "src"))
    val outMaint = GraftDatabase(spark, "forcedrace", outBase)
      .defineTable(TableDef("admitted", "fp"))
    // LATCH-ORDERED interleaving (sleeps raced differently under full-
    // suite load): the batch's partitions signal once admitBatch has
    // captured its read version (partitions only run inside its FIRST
    // Spark action, which is after base capture) and then BLOCK until
    // the main thread's commit has landed — so the interleaved commit
    // deterministically falls inside the worker's probe→publish window
    StreamingForcedRace.reset()
    val slowBatch = spark.range(4)
      .selectExpr("CONCAT('fp', id) AS fp").as[String](
        org.apache.spark.sql.Encoders.STRING)
      .mapPartitions { it =>
        StreamingForcedRace.workerStarted.countDown()
        StreamingForcedRace.mainDone.await(
          60, java.util.concurrent.TimeUnit.SECONDS)
        it
      }(org.apache.spark.sql.Encoders.STRING).toDF("fp")
    val retriesRef = new java.util.concurrent.atomic.AtomicInteger(-1)
    val errRef = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val worker = new Thread(() => {
      try retriesRef.set(graft.streaming.StreamingDedup.admitBatch(
        outDb, "admitted", "fp", slowBatch, "forced-race", 0L))
      catch { case e: Throwable => errRef.set(e) }
    }, "graft-forced-race-worker")
    worker.start()
    assert(StreamingForcedRace.workerStarted.await(
      60, java.util.concurrent.TimeUnit.SECONDS),
      "worker never reached its first batch action")
    outMaint.insert("admitted", Seq(("interleaved", "corpus"))
      .toDF("fp", "src")) // an absolute commit touching the same table
    StreamingForcedRace.mainDone.countDown()
    worker.join(120000)
    assert(!worker.isAlive, "admitBatch wedged")
    assert(errRef.get() == null, s"admitBatch failed: ${errRef.get()}")
    assert(retriesRef.get() >= 1,
      s"expected at least one conflict retry, got ${retriesRef.get()}")
    // exactly-once despite the lost race: all four fingerprints admitted
    // once, the interleaved row intact
    val rows = outDb.table("admitted").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("seed", "corpus"), ("interleaved", "corpus"),
      ("fp0", "stream"), ("fp1", "stream"), ("fp2", "stream"),
      ("fp3", "stream")), rows.toString)
  }

  test("maxVersionsPerTrigger / maxFilesPerTrigger bound catch-up " +
      "batches: the backlog drains in ceil(N/cap) batches, same result") {
    val (_, base) = backlogDb("capdb")
    def drain(opts: Map[String, String], name: String): (Set[Long], Int) = {
      val ckpt = Files.createTempDirectory("graft_cap_ckpt").toString
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "capdb")
        .option("table", "ev").options(opts).load()
        .filter(col("_change_type") === "insert")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (spark.table(name).select("id").collect().map(_.getLong(0)).toSet,
        batches)
    }
    // zero options: the DEFAULT 512 MiB byte cap is far above this tiny
    // backlog, so it still lands in one batch
    val (uncapped, b0) = drain(Map.empty, "cap_all")
    assert(uncapped == (1L to 6L).toSet)
    assert(b0 == 1, s"a backlog under the default byte cap should land " +
      s"in one batch, got $b0")
    // explicit opt-out: genuinely uncapped, same single batch here
    val (optOut, bn) = drain(Map("maxBytesPerTrigger" -> "none"), "cap_none")
    assert(optOut == uncapped)
    assert(bn == 1, s"opted-out backlog should land in one batch, got $bn")
    // version-capped: 6 versions / 2 per trigger = 3 bounded batches,
    // IDENTICAL final result (snapshot diffs telescope)
    val (byVersion, bv) = drain(Map("maxVersionsPerTrigger" -> "2"), "cap_v")
    assert(byVersion == uncapped)
    assert(bv == 3, s"6 versions at cap 2 must drain in 3 batches, got $bv")
    // files-weighted: each version exchanged exactly one file
    val (byFiles, bf) = drain(Map("maxFilesPerTrigger" -> "3"), "cap_f")
    assert(byFiles == uncapped)
    assert(bf == 2, s"6 single-file versions at 3 files/trigger must " +
      s"drain in 2 batches, got $bf")
    // bytes-weighted: a 1-byte budget is below every file, so the
    // ≥1-version floor paces exactly one version per batch; a huge
    // budget admits the whole backlog at once — identical results
    val (byBytes, bb) = drain(Map("maxBytesPerTrigger" -> "1"), "cap_b")
    assert(byBytes == uncapped)
    assert(bb == 6, s"a below-every-file byte budget must pace one " +
      s"version per batch (6 batches), got $bb")
    val (byBytesBig, bbb) =
      drain(Map("maxBytesPerTrigger" -> s"${Long.MaxValue}"), "cap_bb")
    assert(byBytesBig == uncapped)
    assert(bbb == 1, s"an unconstraining byte budget must bootstrap in " +
      s"one batch, got $bbb")
  }

  test("an uncapped bootstrap over a backlog larger than uncappedWarnBytes " +
      "warns LOUDLY once; any admission cap silences it") {
    val (_, base) = backlogDb("warndb")
    def errOf(opts: Map[String, String], name: String): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withErr(new java.io.PrintStream(buf, true)) {
        val q = spark.readStream.format("graft-changes")
          .option("baseDir", base).option("name", "warndb")
          .option("table", "ev").options(opts).load()
          .writeStream.format("memory").queryName(name)
          .option("checkpointLocation",
            Files.createTempDirectory("graft_warn_ckpt").toString)
          .outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }
      buf.toString
    }
    // truly uncapped takes the explicit opt-out; a 1-byte threshold is
    // below any real backlog → the warning fires on that path
    val warned = errOf(
      Map("uncappedWarnBytes" -> "1", "maxBytesPerTrigger" -> "none"),
      "warn_yes")
    assert(warned.contains("NO admission cap"),
      s"expected the uncapped-bootstrap warning, got: $warned")
    // zero cap options = bounded by the DEFAULT byte cap → no warning
    // even at a 1-byte threshold
    val defaulted = errOf(Map("uncappedWarnBytes" -> "1"), "warn_def")
    assert(!defaulted.contains("NO admission cap"),
      "a default-bounded stream must not warn about uncapped bootstraps")
    // with a cap set the same backlog drains silently
    val silent = errOf(
      Map("uncappedWarnBytes" -> "1", "maxVersionsPerTrigger" -> "2"),
      "warn_no")
    assert(!silent.contains("NO admission cap"),
      "a capped stream must not warn about uncapped bootstraps")
    // malformed / negative thresholds fail LOUDLY with the real message
    def chainMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val bad = intercept[Exception](errOf(
      Map("uncappedWarnBytes" -> "lots"), "warn_bad"))
    assert(chainMessages(bad).contains("uncappedWarnBytes"),
      s"malformed uncappedWarnBytes must name the option: ${chainMessages(bad)}")
    val neg = intercept[Exception](errOf(
      Map("uncappedWarnBytes" -> "-5"), "warn_neg"))
    assert(chainMessages(neg).contains("uncappedWarnBytes"))
  }

  test("admission is BOUNDED BY DEFAULT: zero cap options ride the " +
      "session default byte budget; any explicit cap choice suppresses it") {
    val (_, base) = backlogDb("defcapdb")
    def drain(opts: Map[String, String], name: String): (Set[Long], Int) = {
      val ckpt = Files.createTempDirectory("graft_defcap_ckpt").toString
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "defcapdb")
        .option("table", "ev").options(opts).load()
        .filter(col("_change_type") === "insert")
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      q.stop()
      (spark.table(name).select("id").collect().map(_.getLong(0)).toSet,
        batches)
    }
    // shrink the session default below every file so the default cap's
    // effect is observable on a tiny backlog
    spark.conf.set("spark.graft.changes.defaultMaxBytesPerTrigger", "1")
    try {
      val (ids, b) = drain(Map.empty, "defcap_on")
      assert(ids == (1L to 6L).toSet,
        "the default-bounded drain must land the full backlog")
      assert(b == 6, s"a below-every-file default byte budget must pace " +
        s"one version per batch (6 batches), got $b")
      // an explicit cap of ANOTHER kind is a cap choice: the byte
      // default must NOT stack on top of it
      val (ids2, b2) = drain(Map("maxVersionsPerTrigger" -> "2"), "defcap_v")
      assert(ids2 == (1L to 6L).toSet)
      assert(b2 == 3, s"an explicit version cap must suppress the " +
        s"default byte cap (3 batches), got $b2")
      // the explicit opt-out beats the default too
      val (ids3, b3) = drain(Map("maxBytesPerTrigger" -> "none"), "defcap_no")
      assert(ids3 == (1L to 6L).toSet)
      assert(b3 == 1, s"maxBytesPerTrigger=none must disable the default " +
        s"cap (one batch), got $b3")
      // `none` on a NON-byte cap is a semantic no-op (those dimensions
      // were never capped by default) and must NOT sneak the stream to
      // unbounded: only the documented maxBytesPerTrigger=none does
      val (ids4, b4) = drain(Map("maxFilesPerTrigger" -> "none"), "defcap_fn")
      assert(ids4 == (1L to 6L).toSet)
      assert(b4 == 6, s"maxFilesPerTrigger=none must keep the default " +
        s"byte cap (6 batches), got $b4")
      // garbage in the session-default conf names the key and the opt-out
      def msgs(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
      val bad = intercept[Exception] {
        spark.conf.set("spark.graft.changes.defaultMaxBytesPerTrigger", "none")
        drain(Map.empty, "defcap_bad")
      }
      assert(msgs(bad).contains("defaultMaxBytesPerTrigger") &&
        msgs(bad).contains("maxBytesPerTrigger"), msgs(bad))
    } finally spark.conf.unset("spark.graft.changes.defaultMaxBytesPerTrigger")
  }

  test("the change feed composes like a real stream: watermarked tumbling " +
      "windows + a stream-static join; a late commit is dropped by the " +
      "watermark, append mode emits exactly the finalized windows") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_compose").toString
    val db = GraftDatabase(spark, "composedb", base)
    db.defineTable(TableDef("ev", "id"))
    // v1 (live): two events; the 12:30 one sets the watermark to 12:20
    db.insert("ev", Seq(
      (1L, ts("2024-03-01 10:05:00"), "a", 2.0),
      (2L, ts("2024-03-01 12:30:00"), "b", 3.0)).toDF("id", "ts", "k", "v"))
    // v2 (live): batch 2 runs at watermark 12:20, EVICTING and emitting
    // the [10:00,11:00) window — a row arriving in the same batch its
    // window is evicted still merges (eviction runs after the merge),
    // so the guaranteed-drop case needs the eviction to have happened
    // in an EARLIER batch
    db.insert("ev", Seq(
      (4L, ts("2024-03-01 12:40:00"), "b", 7.0)).toDF("id", "ts", "k", "v"))
    // v3 (late): 10:20 targets the already-evicted [10:00,11:00) window,
    // a whole batch below the watermark — guaranteed drop
    db.insert("ev", Seq(
      (3L, ts("2024-03-01 10:20:00"), "a", 5.0)).toDF("id", "ts", "k", "v"))
    // v4 (sentinel): pushes the watermark past every real window so the
    // AvailableNow run emits them in append mode before stopping
    db.insert("ev", Seq(
      (9L, ts("2024-03-02 12:00:00"), "z", 0.0)).toDF("id", "ts", "k", "v"))
    val dim = Seq(("a", 10), ("b", 100), ("z", 1)).toDF("k", "weight")
    val ckpt = Files.createTempDirectory("graft_compose_ckpt").toString
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "composedb")
      .option("table", "ev").option("maxVersionsPerTrigger", "1").load()
      .filter(col("_change_type") === "insert")
      .withWatermark("ts", "10 minutes")
      .join(broadcast(dim), Seq("k"))               // stream-static join
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v") * col("weight")).as("wv"))
      .select(col("window.start").cast("string").as("w"), col("k"),
        col("n"), col("wv"))
      .writeStream.format("memory").queryName("compose_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the late batch must not UPDATE any window state: its only row
    // targets a window already below the watermark, so the watermark
    // filter discards it before the aggregation (state rows updated = 0
    // in that batch; numRowsDroppedByWatermark stays 0 here by design —
    // that metric counts state-store-level drops, not the pre-agg
    // watermark filter)
    // the late batch (the third with input) must not touch window state:
    // its only row targets an evicted window below the watermark
    val lateBatch = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      .sortBy(_.batchId).apply(2)
    assert(lateBatch.stateOperators.map(_.numRowsUpdated).sum == 0,
      "the late commit must not update any window state")
    val rows = spark.table("compose_out").filter(col("k") =!= "z")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // the late 10:20 row neither re-opens nor re-emits the evicted
    // [10:00,11:00) window; the weights prove the static join applied
    // batch-side
    assert(rows == Set(
      ("2024-03-01 10:00:00", "a", 1L, 20.0),
      ("2024-03-01 12:00:00", "b", 2L, 1000.0)),
      s"append must emit exactly the finalized pre-watermark windows, got $rows")
  }

  test("restart sweeps orphaned staging dirs a failed or abandoned run " +
      "left under the checkpoint") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val (db, base) = backlogDb("orphdb")
    // memory sinks cannot recover a checkpoint — replicate into a graft
    // table (the exactly-once sink IS checkpoint-recoverable)
    val dstBase = Files.createTempDirectory("graft_orph_dst").toString
    val dst = GraftDatabase(spark, "orphdst", dstBase)
    dst.defineTable(TableDef("ev", "id"))
    val ckpt = Files.createTempDirectory("graft_orph_ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "orphdb")
        .option("table", "ev").option("maxVersionsPerTrigger", "2").load()
        .writeStream.format("graft-changes")
        .option("baseDir", dstBase).option("name", "orphdst")
        .option("table", "ev").option("appId", "orphrep")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      val deadline = System.currentTimeMillis() + 60000
      while (q.isActive) {
        assert(System.currentTimeMillis() < deadline,
          "AvailableNow run did not self-stop within 60s")
        Thread.sleep(50)
      }
      q.awaitTermination()
    }
    run()
    // the staging root lives under the source's checkpoint subdir
    def stagingRoots(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName != null &&
            p.getFileName.toString == "graft-staged") buf += p
        }
        buf.toSeq
      } finally s.close()
    }
    val roots = stagingRoots()
    assert(roots.nonEmpty, "expected a graft-staged dir under the checkpoint")
    // plant an orphan: the staging dir shape a batch that FAILED (or a
    // run killed mid-backlog) leaves behind — commit() never reclaims
    // it because its range was never committed
    val orphan = roots.head.resolve("98-99")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.urs"),
      Array[Byte](1, 2, 3))
    // new backlog + a fresh AvailableNow run over the SAME checkpoint:
    // the restart must sweep the orphan before staging anything
    db.insert("ev", Seq((7L, 70L)).toDF("id", "v").repartition(1))
    run()
    assert(!java.nio.file.Files.exists(orphan),
      "restart must sweep staging dirs no live plan references")
    val got = dst.table("ev").select("id").collect()
      .map(_.getLong(0)).toSet
    assert(got == (1L to 7L).toSet, "the swept restart must still " +
      "deliver the full feed exactly once")
  }

  test("Trigger.AvailableNow drains exactly the backlog present at query " +
      "start in capped batches, terminates on its own, and leaves " +
      "mid-run commits for the next run") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val (db, base) = backlogDb("availdb")
    val dstBase = Files.createTempDirectory("graft_avail_dst").toString
    val dst = GraftDatabase(spark, "availdst", dstBase)
    dst.defineTable(TableDef("ev", "id"))
    // memory sinks cannot recover a checkpoint, so the second run below
    // would refuse to start — replicate into a graft table instead (the
    // exactly-once sink IS checkpoint-recoverable)
    val ckpt = Files.createTempDirectory("graft_avail_ckpt").toString
    def run(afterFirstBatch: () => Unit): Int = {
      var fired = false
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", base).option("name", "availdb")
        .option("table", "ev").option("maxVersionsPerTrigger", "2").load()
        .writeStream.format("graft-changes")
        .option("baseDir", dstBase).option("name", "availdst")
        .option("table", "ev").option("appId", "availrep")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // inject a mid-run commit after the first progress event: it lands
      // ABOVE the prepared ceiling, so this run must not consume it.
      // Deadline-bounded: a wedged AvailableNow run must fail loudly,
      // not hang the suite
      val deadline = System.currentTimeMillis() + 60000
      while (q.isActive) {
        assert(System.currentTimeMillis() < deadline,
          "AvailableNow run did not self-stop within 60s")
        if (!fired && q.recentProgress.nonEmpty) { fired = true; afterFirstBatch() }
        Thread.sleep(50)
      }
      q.awaitTermination() // surfaces any stream error; returns, proving self-stop
      // if the drain finished before the poll loop saw a progress event,
      // fire the injection now — it still lands above the ceiling, which
      // is all the first-run assertion needs
      if (!fired) afterFirstBatch()
      q.recentProgress.count(_.numInputRows > 0)
    }
    val b1 = run(() => db.insert("ev",
      Seq((7L, 70L)).toDF("id", "v").repartition(1)))
    def ids(): Set[Long] =
      dst.table("ev").select("id").collect().map(_.getLong(0)).toSet
    assert(ids() == (1L to 6L).toSet,
      "AvailableNow must drain the 6-version backlog and NOT the mid-run commit")
    assert(b1 >= 3, s"6 versions at cap 2 must take >= 3 batches, got $b1")
    // the next AvailableNow run resumes from the checkpoint and picks up
    // exactly the commit the first run left behind
    val b2 = run(() => ())
    assert(ids() == (1L to 7L).toSet, "second run must deliver version 7")
  }

  test("restart mid-backlog resumes at the checkpointed offset under " +
      "admission control (exactly-once across capped runs)") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val (_, srcBase) = backlogDb("middb")
    val dstBase = Files.createTempDirectory("graft_mid_dst").toString
    val dst = GraftDatabase(spark, "middst", dstBase)
    dst.defineTable(TableDef("ev", "id"))
    val ckpt = Files.createTempDirectory("graft_mid_ckpt").toString
    def run(trigger: Trigger, drainAll: Boolean): Unit = {
      val q = spark.readStream.format("graft-changes")
        .option("baseDir", srcBase).option("name", "middb")
        .option("table", "ev").option("maxVersionsPerTrigger", "2").load()
        .writeStream.format("graft-changes")
        .option("baseDir", dstBase).option("name", "middst")
        .option("table", "ev").option("appId", "midrep")
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      if (drainAll) { q.processAllAvailable(); q.stop() }
      else q.awaitTermination()
    }
    def ids(): Set[Long] =
      dst.table("ev").select("id").collect().map(_.getLong(0)).toSet
    // Trigger.Once = exactly ONE capped micro-batch, then shutdown —
    // the stream stops MID-backlog with a checkpointed offset
    run(Trigger.Once(), drainAll = false)
    assert(ids() == Set(1L, 2L),
      "first capped batch must carry exactly versions 1-2")
    run(Trigger.Once(), drainAll = false)
    assert(ids() == Set(1L, 2L, 3L, 4L),
      "restart must resume at version 2, not re-bootstrap")
    run(Trigger.ProcessingTime(0L), drainAll = true)
    assert(ids() == (1L to 6L).toSet, "final drain converges exactly once")
  }

  test("an admission-capped catch-up across a historical ADD COLUMN " +
      "drains: pre-evolution batches null-fill the pinned column") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_capddl").toString
    val db = GraftDatabase(spark, "capddl", base)
    db.defineTable(TableDef("ev", "id"))
    (1 to 3).foreach(i => db.insert("ev",
      Seq((i.toLong, i * 10L)).toDF("id", "v")))
    db.addColumn("ev", "score", org.apache.spark.sql.types.DoubleType)
    (4 to 5).foreach(i => db.insert("ev",
      Seq((i.toLong, i * 10L, i * 1.5)).toDF("id", "v", "score")))
    // the stream pins the HEAD schema (incl. score); cap 2 forces the
    // first batches to span versions BELOW the ADD COLUMN, whose diff
    // frames lack the column — they must null-fill, not crash
    val q = spark.readStream.format("graft-changes")
      .option("baseDir", base).option("name", "capddl").option("table", "ev")
      .option("maxVersionsPerTrigger", "2").load()
      .filter(col("_change_type") === "insert")
      .writeStream.format("memory").queryName("capddl_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("capddl_out")
      .select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out.keySet == (1L to 5L).toSet, s"backlog must drain: $out")
    assert((1L to 3L).forall(out(_).isEmpty),
      "pre-evolution rows null-fill the pinned column")
    assert(out(4L).contains(6.0) && out(5L).contains(7.5))
  }

  test("schemaTrackingMode=fail stops the query when the table schema " +
      "diverges from the stream's pinned schema; warn keeps feeding") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val base = Files.createTempDirectory("graft_drift").toString
    val db = GraftDatabase(spark, "driftdb", base)
    db.defineTable(TableDef("ev", "id"))
    db.insert("ev", Seq((1L, 10L)).toDF("id", "v"))
    def start(mode: String, name: String) = spark.readStream
      .format("graft-changes")
      .option("baseDir", base).option("name", "driftdb").option("table", "ev")
      .option("schemaTrackingMode", mode).load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val qFail = start("fail", "drift_fail")
    qFail.processAllAvailable() // bootstrap: schema matches, no failure
    assert(spark.table("drift_fail").count() == 1)
    // mid-stream evolution: the SCH commit itself is a new version, so
    // the next planned batch sees the divergence
    db.addColumn("ev", "score", org.apache.spark.sql.types.DoubleType)
    db.insert("ev", Seq((2L, 20L)).toDF("id", "v"))
    val ex = intercept[Exception] { qFail.processAllAvailable() }
    assert(ex.getMessage.contains("diverged") ||
      qFail.exception.exists(_.getMessage.contains("diverged")),
      s"fail mode must stop the query on drift, got: ${ex.getMessage}")
    // warn mode (the default): same divergence keeps feeding the
    // PINNED columns — a fresh stream picks up the evolved schema
    val qWarn = start("warn", "drift_warn")
    qWarn.processAllAvailable(); qWarn.stop()
    assert(spark.table("drift_warn").columns.toSet ==
      Set("id", "v", "score", "_change_type"),
      "a fresh stream pins the EVOLVED schema")
    assert(spark.table("drift_warn").count() == 2)
  }
}

/** Latches coordinating the deterministic forced-race case (static so
  * executor-side closures reference the module, not a captured
  * non-serializable latch).
  */
object StreamingForcedRace {
  @volatile var workerStarted = new java.util.concurrent.CountDownLatch(1)
  @volatile var mainDone = new java.util.concurrent.CountDownLatch(1)
  def reset(): Unit = {
    workerStarted = new java.util.concurrent.CountDownLatch(1)
    mainDone = new java.util.concurrent.CountDownLatch(1)
  }
}
