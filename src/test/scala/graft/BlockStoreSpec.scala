package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.catalog.GraftDatabase
import graft.functions.RefFunctions

/** Facade audit chains against the reference's
  * `TableCollection.Blocks(guid)` contract
  * (`Blockchain/BlockCollection.cs`): batch append chained on the
  * stored frontier, the Insert dedup quirk, range/lastN reads,
  * tamper detection, and the checkpointed incremental verify.
  */
class BlockStoreSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private def freshDb() = GraftDatabase(spark, "chaindb",
    java.nio.file.Files.createTempDirectory("graft_blocks").toString)

  test("append chains batches onto the stored frontier; genesis links to " +
      "the empty hash like Block.cs:17") {
    val bs = freshDb().blocks("guid-a")
    assert(bs.append(Seq((1000L, "t=20.1"), (2000L, "t=20.7"))
      .toDF("ts_us", "data")) == 2L)
    val first = bs.chain.orderBy("ts_us").collect()
    assert(first.head.getAs[String]("previous_hash") == "")
    assert(first(1).getAs[String]("previous_hash") ==
      first.head.getAs[String]("hash"))
    // second batch links its first block to the first batch's frontier
    bs.append(Seq((3000L, "t=21.0")).toDF("ts_us", "data"))
    val all = bs.chain.orderBy("ts_us").collect()
    assert(all.length == 3 && bs.count() == 3L)
    assert(all(2).getAs[String]("previous_hash") ==
      all(1).getAs[String]("hash"))
    assert(all(2).getAs[Long]("seq") == 3L)
    // full verify: every hash and link valid
    assert(bs.verify().filter(!col("hash_valid") || !col("link_valid"))
      .isEmpty)
    assert(bs.isConsistent(2) && bs.isConsistent(0L, 5000L))
  }

  test("insert carries the reference's dedup quirk: re-inserting the " +
      "frontier's data is a no-op returning the existing hash") {
    val bs = freshDb().blocks("guid-b")
    val h1 = bs.insert("reading-1", tsUs = 1000L)
    val h2 = bs.insert("reading-1", tsUs = 2000L) // duplicate of frontier
    assert(h1 == h2 && bs.count() == 1L)
    val h3 = bs.insert("reading-2", tsUs = 3000L)
    assert(h3 != h1 && bs.count() == 2L)
    // a PRIOR value repeated is a new block (only the frontier dedups)
    bs.insert("reading-1", tsUs = 4000L)
    assert(bs.count() == 3L)
  }

  test("guids are isolated partitions; lastN and range read the one chain") {
    val db = freshDb()
    db.blocks("g1").append(Seq((1000L, "a"), (2000L, "b"), (3000L, "c"))
      .toDF("ts_us", "data"))
    db.blocks("g2").append(Seq((1500L, "x")).toDF("ts_us", "data"))
    assert(db.blocks("g1").count() == 3L && db.blocks("g2").count() == 1L)
    assert(db.blocks("g1").lastN(2).select("data").as[String]
      .collect().toSeq == Seq("c", "b"))
    assert(db.blocks("g1").range(1500L, 2500L).select("data").as[String]
      .collect().toSeq == Seq("b"))
    assert(db.blocks("g1").last().exists(_.getAs[String]("data") == "c"))
  }

  test("tampering a stored block trips verify and isConsistent — " +
      "including mid-window tampering the reference's last-of check " +
      "(BlockCollection.cs:106-113) would miss") {
    val db = freshDb()
    val bs = db.blocks("g-tamper")
    bs.append(Seq((1000L, "a"), (2000L, "b"), (3000L, "c"))
      .toDF("ts_us", "data"))
    // rewrite the middle block's payload on disk (hash fields kept)
    val dir = s"${db.root}/Blockchain/data"
    val tampered = spark.read.parquet(dir)
      .withColumn("data", when(col("data") === "b", "B!").otherwise(col("data")))
    val tmp = s"${db.root}/tampered"
    tampered.write.partitionBy("point_guid").parquet(tmp)
    graft.core.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(dir))
    val bad = bs.verify().filter(!col("hash_valid")).select("data")
      .as[String].collect().toSeq
    assert(bad == Seq("B!"))
    assert(!bs.isConsistent(3), "mid-window tamper must fail the all-of check")
    assert(bs.isConsistent(1), "the frontier block itself is untouched")
  }

  test("checkpointVerify: first pass checks all and persists the cursor; " +
      "the next pass sees only new blocks and links them to the frontier") {
    val db = freshDb()
    val bs = db.blocks("g-inc")
    bs.append(Seq((1000L, "a"), (2000L, "b")).toDF("ts_us", "data"))
    val p1 = bs.checkpointVerify()
    assert(p1.count() == 2 &&
      p1.filter(!col("hash_valid") || !col("link_valid")).isEmpty)
    // steady state: nothing new to verify
    assert(bs.checkpointVerify().isEmpty)
    bs.append(Seq((3000L, "c"), (4000L, "d")).toDF("ts_us", "data"))
    val p2 = bs.checkpointVerify()
    assert(p2.select("data").as[String].collect().toSet == Set("c", "d"))
    assert(p2.filter(!col("hash_valid") || !col("link_valid")).isEmpty)
    assert(bs.checkpointVerify().isEmpty)
  }

  test("rebuild(password) re-encrypts chain files and keeps the chain " +
      "verifiable; a retired facade's block writes are fenced") {
    val db = freshDb()
    val bs = db.blocks("g-enc")
    bs.append(Seq((1000L, "a"), (2000L, "b")).toDF("ts_us", "data"))
    bs.checkpointVerify()
    val db2 = db.rebuild(password = Some("chain-key"))
    intercept[IllegalStateException] {
      db.blocks("g-enc").append(Seq((3000L, "c")).toDF("ts_us", "data"))
    }
    val bs2 = db2.blocks("g-enc")
    assert(bs2.count() == 2L)
    assert(bs2.checkpointVerify().isEmpty) // cursor survived the rebuild
    bs2.append(Seq((3000L, "c")).toDF("ts_us", "data"))
    assert(bs2.verify().filter(!col("hash_valid") || !col("link_valid"))
      .isEmpty)
    val files = java.nio.file.Files.walk(
      java.nio.file.Paths.get(s"${db.root}/Blockchain"))
    try {
      val parquets = files.filter(_.toString.endsWith(".parquet"))
      val it = parquets.iterator()
      var n = 0
      while (it.hasNext) {
        assert(graft.core.FileCrypto.isEncryptedFile(it.next().toString))
        n += 1
      }
      assert(n > 0)
    } finally files.close()
  }

  test("concurrent-append forks are refused: a claimed next-seq fails the " +
      "second writer; a crashed claimant's stale claim is taken over") {
    import graft.catalog.BlockStore
    val db = freshDb()
    val bs = db.blocks("g-race")
    bs.append(Seq((1000L, "a")).toDF("ts_us", "data"))
    // another writer claimed seq 2 but hasn't landed yet -> conflict
    val claims = java.nio.file.Paths.get(
      s"${db.root}/Blockchain/_claims/g-race")
    java.nio.file.Files.createDirectories(claims)
    val claim2 = claims.resolve("2.claim")
    java.nio.file.Files.createFile(claim2)
    intercept[java.util.ConcurrentModificationException] {
      bs.append(Seq((2000L, "b")).toDF("ts_us", "data"))
    }
    assert(bs.count() == 1L, "the refused append must not land")
    // the claimant crashed: once the claim is stale it is taken over
    java.nio.file.Files.setLastModifiedTime(claim2,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - BlockStore.StaleClaimMs - 1000))
    bs.append(Seq((2000L, "b")).toDF("ts_us", "data"))
    assert(bs.count() == 2L)
    assert(bs.verify().filter(!col("hash_valid") || !col("link_valid"))
      .isEmpty)
  }

  test("claims are released on success and on a failed batch, so a retry " +
      "never waits out the staleness window") {
    val db = freshDb()
    val bs = db.blocks("g-claims")
    bs.append(Seq((1000L, "a")).toDF("ts_us", "data"))
    val claims = java.nio.file.Paths.get(
      s"${db.root}/Blockchain/_claims/g-claims")
    def liveClaims() =
      Option(claims.toFile.list()).map(_.length).getOrElse(0)
    assert(liveClaims() == 0,
      "a successful append must release its claim (no accumulation)")
    // a batch that fails AFTER claiming (missing the data column) must
    // release too — otherwise every retry at this seq would fail
    // 'advanced concurrently' for the whole staleness window
    intercept[Exception] {
      bs.append(Seq((2000L, "b")).toDF("ts_us", "wrong_col"))
    }
    assert(liveClaims() == 0, "a failed append must release its claim")
    bs.append(Seq((2000L, "b")).toDF("ts_us", "data")) // immediate retry
    assert(bs.count() == 2L)
    // a claim OWNED BY ANOTHER writer is never released by our failure
    val foreign = claims.resolve("3.claim")
    java.nio.file.Files.write(foreign, "other-token".getBytes("UTF-8"))
    intercept[java.util.ConcurrentModificationException] {
      bs.append(Seq((3000L, "c")).toDF("ts_us", "data"))
    }
    assert(java.nio.file.Files.exists(foreign),
      "another writer's claim must survive our conflict")
  }

  test("hashUniqueIdentifiers matches the driver-side twin and the " +
      "reference's name=value; concatenation (BaseDatabase.cs:115-145)") {
    val df = Seq((7L, "ann")).toDF("id", "name")
    val colHash = df.select(RefFunctions.hashUniqueIdentifiers(
      "id" -> col("id"), "name" -> col("name")).as("h"))
      .as[String].head()
    assert(colHash ==
      RefFunctions.hashUniqueIdentifiers(Seq("id" -> "7", "name" -> "ann")))
    // pinned golden value: sha256("id=7;name=ann;")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest("id=7;name=ann;".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(colHash == expect)
  }

  test("GraftSimpleDb: the one-collection facade round-trips DML like " +
      "IotSimpleDb<T> (IotSimpleDb.cs:6-24)") {
    import graft.dml.ConstrainedDml.TableDef
    val base = java.nio.file.Files.createTempDirectory("graft_simple").toString
    val sdb = graft.catalog.GraftSimpleDb(spark, base,
      TableDef("sensor", "id"))
    sdb.insert(Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "label", "value"))
    assert(sdb.count() == 2L)
    sdb.upsert(Seq((2L, "b", 25.0), (3L, "c", 30.0))
      .toDF("id", "label", "value"))
    assert(sdb.count() == 3L)
    assert(sdb.findById(2L).exists(_.getAs[Double]("value") == 25.0))
    sdb.updateMany(col("value") >= 25.0, Map("label" -> lit("hot")))
    assert(sdb.all.filter(col("label") === "hot").count() == 2L)
    sdb.delete(col("id") === 1L)
    assert(sdb.query.orderBy(col("id")).select(col("id")).toDf
      .as[Long].collect().toSeq == Seq(2L, 3L))
  }

  test("history-retiring maintenance between incremental verifies: after " +
      "a rebuild (chain compaction + version vacuum), the persisted " +
      "cursor still catches a tamper landed in the retained suffix — " +
      "and a dirty pass never advances it") {
    val db = freshDb()
    val bs = db.blocks("g-vac")
    bs.append(Seq((1000L, "a"), (2000L, "b")).toDF("ts_us", "data"))
    assert(bs.checkpointVerify().count() == 2) // cursor lands at "b"

    // retire history: rebuild rewrites the chain's parquet layout and
    // vacuums retired table versions (the BlockStore analog of the
    // TxLog vacuum window the incremental cursor must survive)
    val db2 = db.rebuild()
    val bs2 = db2.blocks("g-vac")
    assert(bs2.count() == 2L)
    assert(bs2.checkpointVerify().isEmpty,
      "rebuild must not reset the verified frontier")

    // new suffix past the cursor, then tamper it on disk
    bs2.append(Seq((3000L, "c"), (4000L, "d")).toDF("ts_us", "data"))
    val dir = s"${db.root}/Blockchain/data"
    val tampered = spark.read.parquet(dir)
      .withColumn("data", when(col("data") === "c", "C!").otherwise(col("data")))
    val tmp = s"${db.root}/tampered"
    tampered.write.partitionBy("point_guid").parquet(tmp)
    graft.core.FsUtils.deleteRecursively(java.nio.file.Paths.get(dir))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(dir))

    // the incremental pass checks ONLY the suffix — and flags the tamper
    val p = bs2.checkpointVerify()
    assert(p.count() == 2, "only the post-cursor suffix re-verifies")
    assert(p.filter(!col("hash_valid")).select("data").as[String]
      .collect().toSeq == Seq("C!"))
    // a dirty pass must NOT advance the cursor: the tamper is still
    // reported on the next pass, not silently checkpointed away
    val p2 = bs2.checkpointVerify()
    assert(p2.filter(!col("hash_valid")).count() == 1,
      "cursor advanced past a failed verification")
  }
}
