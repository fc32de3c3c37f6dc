package graft.catalog

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.chain.HashChain

/** Per-value audit chains under `Blockchain/` — the reference's
  * `TableCollection.Blocks(iotValueGuid)` surface
  * (`Blockchain/BlockCollection.cs:15-162`, one LiteDB collection per
  * guid holding `Block` rows hashed as `"{ts}-{previousHash}-{data}"`,
  * `Block.cs:24-38`).
  *
  * Spark-first shape: ONE parquet store partitioned by `point_guid`
  * (every accessor filters on the guid, so partition pruning makes each
  * chain's reads touch only its own directory — the moral equivalent of
  * the reference's collection-per-guid), appended in batches whose
  * chain fold runs inside a single task per guid via `HashChain.build`
  * (the same serial-per-chain contract the reference has, parallel
  * ACROSS guids). Verification is the distributed window pass of
  * `HashChain.verify`, and `checkpointVerify` goes beyond the reference
  * — which re-walks the whole chain every time
  * (`BlockCollection.cs:124-162`) — by persisting the verified frontier
  * under `_cursor/` (underscore-prefixed: invisible to parquet
  * discovery) so steady-state verification costs O(new blocks).
  */
final class BlockStore private[catalog] (spark: SparkSession, root: String,
    guid: String, ioOptions: Map[String, String],
    checkWritable: () => Unit) {

  private val dataDir = s"$root/data"
  private val cursorDir = s"$root/_cursor/$guid"
  Files.createDirectories(Paths.get(root))
  // complete a cursor-swap a crashed checkpointVerify left behind
  graft.core.FsUtils.recoverSwap(Paths.get(cursorDir))

  private val schema = StructType(Seq(
    StructField("point_guid", StringType), StructField("ts_us", LongType),
    StructField("seq", LongType), StructField("data", StringType),
    StructField("previous_hash", StringType),
    StructField("hash", StringType)))

  /** This guid's chain, oldest first. Empty (with the block schema)
    * before the first append.
    */
  def chain: DataFrame = {
    val all =
      if (Files.exists(Paths.get(dataDir)))
        spark.read.options(ioOptions).schema(schema).parquet(dataDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    all.filter(col("point_guid") === guid).orderBy("ts_us", "seq")
  }

  def count(): Long = chain.count()

  /** The newest block (`BlockCollection.Get()`). */
  def last(): Option[Row] = lastN(1).collect().headOption

  /** The newest `n` blocks, newest first (`BlockCollection.Get(count)`). */
  def lastN(n: Int): DataFrame =
    chain.orderBy(col("ts_us").desc, col("seq").desc).limit(n)

  /** Blocks in `[startUs, endUs]` (`BlockCollection.Get(start, end)`). */
  def range(startUs: Long, endUs: Long): DataFrame =
    chain.filter(col("ts_us").between(startUs, endUs))

  /** Append a batch of (ts_us LONG, data STRING) rows as new blocks
    * chained onto the stored frontier. The batch's chain fold is one
    * task (serial within the chain, like the reference's per-collection
    * insert); returns the number of blocks appended.
    *
    * Appends are linearized per guid by an optimistic CAS claim on the
    * batch's first sequence number (the same create-wins publish shape
    * as the commit log): two writers that both read frontier seq S race
    * to create `_claims/<guid>/<S+1>`, the loser fails with
    * `ConcurrentModificationException` instead of silently FORKING the
    * chain (two blocks with the same previous_hash — the corruption the
    * reference's per-collection engine lock prevents). A claim whose
    * seq never materialized (writer crashed between claim and write)
    * goes stale after [[BlockStore.StaleClaimMs]] and is taken over.
    *
    * Takeover is FENCED: the claim carries a random owner token, the
    * slow distributed write lands in a private staging directory, and
    * only after the token re-validates is the batch published by a
    * metadata-only file move — so a claimant alive-but-slower than the
    * staleness window (long GC, slow job) aborts instead of landing a
    * second block at the taken-over seq. The residual fence→move
    * window (two adjacent filesystem ops) is closed by a post-publish
    * exactly-once check that COMPENSATES — deletes this batch's own
    * files and throws — rather than leaving a forked chain for
    * `verify()` to discover later.
    */
  def append(rows: DataFrame): Long = {
    checkWritable()
    val frontier = last()
    val seedHash = frontier.map(_.getAs[String]("hash")).getOrElse("")
    val seedSeq = frontier.map(_.getAs[Long]("seq")).getOrElse(0L)
    val firstSeq = seedSeq + 1
    val token = claim(firstSeq)
    // stage OUTSIDE the fenced window (the write job can take
    // arbitrarily long); publishing is then a per-file move
    val staging = Paths.get(
      s"$root/_staging/$guid/${java.util.UUID.randomUUID().toString.take(12)}")
    try {
      // batch-local ordering; a batch is bounded (the reference appends
      // one block per call), so the single-partition window is fine
      val ordered = rows.select(
        lit(guid).as("point_guid"), col("ts_us").cast("long").as("ts_us"),
        (row_number().over(Window.orderBy(col("ts_us"))).cast("long") +
          lit(seedSeq)).as("seq"),
        col("data").cast("string").as("data"))
      val chained = HashChain.build(spark, ordered, "point_guid", "ts_us",
        "seq", "data", seeds = Map(guid -> seedHash))
      val n = chained.count()
      chained.write.options(ioOptions).partitionBy("point_guid")
        .parquet(staging.toString)
      validateClaim(firstSeq, token)
      val moved = publishStaged(staging)
      if (chain.filter(col("seq") === firstSeq).count() > 1) {
        // a fenced-out writer interleaved inside the fence→move window:
        // undo OUR files (theirs stay — their chain is intact) and abort
        moved.foreach(Files.deleteIfExists)
        throw new java.util.ConcurrentModificationException(
          s"block chain '$guid' forked at seq $firstSeq by a concurrent " +
            "append; this batch was rolled back — re-read and retry")
      }
      n
    } finally {
      graft.core.FsUtils.deleteRecursively(staging)
      // release the claim while the token is still ours — on SUCCESS
      // (the landed seq now arbitrates duplicates, and claims must not
      // accumulate forever) and on FAILURE (a wedged claim would make
      // every retry at this seq fail 'advanced concurrently' for the
      // whole staleness window after one transient batch error). A
      // taken-over claim carries another owner's token and is left
      // alone. No takeover can interleave with this read→delete: ours
      // is fresh on the failure path and the seq has landed on the
      // success path, and either condition disables the takeover branch.
      releaseClaim(firstSeq, token)
    }
  }

  private def releaseClaim(firstSeq: Long, token: String): Unit = {
    val f = claimsDir.resolve(s"$firstSeq.claim")
    try {
      if (new String(Files.readAllBytes(f), "UTF-8") == token)
        Files.deleteIfExists(f)
    } catch { case _: java.io.IOException => () }
  }

  /** Move every staged part file into the live store (same relative
    * partition directory; Spark part-file names are globally unique).
    * Returns the destination paths for compensation.
    */
  private def publishStaged(staging: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.walk(staging)
    val parts = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith(".")).toVector
    } finally s.close()
    parts.map { p =>
      val dest = Paths.get(dataDir).resolve(staging.relativize(p))
      Files.createDirectories(dest.getParent)
      Files.move(p, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      dest
    }
  }

  private val claimsDir = Paths.get(s"$root/_claims/$guid")

  private def claim(firstSeq: Long): String = {
    Files.createDirectories(claimsDir)
    val f = claimsDir.resolve(s"$firstSeq.claim")
    val token = java.util.UUID.randomUUID().toString
    try {
      Files.write(f, token.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      token
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val age = System.currentTimeMillis() -
          Files.getLastModifiedTime(f).toMillis
        val seqLanded = !chain.filter(col("seq") === firstSeq).isEmpty
        if (!seqLanded && age > BlockStore.StaleClaimMs) {
          // crashed claimant: its batch never landed. Take over; if two
          // takers race here, CREATE_NEW arbitrates again and the loser
          // sees a FRESH claim -> conflict. The ousted claimant, if
          // merely slow, fails its token re-validation before publishing
          Files.deleteIfExists(f)
          claim(firstSeq)
        } else throw new java.util.ConcurrentModificationException(
          s"block chain '$guid' advanced concurrently at seq $firstSeq: " +
            "re-read the frontier and retry the append")
    }
  }

  /** Fencing check: we still own the claim we wrote. A taker that
    * declared us stale replaced the token (or a cleanup removed it) —
    * either way our batch must NOT publish.
    */
  private def validateClaim(firstSeq: Long, token: String): Unit = {
    val f = claimsDir.resolve(s"$firstSeq.claim")
    val owner = try new String(Files.readAllBytes(f), "UTF-8")
      catch { case _: java.io.IOException => "" }
    if (owner != token)
      throw new java.util.ConcurrentModificationException(
        s"block chain '$guid' claim at seq $firstSeq was taken over " +
          "(this writer exceeded the staleness window); batch aborted " +
          "before publish — re-read the frontier and retry")
  }

  /** Single-block insert with the reference's dedup quirk
    * (`BlockCollection.Insert`, :53-66): re-inserting the frontier's
    * exact data is a no-op returning the existing hash — after a
    * consistency check of the last two blocks, which throws on failure
    * like the reference's InvalidDataException. Returns the block hash.
    */
  def insert(data: String,
      tsUs: Long = System.currentTimeMillis() * 1000L): String = {
    val frontier = last()
    if (frontier.exists(_.getAs[String]("data") == data)) {
      if (!isConsistent(2)) throw new IllegalStateException(
        "block consistency check failed for previous block: cannot " +
          "insert new block into existing chain")
      frontier.get.getAs[String]("hash")
    } else {
      import spark.implicits._
      append(Seq((tsUs, data)).toDF("ts_us", "data"))
      last().get.getAs[String]("hash")
    }
  }

  /** Full distributed verification: every block re-hashed from stored
    * fields + every link checked (`VerifyBlockConsistency`). Adds
    * `hash_valid` / `link_valid`.
    */
  def verify(): DataFrame =
    HashChain.verify(chain, "point_guid", "ts_us", "seq", "data")

  /** True iff the newest `n` blocks all verify. Strictly STRONGER than
    * the reference's `IsBlockConsistent(count)`, which only returns the
    * LAST element's validity (`BlockCollection.cs:106-113`) — a chain
    * tampered in the middle of the window still passes there.
    */
  def isConsistent(n: Int): Boolean =
    verify().orderBy(col("ts_us").desc, col("seq").desc).limit(n)
      .filter(!col("hash_valid") || !col("link_valid")).isEmpty

  /** True iff every block in `[startUs, endUs]` verifies
    * (`IsBlockConsistent(start, end)` — again all-of, not last-of).
    */
  def isConsistent(startUs: Long, endUs: Long): Boolean =
    verify().filter(col("ts_us").between(startUs, endUs))
      .filter(!col("hash_valid") || !col("link_valid")).isEmpty

  /** Incremental verification against the persisted cursor: checks only
    * blocks appended since the last checkpointed pass (first call
    * verifies everything), then — if the suffix is clean — advances the
    * cursor. Returns the verified suffix with `hash_valid`/`link_valid`.
    */
  def checkpointVerify(): DataFrame = {
    val fresh =
      if (Files.exists(Paths.get(cursorDir))) {
        // pin the cursor VALUES (bounded: one row for this guid) into
        // the plan as a local relation. Reading the cursor parquet
        // lazily would make successive passes' plans canonically
        // identical — CacheManager/plan-reuse then serves a PRIOR
        // pass's result even though the cursor file advanced underneath
        val cur = spark.read.options(ioOptions).parquet(cursorDir)
        val pinned = spark.createDataFrame(
          java.util.Arrays.asList(cur.collect(): _*), cur.schema)
        HashChain.verifyIncremental(chain, pinned,
          "point_guid", "ts_us", "seq", "data")
      } else verify()
    val stats = fresh.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("total"),
      org.apache.spark.sql.functions.count(
        when(!col("hash_valid") || !col("link_valid"), lit(1))).as("bad"))
      .head()
    val (total, bad) = (stats.getLong(0), stats.getLong(1))
    if (bad == 0 && total > 0) {
      checkWritable()
      val cursor = HashChain.cursorFrom(
        fresh.select(schema.fieldNames.map(col): _*), "point_guid", "ts_us",
        "seq")
      val tmp = s"$cursorDir.tmp"
      cursor.write.options(ioOptions).mode("overwrite").parquet(tmp)
      graft.core.FsUtils.swapDirectory(Paths.get(tmp), Paths.get(cursorDir))
    }
    fresh
  }
}

object BlockStore {
  /** How long an unlanded append claim may block the seq before a new
    * writer treats the claimant as crashed and takes over.
    */
  val StaleClaimMs: Long = 60000L
}
