package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom-filter membership for blocklist checks at corpus scale
  * (URL blocklists, decontamination fingerprint sets, opt-out lists).
  *
  * Scale shape (100 TB): the build side collapses to at most `mBits/32`
  * rows (one per 32-bit word — int words keep the bit_or aggregation
  * portable to the DuckDB oracle) via a single bounded aggregation, then the
  * whole filter travels to the probe side as ONE broadcast row holding a
  * dense `array<long>`. The probe is a pure projection — no explode, no
  * shuffle of the big side, no per-row join — so membership runs at scan
  * speed; only the verdict aggregation (if any) shuffles.
  *
  * Hashes are md5-derived (first 48 bits of `md5(j + "|" + key)` modulo
  * `mBits`), so any engine reproduces the same bit pattern — including
  * the deterministic false positives — which keeps the operator
  * oracle-checkable. Spark's built-in `bloom_filter_agg`/`might_contain`
  * is the non-portable alternative (xxhash64-based) with the same plan
  * shape.
  */
object Bloom {

  /** Hash position j for a key: first 48 bits of md5, mod mBits. */
  def position(key: Column, j: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"$j|"), key)), 1, 12), 16, 10)
      .cast("long") % mBits

  /** Build the filter: one row with a dense `bloom: array<long>` of
    * `mBits/32` words (32 bits per word — the widest shift every engine
    * computes in a signed 64-bit lane without overflow, which keeps the
    * filter bit-identical across engines). `mBits` must be a multiple
    * of 32.
    */
  def build(keys: DataFrame, keyCol: String, numHashes: Int,
      mBits: Int): DataFrame = {
    require(mBits % 32 == 0, s"mBits must be a multiple of 32, got $mBits")
    val nWords = mBits / 32
    val pos = explode(array((0 until numHashes)
      .map(j => position(col(keyCol), j, mBits)): _*)).as("pos")
    // Dense assembly must stay O(nWords log nWords): a map-backed
    // `transform(sequence(...), i -> m[i])` is quadratic, because
    // Catalyst map lookup is a LINEAR scan of the entry array — at
    // mBits sized for a 10^5-key blocklist that one expression cost
    // more than the rest of the query. Instead: left-join the sparse
    // bit_or rows onto the dense word range (zero-fill), then one
    // sorted collect; entries arrive (word_idx, bits)-sorted, so the
    // final projection is a linear strip of the sort key.
    val sparse = keys.select(pos)
      .select((col("pos") / 32).cast("int").as("word_idx"),
        (col("pos") % 32).cast("int").as("bit"))
      .groupBy("word_idx")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").as("bits"))
    keys.sparkSession.range(nWords)
      .select(col("id").cast("int").as("word_idx"))
      .join(sparse, Seq("word_idx"), "left")
      .agg(array_sort(collect_list(
        struct(col("word_idx"), coalesce(col("bits"), lit(0L)).as("bits"))))
        .as("entries"))
      .select(transform(col("entries"), e => e.getField("bits")).as("bloom"))
  }

  /** Fail loudly when the filter is saturated. FP rate ~= load^k where
    * load = set-bit share: a blocklist that outgrew `mBits` silently
    * degrades `bloom_hit` toward constant-true (the filter still
    * "works", it just stops filtering) — at corpus scale that silent
    * degradation must be an error, not a perf cliff. The check is one
    * action over the single filter row (<= mBits/32 words).
    */
  def requireUnsaturated(bloomRow: DataFrame, mBits: Int,
      maxLoad: Double = 0.5): DataFrame = {
    val setBits = bloomRow.select(
      aggregate(transform(col("bloom"), w => bit_count(w)),
        lit(0), (a, b) => a + b).as("set_bits"))
      .head().getInt(0)
    val load = setBits.toDouble / mBits
    require(load <= maxLoad,
      f"Bloom filter saturated: $setBits of $mBits bits set " +
        f"(load $load%.2f > $maxLoad%.2f) — size mBits to the blocklist " +
        "(~14 bits/key for 1%% FP) instead of probing a filter that " +
        "passes everything")
    bloomRow
  }

  /** In-plan saturation guard: same check as [[requireUnsaturated]] but
    * embedded as a filter over the one-row build, so it costs zero extra
    * Spark jobs — the assertion evaluates once when the filter row is
    * materialized for broadcast, and a saturated filter fails the query
    * instead of silently passing everything. Prefer this form inside
    * composed queries; use [[requireUnsaturated]] when a driver-side
    * checkpoint between build and probe is wanted.
    */
  def guard(bloomRow: DataFrame, mBits: Int,
      maxLoad: Double = 0.5): DataFrame = {
    val setBits = aggregate(transform(col("bloom"), w => bit_count(w)),
      lit(0), (a, b) => a + b)
    bloomRow.where(coalesce(
      assert_true(setBits.cast("double") / mBits <= maxLoad,
        concat(lit("Bloom filter saturated: "), setBits.cast("string"),
          lit(s" of $mBits bits set (load > $maxLoad) — size mBits to the " +
            "blocklist (~14 bits/key for 1% FP) instead of probing a " +
            "filter that passes everything"))),
      lit(true)))
  }

  private val BitMasks: Column =
    array((0 until 32).map(b => lit(1L << b)): _*)

  /** Probe: attach `bloom_hit` to every row of `df` by testing all
    * `numHashes` positions of `keyCol` against the broadcast filter row.
    * Pure projection after the 1-row broadcast join.
    */
  def probe(df: DataFrame, keyCol: String, bloomRow: DataFrame,
      numHashes: Int, mBits: Int): DataFrame = {
    // internal name so a user column called "bloom" can't collide
    val filterRow = bloomRow.select(col("bloom").as("_graft_bloom"))
    val hit = (0 until numHashes).map { j =>
      val p = position(col(keyCol), j, mBits)
      val word = element_at(col("_graft_bloom"), (p / 32).cast("int") + 1)
      val mask = element_at(BitMasks, (p % 32).cast("int") + 1)
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
    df.crossJoin(broadcast(filterRow))
      .withColumn("bloom_hit", hit)
      .drop("_graft_bloom")
  }
}
