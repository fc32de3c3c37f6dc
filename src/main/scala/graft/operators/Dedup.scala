package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Distributed deduplication operators for training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one shuffle on a 16-byte hash — the minimum possible;
  *  - MinHash/LSH turns the O(n²) pair problem into a shuffle on band
  *    buckets; bucket skew is bounded because signatures are uniform;
  *  - candidate verification joins only within buckets, never cross.
  *
  * MinHash here uses `min(md5(seed || shingle))` per seed — deterministic,
  * engine-portable (the DuckDB oracle computes the identical value), and a
  * valid min-wise permutation family for Jaccard estimation.
  */
object Dedup {

  /** Canonical-row exact dedup: group on normalized-content hash, keep the
    * smallest id. One shuffle; partial agg does the map-side combine.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** One MinHash value: min over shingles of md5(seed || shingle). */
  def minhashValue(shingles: Column, seed: Int): Column =
    array_min(transform(shingles, sh => md5(concat(lit(seed.toString), lit("|"), sh))))

  /** MinHash signature of `k` hashes over character `n`-gram shingles. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = charShingles(text, n)
    array((0 until k).map(i => minhashValue(sh, i)): _*)
  }

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`,
    * each band hashed to one bucket key.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", lit(b.toString),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))))
    }: _*)

  /** Band keys from per-hash columns: each minhash is referenced exactly
    * once. The array form above slices one sig-array expression, which
    * Catalyst inlines — every band key then recomputes the WHOLE k-hash
    * signature (k*bands evaluations/row instead of k; q48 lesson).
    */
  def lshBandKeysFromCols(sigs: Seq[Column], bands: Int,
      rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", lit(b.toString),
        concat_ws(",", sigs.slice(b * rowsPerBand, (b + 1) * rowsPerBand): _*)))
    }: _*)

  /** MinHash+LSH near-duplicate candidate pairs (id1 < id2), verified with
    * true shingle-set Jaccard >= `threshold`.
    *
    * Banding default is 2 bands x 4 rows (collision threshold ~(1/b)^(1/r)
    * = 0.84): on near-dup-heavy corpora a 4x2 banding collides every
    * moderately-similar pair (measured 918k candidates vs 3.7k at sf0.1,
    * a 10x query-time difference) - band width, not band count, is what
    * bounds the candidate space.
    *
    * Plan shape: explode band keys → shuffle on (band, bucket) → within-
    * bucket self-join → distinct pairs → verify. No cross-bucket pairs are
    * ever materialized, so this survives 100× scale-up.
    *
    * `maxBucketSize` caps the band-bucket size: within-bucket pair emission
    * is quadratic in bucket size, and on real web corpora one
    * boilerplate-heavy shard (identical headers/footers minhashed into the
    * same band) can put millions of docs in one bucket — the standard
    * guard (Leskovec et al., MMDS ch.3 practice) is to DROP buckets above
    * a threshold: a bucket that large is boilerplate collision, not a dup
    * cluster, and its pairs would be verified away at O(n²) cost. The
    * filter runs on the already-bucket-partitioned exchange (window count,
    * no extra shuffle or scan) BEFORE the self-join, so the quadratic
    * product of a pathological bucket is never generated. Dropped buckets
    * are observable via [[lshBucketStats]] with the same parameters.
    */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 8, bands: Int = 2,
      threshold: Double = 0.5,
      wordGrams: Option[Int] = None,
      maxBucketSize: Int = 8192): DataFrame = {
    // `wordGrams = Some(g)` shingles on word g-grams instead of character
    // n-grams: ~6x fewer shingles per document at the same dedup quality,
    // so 6x fewer minhash evaluations — the right default for documents
    // (char shingles remain for short/no-whitespace content)
    // word-gram shingles use the native one-pass expression (the HOF form
    // re-evaluates the token subtree per window inside an interpreted
    // lambda); already-distinct output, so no array_distinct needed
    val shsExpr = wordGrams match {
      case Some(g) => graft.functions.GraftFunctions.word_shingles(
        tokens(col(textCol)), g)
      case None => array_distinct(charShingles(col(textCol), shingleN))
    }
    // shingle sets computed ONCE per doc behind a shuffle barrier — without
    // it Catalyst collapses the projection into the pair join and
    // re-shingles per candidate (the q25 lesson; see
    // jaccardPairsByCooccurrence)
    val sh = docs.select(col(idCol).as("id"), shsExpr.as("shs"))
      .repartition(col("id"))
    val bandKeysExpr =
      lshBandKeys(col(textCol), col("shs"), wordGrams, k, bands)
    val bucketSrc = wordGrams match {
      case Some(_) => docs.select(col(idCol).as("id"),
        bandKeysExpr.as("_bk")).repartition(col("id"))
      case None => sh.select(col("id"), bandKeysExpr.as("_bk"))
    }
    // repartition on bucket: the self-join co-partitions AND both sides
    // resolve to one reused exchange, so the signature computation runs
    // once, not once per join side
    // bucket-size cap as a window count over the SAME bucket-partitioned
    // exchange the self-join uses — both join sides still canonicalize to
    // one reused subtree, so the guard costs one in-partition sort, zero
    // extra shuffles, zero extra scans
    val bucketsAll = bucketSrc
      .select(col("id"), explode(col("_bk")).as("bucket"))
      .repartition(col("bucket"))
    // maxBucketSize <= 0 disables the guard (dev/audit escape hatch)
    val buckets =
      if (maxBucketSize <= 0) bucketsAll
      else bucketsAll
        .withColumn("_bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
        .filter(col("_bsz") <= maxBucketSize)
        .drop("_bsz")
    // shuffle-hash hint: with both sides co-partitioned on bucket the two
    // join inputs canonicalize to ONE reused exchange; a broadcast build
    // would re-run the whole signature computation on the build side
    val pairs = buckets.as("a").hint("shuffle_hash")
      .join(buckets.as("b").hint("shuffle_hash"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    // the verify sides are CORPUS-sized (every doc's shingle set) and
    // the pair side is OUTPUT-sized — neither is ever broadcastable at
    // scale. Without the hint, the size ESTIMATE of the shingle
    // projection (computed column, default stats; highly compressible
    // text shrinks the AQE runtime bytes too) can fall under the
    // broadcast threshold: measured at the sf100-documents decade, the
    // planner broadcast the 5M-doc shingle table and exhausted the 8 GB
    // heap. MERGE (not shuffle_hash): a hash build over per-doc shingle
    // ARRAYS cannot spill and failed memory acquisition at the same
    // decade — sort-merge spills both sides and is the only shape with
    // no per-partition memory floor.
    val shKeyed = sh.hint("merge")
    val verify = pairs
      .join(shKeyed.select(col("id").as("id1"), col("shs").as("s1")), "id1")
      .join(shKeyed.select(col("id").as("id2"), col("shs").as("s2")), "id2")
    verify
      .select(col("id1"), col("id2"),
        round(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          greatest(size(array_union(col("s1"), col("s2"))), lit(1))
            .cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Band-bucket occupancy audit for [[minhashLshPairs]] — same band-key
    * computation, aggregated to one row per bucket with the size and
    * whether the cap drops it. This is the observability surface for the
    * `maxBucketSize` guard: run it with the pair-gen parameters to see how
    * much of the corpus a cap excludes before trusting the capped output.
    * One scan + one count-agg (map-side combined) — linear at any scale.
    */
  /** The ONE construction point for LSH band keys, shared by pair-gen
    * and its occupancy audit so the two can never desynchronize. For the
    * word-gram path, one native one-pass expression (tokens -> shingles
    * -> k minhashes -> band keys): the composable HOF pipeline cannot
    * enter codegen and interprets k md5 trees per shingle (measured 4 s
    * of q48's 5 s). The char-shingle path keeps the composable form over
    * the caller-supplied shingle column (same semantics, fewer callers).
    */
  private def lshBandKeys(textCol: org.apache.spark.sql.Column,
      shingles: org.apache.spark.sql.Column,
      wordGrams: Option[Int], k: Int, bands: Int): org.apache.spark.sql.Column =
    wordGrams match {
      case Some(g) =>
        graft.functions.GraftFunctions.lsh_band_keys(tokens(textCol), g, k, bands)
      case None =>
        // same contract as the native path (LshBandKeysExpr requires it):
        // silently flooring k / bands would band over fewer minhashes
        // than the (1/b)^(1/r) threshold the scaladoc advertises
        require(k % bands == 0, s"k ($k) must divide into bands ($bands)")
        val sigs = (0 until k).map(i => minhashValue(shingles, i))
        lshBandKeysFromCols(sigs, bands, k / bands)
    }

  def lshBucketStats(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, k: Int = 8, bands: Int = 2,
      wordGrams: Option[Int] = None,
      maxBucketSize: Int = 8192): DataFrame = {
    val bandKeysExpr = lshBandKeys(col(textCol),
      array_distinct(charShingles(col(textCol), shingleN)),
      wordGrams, k, bands)
    docs.select(col(idCol).as("id"), explode(bandKeysExpr).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"))
      // maxBucketSize <= 0 means "guard disabled" in minhashLshPairs;
      // the audit must report the same thing (nothing dropped), not the
      // opposite (everything dropped)
      .withColumn("dropped",
        if (maxBucketSize > 0) col("n_docs") > maxBucketSize else lit(false))
  }

  /** Cross-corpus MinHash+LSH decontamination matches — the fuzzy
    * companion of exact n-gram decontamination: candidate (train, eval)
    * pairs come from band-key collisions, verified with CONTAINMENT
    * |T∩E| / |E| (not Jaccard — the right measure when an eval doc may be
    * embedded inside a much larger train doc).
    *
    * Scale shape (100 TB): the eval/benchmark side is always small, so
    * every eval artifact (band buckets, shingle sets, the surviving
    * candidate pair set) is BROADCAST; the corpus side is scanned once at
    * full band-key cost plus a ~0.4% hash-sampled slice for the
    * bucket-cap guard, map-side only — band keys via the native one-pass
    * expression, candidates and verification resolved by broadcast hash
    * joins. The corpus never shuffles; only the candidate pairs (bounded
    * by band collisions) do, in the distinct.
    */
  def minhashLshCrossMatches(corpus: DataFrame, corpusId: String,
      evalSet: DataFrame, evalId: String, textCol: String,
      wordGrams: Int = 2, k: Int = 8, bands: Int = 2,
      threshold: Double = 0.5,
      maxBucketSize: Int = 65536): DataFrame = {
    // CONTRACT: `evalSet` is the bounded side (a benchmark suite or one
    // ingest increment — thousands to low millions of docs), and the
    // broadcasts below encode that asymmetry; the corpus side never
    // shuffles. An eval set that is a constant FRACTION of the corpus
    // (the catalog's modulo splits are testdata stand-ins) violates the
    // contract and fails loudly at Spark's broadcast size limit — for
    // symmetric corpus-vs-corpus matching use lshBandedPairs, whose
    // banded self-join shuffles both sides.
    def shExpr = graft.functions.GraftFunctions.word_shingles(
      tokens(col(textCol)), wordGrams)
    def bkExpr = graft.functions.GraftFunctions.lsh_band_keys(
      tokens(col(textCol)), wordGrams, k, bands)
    // eval band keys materialize ONCE (bounded side by contract): three
    // consumers below — the bucket-key set for the guard's semi-join, the
    // guard's anti-join, and the candidate broadcast — would otherwise
    // each re-scan the eval table and recompute its band keys
    val evalBucketsAll = evalSet
      .select(col(evalId).as("eval_id"), bkExpr.as("_bk"))
      .select(col("eval_id"), explode(col("_bk")).as("bucket"))
      .localCheckpoint(true)
    val corpusBuckets = corpus.select(col(corpusId).as("train_id"), bkExpr.as("_bk"))
      .select(col("train_id"), explode(col("_bk")).as("bucket"))
    // Band-bucket cap, the cross-corpus analog of minhashLshPairs's guard:
    // one boilerplate band key shared by an eval doc and millions of train
    // docs would explode the candidate join. The corpus must NOT shuffle,
    // so the guard is a separate counting pass: compute corpus band keys,
    // broadcast-semi-join to the (bounded) eval bucket-key set so only
    // colliding buckets are counted, map-side-combine to one count per
    // bucket (output bounded by |eval buckets|), and drop the pathological
    // buckets from the EVAL side before candidate generation — the
    // quadratic product of a dropped bucket is never generated.
    //
    // The counting pass SAMPLES the corpus: band keys (tokenize + minhash)
    // are the dominant cost of this whole operator, and counting them
    // exactly would double it. The sample is a deterministic hash-mod on
    // the doc id (never df.sample — partitioning-dependent), at a rate
    // that puts ~256 expected sampled docs in a bucket sitting AT the
    // threshold, so detection at the default cap is ±6% (Poisson), and
    // caps <= 256 count exactly. A pathology guard needs a reliable trip
    // wire, not an exact census; cost falls from a second full band-key
    // scan to ~0.4% of one at the default cap.
    // maxBucketSize <= 0 disables the guard (dev/audit escape hatch).
    // A corpus with <= maxBucketSize rows provably cannot overfill any
    // bucket, so the guard's broadcast-stage chain is skipped outright —
    // the check reads at most maxBucketSize+1 ids (limit short-circuits
    // the scan), so it is cheap at 100 TB and free-ish below the cap.
    val capPlus1 =
      if (maxBucketSize >= Int.MaxValue) Int.MaxValue else maxBucketSize + 1
    val guardNeeded = maxBucketSize > 0 &&
      corpus.select(col(corpusId)).limit(capPlus1).count() > maxBucketSize
    val evalBuckets = if (!guardNeeded) evalBucketsAll else {
      val evalBucketKeys = evalBucketsAll.select("bucket").distinct()
      val sampleDen = 1L << 16
      val sampleNum = math.max(1L, math.min(sampleDen,
        math.round(256.0 / maxBucketSize * sampleDen)))
      val guardSrc =
        if (sampleNum >= sampleDen) corpus
        else corpus.filter(
          pmod(xxhash64(col(corpusId)), lit(sampleDen)) < lit(sampleNum))
      val guardBuckets = guardSrc
        .select(col(corpusId).as("train_id"), bkExpr.as("_bk"))
        .select(col("train_id"), explode(col("_bk")).as("bucket"))
      val sampledCap =
        if (sampleNum >= sampleDen) maxBucketSize.toLong
        else maxBucketSize.toLong * sampleNum / sampleDen
      val overloaded = guardBuckets
        .join(broadcast(evalBucketKeys), "bucket")
        .groupBy("bucket").agg(count(lit(1)).as("_n_train"))
        .filter(col("_n_train") > sampledCap)
        .select("bucket")
      evalBucketsAll.join(broadcast(overloaded), Seq("bucket"), "left_anti")
    }
    // materialize candidates ONCE: the two broadcasts below are distinct
    // subtrees with no exchange reuse, so without this the full-corpus
    // band-key scan — the expensive pass — would execute twice
    val cand = corpusBuckets.join(broadcast(evalBuckets), "bucket")
      .select("train_id", "eval_id").distinct().localCheckpoint(true)
    val evalSh = evalSet.select(col(evalId).as("eval_id"), shExpr.as("eshs"))
    // candidate filter BEFORE the shingle projection — and the pair
    // expansion AFTER it: the broadcast semi-filter runs on the raw
    // (id, text) scan so the second corpus pass shingles only candidate
    // docs, and each candidate doc shingles ONCE even when it matches
    // several eval docs (projecting after the pair join would recompute
    // the set per pair)
    corpus.select(col(corpusId).as("train_id"), col(textCol))
      .join(broadcast(cand.select("train_id").distinct()), "train_id")
      .select(col("train_id"), shExpr.as("tshs"))
      .join(broadcast(cand), "train_id")
      .join(broadcast(evalSh), "eval_id")
      .select(col("train_id"), col("eval_id"),
        round(size(array_intersect(col("tshs"), col("eshs"))).cast("double") /
          greatest(size(col("eshs")), lit(1)).cast("double"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup over
    * embedding clusters. Within each IVF cell, vectors whose cosine ≥
    * `eps` form near-dup components; each component keeps ONE
    * representative — the member nearest the cell centroid (rounded-L2,
    * id tiebreak), the paper's "closest to centroid" policy made
    * deterministic. Everything else in the component is dropped;
    * singletons keep themselves.
    *
    * Scale: the cell IS the blocking key (bounded by the Voronoi
    * partition — nlist scales with the corpus exactly as SemDeDup's
    * cluster count does), so pair generation is the q45 shape and the
    * component pass is the single-shuffle blocked union-find. The
    * centroid distance reuses the assignment fold's arithmetic — no
    * second pass over the vectors.
    *
    * Output: (id, cell, centroid_dist, cluster_id, keep). Rows with a
    * null embedding are absent from the output — they cannot be
    * semantically compared, and admitting their sentinel cell (-1) to
    * pair generation would form one unbounded block.
    */
  /** Winnowing fingerprint postings (Schleimer et al. 2003, the MOSS
    * local fingerprinting scheme): hash every `k`-char gram to a 48-bit
    * md5 value, slide a `w`-hash window, select each window's minimum,
    * emit the distinct selected values per document. Guarantees a match
    * whenever two docs share a run of at least `w + k - 1` chars, at a
    * fingerprint density of ~2/(w+1) — the partial-overlap dedup index
    * between whole-doc hashing (q27) and all-shingle indexes (q25).
    *
    * Scale shape (100 TB): a PURE MAP — the whole per-doc fingerprint
    * set comes from the native one-pass `winnow_fps` expression
    * (`WinnowExpr`), so winnowing adds zero shuffle at any corpus size
    * and the O(len·w) scan runs as a tight JVM loop inside whole-stage
    * codegen. The expression exists because every composable shape
    * measured slow at sf0.1 (1.5 M grams): a per-row array HOF
    * re-evaluates the hash array per window (no subexpression
    * elimination in interpreted lambdas — O(len²) md5, 40x slower); an
    * explode → re-aggregate pipeline hashes once but pays a corpus-wide
    * shuffle plus ~1.5 M interpreted lambda window evals (~3.2 s vs
    * ~0.4 s native).
    */
  def winnowPostings(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame =
    docs.select(col(idCol),
      explode(graft.functions.GraftFunctions
        .winnow_fps(col(textCol), k, w)).as("fp"))

  /** The composable twin of [[winnowPostings]] — grams via codegen
    * posexplode, md5 once per gram, per-doc re-aggregation, window HOF.
    * Kept as the executable specification the native expression is
    * pinned bit-identical to (DedupSpec); not the production path.
    */
  def winnowPostingsComposable(docs: DataFrame, idCol: String,
      textCol: String, k: Int, w: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), col(textCol).as("_t"),
        posexplode(sequence(lit(1),
          greatest(length(col(textCol)) - (k - 1), lit(1))))
          .as(Seq("_i0", "pos")))
      .select(col(idCol), col("pos"),
        substring(md5(expr(s"substring(_t, pos, $k)")), 1, 12).as("h"))
    val agged = grams.groupBy(idCol)
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("h")))),
        s => s.getField("h")).as("hs"))
    agged.select(col(idCol),
      explode(array_distinct(transform(
        // full windows only; a doc shorter than w hashes keeps its
        // single all-hash window, matching the list semantics
        sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
        i => array_min(slice(col("hs"), i, lit(w)))))).as("fp"))
  }

  def semDedupKeepList(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Float])], eps: Double): DataFrame = {
    // null embeddings carry the sentinel cell -1 out of ivfAssign; they
    // must not enter pair generation (they would form ONE unbounded block
    // whose cross-product is enumerated before the null cosines filter)
    val assigned = graft.operators.Similarity
      .ivfAssign(vectors, idCol, vecCol, centroids)
      .filter(col("cell") =!= -1L)
      .select(col(idCol).as("id"), col("cell"), col(vecCol).as("v"),
        round(least(centroids.sortBy(_._1).map { case (_, cv) =>
          graft.operators.Similarity.l2(col(vecCol), typedLit(cv))
        }: _*), 6).as("centroid_dist"))
      .repartition(col("cell"))
    val pairs = assigned.as("a").hint("shuffle_hash")
      .join(assigned.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.cell").as("block_key"),
        round(graft.operators.Similarity.cosine(col("a.v"), col("b.v")), 6)
          .as("score"))
      .filter(col("score") >= eps)
    val labels = clusterPairsBlocked(pairs, "block_key")
    val ranked = assigned.select(col("id"), col("cell"), col("centroid_dist"))
      .join(labels, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
          .orderBy(col("centroid_dist").asc, col("id").asc)))
    ranked.select(col("id"), col("cell"), col("centroid_dist"),
      col("cluster_id"), (col("_rk") === 1).as("keep"))
  }

  /** SemDeDup (Abbas et al. 2023) in its SCALING regime: cluster count
    * grows with the corpus so cell sizes stay bounded and total work
    * stays near-linear. Blocking uses sign-LSH cells with
    * `bits = min{b : 2^b · targetCellSize ≥ N}` (integer rule, no
    * floating log — both engines pick the identical b): assignment is
    * O(N·bits·dim) — a per-row fold, NO per-centroid scan — so unlike a
    * fixed-nlist Voronoi config neither assignment nor pair generation
    * is quadratic in N. The kept representative is the member nearest
    * its CELL CENTROID (exact fixed-point per-position mean, order-
    * independent and oracle-replicable), preserving the published
    * keep-nearest-centroid semantics. Pair generation is O(N·
    * targetCellSize) in expectation; grossly skewed cells fail loudly at
    * clusterPairsBlocked's maxBlockEdges guard. The cell-mean table is
    * N/targetCellSize rows (broadcastable up to ~10M vectors per
    * executor-GiB; beyond that, swap the broadcast for a shuffle join —
    * the shape is otherwise unchanged).
    */
  def semDedupScaled(vectors: DataFrame, idCol: String, vecCol: String,
      eps: Double, dim: Int, targetCellSize: Int = 128): DataFrame = {
    import graft.operators.Similarity
    val valid = vectors.filter(col(vecCol).isNotNull)
    val n = valid.count()
    val bits = (4 to 20)
      .find(b => (1L << b) * targetCellSize >= n).getOrElse(20)
    val planes = Similarity.hyperplanes(bits, dim)
    val assigned = valid
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("cell", Similarity.signBucket(col("v"), planes))
      .repartition(col("cell"))
    // exact per-cell mean: fixed-point (1e-6) longs summed in DECIMAL —
    // order-independent, so the centroid is bit-identical across engines
    // and partitionings (same contract as Similarity.kmeansStep)
    val means = assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("cell", "p")
      .agg(round(sum(round(col("x").cast("double") * lit(1000000.0))
          .cast("long").cast("decimal(38,0)")).cast("double") /
        (count(lit(1)) * lit(1000000.0)), 6).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        e => e.getField("m").cast("float")).as("mv"))
    val withDist = assigned
      .join(broadcast(means), Seq("cell"))
      .withColumn("centroid_dist",
        round(Similarity.l2(col("v"), col("mv")), 6))
      .select(col("id"), col("cell"), col("v"), col("centroid_dist"))
    val pairs = withDist.as("a").hint("shuffle_hash")
      .join(withDist.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.cell").as("block_key"),
        round(Similarity.cosine(col("a.v"), col("b.v")), 6).as("score"))
      .filter(col("score") >= eps)
    val labels = clusterPairsBlocked(pairs, "block_key")
    val ranked = withDist.select(col("id"), col("cell"), col("centroid_dist"))
      .join(labels, Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
          .orderBy(col("centroid_dist").asc, col("id").asc)))
    ranked.select(col("id"), col("cell"), col("centroid_dist"),
      col("cluster_id"), (col("_rk") === 1).as("keep"))
  }

  /** True Jaccard over distinct character n-gram shingle sets. */
  def jaccardShingles(t1: Column, t2: Column, n: Int): Column = {
    val s1 = array_distinct(charShingles(t1, n))
    val s2 = array_distinct(charShingles(t2, n))
    size(array_intersect(s1, s2)).cast("double") /
      greatest(size(array_union(s1, s2)), lit(1)).cast("double")
  }

  /** Token-set Jaccard near-dup pairs at scale: instead of joining full
    * token arrays and intersecting per pair (O(pairs × |set|²) interpreted
    * array ops, evaluated inside the join condition), explode distinct
    * tokens and count co-occurrences — a pure codegen'd hash-join +
    * hash-agg pipeline. jaccard = common / (n1 + n2 - common), identical to
    * |A∩B| / |A∪B| on distinct sets.
    *
    * `blockCols` bound the candidate space (same-language + length-bucket
    * here; LSH band keys at larger scale).
    */
  def jaccardPairsByCooccurrence(
      docs: DataFrame, idCol: String, toks: Column,
      blockCols: Seq[Column], threshold: Double,
      emitBlockKey: Boolean = false): DataFrame = {
    val base = docs.select(
      (col(idCol).as("id") +: toks.as("toks") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"_b$i") }): _*)
    val bNames = blockCols.indices.map(i => s"_b$i")
    val counts = base.select(
      (col("id") +: size(col("toks")).as("n") +: bNames.map(col)): _*)
    val exploded = base.select(
      (col("id") +: explode(col("toks")).as("token") +: bNames.map(col)): _*)
    // the partial agg runs over every co-occurring token pair, so the group
    // key stays the narrow (id1, id2); set sizes re-attach afterwards via
    // joins on the (small) surviving pair set (measured faster than
    // carrying n1/n2/block through the wide-key groupBy)
    val co = exploded.as("a").hint("shuffle_hash")
      .join(exploded.as("b").hint("shuffle_hash"),
        bNames.map(n => col(s"a.$n") === col(s"b.$n"))
          .reduce(_ && _) && col("a.token") === col("b.token") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("common"))
    val scored = co
      .join(counts.select(col("id").as("id1"), col("n").as("n1")), "id1")
      .join(counts.select(col("id").as("id2"), col("n").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(col("common").cast("double") /
          greatest(col("n1") + col("n2") - col("common"), lit(1)).cast("double"),
          6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    if (emitBlockKey) {
      // block cols are functions of the id; re-attach to the surviving
      // pairs with a plain join — blockOf is one row per DOCUMENT, so a
      // forced broadcast would not survive corpus scale (AQE still
      // broadcasts it when it is actually small)
      val blockOf = counts.select(col("id").as("id1"),
        concat_ws("\u0001", bNames.map(col): _*).as("block_key"))
      scored.join(blockOf, "id1")
    } else scored
  }

  /** Prefix-filtered token-set Jaccard pairs (the PPJoin prefix principle,
    * exact): two distinct-token sets with J >= t MUST share a token within
    * each one's prefix of length |d| - ceil(t*|d|) + 1 under ANY global
    * token order. Ordering tokens rarest-first (ascending document
    * frequency, token tiebreak) makes prefixes maximally selective, so the
    * candidate self-join explodes only ~(1-t) of each doc's tokens and
    * joins mostly-rare keys — the quadratic (token, block) group products
    * of the plain co-occurrence join shrink superlinearly. Candidates are
    * then verified EXACTLY on the full sets (array_intersect), so results
    * are identical to `jaccardPairsByCooccurrence`.
    *
    * Cost shape: +1 aggregation (document frequencies) and +1 per-doc
    * sort vs the co-occurrence form; wins whenever candidate volume
    * dominates — i.e. precisely the corpora where pair-gen is the
    * bottleneck. `toks` must be distinct sets (as with the co-occurrence
    * form).
    *
    * Measured (local[32], q25 parameters): sf0.1 co-occurrence 1.15 s vs
    * prefix 2.93 s (fixed overhead dominates small blocks); sf1 8.87 s vs
    * 8.80 s (crossover). The catalog keeps the co-occurrence form — faster
    * at bench scale — and this is the documented path once per-block
    * candidate volume grows past the sf1 crossover (100 TB corpora).
    */
  def jaccardPairsPrefix(
      docs: DataFrame, idCol: String, toks: Column,
      blockCols: Seq[Column], threshold: Double,
      emitBlockKey: Boolean = false): DataFrame = {
    val base = docs.select(
      (col(idCol).as("id") +: toks.as("toks") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"_b$i") }): _*)
    val bNames = blockCols.indices.map(i => s"_b$i")
    val exploded = base.select(
      (col("id") +: explode(col("toks")).as("token") +: bNames.map(col)): _*)
    // global canonical order: ascending df, token string tiebreak (any
    // total order is correct; rare-first is the selective one)
    val dfreq = exploded.groupBy("token").agg(count(lit(1)).as("df"))
    // prefix length: |d| - ceil(t*|d|) + 1, computed in DECIMAL so the
    // ceil can never round the wrong way off a float artifact (a too-small
    // prefix would silently drop true pairs); |d| = size(ordered) because
    // the token sets are distinct
    val prefix = exploded.join(dfreq, "token")
      .groupBy((col("id") +: bNames.map(col)): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("token"))))
        .as("ordered"))
      .withColumn("_plen",
        (size(col("ordered")) - ceil(size(col("ordered")) *
          lit(java.math.BigDecimal.valueOf(threshold))) + 1).cast("int"))
      .select(
        (col("id") +:
          transform(slice(col("ordered"), lit(1), col("_plen")),
            s => s.getField("token")).as("ptoks") +:
          bNames.map(col)): _*)
    val prefExploded = prefix.select(
      (col("id") +: explode(col("ptoks")).as("token") +: bNames.map(col)): _*)
    val cand = prefExploded.as("a").hint("shuffle_hash")
      .join(prefExploded.as("b").hint("shuffle_hash"),
        bNames.map(n => col(s"a.$n") === col(s"b.$n"))
          .reduce(_ && _) && col("a.token") === col("b.token") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    // corpus-sized array column: never broadcastable, and a hash build
    // over arrays cannot spill — same two measured sf100-documents
    // failure modes as minhashLshPairs' verify joins; sort-merge is the
    // no-memory-floor shape
    val sets = base.select(col("id"), col("toks")).hint("merge")
    val scored = cand
      .join(sets.select(col("id").as("id1"), col("toks").as("s1")), "id1")
      .join(sets.select(col("id").as("id2"), col("toks").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        round(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          greatest(size(array_union(col("s1"), col("s2"))), lit(1))
            .cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    if (emitBlockKey) {
      val blockOf = base.select(col("id").as("id1"),
        concat_ws("\u0001", bNames.map(col): _*).as("block_key"))
      scored.join(blockOf, "id1")
    } else scored
  }

  /** Jaccard over distinct whitespace-token sets (vocabulary overlap). */
  def jaccardTokens(t1: Column, t2: Column): Column = {
    val s1 = array_distinct(tokens(t1))
    val s2 = array_distinct(tokens(t2))
    size(array_intersect(s1, s2)).cast("double") /
      greatest(size(array_union(s1, s2)), lit(1)).cast("double")
  }

  /** 64-bit SimHash over whitespace tokens. Per token, its xxhash64 votes
    * ±1 on each bit; the sign of each bit's total forms the fingerprint.
    * Native one-pass expression (Simhash64Expr, codegen'd); xxhash64 is
    * engine-specific, so verified by property tests rather than the SQL
    * oracle.
    */
  def simhash64(text: Column): Column =
    graft.functions.GraftFunctions.simhash64(array_distinct(tokens(text)))

  /** Composable reference form of simhash64 (64 interpreted folds) — kept
    * for the equivalence test against the native expression.
    */
  def simhash64Composable(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Engine-portable SimHash over whitespace tokens, keyed on md5 (first
    * 64 bits of each token's digest), emitted as a 16-char hex string. Same
    * vote semantics as simhash64; use this variant where the fingerprint
    * must be reproducible outside Spark (oracle gates, mixed-engine
    * pipelines). Native one-pass expression (SimhashMd5Expr, codegen'd).
    */
  def simhashMd5(text: Column): Column =
    graft.functions.GraftFunctions.simhash_md5(array_distinct(tokens(text)))

  /** SimHash near-duplicate pairs by banded Hamming distance (Manku,
    * Jain & Sarma, WWW'07 — the web-crawl near-dup detector). Each doc's
    * 64-bit md5-keyed simhash is split into `bands` equal bit-blocks;
    * docs sharing ANY identical block are candidates, and a candidate
    * pair is a near-dup when the full 64-bit Hamming distance is at most
    * `maxHamming`.
    *
    * Unlike MinHash LSH, this banding is EXACT, not probabilistic: with
    * `maxHamming < bands`, a qualifying pair has fewer differing bits
    * than blocks, so by pigeonhole at least one block is bit-identical
    * and the pair is guaranteed to surface — zero recall loss. The
    * brute-force O(n²) scan and this plan compute the same set (the
    * oracle verifies exactly that).
    *
    * Plan shape (100 TB): one scan computes the fingerprint (native
    * codegen SimhashMd5Expr) plus its two 32-bit halves, explodes to
    * `bands` rows, and shuffles once on the block key; the self-join
    * runs within buckets on the SAME reused exchange (shuffle-hash, both
    * sides co-partitioned), and the Hamming verify is two codegen
    * bit_count(xor) ops on columns already carried through the explode —
    * no second scan, no verify join. `maxBucketSize` drops pathological
    * buckets (the all-zero fingerprint of empty/near-empty docs is the
    * classic one) before the quadratic pair emission, mirroring
    * [[minhashLshPairs]]'s guard.
    */
  def simhashHammingPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 8192): DataFrame = {
    require(bands > 0 && 16 % bands == 0,
      s"bands must divide the 16-nibble fingerprint, got $bands")
    require(maxHamming < bands,
      s"banding is exact only for maxHamming < bands " +
        s"(pigeonhole), got maxHamming=$maxHamming bands=$bands")
    val width = 16 / bands
    // fingerprint + halves computed once per doc behind a shuffle
    // barrier (the minhashLshPairs lesson: without it the projection
    // collapses into the join and recomputes per candidate)
    val sigs = docs
      .select(col(idCol).as("id"), simhashMd5(col(textCol)).as("sig"))
      .select(col("id"), col("sig"),
        conv(substring(col("sig"), 1, 8), 16, 10).cast("long").as("hi"),
        conv(substring(col("sig"), 9, 8), 16, 10).cast("long").as("lo"))
      .repartition(col("id"))
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("|", lit(b.toString),
        substring(col("sig"), 1 + b * width, width))
    }: _*)
    val bucketsAll = sigs
      .select(col("id"), col("hi"), col("lo"),
        explode(bandKeys).as("bucket"))
      .repartition(col("bucket"))
    val buckets =
      if (maxBucketSize <= 0) bucketsAll
      else bucketsAll
        .withColumn("_bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
        .filter(col("_bsz") <= maxBucketSize)
        .drop("_bsz")
    buckets.as("a").hint("shuffle_hash")
      .join(buckets.as("b").hint("shuffle_hash"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        (bit_count(col("a.hi").bitwiseXOR(col("b.hi"))) +
          bit_count(col("a.lo").bitwiseXOR(col("b.lo"))))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Production-throughput twin of [[simhashHammingPairs]] over the
    * xxhash64-keyed 64-bit fingerprint ([[simhash64]], ~3x cheaper per
    * token than the md5 variant): banding is bit-shift arithmetic on one
    * LongType column and the Hamming verify is a single bit_count(xor).
    * Same exactness guarantee (maxHamming < bands), same bucket cap.
    * xxhash64 is engine-specific, so this path is property-tested against
    * the brute-force scan (DedupSpec) rather than SQL-oracle-gated; the
    * md5 variant (q120) carries the cross-engine proof of the shared
    * banding scheme.
    */
  def simhashHammingPairs64(
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 8192): DataFrame = {
    require(bands > 0 && 64 % bands == 0,
      s"bands must divide 64 bits, got $bands")
    require(maxHamming < bands,
      s"banding is exact only for maxHamming < bands " +
        s"(pigeonhole), got maxHamming=$maxHamming bands=$bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sigs = docs
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
      .repartition(col("id"))
    val bandKeys = array((0 until bands).map { b =>
      concat_ws("|", lit(b.toString),
        shiftright(col("sig"), b * width).bitwiseAND(mask))
    }: _*)
    val bucketsAll = sigs
      .select(col("id"), col("sig"), explode(bandKeys).as("bucket"))
      .repartition(col("bucket"))
    val buckets =
      if (maxBucketSize <= 0) bucketsAll
      else bucketsAll
        .withColumn("_bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
        .filter(col("_bsz") <= maxBucketSize)
        .drop("_bsz")
    buckets.as("a").hint("shuffle_hash")
      .join(buckets.as("b").hint("shuffle_hash"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming64(col("a.sig"), col("b.sig")).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over near-dup pairs: assign every id the minimum
    * id reachable through the pair graph (the canonical doc of its dup
    * cluster). Label-propagation via iterated joins — O(diameter)
    * rounds, each one shuffle; near-dup clusters are shallow (diameter is
    * small), so this converges in a few rounds at any scale.
    *
    * Input: (id1, id2) pairs. Output: (id, cluster_id = min id in
    * component). Ids not in any pair are absent (they are their own
    * cluster).
    */
  /** Connected components when the pair-generation was blocked: edges only
    * exist within a block (jaccardPairsByCooccurrence with blockCols, or
    * any blocked similarity join), so components cannot span blocks and CC
    * reduces to ONE shuffle on the block key + an in-memory union-find per
    * block. Blocking bounds block size by construction, so per-group work
    * stays bounded at any data scale — strictly better than the iterative
    * form whenever the precondition holds.
    *
    * Input: (id1, id2, blockKeyCol). Output: (id, cluster_id = min id in
    * component), the clusterPairs contract.
    *
    * `maxBlockEdges` guards the precondition: edges STREAM through the
    * union-find (memory is O(nodes), nodes <= 2*edges), but a block whose
    * edge count exceeds the bound means the blocking key was not actually
    * bounded (an unblocked or data-dependent key) — fail loudly with the
    * offending key instead of OOMing an executor mid-shuffle. Raise the
    * bound only after confirming the blocking key is bounded by
    * construction (LSH band, IVF cell); the fix for a genuinely oversized
    * block is a finer key (more bands, higher nlist), not a higher bound.
    */
  def clusterPairsBlocked(pairs: DataFrame, blockKeyCol: String,
      maxBlockEdges: Long = 10000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs
      .select(col(blockKeyCol).cast("string"),
        col("id1").cast("long"), col("id2").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        // union-find with min-id roots: attaching the larger root under the
        // smaller keeps every root the component minimum, so find() IS the
        // cluster label
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        var nEdges = 0L
        it.foreach { case (_, a, b) =>
          nEdges += 1
          if (nEdges > maxBlockEdges)
            throw new IllegalStateException(
              s"block '$key' exceeds $maxBlockEdges edges — the blocking " +
                "key is not bounded; refine it (more LSH bands / higher " +
                "IVF nlist) rather than raising maxBlockEdges")
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.map(id => (id, find(id))).toSeq
      }
      .toDF("id", "cluster_id")
  }

  def clusterPairs(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // eager localCheckpoints truncate lineage each round — without them
    // every iteration re-analyzes a plan that doubles in size and the
    // driver OOMs on optimizer state long before the data is large
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id"))
      .distinct().withColumn("cluster_id", col("id")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts min(own label, min neighbor label) ...
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster_id", "n_label"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("n_label")).as("n_min"))
      val relaxed = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id")))
            .as("l1"))
      // ... then pointer-jumps: label <- label(label). Plain relaxation
      // converges in O(diameter) rounds — a silent wrong answer on a
      // deep chain once maxIter runs out; with the jump the label
      // distance doubles per round, so maxIter=10 covers diameters to
      // ~2^10 and non-convergence throws below instead of mislabeling.
      val jumped = relaxed.as("a")
        .join(relaxed.select(col("id").as("l1"), col("l1").as("root")).as("b"),
          Seq("l1"), "left")
        .select(col("a.id").as("id"),
          coalesce(col("root"), col("l1")).as("cluster_id"))
      // carry the change flag through the checkpoint so convergence
      // detection is a filter over materialized data, not a fresh
      // join+shuffle against the previous labels
      val updated = jumped.as("n")
        .join(labels.select(col("id"), col("cluster_id").as("prev")), "id")
        .select(col("id"), col("cluster_id"),
          (col("cluster_id") < col("prev")).as("_changed"))
        .localCheckpoint(true)
      val changed = updated.filter(col("_changed")).count()
      labels = updated.drop("_changed")
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"clusterPairs did not converge in $maxIter doubling rounds — " +
        "component diameter exceeds 2^maxIter; raise maxIter")
    labels
  }
}
