package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators (SURVEY §2.9, `Iot.Database/IotVectorDb.cs`):
  * brute-force cosine / L2 top-k and radius search, plus an LSH-bucketed
  * approximate variant as the 100 TB scale path.
  *
  * The reference rebuilds a Faiss flat index over all rows per query
  * (IotVectorDb.cs:163-190) — O(n) per query, single node. Here the
  * brute-force scan is distributed and codegen'd (higher-order functions
  * over the array column, no UDFs); the LSH variant prunes to matching
  * sign-buckets so the scan cost drops by ~2^planes.
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, accumulated in
    * double in array order (deterministic). Native codegen'd expression
    * (graft.functions.expressions.DotProduct); requires
    * GraftFunctions.register, which Tables.load and the mains perform.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosine_similarity(a, b)

  def l2(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2_distance(a, b)

  /** Composable (higher-order-function) forms: same sequential double
    * accumulation, kept as the reference implementation the native
    * expressions are tested bit-identical against.
    */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineComposable(a: Column, b: Column): Column =
    dotComposable(a, b) /
      (sqrt(dotComposable(a, a)) * sqrt(dotComposable(b, b)))

  def l2Composable(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Symmetric int8 scalar quantization of a float-vector column — the
    * 4x storage/bandwidth path for embedding tables at corpus scale
    * (codes ride in 1/4 the bytes; ANN scoring dequantizes on the fly
    * with one multiply). Per-vector max-abs scaling: scale =
    * max|x|/127, codes = round(x/scale) — |codes| <= 127 by
    * construction, no clamp branch. Returns struct(scale, codes).
    *
    * Pure map, deterministic double arithmetic (oracle-checkable). The
    * scale sub-expression re-evaluates per element under interpreted
    * HOFs, so per-row cost is O(d²) flops — trivial at embedding dims;
    * a native expression (like DotProduct) is the escape hatch if d
    * ever reaches the thousands.
    */
  def quantizeInt8(vec: Column): Column = {
    val maxAbs = aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scale = greatest(maxAbs, lit(1e-12)) / lit(127.0)
    struct(scale.as("scale"),
      transform(vec, x => round(x.cast("double") / scale, 0).cast("int"))
        .as("codes"))
  }

  /** Brute-force cosine top-k against a single query vector (broadcast as a
    * literal — no join, no shuffle until the final top-k, which Spark plans
    * as TakeOrderedAndProject).
    */
  def cosineTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    vectors
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Cosine search with score floor + cap, the reference's defaults
    * (minRelevanceScore=0.55, limit=150; IotVectorDb.cs:244,263).
    */
  def cosineSearch(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], minScore: Double = 0.55, limit: Int = 150): DataFrame = {
    val q = typedLit(query)
    vectors
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("score"))
      .filter(col("score") >= minScore)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }

  /** Radius (L2) search: all vectors within `radius` of the query. */
  def radiusSearch(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], radius: Double): DataFrame = {
    val q = typedLit(query)
    vectors
      .select(col(idCol), round(l2(col(vecCol), q), 6).as("distance"))
      .filter(col("distance") <= radius)
  }

  /** Sign-LSH bucket key: one bit per hyperplane = sign of dot(v, plane).
    * Deterministic planes derive from the id-hash of the plane index, so
    * the same key computes identically everywhere (no RNG at runtime).
    */
  def signBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Deterministic pseudo-random hyperplanes (xorshift on (plane, dim)). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Float]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        var x = (p.toLong * 2654435761L + d.toLong * 40503L + 12345L)
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        ((x & 0xffffff).toFloat / 0xffffff.toFloat) * 2f - 1f
      }
    }

  /** IVF cell assignment: per-row argmin over the centroid set (L2,
    * centroid-id tiebreak). The centroids ship as ONE literal array in the
    * plan — a fold over it computes each row's nearest cell in place, so
    * there is no row expansion, no window, and no Exchange: the narrowest
    * possible shape at any nlist (the old crossJoin + row_number form
    * multiplied the input ×nlist and sort-shuffled the expansion). In
    * production the assignment is precomputed at ingest (`ivfTopK` accepts
    * a precomputed `cell` column) and the table bucketed by cell; this
    * computes it inline.
    */
  /** Past this many centroids the k-way `least(struct…)` fold stops
    * being codegen-friendly (struct comparisons interpret, so every row
    * pays k interpreted L2s — measured 1.2 ms/row at k=256, unusable at
    * production nlist); assignment switches to the broadcast-join +
    * min_by shape, which keeps the per-pair L2 inside whole-stage
    * codegen and collapses each row's k candidates map-side.
    */
  val FoldMaxNlist = 64

  def ivfAssign(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Float])]): DataFrame =
    if (centroids.size > FoldMaxNlist)
      ivfAssignJoin(vectors, idCol, vecCol, centroids)
    // sentinel cell -1 for null vectors, gated explicitly: cellOf itself
    // never returns NULL for a null embedding (struct children are non-null
    // and struct ordering ranks a NULL field smallest, which would silently
    // assign the lowest centroid id). Both branches are non-nullable, so
    // `cell` stays non-nullable by construction: joins/groupings on it
    // infer no IsNotNull constraint (which would otherwise push the whole
    // assignment expression into the scan filter and compute it twice).
    else vectors.withColumn("cell",
      when(col(vecCol).isNotNull, cellOf(col(vecCol), centroids))
        .otherwise(lit(-1L)))

  /** Exact IVF assignment at PRODUCTION nlist: stream the
    * (row × centroid) pairs through a codegen L2 + partial `min_by`
    * aggregation — nothing materializes (the broadcast nested-loop's
    * output feeds straight into the map-side combine, which collapses
    * each id's k candidates inside its partition), and the argmin is
    * deterministic (ordering struct carries the cid tiebreak, the same
    * (distance, cid) order `cellOf` folds). Identical cells to the
    * fold path by construction — both run the same L2 expression.
    */
  def ivfAssignJoin(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Float])]): DataFrame = {
    val sess = vectors.sparkSession
    import sess.implicits._
    val c = centroids.toDF("_graft_cid", "_graft_cvec")
    // group on (id, vector), not id alone: duplicate ids carrying
    // DIFFERENT vectors must each keep their own argmin (the fold path
    // assigns per row) — id-only grouping would collapse them into one
    // shared cell and stamp the wrong cell on one of the rows
    val cells = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .distinct()
      .crossJoin(broadcast(c))
      .groupBy(col(idCol), col(vecCol))
      .agg(min_by(col("_graft_cid"),
        struct(l2(col(vecCol), col("_graft_cvec")), col("_graft_cid")))
        .as("cell"))
    vectors.join(cells, Seq(idCol, vecCol), "left")
      .select(vectors.columns.map(col) :+
        coalesce(col("cell"), lit(-1L)).as("cell"): _*)
  }

  /** Nearest-centroid id of a vector column (the assignment expression
    * itself, usable at ingest time): `least` over (distance, cid) structs —
    * struct ordering is lexicographic, so the minimum IS the argmin with
    * the lowest-cid tiebreak, identical to ordering by (distance, cid).
    * Plain expressions only (no higher-order-function lambdas): the tree
    * canonicalizes, so self-joins over the assignment reuse one exchange,
    * and it stays inside codegen. The tree is O(nlist); at large nlist
    * assignment belongs at ingest (ivfTopK consumes a precomputed `cell`).
    */
  def cellOf(vec: Column, centroids: Seq[(Long, Seq[Float])]): Column =
    least(centroids.sortBy(_._1).map { case (cid, cv) =>
      struct(l2(vec, typedLit(cv)).as("d"), lit(cid).as("cid"))
    }: _*).getField("cid")

  /** Driver-side nProbe nearest centroids to the query, with the same
    * sequential-double L2 the engine computes (deterministic cross-engine).
    */
  def nearestCentroids(query: Seq[Float], centroids: Seq[(Long, Seq[Float])],
      nProbe: Int): Seq[Long] =
    centroids.map { case (cid, cv) =>
      var acc = 0.0
      var i = 0
      while (i < cv.length) {
        val d = cv(i).toDouble - query(i).toDouble; acc += d * d; i += 1
      }
      (math.sqrt(acc), cid)
    }.sortBy(identity).take(nProbe).map(_._2)

  /** IVF ANN top-k: probe the `nProbe` cells nearest the query and
    * brute-force cosine only inside them — the classic inverted-file
    * scale path (centroids trained offline at scale; deterministic here).
    * A table that already carries an ingest-time `cell` column (ideally
    * partitioned/bucketed by it, so the probe filter prunes at the scan)
    * is used as-is; otherwise assignment computes inline per row.
    */
  def ivfTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, centroids: Seq[(Long, Seq[Float])],
      nProbe: Int): DataFrame = {
    val probes = nearestCentroids(query, centroids, nProbe)
    val assigned =
      if (vectors.columns.contains("cell")) vectors
      else ivfAssign(vectors, idCol, vecCol, centroids)
    assigned
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** One distributed Lloyd iteration (k-means centroid training — the
    * "trained offline" half of the IVF scale path): assign each vector to
    * its nearest centroid with the same fold `cellOf` uses, then emit the
    * new per-cell means as (cell, pos, n, c) rows — one per vector
    * position, the layout that needs no array re-assembly and whose group
    * key (cell, pos) is bounded by nlist×dim regardless of data size.
    *
    * Determinism across engines: each float is scaled to a 1e-6
    * fixed-point BIGINT before summing, so the sum is exact-integer and
    * order-independent (a double sum would depend on partition order);
    * the mean divides two exact numbers in double at the end. The sum
    * accumulates in DECIMAL(38,0) so it cannot overflow at any corpus
    * size. One shuffle, partial-agg combined map-side.
    */
  def kmeansStep(vectors: DataFrame, vecCol: String,
      centroids: Seq[(Long, Seq[Float])]): DataFrame = {
    val nonNull = vectors.filter(col(vecCol).isNotNull)
    // (cell, vec, weight) rows: the fold path assigns per row (w=1);
    // at production nlist the assignment instead groups by the VECTOR
    // itself (arrays are grouping keys) with its multiplicity, then
    // argmins each DISTINCT vector once through the codegen-L2 +
    // min_by stream — no synthesized row ids and no self-join, whose
    // re-evaluated monotonically_increasing_id would be free to
    // mismatch across a nondeterministically-ordered upstream shuffle.
    // The weighted means below are bit-identical to the per-row form
    // (the fixed-point f of a duplicate vector is identical, so
    // Σf = f·mult exactly).
    val assigned =
      if (centroids.size <= FoldMaxNlist)
        nonNull.withColumn("cell", cellOf(col(vecCol), centroids))
          .select(col("cell"), col(vecCol), lit(1L).as("_graft_w"))
      else {
        val sess = vectors.sparkSession
        import sess.implicits._
        val c = centroids.toDF("_graft_cid", "_graft_cvec")
        nonNull.groupBy(col(vecCol))
          .agg(count(lit(1)).as("_graft_w"))
          .crossJoin(broadcast(c))
          .groupBy(col(vecCol), col("_graft_w"))
          .agg(min_by(col("_graft_cid"),
            struct(l2(col(vecCol), col("_graft_cvec")), col("_graft_cid")))
            .as("cell"))
          .select(col("cell"), col(vecCol), col("_graft_w"))
      }
    assigned
      .select(col("cell"), col("_graft_w"), posexplode(col(vecCol)).as(Seq("p", "v")))
      .select(col("cell"), col("_graft_w"), (col("p") + 1).as("pos"),
        round(col("v").cast("double") * lit(1000000.0)).cast("long").as("f"))
      .groupBy("cell", "pos")
      .agg(sum(col("_graft_w")).as("n"),
        round(sum((col("f") * col("_graft_w")).cast("decimal(38,0)"))
          .cast("double") /
          (sum(col("_graft_w")) * lit(1000000.0)), 6).as("c"))
  }

  /** Full Lloyd training loop: deterministic seeds (the k lowest-id
    * vectors, re-labeled 0..k-1), `iters` assignment/update rounds.
    * Only the k×dim centroid matrix ever reaches the driver — it IS the
    * next round's query input (like the reference's search argument);
    * every data pass is the distributed kmeansStep. Cells that lose all
    * members keep their previous centroid.
    */
  def kmeansTrain(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[(Long, Seq[Float])] = {
    var cents: Seq[(Long, Seq[Float])] = vectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(k).collect()
      .toSeq.zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1)) }
    for (_ <- 0 until iters) {
      val means: Map[Long, Seq[Float]] = kmeansStep(vectors, vecCol, cents)
        .collect().toSeq
        .groupBy(_.getAs[Long]("cell"))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getAs[Int]("pos"))
            .map(_.getAs[Double]("c").toFloat) }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** Product-quantization sub-code: nearest codebook entry for subspace
    * `s` (dims s*subDim+1 .. (s+1)*subDim), the same least-struct argmin
    * fold as `cellOf` — plain codegen expressions, no join, no window.
    * Codebook entry ids must be 0-based and dense (they index the ADC
    * lookup tables).
    */
  def pqSubCode(vec: Column, codebook: Seq[(Long, Seq[Float])], s: Int,
      subDim: Int): Column =
    least(codebook.sortBy(_._1).map { case (cid, cv) =>
      struct(l2(slice(vec, s * subDim + 1, subDim), typedLit(cv)).as("d"),
        lit(cid).as("cid"))
    }: _*).getField("cid")

  /** PQ-compressed ANN top-k by asymmetric distance computation (ADC,
    * Jégou et al. 2011): each vector is reduced to m sub-codes (m bytes at
    * k≤256 — a 256× memory cut vs float32×64, the representation that
    * keeps a 100 TB corpus's index in cluster RAM); distance to the query
    * is the sum of per-subspace squared distances looked up from
    * driver-precomputed tables (m×k doubles shipped as literals). The
    * scan is pure codegen — assignment folds + array lookups — with the
    * top-k as TakeOrderedAndProject; no join, no shuffle before the
    * final k rows.
    */
  def pqAdcTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], codebooks: Seq[Seq[(Long, Seq[Float])]],
      subDim: Int, k: Int): DataFrame = {
    // per-subspace lookup tables: squared L2 from the query's subvector to
    // every codebook entry, sequential double accumulation (the exact
    // arithmetic the SQL oracle replays)
    val dq: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (cb, s) =>
      cb.sortBy(_._1).map { case (_, cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) {
          val d = query(s * subDim + i).toDouble - cv(i).toDouble
          acc += d * d; i += 1
        }
        acc
      }
    }
    val codeCols = codebooks.indices.map(s =>
      pqSubCode(col(vecCol), codebooks(s), s, subDim).as(s"c$s"))
    val adc = sqrt(codebooks.indices.map(s =>
      element_at(typedLit(dq(s)), col(s"c$s").cast("int") + 1)).reduce(_ + _))
    vectors.select((col(idCol) +: codeCols): _*)
      .withColumn("adc_dist", round(adc, 6))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** ANN top-k: restrict the brute-force scan to vectors in the query's
    * sign-LSH bucket (and, for recall, Hamming-1 neighbor buckets).
    */
  def annTopK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(nPlanes, query.length)
    var qb = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      val d = p.zip(query).map { case (x, y) => x.toDouble * y.toDouble }.sum
      if (d >= 0) qb |= (1L << i)
    }
    val candidateBuckets = qb +: (0 until nPlanes).map(i => qb ^ (1L << i))
    vectors
      .withColumn("_bucket", signBucket(col(vecCol), planes))
      .filter(col("_bucket").isin(candidateBuckets: _*))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(query)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Measured IVF retrieval quality: train `nlist` centroids (Lloyd),
    * then for the `nQueries` lowest-id vectors compare `ivfTopK` at
    * `nProbe` against the brute-force cosine top-k (self excluded).
    * Returns (mean recall@k, mean fraction of vectors scanned) — the
    * quality/cost trade an ANN operator must REPORT, not assume
    * (`IotVectorDb.cs:163-190` is the search contract; recall is what
    * validates the approximation). The query loop is driver-side but
    * bounded by `nQueries`; every per-query step is a distributed job
    * over the cached assignment.
    */
  def recallAtK(vectors: DataFrame, idCol: String, vecCol: String,
      nlist: Int, nProbe: Int, k: Int, nQueries: Int,
      trained: Option[Seq[(Long, Seq[Float])]] = None): (Double, Double) = {
    val e = vectors.filter(col(vecCol).isNotNull)
    // callers that already trained (e.g. to time probes afterwards)
    // pass the centroids in rather than re-running Lloyd
    val cents = trained.getOrElse(kmeansTrain(e, idCol, vecCol, nlist, iters = 3))
    val assigned = ivfAssign(e, idCol, vecCol, cents).cache()
    try {
      val n = assigned.count().toDouble
      val qs = assigned.orderBy(col(idCol)).limit(nQueries)
        .select(col(idCol).cast("long"), col(vecCol)).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val per = qs.map { case (qid, qv) =>
        val others = assigned.filter(col(idCol) =!= qid)
        val brute = cosineTopK(others, idCol, vecCol, qv, k)
          .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
        val approx = ivfTopK(others, idCol, vecCol, qv, k, cents, nProbe)
          .select(col(idCol).cast("long")).collect().map(_.getLong(0)).toSet
        val probes = nearestCentroids(qv, cents, nProbe)
        val scanned = assigned.filter(col("cell").isin(probes: _*)).count() / n
        (brute.intersect(approx).size.toDouble / k, scanned)
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    } finally assigned.unpersist()
  }
}
