package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** Vector-similarity coverage over `embeddings` (SURVEY §2.9): brute-force
  * cosine top-k, score-floor search, L2 radius search, and sign-LSH ANN.
  * The query vector is row vec_id=0 (collected once — it is the query
  * input, like the reference's search argument, not a driver-side loop).
  */
object VectorQueries {

  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

  /** Deterministic IVF centroids: embeddings 1..8 (the training input, like
    * the reference's search argument — 8 rows collected once, not a loop).
    */
  private def centroids8(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, Seq[Float])] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id").between(1, 8))
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq.sortBy(_._1)

  /** Embedding near-dup candidate pairs blocked on the IVF cell (bounded
    * by construction: nlist cells whose sizes follow the Voronoi partition,
    * sub-splittable by raising nlist at scale) with label as a secondary
    * filter — never an unblocked or data-dependent-key self-join. The
    * assignment is a per-row fold (no shuffle); the repartition +
    * shuffle_hash hints make both self-join sides canonicalize to ONE
    * reused exchange, so assignment/cosine inputs compute once.
    *
    * nlist SIZING is the load-bound and must scale with the corpus:
    * cells average N/nlist vectors and pair-gen is O(cell²), so pick
    * nlist ~ N/targetCellSize (e.g. 1e9 vectors / 100k-vector cells =
    * 10k centroids, kmeansTrain at that k) — the 8 testdata centroids
    * here are the deterministic-oracle stand-in, not the production
    * setting. Oversized cells fail loudly downstream at
    * clusterPairsBlocked's maxBlockEdges guard instead of OOMing.
    */
  private def cellBlockedPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val assigned = Similarity
      .ivfAssign(e, "vec_id", "embedding", centroids8(s, dir))
      .select(col("vec_id").as("id"), col("label"), col("cell"),
        col("embedding").as("v"))
      .repartition(col("cell"), col("label"))
    assigned.as("a").hint("shuffle_hash")
      .join(assigned.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") && col("a.label") === col("b.label") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        concat_ws("\u0001", col("a.cell"), col("a.label")).as("block_key"),
        round(Similarity.cosine(col("a.v"), col("b.v")), 6).as("score"))
      .filter(col("score") >= 0.3)
  }

  private val dotSql =
    "LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)), (a,b) -> a+b)"
  private val normESql =
    "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)), (a,b) -> a+b))"
  private val normQSql =
    "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)), (a,b) -> a+b))"

  /** DuckDB replica of Similarity.annTopK(k=10, nPlanes=8): the
    * deterministic hyperplanes are embedded as literals; buckets, the
    * query bucket, its Hamming-1 neighborhood, and the in-bucket cosine
    * top-k are all recomputed in SQL.
    */
  lazy val annLshOracleSql: String = {
    val planes = Similarity.hyperplanes(nPlanes = 8, dim = 64)
    val values = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}]::FLOAT[])"
    }.mkString(", ")
    val dotPlane =
      "LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
        "i -> e.embedding[i]::DOUBLE * pl.v[i]::DOUBLE)), (a,b) -> a+b)"
    s"""WITH planes(p, v) AS (VALUES $values),
      b AS (
        SELECT e.vec_id,
          CAST(SUM(CASE WHEN $dotPlane >= 0
            THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes pl
        GROUP BY e.vec_id),
      qb AS (SELECT bucket FROM b WHERE vec_id = 0),
      flips AS (SELECT 0 AS f UNION ALL SELECT (1::BIGINT << CAST(i AS INT)) AS f FROM RANGE(0,8) t(i)),
      cand AS (SELECT b.vec_id FROM b, qb, flips
        WHERE b.vec_id <> 0 AND b.bucket = XOR(qb.bucket, flips.f)),
      q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      SELECT e.vec_id, ROUND($dotSql / ($normESql * $normQSql), 6) AS score
      FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, q
      ORDER BY score DESC, e.vec_id LIMIT 10"""
  }

  /** DuckDB replica of Similarity.ivfTopK(k=10, nProbe=2) with centroids =
    * embeddings 1..8: same L2 assignment (centroid-id tiebreak), same
    * probe choice, same in-cell cosine top-k.
    */
  lazy val annIvfOracleSql: String = {
    def l2(a: String, b: String): String =
      "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
        s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (x,y) -> x+y))"
    s"""WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8),
      q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      probes AS (
        SELECT cid FROM cents, q
        ORDER BY ${l2("cv", "qe")}, cid LIMIT 2),
      assign AS (
        SELECT e.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${l2("e.embedding", "c.cv")}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL),
      cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      cand AS (SELECT vec_id FROM cells WHERE cell IN (SELECT cid FROM probes))
      SELECT e.vec_id, ROUND($dotSql / ($normESql * $normQSql), 6) AS score
      FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, q
      ORDER BY score DESC, e.vec_id LIMIT 10"""
  }

  /** Pairwise cosine between table aliases `a` and `b` in DuckDB (same
    * sequential double accumulation as the native Spark expression).
    */
  private def cosSql(a: String, b: String): String =
    s"""LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
        k -> $a.embedding[k]::DOUBLE * $b.embedding[k]::DOUBLE)), (x,y)->x+y)
      / (SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
          k -> $a.embedding[k]::DOUBLE * $a.embedding[k]::DOUBLE)), (x,y)->x+y))
       * SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
          k -> $b.embedding[k]::DOUBLE * $b.embedding[k]::DOUBLE)), (x,y)->x+y)))"""

  /** DuckDB replica of the IVF cell assignment over ALL vectors (q47's
    * assign CTE includes the query row here): ROW_NUMBER argmin on
    * (L2, cid) == the Spark fold's strict-less-than with ascending cid.
    */
  private lazy val cellsCte: String = {
    def l2(a: String, b: String): String =
      "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
        s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (x,y) -> x+y))"
    s"""cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8),
      assign AS (
        -- embedding IS NOT NULL mirrors the Spark side's sentinel-cell
        -- exclusion (ivfAssign -> cell -1): a null-embedding fixture row
        -- must be absent from cells on BOTH engines
        SELECT e.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${l2("e.embedding", "c.cv")}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c
        WHERE e.embedding IS NOT NULL),
      cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1)"""
  }

  /** DuckDB replica of q45's cell-blocked near-dup pairs: same IVF
    * assignment, same (cell, label) candidate generation, same cosine
    * verification.
    */
  lazy val embedPairsOracleSql: String =
    s"""WITH $cellsCte,
      p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2,
          ROUND(${cosSql("a", "b")}, 6) AS score
        FROM embeddings a
        JOIN cells ca ON ca.vec_id = a.vec_id
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        JOIN cells cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell)
      SELECT id1, id2, score FROM p WHERE score >= 0.3"""

  /** DuckDB replica of q49: the q45 cell-blocked cosine pairs as edges,
    * connected components via transitive-closure minimum.
    */
  lazy val embedClustersOracleSql: String =
    s"""WITH RECURSIVE $cellsCte,
      p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM embeddings a
        JOIN cells ca ON ca.vec_id = a.vec_id
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        JOIN cells cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell
        WHERE ROUND(${cosSql("a", "b")}, 6) >= 0.3),
      edges AS (SELECT id1 AS src, id2 AS dst FROM p
        UNION SELECT id2, id1 FROM p),
      reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
      labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
      SELECT cluster_id, COUNT(*) AS n_members FROM labels GROUP BY cluster_id"""

  /** DuckDB replica of Similarity.kmeansStep over centroids 1..8: same
    * argmin assignment (cellsCte), same 1e-6 fixed-point exact sums, same
    * final double division — bit-identical means in both engines.
    */
  lazy val kmeansStepOracleSql: String =
    s"""WITH $cellsCte,
      x AS (
        SELECT c.cell, CAST(t.i AS INT) AS pos,
          CAST(ROUND(e.embedding[CAST(t.i AS INT)]::DOUBLE * 1000000.0) AS BIGINT) AS f
        FROM embeddings e
        JOIN cells c ON c.vec_id = e.vec_id
        CROSS JOIN RANGE(1, 65) t(i)
        WHERE e.embedding IS NOT NULL)
      SELECT cell, pos, COUNT(*) AS n,
        ROUND(CAST(SUM(f) AS DOUBLE) / (COUNT(*) * 1000000.0), 6) AS c
      FROM x GROUP BY cell, pos"""

  /** Deterministic PQ codebooks: m=4 subspaces × 16 dims, entries = the
    * matching subvectors of embeddings 1..4 with dense 0-based ids (the
    * training input, like centroids8).
    */
  private def pqCodebooks(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Seq[(Long, Seq[Float])]] = {
    val rows = Tables.load(s, dir, "embeddings")
      .filter(col("vec_id").between(1, 4))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    (0 until 4).map(sub =>
      rows.map { case (vid, v) =>
        (vid - 1, v.slice(sub * 16, sub * 16 + 16)) }.toSeq)
  }

  /** DuckDB replica of Similarity.pqAdcTopK (m=4 × 16 dims, codebooks =
    * embeddings 1..4): per-subspace ROW_NUMBER argmin assignment (== the
    * least-struct fold), lookup tables recomputed in SQL with the same
    * sequential squared-L2, same d0+d1+d2+d3 addition order.
    * `extraCtes`/`candFilter` optionally restrict the coded candidate set
    * (the IVF-probe composition).
    */
  private def pqAdcSql(extraCtes: String, candFilter: String): String = {
    def l2Sub(s: Int): String =
      "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,17), " +
        s"i -> (e.embedding[${s * 16} + i]::DOUBLE - c.cv[${s * 16} + i]::DOUBLE) " +
        s"* (e.embedding[${s * 16} + i]::DOUBLE - c.cv[${s * 16} + i]::DOUBLE))), (x,y) -> x+y))"
    def dqSub(s: Int): String =
      "LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,17), " +
        s"i -> (q.qe[${s * 16} + i]::DOUBLE - c.cv[${s * 16} + i]::DOUBLE) " +
        s"* (q.qe[${s * 16} + i]::DOUBLE - c.cv[${s * 16} + i]::DOUBLE))), (x,y) -> x+y)"
    val assigns = (0 until 4).map { s =>
      s"""a$s AS (
        SELECT e.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${l2Sub(s)}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cb c WHERE e.vec_id <> 0$candFilter),
      k$s AS (SELECT vec_id, cid AS c$s FROM a$s WHERE rn = 1)"""
    }.mkString(",\n      ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      cb AS (SELECT vec_id - 1 AS cid, embedding AS cv FROM embeddings
        WHERE vec_id BETWEEN 1 AND 4),
      $extraCtes$assigns,
      dq AS (SELECT c.cid, ${(0 until 4).map(s => s"${dqSub(s)} AS d$s").mkString(", ")}
        FROM cb c, q),
      coded AS (
        SELECT k0.vec_id, k0.c0, k1.c1, k2.c2, k3.c3
        FROM k0 JOIN k1 USING (vec_id) JOIN k2 USING (vec_id)
          JOIN k3 USING (vec_id))
      SELECT vec_id, c0, c1, c2, c3,
        ROUND(SQRT(t0.d0 + t1.d1 + t2.d2 + t3.d3), 6) AS adc_dist
      FROM coded
      JOIN dq t0 ON t0.cid = coded.c0
      JOIN dq t1 ON t1.cid = coded.c1
      JOIN dq t2 ON t2.cid = coded.c2
      JOIN dq t3 ON t3.cid = coded.c3
      ORDER BY adc_dist, vec_id LIMIT 10"""
  }

  lazy val pqAdcOracleSql: String = pqAdcSql("", "")

  /** q86: the q47 probe-cell restriction composed with the PQ ADC ranking
    * (cells/probes CTEs from the IVF oracle, candidate filter on the
    * probed cells, then identical coding + lookup).
    */
  lazy val ivfPqOracleSql: String = {
    def l2c(a: String, b: String): String =
      "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
        s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (x,y) -> x+y))"
    val ivfCtes =
      s"""cents AS (
        SELECT vec_id AS cid, embedding AS cv FROM embeddings
        WHERE vec_id BETWEEN 1 AND 8),
      probes AS (
        SELECT cid FROM cents, q
        ORDER BY ${l2c("cv", "qe")}, cid LIMIT 2),
      assign AS (
        SELECT e.vec_id, c.cid,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${l2c("e.embedding", "c.cv")}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cents c WHERE e.vec_id <> 0),
      cand AS (
        SELECT vec_id FROM assign
        WHERE rn = 1 AND cid IN (SELECT cid FROM probes)),
      """
    pqAdcSql(ivfCtes, " AND e.vec_id IN (SELECT vec_id FROM cand)")
  }

  /** DuckDB replica of Dedup.semDedupScaled(eps 0.3, targetCellSize 128):
    * the same integer bit-count rule, sign-LSH cells over the literal
    * deterministic hyperplanes, exact fixed-point cell means, cell-blocked
    * cosine pairs, transitive-closure components, nearest-to-cell-centroid
    * representative.
    */
  lazy val semDedupScaledOracleSql: String = {
    val planes = Similarity.hyperplanes(nPlanes = 20, dim = 64)
    val values = planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}]::FLOAT[])"
    }.mkString(", ")
    val dotPlane =
      "LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
        "i -> e.embedding[i]::DOUBLE * pl.v[i]::DOUBLE)), (a,b) -> a+b)"
    s"""WITH RECURSIVE
      cnt AS (SELECT COUNT(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
      -- smallest b in [4,20] with 2^b * 128 >= N: integer arithmetic,
      -- never a floating log2 whose ulp could flip the ceil
      bits AS (SELECT COALESCE(MIN(CAST(b AS INT)), 20) AS nb
        FROM RANGE(4, 21) t(b), cnt
        WHERE (1::BIGINT << CAST(b AS INT)) * 128 >= cnt.n),
      planes(p, v) AS (VALUES $values),
      asg AS (
        SELECT e.vec_id,
          CAST(SUM(CASE WHEN $dotPlane >= 0
            THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS cell
        FROM embeddings e CROSS JOIN planes pl, bits
        WHERE e.embedding IS NOT NULL AND pl.p < bits.nb
        GROUP BY e.vec_id),
      x AS (
        SELECT a.cell, CAST(t.i AS INT) AS pos,
          CAST(ROUND(e.embedding[CAST(t.i AS INT)]::DOUBLE * 1000000.0)
            AS BIGINT) AS f
        FROM embeddings e JOIN asg a ON a.vec_id = e.vec_id
        CROSS JOIN RANGE(1, 65) t(i)),
      pm AS (SELECT cell, pos,
          CAST(ROUND(CAST(SUM(f) AS DOUBLE) / (COUNT(*) * 1000000.0), 6)
            AS FLOAT) AS m
        FROM x GROUP BY cell, pos),
      mvs AS (SELECT cell, LIST(m ORDER BY pos) AS mv FROM pm GROUP BY cell),
      d AS (
        SELECT e.vec_id, a.cell,
          ROUND(SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
            k -> (e.embedding[k]::DOUBLE - mv.mv[k]::DOUBLE)
               * (e.embedding[k]::DOUBLE - mv.mv[k]::DOUBLE))),
            (x2,y2) -> x2+y2)), 6) AS centroid_dist
        FROM embeddings e
        JOIN asg a ON a.vec_id = e.vec_id
        JOIN mvs mv ON mv.cell = a.cell),
      p2 AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM embeddings a
        JOIN asg ca ON ca.vec_id = a.vec_id
        JOIN embeddings b ON a.vec_id < b.vec_id
        JOIN asg cb ON cb.vec_id = b.vec_id AND cb.cell = ca.cell
        WHERE ROUND(${cosSql("a", "b")}, 6) >= 0.3),
      edges AS (SELECT id1 AS src, id2 AS dst FROM p2
        UNION SELECT id2, id1 FROM p2),
      reach AS (
        SELECT src AS id, src AS r FROM edges
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
      labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      f2 AS (
        SELECT d.vec_id, d.cell, d.centroid_dist,
          COALESCE(l.cluster_id, d.vec_id) AS cluster_id
        FROM d LEFT JOIN labels l ON l.id = d.vec_id),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
          ORDER BY centroid_dist, vec_id) AS rk FROM f2)
      SELECT vec_id, cell, centroid_dist, cluster_id, (rk = 1) AS keep
      FROM ranked"""
  }

  val all: Seq[Q] = Seq(
    Q("q40_cosine_topk",
      (s, dir) => {
        val others = Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        Similarity.cosineTopK(others, "vec_id", "embedding", queryVec(s, dir), 10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, ROUND($dotSql / ($normESql * $normQSql), 6) AS score
        FROM embeddings e, q WHERE e.vec_id <> 0
        ORDER BY score DESC, e.vec_id LIMIT 10"""),
      "brute-force cosine top-k (IotVectorDb.cs:263-316), TakeOrderedAndProject"),

    Q("q41_cosine_search_floor",
      (s, dir) => {
        val others = Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        Similarity.cosineSearch(others, "vec_id", "embedding", queryVec(s, dir),
          minScore = 0.2, limit = 150)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT * FROM (
          SELECT e.vec_id, ROUND($dotSql / ($normESql * $normQSql), 6) AS score
          FROM embeddings e, q WHERE e.vec_id <> 0)
        WHERE score >= 0.2 ORDER BY score DESC, vec_id LIMIT 150"""),
      "cosine search with relevance floor + cap (reference defaults pattern)"),

    Q("q42_radius_search",
      (s, dir) => {
        val others = Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        Similarity.radiusSearch(others, "vec_id", "embedding", queryVec(s, dir), 1.3)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT * FROM (
          SELECT e.vec_id,
            ROUND(SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
              i -> (e.embedding[i]::DOUBLE - q.qe[i]::DOUBLE)
                 * (e.embedding[i]::DOUBLE - q.qe[i]::DOUBLE))), (a,b) -> a+b)), 6) AS distance
          FROM embeddings e, q WHERE e.vec_id <> 0)
        WHERE distance <= 1.3"""),
      "L2 radius search (IotVectorDb.cs:203-235)"),

    // The sign-LSH hyperplanes are deterministic, so the oracle embeds
    // their literal values and recomputes buckets + in-bucket cosine top-k
    // bit-for-bit (sequential double accumulation in both engines).
    Q("q43_ann_lsh",
      (s, dir) => {
        val others = Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        Similarity.annTopK(others, "vec_id", "embedding", queryVec(s, dir),
          k = 10, nPlanes = 8)
      },
      Some(VectorQueries.annLshOracleSql),
      "ANN top-k via sign-LSH bucket pruning (the 100 TB scale path)"),

    Q("q44_knn_per_label",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        // approximate 1-NN of vec 0..4: candidates restricted to the
        // probe's IVF cell (bounded-by-construction blocking key, like
        // q45 — never a data-dependent key), label as a secondary filter.
        // The ANN contract: a same-label neighbor in another cell is out
        // of scope, exactly as an IVF probe would miss it.
        val assigned = Similarity
          .ivfAssign(e, "vec_id", "embedding", centroids8(s, dir))
        val probes = assigned.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("label"), col("cell"),
            col("embedding").as("probe_vec"))
        val cands = assigned.select(col("vec_id").as("cand_id"),
          col("label"), col("cell"), col("embedding").as("cand_vec"))
        probes.join(cands, Seq("cell", "label"))
          .filter(col("probe_id") =!= col("cand_id"))
          .select(col("probe_id"), col("cand_id"), col("label"),
            round(Similarity.cosine(col("probe_vec"), col("cand_vec")), 6)
              .as("score"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("probe_id")
              .orderBy(col("score").desc, col("cand_id"))))
          .filter(col("rn") === 1)
          .select("probe_id", "cand_id", "label", "score")
      },
      Some(s"""WITH $cellsCte,
        p AS (SELECT e.vec_id AS probe_id, e.label, cl.cell, e.embedding AS pv
          FROM embeddings e JOIN cells cl ON cl.vec_id = e.vec_id
          WHERE e.vec_id < 5),
        c AS (SELECT e.vec_id AS cand_id, e.label, cl.cell, e.embedding AS cv
          FROM embeddings e JOIN cells cl ON cl.vec_id = e.vec_id),
        scored AS (
          SELECT p.probe_id, c.cand_id, p.label,
            ROUND(
              LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                i -> p.pv[i]::DOUBLE * c.cv[i]::DOUBLE)), (a,b) -> a+b)
              / (SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  i -> p.pv[i]::DOUBLE * p.pv[i]::DOUBLE)), (a,b) -> a+b))
               * SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  i -> c.cv[i]::DOUBLE * c.cv[i]::DOUBLE)), (a,b) -> a+b))), 6) AS score
          FROM p JOIN c ON p.cell = c.cell AND p.label = c.label
            AND p.probe_id <> c.cand_id)
        SELECT probe_id, cand_id, label, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY score DESC, cand_id) AS rn FROM scored)
        WHERE rn = 1"""),
      "IVF-cell-blocked approximate kNN join (bounded blocking key; " +
        "label as secondary filter)"),

    Q("q45_embed_dup_pairs",
      (s, dir) => cellBlockedPairs(s, dir).select("id1", "id2", "score"),
      Some(VectorQueries.embedPairsOracleSql),
      "embedding-cosine near-dup pairs, IVF-cell-blocked (bounded blocking " +
        "key; label as secondary filter; native codegen cosine)"),

    // IVF with deterministic centroids (embeddings 1..8): assignment,
    // probe selection and in-cell top-k all recompute exactly in SQL.
    Q("q47_ann_ivf",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.ivfTopK(e.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          queryVec(s, dir), k = 10, centroids8(s, dir), nProbe = 2)
      },
      Some(VectorQueries.annIvfOracleSql),
      "IVF ANN top-k: nearest-centroid cells, probe-limited cosine scan " +
        "(inverted-file scale path; centroids trained offline at 100 TB)"),

    // Same result as q47 by construction, via the shape that holds at
    // nlist=4096/100 TB: `cell` is materialized ONCE at ingest
    // (Similarity.cellOf), the table is stored partitioned by cell (the
    // classic inverted-file layout: one directory per cell), and the probe
    // filter prunes whole partitions before any I/O — no O(nlist)
    // assignment expression anywhere in the query plan (PlanSpec asserts
    // both). Partitioning, not bucketing: bucket pruning only applies when
    // bucketed reading survives planning, and Spark auto-disables bucketed
    // scans for scan-only queries; partition pruning is unconditional.
    Q("q77_ann_ivf_bucketed",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val cents = centroids8(s, dir)
        // ingest: assign cells once, store one directory per cell
        graft.core.Layout.savePartitionedTable(
          Similarity.ivfAssign(e, "vec_id", "embedding", cents),
          "embeddings_ivf_cells", "cell")
        // query: precomputed `cell` short-circuits inline assignment
        Similarity.ivfTopK(
          s.table("embeddings_ivf_cells").filter(col("vec_id") =!= 0),
          "vec_id", "embedding", queryVec(s, dir), k = 10,
          cents, nProbe = 2)
      },
      Some(VectorQueries.annIvfOracleSql),
      "IVF ANN over an ingest-time cell-partitioned layout: assignment " +
        "precomputed at write, probe filter prunes partitions at the scan"),

    // Embedding-cosine near-dup clusters: q45's pairs require BOTH cell
    // and label equality, so every edge stays inside one (cell, label)
    // block and the single-pass union-find applies.
    Q("q49_embed_dup_clusters",
      (s, dir) => {
        graft.operators.Dedup
          .clusterPairsBlocked(cellBlockedPairs(s, dir), "block_key")
          .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
      },
      Some(VectorQueries.embedClustersOracleSql),
      "embedding-cosine near-dup clusters (IVF-cell-blocked pairs -> " +
        "single-pass connected components)"),

    // PQ-compressed ANN (Jégou et al. 2011): m sub-codes per vector (the
    // 256x memory cut that keeps a 100 TB index in cluster RAM), distance
    // by table lookup. Codes + lookup tables are all deterministic, so
    // the oracle replays assignment and ADC exactly.
    Q("q85_pq_adc_topk",
      (s, dir) => Similarity.pqAdcTopK(
        Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0),
        "vec_id", "embedding", queryVec(s, dir), pqCodebooks(s, dir),
        subDim = 16, k = 10),
      Some(VectorQueries.pqAdcOracleSql),
      "product-quantization ADC top-k: per-subspace code folds + literal " +
        "lookup tables, pure codegen scan, TakeOrderedAndProject"),

    // IVF+PQ composed (the Faiss-IVFPQ shape, on raw vectors — the
    // residual-encoding refinement would subtract the cell centroid
    // before coding): probe the 2 nearest cells, rank candidates by ADC
    // lookup instead of full-precision cosine. At 100 TB: partition
    // pruning cuts I/O by nProbe/nlist, PQ codes cut the scanned bytes
    // 256x — the two multiplicative reductions that make exhaustive
    // search tractable.
    Q("q86_ivfpq_topk",
      (s, dir) => {
        val q = queryVec(s, dir)
        val cents = centroids8(s, dir)
        val probes = Similarity.nearestCentroids(q, cents, nProbe = 2)
        val assigned = Similarity.ivfAssign(
          Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0),
          "vec_id", "embedding", cents)
        Similarity.pqAdcTopK(
          assigned.filter(col("cell").isin(probes: _*)),
          "vec_id", "embedding", q, pqCodebooks(s, dir), subDim = 16, k = 10)
      },
      Some(VectorQueries.ivfPqOracleSql),
      "IVF probe + PQ ADC ranking composed: partition pruning x 256x code " +
        "compression, the exhaustive-search escape hatch at 100 TB"),

    // The training half of IVF: one Lloyd iteration as a distributed
    // query. Assignment is the same fold the ANN queries use; the update
    // emits per-(cell, position) means over exact fixed-point sums, so
    // the result is order-independent and hash-stable across engines.
    Q("q82_kmeans_step",
      (s, dir) => Similarity.kmeansStep(
        Tables.load(s, dir, "embeddings"), "embedding", centroids8(s, dir)),
      Some(VectorQueries.kmeansStepOracleSql),
      "k-means Lloyd iteration (IVF centroid training): fold assignment + " +
        "fixed-point exact per-position means, one bounded-key shuffle"),

    // SemDeDup (Abbas et al. 2023): semantic near-dup removal keeping the
    // member nearest its cluster centroid — the curation step between
    // fuzzy text dedup and training. Graded in its SCALING regime: the
    // cell count grows with the corpus (bits = min{b : 2^b·128 ≥ N}), so
    // assignment is a per-row O(bits·dim) fold and pair generation stays
    // ~linear — no stage is O(N²/const). The fixed-nlist Voronoi variant
    // (Dedup.semDedupKeepList) remains for small curated sets and is
    // spec-covered in DedupSpec.
    Q("q89_semdedup",
      (s, dir) => graft.operators.Dedup.semDedupScaled(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        eps = 0.3, dim = 64, targetCellSize = 128)
        .withColumnRenamed("id", "vec_id"),
      Some(VectorQueries.semDedupScaledOracleSql),
      "SemDeDup keep-list at corpus-scaled cell count: sign-LSH cells, " +
        "exact fixed-point cell centroids, blocked CC, " +
        "nearest-to-centroid representative kept"),

    Q("q46_dup_clusters",
      (s, dir) => {
        // blocked pair-gen means components are block-local -> single-pass
        // union-find CC instead of iterated label propagation
        val pairs = graft.operators.Dedup.jaccardPairsByCooccurrence(
          Tables.load(s, dir, "documents"), "doc_id",
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))),
          Seq(col("lang"), floor(col("n_chars") / 50)),
          threshold = 0.6, emitBlockKey = true)
        graft.operators.Dedup.clusterPairsBlocked(pairs, "block_key")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"))
      },
      // label propagation's fixpoint == transitive closure min, which a
      // recursive CTE computes exactly (components are shallow, so the
      // closure stays small)
      Some("""WITH RECURSIVE d AS (
          SELECT doc_id, lang, CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket,
            LIST_DISTINCT(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0)) AS toks
          FROM documents),
        pairs AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2
          FROM d a JOIN d b
            ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
          WHERE ROUND(CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
              / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 1), 6) >= 0.6),
        edges AS (
          SELECT id1 AS src, id2 AS dst FROM pairs
          UNION SELECT id2, id1 FROM pairs),
        reach AS (
          SELECT src AS id, src AS r FROM edges
          UNION
          SELECT reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r),
        labels AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        SELECT cluster_id, COUNT(*) AS n_members FROM labels GROUP BY cluster_id"""),
      "near-dup clusters: connected components over jaccard pairs -> keep-one groups"),

    // Symmetric int8 scalar quantization — the 4x storage/bandwidth
    // path for embedding tables (scalar codes for storage; PQ q85/q86
    // for search). Pure map; the report pins scale, code checksum and
    // the max reconstruction error per vector.
    Q("q105_embedding_quantize",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .filter(col("embedding").isNotNull)
        e.select(col("vec_id"), col("embedding"),
            graft.operators.Similarity.quantizeInt8(col("embedding")).as("q"))
          // "_s" (not "scale"): the output list below aliases a ROUNDED
          // "scale", and Spark's lateral column aliasing would make a
          // same-named lambda reference resolve to that rounded alias —
          // shifting the error by ~1e-5 versus the oracle
          .select(col("vec_id"), col("embedding"),
            col("q.scale").as("_s"), col("q.codes").as("codes"))
          // error is reported RELATIVE to scale (|x/s - c| <= 0.5): the
          // absolute form |x - c*s| concentrates at exactly s/2, where
          // engines' decimal-rounding implementations legitimately
          // disagree by an ulp; the relative form's boundary (0.5) is
          // exactly representable
          .select(col("vec_id"),
            round(col("_s"), 9).as("scale"),
            aggregate(col("codes"), lit(0L), (a, x) => a + x).as("sum_codes"),
            round(aggregate(
              zip_with(col("embedding"), col("codes"),
                (x, c) => abs(x.cast("double") / col("_s") -
                  c.cast("double"))),
              lit(0.0), (a, y) => greatest(a, y)), 6).as("max_rel_err"))
      },
      Some("""WITH q AS (
          SELECT vec_id, embedding,
            GREATEST(LIST_MAX(LIST_TRANSFORM(embedding,
              x -> ABS(x::DOUBLE))), 1e-12) / 127.0 AS scale
          FROM embeddings WHERE embedding IS NOT NULL),
        c AS (
          SELECT vec_id, embedding, scale,
            LIST_TRANSFORM(embedding,
              x -> CAST(ROUND(x::DOUBLE / scale, 0) AS INT)) AS codes
          FROM q)
        SELECT vec_id, ROUND(scale, 9) AS scale,
          CAST(LIST_REDUCE(LIST_PREPEND(0, codes), (a, b) -> a + b)
            AS BIGINT) AS sum_codes,
          ROUND(LIST_MAX(LIST_TRANSFORM(RANGE(1, 65),
            i -> ABS(embedding[CAST(i AS INT)]::DOUBLE / scale
              - codes[CAST(i AS INT)]::DOUBLE))), 6) AS max_rel_err
        FROM c"""),
      "int8 scalar quantization of embeddings: max-abs scale, codes " +
        "checksum, per-vector max relative reconstruction error"),

    // Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25,
    // q106's scorer) and vector (cosine, q40's scorer) top-20 lists —
    // RRF(d) = sum over lists of 1/(60 + rank), the standard fusion
    // that needs no score calibration. Each list is bounded (top-20 via
    // TakeOrdered) BEFORE its rank window, so the windows see <= 20
    // rows; each 1/(60+r) term is nano-quantized before the cross-list
    // sum. Fusion joins documents to embeddings on doc_id = vec_id.
    Q("q111_hybrid_rrf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lex = graft.operators.Retrieval.bm25(
          Tables.load(s, dir, "documents"), "doc_id",
          graft.functions.TextFunctions.tokens(col("text")),
          Seq("spark", "hash", "merge"))
          .orderBy(col("score_n9").desc, col("doc_id").asc).limit(20)
          .withColumn("r_lex", row_number().over(
            Window.orderBy(col("score_n9").desc, col("doc_id").asc)))
          .select(col("doc_id").as("id"), col("r_lex"))
        val others = Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") =!= 0)
        val vec = Similarity
          .cosineTopK(others, "vec_id", "embedding", queryVec(s, dir), 20)
          .withColumn("r_vec", row_number().over(
            Window.orderBy(col("score").desc, col("vec_id").asc)))
          .select(col("vec_id").as("id"), col("r_vec"))
        lex.join(vec, Seq("id"), "full_outer")
          .select(col("id"),
            coalesce(col("r_lex"), lit(0)).as("lex_rank"),
            coalesce(col("r_vec"), lit(0)).as("vec_rank"),
            (when(col("r_lex").isNotNull,
              round(lit(1e9) / (lit(60) + col("r_lex"))).cast("long"))
              .otherwise(0L) +
             when(col("r_vec").isNotNull,
               round(lit(1e9) / (lit(60) + col("r_vec"))).cast("long"))
               .otherwise(0L)).as("rrf_n9"))
          .orderBy(col("rrf_n9").desc, col("id").asc).limit(10)
      },
      Some(VectorQueries.hybridRrfOracleSql),
      "hybrid lexical+vector retrieval: reciprocal-rank fusion of the " +
        "BM25 and cosine top-20 lists, bounded rank windows")
  )

  /** DuckDB replica of q111: the q106 BM25 chain and the q40 cosine
    * chain, each ranked and cut at 20, fused by nano-quantized
    * 1/(60+rank) terms. Ranks are cast to INT to match Spark's
    * row_number type.
    */
  lazy val hybridRrfOracleSql: String =
    s"""WITH t AS (
        SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
          x -> LEN(x) > 0) AS toks
        FROM documents),
      stats AS (
        SELECT COUNT(*) AS n_docs,
          CAST(SUM(LEN(toks)) AS DOUBLE) / COUNT(*) AS avgdl
        FROM t),
      base AS (SELECT doc_id, LEN(toks) AS dl, UNNEST(toks) AS w FROM t),
      tf AS (
        SELECT doc_id, w, COUNT(*) AS tf, MAX(dl) AS dl
        FROM base WHERE w IN ('spark', 'hash', 'merge')
        GROUP BY doc_id, w),
      idf AS (
        SELECT w, CAST(ROUND((1000000.0 * ((n_docs - df) + 0.5))
            / (df + 0.5), 0) AS BIGINT) AS idf_ppm
        FROM (SELECT w, COUNT(*) AS df FROM tf GROUP BY w), stats),
      c AS (
        SELECT doc_id, CAST(ROUND(
            ((idf_ppm * 1000.0) * (tf * (1.2 + 1.0)))
            / (tf + (1.2 * ((1.0 - 0.75) + (0.75 * (dl / avgdl))))), 0)
          AS BIGINT) AS c_n9
        FROM tf JOIN idf USING (w), stats),
      sc AS (SELECT doc_id, SUM(c_n9) AS s_n9 FROM c GROUP BY doc_id),
      lex AS (
        SELECT doc_id AS id, CAST(ROW_NUMBER() OVER
          (ORDER BY s_n9 DESC, doc_id) AS INT) AS r_lex
        FROM sc QUALIFY r_lex <= 20),
      q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      vs AS (
        SELECT e.vec_id AS id, ROUND($dotSql / ($normESql * $normQSql), 6)
          AS score
        FROM embeddings e, q WHERE e.vec_id <> 0),
      vec AS (
        SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id) AS INT)
          AS r_vec
        FROM vs QUALIFY r_vec <= 20),
      f AS (
        SELECT COALESCE(lex.id, vec.id) AS id,
          COALESCE(r_lex, 0) AS lex_rank, COALESCE(r_vec, 0) AS vec_rank,
          (CASE WHEN r_lex IS NULL THEN 0
            ELSE CAST(ROUND(1000000000.0 / (60 + r_lex), 0) AS BIGINT) END
           + CASE WHEN r_vec IS NULL THEN 0
            ELSE CAST(ROUND(1000000000.0 / (60 + r_vec), 0) AS BIGINT) END)
            AS rrf_n9
        FROM lex FULL JOIN vec ON vec.id = lex.id)
      SELECT id, lex_rank, vec_rank, rrf_n9
      FROM f ORDER BY rrf_n9 DESC, id LIMIT 10"""
}
