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

  private val dotSql =
    "LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)), (a,b) -> a+b)"
  private val normESql =
    "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)), (a,b) -> a+b))"
  private val normQSql =
    "SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65), " +
      "i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)), (a,b) -> a+b))"

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

    // Sign-LSH buckets use Scala-generated hyperplanes — rows-only check;
    // recall vs q40 is asserted in ScalaTest.
    Q("q43_ann_lsh",
      (s, dir) => {
        val others = Tables.load(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        Similarity.annTopK(others, "vec_id", "embedding", queryVec(s, dir),
          k = 10, nPlanes = 8)
      },
      None,
      "ANN top-k via sign-LSH bucket pruning (the 100 TB scale path)"),

    Q("q44_knn_per_label",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        // per-label centroid-free 1-NN of vec 0..4 within the same label:
        // bounded self-join (label is the blocking key)
        val probes = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("label"),
            col("embedding").as("probe_vec"))
        val cands = e.select(col("vec_id").as("cand_id"), col("label"),
          col("embedding").as("cand_vec"))
        probes.join(cands, Seq("label"))
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
      Some("""WITH p AS (SELECT vec_id AS probe_id, label, embedding AS pv
          FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS cand_id, label, embedding AS cv FROM embeddings),
        scored AS (
          SELECT p.probe_id, c.cand_id, p.label,
            ROUND(
              LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                i -> p.pv[i]::DOUBLE * c.cv[i]::DOUBLE)), (a,b) -> a+b)
              / (SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  i -> p.pv[i]::DOUBLE * p.pv[i]::DOUBLE)), (a,b) -> a+b))
               * SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  i -> c.cv[i]::DOUBLE * c.cv[i]::DOUBLE)), (a,b) -> a+b))), 6) AS score
          FROM p JOIN c ON p.label = c.label AND p.probe_id <> c.cand_id)
        SELECT probe_id, cand_id, label, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY score DESC, cand_id) AS rn FROM scored)
        WHERE rn = 1"""),
      "label-blocked kNN join (embedding-cosine near-dup building block)"),

    Q("q45_embed_dup_pairs",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val a = e.select(col("vec_id").as("id1"), col("label"),
          col("embedding").as("v1"))
        val b = e.select(col("vec_id").as("id2"), col("label"),
          col("embedding").as("v2"))
        a.join(b, Seq("label")).filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"),
            round(Similarity.cosine(col("v1"), col("v2")), 6).as("score"))
          .filter(col("score") >= 0.3)
      },
      Some("""WITH p AS (
          SELECT a.vec_id AS id1, b.vec_id AS id2,
            ROUND(
              LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                k -> a.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE)), (x,y)->x+y)
              / (SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  k -> a.embedding[k]::DOUBLE * a.embedding[k]::DOUBLE)), (x,y)->x+y))
               * SQRT(LIST_REDUCE(LIST_PREPEND(0.0, LIST_TRANSFORM(RANGE(1,65),
                  k -> b.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE)), (x,y)->x+y))), 6) AS score
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        SELECT id1, id2, score FROM p WHERE score >= 0.3"""),
      "embedding-cosine near-dup pairs, label-blocked (native codegen cosine)"),

    // clusterPairs is iterative (label propagation) — not single-statement
    // SQL; driver records rows-only, DedupSpec pins component semantics.
    Q("q46_dup_clusters",
      (s, dir) => {
        val pairs = graft.operators.Dedup.jaccardPairsByCooccurrence(
          Tables.load(s, dir, "documents"), "doc_id",
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))),
          Seq(col("lang"), floor(col("n_chars") / 50)),
          threshold = 0.6)
        graft.operators.Dedup.clusterPairs(pairs)
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("n_members"))
      },
      None,
      "near-dup clusters: connected components over jaccard pairs -> keep-one groups")
  )
}
