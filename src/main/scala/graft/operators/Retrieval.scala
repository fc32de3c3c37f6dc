package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed lexical retrieval scoring (BM25, Robertson & Walker 1994 /
  * the Okapi formulation) — the relevance gate a training-data pipeline
  * uses to pull topical subsets out of a web-scale corpus (and the lexical
  * half of hybrid lexical+vector retrieval next to `Similarity`).
  *
  * Determinism contract (the repo-wide convention): the inverse document
  * frequency is kept RATIONAL — `(N - df + 0.5) / (df + 0.5)`, ppm-
  * quantized — instead of the classical `ln` form, because `log()` is not
  * correctly-rounded across engines. Every per-(doc, term) contribution is
  * nano-quantized to a LONG before the per-doc sum, so partition order can
  * never flip a bit. Monotonicity in (tf, idf) is unchanged, so rankings
  * match the classical form for any fixed query.
  *
  * Scale shape (100 TB): the token stream is filtered to the query terms
  * MAP-SIDE before its only shuffle (the (doc, term) partial agg) — the
  * shuffled volume is O(matching tokens), not corpus tokens. The corpus
  * stats (N, avgdl) and the per-term df/idf tables are 1-row / |terms|-row
  * aggregates that broadcast back. Top-k is TakeOrderedAndProject, never a
  * global sort.
  */
object Retrieval {

  /** Per-document BM25 scores for a fixed query-term set.
    *
    * @param docs     corpus
    * @param idCol    document id column name
    * @param toksCol  tokenized-text column (array&lt;string&gt;)
    * @param terms    query terms (exact-match against tokens)
    * @return (idCol, n_terms, score_n9) — one row per doc matching >= 1
    *         term; `score_n9` is the nano-quantized BM25 sum (order by it,
    *         not by a re-derived double)
    */
  def bm25(docs: DataFrame, idCol: String, toksCol: Column,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol), toksCol.as("_t"))
      .select(col(idCol), size(col("_t")).as("dl"), explode(col("_t")).as("w"))

    // corpus stats: one bounded agg, broadcast back as a single row
    val stats = docs.select(toksCol.as("_t"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(size(col("_t"))).cast("double") / count(lit(1))).as("avgdl"))

    // map-side term filter -> the ONLY corpus-sized shuffle is the
    // (doc, term) partial agg over matching tokens
    val tf = base.filter(col("w").isin(terms: _*))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // df/idf: |terms| rows; rational idf, ppm-quantized. The 1-row stats
    // attach HERE (avgdl rides along to the scoring join), so the stats
    // aggregation scans the corpus exactly once.
    val idf = tf.groupBy("w").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("w"), col("avgdl"),
        round(lit(1e6) * (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))).cast("long").as("idf_ppm"))

    // nano-quantized per-(doc, term) contribution — identical operation
    // order to the DuckDB oracle so IEEE doubles agree bit-for-bit
    tf.join(broadcast(idf), "w")
      .select(col(idCol),
        round(col("idf_ppm") * lit(1000.0) * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
          .cast("long").as("c_n9"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms"), sum(col("c_n9")).as("score_n9"))
  }
}
