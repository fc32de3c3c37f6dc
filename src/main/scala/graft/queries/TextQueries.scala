package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + deduplication coverage over the `documents` table:
  * tokenization/counting, language-ID heuristic, quality scoring, exact
  * dedup, MinHash signatures, bucketed n-gram Jaccard pairs, SimHash.
  * (Training-data pipeline operators — first-class per the build brief.)
  */
object TextQueries {

  /** DuckDB replica of SimhashMd5Expr: per token take the first 16 hex
    * chars of md5; bit j (MSB-first) votes ±1; fingerprint nibble = the 4
    * vote signs. Generated, not hand-written — 64 bit votes.
    */
  lazy val simhashMd5OracleSql: String = {
    def vote(j: Int): String = {
      val digit = j / 4 + 1
      val shift = 3 - (j % 4)
      "2*LEN(LIST_FILTER(hs, h -> (((STRPOS('0123456789abcdef', " +
        s"SUBSTR(h, $digit, 1)) - 1) >> $shift) & 1) = 1)) > LEN(hs)"
    }
    val digits = (0 until 16).map { d =>
      val v = (0 until 4).map(k =>
        s"(CASE WHEN ${vote(d * 4 + k)} THEN ${1 << (3 - k)} ELSE 0 END)")
        .mkString(" + ")
      s"SUBSTR('0123456789abcdef', 1 + ($v), 1)"
    }.mkString(" || ")
    s"""WITH t AS (
      SELECT doc_id,
        LIST_TRANSFORM(LIST_DISTINCT(LIST_FILTER(
          REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'), x -> LEN(x) > 0)),
          x -> SUBSTR(MD5(x), 1, 16)) AS hs
      FROM documents)
    SELECT doc_id, $digits AS simhash FROM t"""
  }

  /** DuckDB replica of Dedup.simhashHammingPairs(maxHamming = 3) — but
    * deliberately WITHOUT the banding: brute-force all-pairs Hamming over
    * the same md5-keyed fingerprints. Because banding with
    * maxHamming < bands is exact (pigeonhole over bit-blocks), the
    * banded Spark plan and this O(n²) scan must produce the identical
    * pair set — the oracle therefore verifies the recall guarantee
    * itself, not just the arithmetic.
    */
  lazy val simhashHammingOracleSql: String = {
    // 64-bit fingerprint halves as BIGINTs folded from the hex digits
    def hexVal(off: String): String =
      "LIST_REDUCE(LIST_PREPEND(0::BIGINT, LIST_TRANSFORM(RANGE(1, 9), " +
        s"i -> (STRPOS('0123456789abcdef', SUBSTR(simhash, i$off, 1)) - 1)::BIGINT)), " +
        "(a, d) -> a * 16 + d)"
    val ham = "(BIT_COUNT(XOR(a.hi, b.hi)) + BIT_COUNT(XOR(a.lo, b.lo)))"
    s"""WITH sim AS ($simhashMd5OracleSql),
      h AS (SELECT doc_id, ${hexVal("")} AS hi, ${hexVal(" + 8")} AS lo
        FROM sim)
      SELECT a.doc_id AS id1, b.doc_id AS id2, $ham::INT AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id
      WHERE $ham <= 3"""
  }

  /** Shared minhash-LSH signature pipeline for EVERY LSH oracle (word
    * bigrams, k=8, bands=2): toks -> distinct shingles -> md5 min-wise
    * signatures -> band keys, ending in `buckets0(doc_id, bucket)`. ONE
    * definition so the pair-gen (q48/q116), occupancy-audit (q117), and
    * cross-match (q84/q112) replicas can never drift apart on the
    * shingle or banding scheme — the same reason v48Fold is shared.
    */
  private lazy val lshSigCtes: String = {
    val mh = (0 until 8).map(i =>
      s"LIST_MIN(LIST_TRANSFORM(shs, x -> MD5('$i|' || x))) AS mh$i").mkString(",\n          ")
    val bandKeys = (0 until 2).map { b =>
      val parts = (0 until 4).map(j => s"mh${b * 4 + j}").mkString(" || ',' || ")
      s"MD5('$b|' || $parts)"
    }.mkString(", ")
    s"""toks AS (
        SELECT doc_id,
          LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
            x -> LEN(x) > 0) AS t
        FROM documents),
      sh AS (
        SELECT doc_id,
          LIST_DISTINCT(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(t) - 2, 0) + 1),
            i -> ARRAY_TO_STRING(t[CAST(i + 1 AS INT):CAST(i + 2 AS INT)], ' '))) AS shs
        FROM toks),
      sig AS (
        SELECT doc_id, shs,
          $mh
        FROM sh),
      buckets0 AS (
        SELECT doc_id, UNNEST([$bandKeys]) AS bucket FROM sig)"""
  }

  /** DuckDB replica of Dedup.minhashLshPairs(word bigrams, k=8, bands=2,
    * t=0.5):
    * md5 min-wise signatures, md5 band keys, bucket self-join, true
    * shingle-set Jaccard verification.
    */
  lazy val lshPairsOracleSql: String = lshPairsOracle(None)

  /** Same pipeline with the band-bucket cap applied before pair-gen —
    * buckets holding more than `cap` docs are dropped, mirroring
    * `Dedup.minhashLshPairs(maxBucketSize = cap)`.
    */
  def lshPairsCappedOracleSql(cap: Int): String = lshPairsOracle(Some(cap))

  private def lshPairsOracle(cap: Option[Int]): String = {
    val bucketsSrc = cap match {
      case Some(c) =>
        s"""(SELECT doc_id, bucket FROM (
          SELECT doc_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS _bsz
          FROM buckets0) WHERE _bsz <= $c)"""
      case None => "buckets0"
    }
    s"""WITH $lshSigCtes,
      buckets AS (
        SELECT doc_id, bucket FROM $bucketsSrc),
      pairs AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
      SELECT p.id1, p.id2,
        ROUND(CAST(LEN(LIST_INTERSECT(s1.shs, s2.shs)) AS DOUBLE)
          / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(s1.shs, s2.shs))), 1), 6) AS jaccard
      FROM pairs p
      JOIN sh s1 ON s1.doc_id = p.id1
      JOIN sh s2 ON s2.doc_id = p.id2
      WHERE ROUND(CAST(LEN(LIST_INTERSECT(s1.shs, s2.shs)) AS DOUBLE)
          / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(s1.shs, s2.shs))), 1), 6) >= 0.5"""
  }

  /** DuckDB replica of Dedup.lshBucketStats(word bigrams, k=8, bands=2):
    * per-band-bucket occupancy with the cap's dropped flag.
    */
  def lshBucketStatsOracleSql(cap: Int): String =
    s"""WITH $lshSigCtes
      SELECT bucket, COUNT(*) AS n_docs, COUNT(*) > $cap AS dropped
      FROM buckets0 GROUP BY 1"""

  /** DuckDB replica of Dedup.minhashLshCrossMatches (word bigrams, k=8,
    * bands=2, containment 0.5) over the train (doc_id%5<>0) vs eval
    * (doc_id%5=0) split: same md5 signatures and band keys as the q48
    * oracle, asymmetric candidate join, containment verification.
    */
  lazy val crossDecontamOracleSql: String =
    lshCrossMatchOracle("% 5 <> 0", "% 5 = 0")

  /** DuckDB replica of Dedup.minhashLshCrossMatches for any two disjoint
    * doc_id splits (`trainCond`/`evalCond` are SQL predicates on doc_id):
    * same md5 min-wise signatures, band keys, and containment round.
    */
  private def lshCrossMatchOracle(trainCond: String, evalCond: String): String = {
    val contain =
      """ROUND(CAST(LEN(LIST_INTERSECT(t.shs, e.shs)) AS DOUBLE)
          / GREATEST(LEN(e.shs), 1), 6)"""
    s"""WITH $lshSigCtes,
      cand AS (
        SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS eval_id
        FROM buckets0 a JOIN buckets0 b ON a.bucket = b.bucket
        WHERE a.doc_id $trainCond AND b.doc_id $evalCond)
      SELECT c.train_id, c.eval_id, $contain AS containment
      FROM cand c
      JOIN sh t ON t.doc_id = c.train_id
      JOIN sh e ON e.doc_id = c.eval_id
      WHERE $contain >= 0.5"""
  }

  val all: Seq[Q] = Seq(
    Q("q20_token_stats",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            length(col("text")).as("n_chars_live"),
            approxBpeCount(col("text")).as("n_bpe_approx")),
      Some("""SELECT doc_id,
        LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), t -> LEN(t) > 0)) AS n_tokens,
        LENGTH(text) AS n_chars_live,
        CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_bpe_approx
        FROM documents"""),
      "token counting (whitespace + BPE-ish estimate)"),

    Q("q21_lang_id",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), langIdHeuristic(col("text")).as("pred_lang")),
      Some("""WITH t AS (
        SELECT doc_id,
          LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\s+'), x -> LEN(x) > 0) AS toks
        FROM documents)
        SELECT doc_id,
        CASE WHEN CAST(LEN(LIST_FILTER(toks,
            x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
            / GREATEST(LEN(toks), 1) >= 0.04
          THEN 'en' ELSE 'unknown' END AS pred_lang
        FROM t"""),
      "n-gram/stopword language-ID heuristic"),

    Q("q22_quality_score",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), qualityScore(col("text")).as("quality")),
      Some("""WITH t AS (
        SELECT doc_id, text,
          LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0) AS toks
        FROM documents)
        SELECT doc_id, ROUND((
          LEAST(CAST(LEN(toks) AS DOUBLE) / 100.0, 1.0)
          + (1.0 - LEAST(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
              / GREATEST(LENGTH(text), 1) * 5, 1.0))
          + LEAST(CAST(LEN(LIST_FILTER(toks,
              x -> x IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
              / GREATEST(LEN(toks), 1) * 10, 1.0)
        ) / 3, 6) AS quality
        FROM t"""),
      "document quality scoring (length/punct/stopword ratios)"),

    Q("q23_exact_dedup",
      (s, dir) =>
        Dedup.exactDedup(Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some("""SELECT MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))) AS fp,
        MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        FROM documents GROUP BY 1"""),
      "exact dedup: single shuffle on content hash"),

    Q("q24_minhash_sig",
      (s, dir) => {
        val sig = Dedup.minhashSignature(col("text"), n = 5, k = 4)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            sig.getItem(0).as("mh0"), sig.getItem(1).as("mh1"),
            sig.getItem(2).as("mh2"), sig.getItem(3).as("mh3"))
      },
      Some("""WITH sh AS (
        SELECT doc_id,
          LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 4, 1) + 1),
            i -> SUBSTR(text, i, 5)) AS shingles
        FROM documents)
        SELECT doc_id,
          LIST_MIN(LIST_TRANSFORM(shingles, x -> MD5('0|' || x))) AS mh0,
          LIST_MIN(LIST_TRANSFORM(shingles, x -> MD5('1|' || x))) AS mh1,
          LIST_MIN(LIST_TRANSFORM(shingles, x -> MD5('2|' || x))) AS mh2,
          LIST_MIN(LIST_TRANSFORM(shingles, x -> MD5('3|' || x))) AS mh3
        FROM sh"""),
      "MinHash signatures over 5-char shingles (md5 min-wise family, engine-portable)"),

    Q("q25_jaccard_pairs",
      (s, dir) =>
        Dedup.jaccardPairsByCooccurrence(
          Tables.load(s, dir, "documents"), "doc_id",
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))),
          Seq(col("lang"), floor(col("n_chars") / 50)),
          threshold = 0.6),

      Some("""WITH d AS (
        SELECT doc_id, lang, CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket,
          LIST_DISTINCT(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0)) AS toks
        FROM documents)
        SELECT a.doc_id AS id1, b.doc_id AS id2,
          ROUND(CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
            / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 1), 6) AS jaccard
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE ROUND(CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
            / GREATEST(LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks))), 1), 6) >= 0.6"""),
      "n-gram Jaccard near-dup pairs via bounded bucket join"),

    // Both simhash variants: the md5-keyed fingerprint is recomputed
    // bit-for-bit by the DuckDB oracle (hash_hex); the xxhash64-keyed
    // production variant (~3x faster/token) is covered by property tests
    // (DedupSpec bit-identity) and is exercised here for the plan.
    Q("q26_simhash",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), Dedup.simhashMd5(col("text")).as("simhash")),
      Some(TextQueries.simhashMd5OracleSql),
      "64-bit SimHash fingerprints (md5-keyed, engine-portable; " +
        "xxhash64 variant for production throughput)"),

    // The full MinHash+LSH banding pipeline (signatures -> band buckets ->
    // in-bucket candidates -> true-jaccard verify); every stage is
    // md5-keyed, so the oracle replicates it end-to-end.
    Q("q48_lsh_pairs",
      (s, dir) =>
        Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", k = 8, bands = 2, threshold = 0.5,
          wordGrams = Some(2)),
      Some(TextQueries.lshPairsOracleSql),
      "MinHash+LSH near-dup pairs: banding prunes the pair space, true " +
        "Jaccard verifies candidates (the 100 TB dedup path)"),

    // The band-bucket cap exercised where it FIRES: maxBucketSize=2 drops
    // the oversized buckets at this scale, and the oracle models the same
    // drop (QUALIFY on the per-bucket count) — so the guard's semantics,
    // not just its presence, are oracle-verified cross-engine. Production
    // default (8192) never fires at bench scales; q48 pins that path.
    Q("q116_lsh_bucket_cap",
      (s, dir) =>
        Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", k = 8, bands = 2, threshold = 0.5,
          wordGrams = Some(2), maxBucketSize = 2),
      Some(TextQueries.lshPairsCappedOracleSql(2)),
      "LSH pair-gen under a band-bucket size cap (boilerplate-collision " +
        "guard): oversized buckets dropped before the quadratic self-join"),

    // Observability for the cap: one row per band bucket with its
    // occupancy and whether the cap excludes it. This is what an operator
    // reads before trusting capped pair output on a new corpus.
    Q("q117_lsh_bucket_stats",
      (s, dir) =>
        Dedup.lshBucketStats(Tables.load(s, dir, "documents"),
          "doc_id", "text", k = 8, bands = 2,
          wordGrams = Some(2), maxBucketSize = 2),
      Some(TextQueries.lshBucketStatsOracleSql(2)),
      "band-bucket occupancy audit: size + dropped flag per bucket under " +
        "the pair-gen cap"),

    // SimHash near-dup DETECTION (q26 grades only the fingerprint):
    // banded Hamming candidate generation, exact by pigeonhole for
    // maxHamming < bands. The oracle is the un-banded brute-force scan,
    // so a green row proves the banding loses no pairs.
    Q("q120_simhash_neardup",
      (s, dir) =>
        Dedup.simhashHammingPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text", bands = 4, maxHamming = 3),
      Some(TextQueries.simhashHammingOracleSql),
      "SimHash near-dup pairs via exact Hamming banding (Manku WWW'07): " +
        "one shuffle on 16-bit blocks, bit_count(xor) verify in-bucket"),

    Q("q27_fingerprint",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp")),
      Some("""SELECT doc_id,
        MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\s+', ' ', 'g'))) AS fp
        FROM documents"""),
      "stable normalized-content fingerprint"),

    Q("q28_explode_tokens",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(20),
      Some("""SELECT token, COUNT(*) AS n FROM (
          SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0)) AS token
          FROM documents)
        GROUP BY token ORDER BY n DESC, token LIMIT 20"""),
      "ITEMS/explode generator (Methods/Misc.cs:69) + top-20 vocabulary"),

    Q("q29_normalize_redact",
      (s, dir) => {
        // inject synthetic PII markers so the redaction paths execute, then
        // normalize — the standard pre-tokenization cleaning pass
        val withPii = Tables.load(s, dir, "documents")
          .withColumn("dirty",
            concat(lit("<b>User "), col("doc_id"), lit("</b> mail: u"),
              col("doc_id"), lit("@example.com  ip 10.0.0.1 \t "), col("text")))
        withPii.select(col("doc_id"),
          redactPii(normalizeText(col("dirty"))).as("clean"))
      },
      Some("""WITH d AS (
          SELECT doc_id,
            '<b>User ' || doc_id || '</b> mail: u' || doc_id
              || '@example.com  ip 10.0.0.1 ' || CHR(9) || ' ' || text AS dirty
          FROM documents),
        norm AS (
          SELECT doc_id,
            LOWER(TRIM(REGEXP_REPLACE(
              REGEXP_REPLACE(
                REGEXP_REPLACE(dirty, '<[^>]*>', ' ', 'g'),
                '[\x00-\x1f\x7f]', ' ', 'g'),
              '\s+', ' ', 'g'))) AS t
          FROM d)
        SELECT doc_id,
          REGEXP_REPLACE(
            REGEXP_REPLACE(
              REGEXP_REPLACE(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
            '\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS clean
        FROM norm"""),
      "corpus cleaning: markup/control strip + whitespace collapse + PII redaction"),

    // Benchmark decontamination, the published-pipeline shape (GPT-3/Llama
    // style): exact 13-gram overlap between training docs and an eval set.
    // The eval side is always small relative to the corpus, so its distinct
    // gram set is BROADCAST — the 100 TB train side is a single codegen'd
    // scan + hash probe, no shuffle. word_shingles emits DISTINCT grams per
    // doc in one native pass, so n_hits needs no dedup.
    Q("q79_contamination",
      (s, dir) => {
        val g = Tables.load(s, dir, "documents").select(col("doc_id"),
          graft.functions.GraftFunctions
            .word_shingles(tokens(col("text")), 13).as("grams"))
        // explode_outer + post-filter instead of explode: plain explode
        // inserts a size(e)>0 pre-filter whose expression re-evaluates the
        // shingle kernel (3x per row after projection collapse); with the
        // outer form + carried array column the kernel runs exactly once
        // and n_grams is an O(1) length read of the materialized array
        val ev = g.filter(col("doc_id") % 5 === 0)
          .select(explode_outer(col("grams")).as("gram"))
          .filter(col("gram").isNotNull).distinct()
        g.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"), col("grams"),
            explode_outer(col("grams")).as("gram"))
          .filter(col("gram").isNotNull)
          .select(col("doc_id"), size(col("grams")).as("n_grams"), col("gram"))
          // broadcast(ev) encodes the decontamination CONTRACT: the eval
          // side is a benchmark suite (thousands of docs), bounded by
          // construction, NOT a corpus fraction — the doc_id % 5 split
          // here is only the testdata stand-in for it. An eval set that
          // outgrows the contract fails loudly at Spark's broadcast
          // limit rather than silently degrading.
          .join(broadcast(ev), "gram")
          .groupBy("doc_id", "n_grams")
          .agg(count(lit(1)).as("n_hits"))
          .select(col("doc_id"), col("n_grams"), col("n_hits"),
            round(col("n_hits").cast("double") / col("n_grams"), 6)
              .as("contam_ratio"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0) AS t
          FROM documents),
        g AS (
          SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(
            RANGE(1, GREATEST(LEN(t) - 13, 0) + 2),
            i -> ARRAY_TO_STRING(t[i:i+12], ' '))) AS grams
          FROM toks),
        ev AS (SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 5 = 0),
        tr AS (SELECT doc_id, LEN(grams) AS n_grams, UNNEST(grams) AS gram
          FROM g WHERE doc_id % 5 <> 0)
        SELECT tr.doc_id, tr.n_grams, COUNT(*) AS n_hits,
          ROUND(CAST(COUNT(*) AS DOUBLE) / tr.n_grams, 6) AS contam_ratio
        FROM tr JOIN ev ON tr.gram = ev.gram
        GROUP BY tr.doc_id, tr.n_grams"""),
      "eval-set decontamination: exact 13-gram overlap vs a broadcast " +
        "benchmark gram set (train side never shuffles)"),

    // Fuzzy decontamination: MinHash+LSH candidates between the training
    // split and a broadcast eval split, verified by shingle containment
    // |T∩E|/|E| (catches paraphrased/embedded eval docs that exact
    // 13-gram overlap in q79 misses). The corpus side never shuffles.
    Q("q84_fuzzy_decontam",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.minhashLshCrossMatches(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id",
          docs.filter(col("doc_id") % 5 === 0), "doc_id",
          "text", wordGrams = 2, k = 8, bands = 2, threshold = 0.5)
      },
      Some(TextQueries.crossDecontamOracleSql),
      "fuzzy train-vs-eval decontamination: LSH band candidates + " +
        "shingle-containment verify, eval side fully broadcast"),

    // Gopher-style repetition filters (Rae et al. 2021 §A1.1): type-token
    // ratio, most-common-word share, duplicate word-2-gram share, and the
    // keep/drop verdict at corpus-policy thresholds. Group keys are all
    // doc-scoped, so partial agg combines map-side at any corpus size.
    Q("q83_repetition_filter",
      (s, dir) =>
        graft.operators.QualityFilters.repetitionMetrics(
          Tables.load(s, dir, "documents"), "doc_id", "text", gramN = 2)
          .withColumn("keep",
            col("ttr") >= 0.35 && col("top_word_frac") <= 0.12 &&
              col("dup_gram_frac") <= 0.1),
      Some("""WITH toks AS (
          SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0) AS t
          FROM documents),
        w AS (SELECT doc_id, LEN(t) AS n_toks, UNNEST(t) AS w FROM toks),
        wc AS (SELECT doc_id, n_toks, w, COUNT(*) AS cnt FROM w GROUP BY 1, 2, 3),
        ws AS (SELECT doc_id, n_toks, COUNT(*) AS n_types, MAX(cnt) AS top_w
          FROM wc GROUP BY 1, 2),
        g AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(t)-2,0)+2),
            i -> ARRAY_TO_STRING(t[i:i+1], ' '))) AS gm FROM toks),
        gc AS (SELECT doc_id, gm, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
        gs AS (SELECT doc_id, SUM(cnt) AS n_grams,
            SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_grams
          FROM gc GROUP BY 1),
        m AS (
          SELECT ws.doc_id, ws.n_toks,
            ROUND(CAST(n_types AS DOUBLE) / GREATEST(n_toks, 1), 6) AS ttr,
            ROUND(CAST(top_w AS DOUBLE) / GREATEST(n_toks, 1), 6) AS top_word_frac,
            ROUND(CAST(dup_grams AS DOUBLE) / GREATEST(n_grams, 1), 6) AS dup_gram_frac
          FROM ws JOIN gs ON gs.doc_id = ws.doc_id)
        SELECT doc_id, n_toks, ttr, top_word_frac, dup_gram_frac,
          (ttr >= 0.35 AND top_word_frac <= 0.12 AND dup_gram_frac <= 0.1) AS keep
        FROM m"""),
      "Gopher-style repetition filters: type-token ratio, top-word share, " +
        "duplicate 2-gram share -> keep/drop verdict"),

    // CCNet-style language-model scoring with a deterministic stand-in:
    // a unigram model trained on the corpus itself. Per-token frequency is
    // quantized to an exact parts-per-billion integer, so per-doc sums are
    // order-independent (a double sum would depend on partition order) and
    // log() — which is not correctly-rounded across engines — never
    // appears. rare_frac (share of sub-0.1% tokens) is the drop signal.
    // At 100 TB the vocab join is a plain shuffle join on the token (here
    // AQE broadcasts the small side); the two aggs are doc-scoped.
    Q("q88_unigram_score",
      (s, dir) => {
        val toks = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        // total via a broadcast 1-row agg, NOT an empty-frame window (a
        // global window would serialize the whole vocabulary onto one
        // partition at corpus scale)
        val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
        val vocab = counts
          .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
          .select(col("w"),
            round(col("cnt").cast("double") * lit(1e9) / col("total"))
              .cast("long").as("freq_ppb"))
        toks.join(vocab, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum(col("freq_ppb")).as("sum_ppb"),
            sum(when(col("freq_ppb") < 1000000L, 1L).otherwise(0L))
              .as("n_rare"))
          .select(col("doc_id"), col("n_toks"),
            round(col("sum_ppb").cast("double") /
              (col("n_toks") * lit(1e9)), 6).as("mean_token_freq"),
            round(col("n_rare").cast("double") /
              col("n_toks").cast("double"), 6).as("rare_frac"))
      },
      Some("""WITH t AS (
          SELECT doc_id, UNNEST(LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0)) AS w
          FROM documents),
        v AS (
          SELECT w, CAST(ROUND(CAST(COUNT(*) AS DOUBLE) * 1000000000.0
              / (SUM(COUNT(*)) OVER ()), 0) AS BIGINT) AS freq_ppb
          FROM t GROUP BY w)
        SELECT doc_id, COUNT(*) AS n_toks,
          ROUND(CAST(SUM(freq_ppb) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6)
            AS mean_token_freq,
          ROUND(CAST(SUM(CASE WHEN freq_ppb < 1000000 THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*), 6) AS rare_frac
        FROM t JOIN v USING (w)
        GROUP BY doc_id"""),
      "unigram-LM quality scoring (CCNet shape, deterministic stand-in): " +
        "ppb-quantized token frequencies, order-independent doc sums"),

    // Context-window chunking: every training pipeline's step between
    // cleaning and packing — split each doc into 100-token windows with
    // 80-token stride (20-token overlap). Pure map-side explode; chunk
    // count per doc is bounded by doc length, never corpus size.
    Q("q90_context_chunks",
      (s, dir) => {
        val chunks = graft.functions.TextFunctions.tokenChunks(
          tokens(col("text")), chunkLen = 100, stride = 80)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(chunks).as("c"))
          .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
            size(col("c.toks")).as("n_toks"),
            concat_ws(" ", col("c.toks")).as("chunk_text"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0) AS t
          FROM documents),
        st AS (
          SELECT doc_id, t,
            UNNEST(RANGE(0, GREATEST(LEN(t), 1), 80)) AS s
          FROM toks)
        SELECT doc_id, CAST(s // 80 AS INT) AS chunk_idx,
          LEN(t[CAST(s + 1 AS INT):CAST(s + 100 AS INT)]) AS n_toks,
          ARRAY_TO_STRING(t[CAST(s + 1 AS INT):CAST(s + 100 AS INT)], ' ')
            AS chunk_text
        FROM st"""),
      "context-window chunking: 100-token windows, 80-token stride, " +
        "map-side explode only"),

    // Exact repeated-span detection (the distributed shape of
    // suffix-array substring dedup, Lee et al. 2022): hash every 10-token
    // window, mark spans occurring in >= 2 distinct docs, report each
    // doc's duplicated-window share. The full span stream shuffles ONCE
    // (to the (h, doc_id) partial agg); the window count and the per-doc
    // rollup run over the reduced distinct-pair table.
    Q("q92_span_dedup",
      (s, dir) => {
        // The explicit isNotNull is a no-op on the data but load-bearing
        // for the plan: the final left join infers isnotnull(doc_id) and
        // pushes it into the probe branch only — without pre-seeding the
        // same filter on the shared base, the two perDoc subtrees stop
        // canonicalizing equal and ReuseExchange can't share the
        // span-stream shuffle.
        val spans = Tables.load(s, dir, "documents")
          .filter(col("doc_id").isNotNull)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .select(col("doc_id"),
            explode(wordShingles(col("t"), 10)).as("span"))
          .select(col("doc_id"), md5(col("span")).as("h"))
        val perDoc = spans.groupBy(col("h"), col("doc_id"))
          .agg(count(lit(1)).as("c"))
        // Cross-doc duplicate marking via agg + join against the FILTERED
        // duplicated-span set, NOT count().over(Window.partitionBy(h)): a
        // hot span (boilerplate present in 1e7+ docs at 100 TB) would
        // form ONE window partition on one task — and AQE splits skewed
        // join partitions, never window partitions. The filter makes the
        // join side |spans seen in >= 2 docs|, proportional to the
        // actual duplication, not the corpus — so the join is small/
        // broadcastable in the common case and AQE-handled otherwise.
        // h_occ = sum(c) is carried ONLY so this branch keeps `c` in use:
        // without it, column pruning rewrites its copy of perDoc to a
        // keys-only distinct, the two partial-agg subtrees stop
        // canonicalizing equal, and ReuseExchange can no longer share
        // the span-stream shuffle — the whole tokenize/shingle/md5
        // pipeline would run twice (measured 2.5x on the full query at
        // sf1). least(c, h_occ) below is an identity (h_occ is a sum
        // including c, so h_occ >= c) that Catalyst has no rule to
        // prune away.
        val dupSpans = perDoc.groupBy("h")
          .agg(count(lit(1)).as("ndocs"), sum(col("c")).as("h_occ"))
          .filter(col("ndocs") >= 2)
        val nDup = perDoc.join(dupSpans, "h")
          .groupBy("doc_id")
          .agg(sum(least(col("c"), col("h_occ"))).as("n_dup"))
        // n_spans needs no shuffle at all: every position emits exactly
        // one 10-token window (short docs emit their single tail span),
        // so the count is greatest(len-10, 0)+1 straight off the scan.
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            (greatest(size(tokens(col("text"))) - 10, lit(0)) + 1)
              .cast("long").as("n_spans"))
          .join(nDup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_spans"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup"),
            round(coalesce(col("n_dup"), lit(0L)).cast("double") /
              col("n_spans").cast("double"), 6).as("dup_frac"))
      },
      Some("""WITH toks AS (
          SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
            x -> LEN(x) > 0) AS t
          FROM documents),
        spans AS (
          SELECT doc_id,
            UNNEST(LIST_TRANSFORM(RANGE(0, GREATEST(LEN(t) - 10, 0) + 1),
              i -> MD5(ARRAY_TO_STRING(
                t[CAST(i + 1 AS INT):CAST(i + 10 AS INT)], ' ')))) AS h
          FROM toks),
        perdoc AS (
          SELECT h, doc_id, COUNT(*) AS c FROM spans GROUP BY h, doc_id),
        withn AS (
          SELECT doc_id, c, COUNT(*) OVER (PARTITION BY h) AS ndocs
          FROM perdoc)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_spans,
          CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS BIGINT)
            AS n_dup,
          ROUND(CAST(SUM(CASE WHEN ndocs >= 2 THEN c ELSE 0 END) AS DOUBLE)
            / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac
        FROM withn GROUP BY doc_id"""),
      "repeated-span dedup (suffix-array substring-dedup shape): 10-token " +
        "window hashes, cross-doc duplicate marking, per-doc dup share"),

    // The published Gopher document-quality rule set (Rae et al. 2021
    // §A1.1) — per-rule booleans + composite keep. Pure codegen HOF
    // projection over one tokenization: no shuffle, runs at scan speed.
    Q("q95_gopher_rules",
      (s, dir) =>
        graft.operators.QualityFilters.gopherRules(
          Tables.load(s, dir, "documents"), "doc_id", "text", minWords = 50),
      Some("""WITH toks AS (
          SELECT doc_id, text,
            LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
              x -> LEN(x) > 0) AS t,
            LIST_FILTER(STR_SPLIT(text, CHR(10)),
              l -> LEN(TRIM(l)) > 0) AS ls
          FROM documents),
        m AS (
          SELECT doc_id,
            LEN(t) AS n_words,
            ROUND(CAST(LIST_REDUCE(LIST_PREPEND(0,
                LIST_TRANSFORM(t, w -> LEN(w))), (a, b) -> a + b) AS DOUBLE)
              / GREATEST(LEN(t), 1), 6) AS mean_word_len,
            ROUND((LEN(LIST_FILTER(t, w -> CONTAINS(w, '#')))
                + (LEN(text) - LEN(REPLACE(text, '...', ''))) / 3.0)
              / GREATEST(LEN(t), 1), 6) AS symbol_ratio,
            ROUND(CAST(LEN(LIST_FILTER(t,
                w -> REGEXP_MATCHES(w, '[a-zA-Z]'))) AS DOUBLE)
              / GREATEST(LEN(t), 1), 6) AS alpha_frac,
            LEN(LIST_INTERSECT(t,
              ['the','be','to','of','and','that','have','with'])) AS stop_hits,
            ROUND(CAST(LEN(LIST_FILTER(ls,
                l -> REGEXP_MATCHES(TRIM(l), '^[-*•]'))) AS DOUBLE)
              / GREATEST(LEN(ls), 1), 6) AS bullet_frac,
            ROUND(CAST(LEN(LIST_FILTER(ls,
                l -> REGEXP_MATCHES(TRIM(l), '\.\.\.$'))) AS DOUBLE)
              / GREATEST(LEN(ls), 1), 6) AS ellipsis_line_frac
          FROM toks)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
          stop_hits, bullet_frac, ellipsis_line_frac,
          (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
          (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS rule_mean_len,
          (symbol_ratio <= 0.1) AS rule_symbols,
          (alpha_frac >= 0.8) AS rule_alpha,
          (stop_hits >= 2) AS rule_stopwords,
          (bullet_frac <= 0.9 AND ellipsis_line_frac <= 0.3) AS rule_lines,
          ((n_words >= 50 AND n_words <= 100000)
            AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
            AND stop_hits >= 2
            AND (bullet_frac <= 0.9 AND ellipsis_line_frac <= 0.3)) AS keep
        FROM m"""),
      "Gopher document-quality rules (word count, mean word length, " +
        "symbol/alpha ratios, stopword hits, line shapes) -> keep verdict"),

    // BPE merge learning (Sennrich et al. 2016): the corpus reduces to
    // its word-frequency table first (the only corpus-sized shuffle),
    // then adjacent-pair counts explode over the VOCAB table and shuffle
    // on the tiny pair key. Top-20 merges with a total-order tiebreak.
    Q("q96_bpe_merge_step",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val freqs = graft.operators.TokenizerTraining.wordFrequencies(
          Tables.load(s, dir, "documents"), "text")
        graft.operators.TokenizerTraining.bpePairCounts(freqs)
          .orderBy(col("merge_count").desc, col("pair"))
          .limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("merge_count").desc, col("pair"))))
      },
      Some("""WITH w AS (
          SELECT UNNEST(LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0)) AS word
          FROM documents),
        wc AS (SELECT word, COUNT(*) AS word_cnt FROM w GROUP BY word),
        p AS (
          SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(word)),
              i -> SUBSTR(word, CAST(i AS INT), 2))) AS pair, word_cnt
          FROM wc WHERE LEN(word) >= 2),
        pc AS (
          SELECT pair, SUM(word_cnt) AS merge_count FROM p GROUP BY pair)
        SELECT pair, CAST(merge_count AS BIGINT) AS merge_count,
          CAST(ROW_NUMBER() OVER (ORDER BY merge_count DESC, pair) AS INT)
            AS rank
        FROM pc ORDER BY merge_count DESC, pair LIMIT 20"""),
      "BPE merge-learning step: vocab-bounded adjacent-pair counting, " +
        "top-20 merge candidates"),

    // Bloom-filter blocklist membership — the broadcastable path for
    // checking 100 TB of documents against a fingerprint blocklist with
    // zero shuffle of the big side. md5-derived bit positions make the
    // filter (and its false positives) engine-portable; exact_hit rides
    // along so the output exposes the FP contract.
    Q("q97_bloom_blocklist",
      (s, dir) => {
        import graft.operators.Bloom
        val fps = Tables.load(s, dir, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        // The blocklist is the BOUNDED side (the Bloom contract: small
        // enough for its bit array to broadcast) with three consumers —
        // the size count, the build, and the exact-hit join. The
        // recompute per consumer is a scan of only the blocklist split;
        // persisting it measured SLOWER here (columnar cache build +
        // InMemoryTableScan overhead exceeds the bounded recompute). In
        // production the blocklist is a materialized table, not lineage,
        // which removes the recompute entirely.
        val block = fps.filter(col("doc_id") % 5 === 0).select("fp")
          .distinct()
        // mBits scales WITH the blocklist (16 bits/key, word-aligned): a
        // fixed size silently saturates as the blocklist grows — at sf1
        // a 4096-bit filter already passed everything. The count is one
        // bounded agg (and materializes the cache); the oracle computes
        // the identical size in SQL, and the in-plan guard fails loudly
        // if sizing ever regresses — at zero extra jobs, unlike the
        // action-based requireUnsaturated.
        // Long sizing with loud bounds: .toInt on count*16 wraps NEGATIVE
        // past ~134M keys (nonsense moduli), and an empty blocklist would
        // make mBits 0 (modulo-by-zero probes) — floor at one word so an
        // empty filter correctly blocks nothing.
        val mBitsL = math.max(32L, ((block.count() * 16 + 31) / 32) * 32)
        require(mBitsL <= Int.MaxValue,
          s"bloom blocklist needs $mBitsL bits; shard the blocklist")
        val mBits = mBitsL.toInt
        val bloomRow = Bloom.guard(
          Bloom.build(block, "fp", numHashes = 3, mBits = mBits), mBits)
        Bloom.probe(fps.filter(col("doc_id") % 5 =!= 0), "fp", bloomRow,
            numHashes = 3, mBits = mBits)
          .join(block.withColumn("exact_hit", lit(true)), Seq("fp"), "left")
          .select(col("doc_id"), col("bloom_hit"),
            coalesce(col("exact_hit"), lit(false)).as("exact_hit"))
      },
      Some(bloomBlocklistOracleSql),
      "Bloom-filter blocklist membership: bounded bit_or build, one-row " +
        "broadcast, projection-only probe (deterministic md5 positions)"),

    // Winnowing (MOSS) fingerprint postings: the partial-overlap dedup
    // index between whole-doc hashing (q27) and all-shingle indexes
    // (q25) — guaranteed detection of >= w+k-1 char runs at ~2/(w+1)
    // density. One md5 per gram on the exploded stream, doc-keyed
    // sliding-min window, distinct over the winnowed subset.
    Q("q99_winnowing",
      (s, dir) =>
        Dedup.winnowPostings(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 5, w = 4),
      Some(winnowingOracleSql),
      "winnowing fingerprints (MOSS): k-gram hash window minima, " +
        "distinct per-doc selected set"),

    // Count-min heavy hitters: the bounded-memory vocabulary profile —
    // depth x width counters from ONE aggregation (map-side partials,
    // <= 1024 rows on the wire at ANY key cardinality), mergeable
    // across shards, estimates via a broadcast of the tiny sketch.
    // exact_cnt rides along to expose the one-sided est >= exact
    // contract with deterministic md5 collisions.
    Q("q100_cms_heavy_hitters",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.operators.Sketches
        val counts = Tables.load(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
        val sketch = Sketches.cmsBuild(counts, "w", "cnt",
          depth = 4, width = 256)
        val est = Sketches.cmsEstimate(counts.select("w"), "w", sketch,
          depth = 4, width = 256)
        counts.join(est, "w")
          .select(col("w").as("token"), col("cnt").as("exact_cnt"),
            col("est").as("est_cnt"))
          .orderBy(col("est_cnt").desc, col("token")).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("est_cnt").desc, col("token"))))
      },
      Some(cmsHeavyHittersOracleSql),
      "count-min heavy hitters: bounded mergeable sketch, broadcast " +
        "estimate, one-sided error exposed against exact counts"),

    // BM25 topical retrieval (Okapi shape, rational ppm idf — see
    // operators/Retrieval.scala for the determinism + scale contract):
    // the lexical gate that pulls topical subsets out of a web corpus.
    // The token stream filters to the query terms MAP-SIDE before its
    // only shuffle; corpus stats and the idf table broadcast back; top-k
    // is TakeOrderedAndProject, never a global sort.
    Q("q106_bm25_topk",
      (s, dir) => {
        val scored = graft.operators.Retrieval.bm25(
          Tables.load(s, dir, "documents"), "doc_id", tokens(col("text")),
          terms = Seq("spark", "hash", "merge"))
        scored.orderBy(col("score_n9").desc, col("doc_id").asc).limit(10)
          .select(col("doc_id"), col("n_terms"),
            round(col("score_n9").cast("double") / lit(1e9), 6).as("bm25"))
      },
      Some(bm25OracleSql),
      "BM25 retrieval: rational idf, nano-quantized contributions, " +
        "map-side term filter, TakeOrdered top-k"),

    // Out-of-vocabulary rate against the learned top-k vocabulary (the
    // tokenizer-coverage gate: docs a fixed vocab cannot represent are
    // training noise). The vocab is bounded (top-12 of the corpus word
    // table via TakeOrdered partials, deterministic ties) and BROADCAST
    // to the token stream — the corpus-sized side never shuffles for
    // the membership probe.
    Q("q108_oov_rate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = graft.operators.TokenizerTraining.topVocab(
          graft.operators.TokenizerTraining.wordFrequencies(docs, "text"), 12)
          .select(col("word").as("w"), lit(true).as("in_v"))
        docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
          .join(broadcast(vocab), Seq("w"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_toks"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_toks").cast("double"), 6)
              .as("oov_rate"))
      },
      Some("""WITH t AS (
          SELECT doc_id, UNNEST(LIST_FILTER(
            REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'), x -> LEN(x) > 0)) AS w
          FROM documents),
        wf AS (SELECT w, COUNT(*) AS cnt FROM t GROUP BY w),
        v AS (SELECT w FROM wf ORDER BY cnt DESC, w LIMIT 12)
        SELECT doc_id, COUNT(*) AS n_toks,
          CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oov,
          ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
        FROM t LEFT JOIN v ON v.w = t.w
        GROUP BY doc_id"""),
      "OOV rate vs the learned top-k vocabulary: bounded TakeOrdered " +
        "vocab, broadcast membership probe, per-doc coverage"),

    // Interpolated bigram-LM scoring (the CCNet quality gate one order
    // up from q88's unigram): P(w2|w1) = 0.7*c12/c1 + 0.3*c2/T over the
    // bigram stream, ppb-quantized. Bigram emission is map-side (each
    // doc emits its own adjacent pairs — no window); the model tables
    // are vocab-bounded; see operators/LanguageModel.scala.
    Q("q109_bigram_lm",
      (s, dir) => graft.operators.LanguageModel.score(
        Tables.load(s, dir, "documents"), "doc_id", tokens(col("text"))),
      Some(bigramLmOracleSql),
      "interpolated bigram LM scoring: ppb-quantized probabilities, " +
        "map-side bigram emission, vocab-bounded model tables"),

    // Incremental ingestion dedup: admit an incoming batch only where it
    // does not near-duplicate the EXISTING corpus (the steady-state form
    // of dedup once a 100 TB store is live — full-corpus q46 reruns are
    // for bootstrap only). Same LSH cross-match machinery as q84 with
    // the roles flipped: the small increment broadcasts, the corpus
    // side streams map-side and never shuffles.
    Q("q112_incremental_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val batch = docs.filter(col("doc_id") % 10 === 7)
        val corpus = docs.filter(col("doc_id") % 10 =!= 7)
        val matches = Dedup.minhashLshCrossMatches(
          corpus, "doc_id", batch, "doc_id", "text",
          wordGrams = 2, k = 8, bands = 2, threshold = 0.5)
          .groupBy(col("eval_id").as("doc_id"))
          .agg(count(lit(1)).as("n_dups"),
            max(col("containment")).as("max_containment"))
        // matches is bounded by the increment, so the verdict join
        // broadcasts it — the batch never shuffles either
        batch.select("doc_id").join(broadcast(matches), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"),
            coalesce(col("max_containment"), lit(0.0)).as("max_containment"),
            col("n_dups").isNull.as("admit"))
      },
      Some(incrementalDedupOracleSql),
      "incremental batch-vs-corpus dedup: LSH cross-match with the " +
        "increment broadcast, per-batch-doc admit verdict"),

    // BPE ENCODE (the other half of q96's merge learning): replay an
    // ordered merge list over every word and report per-doc subword
    // inventories. The encode runs on the DISTINCT word table —
    // vocab-sized, O(|merges|) string passes each — and broadcast-joins
    // back to the token stream; the corpus-sized side never pays the
    // merge loop. Pure codegen string ops (see applyMerges).
    // Scale note: a raw web-corpus distinct-word table grows with the
    // corpus (Heaps' law) — at 100 TB the vocab side is first CAPPED to
    // the tokenizer's working vocabulary (q96's top-merges shape /
    // q108's topVocab) before this broadcast; encoding then falls back
    // to character-split for out-of-vocab words. The forced broadcast
    // fails loudly at Spark's size limit if that cap is skipped.
    Q("q113_bpe_encode",
      (s, dir) => {
        import graft.operators.TokenizerTraining
        val words = Tables.load(s, dir, "documents")
          .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
        val vocab = words.select("w").distinct()
          .select(col("w"), size(TokenizerTraining.applyMerges(
            col("w"), TokenizerTraining.DemoMerges)).as("n_sub"))
        words.join(broadcast(vocab), "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
          .select(col("doc_id"), col("n_words"), col("n_subwords"),
            round(col("n_subwords").cast("double") /
              col("n_words").cast("double"), 6).as("subwords_per_word"))
      },
      Some(bpeEncodeOracleSql),
      "BPE encode with an ordered merge list: vocab-sized merge loop, " +
        "broadcast re-attach, per-doc subword inventory"),
  )

  /** DuckDB replica of TokenizerTraining.applyMerges(DemoMerges): the
    * same space-joined character representation and the same ordered
    * literal REPLACE chain (REPLACE rewrites non-overlapping matches
    * left-to-right in both engines). Generated from DemoMerges.
    */
  lazy val bpeEncodeOracleSql: String = {
    val chain = graft.operators.TokenizerTraining.DemoMerges
      .foldLeft("s") { case (acc, (a, b)) =>
        s"REPLACE($acc, ' $a  $b ', ' $a$b ')" }
    s"""WITH t AS (
        SELECT doc_id, UNNEST(LIST_FILTER(
          REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'), x -> LEN(x) > 0)) AS w
        FROM documents),
      v AS (SELECT DISTINCT w FROM t),
      sp AS (
        SELECT w, ' ' || ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, LEN(w) + 1),
          i -> w[CAST(i AS INT):CAST(i AS INT)]), '  ') || ' ' AS s
        FROM v),
      m AS (SELECT w, LEN(STRING_SPLIT(TRIM($chain), '  ')) AS n_sub FROM sp)
      SELECT doc_id, COUNT(*) AS n_words,
        CAST(SUM(n_sub) AS BIGINT) AS n_subwords,
        ROUND(CAST(SUM(n_sub) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS subwords_per_word
      FROM t JOIN m USING (w)
      GROUP BY doc_id"""
  }

  /** The q84 cross-match oracle re-parameterized to the batch/corpus
    * split, aggregated to the per-batch-doc admit verdict.
    */
  lazy val incrementalDedupOracleSql: String =
    s"""WITH m0 AS (${lshCrossMatchOracle("% 10 <> 7", "% 10 = 7")}),
      m AS (
        SELECT eval_id AS doc_id, COUNT(*) AS n_dups,
          MAX(containment) AS max_containment
        FROM m0 GROUP BY eval_id)
      SELECT d.doc_id, CAST(COALESCE(m.n_dups, 0) AS BIGINT) AS n_dups,
        COALESCE(m.max_containment, 0.0) AS max_containment,
        (m.n_dups IS NULL) AS admit
      FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
      WHERE d.doc_id % 10 = 7"""

  /** DuckDB replica of Retrieval.bm25 (k1=1.2, b=0.75, terms spark/hash/
    * merge): same rational ppm idf, same operation ORDER in the
    * contribution formula (IEEE doubles agree bit-for-bit before the
    * nano-quantization), same (count desc, id asc) top-10. The constants
    * appear as (1.2 + 1.0) / (1.0 - 0.75) — the same runtime folds the
    * Scala side performs — never as pre-folded literals.
    */
  lazy val bm25OracleSql: String =
    """WITH t AS (
        SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
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
      sc AS (SELECT doc_id, COUNT(*) AS n_terms, SUM(c_n9) AS s_n9
        FROM c GROUP BY doc_id)
      SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms,
        ROUND(CAST(s_n9 AS DOUBLE) / 1000000000.0, 6) AS bm25
      FROM sc ORDER BY s_n9 DESC, doc_id LIMIT 10"""

  /** DuckDB replica of LanguageModel.score (lambda=0.7 as 700000000 ppb,
    * lowPpb=1e6): identical bigram emission (1-based adjacent pairs),
    * identical division order in the interpolation.
    */
  lazy val bigramLmOracleSql: String =
    """WITH t AS (
        SELECT doc_id, LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'),
          x -> LEN(x) > 0) AS toks
        FROM documents),
      bg AS (
        SELECT doc_id, toks[CAST(i + 1 AS INT)] AS w1,
          toks[CAST(i + 2 AS INT)] AS w2
        FROM (SELECT doc_id, toks, UNNEST(RANGE(0, LEN(toks) - 1)) AS i
          FROM t)),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
      c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY w2),
      tot AS (SELECT COUNT(*) AS t_bg FROM bg),
      p AS (
        SELECT w1, w2, CAST(ROUND(((700000000.0 * c12) / c1)
            + ((300000000.0 * c2) / t_bg), 0) AS BIGINT) AS prob_ppb
        FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), tot)
      SELECT doc_id, COUNT(*) AS n_bigrams,
        ROUND(CAST(SUM(prob_ppb) AS DOUBLE)
          / (COUNT(*) * 1000000000.0), 6) AS mean_prob,
        ROUND(CAST(SUM(CASE WHEN prob_ppb < 1000000 THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS low_frac
      FROM bg JOIN p USING (w1, w2)
      GROUP BY doc_id"""

  /** DuckDB replica of Sketches.cmsBuild/cmsEstimate (depth=4,
    * width=256) over the token stream: same md5-derived positions, same
    * counter sums, so every collision-driven overestimate matches.
    */
  lazy val cmsHeavyHittersOracleSql: String = {
    val v48 = v48Fold("h")
    s"""WITH t AS (
        SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'),
          x -> LEN(x) > 0)) AS w
        FROM documents),
      c AS (SELECT w, COUNT(*) AS cnt FROM t GROUP BY w),
      eh AS (
        SELECT w, cnt, j, MD5(CAST(j AS VARCHAR) || '|' || w) AS h
        FROM c, (SELECT UNNEST([0, 1, 2, 3]) AS j) js),
      e AS (SELECT w, cnt, j, CAST(($v48) % 256 AS INT) AS pos FROM eh),
      s AS (SELECT j, pos, SUM(cnt) AS c FROM e GROUP BY 1, 2),
      est AS (
        SELECT e.w, e.cnt, MIN(s.c) AS est
        FROM e JOIN s ON s.j = e.j AND s.pos = e.pos
        GROUP BY 1, 2)
      SELECT w AS token, cnt AS exact_cnt, CAST(est AS BIGINT) AS est_cnt,
        CAST(ROW_NUMBER() OVER (ORDER BY est DESC, w) AS INT) AS rank
      FROM est ORDER BY est DESC, w LIMIT 20"""
  }

  /** SQL fold computing TextFunctions.hash48 from a hex-string column
    * `h`: 12 hex digits to a 48-bit BIGINT. Shared by the winnowing /
    * bloom / count-min oracles.
    */
  private def v48Fold(h: String): String = OracleSql.hexToBigint(h, 12)

  /** DuckDB replica of Dedup.winnowPostings(k=5, w=4): the same 12-hex
    * md5 prefix per 5-char gram (fixed-width lowercase hex orders like
    * the numeric value), window minima, distinct.
    */
  lazy val winnowingOracleSql: String =
    """WITH hs AS (
        SELECT doc_id,
          LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 4, 1) + 1),
            i -> SUBSTR(MD5(SUBSTR(text, CAST(i AS INT), 5)), 1, 12)) AS hs
        FROM documents),
      ws AS (
        SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(
          RANGE(1, GREATEST(LEN(hs) - 3, 1) + 1),
          i -> LIST_MIN(hs[CAST(i AS INT):CAST(i + 3 AS INT)]))) AS fps
        FROM hs)
      SELECT doc_id, UNNEST(fps) AS fp FROM ws"""

  /** DuckDB replica of Bloom.build/probe with k=3 and m sized to the
    * blocklist (16 bits/key, word-aligned — the same integer formula as
    * the Spark side) over the eval split's fingerprints: same
    * md5-derived 48-bit positions, same 32-bit words, so the bit
    * pattern — and every false positive — is identical. Generated, not
    * hand-written (12 hex-digit folds).
    */
  lazy val bloomBlocklistOracleSql: String = {
    def v48(h: String): String = OracleSql.hexToBigint(h, 12)
    val m = "(SELECT m FROM msize)"
    val posDefs = (0 until 3).map(j =>
      s"CAST((${v48(s"MD5('$j|' || fp)")}) % $m AS BIGINT) AS p$j")
      .mkString(",\n          ")
    def hit(p: String): String =
      s"(bloom[CAST($p // 32 AS INT) + 1] & " +
        s"(CAST(1 AS BIGINT) << CAST($p % 32 AS INT))) <> 0"
    s"""WITH fps AS (
        SELECT doc_id,
          MD5(LOWER(REGEXP_REPLACE(TRIM(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents),
      block AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 5 = 0),
      msize AS (
        -- GREATEST mirrors the Scala one-word floor for empty blocklists
        SELECT GREATEST(32, ((COUNT(*) * 16 + 31) // 32) * 32) AS m
        FROM block),
      bpos AS (
        SELECT $posDefs
        FROM block),
      bflat AS (SELECT UNNEST([p0, p1, p2]) AS pos FROM bpos),
      bw AS (
        SELECT pos // 32 AS word_idx,
          BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
        FROM bflat GROUP BY 1),
      bwmap AS (
        SELECT MAP_FROM_ENTRIES(LIST(ROW(word_idx, bits))) AS m2 FROM bw),
      arr AS (
        -- scalar RANGE (expression context) — the RANGE *table function*
        -- cannot take the msize subquery
        SELECT LIST_TRANSFORM(RANGE(0, CAST(ms.m // 32 AS INT)),
          i -> COALESCE(MAP_EXTRACT(b.m2, i)[1], 0)) AS bloom
        FROM bwmap b, msize ms),
      pp AS (
        SELECT doc_id, fp, $posDefs
        FROM fps WHERE doc_id % 5 <> 0)
      SELECT doc_id,
        (${hit("p0")} AND ${hit("p1")} AND ${hit("p2")}) AS bloom_hit,
        (fp IN (SELECT fp FROM block)) AS exact_hit
      FROM pp, arr"""
  }
}
