package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  quick brown fox jumps over the lazy dog "), // same normalized
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different content about spark engines and parquet files")
  ).toDF("doc_id", "text")

  test("exactDedup groups normalized duplicates") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
      .orderBy("canonical_id")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("minhashLshPairs finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs.filter($"doc_id" =!= 2L),
        "doc_id", "text", shingleN = 5, k = 8, bands = 2, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccardTokens matches hand-computed value") {
    val j = docs.filter($"doc_id" === 1L)
      .select(Dedup.jaccardTokens(lit("a b c d"), lit("c d e f")))
      .as[Double].head()
    assert(math.abs(j - 2.0 / 6.0) < 1e-12)
  }

  test("simhash64: identical token sets agree, permutation-invariant, " +
    "near texts are close, far texts are far") {
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "theta eta zeta epsilon delta gamma beta alpha"), // permuted
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // 1 token swap
      (4L, "one two three four five six seven eight")
    ).toDF("id", "text")
    val h = rows.select($"id", Dedup.simhash64($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    val near = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val far = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(near < far, s"near=$near far=$far")
  }

  test("native simhash64 matches the composable 64-fold form exactly") {
    val docs500 = graft.core.Tables.load(spark, Sf0001, "documents").limit(100)
    val diffs = docs500.select(
      Dedup.simhash64($"text").as("native"),
      Dedup.simhash64Composable($"text").as("composable"))
      .filter($"native" =!= $"composable").count()
    assert(diffs == 0)
  }

  test("clusterPairs labels every member with the component minimum") {
    // components: {1,2,3,4} (chain), {10,11}, singleton 20 not in pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id1", "id2")
    val got = Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("clusterPairs converges on a 300-deep chain (pointer-jump doubling)") {
    // plain min-propagation needs ~300 rounds here; the label-doubling
    // form must finish inside the default 10 and label everything 0
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.clusterPairs(chain).as[(Long, Long)].collect()
    assert(got.length == 301)
    assert(got.forall(_._2 == 0L), got.filter(_._2 != 0L).take(5).toSeq.toString)
  }

  test("hamming64") {
    val d = spark.range(1)
      .select(Dedup.hamming64(lit(0xFFL), lit(0x0FL))).as[Int].head()
    assert(d == 4)
  }

  test("simhashMd5 matches a JVM-side bit-for-bit recomputation") {
    // recompute the fingerprint straight from md5 prefixes, the same
    // definition the DuckDB oracle uses (q26)
    def expected(text: String): String = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      val votes = new Array[Int](64)
      toks.foreach { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        var h = 0L
        (0 until 8).foreach(b => h = (h << 8) | (d(b) & 0xffL))
        (0 until 64).foreach { j =>
          if (((h >>> (63 - j)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        }
      }
      (0 until 16).map { n =>
        val v = (0 until 4).map(k =>
          if (votes(n * 4 + k) > 0) 1 << (3 - k) else 0).sum
        "0123456789abcdef".charAt(v)
      }.mkString
    }
    val texts = Seq("the quick brown fox", "lorem ipsum dolor sit amet", "x")
    val got = texts.toDF("text")
      .select(Dedup.simhashMd5($"text")).as[String].collect().toSeq
    assert(got == texts.map(expected))
    // empty token set -> all-zero fingerprint
    val empty = Seq("  ").toDF("text")
      .select(Dedup.simhashMd5($"text")).as[String].head()
    assert(empty == "0000000000000000")
  }

  test("clusterPairsBlocked matches the iterative form on blocked pairs") {
    val pairs = Seq(
      (1L, 2L, "b1"), (2L, 3L, "b1"),   // chain 1-2-3 in block b1
      (10L, 11L, "b2"),                 // pair in b2
      (20L, 21L, "b3"), (20L, 22L, "b3") // star in b3
    ).toDF("id1", "id2", "block_key")
    val blocked = Dedup.clusterPairsBlocked(pairs, "block_key")
      .as[(Long, Long)].collect().toMap
    val iterative = Dedup.clusterPairs(pairs.drop("block_key"))
      .as[(Long, Long)].collect().toMap
    assert(blocked == iterative)
    assert(blocked == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusterPairsBlocked fails loudly on an oversized block instead of " +
      "absorbing unbounded edges") {
    // one block with 100 edges against a 10-edge bound: the guard must
    // surface the offending block key, not OOM or silently proceed
    val big = (1L to 100L).map(i => (i, i + 1, "hot")).toDF("id1", "id2", "block_key")
    val err = intercept[org.apache.spark.SparkException] {
      Dedup.clusterPairsBlocked(big, "block_key", maxBlockEdges = 10).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: rootMessages(e.getCause))
    assert(rootMessages(err).exists(m =>
      m != null && m.contains("hot") && m.contains("10 edges")), err.getMessage)
    // the same data under the bound still clusters fine
    val ok = Dedup.clusterPairsBlocked(big, "block_key", maxBlockEdges = 1000)
      .as[(Long, Long)].collect().toMap
    assert(ok.size == 101 && ok.values.forall(_ == 1L))
  }

  test("prefix-filtered jaccard pairs match the co-occurrence form exactly") {
    // corpus with true pairs above/below the 0.6 threshold, multiple
    // blocks, and docs sharing only non-prefix (frequent) tokens
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta zeta", "en"),     // J=4/6 with 1
      (3L, "alpha beta gamma delta epsilon", "en"),  // J=1 with 1
      (4L, "alpha beta nope other thing", "en"),     // below threshold
      (5L, "alpha beta gamma delta epsilon", "fr"),  // other block
      (6L, "unrelated words entirely here now", "en"),
      (7L, "alpha beta gamma delta epsilon zeta eta", "en") // J=5/7 with 1
    ).toDF("doc_id", "text", "lang")
    val toks = array_distinct(
      graft.functions.TextFunctions.tokens($"text"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    val co = norm(Dedup.jaccardPairsByCooccurrence(
      docs, "doc_id", toks, Seq(col("lang")), threshold = 0.6))
    val pf = norm(Dedup.jaccardPairsPrefix(
      docs, "doc_id", toks, Seq(col("lang")), threshold = 0.6))
    assert(pf == co)
    assert(co.map { case (a, b, _) => (a, b) } ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 7L), (2L, 7L), (3L, 7L)))
    // block-key emission matches too (clusterPairsBlocked contract)
    val coK = Dedup.jaccardPairsByCooccurrence(docs, "doc_id", toks,
      Seq(col("lang")), 0.6, emitBlockKey = true)
      .select("id1", "id2", "block_key").as[(Long, Long, String)].collect().toSet
    val pfK = Dedup.jaccardPairsPrefix(docs, "doc_id", toks,
      Seq(col("lang")), 0.6, emitBlockKey = true)
      .select("id1", "id2", "block_key").as[(Long, Long, String)].collect().toSet
    assert(pfK == coK)
  }

  test("native word_shingles/lsh_band_keys match the composable forms exactly") {
    import graft.functions.{GraftFunctions => G, TextFunctions => T}
    val texts = Seq("the quick brown fox jumps", "one", "  ", "a b a b a")
    val df = texts.toDF("text")
    // shingles: native == array_distinct(wordShingles(tokens))
    val nativeSh = df.select(
      org.apache.spark.sql.functions.array_sort(
        G.word_shingles(T.tokens($"text"), 2))).as[Seq[String]].collect().toSeq
    val composedSh = df.select(
      org.apache.spark.sql.functions.array_sort(
        array_distinct(T.wordShingles(T.tokens($"text"), 2))))
      .as[Seq[String]].collect().toSeq
    assert(nativeSh == composedSh)
    // band keys: native one-pass == minhash columns + md5 band concat
    val shs = array_distinct(T.wordShingles(T.tokens($"text"), 2))
    val sigs = (0 until 8).map(i => Dedup.minhashValue(shs, i))
    val composedKeys = df.select(
      Dedup.lshBandKeysFromCols(sigs, 2, 4)).as[Seq[String]].collect().toSeq
    val nativeKeys = df.select(
      G.lsh_band_keys(T.tokens($"text"), 2, 8, 2)).as[Seq[String]].collect().toSeq
    assert(nativeKeys == composedKeys)
  }

  test("semDedupKeepList keeps the nearest-to-centroid member per component") {
    val cents = Seq(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(10f, 10f, 10f, 10f))
    val vs = Seq(
      (1L, Seq(1f, 1f, 1f, 1f)), // cell 0, centroid dist 2
      (2L, Seq(2f, 2f, 2f, 2f)), // cell 0, dist 4, cosine 1.0 with v1
      (3L, Seq(9f, 9f, 9f, 9f))  // cell 1 — cosine 1.0 with v1 but blocked
    ).toDF("id", "v")
    val out = graft.operators.Dedup
      .semDedupKeepList(vs, "id", "v", cents, eps = 0.9)
      .as[(Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 2.0, 1L, true)))  // representative
    assert(out(2L) == ((2L, 0L, 4.0, 1L, false))) // dropped dup
    assert(out(3L)._4 == 3L && out(3L)._5)        // cross-cell singleton kept
  }

  test("semDedupKeepList excludes null embeddings from pair generation") {
    val cents = Seq(0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f))
    val vs = Seq(
      (1L, Some(Seq(1f, 1f))),
      (2L, Option.empty[Seq[Float]]), // sentinel cell -1: must not block
      (3L, Option.empty[Seq[Float]]),
      (4L, Some(Seq(9f, 9f)))
    ).toDF("id", "v")
    val out = graft.operators.Dedup
      .semDedupKeepList(vs, "id", "v", cents, eps = -1.0)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 4L)) // null rows absent, no -1 mega-block
  }

  test("semDedupScaled: near-dups collapse to the nearest-to-cell-centroid " +
      "representative; nulls excluded; bit rule is the integer minimum") {
    // 4-dim vectors; with 6 rows and targetCellSize=1 the rule picks
    // bits = min{b in [4,20] : 2^b >= 6} = 4 (2^3=8 would suffice but 4
    // is the clamp floor — the assertion pins the published rule)
    val vs = Seq(
      (1L, Some(Seq(1f, 1f, 1f, 1f))),
      (2L, Some(Seq(2f, 2f, 2f, 2f))),   // cosine 1.0 with v1
      (3L, Some(Seq(-5f, 4f, -3f, 2f))), // unrelated direction
      (4L, Option.empty[Seq[Float]])     // null: absent from output
    ).toDF("id", "v")
    val out = graft.operators.Dedup
      .semDedupScaled(vs, "id", "v", eps = 0.9, dim = 4, targetCellSize = 1)
      .as[(Long, Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // v1 and v2 share a sign-LSH cell (same direction) and cosine 1.0:
    // one cluster, exactly one keeper — the member nearest the cell mean
    assert(out(1L)._4 == out(2L)._4)
    assert(Seq(out(1L), out(2L)).count(_._5) == 1)
    // the cell mean of {1111, 2222} is 1.5×ones: v2 and v1 are
    // equidistant? no — |1-1.5|·2 = |2-1.5|·2, tie → lowest id keeps
    assert(out(1L)._5, "equidistant tie must keep the lowest id")
    // the unrelated vector is its own singleton cluster and kept
    assert(out(3L)._4 == 3L && out(3L)._5)
  }

  test("minhashLshCrossMatches flags contaminated train docs by containment") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // identical to eval 100
      (2L, "totally different words sharing nothing with any eval doc"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val m = Dedup
      .minhashLshCrossMatches(train, "doc_id", evalSet, "doc_id", "text",
        wordGrams = 2, k = 8, bands = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // identical doc: every band collides, containment is exactly 1.0
    assert(m((1L, 100L)) == 1.0)
    // unrelated doc: no shared shingles, no collision, absent
    assert(!m.contains((2L, 100L)))
    // a superset train doc that collides must score by |T∩E|/|E| = 1.0
    m.get((3L, 100L)).foreach(c => assert(c == 1.0))
  }

  test("winnowPostings: shared run >= w+k-1 chars guarantees a shared " +
      "fingerprint; density stays near 2/(w+1)") {
    val shared = "the quick brown fox jumps over the lazy dog near a river"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"XXXXXXX $shared YYYY"),
      (3L, "completely disjoint content made of unrelated material zz")
    ).toDF("doc_id", "text")
    val posts = Dedup.winnowPostings(docs, "doc_id", "text", k = 5, w = 4)
      .as[(Long, String)].collect().groupBy(_._1).map { case (d, a) =>
        d -> a.map(_._2).toSet
      }
    // winnowing guarantee: a 56-char shared run >> w+k-1=8 must collide
    assert((posts(1L) & posts(2L)).nonEmpty)
    assert((posts(1L) & posts(3L)).isEmpty)
    // density: selected distinct fps <= windows, and a healthy fraction
    val len1 = s"AAAA $shared BBBB".length
    assert(posts(1L).size <= len1 - 4 - 3)
    assert(posts(1L).size >= (len1 / 5))
  }

  test("winnowPostings: a doc shorter than the window keeps one fingerprint") {
    val docs = Seq((1L, "abcdef")).toDF("doc_id", "text") // 2 grams < w=4
    val posts = Dedup.winnowPostings(docs, "doc_id", "text", k = 5, w = 4)
      .collect()
    assert(posts.length == 1)
  }

  test("native winnow_fps is bit-identical to the composable pipeline") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "ab"),                       // shorter than one gram
      (3L, "abcdefg"),                  // fewer grams than the window
      (4L, ("repeat " * 40).trim)       // heavy duplication
    ).toDF("doc_id", "text")
    val native = Dedup.winnowPostings(docs, "doc_id", "text", 5, 4)
      .as[(Long, String)].collect().toSet
    val composable = Dedup
      .winnowPostingsComposable(docs, "doc_id", "text", 5, 4)
      .as[(Long, String)].collect().toSet
    assert(native == composable)
  }

  test("band-bucket cap: recall unchanged on non-pathological data") {
    val docs = graft.core.Tables.load(spark, SparkSessionFixture.Sf0001,
      "documents")
    def pairs(cap: Int) = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 8, bands = 2, threshold = 0.5, wordGrams = Some(2),
      maxBucketSize = cap)
      .as[(Long, Long, Double)].collect().toSet
    // buckets here are far below the production default, so capped ==
    // uncapped: the guard must not change results where it doesn't fire
    assert(pairs(8192) == pairs(Int.MaxValue))
  }

  test("band-bucket cap: a boilerplate bucket is dropped before pair-gen " +
      "and is visible in lshBucketStats") {
    // 50 identical docs: every band bucket holds all 50 — pathological
    val boiler = (1L to 50L).map(i => (i, "common header footer boilerplate " +
      "shared across every page of the crawl")).toDF("doc_id", "text")
    val capped = Dedup.minhashLshPairs(boiler, "doc_id", "text",
      k = 8, bands = 2, threshold = 0.5, wordGrams = Some(2),
      maxBucketSize = 10)
    assert(capped.count() == 0, "oversized buckets must not emit pairs")
    val stats = Dedup.lshBucketStats(boiler, "doc_id", "text",
      k = 8, bands = 2, wordGrams = Some(2), maxBucketSize = 10)
      .as[(String, Long, Boolean)].collect()
    assert(stats.nonEmpty && stats.forall { case (_, n, dropped) =>
      n == 50L && dropped })
    // cross-corpus guard: the same boilerplate corpus against a small eval
    // set — the overloaded bucket is excluded, so no candidates survive
    val eval = Seq((100L, "common header footer boilerplate shared across " +
      "every page of the crawl")).toDF("doc_id", "text")
    val cross = Dedup.minhashLshCrossMatches(boiler, "doc_id", eval,
      "doc_id", "text", wordGrams = 2, k = 8, bands = 2,
      threshold = 0.5, maxBucketSize = 10)
    assert(cross.count() == 0)
    // and with a permissive cap the same inputs DO match — the zero above
    // comes from the guard, not from the pipeline failing to match
    val crossUncapped = Dedup.minhashLshCrossMatches(boiler, "doc_id", eval,
      "doc_id", "text", wordGrams = 2, k = 8, bands = 2,
      threshold = 0.5, maxBucketSize = 1000)
    assert(crossUncapped.count() == 50)
  }

  test("cross-corpus cap: the SAMPLED guard branch (cap > 256) still " +
      "drops a pathological bucket") {
    // caps <= 256 count exactly; above that the guard hash-samples the
    // corpus (deterministic xxhash mod, never df.sample). 3000 identical
    // docs against cap 1024 -> rate 0.25, expected ~750 sampled hits vs
    // the sampled threshold 256 — >20 sigma above it, and exactly
    // reproducible for fixed ids
    val boiler = (1L to 3000L).map(i => (i, "common header footer " +
      "boilerplate shared across every page of the crawl"))
      .toDF("doc_id", "text")
    val eval = Seq((100000L, "common header footer boilerplate shared " +
      "across every page of the crawl")).toDF("doc_id", "text")
    val capped = Dedup.minhashLshCrossMatches(boiler, "doc_id", eval,
      "doc_id", "text", wordGrams = 2, k = 8, bands = 2,
      threshold = 0.5, maxBucketSize = 1024)
    assert(capped.count() == 0, "sampled guard must drop the bucket")
    // guard disabled: the same inputs match — the zero is the guard's
    val off = Dedup.minhashLshCrossMatches(boiler, "doc_id", eval,
      "doc_id", "text", wordGrams = 2, k = 8, bands = 2,
      threshold = 0.5, maxBucketSize = 0)
    assert(off.count() == 3000)
  }

  test("simhashHammingPairs equals brute-force Hamming (banding is exact " +
      "for maxHamming < bands)") {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val banded = Dedup.simhashHammingPairs(docs, "doc_id", "text",
        bands = 4, maxHamming = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    // brute force: all pairs over the same md5-keyed fingerprints
    val sigs = docs.select($"doc_id",
      Dedup.simhashMd5($"text").as("sig")).as[(Long, String)].collect()
    def bits(hex: String): Long = java.lang.Long.parseUnsignedLong(hex, 16)
    val brute = (for {
      (i1, s1) <- sigs; (i2, s2) <- sigs if i1 < i2
      h = java.lang.Long.bitCount(bits(s1) ^ bits(s2)) if h <= 3
    } yield (i1, i2, h)).toSet
    assert(brute.nonEmpty, "fixture corpus should contain near-dups")
    assert(banded == brute)
  }

  test("simhashHammingPairs64 (xxhash64 production path) equals " +
      "brute-force Hamming over the 64-bit fingerprints") {
    val docs = graft.core.Tables.load(spark, Sf0001, "documents")
    val banded = Dedup.simhashHammingPairs64(docs, "doc_id", "text",
        bands = 4, maxHamming = 3)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val sigs = docs.select($"doc_id",
      Dedup.simhash64($"text").as("sig")).as[(Long, Long)].collect()
    val brute = (for {
      (i1, s1) <- sigs; (i2, s2) <- sigs if i1 < i2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (i1, i2, h)).toSet
    assert(brute.nonEmpty, "fixture corpus should contain near-dups")
    assert(banded == brute)
  }

  test("simhashHammingPairs: parameter contract and bucket cap") {
    intercept[IllegalArgumentException] {
      Dedup.simhashHammingPairs(docs, "doc_id", "text",
        bands = 4, maxHamming = 4) // pigeonhole broken -> refuse
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashHammingPairs(docs, "doc_id", "text", bands = 3)
    }
    // a pile of identical docs saturates every band bucket; the cap drops
    // them before the quadratic pair emission
    val boiler = (1L to 50L).map(i => (i, "same boilerplate text"))
      .toDF("doc_id", "text")
    val capped = Dedup.simhashHammingPairs(boiler, "doc_id", "text",
      bands = 4, maxHamming = 3, maxBucketSize = 10)
    assert(capped.count() == 0)
    val uncapped = Dedup.simhashHammingPairs(boiler, "doc_id", "text",
      bands = 4, maxHamming = 3, maxBucketSize = 0)
    assert(uncapped.count() == 50L * 49 / 2)
  }
}
