package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import SparkSessionFixture._
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0f, 1f, 0f, 0f)),
    (3L, Seq(1f, 1f, 0f, 0f)),
    (4L, Seq(-1f, 0f, 0f, 0f))
  ).toDF("id", "v")

  test("cosine matches hand-computed values") {
    val q = Seq(1f, 0f, 0f, 0f)
    val scores = Similarity.cosineTopK(vecs, "id", "v", q, 4)
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) == 1.0)
    assert(math.abs(scores(3L) - 1.0 / math.sqrt(2)) < 1e-6)
    assert(scores(2L) == 0.0)
    assert(scores(4L) == -1.0)
  }

  test("l2 distance matches hand-computed values") {
    val d = vecs.filter($"id" === 2L)
      .select(Similarity.l2($"v", typedLit(Seq(1f, 0f, 0f, 0f))))
      .as[Double].head()
    assert(math.abs(d - math.sqrt(2)) < 1e-12)
  }

  test("radiusSearch keeps only vectors within radius") {
    val ids = Similarity.radiusSearch(vecs, "id", "v", Seq(1f, 0f, 0f, 0f), 1.0)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // d(1)=0, d(3)=1.0 inclusive; d(2)=sqrt2, d(4)=2
  }

  test("native expressions match the composable forms bit-for-bit") {
    val e = Tables.load(spark, Sf0001, "embeddings").limit(200)
    val q = Tables.load(spark, Sf0001, "embeddings")
      .filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val both = e.select(
      Similarity.cosine($"embedding", typedLit(q)).as("native_cos"),
      Similarity.cosineComposable($"embedding", typedLit(q)).as("hof_cos"),
      Similarity.l2($"embedding", typedLit(q)).as("native_l2"),
      Similarity.l2Composable($"embedding", typedLit(q)).as("hof_l2"))
    val diffs = both.filter(
      $"native_cos" =!= $"hof_cos" || $"native_l2" =!= $"hof_l2").count()
    assert(diffs == 0)
  }

  test("mismatched vector lengths return NULL, matching the composable " +
    "forms' null-padding verdict (never a prefix score)") {
    val rows = Seq(
      (1L, Seq(1f, 2f, 3f)),      // full length
      (2L, Seq(1f, 2f))           // truncated/corrupt
    ).toDF("id", "v")
    val q = Seq(0.5f, 0.5f, 0.5f)
    val out = rows.select($"id",
        Similarity.cosine($"v", typedLit(q)).as("c"),
        Similarity.l2($"v", typedLit(q)).as("l"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((false, false)))
    assert(out(2L) == ((true, true)))
  }

  test("kmeansStep computes per-cell per-position means") {
    val cents = Seq(0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(10f, 10f, 10f, 10f))
    val rows = Similarity.kmeansStep(vecs, "v", cents)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // vectors 1,2,3,4 all lie nearer the origin centroid -> one cell
    assert(rows.keySet.map(_._1) == Set(0L))
    assert(rows((0L, 1)) == (4L, (1.0 + 0.0 + 1.0 - 1.0) / 4)) // mean of x
    assert(rows((0L, 2)) == (4L, (0.0 + 1.0 + 1.0 + 0.0) / 4)) // mean of y
  }

  test("kmeansTrain is deterministic and does not increase SSE") {
    val e = Tables.load(spark, Sf0001, "embeddings")
    def sse(cents: Seq[(Long, Seq[Float])]): Double =
      e.select(least(cents.map { case (_, cv) =>
        Similarity.l2($"embedding", typedLit(cv)) }: _*).as("d"))
        .agg(sum($"d" * $"d")).as[Double].head()
    val seeds = Similarity.kmeansTrain(e, "vec_id", "embedding", k = 4, iters = 0)
    val once = Similarity.kmeansTrain(e, "vec_id", "embedding", k = 4, iters = 1)
    val thrice = Similarity.kmeansTrain(e, "vec_id", "embedding", k = 4, iters = 3)
    assert(Similarity.kmeansTrain(e, "vec_id", "embedding", 4, 3) == thrice)
    assert(sse(once) <= sse(seeds) + 1e-6)
    assert(sse(thrice) <= sse(once) + 1e-6)
    // every vector lands in one of the k cells
    val cells = Similarity.ivfAssign(e, "vec_id", "embedding", thrice)
      .select("cell").distinct().as[Long].collect().toSet
    assert(cells.subsetOf(thrice.map(_._1).toSet))
  }

  test("pq codes and ADC distances match hand-computed values") {
    // 4-dim vectors, m=2 subspaces x 2 dims, 2 codebook entries each
    val cb0 = Seq(0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f))
    val cb1 = Seq(0L -> Seq(0f, 0f), 1L -> Seq(-10f, -10f))
    val df = Seq(
      (1L, Seq(1f, 1f, -9f, -9f)),  // codes (0, 1)
      (2L, Seq(9f, 9f, 1f, 1f))     // codes (1, 0)
    ).toDF("id", "v")
    val out = Similarity.pqAdcTopK(df, "id", "v", Seq(0f, 0f, 1f, 1f),
      Seq(cb0, cb1), subDim = 2, k = 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 1L,
      math.rint(math.sqrt(0.0 + (121.0 + 121.0)) * 1e6) / 1e6)))
    assert(out(2L) == ((2L, 1L, 0L,
      math.rint(math.sqrt((100.0 + 100.0) + (1.0 + 1.0)) * 1e6) / 1e6)))
    // ranking: vec 2's ADC (sqrt 202) < vec 1's (sqrt 242)
    assert(out.values.toSeq.sortBy(_._4).head._1 == 2L)
  }

  test("native functions are callable from SQL") {
    Tables.load(spark, Sf0001, "embeddings").createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS self
         FROM emb_sql WHERE vec_id < 10""")
      .filter(org.apache.spark.sql.functions.abs($"self" - 1.0) < 1e-9).count()
    assert(n == 10)
  }

  test("annTopK achieves reasonable recall vs brute force on real embeddings") {
    val e = Tables.load(spark, Sf0001, "embeddings").filter($"vec_id" =!= 0)
    val q = Tables.load(spark, Sf0001, "embeddings")
      .filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val exact = Similarity.cosineTopK(e, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.annTopK(e, "vec_id", "embedding", q, 10, nPlanes = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.3, s"recall=$recall exact=$exact approx=$approx")
  }

  test("ivfTopK: assignment partitions all vectors; probes recall top hits") {
    import graft.core.Tables
    val e = Tables.load(spark, Sf0001, "embeddings")
    val centroids = e.filter($"vec_id".between(1, 8))
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    val others = e.filter($"vec_id" =!= 0)
    // every vector lands in exactly one cell
    val assigned = Similarity.ivfAssign(others, "vec_id", "embedding", centroids)
    assert(assigned.count() == others.count())
    assert(assigned.groupBy("vec_id").count().filter($"count" > 1).count() == 0)
    assert(assigned.select("cell").distinct().count() <= 8)
    val q = e.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0)
    val exact = Similarity.cosineTopK(others, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(others, "vec_id", "embedding", q, 10,
      centroids, nProbe = 4).select("vec_id").as[Long].collect().toSet
    assert(approx.size == 10)
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.3, s"recall=$recall exact=$exact approx=$approx")
  }

  test("ivfAssignJoin: duplicate ids with different vectors keep their " +
      "own per-row cells (matches the fold path)") {
    val centroids = Seq(0L -> Seq(0f, 0f), 1L -> Seq(10f, 10f))
    val rows = Seq((1L, Seq(0.1f, 0.1f)), (1L, Seq(9.9f, 9.9f)),
      (2L, Seq(10f, 9f)), (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", coalesce($"embedding", typedLit(Seq.empty[Float])),
        $"cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2))).toSet
    val joined = cells(
      Similarity.ivfAssignJoin(rows, "vec_id", "embedding", centroids))
    // each duplicate-id row gets ITS vector's argmin, not a shared cell
    assert(joined.contains((1L, Seq(0.1f, 0.1f), 0L)))
    assert(joined.contains((1L, Seq(9.9f, 9.9f), 1L)))
    assert(joined.contains((3L, Seq.empty[Float], -1L))) // null vec sentinel
    // bit-identical to the fold path
    assert(joined == cells(
      Similarity.ivfAssign(rows, "vec_id", "embedding", centroids)))
  }

  test("quantizeInt8: codes bounded, relative error <= 0.5, dequantized " +
      "cosine stays close") {
    val e = graft.core.Tables.load(spark, Sf0001, "embeddings")
      .filter($"embedding".isNotNull).limit(50)
    val q = e.select($"vec_id", $"embedding",
        Similarity.quantizeInt8($"embedding").as("q"))
      .select($"vec_id", $"embedding", $"q.scale".as("_s"), $"q.codes".as("codes"))
    val rows = q.collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1).map(_.toDouble)
      val s = r.getDouble(2)
      val codes = r.getSeq[Int](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // reconstruction: every dim within half a quantization step
      emb.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * s) <= s / 2 + 1e-12)
      }
      // dequantized cosine vs original stays near 1 (64-dim, int8)
      val deq = codes.map(_ * s)
      val dot = emb.zip(deq).map { case (a, b) => a * b }.sum
      val na = math.sqrt(emb.map(x => x * x).sum)
      val nb = math.sqrt(deq.map(x => x * x).sum)
      if (na > 0 && nb > 0) assert(dot / (na * nb) > 0.999)
    }
  }

  test("IVF cells survive churn: 30% vector updates (cell recomputed in " +
      "the SAME statement) + OPTIMIZE keep recall@10 at the " +
      "fresh-ingest figure") {
    import graft.catalog.GraftDatabase
    import graft.dml.ConstrainedDml.TableDef
    val dir = "/root/testdata/sf0.01"
    val e = Tables.load(spark, dir, "embeddings")
      .filter($"embedding".isNotNull)
      .select($"vec_id", $"embedding")
    val cents = Similarity.kmeansTrain(e, "vec_id", "embedding",
      k = 8, iters = 3)
    val base = java.nio.file.Files.createTempDirectory("graft-ivfchurn").toString
    val db = GraftDatabase(spark, "ivfchurn", base)
      .defineTable(TableDef("emb", "vec_id"))
    // ingest-time cell assignment, stored with the vectors (q77's shape)
    db.insert("emb", Similarity.ivfAssign(e, "vec_id", "embedding", cents))
    // churn 30% of the vectors to genuinely DIFFERENT embeddings; the
    // cell recomputes from the NEW vector in the same simultaneous
    // assignment (updateWhere stages every RHS against the old row, so
    // reverse(embedding) is the new value in both entries) — the write
    // rule a correct ingest path must follow, and what this spec pins
    val newVec = reverse($"embedding")
    val nChurned = db.updateMany("emb", $"vec_id" % 10 < 3, Map(
      "embedding" -> newVec,
      "cell" -> when(newVec.isNotNull,
        Similarity.cellOf(newVec, cents)).otherwise(lit(-1L))))
    assert(nChurned >= e.count() / 4, s"churned only $nChurned rows")
    db.optimize("emb")
    val churned = db.table("emb")
    // (a) the stored cells after churn + OPTIMIZE are EXACTLY the
    // fresh-ingest assignment of the same logical data
    val freshAssigned = Similarity.ivfAssign(
      churned.drop("cell"), "vec_id", "embedding", cents)
    val diverged = churned.select($"vec_id", $"cell")
      .join(freshAssigned.select($"vec_id", $"cell".as("fcell")), "vec_id")
      .filter($"cell" =!= $"fcell").count()
    assert(diverged == 0,
      s"$diverged stored cells diverged from fresh-ingest assignment")
    // (b) measured recall@10 over the stored cells matches the
    // fresh-ingest figure (ivfTopK consumes the precomputed cell column)
    def recallAt10(tbl: org.apache.spark.sql.DataFrame): Double = {
      val qs = tbl.orderBy($"vec_id").limit(5)
        .select($"vec_id".cast("long"), $"embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      qs.map { case (qid, qv) =>
        val others = tbl.filter($"vec_id" =!= qid)
        val brute = Similarity.cosineTopK(others, "vec_id", "embedding",
          qv, 10).select($"vec_id".cast("long")).collect()
          .map(_.getLong(0)).toSet
        val approx = Similarity.ivfTopK(others, "vec_id", "embedding",
          qv, 10, cents, nProbe = 2).select($"vec_id".cast("long"))
          .collect().map(_.getLong(0)).toSet
        brute.intersect(approx).size / 10.0
      }.sum / qs.length
    }
    val rChurned = recallAt10(churned)
    val rFresh = recallAt10(freshAssigned)
    assert(rChurned == rFresh,
      s"post-churn recall $rChurned != fresh-ingest recall $rFresh")
    assert(rChurned >= 0.3, s"recall collapsed: $rChurned")
  }
}
