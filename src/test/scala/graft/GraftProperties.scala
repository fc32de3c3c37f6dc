package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.functions._

import graft.ts.DeltaEncoding

/** Property-based tests (SURVEY §5 tier 3, ScalaCheck): delta
  * encode/decode identity, priority resolution = first non-null slot,
  * unit-conversion round-trips. Spark jobs per sample are expensive, so
  * sample counts are kept small; generators cover the structural edge
  * cases (empty slots, single-point groups, negative values).
  */
object GraftProperties extends Properties("graft") {
  import SparkSessionFixture._
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val tsGen: Gen[List[(String, Long, Double)]] = for {
    nKeys <- Gen.choose(1, 3)
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0, nKeys - 1).map(i => s"k$i")
      ts <- Gen.choose(0L, 40L * 86400L * 1000000L) // spans >1 20-day group
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (k, ts, v))
  } yield rows

  property("deltaEncodeDecodeIdentity") = Prop.forAll(tsGen) { rows =>
    val distinctRows = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = distinctRows.toDF("key", "ts_us", "value")
    val decoded = DeltaEncoding.decode(
        DeltaEncoding.encode(df, "key", "ts_us", "value"))
      .select("key", "ts_us", "value")
      .as[(String, Long, Double)].collect().toSet
    decoded == distinctRows.toSet
  }

  // bindParams: SQL text OUTSIDE bound tokens is byte-identical, and a
  // bound string's rendered literal round-trips arbitrary content
  // (quotes, backslashes, unicode) — the injection-safety invariant,
  // driven through Spark's own parser
  private val paramStrGen: Gen[String] = for {
    n <- Gen.choose(0, 20)
    cs <- Gen.listOfN(n, Gen.frequency(
      (5, Gen.alphaNumChar),
      (2, Gen.oneOf('\'', '"', '\\', ';', '@', '$', ' ', '%')),
      (1, Gen.oneOf('€', 'λ', '中'))))
  } yield cs.mkString

  property("bindParamsStringLiteralsRoundTripThroughSparkParser") =
    Prop.forAll(paramStrGen) { s =>
      val bound = graft.query.LiteSql.bindParams(
        "SELECT @0 AS s", Seq(s), Map.empty)
      bound.startsWith("SELECT ") && bound.endsWith(" AS s") && {
        val got = spark.sql(bound).head.getString(0)
        got == s
      }
    }

  // ... and the round-trip must survive the LEGACY parser mode too:
  // escapedStringLiterals=true makes backslash literal inside quoted
  // literals AND doubled quotes are not an escape there, so risky
  // strings must lower through the hex rendering to stay injection-safe
  property("bindParamsStringLiteralsRoundTripUnderEscapedStringLiterals") =
    Prop.forAll(paramStrGen) { s =>
      val key = "spark.sql.parser.escapedStringLiterals"
      val prev = spark.conf.get(key, "false")
      spark.conf.set(key, "true")
      try {
        val bound = graft.query.LiteSql.bindParams(
          "SELECT @0 AS s", Seq(s), Map.empty)
        spark.sql(bound).head.getString(0) == s
      } finally spark.conf.set(key, prev)
    }

  property("bindParamsLeavesUnboundTextByteIdentical") =
    Prop.forAll(paramStrGen) { s =>
      // no parameters supplied for tokens the SQL mentions: whatever
      // the text is (inside or outside quotes), it passes through
      val sql = s"SELECT c FROM t WHERE x = '$s' AND y = @9 GROUP BY @key"
      graft.query.LiteSql.bindParams(sql, Nil, Map.empty) == sql &&
        graft.query.LiteSql.bindParams(sql, Seq(1), Map.empty) == sql
    }

  private val slotsGen: Gen[List[Option[String]]] =
    Gen.listOfN(17, Gen.option(Gen.identifier.map(_.take(6))))

  property("resolvePriorityIsFirstNonNull") = Prop.forAll(slotsGen) { slots =>
    val df = Seq(Tuple1(slots.map(v => (v.orNull, null: java.sql.Timestamp))))
      .toDF("raw")
      .withColumn("slots",
        expr("transform(raw, r -> struct(r._1 as value, r._2 as ts))"))
    val got = df.select(
      graft.model.IotValue.resolvePriority(col("slots")).as("v"),
      graft.model.IotValue.resolvedPriorityIndex(col("slots")).as("p"))
      .collect()(0)
    slots.zipWithIndex.collectFirst { case (Some(v), i) => (v, i + 1) } match {
      case Some((v, p)) => got.getString(0) == v && got.getInt(1) == p
      case None => got.isNullAt(0) && got.isNullAt(1)
    }
  }

  property("unitConvertAffineAndInvertible") =
    Prop.forAll(Gen.choose(-1e6, 1e6), Gen.choose(0.001, 1000.0),
        Gen.choose(-500.0, 500.0)) { (x, f, o) =>
      // pins OUR conversion machinery: an affine rule applies as x*f+o and
      // its exact algebraic inverse round-trips. (The registry DATA is the
      // reference's verbatim — including ~50 mutually-inconsistent pairs
      // like liters_per_second<->cubic_meters_per_second, so data-level
      // round-trips are pinned only for the temperature group below.)
      import graft.model.Units
      val fwd = Units.Rule("a", "b", f, o)
      val back = Units.Rule("b", "a", 1.0 / f, -o / f)
      val rt = (x * fwd.factor + fwd.offset) * back.factor + back.offset
      math.abs(rt - x) <= 1e-9 * math.max(math.abs(x), 1.0)
    }

  property("temperatureRegistryRoundTrips") =
    Prop.forAll(Gen.choose(-1e4, 1e4)) { x =>
      import graft.model.Units
      val temps = Seq("degrees_celsius", "degrees_fahrenheit", "degrees_kelvin",
        "degrees_rankine")
      temps.combinations(2).forall { case Seq(a, b) =>
        (for {
          fwd <- Units.defaultRules.find(r => r.from == a && r.to == b)
          back <- Units.defaultRules.find(r => r.from == b && r.to == a)
        } yield {
          val rt = (x * fwd.factor + fwd.offset) * back.factor + back.offset
          math.abs(rt - x) <= 1e-6 * math.max(math.abs(x), 300.0)
        }).getOrElse(true)
      }
    }

  property("hammingSymmetricZeroOnIdentity") =
    Prop.forAll(Gen.long, Gen.long) { (a, b) =>
      // pure-JVM mirror of the column function's semantics
      java.lang.Long.bitCount(a ^ b) == java.lang.Long.bitCount(b ^ a) &&
        java.lang.Long.bitCount(a ^ a) == 0
    }

  private val asciiTextGen: Gen[String] = for {
    n <- Gen.choose(0, 120)
    cs <- Gen.listOfN(n, Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.const(' '))))
  } yield cs.mkString

  property("winnowGuarantee: docs sharing a long run share a fingerprint") =
    Prop.forAll(asciiTextGen, asciiTextGen, asciiTextGen) { (pre, shared0, post) =>
      val k = 5; val w = 4
      // pad the shared run past the w+k-1 guarantee threshold
      val shared = (shared0 + "qzjxvkwmbf").take(math.max(w + k - 1, shared0.length))
      import graft.functions.expressions.WinnowExpr
      import org.apache.spark.unsafe.types.UTF8String
      def fps(s: String): Set[String] =
        WinnowExpr.compute(UTF8String.fromString(s), k, w)
          .array.map(_.toString).toSet
      val a = fps(pre + shared)
      val b = fps(shared + post)
      (a & b).nonEmpty
    }

  property("winnowDensity: selected fingerprints never exceed window count") =
    Prop.forAll(asciiTextGen) { s =>
      import graft.functions.expressions.WinnowExpr
      import org.apache.spark.unsafe.types.UTF8String
      val k = 5; val w = 4
      val n = WinnowExpr.compute(UTF8String.fromString(s), k, w).numElements()
      val nh = math.max(s.length - k + 1, 1)
      val nw = math.max(nh - w + 1, 1)
      n >= 1 && n <= nw
    }

  property("zValueInterleaveIsABijection: decode recovers both dims") =
    Prop.forAll(Gen.listOfN(8,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))) { pairs =>
      val rows = pairs.toDF("a", "b")
        .select(col("a"), col("b"),
          graft.core.Layout.zValue(col("a"), col("b"), 16).as("z"))
        .collect()
      rows.forall { r =>
        val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val da = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
        val db = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
        da == a && db == b
      }
    }

  private val wordGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  property("bpeApplyMergesIsLossless: subwords concatenate to the word") =
    Prop.forAll(Gen.listOfN(6, wordGen),
      Gen.listOfN(4, Gen.zip(wordGen.map(_.take(2)), wordGen.map(_.take(2))))) {
      (words, merges) =>
        val rows = words.toDF("w")
          .select(col("w"), graft.operators.TokenizerTraining
            .applyMerges(col("w"), merges).as("sub"))
          .collect()
        rows.forall(r => r.getSeq[String](1).mkString == r.getString(0))
    }

  property("bm25ScoresInvariantUnderRepartitioning") =
    Prop.forAll(Gen.listOfN(10,
      Gen.listOfN(8, Gen.oneOf("ab", "cd", "ef", "gh")).map(_.mkString(" ")))) {
      texts =>
        def scores(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Retrieval.bm25(df, "id", split(col("text"), " "),
            Seq("ab", "cd")).collect()
            .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
        scores(df) == scores(df.repartition(7))
    }

  private val funnelGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 50L) // small domain forces ts collisions
      t <- Gen.oneOf("signup", "click", "purchase", "view")
    } yield (user, ts, t))
  } yield rows

  property("funnelFoldEqualsSequentialMins") = Prop.forAll(funnelGen) { rows =>
    val withIds = rows.zipWithIndex.map { case ((u, ts, t), i) =>
      (u, ts, i.toLong, t)
    }
    val got = graft.operators.EventOps.funnel(
        withIds.toDF("user_id", "us", "event_id", "event_type"),
        ("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") -> (
        r.getAs[Int]("reached_stage"),
        Option(r.getAs[Any]("t1_us")), Option(r.getAs[Any]("t2_us")),
        Option(r.getAs[Any]("t3_us")))).toMap
    // reference: sequential mins with strict progression, plain Scala
    val expected = withIds.filter(r => r._4 != "view").groupBy(_._1).map {
      case (u, evs) =>
        val t1 = evs.filter(_._4 == "signup").map(_._2).minOption
        val t2 = t1.flatMap(a =>
          evs.filter(e => e._4 == "click" && e._2 > a).map(_._2).minOption)
        val t3 = t2.flatMap(b =>
          evs.filter(e => e._4 == "purchase" && e._2 > b).map(_._2).minOption)
        val stage = Seq(t1, t2, t3).count(_.isDefined)
        u -> ((stage, t1.map(x => x: Any), t2.map(x => x: Any),
          t3.map(x => x: Any)))
    }
    got == expected
  }

  property("funnelNGeneralizesTheThreeStageFold") = Prop.forAll(funnelGen) {
    rows =>
      val withIds = rows.zipWithIndex.map { case ((u, ts, t), i) =>
        (u, ts, i.toLong, t)
      }
      val df = withIds.toDF("user_id", "us", "event_id", "event_type")
      val stages = ("signup", "click", "purchase")
      val three = graft.operators.EventOps.funnel(df, stages)
        .collect().map(r => r.getAs[Long]("user_id") -> (
          r.getAs[Int]("reached_stage"),
          Seq("t1_us", "t2_us", "t3_us").flatMap(c =>
            Option(r.getAs[Any](c)).map(_.asInstanceOf[Long])))).toMap
      val n = graft.operators.EventOps.funnelN(
          df, Seq("signup", "click", "purchase"))
        .collect().map(r => r.getAs[Long]("user_id") -> (
          r.getAs[Int]("reached_stage"),
          r.getSeq[Long](r.fieldIndex("stage_ts")).toList.map(x => x: Long)))
        .toMap
      three.view.mapValues { case (s, ts) => (s, ts.toList) }.toMap == n
  }

  private val bandGen: Gen[(List[(Long, Double)], List[Double])] = for {
    nl <- Gen.choose(1, 15); nr <- Gen.choose(0, 40)
    // duplicate-heavy domains exercise the distinct-compaction path;
    // negative left/right values exercise the inverted-interval path
    // (x<0 flips x*lo vs x*hi — both banding AND residual must agree)
    left <- Gen.listOfN(nl, Gen.choose(-20, 40).map(_ * 25.0))
    right <- Gen.listOfN(nr, Gen.choose(-25, 45).map(_ * 23.0))
  } yield (left.zipWithIndex.map { case (v, i) => (i.toLong, v) }, right)

  property("bandedRangeCountEqualsNaiveFilter") = Prop.forAll(bandGen) {
    case (left, right) =>
      val (lo, hi) = (0.7, 1.3) // wide band + tiny width: intervals span
      // many buckets, exercising the per-row bucket-range derivation
      val got = graft.operators.EventOps.bandedRangeCount(
          left.toDF("k", "x"), "x", right.map(Tuple1(_)).toDF("v"), "v",
          width = 16.0, loFactor = lo, hiFactor = hi)
        .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("n_close"))
        .toMap
      val expected = left.map { case (k, x) =>
        val (blo, bhi) = (math.min(x * lo, x * hi), math.max(x * lo, x * hi))
        k -> right.count(v => v >= blo && v <= bhi).toLong
      }.filter(_._2 > 0).toMap // inner semantics: zero-match keys drop
      got == expected
  }

  // Constraint-check direction refactor (round 12): the decomposed
  // insert/update checks (in-batch dupes + table-scans/batch-builds
  // cross semi-joins) must flag EXACTLY the states the old merged
  // whole-table groupBy flagged, for every combination of dupes within
  // the batch, collisions against the table, nulls, and clean inserts —
  // given a pre-state that satisfies its own constraints (what every
  // facade write path enforces).
  private val constraintGen: Gen[(List[(Int, String)], List[(Int, String)])] =
    for {
      nExist <- Gen.choose(0, 6)
      existing <- Gen.listOfN(nExist, for {
        v <- Gen.oneOf("a", "b", "c", null)
      } yield v)
      nIn <- Gen.choose(1, 5)
      incoming <- Gen.listOfN(nIn, for {
        v <- Gen.oneOf("a", "b", "c", "d", null)
      } yield v)
    } yield {
      // pre-state valid: unique non-null values, distinct pks
      val exRows = existing.filter(_ != null).distinct.zipWithIndex
        .map { case (v, i) => (i, v) }
      val inRows = incoming.zipWithIndex.map { case (v, i) => (i + 1000, v) }
      (exRows, inRows)
    }

  property("decomposedUniqueChecksMatchMergedSemantics") =
    Prop.forAll(constraintGen) { case (exRows, inRows) =>
      import graft.dml.ConstrainedDml
      import graft.dml.ConstrainedDml.TableDef
      val tdef = TableDef("t", "id", uniqueCols = Seq("v"))
      val existing =
        if (exRows.isEmpty) None else Some(exRows.toDF("id", "v"))
      val incoming = inRows.toDF("id", "v")
      val got = ConstrainedDml
        .validateInsert(spark, tdef, incoming, existing, Map.empty)
        .exists(_.kind == "unique_conflict")
      // merged reference semantics: a non-null value duplicated across
      // union(existing, incoming)
      val all = exRows.map(_._2) ++ inRows.map(_._2)
      val expected = all.filter(_ != null).groupBy(identity)
        .exists(_._2.size > 1)
      got == expected
    }

  property("decomposedUpdateChecksMatchMergedSemantics") =
    Prop.forAll(constraintGen) { case (exRows, inRows) =>
      import graft.dml.ConstrainedDml
      import graft.dml.ConstrainedDml.TableDef
      // model an UPDATE: changed rows REPLACE table rows by pk (reuse
      // existing ids where possible), result = unchanged + changed
      val tdef = TableDef("t", "id", uniqueCols = Seq("v"))
      val changed = inRows.zipWithIndex.map { case ((_, v), i) =>
        // half the batch replaces existing pks, half inserts-by-update
        if (i < exRows.size && i % 2 == 0) (exRows(i)._1, v)
        else (2000 + i, v)
      }
      val changedPks = changed.map(_._1).toSet
      val unchanged = exRows.filterNot(r => changedPks.contains(r._1))
      val resultRows = unchanged ++ changed
      val got = ConstrainedDml.validateUpdate(spark, tdef,
          changed.toDF("id", "v"), resultRows.toDF("id", "v"), Map.empty)
        .exists(_.kind == "unique_conflict")
      val expected = resultRows.map(_._2).filter(_ != null)
        .groupBy(identity).exists(_._2.size > 1)
      got == expected
    }

  property("funnelNEmitsNullSafePartialFunnels") =
    Prop.forAll(funnelGen) { rows =>
      // q135's projection must survive users at EVERY stage depth —
      // element_at on a short stage_ts array throws under ANSI mode
      val withIds = rows.zipWithIndex.map { case ((u, ts, t), i) =>
        (u, ts, i.toLong, t)
      }
      val out = graft.operators.EventOps.funnelN(
          withIds.toDF("user_id", "us", "event_id", "event_type"),
          Seq("signup", "click", "purchase"))
        .select(col("user_id"), col("reached_stage"),
          try_element_at(col("stage_ts"), lit(1)).as("t1"),
          try_element_at(col("stage_ts"), lit(2)).as("t2"),
          try_element_at(col("stage_ts"), lit(3)).as("t3"))
        .collect()
      out.forall { r =>
        val stage = r.getAs[Int]("reached_stage")
        Seq("t1", "t2", "t3").zipWithIndex.forall { case (c, i) =>
          r.isNullAt(r.fieldIndex(c)) == (stage < i + 1)
        }
      }
    }
}
