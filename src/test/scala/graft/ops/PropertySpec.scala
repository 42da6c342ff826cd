package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.model.Schemas.FlatReading

/** Property-based invariants (SURVEY §5.2.2), with generators mirroring the
  * simulator's distributions (sensor_simulator.py:28-98). The
  * scalatest-scalacheck bridge is not on the offline classpath, so
  * properties are exercised by seeded generator sampling — deterministic
  * across runs.
  */
class PropertySpec extends SparkSpec {

  private def forAllSeeded[A](g: Gen[A], runs: Int = 5)(body: A => Unit): Unit =
    (1 to runs).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val genReading: Gen[FlatReading] = for {
    t <- Gen.oneOf("temperature", "humidity", "pressure")
    unit = Map("temperature" -> "celsius", "humidity" -> "percent",
      "pressure" -> "hPa")(t)
    value <- Gen.chooseNum(-50.0, 1100.0)
    battery <- Gen.chooseNum(0, 100)
    signal <- Gen.chooseNum(-95, -30)
    floor <- Gen.chooseNum(1, 2)
    room <- Gen.chooseNum(100, 103)
  } yield FlatReading(
    sensor_id = s"A_${floor}_${room}_$t", sensor_type = t, building = "A",
    floor = Some(floor), room = Some(room),
    timestamp = "2026-01-01 12:00:00.000000", value = Some(value),
    unit = unit, battery_level = Some(battery),
    signal_strength = Some(signal))

  private def detectAll(rs: Seq[FlatReading]) = {
    import spark.implicits._
    AlertRules.detect(rs.toDS.toDF).collect()
  }

  test("property: at most one alert per reading; severity matches alert_type") {
    forAllSeeded(Gen.listOfN(40, genReading)) { rs =>
      val alerts = detectAll(rs)
      assert(alerts.length <= rs.length)
      alerts.foreach { a =>
        val at = a.getAs[String]("alert_type")
        val sev = a.getAs[String]("severity")
        assert(at !== null)
        if (at.contains("critical")) assert(sev === "critical")
        else if (at.contains("warning")) assert(sev === "warning")
        assert(Set("critical", "warning").contains(sev)) // info unreachable
      }
    }
  }

  test("property: environmental alerts never fire on a mismatched unit") {
    val mismatched = genReading.map(r =>
      r.copy(unit = if (r.unit == "celsius") "percent" else "celsius",
        battery_level = Some(90), signal_strength = Some(-50)))
    forAllSeeded(Gen.listOfN(40, mismatched)) { rs =>
      assert(detectAll(rs).isEmpty)
    }
  }

  test("property: window aggregation partitions rows exactly (sum of counts = n)") {
    import spark.implicits._
    val genTs = Gen.chooseNum(0L, 3600L)
    forAllSeeded(Gen.listOfN(60, genTs)) { offs =>
      val df = offs.map(o => (java.sql.Timestamp.from(
          java.time.Instant.parse("2026-01-01T00:00:00Z").plusSeconds(o)),
          "s1", "temperature", 1.0))
        .toDF("event_time", "sensor_id", "sensor_type", "value")
      val out = Aggregates.sensorStats(df).collect()
      assert(out.map(_.getAs[Long]("count")).sum === offs.length.toLong)
      // tumbling 4-min buckets: start is epoch-aligned, end = start + 240s
      out.foreach { w =>
        val s = w.getAs[java.sql.Timestamp]("window_start").toInstant
        val e = w.getAs[java.sql.Timestamp]("window_end").toInstant
        assert(s.getEpochSecond % 240 === 0)
        assert(e.getEpochSecond - s.getEpochSecond === 240)
      }
    }
  }

  test("property: minhash est_sim of identical docs is 1; signature length is k") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(25,
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))) { words =>
      val text = words.mkString(" ")
      val sigs = Dedup.minhashSignatures(
        Seq((1L, text), (2L, text)).toDF("doc_id", "text"), 16)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sigs(1L) === sigs(2L))
      assert(sigs(1L).length === 16)
      assert(sigs(1L).forall(h => h >= 0 && h < Dedup.AffineMod))
    }
  }

  // Mixed-width code points (1-4 bytes, incl. astral-plane emoji): the
  // byte-offset walk in CharNgrams/NgramProfileCounts must agree with
  // JVM code-point semantics, never byte or UTF-16-unit counts.
  private val genUnicode: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("é"),
    Gen.const("ü"), Gen.const("☃"), Gen.const("𝕏"), Gen.const("🦀")))
    .map(_.mkString)

  test("property: big-star CC ≡ label propagation on random near-dup corpora") {
    import spark.implicits._
    // Random corpora drawn from a tiny template pool: heavy duplication and
    // chained overlaps, so the candidate graphs have real multi-node
    // components whose shape varies per seed.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val templates = Seq(
      base, base + " x", base + " x y", base + " x y z",
      (1 to 30).map(i => s"q$i").mkString(" "),
      (1 to 30).map(i => s"q$i").mkString(" ") + " tail", "")
    forAllSeeded(Gen.listOfN(24, Gen.choose(0, templates.size - 1)),
        runs = 3) { picks =>
      val corpus = picks.zipWithIndex
        .map { case (t, i) => (i.toLong, templates(t)) }
        .toDF("doc_id", "text")
      val prop = Dedup.clusters(corpus)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.clustersBigStar(corpus)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star === prop, s"CC algorithms disagree on picks $picks")
    }
  }

  test("property: componentsFromPairs ≡ driver union-find on random graphs") {
    import spark.implicits._
    // Raw random edge lists reach graph shapes no minhash corpus produces
    // (long chains, stars, cycles, dense blobs) — a third independent CC
    // check beside the big-star cross-check and the recursive-CTE oracle.
    val n = 20L
    forAllSeeded(
      Gen.listOfN(40, Gen.zip(Gen.choose(0L, n - 1), Gen.choose(0L, n - 1))),
      runs = 3) { raw =>
      val edges = raw.filter { case (a, b) => a != b }
      // Driver union-find with union-by-min: every merge roots the larger
      // id under the smaller, so find() lands on the component minimum —
      // exactly componentsFromPairs' contract.
      val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i).toSeq: _*)
      def find(x: Long): Long =
        if (parent(x) == x) x
        else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = (0L until n).map(i => i -> find(i)).toMap
      val got = Dedup.componentsFromPairs(
        edges.toDF("a_id", "b_id"),
        (0L until n).toDF("doc_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"CC disagrees with union-find on edges $edges")
    }
  }

  test("property: chunking covers every token exactly once at stride = size") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    forAllSeeded(Gen.listOfN(8, Gen.chooseNum(0, 40)), runs = 3) { lens =>
      val corpus = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(j => s"t$j").mkString(" ")) }
        .toDF("doc_id", "text")
      // Non-overlapping chunks partition the token stream: total chunk
      // tokens = document tokens, and chunk ids are dense from 0.
      val out = Curation.chunkDocuments(corpus, chunkSize = 7, stride = 7)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val byDoc = out.groupBy(_._1)
      lens.zipWithIndex.foreach { case (n, i) =>
        val chunks = byDoc.getOrElse(i.toLong, Array.empty)
        assert(chunks.map(_._3).sum === n, s"doc $i: token coverage")
        assert(chunks.map(_._2).sorted.toSeq === chunks.indices.toSeq,
          s"doc $i: chunk ids not dense")
      }
    }
  }

  test("property: normalize is idempotent and produces single-spaced lowercase") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val genText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const("  "), Gen.const("\t"),
      Gen.const("\n"), Gen.const("ÉÀ"), Gen.const("Mixed Case")))
      .map(_.mkString)
    forAllSeeded(Gen.listOfN(25, genText), runs = 3) { texts =>
      val once = TextAnalysis.normalize(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // Idempotence: a second pass over the normalized text is identity.
      val twice = TextAnalysis.normalize(
        once.toSeq.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(twice === once)
      once.values.foreach { s =>
        assert(!s.contains("  ") && s == s.toLowerCase &&
          s == s.trim, s"not canonical: '$s'")
      }
    }
  }

  test("property: winsorize output always lies within the clip bounds, idempotent-ish") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    forAllSeeded(Gen.listOfN(40, Gen.chooseNum(-1e6, 1e6)), runs = 3) { vs =>
      val ev = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, t0, 1L, "click", v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val rows = Resample.winsorize(ev).collect()
      assert(rows.length === vs.length) // never drops a row
      val clipped = rows.map(_.getDouble(3))
      val sorted = vs.sorted
      // Clipped values stay within the observed value range and are
      // monotone vs the raw order statistics.
      assert(clipped.min >= sorted.head && clipped.max <= sorted.last)
      // At most 10% of rows flagged at p05/p95 (plus interpolation ties).
      val flagged = rows.count(_.getBoolean(4))
      assert(flagged <= math.ceil(vs.length * 0.1).toInt + 2,
        s"too many clipped: $flagged of ${vs.length}")
    }
  }

  test("property: MG estimates never exceed truth under random partitioning") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val genItems = Gen.listOfN(300, Gen.oneOf(
      Gen.const("hot"), Gen.const("warm"),
      Gen.choose(1, 50).map(i => s"r$i")))
    forAllSeeded(genItems, runs = 3) { items =>
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = items.toDF("item").repartition(7)
        .agg(graft.functions.MisraGries.topItems(col("item"), 6).alias("t"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1))
      out.foreach { case (item, est) =>
        assert(est <= exact(item), s"$item overestimated: $est")
        assert(est >= exact(item) - items.size / 7,
          s"$item under the n/(k+1) floor")
      }
    }
  }

  test("property: trigram kernels agree with code-point semantics on unicode") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    forAllSeeded(Gen.listOfN(20, genUnicode), runs = 3) { texts =>
      val profiles = Seq(Seq("é☃a", "abc", "🦀🦀🦀"), Seq("𝕏é "))
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          graft.functions.CharNgrams.charNgrams(col("text"), 3).alias("tg"),
          graft.functions.NgramProfileCounts
            .ngramProfileCounts(col("text"), 3, profiles).alias("pc"))
        .collect()
      rows.foreach { r =>
        val text = r.getString(1)
        val tg = r.getSeq[String](2)
        val pc = r.getSeq[Int](3)
        // Oracle: JVM code-point sliding window.
        val cps = text.codePoints().toArray
        val expected = (0 to cps.length - 3).map(i =>
          new String(cps, i, 3))
        assert(tg === expected, s"grams mismatch on '$text'")
        assert(pc.head === expected.size)
        profiles.zipWithIndex.foreach { case (p, j) =>
          assert(pc(j + 1) === expected.count(p.contains(_)),
            s"profile $j mismatch on '$text'")
        }
      }
    }
  }

  test("property: BPE invariants — concat preserved, counts agree, chunks partition") {
    import graft.functions.BpeMerge
    val genWord = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val genMerges = Gen.listOfN(6,
      Gen.zip(Gen.alphaLowerChar.map(_.toString), Gen.alphaLowerChar.map(_.toString)))
    forAllSeeded(Gen.zip(Gen.listOfN(30, genWord), genMerges), runs = 10) {
      case (ws, merges) =>
        val table = merges.toArray
        ws.foreach { w =>
          val syms = BpeMerge.encodeWord(w, table)
          // Merging never invents or loses characters...
          assert(syms.mkString === w)
          // ...and symbol count only shrinks, never below 1.
          assert(syms.length >= 1 && syms.length <= w.length)
          // Applying the table again is a no-op only for single-symbol
          // rules the table already exhausted — re-encode from the SYMBOL
          // stream must be stable (each rule rewrites all its sites).
          val again = merges.foldLeft(syms) { case (s, (a, b)) =>
            BpeMerge.mergeOnce(s, a, b)
          }
          assert(again.mkString === w)
        }
        // Document-level: chunk counts partition the total count.
        import spark.implicits._
        val doc = ws.mkString(" ")
        val df = Seq((1L, doc)).toDF("doc_id", "text")
        val total = Bpe.tokenCounts(df, merges).collect()(0).getInt(1)
        val chunks = Bpe.chunkByBpe(df, merges, budget = 7).collect()
        assert(chunks.map(_.getInt(2)).sum === total)
        assert(chunks.map(_.getString(3)).mkString(" ") === doc)
    }
  }

  private val genDocText: Gen[String] = for {
    n <- Gen.chooseNum(0, 80)
    words <- Gen.listOfN(n, Gen.oneOf(
      "the", "cat", "sat", "on", "a", "mat", "and", "ran", "#", "...",
      "- bullet", "word2026", "…"))
  } yield words.mkString(" ")

  test("property: char entropy is bounded by the alphabet size and non-negative") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(25, genDocText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val hs = TextRules.charEntropy(df).collect()
        .map(_.getAs[Double]("char_entropy"))
      // 38 alphabet symbols + the other bucket → H ≤ log2(39) < 5.3.
      assert(hs.forall(h => h >= 0.0 && h <= 5.3), hs.toSeq.toString)
    }
  }

  test("property: gopher ratios live in [0,1]; verdict equals its rule conjunction") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(25, genDocText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextRules.gopherReport(df).collect().foreach { r =>
        for (c <- Seq("alpha_ratio", "bullet_line_ratio",
          "ellipsis_line_ratio")) {
          val v = r.getAs[Double](c)
          assert(v >= 0.0 && v <= 1.0, s"$c = $v")
        }
        val conj = r.getAs[Boolean]("ok_words") &&
          r.getAs[Boolean]("ok_mean_len") && r.getAs[Boolean]("ok_symbols") &&
          r.getAs[Boolean]("ok_bullets") && r.getAs[Boolean]("ok_ellipsis") &&
          r.getAs[Boolean]("ok_alpha") && r.getAs[Boolean]("ok_stops")
        assert(r.getAs[Boolean]("passed") === conj)
      }
    }
  }

  test("property: TTR bounds — types ≤ tokens, root TTR ≤ √tokens") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(25, genDocText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextAnalysis.typeTokenRatio(df).collect().foreach { r =>
        val (tok, typ) = (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_types"))
        assert(typ <= tok || tok == 0)
        assert(r.getAs[Double]("ttr") >= 0.0 && r.getAs[Double]("ttr") <= 1.0)
      }
    }
  }

  // Driver-side brute force for the exact set-similarity contracts below:
  // w=4 shingle sets, 6-dp half-up rounded Jaccard, threshold from the op.
  private def w4grams(text: String): Set[String] = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    t.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
  }

  private def jac6(a: Set[String], b: Set[String]): Double = {
    val i = (a & b).size
    BigDecimal(i.toDouble / (a.size + b.size - i))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("property: setSimJoin ≡ all-pairs brute force on random corpora " +
    "(zero false negatives is the contract, not a fixture artifact)") {
    import spark.implicits._
    // Two regimes per draw: a NARROW vocabulary (dense shingle universe,
    // heavy prefix overlap — the regime that stresses the positional
    // filter) and chained near-identical variants (the regime that makes
    // qualifying pairs). Sizes vary per seed.
    val narrow = (1 to 8).map(i => s"n$i")
    def randomDoc(r: scala.util.Random): String =
      if (r.nextBoolean())
        (1 to 10 + r.nextInt(20)).map(_ => narrow(r.nextInt(narrow.size)))
          .mkString(" ")
      else {
        val stem = (1 to 12 + r.nextInt(10)).map(j => s"s${r.nextInt(4)}x$j")
        (stem ++ (1 to r.nextInt(4)).map(j => s"t$j")).mkString(" ")
      }
    forAllSeeded(Gen.choose(1, 1000000), runs = 4) { seed =>
      val r = new scala.util.Random(seed)
      val corpus = (0 until 18 + r.nextInt(12))
        .map(i => (i.toLong, randomDoc(r)))
      val expected = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        ga = w4grams(ta); gb = w4grams(tb) if ga.nonEmpty && gb.nonEmpty
        j = jac6(ga, gb) if j >= Dedup.SetSimThreshold
      } yield (a, b, j)).toSet
      val out = Dedup.setSimJoin(corpus.toDF("doc_id", "text"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getAs[Double]("jaccard")))
        .toSet
      assert(out === expected, s"seed $seed: exact join diverged from " +
        s"brute force (${out.size} vs ${expected.size} pairs)")
    }
  }

  test("property: maxSpans span_tokens ≡ driver-DP longest common token " +
    "substring on random stem-spliced corpora") {
    import spark.implicits._
    def lcsTokens(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    forAllSeeded(Gen.choose(1, 1000000), runs = 3) { seed =>
      val r = new scala.util.Random(seed)
      // Shared stems spliced between unique filler: common runs of
      // varying length land at DIFFERENT offsets per doc, so the span
      // report must find the best alignment, not a fixed diagonal.
      val stems = (0 until 5).map(s =>
        (0 until 6 + r.nextInt(10)).map(j => s"st${s}w$j"))
      def doc(): String =
        (0 until 2 + r.nextInt(3)).flatMap { _ =>
          if (r.nextBoolean()) stems(r.nextInt(stems.size))
          else (0 until 3 + r.nextInt(5)).map(_ => s"u${r.nextInt(100000)}")
        }.mkString(" ")
      val corpus = (0 until 12).map(i => (i.toLong, doc()))
      val toks = corpus.map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      }.toMap
      val expected = (for {
        (a, _) <- corpus; (b, _) <- corpus if a < b
        s = lcsTokens(toks(a), toks(b))
        if s >= Dedup.SubstringShingleLen
      } yield (a, b) -> s.toLong).toMap
      val out = Dedup.maxSpans(corpus.toDF("doc_id", "text"))
        .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")) ->
          x.get(x.fieldIndex("span_tokens")).toString.toLong).toMap
      assert(out === expected, s"seed $seed: span report diverged from DP")
    }
  }

  test("property: setSimJoinCross ≡ brute force on random split corpora") {
    import spark.implicits._
    forAllSeeded(Gen.choose(1, 1000000), runs = 3) { seed =>
      val r = new scala.util.Random(seed)
      def doc(i: Int): String = {
        val stem = (1 to 14).map(j => s"c${r.nextInt(3)}v$j")
        (stem ++ (1 to r.nextInt(3)).map(j => s"u${r.nextInt(5)}$j"))
          .mkString(" ")
      }
      val left = (0 until 12).map(i => (i.toLong, doc(i)))
      val right = (0 until 8).map(i => (100L + i, doc(i)))
      val expected = (for {
        (a, ta) <- left; (b, tb) <- right
        ga = w4grams(ta); gb = w4grams(tb) if ga.nonEmpty && gb.nonEmpty
        j = jac6(ga, gb) if j >= Dedup.SetSimThreshold
      } yield (a, b, j)).toSet
      val out = Dedup.setSimJoinCross(
        left.toDF("doc_id", "text"), right.toDF("doc_id", "text"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getAs[Double]("jaccard")))
        .toSet
      assert(out === expected, s"seed $seed: cross join diverged " +
        s"(${out.size} vs ${expected.size} pairs)")
    }
  }
}
