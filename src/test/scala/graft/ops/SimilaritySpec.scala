package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Unit spec for cosine similarity search over a tiny controlled space. */
class SimilaritySpec extends SparkSpec {

  // 4-dim toy embeddings padded to Dim with zeros.
  private def emb(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, v) => (id, (v ++ Seq.fill(Similarity.Dim - v.size)(0.0))
        .map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks by exact cosine, excluding the query itself") {
    // Fewer vectors than NumQueries, so the fixed-size draw makes EVERY
    // vector a query; assertions pin query 0's ranking.
    val all = Similarity.bruteForceTopK(emb(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // closest to 0
      (2L, Seq(0.5, 0.5, 0.0, 0.0)),
      (3L, Seq(-1.0, 0.0, 0.0, 0.0))), // opposite of 0
      k = 3).collect()
    assert(all.map(_.getAs[Long]("q_id")).toSet === Set(0L, 1L, 2L, 3L))
    val out = all.filter(_.getAs[Long]("q_id") == 0L)
    assert(out.sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("neighbor_id")).toSeq === Seq(1L, 2L, 3L))
    val top = out.find(_.getAs[Int]("rank") == 1).get
    assert(math.abs(top.getAs[Double]("cos_sim") - 0.993884) < 1e-6)
  }

  test("queryDraw is a fixed-size deterministic draw, corpus-size-independent") {
    val big = emb((1L to 120L).map(i => (i, Seq(i.toDouble))): _*)
    val prep = Similarity.prepared(big)
    val drawn = Similarity.queryDraw(prep, n = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(drawn.length === 10)
    // Same draw on a rerun and on a frame with extra columns.
    val again = Similarity.queryDraw(prep.withColumn("extra",
        org.apache.spark.sql.functions.lit(1)), n = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(drawn.sorted === again.sorted)
    // Growing the corpus cannot grow the draw (the 100TB guarantee).
    val bigger = emb((1L to 500L).map(i => (i, Seq(i.toDouble))): _*)
    assert(Similarity.queryDraw(Similarity.prepared(bigger), n = 10)
      .count() === 10L)
  }

  test("identical vectors have cosine 1.0 and share an SRP bucket") {
    val v = Seq(0.3, -0.7, 0.2, 0.9)
    val out = Similarity.cosineNearDup(emb((1L, v), (2L, v)), threshold = 0.9)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("cos_sim") === 1.0)
  }

  test("cosineNearDupClusters: transitive near-dups share min id, rest self-label") {
    val v = Seq(0.3, -0.7, 0.2, 0.9)
    // 2↔5 and 5↔8 are near-identical (transitive chain); 1 is orthogonal-ish.
    val out = Similarity.cosineNearDupClusters(emb(
      (2L, v), (5L, v.map(_ * 0.999)), (8L, v.map(_ * 1.001)),
      (1L, Seq(-0.9, 0.2, 0.1, -0.4))), threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) === 2L && out(5L) === 2L && out(8L) === 2L)
    assert(out(1L) === 1L)
  }

  test("orthogonal vectors are not near-duplicates") {
    val out = Similarity.cosineNearDup(emb(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))), threshold = 0.25).collect()
    assert(out.isEmpty)
  }

  test("lsh top-k returns a subset of the brute-force candidates") {
    val vecs = (0L to 20L).map(i =>
      i -> Seq(math.cos(i * 0.3), math.sin(i * 0.3), 0.1 * i % 1.0, 0.5))
    val brute = Similarity.bruteForceTopK(emb(vecs: _*), k = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Similarity.lshTopK(emb(vecs: _*), bits = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"))).toSet
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(brute.union(lsh.filter(_ => true)))) // sanity: no dup ids
    lsh.foreach { case (q, n) => assert(q !== n) }
  }

  test("ivf: identical vectors land in the same cell; top-k excludes the query") {
    val v = Seq(0.4, -0.2, 0.8, 0.1)
    val all = Similarity.ivfTopK(emb(
      (0L, v),
      (1L, v.map(_ * 0.99)),             // same direction → same cell
      (2L, v)), cells = 4, k = 5).collect()
    assert(all.nonEmpty)
    // Every vector is a query (n < NumQueries); none may be its own neighbor.
    assert(all.forall(r =>
      r.getAs[Long]("q_id") != r.getAs[Long]("neighbor_id")))
    val out = all.filter(_.getAs[Long]("q_id") == 0L)
    val top = out.minBy(_.getAs[Int]("rank"))
    assert(top.getAs[Double]("cos_sim") === 1.0) // parallel vectors
  }

  test("planes are deterministic for a fixed seed") {
    assert(Similarity.planes(4) === Similarity.planes(4))
    assert(Similarity.planes(4).flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("quantizeStats: exact scale and reconstruction error, float-safe") {
    // Powers of two are exact in float32, so the doubles are exact too.
    val out = Similarity.quantizeStats(
      emb((1L, Seq(1.0, -0.5, 0.25, 0.0)))).collect().head
    assert(out.getAs[Double]("scale") === 0.007874) // round(1/127, 6)
    // -0.5/scale = -63.5 → rounds away from zero to -64 → err = 0.5/127.
    assert(out.getAs[Double]("max_abs_err") === 0.003937)
    // (0.5/127 + 0.25/127) / 64 dims (0.25 quantizes to 31.75 → 32).
    assert(out.getAs[Double]("mean_abs_err") === 0.000092)
    // All-zero vector: scale floor, zero error, no division blowup.
    val zero = Similarity.quantizeStats(
      emb((2L, Seq(0.0)))).collect().head
    assert(zero.getAs[Double]("max_abs_err") === 0.0)
    assert(zero.getAs[Double]("mean_abs_err") === 0.0)
  }

  test("boundedBroadcast refuses an oversize side and passes a small one") {
    val wide = emb((1L to 20L).map(i => (i, Seq(i.toDouble))): _*)
    val ex = intercept[IllegalArgumentException] {
      Similarity.boundedBroadcast(wide, maxRows = 10)
    }
    assert(ex.getMessage.contains("too large to broadcast"))
    // Under the bound: passes through with the hint, rows intact.
    assert(Similarity.boundedBroadcast(wide, maxRows = 20).count() === 20L)
  }

  // Three well-separated synthetic clusters (seeded, deterministic): the
  // shape where a trained quantizer should recover near-perfect recall.
  private def clusteredEmb(perCluster: Int): org.apache.spark.sql.DataFrame = {
    val rng = new scala.util.Random(7)
    val centers = Seq(
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 0) 5.0 else 0.0),
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 1) -5.0 else 0.0),
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 2) 5.0 else 0.5))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until perCluster
    } yield ((ci * perCluster + j).toLong,
      c.map(x => x + rng.nextGaussian() * 0.3))
    emb(rows: _*)
  }

  test("kmeans centroids: one per cell, near the true cluster centers") {
    val data = clusteredEmb(40)
    val cs = Similarity.kmeansCentroids(
      Similarity.prepared(data).localCheckpoint(), cells = 3, iters = 4)
    assert(cs.length === 3)
    assert(cs.forall(_.length === Similarity.Dim))
    // Every trained centroid sits close to SOME true center (distance far
    // below the 8.6 inter-center gap).
    val centers = Seq(
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 0) 5.0 else 0.0),
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 1) -5.0 else 0.0),
      Seq.tabulate(Similarity.Dim)(i => if (i % 3 == 2) 5.0 else 0.5))
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    cs.foreach { c =>
      assert(centers.map(dist(c, _)).min < 1.0,
        s"centroid strayed ${centers.map(dist(c, _)).min} from every center")
    }
  }

  test("trained IVF recall vs brute force is high on clustered data") {
    val data = clusteredEmb(40) // 120 vecs → 50 hash-drawn queries
    val exact = Similarity.bruteForceTopK(data, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.kmeansIvfTopK(
      data, cells = 3, iters = 4, k = 5, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exact.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"trained-IVF recall $recall below 0.8")
  }

  test("recallAtK emits one (hits, expected, recall) row holding the 0.8 floor") {
    val data = clusteredEmb(40)
    val rows = Similarity.recallAtK(
      Similarity.kmeansIvfTopK(data, cells = 3, iters = 4, k = 5, nprobe = 2),
      Similarity.bruteForceTopK(data, k = 5)).collect()
    assert(rows.length === 1)
    val r = rows.head
    // 120 vecs → NumQueries hash-drawn queries × k=5 exact neighbors.
    assert(r.getAs[Long]("expected") === Similarity.NumQueries * 5L)
    assert(r.getAs[Long]("hits") <= r.getAs[Long]("expected"))
    assert(r.getAs[Double]("recall") >= 0.8,
      s"registered recall row below the floor: $r")
  }

  test("pq codebooks: one per subspace, right arity") {
    val books = Similarity.pqCodebooks(
      Similarity.prepared(clusteredEmb(40)).localCheckpoint(),
      m = 8, codes = 4, iters = 3)
    assert(books.length === 8)
    assert(books.forall(_.length === 4))
    assert(books.forall(_.forall(_.length === Similarity.Dim / 8)))
  }

  test("pq ADC recall vs brute force is high on clustered data") {
    val data = clusteredEmb(40)
    val exact = Similarity.bruteForceTopK(data, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    // refine=8: with 50 hash-drawn queries the recall average is much less
    // forgiving than the old 1-query draw, and raw-vector PQ at codes=8 is
    // coarse — a wider shortlist (40 of 119 candidates) is the documented
    // recall lever for it.
    val pq = Similarity.pqTopK(data, m = 8, codes = 8, iters = 4, k = 5,
        refine = 8)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exact.nonEmpty)
    // The exact re-rank stage means errors only come from ADC shortlist
    // misses; on well-separated clusters the shortlist should rarely miss.
    val recall = pq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ-ADC recall $recall below 0.8")
  }

  test("ivfpq: residual-coded ADC recall vs brute force on clustered data") {
    val data = clusteredEmb(40)
    val exact = Similarity.bruteForceTopK(data, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfpq = Similarity.ivfPqTopK(
      data, cells = 3, m = 8, codes = 8, iters = 4, k = 5, nprobe = 2)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(exact.nonEmpty)
    val recall = ivfpq.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVFPQ recall $recall below 0.8")
  }

  test("semanticDedup: min-id keeper per near-dup clique, full partition, " +
      "trained audit invariants hold") {
    // Two near-identical pairs in different directions plus a loner:
    // the smaller id of each clique must be kept, the larger pruned.
    val data = emb(
      (1L, Seq(1.0, 0.01, 0.0, 0.0)),
      (2L, Seq(1.0, 0.02, 0.0, 0.0)),   // dup of 1 (cos ≈ 1)
      (5L, Seq(0.0, 0.0, 1.0, 0.01)),
      (6L, Seq(0.0, 0.0, 1.0, 0.02)),   // dup of 5
      (9L, Seq(0.0, 1.0, 0.0, -1.0)))   // loner
    val out = Similarity.semanticDedup(data, cells = 2, bits = 2,
        threshold = 0.9).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out.keySet === Set(1L, 2L, 5L, 6L, 9L), "one row per vector")
    assert(out(1L) && !out(2L), s"min id of clique {1,2} keeps: $out")
    assert(out(5L) && !out(6L), s"min id of clique {5,6} keeps: $out")
    assert(out(9L), "loner keeps")
    // Trained-cells face: same prune structure on this fixture (the
    // cliques are far apart, any sane quantizer separates or co-cells
    // them identically), and every audit invariant holds.
    val trained = Similarity.semanticDedup(data, cells = 2, bits = 2,
        threshold = 0.9, trainedCells = true).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep")).toMap
    assert(trained === out, s"trained face must agree here: $trained vs $out")
    val audit = Similarity.semanticDedupAudit(data, cells = 2, bits = 2,
      threshold = 0.9).collect()(0)
    assert(audit.getAs[Long]("n_total") === 5L)
    assert(audit.getAs[Boolean]("partition_ok"))
    assert(audit.getAs[Boolean]("pruned_witnessed"))
    assert(audit.getAs[Boolean]("keepers_clean"))
  }

  test("pq top-k output ranks by exact cosine after the re-rank") {
    val data = clusteredEmb(40)
    val rows = Similarity.pqTopK(data, m = 8, codes = 8, iters = 4, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cos_sim")))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"cos_sim must be non-increasing in rank: ${byRank.toSeq}")
    }
  }

  test("cellCentroidDrift: identical even/odd snapshots agree at cosine 1.0") {
    import spark.implicits._
    // Every base vector appears twice — once with an even id (snapshot A)
    // and once odd (snapshot B) — so within every occupied cell the two
    // half-centroids are the same point and the drift report must read
    // exactly 1.0 (the decimal pipeline preserves the identity bit-for-bit).
    val rows = (0 until 16).flatMap { i =>
      val v = Seq.tabulate(Similarity.Dim)(j =>
        (((i * 7 + j * 3) % 5) - 1).toFloat)
      Seq((2L * i, v), (2L * i + 1, v))
    }
    val out = Similarity.cellCentroidDrift(
      rows.toDF("vec_id", "embedding")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"even/odd counts must match in cell ${r.getInt(0)}")
      assert(r.getDouble(3) === 1.0,
        s"identical snapshots must read cosine 1.0 in cell ${r.getInt(0)}")
    }
    assert(out.map(_.getLong(1)).sum === 16L)
  }

  test("knnLabelEval: separable clusters classify correctly; ties break low-label") {
    import spark.implicits._
    // Two tight clusters along different axes: labels follow the cluster.
    def v(axis: Int, eps: Double) =
      Seq.tabulate(Similarity.Dim)(j =>
        (if (j == axis) 1.0 else 0.0) + (if (j == 63) eps else 0.0))
        .map(_.toFloat)
    val rows = (0 until 12).map { i =>
      val cl = i % 2
      (i.toLong, v(cl * 7, 0.01 * (i / 2)), cl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelEval(df, k = 3).collect()
    assert(out.nonEmpty)
    // Every query's neighbors stay in its own cluster → all correct.
    assert(out.forall(_.getAs[Boolean]("correct")),
      out.map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("true_label"),
        r.getAs[Int]("pred_label"))).toSeq.toString)
    assert(out.forall(_.getAs[Int]("n_votes") === 3))
  }

  test("random projection: basis vector has exact ±1/√k components and ratio 1") {
    // x = e₀: y_i = s_i0/4 = ±0.25 exactly, ‖y‖² = 16·(1/16) = ‖x‖² = 1.
    val out = Similarity.randomProjection(emb(1L -> Seq(1.0))).head()
    for (i <- 0 until Similarity.RpDims) {
      val y = out.getAs[Double](s"y$i")
      assert(math.abs(y) === 0.25, s"y$i = $y")
    }
    assert(out.getAs[Double]("norm_ratio") === 1.0)
    assert(out.getAs[Boolean]("ok_distortion"))
  }

  test("random projection: zero vector yields null ratio and fails the verdict") {
    val out = Similarity.randomProjection(emb(1L -> Seq(0.0))).head()
    assert(out.isNullAt(out.fieldIndex("norm_ratio")))
    assert(!out.getAs[Boolean]("ok_distortion"))
  }

  test("sq8Codes: codes span [0, 255] and hit the grid endpoints per dim") {
    val data = emb(
      (1L, Seq(0.0, -2.0, 7.5)),
      (2L, Seq(1.0, 3.0, 7.5)),
      (3L, Seq(0.5, 0.5, 7.5)))
    val out = Similarity.sq8Codes(Similarity.prepared(data))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](3)).toMap
    // Dim 1 spans [0, 1]: min doc codes 0, max codes 255, mid 127.
    assert(out(1L)(0) === 0L && out(2L)(0) === 255L)
    assert(out(3L)(0) === 127L) // floor(0.5 * 255) on the integer grid
    // Dim 2 spans [-2, 3]: endpoints again.
    assert(out(1L)(1) === 0L && out(2L)(1) === 255L)
    // Constant dim 3 (and the zero padding): span clamps to 1, code 0.
    assert(out.values.forall(c => c(2) === 0L && c(3) === 0L))
    assert(out.values.forall(_.forall(c => c >= 0L && c <= 255L)))
  }

  test("sq8TopK equals brute force when the shortlist covers the corpus; " +
    "recall audit holds on clustered data") {
    // 15 vectors < refine·k = 20: the integer shortlist covers every
    // candidate, so the exact re-rank must reproduce brute force exactly.
    val small = emb((0L until 15L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 2.7 + j))): _*)
    val sq8 = Similarity.sq8TopK(small, k = 3, refine = 7)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    val brute = Similarity.bruteForceTopK(small, k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    assert(sq8 === brute)
    // On the trained-quantizer shape, the 8-bit grid + exact re-rank
    // holds well above the registered 0.9 floor.
    val audit = Similarity.sq8RecallAudit(clusteredEmb(40), k = 5,
      refine = 4, floor = 0.9).collect().head
    assert(audit.getAs[Long]("expected") === 250L)
    assert(audit.getAs[Boolean]("floor_met"))
  }

  test("ivfSq8TopK equals ivfTopK when the shortlist covers each cell " +
    "(the exact-rerank guarantee composed with the cell join)") {
    val data = emb((0L until 30L).map(i =>
      i -> Seq.tabulate(8)(j => math.cos(i * 1.9 + j * 0.7))): _*)
    // refine·k = 30 ≥ any cell's population, so the SQ8 shortlist covers
    // the whole cell and the exact re-rank must reproduce the plain
    // nprobe=1 IVF result row for row.
    val composed = Similarity.ivfSq8TopK(data, cells = 4, k = 3, refine = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    val plain = Similarity.ivfTopK(data, cells = 4, k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    assert(composed === plain)
    assert(composed.nonEmpty)
  }

  test("ivfProbeCells: nprobe distinct cells, first probe = own cell") {
    val data = emb((0L until 12L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 2.3 + j * 1.1))): _*)
    val seeds = Similarity.planes(4, seed = 7L)
    val rows = Similarity.prepared(data)
      .select(col("vec_id"),
        Similarity.ivfCell(col("vec"), seeds).alias("own"),
        Similarity.ivfProbeCells(col("vec"), seeds, 3).alias("probes"))
      .collect()
    rows.foreach { r =>
      val probes = r.getSeq[Int](2)
      assert(probes.length === 3)
      assert(probes.distinct.length === 3)
      // Own cell uses the 6-dp pin, probes the micro pin — identical
      // argmax away from knife edges this smooth fixture never hits.
      assert(probes.head === r.getInt(1),
        s"first probe should be the argmax cell: $r")
    }
  }

  test("ivfSq8TopKProbe at nprobe=cells equals the full SQ8 scan " +
    "(all lists probed = no list pruning at all)") {
    val data = emb((0L until 30L).map(i =>
      i -> Seq.tabulate(8)(j => math.cos(i * 1.9 + j * 0.7))): _*)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    val probed = key(Similarity.ivfSq8TopKProbe(
      data, cells = 4, k = 3, refine = 4, nprobe = 4))
    val full = key(Similarity.sq8TopK(data, k = 3, refine = 4))
    assert(probed === full)
    assert(probed.nonEmpty)
  }

  test("ivfSq8ProbeGainReport: recalls in [0,1], gain = probe − single") {
    val data = emb((0L until 40L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 0.9 + j * 0.5))): _*)
    val r = Similarity.ivfSq8ProbeGainReport(
      data, cells = 4, k = 3, refine = 2, nprobe = 2).collect().head
    val (r1, rp, gain) = (r.getAs[Double]("recall_1"),
      r.getAs[Double]("recall_probe"), r.getAs[Double]("gain"))
    assert(r1 >= 0 && r1 <= 1 && rp >= 0 && rp <= 1)
    assert(math.abs(gain - BigDecimal(rp - r1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("random projection: ratios concentrate near 1 across a spread of vectors") {
    val data = emb((0L until 40L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 3.1 + j).abs + 0.1)): _*)
    val rows = Similarity.randomProjection(data).collect()
    val ratios = rows.map(_.getAs[Double]("norm_ratio"))
    assert(rows.forall(_.getAs[Boolean]("ok_distortion")),
      s"distortion outlier in ${ratios.toSeq}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.5 && mean < 1.6, s"mean ratio $mean far from 1")
  }
}
