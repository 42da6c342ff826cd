package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for the trained quality classifier (rounded-GD logistic
  * regression distilling the rule gate). */
class QualityModelSpec extends SparkSpec {

  // Clearly separable corpus: long clean docs pass the gate, shorts fail.
  private def corpus = {
    import spark.implicits._
    val good = (1L to 30L).map(i => (i,
      "spark builds the plan and runs the query over many partitions " +
        "while the optimizer prunes columns and pushes filters down " + i))
    val bad = (31L to 40L).map(i => (i, s"tiny doc $i"))
    (good ++ bad).toDF("doc_id", "text")
  }

  test("features are bounded, labeled by the gate, and 6-decimal-rounded") {
    val f = QualityModel.features(corpus).collect()
    assert(f.length === 40)
    f.foreach { r =>
      for (j <- 0 until QualityModel.Dim) {
        val x = r.getDouble(1 + j)
        assert(x >= 0.0 && x <= 1.0, s"x$j=$x out of [0,1]")
        assert(x === math.rint(x * 1e6) / 1e6, s"x$j=$x not 6-dec rounded")
      }
      assert(Set(0.0, 1.0).contains(r.getDouble(1 + QualityModel.Dim)))
    }
    // Both classes present: 30 pass, 10 fail (too_short).
    assert(f.count(_.getDouble(1 + QualityModel.Dim) == 1.0) === 30)
  }

  test("training is deterministic and separates the classes") {
    val w1 = QualityModel.train(corpus)
    val w2 = QualityModel.train(corpus)
    assert(w1.toSeq === w2.toSeq)
    val scored = QualityModel.scores(corpus, w1.toSeq)
      .join(QualityModel.features(corpus).select(col("doc_id"), col("y")),
        "doc_id")
      .collect()
    val pos = scored.filter(_.getAs[Double]("y") == 1.0)
      .map(_.getAs[Double]("score"))
    val neg = scored.filter(_.getAs[Double]("y") == 0.0)
      .map(_.getAs[Double]("score"))
    // The learned scorer ranks every passing doc above every failing doc
    // on this separable corpus (AUC = 1 in expectation; assert means).
    assert(pos.sum / pos.length > neg.sum / neg.length + 0.1,
      s"mean(pos)=${pos.sum / pos.length} mean(neg)=${neg.sum / neg.length}")
  }

  test("train-once memo: same input trains once, different input trains fresh") {
    QualityModel.clearWeightMemo()
    val before = QualityModel.trainExecutions.get()
    val w1 = QualityModel.train(corpus)
    val w2 = QualityModel.train(corpus)           // memo hit (equal plans)
    QualityModel.trainedScores(corpus).collect()  // composed query: hit too
    assert(QualityModel.trainExecutions.get() - before === 1,
      "the 16-job GD loop must execute once per distinct (input, params)")
    assert(w1.toSeq === w2.toSeq)
    // A DIFFERENT corpus with the same schema must NOT alias into the memo
    // (the key is the canonicalized plan, whose LocalRelation equality
    // includes the data rows).
    import spark.implicits._
    val other = Seq((1L, "totally different tiny corpus"),
      (2L, "of two documents")).toDF("doc_id", "text")
    QualityModel.train(other)
    assert(QualityModel.trainExecutions.get() - before === 2)
    // Different hyper-parameters re-train as well.
    QualityModel.train(corpus, steps = 2)
    assert(QualityModel.trainExecutions.get() - before === 3)
  }

  test("weightsTable emits one named row per dimension in order") {
    val rows = QualityModel.weightsTable(spark, corpus).collect()
    assert(rows.map(_.getString(0)).toSeq === QualityModel.FeatureNames)
    assert(rows.forall(r => !r.isNullAt(1)))
  }

  test("evalCard: 9 thresholds, counts partition the corpus, tp monotone, " +
      "ratios null-safe") {
    val n = corpus.count()
    val rows = QualityModel.evalCard(corpus).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 9)
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ===
      (1 to 9).map(_ / 10.0))
    for (r <- rows) {
      val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
      assert(tp + fp + fn + tn === n,
        s"confusion must partition the corpus at ${r.getAs[Double]("threshold")}")
      // Ratio algebra where defined: precision = tp/(tp+fp) to 6 dp.
      if (tp + fp > 0)
        assert(math.abs(r.getAs[Double]("precision") -
          BigDecimal(tp.toDouble / (tp + fp))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      else assert(r.isNullAt(r.fieldIndex("precision")))
    }
    // Raising the cut can only shrink the positive set.
    val tps = rows.map(_.getAs[Long]("tp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b },
      s"tp must be non-increasing in threshold: ${tps.toSeq}")
  }
}
