package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Linear / hashed-n-gram scoring and the GD logistic trainer
  * ([[Classifier]]): closed-form score checks, gram construction via the
  * engine's own hash, and the trainer against a local float-for-float
  * reference — plus the it-actually-learns sanity check on separable
  * data. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("scoreLinear is the closed-form sigmoid") {
    val d = Seq((1L, 2.0, 10.0), (2L, -1.0, 4.0)).toDF("id", "a", "b")
    val out = Classifier.scoreLinear(d,
        Seq(col("a") -> 0.5, col("b") -> -0.1), bias = 0.3)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - sigmoid(0.3 + 1.0 - 1.0)) < 1e-12)
    assert(math.abs(out(2L) - sigmoid(0.3 - 0.5 - 0.4)) < 1e-12)
  }

  test("hashedNgramScore: gram set and mean-of-weights, via the engine's hash") {
    val b = 64
    val weights = Array.tabulate(b)(i => (i % 7) * 0.25 - 0.75)
    val text = "the quick brown fox"
    // expected grams: 4 unigrams + 3 bigrams
    val grams = Seq("the", "quick", "brown", "fox",
      "the quick", "quick brown", "brown fox")
    val buckets = grams.toDF("g")
      .select(pmod(hash(col("g")), lit(b)).as("k")).as[Int].collect()
    val want = sigmoid(0.2 + buckets.map(weights(_)).sum / grams.size)
    val got = Classifier.hashedNgramScore(
        Seq((1L, text)).toDF("id", "text"), "text", weights, bias = 0.2)
      .select("score").as[Double].head()
    assert(math.abs(got - want) < 1e-12)
  }

  test("hashedNgramScore: null/empty/single-token text") {
    val weights = Array.fill(8)(1.0)
    val d = Seq((1L, Some("solo")), (2L, Some("")), (3L, None), (4L, Some("  ")))
      .toDF("id", "text")
    val out = Classifier.hashedNgramScore(d, "text", weights, bias = 0.0)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - sigmoid(1.0)) < 1e-12) // one gram, weight 1
    assert(out(2L) == 0.5 && out(3L) == 0.5 && out(4L) == 0.5) // σ(bias)
  }

  test("hashedNgramScore plan is map-only (no explode, no exchange)") {
    val d = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Classifier.hashedNgramScore(d, "text", Array.fill(16)(0.1), 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
      s"expected one codegen projection:\n$plan")
  }

  test("fitLogistic matches a local reference float-for-float (quantized)") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 600).map { _ =>
      val f1 = rnd.nextDouble() * 2 - 1
      val f2 = rnd.nextDouble() * 2 - 1
      val y = if (f1 + 0.5 * f2 + 0.1 * (rnd.nextDouble() - 0.5) > 0) 1.0 else 0.0
      (f1, f2, y)
    }
    val got = Classifier.fitLogistic(rows.toDF("f1", "f2", "y"),
        Seq(col("f1"), col("f2")), "y", learningRate = 2.0, iterations = 4)
      .select("bias", "w_1", "w_2").as[(Double, Double, Double)].head()
    // local reference with the same quantization
    val q = 1e-9
    def snap(x: Double) = math.floor(x / q + 0.5) * q
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 1 to 4) {
      val g = Array(0.0, 0.0, 0.0)
      rows.foreach { case (f1, f2, y) =>
        val e = sigmoid(w(0) + w(1) * f1 + w(2) * f2) - y
        g(0) += e; g(1) += e * f1; g(2) += e * f2
      }
      w = w.zipWithIndex.map { case (wj, j) => snap(wj - 2.0 * snap(g(j)) / rows.size) }
    }
    assert(got == ((w(0), w(1), w(2))), s"got $got want ${w.toSeq}")
    // and it actually separates: the learned direction is positive on f1
    assert(w(1) > 0.5)
  }

  test("fitLogistic drops incomplete rows and refuses an empty fit") {
    val d = Seq((Some(1.0), Some(1.0)), (None, Some(0.0))).toDF("f1", "y")
    val fit = Classifier.fitLogistic(d, Seq(col("f1")), "y", iterations = 1)
    assert(fit.select("n").as[Long].head() == 1L)
    val empty = Seq((Option.empty[Double], Option.empty[Double])).toDF("f1", "y")
    intercept[IllegalArgumentException] {
      Classifier.fitLogistic(empty, Seq(col("f1")), "y", iterations = 1)
    }
  }

  test("aucROC matches the brute-force pairwise definition, ties averaged") {
    // AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) over all (+,−) pairs
    val rnd = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val s = math.floor(rnd.nextDouble() * 20) / 20.0 // coarse grid → many ties
      val y = if (rnd.nextDouble() < s * 0.8 + 0.1) 1.0 else 0.0
      (i.toLong, s, y)
    }
    val pos = rows.filter(_._3 == 1.0).map(_._2)
    val neg = rows.filter(_._3 == 0.0).map(_._2)
    val want = pos.map(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum).sum / (pos.size * neg.size)
    val got = Classifier.aucROC(rows.toDF("id", "s", "y"), "s", "y", nBuckets = 4)
      .select("n_pos", "n_neg", "auc").as[(Long, Long, Double)].head()
    assert(got._1 == pos.size && got._2 == neg.size)
    assert(math.abs(got._3 - want) < 2e-9, s"got ${got._3}, want $want")
  }

  test("aucROC edges: perfect separation, reversal, single class, bad labels") {
    val d = Seq((1L, 0.9, 1.0), (2L, 0.8, 1.0), (3L, 0.2, 0.0), (4L, 0.1, 0.0))
      .toDF("id", "s", "y")
    assert(Classifier.aucROC(d, "s", "y").select("auc").as[Double].head() == 1.0)
    val rev = d.withColumn("s", lit(1.0) - col("s"))
    assert(Classifier.aucROC(rev, "s", "y").select("auc").as[Double].head() == 0.0)
    val onlyPos = d.filter(col("y") === 1.0)
    val r = Classifier.aucROC(onlyPos, "s", "y")
      .select("n_pos", "n_neg").as[(Long, Long)].head()
    assert(r == ((2L, 0L)))
    assert(Classifier.aucROC(onlyPos, "s", "y").filter(col("auc").isNull).count() == 1)
    // labels outside {0,1} and nulls drop, not poison
    val dirty = d.unionByName(Seq((5L, 0.5, 2.0)).toDF("id", "s", "y"))
    assert(Classifier.aucROC(dirty, "s", "y")
      .select("n_pos", "n_neg").as[(Long, Long)].head() == ((2L, 2L)))
  }

  test("calibrationTable bins, rates, and exact grid means") {
    val d = Seq(
      (1L, 0.05, 0.0), (2L, 0.08, 1.0),            // bin 0
      (3L, 0.95, 1.0), (4L, 1.0, 1.0),             // bin 9 (1.0 clamps into top)
      (5L, 0.55, 0.0), (6L, 0.55, 1.0), (7L, 0.59, 1.0)) // bin 5
      .toDF("id", "s", "y")
    val out = Classifier.calibrationTable(d, "s", "y")
      .orderBy("bin")
      .select("bin", "n", "n_pos", "pos_rate", "mean_score")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 2L, 1L), (5L, 3L, 2L), (9L, 2L, 2L)))
    def gridMean(vs: Seq[Double]) = {
      val s = vs.map(v => math.floor(v * 1048576.0 + 0.5).toLong).sum
      math.floor(s.toDouble / vs.size / 1048576.0 * 1e6) / 1e6
    }
    assert(out(0)._4 == 0.5 && out(0)._5 == gridMean(Seq(0.05, 0.08)))
    assert(out(1)._4 == math.floor(2.0 / 3 * 1e6) / 1e6 &&
      out(1)._5 == gridMean(Seq(0.55, 0.55, 0.59)))
    assert(out(2)._4 == 1.0 && out(2)._5 == gridMean(Seq(0.95, 1.0)))
  }

  test("aucROCBy: each stratum equals its own standalone aucROC") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val g = s"g${i % 3}"
      val s = math.floor(rnd.nextDouble() * 10) / 10.0
      val y = if (rnd.nextDouble() < s) 1.0 else 0.0
      (i.toLong, g, s, y)
    }
    val df = rows.toDF("id", "g", "s", "y")
    val byGroup = Classifier.aucROCBy(df, Seq("g"), "s", "y", nBuckets = 4)
      .select("g", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Classifier.aucROC(df.filter(col("g") === g), "s", "y",
          nBuckets = 4)
        .select("n_pos", "n_neg", "auc").as[(Long, Long, Double)].head()
      assert(byGroup(g) == ((solo._1, solo._2, solo._3)), s"stratum $g")
    }
    // a single-class stratum reports null AUC, not a crash
    val oneClass = df.withColumn("y",
      when(col("g") === "g0", 1.0).otherwise(col("y")))
    val r = Classifier.aucROCBy(oneClass, Seq("g"), "s", "y", nBuckets = 4)
      .filter(col("g") === "g0").select("auc").collect().head
    assert(r.isNullAt(0))
  }

  test("aucROC plan: no corpus-scale single-reducer window") {
    val d = (0 until 100).map(i => (i.toLong, i / 100.0, (i % 2).toDouble))
      .toDF("id", "s", "y")
    val plan = Classifier.aucROC(d, "s", "y", nBuckets = 4)
      .queryExecution.executedPlan.toString
    // the running-count window must partition BY BUCKET (attribute ids
    // vary, hence the regex); the only unpartitioned window left is the
    // nBuckets-row offset table
    assert("windowspecdefinition\\(__b#\\d+, __s#\\d+".r
        .findFirstIn(plan.toLowerCase).isDefined,
      s"expected the per-bucket running-count window:\n$plan")
  }

  test("fitOLS2: recovers exact coefficients of a planted linear relation") {
    import spark.implicits._
    // y = 3 + 2·x1 − 0.5·x2 exactly → R² = 1, coefficients exact
    val rows = for (i <- 1 to 100; j <- 1 to 3) yield {
      val (x1, x2) = (i.toDouble, (i * 7 % 13 + j).toDouble)
      (3.0 + 2.0 * x1 - 0.5 * x2, x1, x2)
    }
    val out = Classifier.fitOLS2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    assert(out._1 == 300L)
    assert(math.abs(out._2.get - 3.0) < 1e-6)
    assert(math.abs(out._3.get - 2.0) < 1e-6)
    assert(math.abs(out._4.get + 0.5) < 1e-6)
    assert(math.abs(out._5.get - 1.0) < 1e-9)
  }

  test("fitOLS2 matches a local normal-equations reference on noisy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    def snap6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows = (0 until 500).map { _ =>
      val x1 = snap6(rnd.nextDouble() * 10); val x2 = snap6(rnd.nextDouble() * 5)
      (snap6(1.0 + 0.8 * x1 + 1.5 * x2 + rnd.nextGaussian()), x1, x2)
    }
    val got = Classifier.fitOLS2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    // local reference: same moments (exact on the 1e-6-snapped inputs),
    // same Cramer arithmetic
    val n = rows.size.toDouble
    val (s1, s2, sy) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._1).sum)
    val s11 = rows.map(r => r._2 * r._2).sum; val s12 = rows.map(r => r._2 * r._3).sum
    val s22 = rows.map(r => r._3 * r._3).sum; val s1y = rows.map(r => r._2 * r._1).sum
    val s2y = rows.map(r => r._3 * r._1).sum; val syy = rows.map(r => r._1 * r._1).sum
    def det3(a: Double, b: Double, c: Double, p: Double, q: Double, r: Double,
             u: Double, v: Double, w: Double) =
      a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
    val dA = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / dA
    val b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22) / dA
    val b2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y) / dA
    assert(math.abs(got._2.get - b0) < 1e-6)
    assert(math.abs(got._3.get - b1) < 1e-6)
    assert(math.abs(got._4.get - b2) < 1e-6)
    val sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    val sst = syy - sy * sy / n
    assert(math.abs(got._5.get - (1.0 - sse / sst)) < 1e-6)
  }

  test("fitOLS2: collinear design and constant y degrade to nulls, not garbage") {
    import spark.implicits._
    val collinear = (1 to 50).map(i => (i.toDouble, i.toDouble, 2.0 * i))
    val c = Classifier.fitOLS2(collinear.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    assert(c._2.isEmpty && c._3.isEmpty && c._4.isEmpty && c._5.isEmpty)
    val consty = (1 to 50).map(i => (7.0, i.toDouble, (i * 3 % 11).toDouble))
    val k = Classifier.fitOLS2(consty.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    assert(k._5.isEmpty) // SST = 0 → R² undefined
  }
}
