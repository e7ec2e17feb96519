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
}
