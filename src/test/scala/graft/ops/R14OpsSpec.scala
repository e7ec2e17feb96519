package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Round-14 operators: attribution variants (first-touch, U-shaped
  * position), Mann–Whitney U, Benjamini–Hochberg FDR, Cohen's kappa,
  * LOCF fill + daily resample, min-label propagation, association rules,
  * RFM segmentation. Every test is a hand-computed (or brute-force)
  * reference, including the degenerate inputs. */
class R14OpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  // ---- attribution variants ------------------------------------------

  test("firstTouchAttribution: earliest prior touch, organic nulls") {
    val ev = Seq(
      (1L, ts(10), 1L, "ad"), (1L, ts(20), 2L, "email"),
      (1L, ts(30), 3L, "purchase"), (1L, ts(40), 4L, "purchase"),
      (2L, ts(5), 5L, "purchase") // organic: nothing precedes it
    ).toDF("user_id", "t", "eid", "et")
    val out = Sequences.firstTouchAttribution(ev, "user_id", "t", "eid",
        "et", "purchase")
      .orderBy("user_id", "t")
      .select("user_id", "attributed_type", "gap_seconds")
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    // both purchases of user 1 credit the FIRST touch (ad@10)
    assert(out == Seq(
      (1L, Some("ad"), Some(20L * 60)),
      (1L, Some("ad"), Some(30L * 60)),
      (2L, None, None)))
  }

  test("positionAttribution: 40/20/40 weights, journey reset, no organic rows") {
    val ev = Seq(
      // journey 1 of user 1: four touches -> 0.4, 0.1, 0.1, 0.4
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (1L, ts(3), 3L, "c"), (1L, ts(4), 4L, "d"),
      (1L, ts(5), 5L, "purchase"),
      // journey 2 of user 1: two touches -> 0.5, 0.5
      (1L, ts(6), 6L, "e"), (1L, ts(7), 7L, "f"),
      (1L, ts(8), 8L, "purchase"),
      // trailing touch after the final conversion: no credit
      (1L, ts(9), 9L, "g"),
      // user 2: single touch -> 1.0
      (2L, ts(1), 10L, "h"), (2L, ts(2), 11L, "purchase"),
      // user 3: organic conversion -> no rows at all
      (3L, ts(1), 12L, "purchase")
    ).toDF("user_id", "t", "eid", "et")
    val out = Sequences.positionAttribution(ev, "user_id", "t", "eid",
        "et", "purchase")
      .orderBy("user_id", "conv_ts", "touch_ts")
      .select("user_id", "touch_type", "weight")
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 0.4), (1L, "b", 0.2 / 2), (1L, "c", 0.2 / 2), (1L, "d", 0.4),
      (1L, "e", 0.5), (1L, "f", 0.5),
      (2L, "h", 1.0)))
    // credit conservation: each credited journey's weights sum to 1
    val sums = Sequences.positionAttribution(ev, "user_id", "t", "eid",
        "et", "purchase")
      .groupBy("user_id", "conv_ts").agg(sum("weight").as("s"))
      .select("s").as[Double].collect()
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  // ---- rank tests ----------------------------------------------------

  test("mannWhitney: textbook no-tie and tied cases") {
    // A = {1,2}, B = {3,4}: Ra = 1+2 = 3, U = 3 - 3 = 0, mu = 2,
    // var = 4*5/12, z = -2/sqrt(5/3)
    val df1 = Seq((1.0, "A"), (2.0, "A"), (3.0, "B"), (4.0, "B"))
      .toDF("v", "g")
    val r1 = Sketches.mannWhitney(df1, "v", col("g") === "A",
        col("g") === "B", grid = 0.5)
      .as[(Long, Long, Double, Option[Double])].collect().head
    val zExp1 = math.floor(-2.0 / math.sqrt(4.0 / 12.0 * 5.0) * 1e9 + 0.5) / 1e9
    assert(r1 == ((2L, 2L, 0.0, Some(zExp1))))
    // A = {1,1}, B = {1,2}: tie group t=3 at v=1 -> avg rank 2, Ra = 4,
    // U = 1, ties = 24, var = 4/12*(5 - 24/12) = 1, z = -1
    val df2 = Seq((1.0, "A"), (1.0, "A"), (1.0, "B"), (2.0, "B"))
      .toDF("v", "g")
    val r2 = Sketches.mannWhitney(df2, "v", col("g") === "A",
        col("g") === "B", grid = 0.5)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(r2 == ((2L, 2L, 1.0, Some(-1.0))))
  }

  test("mannWhitney: empty slice and all-tied input give null z") {
    val allA = Seq((1.0, "A"), (2.0, "A")).toDF("v", "g")
    val r = Sketches.mannWhitney(allA, "v", col("g") === "A",
        col("g") === "B", grid = 1.0)
      .select("z").as[Option[Double]].collect().head
    assert(r.isEmpty)
    val tied = Seq((1.0, "A"), (1.0, "B")).toDF("v", "g")
    val r2 = Sketches.mannWhitney(tied, "v", col("g") === "A",
        col("g") === "B", grid = 1.0)
      .select("z").as[Option[Double]].collect().head
    assert(r2.isEmpty) // sigma = 0 when every value is one tie group
  }

  test("bhFdr: textbook rejection set and the step-up rescue") {
    val ps = Seq((1L, 0.01), (2L, 0.02), (3L, 0.03), (4L, 0.2), (5L, 0.5))
      .toDF("id", "p")
    val out = Sketches.bhFdr(ps, "id", "p", alpha = 0.1)
      .orderBy("rank").select("id", "rejected")
      .as[(Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, true), (2L, true), (3L, true),
      (4L, false), (5L, false)))
    // step-up: rank 1 fails its own threshold but rank 2 passes ->
    // BOTH reject (the defining BH behavior a naive per-row gate misses)
    val ps2 = Seq((1L, 0.026), (2L, 0.04)).toDF("id", "p")
    val out2 = Sketches.bhFdr(ps2, "id", "p", alpha = 0.05)
      .orderBy("rank").select("rejected").as[Boolean].collect().toSeq
    assert(out2 == Seq(true, true))
    // null p-values drop; empty input -> empty output
    assert(Sketches.bhFdr(Seq((1L, Option.empty[Double])).toDF("id", "p"),
      "id", "p").count() == 0)
  }

  // ---- agreement -----------------------------------------------------

  test("cohensKappa: textbook 2x2, never-agree marginals, constant raters") {
    def rows(n: Int, a: String, b: String) = Seq.fill(n)((a, b))
    val df = (rows(20, "a", "a") ++ rows(15, "b", "b") ++
      rows(5, "a", "b") ++ rows(10, "b", "a")).toDF("r1", "r2")
    val r = Classifier.cohensKappa(df, "r1", "r2")
      .as[(Long, Double, Double, Option[Double])].collect().head
    assert(r == ((50L, 0.7, 0.5, Some(0.4))))
    // labels used by both raters but never together still feed p_e
    // (the diagonal-cell trap): po = 0, pe = 0.5, kappa = -1
    val never = Seq(("a", "b"), ("b", "a")).toDF("r1", "r2")
    val r2 = Classifier.cohensKappa(never, "r1", "r2")
      .as[(Long, Double, Double, Option[Double])].collect().head
    assert(r2 == ((2L, 0.0, 0.5, Some(-1.0))))
    // both raters constant: pe = 1 -> kappa undefined (null), not 1
    val const = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    val r3 = Classifier.cohensKappa(const, "r1", "r2")
      .select("kappa").as[Option[Double]].collect().head
    assert(r3.isEmpty)
  }

  // ---- gap fill / resample -------------------------------------------

  test("locfFill: carries last observation, leading nulls stay, keys isolate") {
    val df = Seq(
      (1L, ts(1), 1L, Option.empty[Double]), // leading null: stays null
      (1L, ts(2), 2L, Some(10.0)),
      (1L, ts(3), 3L, Option.empty[Double]), // fills 10.0
      (1L, ts(4), 4L, Some(20.0)),
      (1L, ts(5), 5L, Option.empty[Double]), // fills 20.0
      (2L, ts(1), 6L, Option.empty[Double])  // other key: no bleed
    ).toDF("k", "t", "eid", "v")
    val out = TimeSeries.locfFill(df, "k", "t", "eid", "v")
      .orderBy("k", "t").select("v", "was_filled")
      .as[(Option[Double], Boolean)].collect().toSeq
    assert(out == Seq((None, false), (Some(10.0), false), (Some(10.0), true),
      (Some(20.0), false), (Some(20.0), true), (None, false)))
  }

  test("resampleDaily: span grid, daily close wins, gaps inherit") {
    def dts(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val df = Seq(
      (1L, dts(1, 9), 1L, 1.0), (1L, dts(1, 17), 2L, 2.0), // close of d1 = 2.0
      (1L, dts(3, 12), 3L, 3.0),                           // d2 missing
      (2L, dts(5, 1), 4L, 9.0)
    ).toDF("k", "t", "eid", "v")
    val out = TimeSeries.resampleDaily(df, "k", "t", "eid", "v")
      .orderBy("k", "day")
      .select(col("k"), col("day").cast("string"), col("v"))
      .as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 2.0), (1L, "2024-01-02", 2.0),
      (1L, "2024-01-03", 3.0), (2L, "2024-01-05", 9.0)))
  }

  // ---- label propagation ---------------------------------------------

  test("labelPropagation: path graph spreads min label one hop per round") {
    val path = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("s", "d")
    val l3 = Graphs.labelPropagation(path, "s", "d", iterations = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // after 3 rounds node v holds min id within distance 3: max(1, v-3)
    assert(l3 == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 3L))
    // components stay separate; direction/self-loops/duplicates ignored
    val multi = Seq((2L, 1L), (1L, 2L), (3L, 3L), (9L, 8L)).toDF("s", "d")
    val out = Graphs.labelPropagation(multi, "s", "d", iterations = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // node 3 only has a self-loop -> not in the edge universe
    assert(out == Seq(1L -> 1L, 2L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  // ---- association rules ---------------------------------------------

  test("associationRules: both directions, confidence gate, lift carries") {
    val baskets = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")
    ).toDF("b", "i")
    val out = Baskets.associationRules(baskets, "b", "i",
        minSupport = 2, minConfidence = 0.5)
      .orderBy("antecedent")
      .select("antecedent", "consequent", "n_pair", "n_ante", "confidence", "lift")
      .as[(String, String, Long, Long, Double, Double)].collect().toSeq
    // only (x,y) survives support; conf = 2/3 both ways; lift = 2*4/(3*3)
    val lift = math.floor(2.0 * 4.0 / 9.0 * 1e9 + 0.5) / 1e9
    val conf = math.floor(2.0 / 3.0 * 1e9 + 0.5) / 1e9
    assert(out == Seq(("x", "y", 2L, 3L, conf, lift),
      ("y", "x", 2L, 3L, conf, lift)))
    // a tighter gate drops both directions
    assert(Baskets.associationRules(baskets, "b", "i",
      minSupport = 2, minConfidence = 0.7).count() == 0)
  }

  // ---- calibration / smoothing / intervals ----------------------------

  test("isotonicCalibration: PAV pools violators (minimax hand case)") {
    // bin rates [1.0, 0.0, 0.5] with equal weights pool to 0.5 everywhere
    val d = Seq(
      (0.05, 1.0), (0.06, 1.0),
      (0.15, 0.0), (0.16, 0.0),
      (0.25, 1.0), (0.26, 0.0)
    ).toDF("s", "y")
    val out = Classifier.isotonicCalibration(d, "s", "y", bins = 10)
      .orderBy("bin").select("bin", "n", "rate", "iso_rate")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(out == Seq((0, 2L, 1.0, 0.5), (1, 2L, 0.0, 0.5), (2, 2L, 0.5, 0.5)))
    // already-monotone rates are the identity fit
    val mono = Seq((0.05, 0.0), (0.15, 0.0), (0.15, 1.0), (0.25, 1.0))
      .toDF("s", "y")
    val out2 = Classifier.isotonicCalibration(mono, "s", "y", bins = 10)
      .orderBy("bin").select("rate", "iso_rate")
      .as[(Double, Double)].collect().toSeq
    assert(out2 == Seq((0.0, 0.0), (0.5, 0.5), (1.0, 1.0)))
  }

  test("isotonicCalibration equals a brute-force PAV reference on random data") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((rnd.nextDouble(),
      if (rnd.nextDouble() < 0.5) 1.0 else 0.0))
    val out = Classifier.isotonicCalibration(rows.toDF("s", "y"), "s", "y", 8)
      .orderBy("bin")
      .select("bin", "n", "iso_rate").as[(Int, Long, Double)].collect().toSeq
    // reference: classic stack-based weighted PAV over the same bins
    val bins = rows.filter { case (s, _) => s >= 0 && s <= 1 }
      .groupBy { case (s, _) => math.min(math.floor(s * 8).toInt, 7) }
      .toSeq.sortBy(_._1)
      .map { case (b, vs) => (b, vs.size.toLong, vs.map(_._2).sum) }
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    for ((_, n, sy) <- bins) {
      stack += ((n, sy))
      while (stack.size >= 2 && {
        val (n2, s2) = stack(stack.size - 1); val (n1, s1) = stack(stack.size - 2)
        s1 / n1 >= s2 / n2
      }) {
        val (n2, s2) = stack.remove(stack.size - 1)
        val (n1, s1) = stack.remove(stack.size - 1)
        stack += ((n1 + n2, s1 + s2))
      }
    }
    val ref = scala.collection.mutable.ArrayBuffer[Double]()
    for ((n, sy) <- stack; _ <- 1L to n) ref += sy / n
    // ref is per-ROW; map back to per-bin (each bin's rows share a value)
    val refPerBin = bins.map(_._2).scanLeft(0L)(_ + _).zip(bins)
      .map { case (off, (b, _, _)) => (b, ref(off.toInt)) }
    val got = out.map { case (b, _, iso) => (b, iso) }
    val want = refPerBin.map { case (b, v) =>
      (b, math.floor(v * 1e9 + 0.5) / 1e9) }
    assert(got == want)
    // monotone by construction
    assert(out.map(_._3).sliding(2).forall(p => p.head <= p.last))
  }

  test("holtSmooth: matches the snapped sequential reference; <2 points drop") {
    def snap(x: Double) = math.floor(x / 1e-12 + 0.5) * 1e-12
    val ys = Seq(1.0, 3.0, 2.0, 5.0, 4.0)
    var l = snap(ys(0)); var b = snap(ys(1) - ys(0))
    for (y <- ys.drop(1)) {
      val lNew = snap(0.5 * y + (1.0 - 0.5) * (l + b))
      val bNew = snap(0.3 * (lNew - l) + (1.0 - 0.3) * b)
      l = lNew; b = bNew
    }
    val df = ys.zipWithIndex.map { case (v, i) => (1L, ts(i), v) }
      .toDF("k", "t", "v")
      .unionByName(Seq((2L, ts(0), 9.0)).toDF("k", "t", "v")) // 1 point: drops
    val out = TimeSeries.holtSmooth(df, "k", "t", "v", 0.5, 0.3, 7)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 5L, l, b, snap(l + 7.0 * b))))
  }

  test("seasonalDecompose: pure periodic signal separates exactly") {
    // period 3, constant pattern [10, 20, 30] over 9 steps: interior
    // trend = 20, seasonal = {-10, 0, +10}, resid = 0
    val vals = (0 until 9).map(i => (1L, ts(i), Seq(10.0, 20.0, 30.0)(i % 3)))
    val out = TimeSeries.seasonalDecompose(vals.toDF("k", "t", "v"),
        "k", "t", "v", period = 3)
      .orderBy("t")
      .select("trend", "seasonal", "resid")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    assert(out.head == ((None, Some(-10.0), None)))       // edge: no trend
    assert(out.last == ((None, Some(10.0), None)))
    assert(out.slice(1, 8).zipWithIndex.forall { case ((t, s, r), i) =>
      t == Some(20.0) && r == Some(0.0) &&
        s == Some(Seq(0.0, 10.0, -10.0)(i % 3)) })
  }

  test("seasonalDecompose: even period exercises the 2xMA branch exactly") {
    // period 4 (r14 advice: the even branch — dual offset windows,
    // half-weight endpoints — was never exercised): constant pattern
    // [10, 20, 30, 40] over 12 steps. ANY 4 consecutive values mean to
    // 25, so both offset windows agree and the 2xMA trend is exactly 25
    // wherever both are full (rows 2..9); seasonal = {-15, -5, +5, +15}
    // everywhere (every phase has interior members), resid = 0 interior.
    val pat = Seq(10.0, 20.0, 30.0, 40.0)
    val vals = (0 until 12).map(i => (1L, ts(i), pat(i % 4)))
    val out = TimeSeries.seasonalDecompose(vals.toDF("k", "t", "v"),
        "k", "t", "v", period = 4)
      .orderBy("t")
      .select("trend", "seasonal", "resid")
      .as[(Option[Double], Option[Double], Option[Double])].collect().toSeq
    val season = Seq(-15.0, -5.0, 5.0, 15.0)
    out.zipWithIndex.foreach { case ((t, s, r), i) =>
      assert(s == Some(season(i % 4)), s"seasonal @$i")
      if (i >= 2 && i <= 9) {
        assert(t == Some(25.0), s"trend @$i")
        assert(r == Some(0.0), s"resid @$i")
      } else {
        assert(t.isEmpty && r.isEmpty, s"edge @$i") // honest half-window edge
      }
    }
  }

  test("wilsonInterval: textbook 50/100 bounds; zero-successes stays in [0,1]") {
    val df = (Seq.fill(50)(("g", true)) ++ Seq.fill(50)(("g", false)) ++
      Seq.fill(10)(("h", false))).toDF("g", "ok")
    val out = Classifier.wilsonInterval(df, Seq("g"), col("ok"), z = 1.96)
      .orderBy("g").select("g", "n", "k", "rate", "lo", "hi")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val (nD, p, z2) = (100.0, 0.5, 1.96 * 1.96)
    val denom = 1.0 + z2 / nD
    val center = (p + z2 / (2.0 * nD)) / denom
    val half = 1.96 * math.sqrt(p * (1.0 - p) / nD + z2 / (4.0 * nD * nD)) / denom
    assert(out.head == (("g", 100L, 50L, 0.5, r9(center - half), r9(center + half))))
    val (_, _, _, _, lo, hi) = out(1)
    assert(lo >= 0.0 && hi > 0.0 && hi < 1.0) // Wald would give lo < 0
  }

  test("proportionZTest: pooled z hand case; degenerate pool gives null z") {
    val df = (Seq.fill(60)(("a", true)) ++ Seq.fill(40)(("a", false)) ++
      Seq.fill(50)(("b", true)) ++ Seq.fill(50)(("b", false)))
      .toDF("g", "ok")
    val r = Sketches.proportionZTest(df, col("g") === "a", col("g") === "b",
        col("ok"))
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect().head
    val pool = 110.0 / 200.0
    val zExp = (0.6 - 0.5) / math.sqrt(pool * (1.0 - pool) * (1.0 / 100.0 + 1.0 / 100.0))
    assert(r == ((100L, 60L, 100L, 50L, 0.6, 0.5,
      Some(math.floor(zExp * 1e9 + 0.5) / 1e9))))
    val allTrue = Seq(("a", true), ("b", true)).toDF("g", "ok")
    val r2 = Sketches.proportionZTest(allTrue, col("g") === "a",
        col("g") === "b", col("ok"))
      .select("z").as[Option[Double]].collect().head
    assert(r2.isEmpty) // pool = 1: no variance to test against
  }

  test("recallAtK: hit counting, zero-recall misses, approx-only queries drop") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("qid", "doc")
    val approx = Seq((1L, 10L), (1L, 99L), (1L, 12L), (3L, 30L))
      .toDF("qid", "doc")
    val out = Similarity.recallAtK(approx, exact, "qid", "doc")
      .orderBy("qid").select("qid", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 2.0 / 3.0), (2L, 1L, 0L, 0.0)))
  }

  test("theilSen: one outlier cannot move the median slope; cap raises") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // y = 2x for 6 points + one wild outlier: 15 of 21 pairwise slopes
    // are exactly 2, so the median is 2 (OLS would report ~7)
    val epoch0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    val pts = (0 until 6).map(j => (1L, d(j + 1), 2.0 * (epoch0 + j))) :+
      ((1L, d(7), 2.0 * (epoch0 + 6) + 9000.0))
    val out = TimeSeries.theilSen(pts.toDF("k", "t", "v"), "k", "t", "v")
      .as[(Long, Long, Long, Double, Double)].collect().head
    // residuals: six exact 0.0, one +9000 -> median intercept 0.0
    assert(out == ((1L, 7L, 21L, 2.0, 0.0)))
    val ex = intercept[Exception] {
      TimeSeries.theilSen(pts.toDF("k", "t", "v"), "k", "t", "v",
        maxPoints = 3).collect()
    }
    assert(ex.getMessage.contains("theilSen: a key exceeds"))
  }

  // ---- reporting: cube / period-over-period / SLA percentiles ---------

  test("cubeCounts: all subtotal combinations, grouping_id disambiguates real nulls") {
    val df = Seq(
      (Some("a"), "x", 1.0), (Some("a"), "y", 2.0),
      (Some("b"), "x", 3.0), (None, "x", 4.0)
    ).toDF("d1", "d2", "v")
    val out = Rollups.cubeCounts(df, "d1", "d2", "v")
      .orderBy(col("grouping_id"), col("d1").asc_nulls_first,
        col("d2").asc_nulls_first)
      .select("d1", "d2", "grouping_id", "n", "total")
      .as[(Option[String], Option[String], Int, Long, Double)].collect().toSeq
    // gid 0: the four real cells (incl. the REAL-null d1 cell);
    // gid 1: d2 aggregated away; gid 2: d1 away; gid 3: grand total
    assert(out == Seq(
      (None, Some("x"), 0, 1L, 4.0),
      (Some("a"), Some("x"), 0, 1L, 1.0), (Some("a"), Some("y"), 0, 1L, 2.0),
      (Some("b"), Some("x"), 0, 1L, 3.0),
      (None, None, 1, 1L, 4.0),
      (Some("a"), None, 1, 2L, 3.0), (Some("b"), None, 1, 1L, 3.0),
      (None, Some("x"), 2, 3L, 8.0), (None, Some("y"), 2, 1L, 2.0),
      (None, None, 3, 4L, 10.0)))
  }

  test("periodOverPeriod: monthly totals, deltas, percent change") {
    def d(m: Int, day: Int) = Timestamp.valueOf(f"2024-$m%02d-$day%02d 00:00:00")
    val df = Seq((d(1, 5), 4.0), (d(1, 20), 6.0), (d(2, 1), 20.0),
      (d(3, 9), 15.0)).toDF("t", "v")
    val out = Rollups.periodOverPeriod(df, "t", "v")
      .orderBy("month")
      .select(col("month").cast("string"), col("n"), col("total"),
        col("prev_total"), col("delta"), col("pct_change"))
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 2L, 10.0, None, None, None),
      ("2024-02-01", 1L, 20.0, Some(10.0), Some(10.0), Some(1.0)),
      ("2024-03-01", 1L, 15.0, Some(20.0), Some(-5.0), Some(-0.25))))
  }

  test("groupPercentiles: exact interpolation per group") {
    val df = ((1 to 5).map(i => ("g", i.toDouble)) :+ (("h", 7.0)))
      .toDF("g", "v")
    val out = Rollups.groupPercentiles(df, Seq("g"), "v", Seq(0.5, 0.9, 0.99))
      .orderBy("g").select("g", "n", "p50", "p90", "p99")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // n=5 sorted 1..5: pos = p(n-1): p90 -> 4.6, p99 -> 4.96
    assert(out == Seq(("g", 5L, 3.0, 4.6, 4.96), ("h", 1L, 7.0, 7.0, 7.0)))
  }

  test("zipfFit: synthetic 1/rank corpus fits slope ≈ −1; tiny vocab nulls") {
    // token_i appears round(3000/i) times for i in 1..40 — exact Zipf
    val text = (1 to 40).flatMap(i =>
      Seq.fill(math.round(3000.0 / i).toInt)(s"tok$i")).mkString(" ")
    val out = LmScore.zipfFit(Seq(text).toDF("text"), "text", topK = 40)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(out._1 == 40L)
    assert(out._2.exists(s => s > -1.01 && s < -0.99), s"slope=${out._2}")
    assert(out._4.exists(_ > 0.999), s"r2=${out._4}")
    // two distinct tokens: no line to fit
    val tiny = LmScore.zipfFit(Seq("a a b").toDF("text"), "text", topK = 10)
      .select("slope").as[Option[Double]].collect().head
    assert(tiny.isEmpty)
  }

  test("r14 ops survive empty input (the pcaComponents advice class)") {
    val noEvents = Seq.empty[(Long, Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    val noVals = Seq.empty[(Long, Timestamp, Long, Double)]
      .toDF("k", "t", "eid", "v")
    val noPairs = Seq.empty[(Long, String)].toDF("b", "i")
    val noLabels = Seq.empty[(String, String)].toDF("r1", "r2")
    val noEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(Sequences.firstTouchAttribution(noEvents, "user_id", "ts",
      "event_id", "event_type", "purchase").count() == 0)
    assert(Sequences.positionAttribution(noEvents, "user_id", "ts",
      "event_id", "event_type", "purchase").count() == 0)
    assert(TimeSeries.locfFill(noVals, "k", "t", "eid", "v").count() == 0)
    assert(TimeSeries.resampleDaily(noVals, "k", "t", "eid", "v").count() == 0)
    assert(TimeSeries.holtSmooth(noVals, "k", "t", "v").count() == 0)
    assert(TimeSeries.seasonalDecompose(noVals, "k", "t", "v").count() == 0)
    assert(TimeSeries.theilSen(noVals, "k", "t", "v").count() == 0)
    assert(Graphs.labelPropagation(noEdges, "s", "d").count() == 0)
    assert(Baskets.associationRules(noPairs, "b", "i").count() == 0)
    assert(Rollups.rfmSegments(noVals, "k", "t", "v").count() == 0)
    assert(Rollups.periodOverPeriod(noVals, "t", "v").count() == 0)
    assert(Rollups.groupPercentiles(noVals, Seq("k"), "v", Seq(0.5)).count() == 0)
    assert(Classifier.isotonicCalibration(
      Seq.empty[(Double, Double)].toDF("s", "y"), "s", "y").count() == 0)
    assert(Similarity.recallAtK(noPairs.toDF("qid", "doc"),
      noPairs.toDF("qid", "doc"), "qid", "doc").count() == 0)
    assert(LmScore.zipfFit(Seq.empty[String].toDF("text"), "text")
      .select("slope").as[Option[Double]].collect().forall(_.isEmpty))
    // one-row aggregates return their single (null-guarded) row
    assert(Sketches.mannWhitney(noVals, "v", col("k") === 1, col("k") === 2,
      1.0).count() == 1)
    assert(Sketches.proportionZTest(noVals, col("k") === 1, col("k") === 2,
      col("v") > 0).select("z").as[Option[Double]].collect().head.isEmpty)
    // cohensD honors the same one-row contract on fully-empty input
    // (r14 advice: the groupBy form collapsed to zero rows)
    assert(Sketches.cohensD(noVals, "v", col("k") === 1, col("k") === 2)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head == ((0L, 0L, None, None, None)))
    assert(Classifier.cohensKappa(noLabels, "r1", "r2")
      .select("kappa").as[Option[Double]].collect().head.isEmpty)
    assert(Sketches.bhFdr(Seq.empty[(Long, Double)].toDF("id", "p"),
      "id", "p").count() == 0)
    // Spark's cube over EMPTY input emits no rows at all (not even the
    // () grand total some engines produce) — pin that behavior
    assert(Rollups.cubeCounts(Seq.empty[(String, String, Double)]
      .toDF("d1", "d2", "v"), "d1", "d2", "v").count() == 0)
  }

  test("wilcoxonSignedRank: textbook ranks, tie correction, zero-diff drop") {
    // diffs {+1, -2, +3, +4}: W+ = 1 + 3 + 4 = 8, mu = 5, var = 7.5
    val a = Seq((0.0, 1.0), (0.0, -2.0), (0.0, 3.0), (0.0, 4.0), (5.0, 5.0))
      .toDF("before", "after")
    val r = Sketches.wilcoxonSignedRank(a, "before", "after", grid = 1.0)
      .as[(Long, Option[Double], Option[Double])].collect().head
    val z1 = math.floor(3.0 / math.sqrt(7.5) * 1e9 + 0.5) / 1e9
    assert(r == ((4L, Some(8.0), Some(z1))))
    // ties: diffs {+1, -1, +2} -> |1| avg rank 1.5, W+ = 4.5,
    // var = 3*4*7/24 - (2^3-2)/48 = 3.375
    val b = Seq((0.0, 1.0), (0.0, -1.0), (0.0, 2.0)).toDF("before", "after")
    val r2 = Sketches.wilcoxonSignedRank(b, "before", "after", grid = 1.0)
      .as[(Long, Option[Double], Option[Double])].collect().head
    val z2 = math.floor((4.5 - 3.0) / math.sqrt(3.375) * 1e9 + 0.5) / 1e9
    assert(r2 == ((3L, Some(4.5), Some(z2))))
    // all-zero diffs: nothing to rank
    val c = Seq((1.0, 1.0), (2.0, 2.0)).toDF("before", "after")
    assert(Sketches.wilcoxonSignedRank(c, "before", "after", 1.0)
      .as[(Long, Option[Double], Option[Double])].collect().head ==
      ((0L, None, None)))
  }

  test("cohensD: hand case and degenerate slices") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("g", "v")
    val r = Sketches.cohensD(df, "v", col("g") === "a", col("g") === "b")
      .as[(Long, Long, Double, Double, Option[Double])].collect().head
    // means 2 and 6, pooled var = (2+2)/4 = 1 -> d = -4
    assert(r == ((3L, 3L, 2.0, 6.0, Some(-4.0))))
    val tiny = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    val r2 = Sketches.cohensD(tiny, "v", col("g") === "a", col("g") === "b")
      .select("d").as[Option[Double]].collect().head
    assert(r2.isEmpty) // n_b < 2: no pooled variance
  }

  // ---- RFM -----------------------------------------------------------

  test("rfmSegments: data-anchored recency, exact sums, total-order ntiles") {
    def d(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val orders = Seq(
      (1L, d(1), BigDecimal("10.00")), (1L, d(10), BigDecimal("5.00")),
      (2L, d(2), BigDecimal("100.00")),
      (3L, d(5), BigDecimal("1.00")), (3L, d(6), BigDecimal("1.00")),
      (3L, d(7), BigDecimal("1.00")),
      (4L, d(15), BigDecimal("50.00")),
      (5L, d(3), BigDecimal("20.00"))
    ).toDF("k", "t", "v")
    val out = Rollups.rfmSegments(orders, "k", "t", "v")
      .orderBy("k")
      .select(col("k"), col("recency_days"), col("frequency"),
        col("monetary").cast("double"), col("r"), col("f"), col("m"))
      .as[(Long, Long, Long, Double, Int, Int, Int)].collect().toSeq
    // anchor = 2024-01-15 (the data's own max date)
    // recency: k1=5, k2=13, k3=8, k4=0, k5=12
    // r ntile over recency DESC (worst first): 13,12,8,5,0 -> k2=1,k5=2,k3=3,k1=4,k4=5
    // f over frequency ASC: k2=1(f1),k4=2(f1),k5=3(f1),k1=4(f2),k3=5(f3)
    //   (ties by key: 1-cnt keys are k2,k4,k5 in key order)
    // m over monetary ASC: 3.0(k3)=1, 15.0(k1)=2, 20.0(k5)=3, 50.0(k4)=4, 100.0(k2)=5
    assert(out == Seq(
      (1L, 5L, 2L, 15.0, 4, 4, 2),
      (2L, 13L, 1L, 100.0, 1, 1, 5),
      (3L, 8L, 3L, 3.0, 3, 5, 1),
      (4L, 0L, 1L, 50.0, 5, 2, 4),
      (5L, 12L, 1L, 20.0, 2, 3, 3)))
  }
}
