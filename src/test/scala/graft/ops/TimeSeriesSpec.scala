package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Rolling features and EWMA ([[TimeSeries]]): frame semantics against
  * hand computation, and the two-level EWMA scan against the plain
  * sequential recurrence — including tiny block widths that force the
  * cross-block carry path, and extreme alphas that exercise the
  * precision-horizon clamps. */
class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("rollingFeatures: lag/delta/rows-frame/range-frame semantics") {
    val d = Seq(
      (1L, ts(0), 10.0, 1L), (1L, ts(60), 20.0, 2L), (1L, ts(120), 6.0, 3L),
      (1L, ts(4000), 8.0, 4L), // outside the 1h range frame of the first three
      (2L, ts(0), 5.0, 5L)
    ).toDF("k", "t", "v", "id")
    val out = TimeSeries.rollingFeatures(d, "k", "t", "v", "id",
        rowFrame = 2, rangeSeconds = 3600)
      .orderBy("k", "t")
      .select("k", "lag_1", "delta", "roll_avg", "roll_min", "roll_max", "n_range")
      .as[(Long, Option[Double], Option[Double], Double, Double, Double, Long)]
      .collect().toSeq
    assert(out == Seq(
      (1L, None, None, 10.0, 10.0, 10.0, 1L),
      (1L, Some(10.0), Some(10.0), 15.0, 10.0, 20.0, 2L),
      (1L, Some(20.0), Some(-14.0), 13.0, 6.0, 20.0, 3L),
      (1L, Some(6.0), Some(2.0), 7.0, 6.0, 8.0, 1L), // range frame [400,4000] holds only itself
      (2L, None, None, 5.0, 5.0, 5.0, 1L)))
  }

  test("rollingFeatures drops null keys and times") {
    val d = Seq((Option.empty[Long], Some(ts(0)), 1.0, 1L),
      (Some(1L), Option.empty[Timestamp], 2.0, 2L), (Some(1L), Some(ts(0)), 3.0, 3L))
      .toDF("k", "t", "v", "id")
    assert(TimeSeries.rollingFeatures(d, "k", "t", "v", "id").count() == 1)
  }

  test("ewma matches the sequential recurrence on random keys (multi-block)") {
    val rnd = new scala.util.Random(7)
    for ((alpha, blockSize) <- Seq((0.1, 16), (0.35, 7), (0.9, 4), (0.02, 64), (0.999, 8))) {
      val rows = (0 until 4000).map { i =>
        (rnd.nextInt(5).toLong, ts(i.toLong), rnd.nextDouble() * 200 - 100, i.toLong)
      }
      val got = TimeSeries.ewma(rows.toDF("k", "t", "v", "id"), "k", "t", "v", "id",
          alpha, blockSize)
        .select("id", "ewma").as[(Long, Double)].collect().toMap
      // reference: y_0 = x_0; y_t = (1-a) y_{t-1} + a x_t, per key in time order
      val want = rows.groupBy(_._1).values.flatMap { evs =>
        val sorted = evs.sortBy(e => (e._2.getTime, e._4))
        var y = 0.0
        sorted.zipWithIndex.map { case (e, i) =>
          y = if (i == 0) e._3 else (1 - alpha) * y + alpha * e._3
          e._4 -> y
        }
      }.toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, v) =>
        val r = want(id)
        assert(math.abs(v - r) <= 1e-9 * (1 + math.abs(r)),
          s"alpha=$alpha W=$blockSize id=$id got=$v want=$r")
      }
    }
  }

  test("ewma: single-row key is the value itself; null value rows drop") {
    val d = Seq((Some(1L), Some(ts(0)), Some(42.0), 1L),
      (Some(1L), Some(ts(1)), Option.empty[Double], 2L),
      (Some(2L), Option.empty[Timestamp], Some(1.0), 3L))
      .toDF("k", "t", "v", "id")
    val out = TimeSeries.ewma(d, "k", "t", "v", "id", 0.5)
      .select("id", "ewma").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 42.0)))
  }

  test("mergeIntervals: overlap and touch merge, strict gaps split; invalid rows drop") {
    val d = Seq(
      // key 1: [0,10] + [5,20] overlap, [20,30] touches (merges), [31,40] strict gap
      (Some(1L), Some(0L), Some(10L)), (Some(1L), Some(5L), Some(20L)),
      (Some(1L), Some(20L), Some(30L)), (Some(1L), Some(31L), Some(40L)),
      // key 2: containment [0,100] ⊇ [10,20] — running max must carry past
      // the contained interval's smaller end
      (Some(2L), Some(0L), Some(100L)), (Some(2L), Some(10L), Some(20L)),
      (Some(2L), Some(150L), Some(160L)),
      // invalid: null key / null bound / inverted
      (None, Some(0L), Some(1L)), (Some(3L), None, Some(1L)),
      (Some(3L), Some(5L), Some(4L))
    ).toDF("k", "s", "e")
    val out = TimeSeries.mergeIntervals(d, "k", "s", "e")
      .orderBy("k", "island")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 30L, 3L), (1L, 1L, 31L, 40L, 1L),
      (2L, 0L, 0L, 100L, 2L), (2L, 1L, 150L, 160L, 1L)))
  }

  test("mergeIntervals works on timestamp bounds") {
    val d = Seq((1L, ts(0), ts(100)), (1L, ts(50), ts(200)), (1L, ts(300), ts(301)))
      .toDF("k", "s", "e")
    val out = TimeSeries.mergeIntervals(d, "k", "s", "e")
      .orderBy("island").select("s", "e", "n_merged")
      .as[(Timestamp, Timestamp, Long)].collect().toSeq
    assert(out == Seq((ts(0), ts(200), 2L), (ts(300), ts(301), 1L)))
  }

  test("sessionize: strict gap threshold, 0-based ids, ties by tieCol") {
    val d = Seq(
      (1L, ts(0), 1L), (1L, ts(1800), 2L),   // exactly the gap — same session
      (1L, ts(3601), 3L),                     // 1801s after — new session
      (1L, ts(3601), 4L),                     // duplicate second — same session
      (2L, ts(0), 5L)
    ).toDF("k", "t", "id")
    val out = TimeSeries.sessionize(d, "k", "t", "id", gapSeconds = 1800)
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("sessionize drops null keys/times and rejects non-positive gaps") {
    val d = Seq((Option.empty[Long], Some(ts(0)), 1L), (Some(1L), None, 2L),
      (Some(1L), Some(ts(0)), 3L)).toDF("k", "t", "id")
    assert(TimeSeries.sessionize(d, "k", "t", "id", 60).count() == 1)
    intercept[IllegalArgumentException] {
      TimeSeries.sessionize(d, "k", "t", "id", 0)
    }
  }

  test("plan shape: one exchange on the key feeds the rolling frames") {
    val d = Seq((1L, ts(0), 1.0, 1L)).toDF("k", "t", "v", "id")
    val plan = TimeSeries.rollingFeatures(d, "k", "t", "v", "id")
      .queryExecution.executedPlan.toString
    // all three window groups hash-partition on k — Catalyst reuses one
    // exchange; no rowFrame-sized state can appear as extra exchanges
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 2,
      s"expected the key exchange to be reused:\n$plan")
  }

  test("kaplanMeier: textbook worked example with censoring") {
    import spark.implicits._
    // classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at 2, 4, 5
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 0))
      .toDF("dur", "ev")
    val out = TimeSeries.kaplanMeier(df, "dur", "ev")
      .orderBy("t").as[(Double, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((1.0, 5L, 1L), (3.0, 3L, 1L)))
    assert(math.abs(out(0)._4 - 0.8) < 1e-9)            // 4/5
    assert(math.abs(out(1)._4 - 0.8 * (2.0 / 3)) < 1e-9) // 4/5 · 2/3
  }

  test("kaplanMeier: exhausted risk set pins the curve to exactly 0") {
    import spark.implicits._
    val df = Seq((1.0, 1), (1.0, 0), (2.0, 1), (2.0, 1)).toDF("dur", "ev")
    val out = TimeSeries.kaplanMeier(df, "dur", "ev")
      .orderBy("t").as[(Double, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1.0, 4L, 1L, 0.75), (2.0, 2L, 2L, 0.0)))
  }

  test("kaplanMeier matches a local reference on random censored data") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val subjects = (0 until 300).map(_ =>
      ((rnd.nextInt(20) + 1).toDouble, if (rnd.nextBoolean()) 1 else 0))
    val got = TimeSeries.kaplanMeier(subjects.toDF("dur", "ev"), "dur", "ev")
      .orderBy("t").as[(Double, Long, Long, Double)].collect().toSeq
    val times = subjects.filter(_._2 == 1).map(_._1).distinct.sorted
    var s = 1.0
    val want = times.map { t =>
      val nRisk = subjects.count(_._1 >= t).toLong
      val d = subjects.count(x => x._1 == t && x._2 == 1).toLong
      s *= (1.0 - d.toDouble / nRisk)
      (t, nRisk, d, s)
    }
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 1e-7, s"t=${g._1}") }
  }

  test("cusum: prefix-min closed form equals the max(0, S+d) recurrence") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val series = for (k <- Seq("a", "b"); t <- 1 to 60)
      yield (k, t, rnd.nextInt(20).toDouble)
    val targets = Seq(("a", 8.0), ("b", 11.0)).toDF("k", "target")
    val got = TimeSeries.cusum(series.toDF("k", "t", "x"), "k", "t", "x",
        targets, "target", slack = 0.5, threshold = 30.0)
      .select("k", "t", "s_pos", "alarm")
      .as[(String, Int, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (k <- Seq("a", "b")) {
      val tgt = if (k == "a") 8.0 else 11.0
      var s = 0.0
      for ((_, t, x) <- series.filter(_._1 == k).sortBy(_._2)) {
        s = math.max(0.0, s + (x - tgt - 0.5))
        val (sGot, aGot) = got((k, t))
        assert(math.abs(sGot - s) < 1e-6, s"($k,$t): got $sGot want $s")
        assert(aGot == (sGot > 30.0))
      }
    }
  }

  test("cusum: a level shift alarms after the shift, not before") {
    import spark.implicits._
    val series = ((1 to 20).map(t => ("m", t, 10.0)) ++
      (21 to 30).map(t => ("m", t, 16.0))).toDF("k", "t", "x")
    val targets = Seq(("m", 10.0)).toDF("k", "target")
    val out = TimeSeries.cusum(series, "k", "t", "x", targets, "target",
        slack = 1.0, threshold = 20.0)
      .filter(col("alarm")).select("t").as[Int].collect().sorted.toSeq
    // d = +5 per post-shift row: S crosses 20 on the 5th shifted row (t=25)
    assert(out == (25 to 30).toSeq)
  }

  test("autocorrelation: alternating series → acf(1) ≈ −1, acf(2) ≈ +1") {
    import spark.implicits._
    val series = (1 to 40).map(t => ("s", t, if (t % 2 == 0) 5.0 else 1.0))
    val out = TimeSeries.autocorrelation(series.toDF("k", "t", "x"), "k", "t", "x", maxLag = 2)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => r._2 -> r._4.get).toMap
    assert(math.abs(out(1) - (-1.0)) < 1e-6)
    assert(math.abs(out(2) - 1.0) < 1e-6)
  }

  test("autocorrelation matches a local Pearson reference per key and lag") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val series = for (k <- Seq("a", "b"); t <- 1 to 50)
      yield (k, t, rnd.nextInt(100).toDouble)
    val got = TimeSeries.autocorrelation(series.toDF("k", "t", "x"), "k", "t", "x", maxLag = 3)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    for (k <- Seq("a", "b"); l <- 1 to 3) {
      val xs = series.filter(_._1 == k).sortBy(_._2).map(_._3)
      val pairs = xs.drop(l).zip(xs.dropRight(l)) // (x_t, x_{t-l})
      val n = pairs.size.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val want = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val (nGot, aGot) = got((k, l))
      assert(nGot == pairs.size)
      assert(math.abs(aGot.get - want) < 1e-8, s"($k,$l): got $aGot want $want")
    }
  }
}
