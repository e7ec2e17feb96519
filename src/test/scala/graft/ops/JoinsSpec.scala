package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** As-of and range join semantics ([[Joins]]): backward/forward direction,
  * tolerance gating, equal-timestamp inclusivity, bound inclusivity, and
  * the bin-overlap equivalence against a reference nested-loop join. */
class JoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05"), 100.0),
    (2L, "A", ts("2024-01-01 10:01:00"), 101.0),
    (3L, "B", ts("2024-01-01 10:00:30"), 200.0),
    (4L, "B", ts("2024-01-01 09:59:00"), 201.0), // before any B quote
    (5L, "C", ts("2024-01-01 10:00:00"), 300.0)  // key with no quotes at all
  ).toDF("trade_id", "sym", "t", "px")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 99.5),
    ("A", ts("2024-01-01 10:00:05"), 99.7), // exactly coincident with trade 1
    ("A", ts("2024-01-01 10:00:50"), 99.9),
    ("B", ts("2024-01-01 10:00:00"), 199.5)
  ).toDF("sym", "qt", "bid")

  test("asof backward: latest at-or-before quote per trade; unmatched stay null on left join") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      matchedTimeCol = Some("quote_t"))
      .select("trade_id", "bid", "quote_t")
      .as[(Long, Option[Double], Option[Timestamp])].collect()
      .map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) == (Some(99.7), Some(ts("2024-01-01 10:00:05")))) // coincident counts
    assert(out(2L) == (Some(99.9), Some(ts("2024-01-01 10:00:50"))))
    assert(out(3L) == (Some(199.5), Some(ts("2024-01-01 10:00:00"))))
    assert(out(4L) == (None, None)) // no quote at-or-before
    assert(out(5L) == (None, None)) // key absent from right
  }

  test("asof inner drops unmatched; forward picks earliest at-or-after") {
    val inner = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt", joinType = "inner")
    assert(inner.select("trade_id").as[Long].collect().toSet == Set(1L, 2L, 3L))

    val fwd = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      direction = "forward")
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    assert(fwd(1L).contains(99.7))  // coincident still matches forward
    assert(fwd(2L).isEmpty)         // nothing after 10:01
    assert(fwd(4L).contains(199.5)) // earliest B quote after 09:59
  }

  test("asof tolerance bounds staleness; null left time never matches") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      tolerance = Some(expr("INTERVAL 20 SECONDS")))
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(99.7)) // staleness 0
    assert(out(2L).contains(99.9)) // 10 s back, inside tolerance
    assert(out(3L).isEmpty)        // 30 s back, beyond tolerance

    val nullT = Seq((9L, "A", null.asInstanceOf[Timestamp], 1.0))
      .toDF("trade_id", "sym", "t", "px")
    val got = Joins.asofJoin(nullT, quotes, Seq("sym"), "t", "qt")
      .select("bid").as[Option[Double]].collect()
    assert(got.toSeq == Seq(None))
  }

  test("asof null keys never match (SQL equi-join semantics, not window grouping)") {
    val l = Seq((1L, null.asInstanceOf[String], ts("2024-01-01 10:00:00"), 1.0),
      (2L, "A", ts("2024-01-01 10:00:10"), 2.0))
      .toDF("trade_id", "sym", "t", "px")
    val r = Seq((null.asInstanceOf[String], ts("2024-01-01 09:59:00"), 9.9),
      ("A", ts("2024-01-01 10:00:00"), 1.5))
      .toDF("sym", "qt", "bid")
    val out = Joins.asofJoin(l, r, Seq("sym"), "t", "qt")
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).isEmpty, "null-key left row must not match the null-key right row")
    assert(out(2L).contains(1.5))
  }

  test("rangeJoin raises clearly on a range spanning more bins than the cap") {
    val pts = Seq((1L, 5.0)).toDF("pid", "x")
    val rng = Seq((10L, 0.0, 1e9)).toDF("rid", "lo", "hi") // degenerate outlier
    val ex = intercept[Exception] {
      Joins.rangeJoin(pts, rng, "x", "lo", "hi", binWidth = 1.0,
        maxBinsPerRange = 1000).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("spans more than 1000 bins")),
      s"expected the bin-cap message, got: ${msgs(ex).mkString(" | ")}")
    // same data passes once the bin width makes the range fit the cap
    val ok = Joins.rangeJoin(pts, rng, "x", "lo", "hi", binWidth = 1e7,
      maxBinsPerRange = 1000).select("pid", "rid")
      .as[(Long, Long)].collect().toSet
    assert(ok == Set((1L, 10L)))
  }

  test("asof matches a reference per-row scan on a random corpus") {
    // property pin: union-window asof == the obvious quadratic definition
    val rnd = new scala.util.Random(7)
    val lrows = (0 until 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
    val rrows = (0 until 300).map(j =>
      (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, j.toDouble))
    // uniquify right (key, time) — ties at identical right timestamps are
    // documented as caller-resolved
    val l = lrows.toDF("lid", "k", "lt")
    val r = rrows.toDF("k", "rt", "v")
      .groupBy("k", "rt").agg(max("v").as("v"))
    val got = Joins.asofJoin(l, r, Seq("k"), "lt", "rt")
      .select("lid", "v").as[(Long, Option[Double])].collect().toMap
    val rMap = r.as[(String, Long, Double)].collect().groupBy(_._1)
    val want = lrows.map { case (lid, k, lt) =>
      lid -> rMap.getOrElse(k, Array.empty).filter(_._2 <= lt)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("asof nearest picks the closer side; backward wins ties; tolerance bounds both") {
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      direction = "nearest")
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(99.7)) // coincident: distance 0 both ways → backward
    assert(out(2L).contains(99.9)) // only backward exists (10 s back)
    assert(out(4L).contains(199.5)) // before any B quote → forward match (60 s ahead)
    assert(out(5L).isEmpty)        // key absent entirely
    // trade 3 (10:00:30): backward B quote 30 s back, no forward → backward
    assert(out(3L).contains(199.5))

    // a forward quote closer than the backward one must win
    val l = Seq((9L, "A", ts("2024-01-01 10:00:48"))).toDF("trade_id", "sym", "t")
    val near = Joins.asofJoin(l, quotes, Seq("sym"), "t", "qt",
      direction = "nearest", matchedTimeCol = Some("qt_m"))
      .select("trade_id", "bid", "qt_m")
      .as[(Long, Option[Double], Option[Timestamp])].collect().head
    assert(near._2.contains(99.9), s"expected the 10:00:50 quote (2 s ahead), got $near")

    // tolerance applies per side
    val tol = Joins.asofJoin(l, quotes, Seq("sym"), "t", "qt",
      direction = "nearest", tolerance = Some(expr("INTERVAL 1 SECOND")))
      .select("bid").as[Option[Double]].collect().head
    assert(tol.isEmpty, "both sides beyond a 1 s tolerance must null out")

    // random pin vs quadratic reference
    val rnd = new scala.util.Random(23)
    val lr = (0 until 150).map(i => (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val rr = (0 until 200).map(j => (s"k${rnd.nextInt(5)}", rnd.nextInt(500).toLong, j.toDouble))
    val rdf = rr.toDF("k", "rt", "v").groupBy("k", "rt").agg(max("v").as("v"))
    val got = Joins.asofJoin(lr.toDF("lid", "k", "lt"), rdf, Seq("k"), "lt", "rt",
      direction = "nearest")
      .select("lid", "v").as[(Long, Option[Double])].collect().toMap
    val rMap = rdf.as[(String, Long, Double)].collect().groupBy(_._1)
    val want = lr.map { case (lid, k, lt) =>
      val cands = rMap.getOrElse(k, Array.empty)
      val back = cands.filter(_._2 <= lt).sortBy(_._2).lastOption
      val fwd = cands.filter(_._2 >= lt).sortBy(_._2).headOption
      lid -> ((back, fwd) match {
        case (Some(b), Some(f)) =>
          if (f._2 - lt < lt - b._2) Some(f._3) else Some(b._3)
        case (b, f) => b.orElse(f).map(_._3)
      })
    }.toMap
    assert(got == want)
  }

  test("asof property grid: every direction × tolerance × joinType matches the quadratic reference") {
    val rnd = new scala.util.Random(31)
    val lrows = (0 until 120).map(i => (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(300).toLong))
    val rrows = (0 until 150).map(j => (s"k${rnd.nextInt(5)}", rnd.nextInt(300).toLong, j.toDouble))
    val l = lrows.toDF("lid", "k", "lt")
    val r = rrows.toDF("k", "rt", "v").groupBy("k", "rt").agg(max("v").as("v"))
    val rMap = r.as[(String, Long, Double)].collect().groupBy(_._1)
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(25L));
         jt <- Seq("left", "inner");
         buckets <- Seq(1, 5)) {
      val got = Joins.asofJoin(l, r, Seq("k"), "lt", "rt", direction = dir,
        tolerance = tol.map(t => lit(t)), joinType = jt, timeBuckets = buckets)
        .select("lid", "v").as[(Long, Option[Double])].collect().toMap
      val wantAll = lrows.map { case (lid, k, lt) =>
        val cands = rMap.getOrElse(k, Array.empty)
        val back = cands.filter(c => c._2 <= lt && tol.forall(t => lt - c._2 <= t))
          .sortBy(_._2).lastOption
        val fwd = cands.filter(c => c._2 >= lt && tol.forall(t => c._2 - lt <= t))
          .sortBy(_._2).headOption
        lid -> (dir match {
          case "backward" => back.map(_._3)
          case "forward"  => fwd.map(_._3)
          case _ => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (f._2 - lt < lt - b._2) Some(f._3) else Some(b._3)
            case (b, f) => b.orElse(f).map(_._3)
          }
        })
      }.toMap
      val want = if (jt == "inner") wantAll.filter(_._2.nonEmpty) else wantAll
      assert(got == want, s"dir=$dir tol=$tol joinType=$jt buckets=$buckets diverged")
    }
  }

  test("asof hot-key mode: bucketed carry matches the plain form on a one-key-dominant corpus") {
    // 90% of left rows share one key — the regime timeBuckets exists for.
    // The bucketed result must be IDENTICAL to the single-partition form,
    // including matches carried across bucket boundaries (a right row many
    // buckets back) and left-only buckets (no right row in the bucket).
    val rnd = new scala.util.Random(41)
    val l = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) s"cold${i % 7}" else "hot"
      (i.toLong, k, rnd.nextInt(10000).toLong)
    }.toDF("lid", "k", "lt")
    // sparse right side: only 20 hot quotes over the 10k time range, so
    // most of the ~32 buckets contain left rows but NO right rows and
    // depend entirely on the cross-bucket carry-in
    val r = ((0 until 20).map(j => ("hot", (j * 487).toLong, j.toDouble)) ++
      (0 until 5).map(j => (s"cold${j}", 5000L, 100.0 + j)))
      .toDF("k", "rt", "v").groupBy("k", "rt").agg(max("v").as("v"))
    for (dir <- Seq("backward", "forward", "nearest")) {
      val plain = Joins.asofJoin(l, r, Seq("k"), "lt", "rt", direction = dir)
        .select("lid", "v").as[(Long, Option[Double])].collect().toMap
      val bucketed = Joins.asofJoin(l, r, Seq("k"), "lt", "rt", direction = dir,
        timeBuckets = 32)
        .select("lid", "v").as[(Long, Option[Double])].collect().toMap
      assert(bucketed == plain, s"dir=$dir: bucketed carry diverged from plain")
    }
    // and the hot key's window really is split: the bucketed plan windows
    // on (k, __b), so more than one partition processes key "hot"
    val plan = Joins.asofJoin(l, r, Seq("k"), "lt", "rt", timeBuckets = 32)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__b"), s"expected bucket column in the window spec:\n$plan")
  }

  test("asof hot-key mode works over TIMESTAMP time columns (boundary literals)") {
    // the sampled boundaries are embedded via lit(...) — this pins that a
    // java.sql.Timestamp boundary round-trips (collect → literal →
    // comparison) identically to the unbucketed plain form
    for (dir <- Seq("backward", "nearest")) {
      val plain = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        direction = dir, matchedTimeCol = Some("qt_m"))
        .select("trade_id", "bid", "qt_m").collect().map(_.toSeq).toSet
      val bucketed = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        direction = dir, matchedTimeCol = Some("qt_m"), timeBuckets = 4)
        .select("trade_id", "bid", "qt_m").collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"dir=$dir: timestamp boundaries diverged")
    }
    // tolerance (interval algebra) composes with the bucketed carry
    val tolPlain = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      tolerance = Some(expr("INTERVAL 20 SECONDS")))
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    val tolBucketed = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
      tolerance = Some(expr("INTERVAL 20 SECONDS")), timeBuckets = 4)
      .select("trade_id", "bid").as[(Long, Option[Double])].collect().toMap
    assert(tolBucketed == tolPlain)
  }

  test("asof with a composite key partitions on both columns") {
    val l = Seq((1L, "A", "x", ts("2024-01-01 10:00:00")),
      (2L, "A", "y", ts("2024-01-01 10:00:00")))
      .toDF("lid", "k1", "k2", "t")
    val r = Seq(("A", "x", ts("2024-01-01 09:59:00"), 1.0),
      ("A", "y", ts("2024-01-01 09:58:00"), 2.0))
      .toDF("k1", "k2", "rt", "v")
    val out = Joins.asofJoin(l, r, Seq("k1", "k2"), "t", "rt")
      .select("lid", "v").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0)))
  }

  test("range join: bin-overlap equals nested-loop reference; bounds honor inclusivity") {
    val pts = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 17.5), (5L, 99.0))
      .toDF("pid", "x")
    val rng = Seq((10L, 0.0, 10.0), (11L, 5.0, 6.0), (12L, 9.0, 20.0))
      .toDF("rid", "lo", "hi")
    // [lo, hi): 0→{10}, 5→{10,11}, 10→{12} (10 excluded from [0,10)), 17.5→{12}
    val got = Joins.rangeJoin(pts, rng, "x", "lo", "hi", binWidth = 4.0)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L), (4L, 12L)))
    // inclusive hi picks up the boundary point
    val incl = Joins.rangeJoin(pts, rng, "x", "lo", "hi", binWidth = 4.0,
      hiInclusive = true)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(incl == got + ((3L, 10L)))
  }

  test("range join matches reference across bin widths on a random corpus") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 100)).toDF("pid", "x")
    val rngRows = (0 until 40).map { j =>
      val lo = rnd.nextDouble() * 90
      (j.toLong, lo, lo + rnd.nextDouble() * 15)
    }
    val rng = rngRows.toDF("rid", "lo", "hi")
    val want = pts.as[(Long, Double)].collect().flatMap { case (pid, x) =>
      rngRows.collect { case (rid, lo, hi) if x >= lo && x < hi => (pid, rid) }
    }.toSet
    for (w <- Seq(0.5, 7.0, 1000.0)) { // narrow, typical, one-bin-for-everything
      val got = Joins.rangeJoin(pts, rng, "x", "lo", "hi", binWidth = w)
        .select("pid", "rid").as[(Long, Long)].collect().toSet
      assert(got == want, s"binWidth=$w")
    }
  }

  test("time range join quantizes timestamps without changing membership") {
    val pts = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:30:00")))
      .toDF("pid", "at")
    val rng = Seq((10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:30:00")),
      (11L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:00:00")))
      .toDF("rid", "s", "e")
    val got = Joins.timeRangeJoin(pts, rng, "at", "s", "e", binWidthSeconds = 3600)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 11L)))
  }

  test("intervalJoin: strict half-open overlap, touching endpoints excluded") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 40.0, 40.0))
      .toDF("lid", "ls", "le") // lid 3 is empty → dropped
    val r = Seq((10L, 5.0, 15.0),  // overlaps lid 1
      (11L, 10.0, 20.0),           // touches lid 1 at 10, lid 2 at 20 → neither
      (12L, 25.0, 26.0),           // inside lid 2
      (13L, 39.0, 41.0)).toDF("rid", "rs", "re")
    val got = Joins.intervalJoin(l, r, "ls", "le", "rs", "re", binWidth = 4.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 12L)))
  }

  test("intervalJoin: one row per overlapping pair despite many shared bins") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 100.0)).toDF("lid", "ls", "le")
    val r = Seq((9L, 1.0, 99.0), (8L, 50.0, 200.0)).toDF("rid", "rs", "re")
    // binWidth 2 → dozens of shared bins; each pair must emit exactly once
    val got = Joins.intervalJoin(l, r, "ls", "le", "rs", "re", binWidth = 2.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 8L), (1L, 9L)))
  }

  test("intervalJoin matches a brute-force reference on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val ls = (0 until 80).map { i =>
      val s = rnd.nextInt(500).toDouble; (i.toLong, s, s + 1 + rnd.nextInt(40)) }
    val rs = (0 until 60).map { i =>
      val s = rnd.nextInt(500).toDouble; (i.toLong, s, s + 1 + rnd.nextInt(40)) }
    val got = Joins.intervalJoin(ls.toDF("lid", "ls", "le"),
        rs.toDF("rid", "rs", "re"), "ls", "le", "rs", "re", binWidth = 16.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val want = for { (li, la, lb) <- ls; (ri, ra, rb) <- rs
                     if la < rb && ra < lb } yield (li, ri)
    assert(got.sorted == want.sorted) // sorted ALSO catches duplicate emission
    assert(got.size == got.toSet.size)
  }

  test("intervalJoin: column collisions and bad binWidth are rejected") {
    import spark.implicits._
    val l = Seq((1L, 0.0, 1.0)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(l, l, "s", "e", "s", "e", binWidth = 1.0)
    }
    intercept[IllegalArgumentException] {
      Joins.intervalJoin(l, l.toDF("id2", "s2", "e2"), "s", "e", "s2", "e2", 0.0)
    }
  }
}
