package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Degenerate-input hardening for the round-13 operators: empty frames,
  * single rows, all-identical values, series shorter than the lag — the
  * inputs a 100 TB pipeline WILL eventually feed them. Every case must
  * return a well-defined (possibly empty) result or a clear require —
  * never garbage or a crash. */
class R13EdgeSpec extends SparkSuite {
  import spark.implicits._

  test("graph ops: empty and self-loop-only edge lists") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.triangles(empty, "src", "dst").count() == 0)
    assert(Graphs.hits(empty, "src", "dst").count() == 0)
    val selfOnly = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graphs.triangles(selfOnly, "src", "dst").count() == 0)
    // hits over self-loops: every node is its own hub and authority
    val h = Graphs.hits(selfOnly, "src", "dst").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(h.size == 2 && h.values.forall(p => p._1 > 0 && p._2 > 0))
  }

  test("skyline2D: all-identical points all survive; single row survives") {
    val same = (1 to 40).map(i => (i.toLong, 5.0, 7.0)).toDF("id", "x", "y")
    assert(Sketches.skyline2D(same, "x", "y").count() == 40)
    val one = Seq((9L, 1.0, 2.0)).toDF("id", "x", "y")
    assert(Sketches.skyline2D(one, "x", "y").select("id").as[Long].head() == 9L)
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(Sketches.skyline2D(empty, "x", "y").count() == 0)
  }

  test("ksStatistic/mutualInfo: single-row and empty inputs") {
    val one = Seq(("a", 1.0)).toDF("g", "v")
    val ks = Sketches.ksStatistic(one, "v", col("g") === "a", col("g") === "a", 1.0)
      .as[(Long, Long, Double, Double)].head()
    assert(ks._3 == 0.0) // identical single-point CDFs
    val mi = Sketches.mutualInfo(one, "g", "g")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(mi._3 == 0.0 && mi._4.isEmpty) // zero entropy both sides
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Sketches.ksStatistic(empty, "v", lit(true), lit(true), 1.0).count() == 0)
  }

  test("autocorrelation: series shorter than the lag emits no pair rows") {
    val short = Seq(("k", 1, 5.0), ("k", 2, 6.0)).toDF("k", "t", "x")
    val out = TimeSeries.autocorrelation(short, "k", "t", "x", maxLag = 3)
      .as[(String, Int, Long, Option[Double])].collect()
    assert(out.forall(_._3 >= 1)) // only lags with at least one pair appear
    assert(!out.exists(_._2 == 3)) // lag 3 has no pairs in a 2-row series
  }

  test("cusum: single-observation series and missing targets") {
    val one = Seq(("k", 1, 10.0)).toDF("k", "t", "x")
    val tg = Seq(("k", 9.0)).toDF("k", "target")
    val out = TimeSeries.cusum(one, "k", "t", "x", tg, "target", 0.0, 5.0)
      .select("s_pos").as[Double].head()
    assert(out == 1.0) // max(0, 10-9)
    // keys absent from targets drop (inner join) — documented broadcast shape
    val noTg = Seq(("other", 1.0)).toDF("k", "target")
    assert(TimeSeries.cusum(one, "k", "t", "x", noTg, "target", 0.0, 5.0).count() == 0)
  }

  test("kaplanMeier: all-censored cohort emits no event rows") {
    val cens = (1 to 20).map(i => (i.toDouble, 0)).toDF("dur", "ev")
    assert(TimeSeries.kaplanMeier(cens, "dur", "ev").count() == 0)
  }

  test("frequentPairs: singleton baskets yield no pairs; empty input empty") {
    val singles = (1 to 30).map(i => (i.toLong, s"item_$i")).toDF("b", "i")
    assert(Baskets.frequentPairs(singles, "b", "i", 1).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("b", "i")
    assert(Baskets.frequentPairs(empty, "b", "i", 1).count() == 0)
  }

  test("rrfFusion/mmrRerank: empty rankings and empty candidate sets") {
    val e = Seq.empty[(Long, Long, Int)].toDF("qid", "doc_id", "rk")
    assert(Retrieval.rrfFusion(Seq(e, e), "qid", "doc_id").count() == 0)
    val emb = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val noCand = Seq.empty[(Long, Long, Double)].toDF("qid", "doc_id", "rel")
    assert(Similarity.mmrRerank(noCand, "qid", "doc_id", "rel",
      emb, "vec_id", "embedding", 3, 0.5).count() == 0)
  }

  test("cidrLookup/radiusJoin: empty dims leave facts null-enriched or unpaired") {
    val ips = Seq(("10.0.0.1", 1L)).toDF("ip", "tag")
    val noDim = Seq.empty[(String, String)].toDF("cidr", "zone")
    val out = Networks.cidrLookup(ips, "ip", noDim, "cidr")
      .select("tag", "zone").as[(Long, Option[String])].head()
    assert(out == ((1L, None)))
    val pts = Seq((1L, 45.0, 10.0)).toDF("id", "la", "lo")
    val noR = Seq.empty[(Long, Double, Double)].toDF("rid", "ra", "ro")
    assert(Geo.radiusJoin(pts, "la", "lo", noR, "ra", "ro", 100.0).count() == 0)
  }

  test("intervalJoin: disjoint universes and zero-width intervals") {
    val l = Seq((1L, 0.0, 10.0)).toDF("lid", "ls", "le")
    val far = Seq((2L, 1e6, 1e6 + 5)).toDF("rid", "rs", "re")
    assert(Joins.intervalJoin(l, far, "ls", "le", "rs", "re", 8.0).count() == 0)
    val zero = Seq((3L, 5.0, 5.0)).toDF("rid", "rs", "re") // empty interval
    assert(Joins.intervalJoin(l, zero, "ls", "le", "rs", "re", 8.0).count() == 0)
  }

  test("fitOLS2: fewer than three rows is unsolvable, not wrong") {
    val two = Seq((1.0, 2.0, 3.0), (2.0, 3.0, 4.0)).toDF("y", "x1", "x2")
    val r = Classifier.fitOLS2(two, "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    assert(r._1 == 2L && r._2.isEmpty && r._5.isEmpty)
  }
}
