package graft.ops

import graft.SparkSuite

/** Basket co-occurrence mining ([[Baskets.frequentPairs]]): hand-counted
  * supports and lifts, presence semantics (in-basket multiplicity
  * collapses), the minSupport gate, and the oversized-basket hard-fail. */
class BasketsSpec extends SparkSuite {
  import spark.implicits._

  test("frequentPairs: hand-counted supports, lift, canonical pair order") {
    // baskets: 1={a,b,c}, 2={a,b}, 3={a,c}, 4={b} → N=4
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "b")).toDF("basket", "item")
    val out = Baskets.frequentPairs(df, "basket", "item", minSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"))) // (b,c) support 1 filtered
    val ab = out(("a", "b"))
    assert((ab._3, ab._4, ab._5) == ((2L, 3L, 3L)))
    assert(math.abs(ab._6 - math.floor(2.0 * 4 / (3.0 * 3) * 1e9 + 0.5) / 1e9) < 1e-12)
    val ac = out(("a", "c"))
    assert((ac._3, ac._4, ac._5) == ((2L, 3L, 2L)))
    assert(math.abs(ac._6 - math.floor(2.0 * 4 / (3.0 * 2) * 1e9 + 0.5) / 1e9) < 1e-12)
  }

  test("frequentPairs: in-basket multiplicity is presence; nulls drop") {
    val df = Seq((Some(1L), Some("a")), (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("a")), (Some(2L), Some("b")), (None, Some("a")),
      (Some(3L), None)).toDF("basket", "item")
    val out = Baskets.frequentPairs(df, "basket", "item", minSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq(("a", "b", 2L)))
    assert((out.head._4, out.head._5) == ((2L, 2L))) // null-basket row didn't count
  }

  test("frequentPairs: an oversized basket hard-fails the plan") {
    val big = (1 to 30).map(i => (1L, s"i$i")) :+ ((2L, "x")) :+ ((2L, "y"))
    val df = big.toDF("basket", "item")
    val e = intercept[Exception] {
      Baskets.frequentPairs(df, "basket", "item", minSupport = 1,
        maxBasketSize = 10).collect()
    }
    assert(e.getMessage != null)
    // under the cap the same data mines fine
    val ok = Baskets.frequentPairs(df, "basket", "item", minSupport = 1,
      maxBasketSize = 50)
    assert(ok.count() == 30L * 29 / 2 + 1)
  }

  test("frequentPairs matches a brute-force reference on random baskets") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 500).map(_ => (rnd.nextInt(60).toLong, s"it${rnd.nextInt(12)}"))
    val got = Baskets.frequentPairs(rows.toDF("basket", "item"), "basket", "item",
        minSupport = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val presence = rows.distinct
    val byBasket = presence.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemN = presence.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = byBasket.values.toSeq
      .flatMap(s => s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
      .map { case ((a, b), n) => (a, b) -> ((n, itemN(a), itemN(b))) }
    assert(got == want)
  }
}
