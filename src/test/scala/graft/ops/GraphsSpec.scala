package graft.ops

import graft.SparkSuite

/** PageRank and degrees ([[Graphs]]): hand-checkable graphs, a local
  * iterative reference on random graphs, dangling-node semantics, and
  * link extraction ([[Html.extractLinks]]) vectors. */
class GraphsSpec extends SparkSuite {
  import spark.implicits._

  test("two-node cycle converges to uniform; ranks sum to 1") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graphs.pageRank(e, "src", "dst", iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9 && math.abs(r(2L) - 0.5) < 1e-9)
  }

  test("random graphs match a local iterative reference") {
    val rnd = new scala.util.Random(23)
    val edges = (0 until 400).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    for (iters <- Seq(1, 3)) {
      val got = Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Double)].collect().toMap
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val nn = nodes.length
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      var r = nodes.map(_ -> 1.0 / nn).toMap
      for (_ <- 1 to iters) {
        val in = edges.groupBy(_._2).view.mapValues(
          _.map(e => r(e._1) / outdeg(e._1)).sum).toMap
        r = nodes.map(v => v -> (0.15 / nn + 0.85 * in.getOrElse(v, 0.0))).toMap
      }
      assert(got.keySet == r.keySet)
      got.foreach { case (v, x) =>
        assert(math.abs(x - r(v)) < 1e-9, s"iters=$iters node=$v got=$x want=${r(v)}")
      }
    }
  }

  test("dangling nodes absorb mass (documented simple-iteration variant)") {
    // 1→2, 2 has no out-edges: after enough iterations total mass < 1
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graphs.pageRank(e, "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(r.values.sum < 1.0)
    assert(r(2L) > r(1L)) // 2 receives, 1 only leaks
  }

  test("degrees fills zeros over the full node universe") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = Graphs.degrees(e, "src", "dst").as[(Long, Long, Long)]
      .collect().toSet
    assert(d == Set((1L, 2L, 0L), (2L, 1L, 1L), (3L, 0L, 2L)))
  }

  test("extractLinks: positions, href parsing, anchor tag-strip, non-matches") {
    val html =
      """<p>intro <a href="https://a.example/x">First <b>bold</b>  link</a>
        |<a name="no-href">not a link</a>
        |<A HREF="/rel path">second</A>
        |<a href='single-quoted'>skipped</a>
        |<a href="">empty</a></p>""".stripMargin
    val out = Html.extractLinks(Seq((7L, html)).toDF("doc_id", "html"),
        "doc_id", "html")
      .as[(Long, Int, String, String)].collect().sortBy(_._2).toSeq
    assert(out == Seq(
      (7L, 0, "https://a.example/x", "First bold link"),
      (7L, 1, "/rel path", "second"),
      (7L, 2, "", "empty")))
  }

  test("extractLinks is map-only; linkless and null docs emit nothing") {
    val d = Seq((1L, Some("<p>no links</p>")), (2L, None)).toDF("doc_id", "html")
    val res = Html.extractLinks(d, "doc_id", "html")
    assert(res.count() == 0)
    assert(!res.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("triangles: K4 has 4 triangles, each node in 3") {
    val k4 = (for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)).toDF("src", "dst")
    val t = Graphs.triangles(k4, "src", "dst").as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: direction, parallel edges, and self-loops collapse; triangle-free is empty") {
    // the same triangle stated three redundant ways + noise
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val t = Graphs.triangles(e, "src", "dst").as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(Graphs.triangles(star, "src", "dst").count() == 0)
  }

  test("triangles match a brute-force reference on random graphs") {
    val rnd = new scala.util.Random(31)
    val edges = (0 until 300).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val got = Graphs.triangles(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for { a <- nodes; b <- nodes if a < b && und((a, b))
          c <- nodes if b < c && und((b, c)) && und((a, c)) } {
      want(a) += 1; want(b) += 1; want(c) += 1
    }
    assert(got == want.toMap)
  }

  test("hits: hub/authority separation on a bipartite pattern") {
    // 1 and 2 point at 3 and 4: 1,2 are pure hubs, 3,4 pure authorities
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val r = Graphs.hits(e, "src", "dst", iterations = 3)
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(r(1L)._2 - 0.5) < 1e-9 && math.abs(r(2L)._2 - 0.5) < 1e-9)
    assert(math.abs(r(3L)._1 - 0.5) < 1e-9 && math.abs(r(4L)._1 - 0.5) < 1e-9)
    assert(r(1L)._1 == 0.0 && r(3L)._2 == 0.0) // no in-edges → no authority
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-9) // L1-normalized
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("personalized pagerank: teleport lands only on seeds") {
    // chain 1→2→3 with seed {1}: rank concentrates near the seed side
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graphs.pageRankPersonalized(e, "src", "dst", seeds, "node", iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.15) < 1e-9) // (1−d)·1/|S| every iteration
    assert(r(2L) > r(3L) && r(3L) > 0)    // mass decays along the chain
  }

  test("personalized pagerank matches a local reference; empty seed set rejected") {
    val rnd = new scala.util.Random(59)
    val edges = (0 until 300).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val seedIds = Seq(3L, 7L, 11L)
    val got = Graphs.pageRankPersonalized(edges.toDF("src", "dst"), "src", "dst",
        seedIds.map(Tuple1(_)).toDF("node"), "node", iterations = 3)
      .as[(Long, Double)].collect().toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    def s(v: Long) = if (seedIds.contains(v)) 1.0 / seedIds.size else 0.0
    var r = nodes.map(v => v -> s(v)).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / outdeg(e._1)).sum).toMap
      r = nodes.map(v => v -> (0.15 * s(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == r.keySet)
    got.foreach { case (v, x) =>
      assert(math.abs(x - r(v)) < 1e-9, s"node=$v got=$x want=${r(v)}") }
    intercept[IllegalArgumentException] {
      Graphs.pageRankPersonalized(edges.toDF("src", "dst"), "src", "dst",
        Seq(Tuple1(999L)).toDF("node"), "node").collect()
    }
  }

  test("hits matches a local iterative reference on random graphs") {
    val rnd = new scala.util.Random(47)
    val edges = (0 until 250).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
    val got = Graphs.hits(edges.toDF("src", "dst"), "src", "dst", iterations = 3)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def snap(x: Double) = math.floor(x / 1e-12 + 0.5) * 1e-12
    def l1(v: Map[Long, Double]) = {
      val s = v.values.sum
      v.view.mapValues(x => if (s > 0) snap(x / s) else 0.0).toMap
    }
    var hub = nodes.map(_ -> snap(1.0 / nodes.size)).toMap
    var auth = hub
    for (_ <- 1 to 3) {
      auth = l1(nodes.map(v => v ->
        edges.collect { case (s, d) if d == v => hub(s) }.sum).toMap)
      hub = l1(nodes.map(v => v ->
        edges.collect { case (s, d) if s == v => auth(d) }.sum).toMap)
    }
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v)._1 - auth(v)) < 1e-9, s"auth($v)")
      assert(math.abs(got(v)._2 - hub(v)) < 1e-9, s"hub($v)")
    }
  }

  test("kCore: dense core survives, pendant chain cascades off") {
    import spark.implicits._
    // K4 (every node degree 3) with a pendant path 4-5-6 hanging off it
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("s", "d")
    val core = Graphs.kCore(edges, "s", "d", k = 3, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // chain peels (deg 1-2); K4 keeps internal degree 3 — node 4 drops
    // its pendant edge from the count
    assert(core == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // cascade: a 5-path at k=2 fully peels within 3 rounds (endpoints
    // first, then the newly-exposed endpoints, then the isolated middle)
    val path = (1L to 5L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("s", "d")
    assert(Graphs.kCore(path, "s", "d", k = 2, rounds = 3).count() == 0)
    // a cycle is its own 2-core: nothing peels, degrees stay 2
    val cycle = ((1L to 5L).sliding(2).map(p => (p(0), p(1))).toSeq :+
      ((5L, 1L))).toDF("s", "d")
    val c2 = Graphs.kCore(cycle, "s", "d", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(c2 == (1L to 5L).map(_ -> 2L).toMap)
    // direction / duplicates / self-loops collapse before peeling
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("s", "d")
    val m2 = Graphs.kCore(messy, "s", "d", k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore/labelPropagation: deep round budgets complete (per-round pin)") {
    import spark.implicits._
    // r14 verdict: both ops reference their evolving frame TWICE per
    // round, so without the per-round pin past PlanPinAfter the plan
    // doubles per round (2^10 = 1024 copies at rounds = 10 — analysis
    // blow-up territory). These runs must both COMPLETE promptly and
    // return the same fixpoint the shallow budgets find.
    // 12-path at k=2: peels two ends per round, empty after 6 rounds —
    // a 10-round budget exercises 7 pinned rounds including no-op ones
    val path12 = (1L to 12L).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("s", "d")
    assert(Graphs.kCore(path12, "s", "d", k = 2, rounds = 10).count() == 0)
    // K4 + pendant at rounds = 10: identical core to the rounds = 3 run
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("s", "d")
    val deep = Graphs.kCore(edges, "s", "d", k = 3, rounds = 10)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(deep == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // 12-path label propagation at 10 rounds: after i rounds each node
    // holds the min id within distance i. Nodes 2..11 are within 10 hops
    // of node 1; node 12 is 11 hops away, so its 10-hop min is node 2.
    val labs = Graphs.labelPropagation(path12, "s", "d", iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert((1L to 11L).forall(labs(_) == 1L) && labs(12L) == 2L)
  }
}
