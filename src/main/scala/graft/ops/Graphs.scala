package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics (SURVEY.md §2.6 extension): fixed-iteration
  * PageRank over an edge list — the standard crawl-quality prior
  * (seed-quality propagation, spam-mass estimation) computed directly on
  * the [[Html.extractLinks]] → [[Urls.canonicalize]] output.
  *
  * Execution shape (the 100 TB rationale): each iteration is one
  * equi-join of the edge list with the current rank vector on `src`
  * (both sides hash-partitioned; AQE handles skewed hubs) followed by a
  * partial-aggregable `groupBy(dst).sum` — contributions combine
  * map-side, so a page with a billion in-links costs one row per
  * partition in the exchange, not a hot reducer. The rank vector is
  * #nodes rows (never the edge count); out-degrees are computed once.
  * Iteration count is a fixed small constant (crawl priors converge in a
  * handful of rounds); for deep runs, pin the rank frame every few
  * iterations via [[Checkpoints]] to truncate lineage — at the default
  * 3–5 iterations the plain plan is the faster one.
  */
object Graphs {

  /** Rounds of exponential-plan iteration ([[kCore]]/[[labelPropagation]]
    * reference their evolving frame twice per round) tolerated before the
    * loop pins every round: 2^3 = 8 plan copies is cheap to analyze, and
    * at the 3–5 round budgets these ops default to, never pinning at all
    * is the faster plan (the pageRank header rationale). */
  private val PlanPinAfter = 3

  /** Fixed-iteration PageRank. `edges` holds `(srcCol, dstCol)` rows
    * (parallel edges count double — pre-`distinct` if you want simple
    * edges; self-loops count like any edge). Returns `(node, rank)` over
    * the node universe src ∪ dst. Null endpoints drop.
    *
    * Semantics: `r_0 = 1/N`; `r_{i+1}(v) = (1−d)/N + d·Σ_{u→v}
    * r_i(u)/outdeg(u)`. Dangling nodes (no out-edges) ABSORB mass — the
    * total then sums below 1, the documented behavior of the simple
    * iteration (renormalize downstream if a distribution is needed; the
    * RANKING is what the crawl prior uses).
    *
    * `quantum` > 0 snaps every iteration's ranks to that grid (e.g.
    * 1e-12): it makes the float result platform/plan-order deterministic
    * — each iteration starts from identical values everywhere, and
    * sub-grid summation noise (~1e-16 relative) cannot accumulate —
    * at a cost far below rank resolution. 0 disables. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85,
               quantum: Double = 1e-12): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
    // N is ONE scalar (model-state class); everything else stays distributed
    val n = nodes.count()
    def snap(c: org.apache.spark.sql.Column) =
      if (quantum > 0) floor(c / quantum + 0.5) * quantum else c
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val weighted = e.join(outdeg, "__src") // per-edge transition weight 1/deg
    var ranks = nodes.withColumn("rank", snap(lit(1.0 / n)))
    for (_ <- 1 to iterations) {
      val contribs = weighted
        .join(ranks.withColumnRenamed("node", "__src"), "__src")
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          snap(lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Degree profile of an edge list: `(node, out_deg, in_deg)` over the
    * node universe, zeros filled — two partial-aggregable counts and an
    * outer join on the #nodes-row frames. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .filter(col("__src").isNotNull && col("__dst").isNotNull)
    val out = e.groupBy(col("__src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("__dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Personalized PageRank: the [[pageRank]] iteration with teleport mass
    * restricted to a SEED set — the "how close is every page to these
    * trusted/topical seeds" prior (TrustRank-style spam demotion, topical
    * crawl steering, seed-expansion sampling). `r_0 = s`; `r_{i+1}(v) =
    * (1−d)·s(v) + d·Σ_{u→v} r_i(u)/outdeg(u)` where `s(v) = 1/|S|` on
    * seeds and 0 elsewhere. Dangling nodes absorb mass (same documented
    * variant as [[pageRank]]); seeds outside the node universe are
    * ignored; `quantum` snaps every iteration (same determinism
    * rationale). Seeds are a node-ID frame — model-sized relative to the
    * edge list, joined (not broadcast-forced: a seed set CAN be a large
    * slice, AQE decides).
    *
    * Execution shape per iteration = [[pageRank]]: one edge⋈rank hash
    * join + one partial-aggregable sum; the only extra state is the
    * 0/1 seed flag riding the node vector. */
  def pageRankPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iterations: Int = 3, damping: Double = 0.85,
                           quantum: Double = 1e-12): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // same pin rationale as [[hits]]: iterations × joins over one
    // materialization instead of re-derived edge/node lineage
    val e = Checkpoints.pinned(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull))
    val nodes = e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct()
    val seedSet = seeds.select(col(seedCol).as("node"))
      .filter(col("node").isNotNull).distinct()
    val flagged = Checkpoints.pinned(
      nodes.join(seedSet.withColumn("__isSeed", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__isSeed"), lit(false)).as("__isSeed")))
    val nSeeds = flagged.filter(col("__isSeed")).count() // one scalar
    require(nSeeds > 0, "no seed is present in the node universe")
    def snap(c: org.apache.spark.sql.Column) =
      if (quantum > 0) floor(c / quantum + 0.5) * quantum else c
    val teleport = when(col("__isSeed"), snap(lit(1.0 / nSeeds))).otherwise(0.0)
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
    val weighted = e.join(outdeg, "__src")
    var ranks = flagged.withColumn("rank", teleport)
    for (_ <- 1 to iterations) {
      val contribs = weighted
        .join(ranks.select(col("node").as("__src"), col("rank")), "__src")
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = flagged.join(contribs, Seq("node"), "left")
        .select(col("node"), col("__isSeed"),
          snap(lit(1.0 - damping) * when(col("__isSeed"), lit(1.0 / nSeeds)).otherwise(0.0) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Per-node triangle counts over the UNDIRECTED simple graph induced by
    * the edge list (direction dropped, self-loops and parallel edges
    * collapsed). Returns `(node, n_triangles)` for nodes in ≥ 1 triangle —
    * the local-clustering signal (link farms and mirror rings are
    * triangle-dense; genuine editorial link graphs are sparse).
    *
    * Execution shape: the classic degree-ordered wedge join. Each
    * undirected edge is oriented from its lower-(degree, id) endpoint to
    * the higher one, so every triangle is enumerated EXACTLY once as
    * a≺b≺c (wedge a→b, b→c closed by a→c), and — the 100 TB property —
    * the wedge-join fan-out per node is bounded by its ORIENTED
    * out-degree ≤ O(√|E|) on any graph (arboricity bound): the
    * quadratic blow-up a naive src-join suffers on a 10⁸-follower hub
    * never materializes because the hub sits on the RIGHT of the
    * orientation and contributes no wedges. Three hash joins + one
    * partial-aggregable count; no window, no driver state. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    // undirected degree over the simple graph, then the total order
    // (deg, id): orientation by rank keeps wedge fan-out ≤ O(√E)
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    // pinned: the oriented edge list feeds THREE join sides (wedge left,
    // wedge right, closing edge) — one materialization instead of three
    // rebuilds of the distinct + double degree join
    val oriented = Checkpoints.pinned(withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("lo"), col("v").as("hi")))
        .otherwise(struct(col("v").as("lo"), col("u").as("hi"))).as("e"))
      .select(col("e.lo").as("a"), col("e.hi").as("b")))
    // wedges a→b, b→c (a ≠ c by the strict total order) closed by a→c
    val bc = oriented.select(col("a").as("b2"), col("b").as("c"))
    val wedges = oriented.join(bc, col("b") === col("b2")).drop("b2")
    val closing = oriented.select(col("a").as("a3"), col("b").as("c3"))
    val tris = wedges.join(closing,
      col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-round k-core peeling over the undirected simple graph:
    * each round removes every node whose CURRENT degree is below `k`
    * (degrees recompute against survivors only). The surviving set
    * shrinks monotonically toward the true k-core from above and EQUALS
    * it once a round removes nothing — `rounds` bounds the work the way
    * [[labelPropagation]]'s iteration budget does, which is what makes
    * the op affordable on a corpus-scale link graph. Dense cores
    * (mirror rings, link farms, PBN clusters) survive; the long tail of
    * low-degree pages peels off in the first rounds — the density
    * complement of [[triangles]]' local-clustering signal.
    *
    * Execution shape: per round, TWO semi-joins of the (pinned) edge
    * list against the #survivors-row alive set plus one
    * partial-aggregable degree count — hubs combine map-side; nothing
    * driver-sized. Because each round references the PREVIOUS alive set
    * twice, the logical plan would DOUBLE per round (2^rounds — the
    * exponential class, worse than pageRank's linear growth); past
    * [[PlanPinAfter]] rounds the alive frame therefore pins every round
    * ([[Checkpoints]], superseded rounds' files reclaimed immediately —
    * the [[Clusters]] discipline), so deep budgets pay one node-set-sized
    * materialization per round instead of an exponentially-growing
    * analysis. Output: `(node, degree)` for survivors that retain
    * at least one surviving edge, with the degree WITHIN the surviving
    * subgraph (a survivor whose last neighbors all peeled this round
    * drops — it would peel next round anyway). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int = 5): DataFrame = {
    require(k >= 1, s"k must be ≥ 1, got $k")
    require(rounds >= 1, s"rounds must be ≥ 1, got $rounds")
    val und = Checkpoints.pinned(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct())
    def degrees(e: DataFrame): DataFrame = e
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    var alive = degrees(und).filter(col("degree") >= k)
      .select(col("node"))
    var prevPin: Option[Checkpoints.Pinned] = None
    for (r <- 2 to rounds) {
      val live = und
        .join(alive.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(alive.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
      alive = degrees(live).filter(col("degree") >= k).select(col("node"))
      if (r > PlanPinAfter) {
        val next = Checkpoints.pin(alive)
        prevPin.foreach(_.delete()) // superseded: next is materialized
        prevPin = Some(next)
        alive = next.df
      }
    }
    val fin = und
      .join(alive.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
      .join(alive.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
    degrees(fin)
      .join(alive, Seq("node"), "left_semi")
  }

  /** Synchronized min-label propagation over the undirected simple graph —
    * `iterations` rounds of `l(v) ← min(l(v), min_{u∼v} l(u))` from
    * `l₀(v) = v`. After round i every node holds the smallest node id
    * within graph distance i: a fixed-budget COMMUNITY/COMPONENT
    * approximation for corpus-scale link graphs where running connected
    * components to convergence ([[graft.ops.Clusters]] — built for
    * pair-list-sized near-dup graphs, with driver-gated local solve) is
    * not affordable. Deterministic by construction (min is order-free);
    * labels converge monotonically to the true component min-id as
    * iterations grow.
    *
    * Execution shape: per round, ONE equi-join of the symmetric adjacency
    * list with the #nodes-row label vector and a partial-aggregable
    * `min` — a 10⁸-degree hub combines map-side, never a hot reducer; the
    * adjacency list is pinned once and label vectors stay #nodes-sized.
    * Each round reads the previous label vector TWICE (the nbr-min join
    * and the `least` merge), so the logical plan would double per round;
    * past [[PlanPinAfter]] rounds the vector pins every round (superseded
    * pins reclaimed immediately — the [[Clusters]] discipline), keeping
    * deep iteration budgets at one #nodes-row materialization per round
    * instead of a 2^rounds analysis blow-up.
    * Output: `(node, label)`. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1, got $iterations")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val adj = Checkpoints.pinned(
      und.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(und.select(col("v").as("node"), col("u").as("nbr"))))
    val nodes = adj.select(col("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    var prevPin: Option[Checkpoints.Pinned] = None
    for (i <- 1 to iterations) {
      val nbrMin = adj
        .join(labels.select(col("node").as("nbr"), col("label").as("__nl")),
          Seq("nbr"))
        .groupBy(col("node")).agg(min(col("__nl")).as("__nmin"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__nmin"), col("label")))
            .as("label"))
      if (i > PlanPinAfter) {
        val next = Checkpoints.pin(labels)
        prevPin.foreach(_.delete()) // superseded: next is materialized
        prevPin = Some(next)
        labels = next.df
      }
    }
    labels
  }

  /** Fixed-iteration HITS (hubs & authorities) over a directed edge list —
    * the complementary crawl prior to [[pageRank]]: a page can be a weak
    * authority but a strong hub (directory/index pages), and
    * authority-weighted sampling wants both scores.
    *
    * Semantics: `h_0 = a_0 = 1/N`; each iteration computes
    * `a'(v) = Σ_{u→v} h(u)` then L1-normalizes, then
    * `h'(u) = Σ_{u→v} a(v)` and L1-normalizes. L1 (not L2) so the
    * normalizer is a plain sum — exactly mirrorable in SQL without a
    * cross-engine sqrt. `quantum` snaps scores after every normalize
    * (same determinism rationale as [[pageRank]]); parallel edges count
    * double, nodes with no in/out edges hold score 0 after one step.
    *
    * Execution shape: per iteration, two edge⋈vector hash joins and two
    * partial-aggregable sums; the normalizing total is ONE scalar row
    * broadcast back (the established one-row crossJoin pattern). Vectors
    * are #nodes rows; nothing scales with |E| beyond the joins. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 3, quantum: Double = 1e-12): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1, got $iterations")
    // pinned: the edge list feeds 2×iterations joins and the node vector
    // 2×iterations+1 consumers — without the pins every iteration's plan
    // re-derives both from the raw input (extraction regexes included)
    val e = Checkpoints.pinned(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
        .filter(col("__src").isNotNull && col("__dst").isNotNull))
    val nodes = Checkpoints.pinned(e.select(col("__src").as("node"))
      .unionByName(e.select(col("__dst").as("node"))).distinct())
    val n = nodes.count() // one scalar, model-state class
    def snap(c: org.apache.spark.sql.Column) =
      if (quantum > 0) floor(c / quantum + 0.5) * quantum else c
    def l1normalize(v: DataFrame, c: String): DataFrame = {
      val tot = v.agg(sum(col(c)).as("__tot"))
      v.crossJoin(broadcast(tot))
        .select(col("node"),
          snap(when(col("__tot") > 0, col(c) / col("__tot")).otherwise(0.0)).as(c))
    }
    var hub = nodes.withColumn("hub", snap(lit(1.0 / n)))
    var auth = nodes.withColumn("auth", snap(lit(1.0 / n)))
    for (_ <- 1 to iterations) {
      val aRaw = e.join(hub.withColumnRenamed("node", "__src"), "__src")
        .groupBy(col("__dst").as("node")).agg(sum(col("hub")).as("auth"))
      auth = l1normalize(
        nodes.join(aRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth")), "auth")
      val hRaw = e.join(auth.withColumnRenamed("node", "__dst"), "__dst")
        .groupBy(col("__src").as("node")).agg(sum(col("auth")).as("hub"))
      hub = l1normalize(
        nodes.join(hRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")), "hub")
    }
    auth.join(hub, Seq("node"), "full")
      .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth"),
        coalesce(col("hub"), lit(0.0)).as("hub"))
  }
}
