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
}
