package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected-components resolution of near-duplicate candidate PAIRS into
  * clusters with a deterministic representative (the component's minimum
  * id). The missing last step of scalable dedup: [[Dedup]]/[[Similarity]]
  * emit pairs, but dropping `id_b` of every pair is greedy and
  * transitively unstable (A~B, B~C, A≁C can drop both B and C). Real
  * 100 TB dedup keeps exactly one member per TRANSITIVE cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * Spark-shaped formulation, converging in O(log² n) rounds on any graph
  * and 1–2 rounds on the shallow clique-like graphs near-dup pairs form
  * (large-star's first round collapses a w-clique straight to a star).
  * Both star operations are expressed as WINDOW minima over the node id —
  * one exchange each, no joins: the per-round plan is two
  * window-partition exchanges + two distincts over edge-sized rows, with
  * no join-strategy cliff (a groupBy+join formulation degrades to
  * sort-merge when checkpointed stats go unknown). Each round
  * materializes via checkpoint to truncate lineage (reliable checkpoint
  * when the session has a checkpoint dir — the cluster deployment path —
  * else a local one).
  *
  * No reference counterpart (`eflglobal/filters` is a record-at-a-time
  * library); mandated by BASELINE.json's dedup scope.
  */
object Clusters {

  /** Map every node appearing in `pairs` to its component representative:
    * `(id, rep)` with `rep` = min id of the connected component. Nodes not
    * in any pair don't appear (callers coalesce to self on a left join).
    * Ids are cast to long; `pairs` may contain duplicates or self-loops.
    *
    * Two execution paths behind one semantics, gated AFTER the first
    * small-star round (whose window exchange doubles as the single
    * evaluation of the upstream pair computation, and whose checkpoint
    * makes the gating count near-free — no extra pass or write on the
    * large-graph path):
    *  - contracted edge sets at or under `localSolveMax` COLLECT to the
    *    driver and solve by sequential union-find — a BOUNDED, size-gated
    *    collect (≤ 16 B/edge; the default cap is ~8 MB), the same class
    *    of driver-side model state as k-means centroids. Iterative jobs
    *    over a graph that fits in one task's memory waste a full
    *    scheduler round per star round; post-exact-dedup near-dup pair
    *    sets are routinely this small even when the corpus is not.
    *  - larger edge sets continue the distributed star loop, unchanged.
    * `localSolveMax = 0` forces the distributed path. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20,
                          localSolveMax: Long = 500000L): DataFrame = {
    // canonical undirected edges: (u, v) with u > v. NOT deduped here: the
    // window minima are duplicate-tolerant and every star round ends in a
    // distinct, so an up-front distinct would only add an exchange over
    // the largest edge set the algorithm ever sees.
    val raw = pairs
      .select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))

    val byU = Window.partitionBy("u")
    // one-pass row doubling: explode emits both directed copies in a
    // single scan of the input, where a self-union would evaluate the
    // (possibly expensive) upstream twice
    def sym(e: DataFrame): DataFrame = e
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

    // large-star: every node connects its LARGER neighbors to the minimum
    // of its neighborhood (incl. itself). No trailing distinct — the
    // round-ending small-star window is duplicate-tolerant and its
    // distinct dedups the round in one exchange.
    def largeStar(e: DataFrame): DataFrame =
      sym(e).withColumn("m", least(col("u"), min(col("v")).over(byU)))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    // small-star: every node connects its smaller neighbors (and itself)
    // to that minimum; input is canonical (u > v) so all neighbors seen
    // here are the small side. Output rows (v, m) and (u, m) emit from
    // one explode pass — the input is evaluated exactly once.
    def smallStar(e: DataFrame): DataFrame = {
      e.withColumn("m", min(col("v")).over(byU))
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // convergence check: (count, order-independent hash-xor) of the edge
    // set — two longs per round, no edge-set except() pass. bit_xor, not
    // sum: ANSI mode (Spark 4 default) makes a hash SUM overflow-throw;
    // xor cannot overflow and is exact on a distinct edge set.
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // SMALL-star opens the run: on the canonical (still asymmetric) pair
    // input it runs over |E| rows where large-star's symmetric view runs
    // over 2|E| — and one small-star pass already collapses the w-cliques
    // near-dup pairs are made of, so every later pass sees a contracted
    // graph. Its window exchange doubles as the single evaluation of the
    // (possibly expensive) upstream pair computation; the checkpoint then
    // pins the result. Alternation order doesn't affect correctness: both
    // operations preserve components, and the fixpoint of the composition
    // is still a union of stars.
    var edges = Checkpoints.pin(smallStar(raw))
    // size gate AFTER the first contraction: the count reads the pinned
    // round (near-free — no extra pass over the upstream, no extra
    // write), and smallStar preserves both components and the node set
    // (every input endpoint survives in some output edge), so union-find
    // over the contracted edges yields the identical mapping
    if (localSolveMax > 0 && edges.df.count() <= localSolveMax)
      return localSolve(edges)
    var sig = signature(edges.df)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = Checkpoints.pin(smallStar(largeStar(edges.df)))
      val nextSig = signature(next.df)
      converged = nextSig == sig
      sig = nextSig
      // the superseded round's reliable checkpoint files are reclaimed NOW
      // (next is materialized; nothing reads the old round again) — without
      // this every round leaks an edge-set-sized file set until the
      // context's cleaner runs, which it does not by default (see
      // [[Checkpoints]]). The FINAL round's files back the returned frame
      // and stay.
      edges.delete()
      edges = next
      it += 1
    }
    // at the fixpoint the edge set is a union of stars: (node, root)
    edges.df.select(col("u").as("id"), col("v").as("rep"))
      .union(edges.df.select(col("v").as("id"), col("v").as("rep")))
      .distinct()
  }

  /** Sequential union-find over the collected (size-gated, first-star
    * contracted) edge set —
    * union-by-min (roots only ever point to smaller ids, so a component's
    * root IS its minimum) with iterative path compression: the exact
    * (id → min-id rep) mapping the distributed fixpoint produces,
    * spec-pinned against it on random graphs. */
  private def localSolve(praw: Checkpoints.Pinned): DataFrame = {
    val spark = praw.df.sparkSession
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrDefault(x, x) != x) x = parent.getOrDefault(x, x)
      // compress the walked path so later finds are O(1) amortized
      var w = x0
      while (parent.getOrDefault(w, w) != x) { val p = parent.getOrDefault(w, w); parent.put(w, x); w = p }
      x
    }
    val edges = praw.df.collect()
    val nodes = new java.util.TreeSet[java.lang.Long]()
    edges.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      nodes.add(u); nodes.add(v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent.put(math.max(ru, rv), math.min(ru, rv))
    }
    praw.delete()
    import scala.jdk.CollectionConverters._
    val reps = nodes.asScala.iterator.map(n => (n.longValue, find(n))).toSeq
    import spark.implicits._
    spark.sparkContext.parallelize(reps, math.max(1, reps.size / 100000))
      .toDF("id", "rep")
  }

  /** Incremental cluster maintenance — fold NEW candidate pairs into an
    * EXISTING `(id, rep)` assignment without recomputing from raw pairs.
    * The daily-ingest companion to [[Dedup.nearDupsAgainstIndex]]: the
    * corpus's clusters are resolved once; each increment contributes its
    * batch-vs-index and batch-vs-batch pairs, and the merged assignment
    * covers every node of a ≥2-member cluster on either side. (Synthetic
    * `id == rep` singleton rows — e.g. from a caller's coalesce-to-self
    * left join — are self-loops and drop, exactly as
    * [[connectedComponents]] drops them from pair input; re-coalesce
    * after merging.)
    *
    * Why this beats recomputing: a stored assignment IS a depth-1 star
    * forest (id → rep edges), so the union graph's components are shallow
    * regardless of how deep the ORIGINAL pair graph was — the star loop
    * (or the size-gated local solve) converges in 1–2 rounds over
    * |assignment| + |newPairs| edges, and the raw historical pair set
    * never re-enters the computation. Representative stability: a cluster
    * untouched by new pairs keeps its min-id rep bit-for-bit; clusters
    * bridged by a new pair adopt the min of their merged membership
    * (spec-pinned equal to full recomputation over the union). */
  def mergeIncremental(assignment: DataFrame, newPairs: DataFrame,
                       idA: String = "id_a", idB: String = "id_b",
                       localSolveMax: Long = 500000L): DataFrame = {
    val asEdges = assignment.select(col("id").cast("long").as("id_a"),
      col("rep").cast("long").as("id_b"))
    val fresh = newPairs.select(col(idA).cast("long").as("id_a"),
      col(idB).cast("long").as("id_b"))
    connectedComponents(asEdges.unionByName(fresh), localSolveMax = localSolveMax)
  }

  /** Cluster-resolved dedup: keep exactly the representative (minimum id)
    * of every transitive near-dup cluster. `pairs` is any candidate-pair
    * frame over ids of `df` (e.g. [[Dedup.minhashNearDups]] output). */
  def dropNearDupClusters(df: DataFrame, pairs: DataFrame, idCol: String,
                          localSolveMax: Long = 500000L): DataFrame = {
    val losers = connectedComponents(pairs, localSolveMax = localSolveMax)
      .filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Cluster-resolved dedup, keep-BEST policy: among each transitive
    * near-dup cluster keep the highest-`scoreCol` member (ties → smallest
    * id) — the RefinedWeb/FineWeb recipe of keeping the longest or
    * highest-quality duplicate, where [[dropNearDupClusters]]' min-id
    * policy keeps an arbitrary-but-stable one. Null scores rank last.
    *
    * Scale: winner selection is ONE map-side-combined `min(struct(-score,
    * id))` per cluster — a cluster with a million members ships one row
    * per partition to the exchange, never a window over the cluster; the
    * survivor filter is an anti-join on the loser ids (pair-bounded, AQE
    * broadcasts a day-sized loser set). Docs in no pair survive untouched. */
  def keepBestInClusters(df: DataFrame, pairs: DataFrame, idCol: String,
                         scoreCol: String,
                         localSolveMax: Long = 500000L): DataFrame = {
    // connectedComponents' min-id union is defined over LONG ids; a
    // silent cast would null non-numeric ids and drop their rows, so
    // fail fast instead (hash string ids to long upstream if needed)
    require({
        import org.apache.spark.sql.types._
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(idCol).dataType)
      },
      s"keepBestInClusters needs an integral id column, got " +
        s"${df.schema(idCol).dataType.simpleString} for '$idCol'")
    val cc = connectedComponents(pairs, localSolveMax = localSolveMax)
    val member = df
      .select(col(idCol).cast("long").as("id"),
        coalesce(-col(scoreCol).cast("double"),
          lit(Double.MaxValue)).as("__neg_score"))
      .join(cc, Seq("id"))
    val winners = member.groupBy(col("rep"))
      .agg(min(struct(col("__neg_score"), col("id"))).as("__w"))
      .select(col("__w.id").as("id"))
    val losers = member.select(col("id"))
      .join(winners, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
