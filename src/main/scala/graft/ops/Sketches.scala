package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch/summary aggregates for profiling large tables (SURVEY.md §2.6
  * adjacency): all built on Spark's native sketch aggregates — single
  * aggregation pass, fixed-size state per group, no raw-value shuffle.
  */
object Sketches {

  /** Exact percentiles (single pass, full sort-based state) — use at
    * moderate cardinality or for oracle checks. */
  def percentiles(df: DataFrame, c: String, ps: Seq[Double]): DataFrame =
    df.agg(percentile(col(c), typedLit(ps)).as("percentiles"))

  /** Approximate percentiles with bounded state — the 100 TB path. */
  def approxQuantiles(df: DataFrame, c: String, ps: Seq[Double],
                      relativeError: Double = 0.01): DataFrame =
    df.agg(percentile_approx(col(c), typedLit(ps),
      lit((1.0 / relativeError).toInt)).as("approx_percentiles"))

  /** Heavy hitters per column (support = minimum frequency share). */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols, support)

  /** Count-min sketch of a column, mergeable across partitions/batches. */
  def countMin(df: DataFrame, c: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.agg(count_min_sketch(col(c), lit(eps), lit(confidence), lit(seed)).as("cms"))

  /** Column profile: null rate, distinct estimate, min/max — the standard
    * data-quality summary, one pass. */
  def profile(df: DataFrame, c: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
      approx_count_distinct(col(c)).as("approx_distinct"),
      min(col(c)).as("min"),
      max(col(c)).as("max"))

  /** Per-stratum winsorization: clamp `valueCol` into its stratum's
    * [lo, hi] percentile band — the standard normalization before quality
    * scores from different domains are compared or mixed (a spam-heavy
    * domain's tail must not dominate a global threshold). Bounds are
    * floor-rounded to 6 dp (the cross-engine formula) and broadcast back:
    * one group-sized aggregate + a broadcast hash join, row-preserving.
    * `exact = true` uses the exact sort-based percentile (oracle-able;
    * per-group state is the group's values — fine at moderate group
    * cardinality); `exact = false` switches to `percentile_approx`
    * (bounded state, the 100 TB path — same plan shape, approximate
    * bounds). Rows whose stratum is NULL match the NULL group
    * (null-safe join), so they winsorize within their own band too. */
  def winsorize(df: DataFrame, valueCol: String, byCol: String,
                lo: Double = 0.01, hi: Double = 0.99,
                outCol: String = "", exact: Boolean = true): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi,
      s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val out = if (outCol.isEmpty) valueCol + "_w" else outCol
    def pct(p: Double): Column =
      if (exact) percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(10000))
    val bounds = df.groupBy(col(byCol).as("__g")).agg(
      (floor(pct(lo) * 1e6 + 0.5) / 1e6).as("__lo"),
      (floor(pct(hi) * 1e6 + 0.5) / 1e6).as("__hi"))
    df.join(broadcast(bounds), col(byCol) <=> col("__g"), "left")
      .withColumn(out,
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
  }

  /** Quantile-bucket assignment — the length-curriculum / balanced-
    * batching primitive: adds `bucketCol` ∈ [0, nBuckets) where bucket
    * boundaries are the value column's 1/n, 2/n, … quantiles (1e-6
    * grid-snapped, the [[winsorize]] form). A row's bucket is the count
    * of boundaries strictly below its value — so buckets are
    * approximately equal-sized, monotone in the value, and STABLE: two
    * equal values always land in the same bucket regardless of
    * partitioning (an `ntile` over a global sort gives neither stability
    * nor a scalable plan).
    *
    * Scale: boundaries are one aggregate (n−1 doubles) broadcast back;
    * assignment is a MAP-ONLY fold over the boundary array literal-sized
    * frame — no global sort, no window. `exact = false` swaps
    * `percentile_approx` into the boundary pass (bounded state, the
    * 100 TB path, same plan shape). Null values get a null bucket. */
  def quantileBuckets(df: DataFrame, valueCol: String, nBuckets: Int,
                      bucketCol: String = "bucket",
                      exact: Boolean = true): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    // ONE percentile aggregate over the ARRAY of percentages — nBuckets−1
    // scalar aggregates each rebuild the same full-column buffer (exact)
    // or the same quantile sketch (approx); the array form pays for it
    // once and returns identical boundary values
    val pArr = array(ps.map(lit): _*)
    val pct: Column =
      if (exact) percentile(col(valueCol), pArr)
      else percentile_approx(col(valueCol), pArr, lit(10000))
    val bounds = df.agg(pct.as("__raw"))
      .select(transform(col("__raw"), b => floor(b * 1e6 + 0.5) / 1e6).as("__bs"))
    df.crossJoin(broadcast(bounds))
      .withColumn(bucketCol,
        when(col(valueCol).isNotNull, aggregate(col("__bs"), lit(0),
          (acc, b) => acc + when(col(valueCol).cast("double") > b, 1)
            .otherwise(0))))
      .drop("__bs")
  }

  /** Global row number over `ORDER BY valueCol, idCol` WITHOUT the
    * single-reducer window `row_number().over(Window.orderBy(...))`
    * collapses to: [[quantileBuckets]] splits the value domain into
    * `nBuckets` approximately equal slices (equal values always
    * co-bucket, so bucket order respects value order exactly), bucket
    * sizes roll up in one partial-aggregable exchange, cumulative
    * offsets come from a window over that `nBuckets`-row table (bounded,
    * never the corpus), and the final rank is the broadcast-joined
    * bucket offset plus a row_number whose window partitions BY BUCKET —
    * every reducer sorts ~N/nBuckets rows instead of one reducer sorting
    * N. The result equals the global window bit-for-bit because
    * (value, id) is a total order: `idCol` must be unique and both
    * columns non-null (violating rows drop).
    *
    * Scale: size `nBuckets` ≈ cluster cores so each in-bucket sort fits
    * an executor; `exact = false` uses `percentile_approx` boundaries
    * (bounded state — buckets then balance only approximately, the RANK
    * is still exact). The bucketed frame is pinned internally
    * ([[Checkpoints.pinned]]), so the count/rank passes read ONE
    * materialization — consistent even over a nondeterministic source —
    * and the boundary aggregate runs once. The curriculum-ordering /
    * global-percentile primitive at corpus scale. */
  def globalRank(df: DataFrame, valueCol: String, idCol: String,
                 nBuckets: Int = 64, rankCol: String = "rank",
                 exact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
    // pin ABOVE the bucket assignment: the count and rank passes then
    // read one materialization (consistent even over a nondeterministic
    // source — any monotone boundary set ranks correctly, so bounds
    // drift below the pin is harmless), and the exact-percentile
    // boundary aggregate runs ONCE instead of once per consumer
    val bucketed = Checkpoints.pinned(
      quantileBuckets(rows, valueCol, nBuckets, "__b", exact))
    val counts = bucketed.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
    // nBuckets rows: the one place a single-partition window is FINE
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__n")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    bucketed.join(broadcast(offsets.select(col("__b"), col("__off"))), "__b")
      .withColumn(rankCol, (col("__off") + row_number().over(
        Window.partitionBy(col("__b"))
          .orderBy(col(valueCol), col(idCol)))).cast("long"))
      .drop("__b", "__off")
  }

  /** Gini concentration index of a weight's distribution across keys —
    * the corpus-diversity audit ("is the corpus dominated by a handful of
    * domains?"): 0 = perfectly even, → 1 = all mass on one key. Standard
    * sorted-sequence closed form G = (2·Σ rkᵢ·mᵢ − (n+1)·Σ mᵢ) / (n·Σ mᵢ)
    * with ranks ascending by (mass, key). Scale shape: one partial-agg
    * exchange to the per-key mass table, then ranks via [[globalRank]]
    * (per-bucket windows + an nBuckets-row offset table — NO corpus-scale
    * single-reducer window even at 100M keys), then one aggregate row.
    * The rank-weighted sums run in exact decimal (the order-sensitive
    * part — partitioning-proof); only the fixed-order closed form runs in
    * doubles, floor-rounded on the 1e-9 grid, identically on both
    * engines. Returns one row `(n_keys, total, gini)`; gini null when
    * n < 1 or total ≤ 0. */
  def giniConcentration(df: DataFrame, keyCol: String, weight: Column,
                        nBuckets: Int = 64): DataFrame = {
    // mass accumulates in DECIMAL(38,6), never a long cast: a fractional
    // weight column (double scores) would otherwise truncate silently,
    // skewing both the ranks and the index. Integral weights are exact
    // in either representation, so `total` stays BIGINT for them
    // (bit-identical to the long path); fractional weights emit `total`
    // as DOUBLE instead of lying by truncation.
    val wType = df.select(weight.as("__w")).schema.head.dataType
    val integralW = wType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    val mass = df.groupBy(col(keyCol).as("__k"))
      .agg(sum(weight.cast("decimal(38,6)")).as("__m"))
    val ranked = globalRank(mass, "__m", "__k", nBuckets, "__rk")
    // rank ≤ n_keys fits DECIMAL(12,0); (12,0)×(38,6) keeps scale 6 under
    // Spark's precision-loss rule, so the rank-weighted sum stays exact
    val agg = ranked.agg(
      count(lit(1)).as("__n"),
      sum(col("__m")).as("__s0"),
      sum(col("__rk").cast("decimal(12,0)") * col("__m")).as("__s1"))
    val n = col("__n").cast("double")
    val s0 = col("__s0").cast("double")
    val s1 = col("__s1").cast("double")
    val total = if (integralW) col("__s0").cast("long").as("total")
                else col("__s0").cast("double").as("total")
    agg.select(col("__n").as("n_keys"), total,
      when(col("__n") >= 1 && col("__s0") > 0,
        floor((lit(2.0) * s1 - (n + lit(1.0)) * s0) / (n * s0) * 1e9 + lit(0.5))
          / 1e9).as("gini"))
  }

  /** Head-coverage cut — "which heaviest keys cover fraction `p` of the
    * total mass": aggregates weight per key, ranks keys by descending
    * weight, and keeps the minimal prefix whose cumulative mass reaches
    * `p` (the crossing key included). The domain-allowlist / head-vocab
    * / cache-sizing primitive: "the domains carrying 95 % of the crawl",
    * "the tokens covering 99 % of the corpus".
    *
    * Emits `(keyCol, weight, cum_weight)` for kept keys — `weight` is
    * the key's mass and `cum_weight` the running total through it, both
    * DECIMAL: all mass arithmetic runs in decimal so addition order can
    * never perturb the cut (float running sums differ between partial
    * -agg grouping orders; integer/decimal weights are exact, double
    * weights inherit 1e-6 grid semantics from the cast).
    *
    * Scale: the per-key aggregate is one partial-aggregable exchange;
    * the global descending running sum then reuses the [[globalRank]]
    * decomposition — per-key mass quantile-buckets, bucket masses roll
    * up to an `nBuckets`-row table whose offsets come from a bounded
    * window, and each per-bucket running-sum window sorts ~K/nBuckets
    * keys. No corpus-scale single-reducer window anywhere; the per-key
    * mass table (not the corpus) is pinned internally so every pass
    * reads one consistent materialization. */
  def coverageCut(df: DataFrame, keyCol: String, p: Double,
                  weightCol: Option[String] = None, nBuckets: Int = 32,
                  exact: Boolean = true): DataFrame = {
    require(p > 0.0 && p <= 1.0, s"p must be in (0, 1], got $p")
    val mass = weightCol.map(c => sum(col(c))).getOrElse(count(lit(1)))
    // pin the per-key mass table (NOT the corpus — one scan builds it):
    // quantile boundaries, bucket sums, and the final walk all re-read
    // it, and pinning makes those reads consistent even over a
    // nondeterministic source
    val kw = Checkpoints.pinned(df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(mass.cast("decimal(38,6)").as("__w"))
      .filter(col("__w").isNotNull))
    val tot = kw.agg(sum(col("__w")).as("__tot"))
    descendingCumSum(kw, "__w", "__k", "__w", "cum_weight", nBuckets, exact)
      .crossJoin(broadcast(tot))
      // keep while the mass BEFORE this key is still under p·total —
      // the crossing key is kept, everything after drops
      .filter((col("cum_weight") - col("__w")).cast("double") <
        lit(p) * col("__tot").cast("double"))
      .select(col("__k").as(keyCol), col("__w").as("weight"),
        col("cum_weight"))
  }

  /** Budget-constrained selection — "take the BEST documents until the
    * token budget is spent": walks rows in `(scoreCol DESC, idCol ASC)`
    * order accumulating `costCol`, keeping every row whose cumulative
    * cost BEFORE it is still under `budget` (the crossing row is kept,
    * everything after drops). The greedy corpus-selection primitive:
    * quality-ranked documents until 1 T tokens, freshest snapshots until
    * the storage cap.
    *
    * Emits the input columns plus `cum_cost` (DECIMAL — the same
    * addition-order-free mass arithmetic as [[coverageCut]], so the kept
    * set is identical under any partitioning). `idCol` must be unique
    * and all three columns non-null (violating rows drop).
    *
    * Scale: the [[globalRank]] decomposition over the score column —
    * score quantile-buckets, an nBuckets-row offsets window, per-bucket
    * running-sum windows of ~N/nBuckets rows; the bucketed frame is
    * pinned so the bucket-sum/walk passes read one materialization. No
    * global sort, no corpus-scale window. */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
                     costCol: String, budget: Double, nBuckets: Int = 32,
                     exact: Boolean = true): DataFrame = {
    require(budget > 0.0, s"budget must be positive, got $budget")
    // descendingCumSum pins its bucketed frame — the walk's consumers
    // read one materialization; no second pin of the raw slice needed
    val rows = df
      .filter(col(idCol).isNotNull && col(scoreCol).isNotNull &&
        col(costCol).isNotNull)
      .withColumn("__cost", col(costCol).cast("decimal(38,6)"))
    descendingCumSum(rows, scoreCol, idCol, "__cost", "cum_cost",
        nBuckets, exact)
      .filter((col("cum_cost") - col("__cost")).cast("double") < budget)
      .drop("__cost")
  }

  /** Per-stratum [[selectByBudget]] — the same greedy walk run
    * independently inside every `groupCol` value (per-language token
    * caps, per-source storage quotas). Here a window PARTITIONED BY the
    * stratum is the right plan at any corpus size: each group sorts only
    * its own rows, and groups spread across reducers. The bucketed
    * decomposition is for the opposite regime (ONE global walk); a
    * corpus where a single stratum IS the corpus should slice and run
    * [[selectByBudget]] instead. Same decimal-mass determinism, same
    * crossing-row rule, same null-drop contract (plus non-null group). */
  def selectByBudgetPerGroup(df: DataFrame, groupCol: String, idCol: String,
                             scoreCol: String, costCol: String,
                             budget: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0.0, s"budget must be positive, got $budget")
    df.filter(col(groupCol).isNotNull && col(idCol).isNotNull &&
        col(scoreCol).isNotNull && col(costCol).isNotNull)
      .withColumn("__cost", col(costCol).cast("decimal(38,6)"))
      .withColumn("cum_cost", sum(col("__cost")).over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, 0)).cast("decimal(38,6)"))
      .filter((col("cum_cost") - col("__cost")).cast("double") < budget)
      .drop("__cost")
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE
    * partial-aggregable pass — the feature-redundancy / signal-audit
    * profile ("are these two quality scores measuring the same thing").
    * Emits `(col_x, col_y, n, corr)` for every i ≤ j pair with
    * PAIRWISE-complete semantics (n counts rows where both are
    * non-null, matching SQL `corr`); `corr` is null when n < 2 or
    * either variance is 0.
    *
    * Determinism: the five moment sums (Σx, Σy, Σxy, Σx², Σy²) run in
    * DECIMAL on values grid-snapped to 1e-6 (`DECIMAL(18,6)` — inputs
    * must fit 12 integer digits), so partial-agg addition order cannot
    * move them; the closed-form corr is then fixed double arithmetic
    * over exact components, floor-rounded at 1e-9 — bit-identical on
    * any partitioning and exactly mirrorable in a second engine
    * (`q_corr_matrix`). A float covariance accumulator has neither
    * property. k(k+1)/2 pairs × 6 sums ride ONE exchange as a single
    * aggregate row; nothing scales with corpus size after the scan. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    def dcol(c: String) = col(c).cast("decimal(18,6)")
    val aggs = pairs.flatMap { case (i, j) =>
      val x = dcol(cols(i)); val y = dcol(cols(j))
      val both = col(cols(i)).isNotNull && col(cols(j)).isNotNull
      Seq(
        sum(when(both, lit(1L))).as(s"n_${i}_$j"),
        sum(when(both, x)).as(s"sx_${i}_$j"),
        sum(when(both, y)).as(s"sy_${i}_$j"),
        sum(when(both, x * y)).as(s"sxy_${i}_$j"),
        sum(when(both, x * x)).as(s"sxx_${i}_$j"),
        sum(when(both, y * y)).as(s"syy_${i}_$j"))
    }
    val pairStructs = pairs.map { case (i, j) =>
      val n = coalesce(col(s"n_${i}_$j"), lit(0L)).cast("double")
      def d(p: String) = col(s"${p}_${i}_$j").cast("double")
      // moments stay nullable (no coalesce-to-0): a decimal sum that
      // overflows nulls only SOME moments, and a zero substituted there
      // would yield a silently wrong corr — emit null instead. n = 0
      // legitimately nulls every sum, which the n >= 2 guard absorbs.
      val allPresent = Seq("sx", "sy", "sxy", "sxx", "syy")
        .map(p => col(s"${p}_${i}_$j").isNotNull).reduce(_ && _)
      val num = n * d("sxy") - d("sx") * d("sy")
      val denx = n * d("sxx") - d("sx") * d("sx")
      val deny = n * d("syy") - d("sy") * d("sy")
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        coalesce(col(s"n_${i}_$j"), lit(0L)).as("n"),
        when(n >= 2 && allPresent && denx > 0 && deny > 0,
          floor(num / sqrt(denx * deny) * 1e9 + lit(0.5)) / 1e9).as("corr"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairStructs: _*)).as("p"))
      .select("p.*")
  }

  /** [[correlationMatrix]] under LISTWISE deletion (complete-rows
    * correlation, the other standard missing-data mode): rows with a null
    * in ANY of `cols` drop once up front, so every pair shares the same
    * row set and the per-column moments (sum, sum-of-squares) are shared
    * across pairs instead of recomputed per pair. k columns cost
    * 1 + 2k + k(k−1)/2 un-branched decimal aggregates where the pairwise
    * form pays 6·k(k+1)/2 branch-guarded ones — 4× fewer at k=4, and the
    * hot map-side loop loses its per-value CASE. Identical output schema,
    * grid, and closed-form double arithmetic; on null-free data the two
    * forms return bit-identical matrices. Same scale shape: one exchange
    * carrying ONE aggregate row. */
  def correlationMatrixComplete(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got ${cols.size}")
    val dense = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    def dcol(c: String) = col(c).cast("decimal(18,6)")
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.indices.flatMap { i =>
        Seq(sum(dcol(cols(i))).as(s"s_$i"),
          sum(dcol(cols(i)) * dcol(cols(i))).as(s"ss_$i")) } ++
      pairs.collect { case (i, j) if i != j =>
        sum(dcol(cols(i)) * dcol(cols(j))).as(s"sxy_${i}_$j") }
    val pairStructs = pairs.map { case (i, j) =>
      val n = coalesce(col("n"), lit(0L)).cast("double")
      def d(c: String) = col(c).cast("double")
      // same null-moment discipline as correlationMatrix: a partial
      // decimal-overflow null must surface as null corr, not a 0.0 moment
      val needed = Seq(s"s_$i", s"ss_$i", s"s_$j", s"ss_$j") ++
        (if (i == j) Nil else Seq(s"sxy_${i}_$j"))
      val allPresent = needed.map(col(_).isNotNull).reduce(_ && _)
      val sxy = if (i == j) d(s"ss_$i") else d(s"sxy_${i}_$j")
      val num = n * sxy - d(s"s_$i") * d(s"s_$j")
      val denx = n * d(s"ss_$i") - d(s"s_$i") * d(s"s_$i")
      val deny = n * d(s"ss_$j") - d(s"s_$j") * d(s"s_$j")
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        coalesce(col("n"), lit(0L)).as("n"),
        when(n >= 2 && allPresent && denx > 0 && deny > 0,
          floor(num / sqrt(denx * deny) * 1e9 + lit(0.5)) / 1e9).as("corr"))
    }
    dense.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(pairStructs: _*)).as("p"))
      .select("p.*")
  }

  /** Shared decomposition behind [[coverageCut]] and [[selectByBudget]]:
    * adds `cumCol` = running sum of `weightCol` (decimal) over the total
    * order `(orderCol DESC, tieCol ASC)` WITHOUT a global window —
    * quantile buckets on `orderCol` (equal values co-bucket, so bucket
    * order respects the walk), bucket sums to an nBuckets-row table,
    * offsets from a bounded window over it, per-bucket running-sum
    * windows for the rest. */
  private def descendingCumSum(df: DataFrame, orderCol: String,
      tieCol: String, weightCol: String, cumCol: String,
      nBuckets: Int, exact: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pinned for the globalRank reason: one materialization feeds the
    // bucket-sum and walk passes, boundaries compute once
    val bucketed = Checkpoints.pinned(
      quantileBuckets(df, orderCol, nBuckets, "__b", exact))
    val bsums = bucketed.groupBy(col("__b")).agg(sum(col(weightCol)).as("__bw"))
    val offs = bsums.withColumn("__off", coalesce(
      sum(col("__bw")).over(Window.orderBy(col("__b").desc)
        .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0).cast("decimal(38,6)")))
    bucketed.join(broadcast(offs.select(col("__b"), col("__off"))), "__b")
      .withColumn("__run", sum(col(weightCol)).over(
        Window.partitionBy(col("__b"))
          .orderBy(col(orderCol).desc, col(tieCol))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn(cumCol, (col("__off") + col("__run")).cast("decimal(38,6)"))
      .drop("__b", "__off", "__run")
  }

  // ------------------------------------------------ KMV theta sketches
  //
  // HLL answers "how many distinct"; the KMV/theta family additionally
  // answers UNION / INTERSECTION / JACCARD between corpora (train-test
  // overlap, snapshot drift) from two tiny mergeable sketches — no key
  // ever re-shuffles. Build with [[kmv]] (map-side partial k-min trees,
  // ≤ k longs per partial over the exchange — see
  // `expressions.KmvSketchAgg`), then combine sketch ARRAYS with the pure
  // Column algebra below. Values are stored sign-flipped (signed order ==
  // unsigned hash order); `2^63 ≈ 9.223372036854776e18` converts a stored
  // value back to an unsigned fraction of the hash space.

  /** KMV sketch aggregate of `xxhash64(c)`: sorted `array<long>` of the k
    * smallest distinct (sign-flipped) hashes. EXACT while the input has
    * < k distinct values. */
  def kmv(c: Column, k: Int = 4096): Column =
    graft.expressions.native.kmvSketch(xxhash64(c), k)

  /** Unsigned-order cutoff of a sketch: the k-th value when full, +∞
    * (Long.MaxValue) when the sketch still holds every distinct hash. */
  private def kmvCutoff(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(Long.MaxValue)).otherwise(element_at(sk, k))

  /** Cutoff → fraction of the 64-bit hash space below it (theta). */
  private def thetaFrac(cut: Column): Column =
    when(cut === Long.MaxValue, lit(1.0))
      .otherwise((cut.cast("double") + 9.223372036854775808e18) / 1.8446744073709551616e19)

  /** Distinct-cardinality estimate from one sketch: exact size when not
    * full, else the classic (k-1)/theta estimator. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / thetaFrac(element_at(sk, k)))

  /** Union of two sketches built with the same k (valid KMV sketch of the
    * union stream): merge, dedup, keep the k smallest. */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Number of common retained hashes below both cutoffs — the theta
    * intersection's sample count. Exact |A ∩ B| while both sketches are
    * not full. */
  def kmvIntersectCount(a: Column, b: Column, k: Int): Column = {
    val cut = least(kmvCutoff(a, k), kmvCutoff(b, k))
    size(filter(array_intersect(a, b), h => h < cut)).cast("long")
  }

  /** Theta-intersection cardinality estimate: common-below-cutoff count
    * scaled by the shared theta. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val cut = least(kmvCutoff(a, k), kmvCutoff(b, k))
    size(filter(array_intersect(a, b), h => h < cut)).cast("double") / thetaFrac(cut)
  }

  /** Per-stratum median imputation: fill null `valueCol` with the
    * stratum's median over its NON-null values (floor-rounded to 6 dp,
    * the cross-engine formula) — the standard numeric-feature repair
    * before training. One group-sized percentile aggregate broadcast
    * back, row-preserving; `exact = false` swaps `percentile_approx`
    * in (bounded state, the 100 TB path, identical plan shape). A
    * stratum with no non-null values (including the null stratum, which
    * imputes within its own band) leaves its nulls in place — impute
    * from a coarser stratum or a constant upstream. */
  def imputeMedian(df: DataFrame, valueCol: String, byCol: String,
                   outCol: String = "", exact: Boolean = true): DataFrame = {
    val out = if (outCol.isEmpty) valueCol + "_filled" else outCol
    val v = col(valueCol).cast("double")
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000))
    val medians = df.filter(v.isNotNull)
      .groupBy(col(byCol).as("__g"))
      .agg((floor(med(v) * 1e6 + 0.5) / 1e6).as("__med"))
    df.join(broadcast(medians), col(byCol) <=> col("__g"), "left")
      .withColumn(out, coalesce(v, col("__med")))
      .drop("__g", "__med")
  }

  /** Robust per-stratum outlier score: the modified z-score
    * `0.6745·(x − median) / MAD` (Iglewicz & Hoaglin 1993 — the
    * median/MAD form that a handful of corrupted documents cannot drag
    * the way they drag a mean/stddev z-score). Appends `<valueCol>_rz`
    * and a boolean `<valueCol>_outlier` at the standard |rz| > threshold
    * (3.5). Two group-sized aggregates (median, then MAD of the residual)
    * broadcast back — row-preserving, no corpus re-shuffle; `exact =
    * false` swaps `percentile_approx` into both passes (bounded state,
    * the 100 TB path, identical plan shape). A stratum with MAD = 0
    * (over half its values identical) yields null scores and `false`
    * flags — the documented degenerate case (fall back to a coarser
    * stratum or a different signal). Medians and scores are
    * floor-rounded to 6 dp, the library's cross-engine formula. */
  def madOutliers(df: DataFrame, valueCol: String, byCol: String,
                  threshold: Double = 3.5, exact: Boolean = true): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    def med(c: Column): Column =
      if (exact) percentile(c, lit(0.5))
      else percentile_approx(c, lit(0.5), lit(10000))
    def r6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val v = col(valueCol).cast("double")
    val medians = df.filter(v.isNotNull)
      .groupBy(col(byCol).as("__g")).agg(r6(med(v)).as("__med"))
    val withMed = df.join(broadcast(medians), col(byCol) <=> col("__g"), "left")
    val mads = withMed.filter(v.isNotNull)
      .groupBy(col("__g").as("__g2"))
      .agg(r6(med(abs(v - col("__med")))).as("__mad"))
    val rz = r6(lit(0.6745) * (v - col("__med")) / col("__mad"))
    withMed.join(broadcast(mads), col("__g") <=> col("__g2"), "left")
      .withColumn(valueCol + "_rz", when(col("__mad") > 0, rz))
      .withColumn(valueCol + "_outlier",
        coalesce(abs(col(valueCol + "_rz")) > threshold, lit(false)))
      .drop("__g", "__g2", "__med", "__mad")
  }

  /** One side of [[profileDrift]]: per-column `(column, dtype, n_rows,
    * n_null, n_distinct, min_num, max_num)` in ONE aggregation pass over
    * the frame (numeric min/max as doubles; null for non-numerics — no
    * engine-sensitive value-to-string formatting anywhere). `exact`
    * toggles `count(distinct)` (oracle-able; plans an Expand) vs
    * `approx_count_distinct` (single-pass HLL, the corpus-scale path —
    * same output schema). The reshape to per-column rows explodes a
    * one-row frame: driver-free, trivially sized. */
  def profileAll(df: DataFrame, exact: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val fields = df.schema.fields
    def isNum(f: org.apache.spark.sql.types.StructField) =
      f.dataType.isInstanceOf[NumericType]
    // aliases index by POSITION, not by embedding f.name: a source
    // column named "a.b" (legal in parquet) would make a name-derived
    // alias unresolvable without backtick discipline at every reference
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      val c = col(s"`${f.name}`")
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nn_$i"),
        (if (exact) count_distinct(c)
         else approx_count_distinct(c)).as(s"__nd_$i")) ++
      (if (isNum(f))
        Seq(min(c.cast("double")).as(s"__mn_$i"),
            max(c.cast("double")).as(s"__mx_$i"))
       else Nil)
    }
    val prof = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val entries = array(fields.zipWithIndex.map { case (f, i) =>
      struct(lit(f.name).as("column"),
        lit(f.dataType.simpleString).as("dtype"),
        coalesce(col(s"__nn_$i"), lit(0L)).as("n_null"),
        coalesce(col(s"__nd_$i"), lit(0L)).as("n_distinct"),
        (if (isNum(f)) col(s"__mn_$i")
         else lit(null).cast("double")).as("min_num"),
        (if (isNum(f)) col(s"__mx_$i")
         else lit(null).cast("double")).as("max_num"))
    }.toSeq: _*)
    prof.select(col("__n").as("n_rows"), explode(entries).as("m"))
      .select(col("m.column").as("column"), col("m.dtype").as("dtype"),
        col("n_rows"), col("m.n_null").as("n_null"),
        col("m.n_distinct").as("n_distinct"),
        col("m.min_num").as("min_num"), col("m.max_num").as("max_num"))
  }

  /** Snapshot-to-snapshot profile drift — the data-contract check a
    * pipeline runs between yesterday's and today's version of a table
    * before publishing (the Deequ/Great-Expectations "anomaly on
    * metrics" shape, stated as one declarative report).
    *
    * Schema diff (added / removed / type_changed / common) comes from
    * the frames' StructTypes — metadata, no scan. Distribution metrics
    * come from one [[profileAll]] pass per side, full-outer-joined per
    * column (column-count-sized frames). `drifted` flags a column when
    *  - its status isn't `common`, or
    *  - |null-rate delta| (1e-6 floor grid — the cross-engine formula)
    *    exceeds `nullRateTol`, or
    *  - the distinct-count ratio exceeds `distinctRatioTol` (one side
    *    zero and the other not counts as drift).
    * Numeric min/max before/after ride along as informational doubles
    * (range drift is usually legitimate growth — flag policy belongs to
    * the caller).
    *
    * Scale: two single-pass aggregates (with `exact = false`, both
    * HLL-based and Expand-free) + a column-count-sized join. */
  def profileDrift(before: DataFrame, after: DataFrame,
                   nullRateTol: Double = 0.01,
                   distinctRatioTol: Double = 2.0,
                   exact: Boolean = false): DataFrame = {
    val pb = profileAll(before, exact)
    val pa = profileAll(after, exact)
    def side(p: DataFrame, suffix: String): DataFrame =
      p.select(col("column"),
        col("dtype").as(s"type_$suffix"), col("n_rows").as(s"n_$suffix"),
        col("n_null").as(s"n_null_$suffix"),
        col("n_distinct").as(s"distinct_$suffix"),
        col("min_num").as(s"min_$suffix"), col("max_num").as(s"max_$suffix"))
    val j = side(pb, "before").join(side(pa, "after"), Seq("column"), "full_outer")
    val status = when(col("type_before").isNull, lit("added"))
      .when(col("type_after").isNull, lit("removed"))
      .when(col("type_before") =!= col("type_after"), lit("type_changed"))
      .otherwise(lit("common"))
    def rate(nn: Column, n: Column): Column =
      when(n === 0, 0.0).otherwise(nn.cast("double") / n.cast("double"))
    val delta = when(col("type_before").isNotNull && col("type_after").isNotNull,
      floor((rate(col("n_null_after"), col("n_after")) -
        rate(col("n_null_before"), col("n_before"))) * 1e6 + lit(0.5)) / 1e6)
    val lo = least(col("distinct_before"), col("distinct_after"))
    val hi = greatest(col("distinct_before"), col("distinct_after"))
    val ratioDrift = col("distinct_before").isNotNull &&
      col("distinct_after").isNotNull &&
      when(lo === 0, hi > 0)
        .otherwise(hi.cast("double") > lo.cast("double") * distinctRatioTol)
    // "column" is a reserved word downstream (DuckDB, several SQL
    // dialects) — emit the report under a quote-free name
    j.withColumn("status", status)
      .withColumn("null_rate_delta", delta)
      .withColumn("drifted", status =!= "common" ||
        coalesce(abs(col("null_rate_delta")) > nullRateTol, lit(false)) ||
        coalesce(ratioDrift, lit(false)))
      .select(col("column").as("col_name"), col("status"), col("type_before"),
        col("type_after"), col("n_before"), col("n_after"),
        col("n_null_before"), col("n_null_after"), col("null_rate_delta"),
        col("distinct_before"), col("distinct_after"),
        col("min_before"), col("max_before"), col("min_after"),
        col("max_after"), col("drifted"))
  }

  /** Within-stratum percentile normalization — map each row's value to
    * its empirical percentile `rank / n` INSIDE its stratum, so scores
    * produced by different models (one quality classifier per language)
    * become comparable before a single global cut ("keep every
    * document above the 80th percentile of ITS OWN language"). Emits
    * the input columns plus `pct` (1-based ascending rank over
    * `(value, id)` divided by the stratum size, 1e-6-floor-rounded).
    *
    * Scale shape: the [[globalRank]] decomposition stratified — GLOBAL
    * quantile boundaries (one aggregate; bucket order respects value
    * order inside every stratum), per-(stratum, bucket) running
    * windows, a |strata|×nBuckets broadcast offsets table, and a
    * |strata|-row broadcast count table. No corpus-scale window; keep
    * the stratum count model-sized. `idCol` must be unique; null
    * value/id/stratum rows drop. */
  def percentileNormalize(df: DataFrame, valueCol: String, idCol: String,
                          strataCols: Seq[String], nBuckets: Int = 64,
                          exact: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = strataCols.map(col)
    val rows = df.filter(col(valueCol).isNotNull && col(idCol).isNotNull &&
      strataCols.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
    val bucketed = Checkpoints.pinned(
      quantileBuckets(rows, valueCol, nBuckets, "__b", exact))
    val counts = bucketed.groupBy(gcols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__n"))
    val offs = counts.withColumn("__off", coalesce(
      sum(col("__n")).over(Window.partitionBy(gcols: _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tots = counts.groupBy(gcols: _*).agg(sum(col("__n")).as("__tot"))
    bucketed
      .join(broadcast(offs.select(gcols ++ Seq(col("__b"), col("__off")): _*)),
        strataCols :+ "__b")
      .join(broadcast(tots), strataCols)
      .withColumn("__rk", col("__off") + row_number().over(
        Window.partitionBy(gcols :+ col("__b"): _*)
          .orderBy(col(valueCol), col(idCol))))
      .withColumn("pct",
        floor(col("__rk").cast("double") / col("__tot") * 1e6) / 1e6)
      .drop("__b", "__off", "__tot", "__rk")
  }

  /** Population stability index of a score/metric between two snapshots
    * — the standard "did the scoring distribution drift since the model
    * shipped?" monitor (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * retrain). Bins are `nBins` quantiles of the BEFORE snapshot (the
    * production convention: the baseline defines the grid; drift shows
    * up as mass leaving baseline bins), boundaries 1e-6-grid-rounded so
    * a second engine replays the assignment. Per-bin Laplace smoothing
    * `(cnt + 1) / (n + nBins)` keeps empty bins finite, and each PSI
    * term rounds on the 1e-9 grid (the `q_kl_divergence` ln idiom) —
    * sum the `psi_term` column for the headline index.
    *
    * Scale shape: one boundary aggregate over BEFORE (nBins − 1 doubles,
    * broadcast), map-only bin assignment on both snapshots, two
    * nBins-group partial-agg exchanges, and an nBins-row spine join —
    * nothing corpus-sized moves. Null values drop.
    *
    * Returns one row per bin: `(bin, n_before, n_after, p_before,
    * p_after, psi_term)` (shares smoothed, 1e-6-floored for display;
    * the term is computed from the unrounded shares). */
  def scorePsi(before: DataFrame, after: DataFrame, valueCol: String,
               nBins: Int = 10, exact: Boolean = true): DataFrame = {
    val bounds = psiBounds(before, valueCol, nBins, exact)
    psiOf(psiBinCounts(before, valueCol, bounds),
      psiBinCounts(after, valueCol, bounds), before.sparkSession, nBins)
  }

  /** The BEFORE snapshot's 1e-6-grid quantile boundaries as a one-row
    * array frame — computed once, reused for every assignment (the
    * streaming drift monitor bins each micro-batch against it). */
  private[graft] def psiBounds(before: DataFrame, valueCol: String,
                               nBins: Int, exact: Boolean): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val v = col(valueCol)
    val ps = (1 until nBins).map(_.toDouble / nBins)
    def pct(p: Double): Column =
      if (exact) percentile(v, lit(p))
      else percentile_approx(v, lit(p), lit(10000))
    before.filter(v.isNotNull)
      .agg(array(ps.map(p => floor(pct(p) * 1e6 + 0.5) / 1e6): _*).as("__bs"))
  }

  /** Map-only bin assignment against broadcast boundaries + one
    * nBins-group partial agg → `(bin, cnt)`. Null values drop. */
  private[graft] def psiBinCounts(df: DataFrame, valueCol: String,
                                  bounds: DataFrame): DataFrame = {
    val v = col(valueCol)
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .select(aggregate(col("__bs"), lit(0L),
        (acc, b) => acc + when(v.cast("double") > b, 1L).otherwise(0L))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** PSI table from two pre-binned count frames (the arithmetic half of
    * [[scorePsi]], shared with the streaming monitor). */
  private[graft] def psiOf(beforeCounts: DataFrame, afterCounts: DataFrame,
                           spark: org.apache.spark.sql.SparkSession,
                           nBins: Int): DataFrame = {
    val spine = spark.range(0, nBins).select(col("id").as("bin"))
    val a = beforeCounts.withColumnRenamed("cnt", "n_before")
    val b = afterCounts.withColumnRenamed("cnt", "n_after")
    val joined = spine
      .join(broadcast(a), Seq("bin"), "left")
      .join(broadcast(b), Seq("bin"), "left")
      .na.fill(0L, Seq("n_before", "n_after"))
    val tots = joined.agg(sum(col("n_before")).as("__ta"),
      sum(col("n_after")).as("__tb"))
    val pa = (col("n_before") + 1.0) / (col("__ta") + lit(nBins.toDouble))
    val pb = (col("n_after") + 1.0) / (col("__tb") + lit(nBins.toDouble))
    joined.crossJoin(broadcast(tots))
      .select(col("bin"), col("n_before"), col("n_after"),
        (floor(pa * 1e6) / 1e6).as("p_before"),
        (floor(pb * 1e6) / 1e6).as("p_after"),
        (floor((pa - pb) * log(pa / pb) * 1e9 + 0.5) / 1e9).as("psi_term"))
  }

  // ------------------------------------------------ count-min sketch
  //
  // HLL answers "how many distinct", KMV adds set algebra; count-min
  // answers "how often does THIS key occur" from a table whose size is
  // depth×width REGARDLESS of key cardinality — the frequency story when
  // a per-key groupBy is itself the problem (n-gram/URL frequency over
  // 100 TB: trillions of keys, but the sketch stays a few thousand rows,
  // merges across corpora by cell-wise addition, and maintains
  // incrementally by building a sketch of the delta and adding it).
  // Estimates NEVER undercount (each cell is a sum over a superset of
  // the key's occurrences); overcounts shrink as width grows.

  /** Hash-to-bucket of row i for the count-min family: the splitmix64-
    * derived affine map `(A_i·k + B_i) mod 2^64` followed by the low
    * log2(width) bits. Runs as the `cmsAffineBucket` native kernel —
    * Java long arithmetic wraps mod 2^64, where ANSI-mode Column `*`
    * would throw on overflow. `width` must be a POWER OF TWO so the
    * masked signed result equals the unsigned residue — which is what
    * makes the whole sketch replayable by a second engine in plain
    * unsigned (HUGEINT) arithmetic. Integral keys only: a string key
    * must be pre-hashed by a kernel both engines can replay (the FNV-1a
    * mirror `q_ngram_jaccard` uses). */
  private def cmsBucket(key: Column, i: Int, width: Int): Column = {
    val (a, b) = cmsSeeds(i)
    graft.expressions.native.cmsBucket(key.cast("long"), a, b, width)
  }

  /** The seed constants of sketch row i, for oracle mirrors. */
  def cmsSeeds(i: Int): (Long, Long) =
    (splitmix64Local(2L * i + 101) | 1L, splitmix64Local(2L * i + 102))

  private def splitmix64Local(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Build a count-min sketch of an integral key column: `depth` hash
    * rows × `width` buckets (width a power of two), returned as the
    * sparse cell table `(i, bucket, cnt)` — at most depth×width rows.
    *
    * Scale shape: ONE partial-aggregable exchange whose map-side output
    * is bounded by depth×width per task no matter how many rows or
    * distinct keys flow in (the explode multiplies rows by `depth`, but
    * the partial agg collapses them before anything moves). Merge two
    * sketches by unioning the cell tables and summing per (i, bucket);
    * null keys drop. */
  def cmsBuild(df: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val k = col(keyCol)
    df.filter(k.isNotNull)
      .select(posexplode(array((0 until depth).map(i =>
        cmsBucket(k, i, width)): _*)).as(Seq("i", "bucket")))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Frequency estimates for a candidate key set from a [[cmsBuild]]
    * table: `est = min over i of cell(i, hash_i(key))`, the classic
    * count-min upper-bound estimate (`est ≥ true count`, always).
    *
    * Scale shape: the SKETCH broadcasts (≤ depth×width rows — model
    * state); candidates stay distributed, fan out `depth` rows each,
    * and collapse back with one partial-aggregable min — so estimating
    * a billion candidates is one map + one bounded exchange. */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val k = col(keyCol)
    candidates.filter(k.isNotNull)
      .select(k.as(keyCol),
        posexplode(array((0 until depth).map(i =>
          cmsBucket(k, i, width)): _*)).as(Seq("i", "bucket")))
      .join(broadcast(cms), Seq("i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** 2-D skyline (Pareto frontier): the rows NOT dominated in the
    * maximize-both sense — row r is dominated iff some row has `x ≥ r.x ∧
    * y ≥ r.y` with at least one strict. The classic best-tradeoff query
    * ("highest quality score at every recency level"); minimize a
    * dimension by negating it first. ALL rows carrying a frontier point
    * survive (exact duplicates dominate nothing). Null x/y rows drop.
    *
    * Execution shape — the suffix-max decomposition, never a quadratic
    * dominance join: a survivor is exactly a row whose y equals its
    * x-group max AND strictly exceeds every y at greater x. The
    * strictly-greater-x maximum is computed like [[globalRank]]'s
    * offsets: [[quantileBuckets]] on x (equal x always co-buckets —
    * value-based boundaries), per-(bucket, x) max y in one
    * partial-aggregable pass, an in-bucket suffix max over DISTINCT-x
    * rows (tie-safe rows frame), and an nBuckets-row carry table for the
    * cross-bucket maximum (bounded — the one single-partition window).
    * Total: one corpus exchange on x-bucket + model-sized state; a
    * billion rows skyline in two scans. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                nBuckets: Int = 64): DataFrame = {
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    // approx boundaries: skyline correctness needs only "equal x always
    // co-buckets", which ANY value-based boundary set preserves — exact
    // percentiles would buffer the whole column per aggregate for
    // nothing but bucket balance (the globalRank exact-rank rationale
    // does NOT apply here)
    val bucketed = Checkpoints.pinned(
      quantileBuckets(rows, xCol, nBuckets, "__b", exact = false))
    val gx = bucketed.groupBy(col("__b"), col(xCol))
      .agg(max(col(yCol)).as("__ymax"))
    // carry(b) = max y over all HIGHER buckets (their x are all ≥ this
    // bucket's, and strictly greater whenever buckets differ — boundary
    // ties co-bucket, so cross-bucket means strictly-greater x)
    val bmax = gx.groupBy(col("__b")).agg(max(col("__ymax")).as("__bm"))
    val carry = bmax.withColumn("__carry",
        max(col("__bm")).over(Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__carry"))
    val wIn = Window.partitionBy(col("__b")).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = gx
      .withColumn("__mloc", max(col("__ymax")).over(wIn))
      .join(broadcast(carry), Seq("__b"))
      .withColumn("__m", greatest(
        coalesce(col("__mloc"), col("__carry")),
        coalesce(col("__carry"), col("__mloc"))))
      .filter(col("__m").isNull || col("__ymax") > col("__m"))
      .select(col("__b"), col(xCol), col("__ymax"))
    bucketed.join(frontier.withColumnRenamed("__ymax", "__sy"), Seq("__b", xCol))
      .filter(col(yCol) === col("__sy"))
      .drop("__b", "__sy")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `valueCol`
    * distributions of two slices — the nonparametric drift test that
    * complements [[correlationMatrix]]/PSI: `D = max_x |F₁(x) − F₂(x)|`
    * over the empirical CDFs, sensitive to ANY distributional change
    * (location, scale, shape), not just binned mass shifts.
    *
    * Values are snapped to the `grid` FIRST (`floor(v/grid + 0.5)·grid`)
    * — that is what makes the op scale: the per-cell aggregation
    * `groupBy(gridded value)` is partial-aggregable and the subsequent
    * cumulative pass runs over the GRID-CELL table (bounded by
    * value-range/grid — model-sized state, the `q_histogram` class), not
    * the corpus. The cumulative window over that bounded table is
    * single-partition by construction and documented as such; for an
    * unbounded-range column pick a grid that bounds the cell count.
    * Rows where the predicate columns or value are null drop (both
    * engines agree). D is floor-rounded at 1e-9; `at_value` is the
    * smallest gridded value attaining D (deterministic tiebreak).
    *
    * Returns ONE row: `(n_a, n_b, d_stat, at_value)`. */
  def ksStatistic(df: DataFrame, valueCol: String,
                  inA: Column, inB: Column, grid: Double): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    val v = floor(col(valueCol) / grid + lit(0.5)) * grid
    val cells = df.filter(col(valueCol).isNotNull && (inA || inB))
      .select(v.as("v"), when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    // cumulative ECDF over the bounded grid-cell table (see scaladoc)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = cells.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val diffs = cells.crossJoin(broadcast(tot))
      .withColumn("gap", abs(
        sum(col("na")).over(w).cast("double") / col("ta") -
          sum(col("nb")).over(w).cast("double") / col("tb")))
      .withColumn("gap", floor(col("gap") * 1e9 + lit(0.5)) / 1e9)
    diffs.orderBy(col("gap").desc, col("v").asc).limit(1)
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        col("gap").as("d_stat"), col("v").as("at_value"))
  }

  /** Per-stratum [[ksStatistic]]: one KS row per value of `byCol` —
    * "which language/source actually drifted" after the corpus-level
    * test fires. Same gridding contract and rounding; groups where
    * either slice is empty emit a null `d_stat` (no distribution to
    * compare) rather than vanishing.
    *
    * Scale: identical to [[ksStatistic]] except every window partitions
    * BY THE STRATUM — the cumulative pass parallelizes across groups and
    * each group's cell table is grid-bounded; no single-partition stage
    * remains at any group count. */
  def ksStatisticBy(df: DataFrame, byCol: String, valueCol: String,
                    inA: Column, inB: Column, grid: Double): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    val v = floor(col(valueCol) / grid + lit(0.5)) * grid
    val cells = df.filter(col(valueCol).isNotNull && (inA || inB))
      .select(col(byCol), v.as("v"), when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .groupBy(col(byCol), col("v"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val wCum = Window.partitionBy(col(byCol)).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col(byCol))
    val diffs = cells
      .withColumn("ta", sum(col("na")).over(wAll))
      .withColumn("tb", sum(col("nb")).over(wAll))
      .withColumn("gap", when(col("ta") > 0 && col("tb") > 0,
        floor(abs(sum(col("na")).over(wCum).cast("double") / col("ta") -
          sum(col("nb")).over(wCum).cast("double") / col("tb")) * 1e9
          + lit(0.5)) / 1e9))
    val wBest = Window.partitionBy(col(byCol))
      .orderBy(col("gap").desc_nulls_last, col("v").asc)
    diffs.withColumn("__rk", row_number().over(wBest))
      .filter(col("__rk") === 1)
      .select(col(byCol), col("ta").as("n_a"), col("tb").as("n_b"),
        col("gap").as("d_stat"), when(col("gap").isNotNull, col("v")).as("at_value"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) test between the
    * `valueCol` distributions of two slices — the LOCATION-shift drift
    * test that complements [[ksStatistic]]: KS fires on any CDF gap, U
    * asks specifically "does one slice stochastically dominate the
    * other", which is the question behind "did quality scores move up or
    * down after the pipeline change".
    *
    * Same gridding contract as KS: values snap to `grid` first, so the
    * ranking pass runs over the bounded GRID-CELL table (per-cell counts
    * are partial-aggregable; the cumulative window is single-partition
    * over model-sized state, the `q_histogram` class). Tied values take
    * the average rank; rank sums are computed in EXACT integer arithmetic
    * (2×rank stays integral) summed as DECIMAL(38,0) so no engine's
    * double-accumulation order matters, and only the final z-score runs
    * in double (floor-rounded at 1e-9). The z normal approximation
    * carries the standard tie correction
    * `σ² = nAnB/12 · ((N+1) − Σ(t³−t)/(N(N−1)))`.
    *
    * Returns ONE row: `(n_a, n_b, u_stat, z)` — `u_stat` is U for slice
    * A; `z` is null when either slice is empty or all values are tied
    * (σ = 0).
    *
    * `inA`/`inB` must be DISJOINT predicates: a row satisfying both is
    * counted in BOTH slices, and the z normal approximation assumes the
    * samples are independent — with overlapping predicates the statistic
    * is silently invalid. Exclude the intersection (`inA && !inB`) when
    * the caller's Columns can overlap. */
  def mannWhitney(df: DataFrame, valueCol: String,
                  inA: Column, inB: Column, grid: Double): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    val v = floor(col(valueCol) / grid + lit(0.5)) * grid
    val cells = df.filter(col(valueCol).isNotNull && (inA || inB))
      .select(v.as("v"), when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      .withColumn("t", col("na") + col("nb"))
    // cumulative count of strictly-smaller values over the bounded cell
    // table; 2×(average rank of a tie group) = 2·cumBefore + t + 1 stays
    // INTEGRAL — the whole rank sum is exact integer arithmetic
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cb") + col("t") + lit(1L))
    // cast operands to DECIMAL(38,0) BEFORE multiplying: na·r2 ~ N² and
    // t³ overflow int64 well inside the design scale
    val tD = col("t").cast("decimal(38,0)")
    val agg = ranked.agg(
      sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
      sum(col("na").cast("decimal(38,0)") * col("r2").cast("decimal(38,0)"))
        .as("ra2"),
      sum(tD * tD * tD - tD).as("ties"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = (col("n_a") + col("n_b")).cast("double")
    val u = (col("ra2") - (col("n_a").cast("decimal(38,0)") *
      (col("n_a") + 1L).cast("decimal(38,0)"))).cast("double") / 2.0
    val mu = naD * nbD / 2.0
    // null-guarded tie divisor: a single-row total makes N(N−1) = 0 and
    // ANSI would throw on the hoisted division (see proportionZTest)
    val varU = naD * nbD / 12.0 *
      ((nD + 1.0) - col("ties").cast("double") /
        when(nD > 1.0, nD * (nD - 1.0)))
    agg.select(col("n_a"), col("n_b"), u.as("u_stat"),
      when(col("n_a") > 0 && col("n_b") > 0 && varU > 0,
        floor((u - mu) / sqrt(varU) * 1e9 + lit(0.5)) / 1e9).as("z"))
  }

  /** Wilcoxon signed-rank test over PAIRED observations — the paired
    * counterpart of [[mannWhitney]] ("did each user's activity shift
    * between the two halves of the window", before/after per key, not
    * two independent slices). Differences snap to `grid`, zeros drop
    * (standard practice), |d| ranks average over ties, and
    * `W⁺ = Σ ranks of positive differences` feeds the tie-corrected
    * normal approximation
    * `σ² = n(n+1)(2n+1)/24 − Σ(t³−t)/48`.
    *
    * Same exact-arithmetic contract as MW: the gridded |d| cell table
    * bounds all post-exchange state, 2×avg-rank stays integral and
    * accumulates as DECIMAL(38,0), only the final z runs in double
    * (1e-9 floor; null when no nonzero pairs or σ = 0).
    *
    * Returns ONE row: `(n, w_plus, z)`. */
  def wilcoxonSignedRank(df: DataFrame, beforeCol: String, afterCol: String,
                         grid: Double): DataFrame = {
    require(grid > 0, s"grid must be positive, got $grid")
    val dv = floor((col(afterCol).cast("double") - col(beforeCol).cast("double"))
      / grid + lit(0.5)) * grid
    val cells = df
      .filter(col(beforeCol).isNotNull && col(afterCol).isNotNull)
      .select(dv.as("d"))
      .filter(col("d") =!= 0.0)
      .groupBy(abs(col("d")).as("ad"))
      .agg(sum(when(col("d") > 0, 1L).otherwise(0L)).as("np"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("nn"))
      .withColumn("t", col("np") + col("nn"))
    val w = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cb") + col("t") + lit(1L))
    val tD = col("t").cast("decimal(38,0)")
    val agg = ranked.agg(
      coalesce(sum(col("t")), lit(0L)).as("n"),
      sum(col("np").cast("decimal(38,0)") * col("r2").cast("decimal(38,0)"))
        .as("w2"),
      sum(tD * tD * tD - tD).as("ties"))
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    val nD = col("n").cast("double")
    val wPlus = col("w2").cast("double") / 2.0
    val mu = nD * (nD + 1.0) / 4.0
    val varW = nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 24.0 -
      col("ties").cast("double") / 48.0
    agg.select(col("n"), when(col("n") > 0, wPlus).as("w_plus"),
      when(col("n") > 0 && varW > 0,
        r9((wPlus - mu) / sqrt(varW))).as("z"))
  }

  /** Cohen's d — the EFFECT SIZE companion to the significance tests
    * ([[proportionZTest]]/[[mannWhitney]] say "is the shift real",
    * d says "is it big enough to matter"): standardized mean difference
    * `(mean_a − mean_b) / pooled_sd` between two slices.
    *
    * Numeric discipline = [[graft.ops.Classifier.fitOLS2]]: values snap
    * to 1e-6, per-slice means come from exact DECIMAL sums re-snapped to
    * the grid, and the variances accumulate over MEAN-CENTERED values
    * (raw moments cancel catastrophically — the r13 OLS lesson), so the
    * result is partitioning-proof and SQL-mirrorable. Two
    * partial-aggregable passes; everything after is one row.
    *
    * Returns ONE row always (fully-empty input yields `(0, 0, null,
    * null, null)`): `(n_a, n_b, mean_a, mean_b, d)` — `d` null when
    * either slice has < 2 rows or the pooled variance is 0.
    *
    * `inA`/`inB` must be DISJOINT predicates: a row satisfying both is
    * counted in BOTH slices (same contract as [[mannWhitney]]/
    * [[proportionZTest]]), which invalidates the independence assumption
    * behind d — exclude the overlap (`inA && !inB`) if your predicates
    * can intersect. */
  def cohensD(df: DataFrame, valueCol: String,
              inA: Column, inB: Column): DataFrame = {
    def snap6(c: Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    val base = df.filter(col(valueCol).isNotNull && (inA || inB))
      .select(snap6(col(valueCol).cast("double")).as("v"),
        when(inA, 1L).otherwise(0L).as("a"),
        when(inB, 1L).otherwise(0L).as("b"))
    val means = base.agg(
      coalesce(sum(col("a")), lit(0L)).as("n_a"),
      coalesce(sum(col("b")), lit(0L)).as("n_b"),
      sum(when(col("a") === 1, col("v").cast("decimal(19,6)"))).as("sa"),
      sum(when(col("b") === 1, col("v").cast("decimal(19,6)"))).as("sb"))
      .select(col("n_a"), col("n_b"),
        snap6(col("sa").cast("double") /
          when(col("n_a") > 0, col("n_a").cast("double"))).as("ma"),
        snap6(col("sb").cast("double") /
          when(col("n_b") > 0, col("n_b").cast("double"))).as("mb"))
    val cent = base.crossJoin(broadcast(means))
      .select(col("n_a"), col("n_b"), col("ma"), col("mb"),
        when(col("a") === 1, snap6(col("v") - col("ma")).cast("decimal(19,6)"))
          .as("ca"),
        when(col("b") === 1, snap6(col("v") - col("mb")).cast("decimal(19,6)"))
          .as("cb"))
    // aggregate WITHOUT groupBy so fully-empty input still yields the
    // contractual one row (a groupBy over the empty centered frame
    // collapses to zero rows — r14 advice); the scalar columns are
    // constant across cent (one-row broadcast), so max() carries them
    val m = cent.agg(
      coalesce(max(col("n_a")), lit(0L)).as("n_a"),
      coalesce(max(col("n_b")), lit(0L)).as("n_b"),
      max(col("ma")).as("ma"), max(col("mb")).as("mb"),
      sum(col("ca") * col("ca")).as("saa"),
      sum(col("cb") * col("cb")).as("sbb"))
    def r6(c: Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    val pooledVar = (col("saa").cast("double") + col("sbb").cast("double")) /
      when(col("n_a") + col("n_b") > 2,
        (col("n_a") + col("n_b") - 2).cast("double"))
    val ok = col("n_a") >= 2 && col("n_b") >= 2 && pooledVar > 0
    m.select(col("n_a"), col("n_b"), col("ma").as("mean_a"),
      col("mb").as("mean_b"),
      when(ok, r6((col("ma") - col("mb")) / sqrt(pooledVar))).as("d"))
  }

  /** Two-proportion z-test between two slices' success rates — the A/B
    * primitive ("did the new extraction rule change the keep-rate"):
    * pooled-variance normal approximation
    * `z = (p₁ − p₂) / √(p̄(1−p̄)(1/n₁ + 1/n₂))`. One partial-aggregable
    * pass; exact counts, double math in pinned operation order, z
    * floor-rounded at 1e-9 and null when either slice is empty or the
    * pooled rate is degenerate (0 or 1 — no variance to test against).
    *
    * Returns ONE row:
    * `(n_a, k_a, n_b, k_b, rate_a, rate_b, z)`.
    *
    * `inA`/`inB` must be DISJOINT predicates: a row satisfying both is
    * counted in BOTH slices, which the pooled-variance independence
    * assumption does not survive — exclude the overlap (`inA && !inB`)
    * if the caller's Columns can intersect. */
  def proportionZTest(df: DataFrame, inA: Column, inB: Column,
                      success: Column): DataFrame = {
    val agg = df.filter(inA || inB).agg(
      coalesce(sum(when(inA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(inA && success, 1L).otherwise(0L)), lit(0L)).as("k_a"),
      coalesce(sum(when(inB, 1L).otherwise(0L)), lit(0L)).as("n_b"),
      coalesce(sum(when(inB && success, 1L).otherwise(0L)), lit(0L)).as("k_b"))
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    // NULL-guarded divisors, not CASE-guarded divisions: subexpression
    // elimination hoists a division shared across output branches OUT of
    // its CASE, so under ANSI an empty slice would throw DIVIDE_BY_ZERO
    // even though every published column is guarded — a null divisor
    // degrades to null in any evaluation order
    val naD = when(col("n_a") > 0, col("n_a").cast("double"))
    val nbD = when(col("n_b") > 0, col("n_b").cast("double"))
    val pa = col("k_a").cast("double") / naD
    val pb = col("k_b").cast("double") / nbD
    val pool = (col("k_a") + col("k_b")).cast("double") /
      when(col("n_a") + col("n_b") > 0, (col("n_a") + col("n_b")).cast("double"))
    val z = (pa - pb) / sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / naD + lit(1.0) / nbD))
    agg.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
      when(col("n_a") > 0, r9(pa)).as("rate_a"),
      when(col("n_b") > 0, r9(pb)).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && pool > 0 && pool < 1,
        r9(z)).as("z"))
  }

  /** Benjamini–Hochberg step-up FDR control over a (hypothesis, p-value)
    * table — the multiple-testing gate that belongs after any per-stratum
    * test battery ([[ksStatisticBy]], per-language drift, per-source
    * Benford): testing 500 strata at α = 0.05 expects 25 false alarms;
    * BH bounds the FALSE-DISCOVERY RATE at α instead. Rejects the
    * hypotheses ranked 1..k* where k* is the largest k with
    * `p(k) ≤ k/m · α` (ascending p, deterministic id tiebreak — ties in p
    * are resolved by the id so both engines rank identically).
    *
    * Output: one row per input hypothesis —
    * `(idCol, pCol, rank, threshold, rejected)` with `threshold =
    * rank/m·α` floor-rounded at 1e-12 before the comparison (identical
    * fold on any engine). Null p-values drop (nothing to test).
    *
    * Scale note: m is the number of HYPOTHESES (strata/tests), not rows —
    * model-sized by construction. The rank and the step-up suffix-max run
    * as single-partition windows over those m rows, the same documented
    * bounded-state shape as [[ksStatistic]]'s cell table. */
  def bhFdr(pvals: DataFrame, idCol: String, pCol: String,
            alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val base = pvals.filter(col(pCol).isNotNull)
      .select(col(idCol), col(pCol).cast("double").as("__p"))
    val wRank = Window.orderBy(col("__p"), col(idCol))
    val m = Window.partitionBy()
    val ranked = base
      .withColumn("rank", row_number().over(wRank))
      .withColumn("__m", count(lit(1)).over(m))
      .withColumn("threshold",
        floor(col("rank").cast("double") / col("__m").cast("double") * alpha
          * 1e12 + lit(0.5)) / 1e12)
    // step-up: reject ranks 1..k* where k* = max rank with p ≤ threshold —
    // i.e. a row is rejected iff ANY row at or after it passes (suffix max)
    val wSuffix = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranked
      .withColumn("rejected",
        max(when(col("__p") <= col("threshold"), 1).otherwise(0))
          .over(wSuffix) === 1)
      .select(col(idCol), col("__p").as(pCol), col("rank"),
        col("threshold"), col("rejected"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * dependence audit that pairs with the chi-square test: χ² answers
    * "is there dependence", MI answers "how many bits of one does the
    * other carry" (feature-leak and redundant-label detection). Null
    * categories are kept as their own level (SQL `GROUP BY` semantics).
    *
    * `MI = Σ_{x,y} p(x,y) · ln( p(x,y) / (p(x)·p(y)) )`, with the joint
    * counts from ONE partial-aggregable pass and the marginals from
    * window sums over the contingency table (bounded by |X|·|Y| cells —
    * model-sized, the [[chiSquare]] shape). Each cell term is
    * floor-rounded at 1e-12 and summed as DECIMAL so the total is
    * addition-order-free and exactly SQL-mirrorable; the final MI and the
    * normalized variant round at 1e-9.
    *
    * Returns ONE row: `(n, n_cells, mi_nats, mi_normalized)` where the
    * normalizer is `min(H(X), H(Y))` (0 when either entropy is 0). */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    // marginals + grand total as window sums over the CONTINGENCY TABLE
    // (|X|·|Y| cells — model-sized), never over the corpus
    val cells = joint
      .withColumn("nx", sum(col("nxy")).over(Window.partitionBy(col("x"))))
      .withColumn("ny", sum(col("nxy")).over(Window.partitionBy(col("y"))))
      .withColumn("n", sum(col("nxy")).over(Window.partitionBy()))
    def term(c: Column): Column =
      (floor(c * 1e12 + lit(0.5)) / 1e12).cast("decimal(28,12)")
    val p = col("nxy").cast("double") / col("n").cast("double")
    val px = col("nx").cast("double") / col("n").cast("double")
    val py = col("ny").cast("double") / col("n").cast("double")
    // H(X) = −Σ_{x,y} p(x,y)·ln p(x): the marginal entropies as PER-CELL
    // terms (Σ_y p(x,y) = p(x)), so one aggregate pass yields MI + both
    // normalizer entropies from the same decimal-summed cell grid
    val agg = cells.agg(
      max(col("n")).as("n"),
      count(lit(1)).as("n_cells"),
      sum(term(p * log(p / (px * py)))).as("__mi"),
      sum(term(lit(-1.0) * p * log(px))).as("__hx"),
      sum(term(lit(-1.0) * p * log(py))).as("__hy"))
    def r9(c: Column): Column = floor(c * 1e9 + lit(0.5)) / 1e9
    agg.select(col("n"), col("n_cells"),
      r9(col("__mi").cast("double")).as("mi_nats"),
      when(least(col("__hx"), col("__hy")) > 0,
        r9(col("__mi").cast("double") /
          least(col("__hx"), col("__hy")).cast("double"))).as("mi_normalized"))
  }
}
