package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling & data-mixing operators (SURVEY.md §2.6 extension —
  * what a training-data pipeline runs after dedup/quality to assemble the
  * final mixture).
  *
  * Everything here is DETERMINISTIC: no `rand()`. Sampling decisions hash
  * the row's id, so results are stable across runs, retries, partitionings
  * and cluster sizes — at 100 TB a resampled run must reproduce byte-for-
  * byte, and a lost executor must not change the corpus. Selection is
  * map-only (no shuffle); the mixing-weight aggregates exchange only
  * #strata rows.
  */
object Sampling {

  /** First 8 hex chars of `md5(salt ":" id)` — a uniform 32-bit draw as a
    * lexicographically-comparable hex string (engine-portable: any system
    * with md5 mirrors it exactly). */
  def hashDraw(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), lit(":"), id.cast("string"))), 1, 8)

  /** Hex threshold such that P(draw < threshold) = fraction. */
  private[graft] def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    f"${math.min(math.round(fraction * 4294967296.0), 4294967295L)}%08x"
  }

  /** Deterministic Bernoulli sample: keep a row iff its 32-bit hash draw
    * falls under `fraction`. Change `salt` to draw an independent sample;
    * reuse it to reproduce one. Map-only — the predicate evaluates at the
    * scan, nothing shuffles. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          salt: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(hashDraw(col(idCol), salt) < lit(fractionThreshold(fraction)))

  /** Deterministic named-fraction partition (train/val/test): each id lands
    * in exactly ONE split by where its 32-bit hash draw falls among the
    * cumulative fraction boundaries. Id-stable under corpus growth (a new
    * document never moves an old one between splits — the property random
    * `randomSplit` lacks), reproducible on any engine with md5, and
    * map-only: the label evaluates at the scan, nothing shuffles. Change
    * `salt` for an independent re-split. Fractions must sum to 1. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                salt: String = "split", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one split")
    splits.foreach { case (n, f) =>
      require(f >= 0.0, s"split '$n' has negative fraction $f") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) <= 1e-9,
      s"split fractions must sum to 1, got $total")
    val draw = hashDraw(col(idCol), salt)
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val expr = splits.zip(cums).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), acc) =>
        when(draw < lit(fractionThreshold(cum)), name).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic k-fold assignment — the cross-validation counterpart
    * of [[hashSplit]]: every id lands in exactly one of `k` equal-mass
    * folds, stable under corpus growth (an old id never changes folds
    * when new data arrives — md5-thresholded, never `rand()`), and a new
    * `salt` draws an independent fold structure. Exactly [[hashSplit]]
    * with k equal fractions, so the same cumulative-threshold machinery
    * (and the same oracle discipline) applies; fold labels are
    * `"0".."k−1"` strings for direct anti-join ergonomics
    * (`fold =!= lit("3")` = train, `=== ` = eval). Map-only. */
  def kFoldAssign(df: DataFrame, idCol: String, k: Int,
                  salt: String = "fold", foldCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1000, s"k must be in [2, 1000], got $k")
    hashSplit(df, idCol, (0 until k).map(i => (i.toString, 1.0 / k)),
      salt = salt, splitCol = foldCol)
  }

  /** Temporal train/test split with an EMBARGO gap — the leakage guard
    * for time-dependent data (forecasting features, event models,
    * anything autocorrelated): `train` strictly before `cutoff`, `test`
    * at or after `cutoff + embargo`, and the rows inside the gap labeled
    * `embargo` so near-boundary leakage (a test row whose features were
    * computed from a window overlapping training time) is excluded by
    * construction rather than by hope. Null timestamps label null —
    * surface them to a validator, don't silently bucket them. Map-only:
    * two comparisons at the scan, nothing shuffles. */
  def temporalSplit(df: DataFrame, tsCol: String,
                    cutoff: String, embargo: String = "0 seconds",
                    splitCol: String = "split"): DataFrame = {
    // cast the ISO-string cutoff to the column's OWN timestamp flavor
    // (TIMESTAMP vs TIMESTAMP_NTZ parquet both occur in the wild)
    val cut = lit(cutoff).cast(df.schema(tsCol).dataType)
    val testStart = cut + expr(s"INTERVAL $embargo")
    df.withColumn(splitCol,
      when(col(tsCol).isNull, lit(null).cast("string"))
        .when(col(tsCol) < cut, "train")
        .when(col(tsCol) >= testStart, "test")
        .otherwise("embargo"))
  }

  /** Per-stratum deterministic fractions — the data-mixing primitive
    * ("keep 50% of en, 10% of de, `default` of everything else"). One CASE
    * over the stratum column picks the row's threshold; same hash draw as
    * [[deterministicSample]], so a row's fate under a given salt is stable
    * even when its stratum's rate changes. A null stratum uses `default`. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double], default: Double = 0.0,
                       salt: String = "graft"): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), lit(""))) {
      case (acc, (stratum, f)) =>
        acc.when(col(stratumCol) === stratum, lit(fractionThreshold(f)))
    }.otherwise(lit(fractionThreshold(default)))
    df.filter(hashDraw(col(idCol), salt) < threshold)
  }

  /** Temperature-sampling mixture weights: `w_i ∝ n_i^T / Σ n_j^T` — the
    * standard multilingual/multi-source rebalancing rule (T = 1 keeps the
    * natural distribution, T → 0 approaches uniform, upweighting
    * low-resource strata). Output: one row per stratum with its count and
    * normalized weight (rounded to 6 dp for engine-portable comparison).
    *
    * ONE corpus pass (the per-stratum count aggregate, map-side
    * combined); its #strata rows collect and normalize on the driver —
    * the same model-state pattern as k-means centroids — and return as a
    * LocalRelation, which downstream joins broadcast for free. This is
    * the library's last former partitionless-window site: the window-free
    * form keeps Verify's WindowExec warning count at zero so a REAL
    * accidental global sort cannot hide. Driver-side accumulation is
    * ordered (null stratum first, then by string form) so the float sum
    * is run-to-run deterministic; the 6 dp rounding absorbs the ≤1-ulp
    * difference vs any other summation order, as it always has
    * cross-engine. Eager by design — the result is #strata rows; callers
    * composing lazily lose nothing and a retried caller cannot recompute
    * a different frame. */
  def temperatureWeights(df: DataFrame, stratumCol: String,
                         temperature: Double): DataFrame = {
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    val spark = df.sparkSession
    val stratumField = df.schema(stratumCol)
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n")).collect()
    val sorted = counts.sortBy(r => (r.get(0) != null, String.valueOf(r.get(0))))
    val pws = sorted.map(r => math.pow(r.getLong(1).toDouble, temperature))
    val total = pws.sum
    val rows = sorted.zip(pws).map { case (r, pw) =>
      org.apache.spark.sql.Row(r.get(0), r.getLong(1),
        math.floor(pw / total * 1e6 + 0.5) / 1e6)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      stratumField,
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("weight",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }

  /** Per-stratum quota — "no domain/source may contribute more than `n`
    * documents": keep at most `n` rows per stratum, selected
    * DETERMINISTICALLY by the same salted hash draw as
    * [[deterministicSample]] (a stable pseudo-random n-subset, not a
    * first-n-by-id bias; ties broken by id). The selection nests: the
    * rows kept at quota n are a subset of those kept at any larger quota
    * under the same salt.
    *
    * Scale shape: `row_number ≤ n` compiles to `WindowGroupLimit` — every
    * map task pre-prunes its partition to a local top-n BEFORE the
    * exchange, so the shuffle moves ≤ n × #partitions rows per stratum,
    * never the whole stratum. A 10-billion-row domain costs the same
    * shuffle as a 10-thousand-row one. */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String, n: Int,
                    salt: String = "graft"): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashDraw(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Token-budget sequence packing: assign rows to consecutive
    * fixed-budget sequences in deterministic `orderCol` order —
    * `seq_id = floor(exclusive_prefix_sum(tokens) / budget)` — the
    * pre-tokenization step that turns a curated corpus into training
    * sequences (contiguous-prefix packing; boundary documents straddle,
    * real packers truncate/pad downstream). Rows with a null token count
    * get a null seq_id.
    *
    * Scale shape: a naive global window (`Window.orderBy(...)` with no
    * partitioning) collapses to a SINGLE-partition sort — the classic
    * distributed prefix-sum trap. This is the two-phase version:
    * bucket on the order column, per-bucket window cumsum, then add each
    * bucket's exclusive offset — collected once (≤ #buckets longs) and
    * embedded as a LITERAL map, so the final plan has ONE exchange and
    * no join and no partitionless window at all. The result is
    * independent of the sampled bucket boundaries because prefix sums
    * compose across any split points.
    *
    * The bucket id is DATA-DERIVED, not plan-derived: range boundaries
    * over `orderCol` are sampled once (deterministic hash sample, weighted
    * by row frequency) and embedded as LITERALS in the bucket expression,
    * so every branch of the plan computes the identical `__pid` for a row
    * no matter how Spark schedules, reuses, or re-plans exchanges. Earlier
    * versions used `repartitionByRange` + `spark_partition_id()`, whose
    * meaning is relative to one physical partitioning — RangePartitioner
    * re-samples boundaries per execution, so whenever the exchange was not
    * physically reused the cumsum and offsets branches disagreed on
    * `__pid` (the round-5 driver failure). Literal boundaries make every
    * branch COMPUTE the same `__pid`; since r11 the input is additionally
    * PINNED (eager checkpoint, skipped when the caller already persisted
    * it) so the boundary sketch, the offsets aggregate, and the rank pass
    * all READ one materialization — the former persist-before-calling doc
    * contract, now enforced in the operator, which also removes the
    * triple re-derivation of an expensive upstream. The pin never touches
    * the session cacheManager and dies with the returned frame
    * ([[Checkpoints]]). */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // pin the input unless the caller already cached it: the boundary
    // sketch, the offsets aggregate, and the rank pass each traverse it,
    // and on an uncached nondeterministic-upstream frame those three
    // independent recomputations could disagree (r10 ADVICE) — the pin
    // makes all three read ONE materialization, and is the enforcement of
    // what used to be a persist-before-calling doc contract
    val in = Checkpoints.pinned(df)
    val buckets =
      in.sparkSession.sessionState.conf.numShufflePartitions.max(1)
    val bounds = packBoundaries(in, orderCol, buckets)
    // first boundary with orderCol < bound wins; nulls sort first in the
    // global ascending order, so they are pinned to bucket 0 explicitly
    // (a null comparison would otherwise fall through to the LAST bucket)
    val parted = in.withColumn("__pid",
      when(col(orderCol).isNull, lit(0))
        .otherwise(bucketExpr(col(orderCol), bounds)))
    // ROWS frame, not the default RANGE frame: with orderBy alone the
    // cumsum frame is RANGE UNBOUNDED..CURRENT ROW, which lumps ALL rows
    // sharing an orderCol value into one step — two 600-token peers at
    // budget 512 would both get the same cumsum and land in the same
    // sequence while an earlier sequence stays empty. Peers are serialized
    // by a full-row hash tiebreak so the packing is deterministic across
    // runs/retries (truly identical rows are interchangeable — any order
    // yields the same multiset of assignments). Map-typed columns are
    // excluded (Spark refuses to hash maps); bucketing by orderCol VALUE
    // keeps all orderCol peers in one bucket, so a within-bucket tiebreak
    // is a global one.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val tieCols = df.schema.fields.toSeq.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val tie = if (tieCols.nonEmpty) xxhash64(tieCols: _*) else lit(0L)
    val wIn = Window.partitionBy("__pid").orderBy(col(orderCol), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = parted.withColumn("__cum", sum(col(tokenCol)).over(wIn))
    // Per-bucket exclusive offsets as LITERALS, like the boundaries: the
    // ≤ #buckets totals collect through one small-result action (sum
    // ignores nulls exactly like the windowed cumsum; both jobs bucket
    // rows with the SAME literal boundaries, so they cannot disagree no
    // matter how they are planned or scheduled — and offsets are exact
    // LONG sums, immune to accumulation order). The earlier broadcast-
    // join formulation aggregated the corpus inside the broadcast
    // subtree anyway, so this is the same number of corpus reads with
    // one less join and no partitionless window in the final plan; the
    // driver holds #buckets longs.
    val offByPid: Map[Int, Long] = {
      val totals = parted.groupBy("__pid")
        .agg(sum(col(tokenCol)).as("__ptot")).collect()
      val sorted = totals.map { r =>
        (r.getInt(0),
          if (r.isNullAt(1)) 0L
          else r.get(1).asInstanceOf[Number].longValue())
      }.sortBy(_._1)
      var acc = 0L
      sorted.map { case (pid, tot) =>
        val off = acc; acc += tot; (pid, off)
      }.toMap
    }
    cum.withColumn("__off",
        coalesce(element_at(typedLit(offByPid), col("__pid")), lit(0L)))
      // integer `div`, not floor(double /): exact for any cumsum magnitude
      .withColumn("__excl", col("__cum") + col("__off") - col(tokenCol))
      .withColumn("seq_id", expr(s"__excl div ${budget}L"))
      .drop("__pid", "__cum", "__off", "__excl")
  }

  /** Bucket index of `c` against ascending [[packBoundaries]] `bounds`:
    * the first `i` with `c < bounds(i)`, else `bounds.length` —
    * equivalently (bounds sorted) the count of boundaries ≤ `c`. NULL
    * handling stays with the caller. Two physical forms, same semantics:
    * a `when`-chain while the chain is shallow (cheapest per row, fully
    * codegen'd), and `size(filter(array<literals>, b -> b <= c))` past
    * `chainMax` — at cluster shuffle-partition counts (thousands) a
    * nested-`when` tree blows the JVM's 64 KB method limit and drops the
    * whole stage out of codegen (r10 ADVICE), while the array form stays
    * one bounded-loop expression at any width. */
  private[ops] def bucketExpr(c: Column, bounds: Seq[Any],
                              chainMax: Int = 64): Column =
    if (bounds.isEmpty) lit(0)
    else if (bounds.length <= chainMax)
      bounds.zipWithIndex.foldRight(lit(bounds.length): Column) {
        case ((b, i), acc) => when(c < lit(b), lit(i)).otherwise(acc)
      }
    else
      size(filter(array(bounds.map(lit): _*), b => b <= c))

  /** Deterministic range boundaries over `orderCol` for [[packSequences]]
    * and the as-of join's hot-key mode: a bottom-k-by-hash (KMV) sample of
    * DISTINCT values with EXACT row counts as weights, from ONE narrow
    * pass — then boundaries picked at even cumulative-weight steps.
    *
    * The KMV invariant makes the one-pass counts exact: a value is
    * evicted from a partition's sketch only when ≥ k distinct values with
    * smaller hash exist in that partition — and the hash is a global
    * property of the value, so an evicted value cannot be in the GLOBAL
    * bottom-k either; conversely every global-bottom-k value survives in
    * every partition it appears in, with all of its rows counted. Heavy
    * duplication contributes its mass as a count, never as collected
    * rows; per-task state is ≤ 2k entries.
    *
    * The k surviving values sort through a tiny Spark job (K rows), not a
    * driver-side comparator — boundary ORDER must agree exactly with the
    * engine's own `<`, and e.g. Java's String compareTo (UTF-16) disagrees
    * with Spark's UTF8String binary order outside ASCII.
    *
    * Returns ascending, deduplicated values; fewer than `buckets - 1`
    * when the key space is small — degenerating to one bucket (a
    * single-partition sort) only when the data itself has (almost) one
    * distinct key, exactly when any order-based partitioning must. */
  private[ops] def packBoundaries(df: DataFrame, orderCol: String,
                                  buckets: Int): Seq[Any] = {
    if (buckets <= 1) return Nil
    val k = buckets * 64
    val dt = df.schema(orderCol).dataType
    val keyed = df.select(col(orderCol).as("__k")).filter(col("__k").isNotNull)
      .withColumn("__h", xxhash64(col("__k"), lit("graft:pack")))
    type Sketch = scala.collection.mutable.HashMap[Any, (Long, Long)]
    def prune(m: Sketch): Unit = if (m.size > k) {
      val cut = m.values.map(_._1).toArray.sorted.apply(k - 1)
      // ties on the cut hash stay — keeping a few extra is harmless,
      // dropping a tied value could lose a global-bottom-k survivor
      m.filterInPlace { case (_, (h, _)) => h <= cut }
    }
    val parts = keyed.rdd.mapPartitions { it =>
      val m: Sketch = scala.collection.mutable.HashMap.empty
      var sincePrune = 0
      it.foreach { r =>
        val v = r.get(0)
        m.get(v) match {
          case Some((h, c)) => m.update(v, (h, c + 1L))
          case None =>
            m.update(v, (r.getLong(1), 1L))
            sincePrune += 1
            if (sincePrune >= k) { prune(m); sincePrune = 0 }
        }
      }
      prune(m)
      Iterator.single(m)
    }
    if (parts.getNumPartitions == 0) return Nil // 0-partition frame: no job
    val merged = parts.treeReduce({ (a, b) =>
      b.foreach { case (v, (h, c)) =>
        a.get(v) match {
          case Some((_, cc)) => a.update(v, (h, cc + c))
          case None          => a.update(v, (h, c))
        }
      }
      prune(a)
      a
    }, depth = 2)
    if (merged.isEmpty) return Nil
    // sort the K survivors with the ENGINE's ordering (tiny local job)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__k", dt),
      org.apache.spark.sql.types.StructField("__w",
        org.apache.spark.sql.types.LongType)))
    val sampled = spark.createDataFrame(
      spark.sparkContext.parallelize(
        merged.toSeq.map { case (v, (_, c)) =>
          org.apache.spark.sql.Row(v, c)
        }, 1), schema)
      .orderBy("__k").collect()
    val totalW = sampled.iterator.map(_.getLong(1)).sum
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var cum = 0L
    var b = 1
    for (row <- sampled if b < buckets) {
      cum += row.getLong(1)
      // ceil(b * totalW / buckets): the b-th even cumulative-weight step
      while (b < buckets && cum >= (b.toLong * totalW + buckets - 1) / buckets) {
        val v = row.get(0)
        if (out.isEmpty || out.last != v) out += v
        b += 1
      }
    }
    out.toSeq
  }

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * keep the k rows with the largest `u^(1/w)` — equivalently the
    * largest `ln(u)/w`, the form used here — where `u` is the row's
    * deterministic 32-bit hash draw mapped to (0,1] — inclusion
    * probability proportional to `weightCol` without ever materializing a
    * cumulative distribution. The classic "sample 10k docs favoring high
    * quality" selector.
    *
    * Deterministic like everything here: same salt → same sample, across
    * runs, retries and partitionings. The priority is exposed as
    * `priority = ln(u)/w` ROUNDED to 12 dp with id tiebreak, so
    * cross-engine mirrors rank identically (`ln` is the one
    * non-IEEE-exact op; its ≤1-ulp wobble sits ~1e-4 under the quantum).
    * The LOG form, not `u^(1/w)`: the power form saturates to 1.0 under
    * rounding once weights reach ~10⁶ (every heavy row ties and
    * selection degrades to the id tiebreak), while `ln(u)/w` keeps
    * relative precision at any weight scale — same ordering, monotone
    * transform.
    *
    * Scale shape: the partitionless `row_number ≤ k` compiles to
    * `TakeOrderedAndProject(limit=k)` (LimitPushDownThroughWindow) —
    * each map task keeps a k-row heap and the single merge reads k rows
    * per partition, never the corpus (plan-asserted in SamplingSpec;
    * fine for k up to millions, the training-set regime). Rows with
    * null/non-positive weight never qualify. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
                     salt: String = "graft"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // draw ∈ (0,1]: (hash32 + 1) / 2^32 — the +1 keeps u > 0 so ln(u)
    // stays finite
    val u = (conv(hashDraw(col(idCol), salt), 16, 10).cast("double") + 1.0) / 4294967296.0
    val pri = floor(log(u) / col(weightCol).cast("double") * 1e12 + 0.5) / 1e12
    val w = Window.orderBy(col("priority").desc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0.0)
      .withColumn("priority", pri)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic weighted interleave — the FINAL data-mixing step: given
    * per-stratum mixture weights, order the corpus so that any prefix of
    * the output contains strata in proportion to their weights (weighted
    * fair queueing). Each row gets a VIRTUAL FINISH TIME
    * `vft = (2·rank_s − 1) / (2·w_s)` — rank within its stratum (by
    * deterministic hash draw) over the stratum's weight; reading rows in
    * `vft` order yields the interleave (the WFQ/virtual-time argument:
    * stratum s places its r-th row at time ≈ r/w_s, so a time-t prefix
    * holds ≈ t·w_s rows of s).
    *
    * `vft` uses ONLY +,−,×,÷ on small integers and the literal weights —
    * IEEE-exact and therefore bit-identical on any engine (unlike `pow`
    * above). Strata with no/zero weight drop (`default` applies to
    * unlisted and null strata).
    *
    * Scale shape (r10): per-stratum rank by the TWO-PHASE distributed
    * form — literal draw-bucket boundaries (the [[packSequences]]
    * mechanism), in-bucket `row_number` windows partitioned by
    * (stratum, bucket) and therefore bounded by bucket width, plus
    * per-(stratum, bucket) exclusive count offsets broadcast-joined back
    * (a #strata × #buckets table). The earlier single window per stratum
    * serialized a 10-billion-row stratum onto ONE reducer — strata are
    * few and huge by construction (domains/sources), exactly the
    * hot-key shape this library guards everywhere else. The output
    * carries `vft` rather than a global position — consumers
    * range-partition + sort by `(vft, stratumCol, idCol)`, which is how
    * a total order is written at 100 TB. The weighted input is PINNED
    * (eager checkpoint, skipped when the caller already persisted the
    * input) so the boundary sketch, the offsets subtree, and the rank
    * pass read ONE materialization — the former persist-before-calling
    * doc contract, now enforced in the operator ([[Checkpoints]]). */
  def interleaveByWeight(df: DataFrame, stratumCol: String, idCol: String,
                         weights: Map[String, Double], default: Double = 0.0,
                         salt: String = "graft"): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    require(default >= 0.0, s"default must be non-negative, got $default")
    val wCol = weights.foldLeft(when(lit(false), lit(0.0))) {
      case (acc, (stratum, wt)) => acc.when(col(stratumCol) === stratum, lit(wt))
    }.otherwise(lit(default))
    val weighted0 = df.withColumn("__w", wCol)
      .filter(col("__w") > 0.0)
      .withColumn("__draw", hashDraw(col(idCol), salt))
    // pin the (map-only-derived) weighted frame unless the caller already
    // cached the input: the boundary sketch, the offsets subtree, and the
    // rank pass all traverse it, and independent recomputations of a
    // nondeterministic upstream could disagree on boundaries vs offsets vs
    // ranks, corrupting `vft` (r10 ADVICE) — one materialization feeds all
    // three. Enforced here instead of the old persist-before-calling note.
    val weighted =
      if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) weighted0
      else Checkpoints.pin(weighted0).df
    val buckets =
      df.sparkSession.sessionState.conf.numShufflePartitions.max(1)
    val bounds = packBoundaries(weighted, "__draw", buckets)
    val parted = weighted.withColumn("__pid",
      when(col("__draw").isNull, lit(0))
        .otherwise(bucketExpr(col("__draw"), bounds)))
    val wIn = Window.partitionBy(col(stratumCol), col("__pid"))
      .orderBy(col("__draw"), col(idCol))
    val inRank = parted.withColumn("__irk", row_number().over(wIn))
    // exclusive offsets: tiny table, its prefix window partitions by
    // stratum over ≤ #buckets rows; null-safe join key preserves the
    // old window's null-stratum-as-a-group semantics
    val offW = Window.partitionBy(col("__s")).orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = parted
      .groupBy(col(stratumCol).as("__s"), col("__pid").as("__p"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", sum(col("__n")).over(offW) - col("__n"))
      .select(col("__s"), col("__p"), col("__off"))
    inRank.join(broadcast(offsets),
        col(stratumCol) <=> col("__s") && col("__pid") === col("__p"))
      .withColumn("__rk", col("__irk") + col("__off"))
      .withColumn("vft", (col("__rk").cast("double") * 2.0 - 1.0) / (col("__w") * 2.0))
      .drop("__w", "__draw", "__pid", "__irk", "__s", "__p", "__off", "__rk")
  }

  /** Per-stratum sampling rates that hit a total token budget at the given
    * mixture weights: `rate_i = min(1, budget * w_i / tokens_i)`. Join the
    * result back (broadcast — #strata rows) and sample with
    * [[stratifiedSample]]-style thresholds, or read the rates off for a
    * planner. `weights` columns: (stratumCol, weight). */
  def budgetRates(df: DataFrame, stratumCol: String, tokenCol: String,
                  weights: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val tokens = df.groupBy(col(stratumCol))
      .agg(sum(col(tokenCol)).cast("double").as("stratum_tokens"))
    tokens.join(broadcast(weights), Seq(stratumCol))
      .withColumn("rate",
        least(lit(1.0), floor(lit(budget.toDouble) * col("weight")
          / col("stratum_tokens") * 1e6 + 0.5) / 1e6))
  }
}
