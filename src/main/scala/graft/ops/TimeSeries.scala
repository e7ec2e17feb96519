package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series feature extraction (SURVEY.md §2.6 extension):
  * lag/delta features, rolling row-frame statistics, trailing time-range
  * counts, and an exponentially-weighted moving average — the feature
  * block that turns an event log into model inputs.
  *
  * All rolling features are plain window functions over ONE exchange on
  * the key: Catalyst plans a single `Exchange(keyCols)` + sort feeding
  * every frame, and bounded ROWS/RANGE frames keep per-row state O(frame),
  * never O(partition).
  *
  * EWMA is the interesting one at scale: `y_t = (1-α)·y_{t-1} + α·x_t` is
  * a sequential recurrence, and the two textbook encodings both fail on a
  * hot key — an iterator over the key's whole sorted history serializes it
  * through one task, and the closed form evaluated via `pow(1-α, -rn)`
  * prefix sums overflows a double past a few thousand rows. [[ewma]]
  * exploits the fact that the recurrence FORGETS: a term `L` rows back
  * carries weight `(1-α)^L < 1e-18` — below double precision — once
  * `L ≥ 18·ln10 / −ln(1-α)` (~394 rows at α=0.1). A two-level scan is
  * therefore exact to machine precision with every exponent bounded:
  * fixed-width blocks give an in-block decayed prefix (exponents ≤ the
  * block width, itself clamped to the precision horizon), and a per-key
  * BLOCK table (width× smaller) carries cross-block state as a few
  * constant-decay `lag` terms. A hot key parallelizes across its blocks
  * instead of serializing through one task.
  */
object TimeSeries {

  /** Rolling features per key, ordered by `timeCol` (ties broken by
    * `tieCol` for determinism). Adds to each input row:
    *  - `lag_1`      — previous row's value (null at the key's start)
    *  - `delta`      — value − lag_1
    *  - `roll_avg`   — mean over the trailing `rowFrame` rows (incl. current)
    *  - `roll_min` / `roll_max` over the same frame
    *  - `n_range`    — row count in the trailing `rangeSeconds` seconds
    *                   (RANGE frame on the epoch second, incl. current).
    * Rows with a null key or time are dropped (they have no position in
    * any frame). */
  def rollingFeatures(df: DataFrame, keyCol: String, timeCol: String,
                      valueCol: String, tieCol: String,
                      rowFrame: Int = 5, rangeSeconds: Long = 3600): DataFrame = {
    require(rowFrame >= 1 && rangeSeconds >= 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    val rows = w.rowsBetween(-(rowFrame - 1).toLong, 0)
    // RANGE frames need a single numeric sort key: seconds since epoch
    val wRange = Window.partitionBy(col(keyCol))
      .orderBy(unix_timestamp(col(timeCol)))
      .rangeBetween(-rangeSeconds, 0)
    val v = col(valueCol)
    df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("lag_1", lag(v, 1).over(w))
      .withColumn("delta", v - col("lag_1"))
      .withColumn("roll_avg", avg(v).over(rows))
      .withColumn("roll_min", min(v).over(rows))
      .withColumn("roll_max", max(v).over(rows))
      .withColumn("n_range", count(lit(1)).over(wRange))
  }

  /** Exponentially-weighted moving average per key (pandas
    * `ewm(alpha).mean()` with `adjust=false` semantics: `y_0 = x_0`,
    * `y_t = (1-α)·y_{t-1} + α·x_t`). Adds an `ewma` column; ordering is
    * (`timeCol`, `tieCol`); rows with a null key, time, or value drop
    * (a null observation has no defined place in the recurrence — filter
    * or impute upstream if gap-skipping is wanted).
    *
    * Derivation (β = 1−α, rn the per-key 0-based row number, z_0 = x_0
    * and z_i = α·x_i for i>0, so y_t = Σ_{i≤t} z_i·β^(rn_t−rn_i)):
    * split rn = blk·W + off with W the block width. Then
    * `y_t = β^off_t · ( Σ_{i: blk_i=blk_t, i≤t} z_i·β^(−off_i)  +  C_blk )`
    * where `C_b = Σ_{a<b} β^((b−a)·W) · U_a` and `U_a = Σ_{i∈a}
    * z_i·β^(−off_i)`. Every block before the key's last is FULL (row
    * numbers are contiguous), so `(b−a)·W` is the exact row gap scale.
    * Bounds: W is clamped to the precision horizon so `β^(−off)` never
    * exceeds ~1e18 (no overflow, and the terms it amplifies are exactly
    * the recent ones that dominate y); C_b keeps only lag terms with
    * `β^(j·W) ≥ 1e-18` — everything dropped is below the relative
    * precision of a double sum, so the result equals the full recurrence
    * to the last representable bit for any key length. `blockSize` only
    * trades parallelism against carry-table size. */
  def ewma(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
           tieCol: String, alpha: Double, blockSize: Int = 256): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(blockSize >= 2)
    val beta = 1.0 - alpha
    // rows after which a term's weight drops below double precision
    val horizon = math.ceil(18 * math.log(10) / -math.log(beta)).toInt.max(1)
    val W = blockSize.min(horizon).max(2)
    val lookback = math.ceil(horizon.toDouble / W).toInt.max(1)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    val base = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("__blk", expr(s"__rn div ${W}L"))
      .withColumn("__off", col("__rn") % W)
      .withColumn("__z", col(valueCol) *
        when(col("__rn") === 0, 1.0).otherwise(alpha))
    // level 1 — in-block decayed prefix numerator Σ z·β^(−off), one
    // unbounded-preceding frame over the (key, block) partition: state is
    // a single double, partition length capped at W rows
    val wBlk = Window.partitionBy(col(keyCol), col("__blk"))
      .orderBy(col("__off")).rowsBetween(Window.unboundedPreceding, 0)
    val inBlock = base.withColumn("__pref",
      sum(col("__z") * pow(lit(beta), -col("__off"))).over(wBlk))
    // level 2 — per-block totals U_a (partial-aggregable groupBy, W×
    // smaller than the data), then the carry as `lookback` constant-decay
    // lag terms (each β^(j·W) is a literal; no row-dependent exponent
    // inside any window aggregate)
    val wCarry = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val carryExpr = (1 to lookback).map { j =>
      coalesce(lag(col("__u"), j).over(wCarry), lit(0.0)) *
        lit(math.pow(beta, j.toDouble * W))
    }.reduce(_ + _)
    val carry = inBlock.groupBy(col(keyCol).as("__k"), col("__blk").as("__b"))
      .agg(sum(col("__z") * pow(lit(beta), -col("__off"))).as("__u"))
      .withColumn("__carry", carryExpr)
      .select(col("__k"), col("__b"), col("__carry"))
    inBlock.join(carry,
        inBlock(keyCol) === col("__k") && col("__blk") === col("__b"), "left")
      .withColumn("ewma",
        pow(lit(beta), col("__off")) * (col("__pref") + coalesce(col("__carry"), lit(0.0))))
      .drop("__k", "__b", "__carry", "__pref", "__z", "__rn", "__blk", "__off")
  }

  /** Merge overlapping (or touching) `[start, end]` intervals per key —
    * the gaps-and-islands normalization behind availability windows,
    * crawl-visit coalescing, and per-document span-set compaction. Output:
    * one row per merged island `(keyCol, island, startCol, endCol,
    * n_merged)` with `island` the key's 0-based island ordinal.
    *
    * Islands form where an interval starts strictly after the running max
    * end of everything before it; `start <= prevMax` (touch or overlap)
    * merges. Columns may be numeric or timestamp — only `>`/`max` order
    * semantics are used. Rows with a null key/bound, or `end < start`,
    * drop (an unordered interval has no extent).
    *
    * Scale: ONE exchange on the key; the running max is an
    * unbounded-preceding ROWS frame (O(1) incremental state per row, never
    * a buffered partition) and the island roll-up is a partial-aggregable
    * `groupBy` — a key with a billion intervals costs its sort, nothing
    * quadratic. */
  def mergeIntervals(df: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val (s, e) = (col(startCol), col(endCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(s, e)
    val prevMax = max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(keyCol).isNotNull && s.isNotNull && e.isNotNull && e >= s)
      .withColumn("__new", when(prevMax.isNull || s > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .groupBy(col(keyCol), col("island"))
      .agg(min(s).as(startCol), max(e).as(endCol), count(lit(1)).as("n_merged"))
  }

  /** Batch sessionization — assign every event its key's 0-based
    * `session_id`, a new session opening where the gap to the previous
    * event exceeds `gapSeconds` (the batch twin of the streaming
    * `StreamingValidate.sessionCounts`; this row-level form feeds
    * per-event features — position-in-session, time-since-session-start —
    * that the aggregate-only streaming shape cannot). Ties on `timeCol`
    * break by `tieCol` for a deterministic recurrence. Rows with a null
    * key or time drop.
    *
    * Scale: gaps-and-islands over ONE key exchange — `lag` + running sum
    * are O(1)-state ROWS frames; no per-session buffering, no second
    * shuffle. Session-level stats are one further partial-aggregable
    * `groupBy(key, session_id)` away (see `q_sessionize`). */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    val ts = unix_timestamp(col(timeCol))
    val gap = ts - lag(ts, 1).over(w)
    events.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("__new", when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__new")
  }

  /** One-sided (positive) CUSUM changepoint scores per key — the
    * sequential drift detector for per-slice volume/score series
    * ("did this source's daily document count shift upward, and when").
    * For deviations `d_t = x_t − target − slack`, the standard recurrence
    * `S_t = max(0, S_{t−1} + d_t)` is NOT a window aggregate — but its
    * closed form is: `S_t = C_t − min(0, min_{j≤t} C_j)` with `C` the
    * plain prefix sum of `d`. Two cumulative window passes over ONE key
    * exchange therefore compute the exact recurrence with no iterator,
    * no recursion, and no per-key serialization beyond the sort every
    * window op already pays.
    *
    * `df` is the (already aggregated) series `(keyCol, timeCol,
    * valueCol)`; `targets` maps each key to its in-control mean
    * `(keyCol, targetCol)` — model-sized (one row per key) and
    * broadcast. Deviations are snapped through DECIMAL(18,6) so the
    * prefix sums are addition-order-free; `s_pos` rounds at 1e-6.
    * Output: input rows + `s_pos` (the CUSUM score) + `alarm`
    * (`s_pos > threshold`). Null key/time/value rows drop.
    *
    * Scale: one hash exchange on the key + one sort feeding both
    * cumulative frames; per-row state is O(1). Keys are independent —
    * a million series parallelize freely. */
  def cusum(df: DataFrame, keyCol: String, timeCol: String, valueCol: String,
            targets: DataFrame, targetCol: String,
            slack: Double, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dev = (col(valueCol).cast("decimal(18,6)") -
      col(targetCol).cast("decimal(18,6)") -
      lit(slack).cast("decimal(18,6)"))
    df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .join(broadcast(targets.select(col(keyCol), col(targetCol))), Seq(keyCol))
      .withColumn("__c", sum(dev).over(w))
      .withColumn("__m", least(min(col("__c")).over(w), lit(0).cast("decimal(18,6)")))
      .withColumn("s_pos",
        floor((col("__c") - col("__m")).cast("double") * 1e6 + lit(0.5)) / 1e6)
      .withColumn("alarm", col("s_pos") > threshold)
      .drop("__c", "__m", targetCol)
  }

  /** Kaplan–Meier survival estimator over right-censored durations — the
    * churn/retention curve done correctly: users still active at the
    * observation cutoff are CENSORED (they inform the at-risk set for as
    * long as observed, but are not deaths), which naive retention
    * cohorting silently miscounts. `df` carries one row per subject:
    * `durationCol` (numeric time-to-event-or-censoring) and `eventCol`
    * (1 = event observed, 0 = censored). Returns one row per distinct
    * OBSERVED-event time `t`, ascending: `(t, n_risk, n_events,
    * survival)` with `S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)`.
    *
    * Numeric discipline: the product runs as `exp(Σ ln(1 − d/n))` with
    * each ln-term floor-rounded at 1e-12 and summed as DECIMAL — the
    * [[graft.ops.LmScore]] KL discipline — so the curve is
    * addition-order-free and exactly SQL-mirrorable; `survival` rounds
    * at 1e-9. When the at-risk set is exhausted at an event time
    * (`d = n`) the curve is EXACTLY 0 from that point on (the ln(0)
    * case, handled as a flag, never a −Inf in the plan).
    *
    * Scale: one partial-aggregable groupBy(duration), then cumulative
    * windows over the DISTINCT-DURATION table (bounded by the time
    * resolution — days/weeks in practice, the q_histogram class; grid
    * durations upstream if sub-second). Null duration/event rows drop. */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val perT = df.filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_events"),
        count(lit(1)).as("n_total"))
    val wAll = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = perT.agg(sum(col("n_total")).as("__N"))
    val atRisk = perT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("__N") - coalesce(sum(col("n_total")).over(wAll), lit(0L)))
      .filter(col("n_events") > 0)
    // events at times BETWEEN rows of this filtered table still reduce
    // n_risk correctly: n_risk came from the UNFILTERED cumulative
    val term = (floor(
      log(lit(1.0) - col("n_events").cast("double") / col("n_risk").cast("double"))
        * 1e12 + lit(0.5)) / 1e12).cast("decimal(28,12)")
    atRisk
      .withColumn("__dead", max(when(col("n_events") === col("n_risk"), 1L)
        .otherwise(0L)).over(wCum))
      .withColumn("__lnsum",
        sum(when(col("n_events") < col("n_risk"), term)
          .otherwise(lit(0).cast("decimal(28,12)"))).over(wCum))
      .select(col("t"), col("n_risk"), col("n_events"),
        when(col("__dead") === 1, 0.0)
          .otherwise(floor(exp(col("__lnsum").cast("double")) * 1e9 + lit(0.5)) / 1e9)
          .as("survival"))
  }

  /** Autocorrelation function per key: Pearson correlation of the series
    * with itself at lags `1..maxLag` — the seasonality/persistence audit
    * for event-volume and score series (a strong lag-7 on daily counts is
    * weekly rhythm; near-zero everywhere says the metric is noise).
    *
    * Each lag pairs `(x_t, x_{t−lag})` via a `lag` window (rows with no
    * lagged partner drop, matching the textbook "overlapping pairs" ACF
    * estimator), then reuses the [[Sketches.correlationMatrix]] numeric
    * discipline: moment sums in DECIMAL over 1e-6-snapped values (exact,
    * addition-order-free), closed-form corr in double, floor-rounded at
    * 1e-9, null when n < 2 or either variance is 0.
    *
    * Output: `(keyCol, lag, n, acf)` — one row per key × lag.
    *
    * Scale: ONE key exchange + sort feeds all `maxLag` lag columns (same
    * window), and the moment aggregation is partial-aggregable per
    * (key, lag); nothing is ever single-partition. */
  def autocorrelation(df: DataFrame, keyCol: String, timeCol: String,
                      valueCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be ≥ 1, got $maxLag")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    def dec(c: Column) = c.cast("decimal(18,6)")
    val base = df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
      col(valueCol).isNotNull)
    val lagged = (1 to maxLag).foldLeft(base) { (acc, l) =>
      acc.withColumn(s"__lag_$l", lag(col(valueCol), l).over(w))
    }
    val pairs = lagged.select(col(keyCol),
      posexplode(array((1 to maxLag).map(l => col(s"__lag_$l")): _*))
        .as(Seq("__l0", "y")), col(valueCol).as("x"))
      .withColumn("lag", col("__l0") + 1)
      .filter(col("y").isNotNull)
    val m = pairs.groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = nD * d("sxy") - d("sx") * d("sy")
    val denx = nD * d("sxx") - d("sx") * d("sx")
    val deny = nD * d("syy") - d("sy") * d("sy")
    m.select(col(keyCol), col("lag").cast("integer").as("lag"), col("n"),
      when(col("n") >= 2 && denx > 0 && deny > 0,
        floor(num / sqrt(denx * deny) * 1e9 + lit(0.5)) / 1e9).as("acf"))
  }

  /** Theil–Sen robust trend per key: slope = MEDIAN of all pairwise
    * slopes `(v_k − v_j)/(days between)`, intercept = median of
    * `v − slope·days-since-epoch` — the outlier-proof regression line
    * (breakdown point ~29%) for "is this source actually growing" on
    * series where one spiky day wrecks OLS. Time is compared at DAY
    * resolution (feed [[resampleDaily]]-shaped series); same-day pairs
    * contribute no slope.
    *
    * Pair generation is a per-key self-join — C(n,2) rows per key — so
    * `maxPoints` HARD-FAILS (plan-side raise_error, the
    * [[graft.ops.Baskets.frequentPairs]] cap idiom) instead of silently
    * exploding on an unbounded-history key; at the 1000 default a key
    * caps at ~500k pair rows. Slopes/residuals snap to 1e-9 BEFORE the
    * exact interpolated median (`percentile` ≡ DuckDB `quantile_cont`),
    * so interpolation ulp cannot flip a result.
    *
    * Output: one row per key with ≥ 2 distinct days —
    * `(keyCol, n_points, n_pairs, slope, intercept)`. */
  def theilSen(df: DataFrame, keyCol: String, timeCol: String,
               valueCol: String, maxPoints: Int = 1000): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be ≥ 2, got $maxPoints")
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    val pts = df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), to_date(col(timeCol)).as("__d"),
        col(valueCol).cast("double").as("__v"))
    val sizes = pts.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
    val capMsg = concat(
      lit(s"theilSen: a key exceeds maxPoints=$maxPoints observations (key="),
      col("__k").cast("string"), lit(", n="), col("__n").cast("string"),
      lit(") — resample the series down or raise maxPoints"))
    val checked = pts.join(sizes, "__k")
      .withColumn("__k", when(col("__n") <= maxPoints, col("__k"))
        .otherwise(raise_error(capMsg).cast(pts.schema("__k").dataType)))
      .drop("__n")
    val a = checked.select(col("__k"), col("__d").as("d1"), col("__v").as("v1"))
    val b = checked.select(col("__k"), col("__d").as("d2"), col("__v").as("v2"))
    val slopes = a.join(b, Seq("__k")).filter(col("d1") < col("d2"))
      .select(col("__k"),
        r9((col("v2") - col("v1")) /
          datediff(col("d2"), col("d1")).cast("double")).as("__s"))
    val fit = slopes.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_pairs"),
        r9(percentile(col("__s"), lit(0.5))).as("slope"))
    val resid = checked.join(fit, Seq("__k"))
      .select(col("__k"), col("n_pairs"), col("slope"),
        r9(col("__v") - col("slope") *
          datediff(col("__d"), lit("1970-01-01").cast("date")).cast("double"))
          .as("__r"))
    resid.groupBy(col("__k"), col("n_pairs"), col("slope"))
      .agg(count(lit(1)).as("n_points"),
        r9(percentile(col("__r"), lit(0.5))).as("intercept"))
      .select(col("__k").as(keyCol), col("n_points"), col("n_pairs"),
        col("slope"), col("intercept"))
  }

  /** Holt double-exponential (level + trend) smoothing per key, to the
    * final state and an h-step forecast — "is this source's volume
    * trending up, and where does it land next week": the trend-aware
    * upgrade of [[ewma]] for capacity and drift monitoring. Standard
    * recurrence from `l₁ = y₁, b₁ = y₂ − y₁`:
    * `l_t = α·y_t + (1−α)(l+b)`, `b_t = β(l_t − l_prev) + (1−β)b`,
    * forecast `l_n + h·b_n`. Each step's level/trend snap to the 1e-12
    * grid (the pageRank quantum discipline) so the fold is bitwise
    * cross-engine-stable; α/β are used as literals on both sides, never
    * derived by runtime subtraction.
    *
    * Execution shape: the recurrence is inherently sequential, so it
    * runs as ONE in-row `aggregate` fold over each key's ORDERED series
    * — per-key cost and state are bounded by that key's own series
    * length, which this op CONTRACTS to be bounded (feed it
    * [[resampleDaily]]-shaped fixed-step series: length ≤ span days; an
    * unbounded-history key is the documented funnel-class hot-key). Keys
    * with fewer than 2 observations drop (no trend exists).
    *
    * Output: one row per key —
    * `(keyCol, n, level, trend, forecast)`. */
  def holtSmooth(df: DataFrame, keyCol: String, timeCol: String,
                 valueCol: String, alpha: Double = 0.5, beta: Double = 0.3,
                 horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(horizon >= 0, s"horizon must be ≥ 0, got $horizon")
    def snap(c: Column) = floor(c / 1e-12 + lit(0.5)) * 1e-12
    val series = df
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(transform(
        array_sort(collect_list(struct(col(timeCol).as("t"),
          col(valueCol).cast("double").as("v")))),
        s => s.getField("v")).as("ys"))
      .filter(size(col("ys")) >= 2)
    val y1 = element_at(col("ys"), 1)
    val y2 = element_at(col("ys"), 2)
    val init = struct(snap(y1).as("l"), snap(y2 - y1).as("b"))
    val fin = aggregate(slice(col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
      init, (st, y) => {
        val lNew = snap(lit(alpha) * y +
          lit(1.0 - alpha) * (st.getField("l") + st.getField("b")))
        val bNew = snap(lit(beta) * (lNew - st.getField("l")) +
          lit(1.0 - beta) * st.getField("b"))
        struct(lNew.as("l"), bNew.as("b"))
      })
    series.select(col(keyCol), size(col("ys")).cast("long").as("n"),
        fin.getField("l").as("level"), fin.getField("b").as("trend"))
      .withColumn("forecast",
        snap(col("level") + lit(horizon.toDouble) * col("trend")))
  }

  /** Additive seasonal decomposition of per-key FIXED-STEP series
    * (classic decomposition, STL's simple ancestor): `trend` = centered
    * moving average over one period, `seasonal` = each phase's mean
    * detrended value (re-centered to sum ≈ 0), `resid` = the rest — the
    * "is Sunday always low, or did something break on this Sunday"
    * separation behind seasonality-aware drift alerts. Feed it
    * [[resampleDaily]]-shaped complete grids; gaps bias the phase means
    * exactly as in the textbook method.
    *
    * Odd `period` uses the symmetric (period−1)/2-radius window; even
    * `period` uses the standard 2×MA (half-weight endpoints). Trend (and
    * therefore seasonal/resid) is null within the first/last half-window
    * of each key — the honest edge, not an extrapolation.
    *
    * Numeric discipline: values snap to the 1e-6 grid and every window
    * mean runs as a DECIMAL sum divided in double — window-aggregate
    * summation ORDER is engine-internal (segment trees vs sliding
    * accumulators), so float window sums are not cross-engine-stable but
    * exact decimal sums are (the corpusDivergence rule applied to
    * windows). Published quantities floor-round at 1e-9.
    *
    * Output: input keys × steps —
    * `(keyCol, timeCol, valueCol, trend, seasonal, resid)`. */
  def seasonalDecompose(df: DataFrame, keyCol: String, timeCol: String,
                        valueCol: String, period: Int = 7): DataFrame = {
    require(period >= 2, s"period must be ≥ 2, got $period")
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    val v6 = (floor(col(valueCol).cast("double") * 1e6 + lit(0.5)) / 1e6)
      .cast("decimal(28,6)")
    val base = df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("__v", v6)
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val half = period / 2
    val trend =
      if (period % 2 == 1) {
        val w = wOrd.rowsBetween(-half, half)
        when(count(col("__v")).over(w) === period,
          r9(sum(col("__v")).over(w).cast("double") / period.toDouble))
      } else {
        // 2×MA: mean of the two period-wide windows offset by one step —
        // equivalently half-weight endpoints over 2·half+1 rows
        val wA = wOrd.rowsBetween(-half, half - 1)
        val wB = wOrd.rowsBetween(-half + 1, half)
        when(count(col("__v")).over(wA) === period &&
            count(col("__v")).over(wB) === period,
          r9((sum(col("__v")).over(wA).cast("double") / period.toDouble +
            sum(col("__v")).over(wB).cast("double") / period.toDouble) / 2.0))
      }
    val wKey = Window.partitionBy(col(keyCol))
    val wPhase = Window.partitionBy(col(keyCol), col("__phase"))
    val detr = base
      .withColumn("__idx", row_number().over(wOrd))
      .withColumn("__phase", (col("__idx") - 1) % period)
      .withColumn("trend", trend)
      // detrended values re-snapped to a grid and summed as DECIMAL so
      // the unordered phase/key partition sums are addition-order-free
      .withColumn("__d",
        (floor((col("__v").cast("double") - col("trend")) * 1e9 + lit(0.5)) / 1e9)
          .cast("decimal(28,9)"))
    val out = detr
      .withColumn("__pm", sum(col("__d")).over(wPhase).cast("double") /
        count(col("__d")).over(wPhase).cast("double"))
      .withColumn("__gm", sum(col("__d")).over(wKey).cast("double") /
        count(col("__d")).over(wKey).cast("double"))
      .withColumn("seasonal",
        when(col("__pm").isNotNull && col("__gm").isNotNull,
          r9(col("__pm") - col("__gm"))))
      .withColumn("resid",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          r9(col("__v").cast("double") - col("trend") - col("seasonal"))))
    out.select(col(keyCol), col(timeCol), col(valueCol),
      col("trend"), col("seasonal"), col("resid"))
  }

  /** Last-observation-carried-forward (LOCF) gap fill: per key, ordered
    * by `(timeCol, tieCol)`, replace a null `valueCol` with the most
    * recent non-null observation — THE imputation rule for sensor/metric
    * feeds where a missing reading means "unchanged", and the batch twin
    * of what a streaming state store does with stale keys. Leading nulls
    * (no prior observation) stay null; [[imputeMedian]]-style global
    * fills are a different policy, not a default here.
    *
    * ONE window over the key exchange with an O(1) `last(_, ignoreNulls)`
    * frame — no join, no per-gap scan-back; mirrors as SQL
    * `last_value ... IGNORE NULLS`. Output: the input columns with
    * `valueCol` filled and `was_filled` marking imputed rows. */
  def locfFill(df: DataFrame, keyCol: String, timeCol: String,
               tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__filled", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("was_filled",
        col(valueCol).isNull && col("__filled").isNotNull)
      .withColumn(valueCol, col("__filled"))
      .drop("__filled")
  }

  /** Resample an irregular per-key series onto the DAILY grid with
    * as-of (LOCF) fill: for every key, one row per calendar day from its
    * first to its last observation, carrying the latest observed value at
    * or before that day's end — the "align sensor feeds / fill trading
    * holidays" primitive that turns event logs into fixed-step series for
    * [[autocorrelation]]/[[cusum]]. Day d carries the last value with
    * `date(timeCol) ≤ d` (ties within a day resolve by `(timeCol,
    * tieCol)` — the day's FINAL observation wins, the standard
    * daily-close convention).
    *
    * Execution shape: the per-(key, day) close is ONE window over the key
    * exchange (`row_number` desc, `WindowGroupLimit`-prunable); the grid
    * is a `sequence(first_day, last_day)` explode — per-key output is
    * span-bounded and the fill is the SAME gaps-and-islands LOCF window
    * as [[locfFill]] over the union of grid and close rows, so nothing
    * joins corpus × grid. A key whose span is pathological (one key
    * covering decades at second resolution) bounds at span-days rows —
    * the hot-key story is the funnel/rolling one.
    *
    * Output: `(keyCol, day, valueCol)` — one row per key per day in its
    * own observed span. */
  def resampleDaily(df: DataFrame, keyCol: String, timeCol: String,
                    tieCol: String, valueCol: String): DataFrame = {
    val obs = df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
      col(valueCol).isNotNull)
    // per-(key, day) close: last observation of the day
    val wDay = Window.partitionBy(col(keyCol), to_date(col(timeCol)))
      .orderBy(col(timeCol).desc, col(tieCol).desc)
    val closes = obs
      .withColumn("__rn", row_number().over(wDay))
      .filter(col("__rn") === 1)
      .select(col(keyCol), to_date(col(timeCol)).as("day"),
        col(valueCol).as("__v"))
    // per-key daily grid across the observed span
    val grid = obs.groupBy(col(keyCol))
      .agg(to_date(min(col(timeCol))).as("__d0"),
        to_date(max(col(timeCol))).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    // LOCF over the union: close rows carry values, grid rows inherit
    // the latest close at or before their day (close sorts first on ties
    // via the marker so the same-day close wins)
    val wFill = Window.partitionBy(col(keyCol))
      .orderBy(col("day"), col("__isGrid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.withColumn("__isGrid", lit(1))
      .withColumn("__v", lit(null).cast(obs.schema(valueCol).dataType))
      .unionByName(closes.withColumn("__isGrid", lit(0)))
      .withColumn("__f", last(col("__v"), ignoreNulls = true).over(wFill))
      .filter(col("__isGrid") === 1)
      .select(col(keyCol), col("day"), col("__f").as(valueCol))
  }
}
