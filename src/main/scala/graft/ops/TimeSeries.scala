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
}
