package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reporting rollups over curated corpora (SURVEY.md §2.6 extension):
  * per-group top-k, fixed-schema pivot counts, and equi-width histograms
  * — the summary shapes every corpus dashboard asks for, each in its one
  * scale-correct plan.
  *
  * Execution shape: [[topKPerGroup]] is a rank-≤-k window that Spark
  * plans with `WindowGroupLimit` — each map task pre-prunes to its local
  * top-k BEFORE the exchange, so a group with a billion rows ships
  * k·partitions rows, not its whole history. [[pivotCounts]] uses an
  * EXPLICIT pivot-value list: one partial-aggregable pass, no
  * distinct-values pre-query, stable output schema (the two-pass
  * `pivot(col)` without values is the documented anti-pattern — it runs
  * an extra corpus scan and its schema drifts with the data).
  * [[equiWidthHistogram]] is map-only bin assignment + one count
  * aggregate over #bins rows.
  */
object Rollups {

  /** Top `k` rows per group by `orderCol` (descending by default; ties
    * broken by `tieCol` ascending for determinism). Output = input
    * columns + `rank` (1-based). Null order values sort last and null
    * groups are kept as their own group (SQL GROUP BY semantics). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
                   k: Int, tieCol: String, descending: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    val ord = if (descending) col(orderCol).desc_nulls_last else col(orderCol).asc_nulls_last
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord, col(tieCol).asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Count matrix `rowCol × values(pivotCol)`: one output row per
    * distinct `rowCol`, one `n_<value>` column per pivot value (the
    * explicit list pins the schema; values absent from the data produce
    * zeros, rows whose pivot value is outside the list count only toward
    * `n_other`). One partial-aggregable pass. */
  def pivotCounts(df: DataFrame, rowCol: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs an explicit pivot-value list")
    val counts = values.map(v =>
      sum(when(col(pivotCol) === v, 1L).otherwise(0L)).as(s"n_$v"))
    val other = sum(when(col(pivotCol).isNull ||
      !col(pivotCol).isInCollection(values), 1L).otherwise(0L)).as("n_other")
    df.groupBy(col(rowCol)).agg(counts.head, counts.tail :+ other: _*)
  }

  /** Equi-width histogram of `valueCol` over `[min, max)` in `bins`
    * buckets: `(bin, lo, hi, n)` with underflow in bin 0's count only if
    * `clamp` (default: out-of-range and null values are DROPPED — the
    * profiling default; pass clamp = true to fold under/overflow into
    * the edge bins). Empty bins are emitted with n = 0 (the output is
    * always exactly `bins` rows — chart-ready). Map-only assignment +
    * one #bins-row count aggregate + a broadcast fill join. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, min: Double,
                         max: Double, bins: Int,
                         clamp: Boolean = false): DataFrame = {
    require(bins >= 1 && max > min, s"need bins >= 1 and max > min")
    val width = (max - min) / bins
    val v = col(valueCol).cast("double")
    val raw = floor((v - min) / width).cast("long")
    val bin = if (clamp) least(greatest(raw, lit(0L)), lit(bins - 1L))
              else when(raw >= 0 && raw < bins, raw)
    val counts = df.filter(v.isNotNull).withColumn("bin", bin)
      .filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val frame = spark.range(bins).select(col("id").as("bin"))
    frame.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(min) + col("bin") * width).as("lo"),
        (lit(min) + (col("bin") + 1) * width).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Retention cohorts — the activity-over-time report every event
    * stream ends up needing: users grouped by FIRST-active month
    * (`cohort_month` as a months-since-epoch index, engine-portable
    * integer arithmetic), counted in every later month they return
    * (`offset_m` months after the cohort month, 0 = the cohort month
    * itself). Emits `(cohort_month, offset_m, n_users)`.
    *
    * Scale: per-(user, month) activity dedups in one partial-aggregable
    * exchange (the corpus collapses to user-month granularity before
    * anything else happens); first-active month is a map-side-combined
    * `min` per user; the cohort join is user-keyed; the final count is
    * a cohort×offset-sized aggregate. No windows, no distinct-count
    * over the raw stream. Null users/timestamps drop. */
  def retentionCohorts(df: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val monthIdx = (year(col(tsCol)) * 12 + month(col(tsCol))).cast("int")
    val um = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"), monthIdx.as("__m"))
      .distinct()
    val cohorts = um.groupBy(col("__u")).agg(min(col("__m")).as("__cm"))
    um.join(cohorts, "__u")
      .groupBy(col("__cm").as("cohort_month"),
        (col("__m") - col("__cm")).as("offset_m"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** CUBE counts over two dimensions — every subtotal combination
    * (a,b)/(a)/(b)/() in ONE pass with `grouping_id` disambiguating the
    * levels (the [[topKPerGroup]]-adjacent reporting shape; `rollup`'s
    * hierarchical cousin is exercised as `q_rollup`). Value mass rides
    * along as an exact DECIMAL sum cast to double at the boundary.
    * Output: `(dim1, dim2, grouping_id, n, total)`. */
  def cubeCounts(df: DataFrame, dim1: String, dim2: String,
                 valueCol: String): DataFrame =
    df.cube(col(dim1), col(dim2))
      .agg(grouping_id().cast("integer").as("grouping_id"),
        count(lit(1)).as("n"),
        sum((floor(col(valueCol).cast("double") * 1e6 + lit(0.5)) / 1e6)
          .cast("decimal(28,6)")).cast("double").as("total"))
      .select(col(dim1), col(dim2), col("grouping_id"), col("n"), col("total"))

  /** Period-over-period report: per calendar month, the exact DECIMAL
    * value total, the previous month's total, the delta, and the percent
    * change — the WoW/MoM dashboard primitive. `pct_change` is null for
    * the first month and when the previous total is 0 (no base to
    * compare against). Months index as integer months-since-epoch (the
    * [[retentionCohorts]] convention) so both engines bucket
    * identically; output carries the month's first day as a date.
    *
    * One partial-aggregable month pass; the lag window runs over the
    * #months-row table (bounded state). */
  def periodOverPeriod(df: DataFrame, timeCol: String,
                       valueCol: String): DataFrame = {
    val m = (year(col(timeCol)) * 12 + month(col(timeCol)) - 1 - lit(12 * 1970))
      .as("__m")
    val byMonth = df.filter(col(timeCol).isNotNull)
      .groupBy(m)
      .agg(count(lit(1)).as("n"),
        sum((floor(col(valueCol).cast("double") * 1e6 + lit(0.5)) / 1e6)
          .cast("decimal(28,6)")).as("__t"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__m"))
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    byMonth
      .withColumn("__p", lag(col("__t"), 1).over(w))
      .select(
        add_months(lit("1970-01-01").cast("date"), col("__m")).as("month"),
        col("n"), col("__t").cast("double").as("total"),
        col("__p").cast("double").as("prev_total"),
        (col("__t") - col("__p")).cast("double").as("delta"),
        when(col("__p").isNotNull && col("__p") =!= 0,
          r9((col("__t") - col("__p")).cast("double") /
            col("__p").cast("double"))).as("pct_change"))
  }

  /** Per-group percentile report (the SLA table): p50/p90/p99-style
    * exact interpolated percentiles of `valueCol` per group, computed as
    * ONE percentile-over-array aggregate per group (one sort buffer, not
    * one per requested percentile — the q_quantile_buckets lesson) and
    * exploded to columns. Results floor-round at 1e-9
    * (`percentile` ≡ DuckDB `quantile_cont`). For corpus-scale groups
    * swap in `percentile_approx` upstream; this is the exact form. */
  def groupPercentiles(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1], got $ps")
    def r9(c: Column) = floor(c * 1e9 + lit(0.5)) / 1e9
    val agg = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        percentile(col(valueCol), array(ps.map(lit): _*)).as("__ps"))
    agg.select(groupCols.map(col) ++ Seq(col("n")) ++
      ps.zipWithIndex.map { case (p, i) =>
        r9(element_at(col("__ps"), i + 1))
          .as("p" + math.round(p * 100).toInt)
      }: _*)
  }

  /** RFM segmentation — the classic customer/entity triage: per key,
    * Recency (days since last activity, against the corpus's own max
    * date as the anchor so the result is data-determined, not
    * wall-clock-dependent), Frequency (activity count), Monetary (value
    * sum), each scored 1–5 by `ntile(5)` so segment sizes are equal by
    * construction. Higher score = better: MORE recent, MORE frequent,
    * MORE value — so recency ntiles over days-since DESCENDING. Every
    * ntile orders with the key as the final tiebreak — a TOTAL order,
    * which is what makes ntile deterministic and cross-engine-mirrorable
    * (ntile on a partial order is plan-dependent).
    *
    * Execution shape: one partial-aggregable groupBy(key) builds the
    * per-key triple; the three ntiles are single-partition windows over
    * the #keys-row aggregate — the documented bounded-state class when
    * keys are customer-scale; for billion-key universes swap ntile for
    * [[graft.ops.Sketches.quantileBuckets]] (approximate, fully
    * distributed) — same contract, sketch-grade boundaries.
    *
    * Output: `(keyCol, recency_days, frequency, monetary, r, f, m)`. */
  def rfmSegments(df: DataFrame, keyCol: String, timeCol: String,
                  valueCol: String): DataFrame = {
    val base = df.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
    val anchor = base.agg(to_date(max(col(timeCol))).as("__anchor"))
    val perKey = base.groupBy(col(keyCol))
      .agg(to_date(max(col(timeCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol)).as("monetary"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("__anchor"), col("__last")).cast("long"))
      .drop("__anchor", "__last")
    import org.apache.spark.sql.expressions.Window
    val wR = Window.orderBy(col("recency_days").desc, col(keyCol))
    val wF = Window.orderBy(col("frequency").asc, col(keyCol))
    val wM = Window.orderBy(col("monetary").asc_nulls_first, col(keyCol))
    perKey.select(col(keyCol), col("recency_days"), col("frequency"),
      col("monetary"),
      ntile(5).over(wR).as("r"), ntile(5).over(wF).as("f"),
      ntile(5).over(wM).as("m"))
  }
}
