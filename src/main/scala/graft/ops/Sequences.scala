package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) matching (SURVEY.md §2.6 extension):
  * for each key, find the earliest completion of an ordered list of event
  * types — "view, then click, then purchase, all within the horizon" — and
  * report how far each key got plus the step timestamps. The analytics
  * counterpart of `MATCH_RECOGNIZE` / ClickHouse `windowFunnel`, and the
  * curation counterpart of "did this session produce a conversion label".
  *
  * Semantics (greedy earliest-first, the standard funnel definition):
  * `t1 = min time of step 1`; `t_i = min time of step i strictly after
  * t_{i-1}` (and, with a horizon, at most `t1 + horizon`). Greedy earliest
  * matching is optimal here: taking the earliest possible step i never
  * forecloses a later step, so a key completes the funnel under SOME
  * assignment iff it completes under the greedy one (exchange argument —
  * any witness's step-i time is ≥ the greedy t_i, so the greedy prefix
  * always extends at least as far).
  *
  * Execution shape (the 100 TB rationale): NOT a per-key sort. The obvious
  * encodings — collect each key's events into one sorted list
  * (`mapGroups`) or run k window functions over the raw events — serialize
  * a hot key's entire event history through one task. Instead each step is
  * one filtered conditional aggregation: pass i scans only the step-i
  * events (a `filter` that reaches the parquet scan as a pushed predicate
  * on the type column), shuffle-aggregates `min(time)` per key against the
  * previous pass's per-key frame, and emits ONE ROW PER KEY. Per-pass cost
  * is a map-side-combined `min` — a key with a billion step-i events still
  * contributes one row per partition to the exchange. Funnel depth k costs
  * k such passes joined on the key (all equi-joins on frames of #keys
  * rows, AQE-planned); depth is a query constant (3–6), not data-sized.
  */
object Sequences {

  /** Earliest-completion funnel. Output: one row per key that has at least
    * one step-1 event — `(keyCol, step_reached, t_1 .. t_k)` with
    * `step_reached` in `[1, k]` and `t_i` null beyond the reached step.
    * Keys with no step-1 event do not appear (they reached step 0; emit
    * them by left-joining this result back to your key universe).
    *
    * `horizon` (e.g. `expr("INTERVAL 7 DAYS")`) bounds the WHOLE funnel:
    * every step beyond the first must land within `t1 + horizon`. Equal
    * timestamps do NOT advance the funnel (strictly-after matching): a
    * click logged at exactly the view's timestamp is ambiguous evidence of
    * order, so it is not counted — the documented tie rule.
    *
    * Null keys and null times never match (SQL equi-join semantics).
    */
  def funnel(events: DataFrame, keyCol: String, timeCol: String,
             typeCol: String, steps: Seq[String],
             horizon: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = col(keyCol)
    // pass 1: earliest step-1 event per key
    var acc = events
      .filter(col(typeCol) === steps.head && k.isNotNull && col(timeCol).isNotNull)
      .groupBy(k).agg(min(col(timeCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      // pass i+1: earliest step event strictly after the previous step's
      // time (and inside the horizon). The join keys on keyCol only; the
      // time bound is a residual predicate on the equi-join — no theta
      // join, no window. `acc` is #keys rows; at corpus scale both sides
      // shuffle on the key and AQE picks the join strategy.
      val stepEvents = events.filter(col(typeCol) === step &&
        k.isNotNull && col(timeCol).isNotNull)
      val bound = horizon match {
        case Some(h) => col(timeCol) > col(prev) && col(timeCol) <= col("t_1") + h
        case None    => col(timeCol) > col(prev)
      }
      acc = stepEvents.join(acc, Seq(keyCol), "right")
        .groupBy((k +: (1 to i).map(j => col(s"t_$j"))): _*)
        .agg(min(when(bound, col(timeCol))).as(cur))
    }
    // fold ascending so the DEEPEST step's check lands outermost:
    // when(t_k notnull, k) else when(t_{k-1} notnull, k-1) … else 0
    val stepReached = steps.indices.foldLeft(lit(0)) { case (e, i) =>
      when(col(s"t_${i + 1}").isNotNull, lit(i + 1)).otherwise(e)
    }
    acc.select(k +: steps.indices.map(i => col(s"t_${i + 1}")): _*)
      .withColumn("step_reached", stepReached)
  }

  /** Funnel summary: how many keys reached AT LEAST each step — the
    * conversion report. One row per step `(step, step_type, n_keys)`;
    * `n_keys` is cumulative-from-the-top (step 1 counts every key in the
    * [[funnel]] output). A single partial-aggregable pass over the
    * #keys-row funnel frame. */
  def funnelCounts(funnelResult: DataFrame, steps: Seq[String]): DataFrame = {
    val perStep = steps.indices.map { i =>
      sum(when(col("step_reached") >= i + 1, 1L).otherwise(0L)).as(s"__n_${i + 1}")
    }
    val wide = funnelResult.agg(perStep.head, perStep.tail: _*)
    val stacked = explode(array(steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("step_type"),
        col(s"__n_${i + 1}").as("n_keys"))): _*))
    wide.select(stacked.as("s")).select(col("s.step"), col("s.step_type"), col("s.n_keys"))
  }

  /** First-order transition counts over per-key event sequences —
    * the Markov/path-analysis primitive behind "what do users do after
    * X" and session-flow graphs: for every key, events order by
    * `(timeCol, tieCol)` and each consecutive `(previous, current)`
    * pair counts once; emits `(from_event, to_event, n)` corpus-wide.
    * `tieCol` must break timestamp ties (an event id) or the sequence —
    * and therefore the counts — is not well-defined.
    *
    * Scale: ONE window partitioned by key (bounded by each key's own
    * event count — the [[funnel]]/rolling-features class, with the same
    * hot-key caveat: a single key owning a corpus-scale history is a
    * salting/slicing story), then a partial-aggregable count over the
    * (from, to) vocabulary. Null keys/times drop; each key's first
    * event has no predecessor and feeds no pair. */
  def transitionCounts(events: DataFrame, keyCol: String, timeCol: String,
                       eventCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    events
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(eventCol).isNotNull)
      .withColumn("__prev", lag(col(eventCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_event"), col(eventCol).as("to_event"))
      .agg(count(lit(1)).as("n"))
  }

  /** Last-touch attribution: for every CONVERSION event (`typeCol ==
    * convType`), the most recent PRIOR non-conversion event of the same
    * key — "which channel gets credit for this purchase", the simplest
    * of the standard attribution models (first-touch is the same window
    * with `first(...)`; position-based models compose from both). Output:
    * one row per conversion — key, conversion time, `attributed_type` /
    * `attributed_ts` (null when nothing precedes it — organic), and
    * `gap_seconds`.
    *
    * Execution shape: ONE window over the key exchange (ordered by time
    * with `tieCol` for a deterministic recurrence) carrying two
    * `last(_, ignoreNulls)` frames up to the previous row — O(1) state,
    * no join, no per-conversion scan-back; mirrors as SQL
    * `last_value ... IGNORE NULLS`. Conversions count as touches for
    * LATER conversions only if `convTouches` (repeat-purchase credit vs
    * channel-only attribution — both conventions exist; default false). */
  def lastTouchAttribution(events: DataFrame, keyCol: String, timeCol: String,
                           tieCol: String, typeCol: String, convType: String,
                           convTouches: Boolean = false): DataFrame = {
    // `timeCol` must be a real timestamp: anything else (string, date)
    // would silently misparse — or mis-scale — inside the gap arithmetic
    require({
        import org.apache.spark.sql.types._
        Seq(TimestampType, TimestampNTZType).contains(events.schema(timeCol).dataType)
      },
      s"lastTouchAttribution needs a timestamp timeCol, got " +
        s"${events.schema(timeCol).dataType.simpleString} for '$timeCol'")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = if (convTouches) col(typeCol)
      else when(col(typeCol) =!= convType, col(typeCol))
    val touchTs = if (convTouches) col(timeCol)
      else when(col(typeCol) =!= convType, col(timeCol))
    // gap = second-boundary diff computed TIMEZONE-FREE: truncate both
    // ends to the second and subtract as an interval. unix_timestamp()
    // would route TIMESTAMP_NTZ through the session time zone — across a
    // DST transition the gap would diverge from the wall-clock difference
    // a second engine computes (r13 advice); interval arithmetic on NTZ
    // is pure wall-clock, and on instant timestamps it is the instant
    // diff — correct in both cases.
    def secFloor(c: Column) = date_trunc("second", c)
    events.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("attributed_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("attributed_ts", last(touchTs, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(col(keyCol), col(timeCol), col("attributed_type"),
        col("attributed_ts"),
        (secFloor(col(timeCol)) - secFloor(col("attributed_ts")))
          .cast("long").as("gap_seconds"))
  }

  /** First-touch attribution — [[lastTouchAttribution]]'s mirror image:
    * for every conversion, the EARLIEST prior non-conversion event of the
    * same key ("which channel first brought this user in"). Same window
    * exchange, same output shape, `first(_, ignoreNulls)` instead of
    * `last`; same timestamp contract and TZ-free gap. */
  def firstTouchAttribution(events: DataFrame, keyCol: String, timeCol: String,
                            tieCol: String, typeCol: String, convType: String,
                            convTouches: Boolean = false): DataFrame = {
    require({
        import org.apache.spark.sql.types._
        Seq(TimestampType, TimestampNTZType).contains(events.schema(timeCol).dataType)
      },
      s"firstTouchAttribution needs a timestamp timeCol, got " +
        s"${events.schema(timeCol).dataType.simpleString} for '$timeCol'")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = if (convTouches) col(typeCol)
      else when(col(typeCol) =!= convType, col(typeCol))
    val touchTs = if (convTouches) col(timeCol)
      else when(col(typeCol) =!= convType, col(timeCol))
    def secFloor(c: Column) = date_trunc("second", c)
    events.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .withColumn("attributed_type", first(touch, ignoreNulls = true).over(w))
      .withColumn("attributed_ts", first(touchTs, ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(col(keyCol), col(timeCol), col("attributed_type"),
        col("attributed_ts"),
        (secFloor(col(timeCol)) - secFloor(col("attributed_ts")))
          .cast("long").as("gap_seconds"))
  }

  /** Position-based (U-shaped) multi-touch attribution: every conversion
    * splits its credit across the touches of its own JOURNEY — the
    * non-conversion events between the key's previous conversion and this
    * one (the repeat-purchase journey-reset convention). Weights are the
    * standard 40/20/40: a single touch takes 1.0, two touches take 0.5
    * each, three or more give 0.4 to the first, 0.4 to the last, and the
    * middles split the remaining 0.2 evenly. Conversions with no prior
    * touch in their journey emit nothing (organic — [[lastTouchAttribution]]
    * reports them with null attribution); touches after the key's final
    * conversion earn no credit.
    *
    * Output: one row per (conversion, credited touch) —
    * `(keyCol, conv_ts, touch_ts, touch_type, weight)`.
    *
    * Execution shape: ONE ordered window over the key exchange assigns
    * every event its journey index (running count of PRIOR conversions),
    * then per-(key, journey) windows rank the touches — all bounded by a
    * key's own event history (the [[funnel]] hot-key caveat applies), and
    * the conversion join is an equi-join on (key, journey) frames of
    * #conversions rows. Credit math is exact double division — no
    * accumulation, safe to hash-compare across engines. */
  def positionAttribution(events: DataFrame, keyCol: String, timeCol: String,
                          tieCol: String, typeCol: String,
                          convType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events
      .filter(col(keyCol).isNotNull && col(timeCol).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__journey",
        coalesce(sum(when(col(typeCol) === convType, 1L).otherwise(0L)).over(w),
          lit(0L)) + 1L)
    val wj = Window.partitionBy(col(keyCol), col("__journey"))
      .orderBy(col(timeCol), col(tieCol))
    val touches = base.filter(col(typeCol) =!= convType)
      .withColumn("__rn", row_number().over(wj))
      .withColumn("__cnt", count(lit(1)).over(
        Window.partitionBy(col(keyCol), col("__journey"))))
      .select(col(keyCol), col("__journey"),
        col(timeCol).as("touch_ts"), col(typeCol).as("touch_type"),
        col("__rn"), col("__cnt"))
    val convs = base.filter(col(typeCol) === convType)
      .select(col(keyCol), col("__journey"), col(timeCol).as("conv_ts"))
    val weight = when(col("__cnt") === 1, lit(1.0))
      .when(col("__cnt") === 2, lit(0.5))
      .when(col("__rn") === 1 || col("__rn") === col("__cnt"), lit(0.4))
      .otherwise(lit(0.2) / (col("__cnt") - 2).cast("double"))
    convs.join(touches, Seq(keyCol, "__journey"))
      .select(col(keyCol), col("conv_ts"), col("touch_ts"),
        col("touch_type"), weight.as("weight"))
  }
}
