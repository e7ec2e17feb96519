package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance for curated corpora (SURVEY.md §2.6
  * extension): apply an (insert/update/delete) changelog to a snapshot,
  * and diff two snapshots into added/removed/changed rows — the two halves
  * of keeping a 100 TB curated corpus in sync with a moving upstream
  * without recomputing it.
  *
  * Execution shape: [[applyChangelog]] resolves the winning change per key
  * with a map-side-combined `max_by`-style aggregate (`max(struct(seq,
  * op, payload))` — one row per key per partition crosses the exchange,
  * so a key with a million queued changes never serializes a reducer),
  * then anti-joins the base on the changed-key set (changed keys are a
  * day's delta — AQE broadcasts when small) and unions the surviving
  * upserts. The base table streams through untouched except for the
  * anti-join probe: no window over the corpus, no corpus re-sort.
  * [[snapshotDiff]] is one full outer join on the key (both sides
  * hash-partitioned) comparing a fingerprint column — emit-only output,
  * row-preserving in the worst case.
  */
object Cdc {

  /** Apply a changelog to a base snapshot. `changes` carries the key
    * columns, an `opCol` with values in {"I","U","D"} (case-sensitive),
    * a monotonically increasing `seqCol` (per-key change order — a CDC
    * LSN, a batch id, an event time), and the same payload columns as
    * `base`. The LATEST change per key wins (ties on `seqCol` resolve
    * D > U > I — a delete at the same sequence beats an upsert, the
    * conservative reading); a winning I/U replaces the base row (or
    * inserts), a winning D removes it. Base rows with no change pass
    * through untouched. Null keys in `changes` are ignored (no key to
    * address); `base` is assumed key-unique (a snapshot).
    *
    * Column contract: output schema = base schema. */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                     seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    val winner = winnersPerKey(changes, keyCols, seqCol, opCol, payload)
    val survivors = base.join(winner.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val upserts = winner.filter(col("__op_rank") < 2)
      .select(payload.map(c =>
        (if (keyCols.contains(c)) col(c) else col(s"__row.$c")).as(c)): _*)
    survivors.unionByName(upserts)
  }

  /** One winner per key: lexicographic max over (seq, op-rank, payload).
    * Op-rank D=2, U=1, I=0 makes same-seq ties deterministic (and favors
    * the delete); the payload tail makes the struct max total even for
    * byte-identical (seq, op) duplicates. Map-side-combined — one row
    * per key per partition crosses the exchange. */
  private def winnersPerKey(changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String, payload: Seq[String]): DataFrame = {
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val opRank = when(col(opCol) === "D", 2).when(col(opCol) === "U", 1)
      .when(col(opCol) === "I", 0)
    changes
      .filter(keyNotNull && col(seqCol).isNotNull && opRank.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        col(seqCol).as("__seq"), opRank.as("__op_rank"),
        struct(payload.filterNot(keyCols.contains).map(col): _*).as("__row")))
        .as("__w"))
      .select(keyCols.map(col) :+ col("__w.__op_rank").as("__op_rank") :+
        col("__w.__row").as("__row"): _*)
  }

  /** The count/sum rollup shape [[incrementalRollup]] maintains:
    * `(dims..., n_rows, n_vals, total)` with `total` a DECIMAL(38,6) sum
    * of `sumCol` — decimal so that incremental retract/insert arithmetic
    * is EXACT and addition-order-free (a float total would drift away
    * from the recompute after enough refreshes). `n_vals` counts the
    * non-null summed values: it is what lets a refresh distinguish "the
    * group's values net to zero" (total 0) from "the group has no values
    * left" (total null, SQL sum-over-nothing). */
  def rollupOf(df: DataFrame, dims: Seq[String], sumCol: String): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count(col(sumCol)).as("n_vals"),
        sum(col(sumCol).cast("decimal(38,6)")).as("total"))

  /** Incrementally refresh a materialized [[rollupOf]] aggregate from a
    * changelog — CHANGED-KEY-SIZED work instead of a corpus recompute,
    * the materialized-view-maintenance half of CDC:
    *
    *  - winning change per key (the [[applyChangelog]] rule, shared
    *    code) — one partial-aggregable exchange over the DELTA;
    *  - retract the pre-images: base semi-joined on the changed-key set
    *    (a day's delta — AQE broadcasts it) contributes (−1, −value);
    *  - insert the survivors: winning I/U rows contribute (+1, +value);
    *  - net the contributions per dim group (delta-sized aggregate) and
    *    merge into the old rollup with a null-safe full outer join on
    *    the dims (dims-sized). Groups netting to zero rows drop; groups
    *    the delta creates appear.
    *
    * Exactly equal to `rollupOf(applyChangelog(base, changes))` — the
    * decimal total makes retract-then-insert algebraically exact, which
    * is what `q_rollup_refresh` oracles against the from-scratch
    * recompute. The base table is probed ONCE (the semi-join) and never
    * re-aggregated. */
  def incrementalRollup(oldAgg: DataFrame, base: DataFrame,
      changes: DataFrame, keyCols: Seq[String], dims: Seq[String],
      sumCol: String, seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty && dims.nonEmpty)
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    val win = winnersPerKey(changes, keyCols, seqCol, opCol, payload)
    val changedKeys = win.select(keyCols.map(col): _*)
    val retract = base.join(changedKeys, keyCols, "left_semi")
      .select(dims.map(col) :+ lit(-1L).as("__dn") :+
        negate(when(col(sumCol).isNotNull, lit(1L)).otherwise(0L)).as("__dv") :+
        negate(col(sumCol).cast("decimal(38,6)")).as("__ds"): _*)
    val insert = win.filter(col("__op_rank") < 2)
      .select(payload.map(c =>
        (if (keyCols.contains(c)) col(c) else col(s"__row.$c")).as(c)): _*)
      .select(dims.map(col) :+ lit(1L).as("__dn") :+
        when(col(sumCol).isNotNull, lit(1L)).otherwise(0L).as("__dv") :+
        col(sumCol).cast("decimal(38,6)").as("__ds"): _*)
    val delta = retract.unionByName(insert)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dv")).as("__dv"),
        sum(col("__ds")).cast("decimal(38,6)").as("__ds"))
    val o = oldAgg.select(dims.map(c => col(c).as(s"__o_$c")) :+
      col("n_rows").as("__on") :+ col("n_vals").as("__ov") :+
      col("total").as("__ot"): _*)
    val d = delta.select(dims.map(c => col(c).as(s"__d_$c")) :+
      col("__dn") :+ col("__dv") :+ col("__ds"): _*)
    // null-safe on the dims: a null dim value is a real group
    val cond = dims.map(c => col(s"__o_$c") <=> col(s"__d_$c")).reduce(_ && _)
    val nVals = coalesce(col("__ov"), lit(0L)) + coalesce(col("__dv"), lit(0L))
    o.join(d, cond, "full_outer")
      .select(dims.map(c => coalesce(col(s"__o_$c"), col(s"__d_$c")).as(c)) ++ Seq(
        (coalesce(col("__on"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        nVals.as("n_vals"),
        // sum-over-nothing is NULL, exactly as a recompute would report
        when(nVals === 0L, lit(null).cast("decimal(38,6)"))
          .otherwise(coalesce(col("__ot"), lit(0).cast("decimal(38,6)")) +
            coalesce(col("__ds"), lit(0).cast("decimal(38,6)")))
          .cast("decimal(38,6)").as("total")): _*)
      .filter(col("n_rows") > 0)
  }

  /** Build an SCD-2 history table from a changelog: one validity
    * interval per change, `(keyCols..., payload..., valid_from,
    * valid_to, is_current)` — `valid_to` is the NEXT change's sequence
    * value (exclusive) or null on the key's latest row. A "D" change
    * closes the previous interval without opening one (the key has no
    * current row after a delete). Same-seq duplicates keep the
    * winning-op row only (D > U > I, the [[applyChangelog]] tie rule).
    *
    * Execution shape: one window over the CHANGELOG (delta-sized, never
    * the corpus) partitioned by key ordered by seq — `lead(seq)` closes
    * each interval; the same-seq winner pre-pass is the
    * [[applyChangelog]] map-side-combined aggregate. */
  def scdHistory(changes: DataFrame, keyCols: Seq[String], seqCol: String,
                 opCol: String): DataFrame = {
    require(keyCols.nonEmpty)
    val payload = changes.columns.toSeq.filterNot(c =>
      keyCols.contains(c) || c == seqCol || c == opCol)
    val opRank = when(col(opCol) === "D", 2).when(col(opCol) === "U", 1)
      .when(col(opCol) === "I", 0)
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // winner per (key, seq): the applyChangelog tie rule, one partial agg
    val perSeq = changes
      .filter(keyNotNull && col(seqCol).isNotNull && opRank.isNotNull)
      .groupBy((keyCols :+ seqCol).map(col): _*)
      .agg(max(struct(opRank.as("__op_rank"),
        struct(payload.map(col): _*).as("__row"))).as("__w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    perSeq
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col("__w.__op_rank") < 2) // deletes close intervals, open none
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.__row.$c").as(c)) ++
        Seq(col(seqCol).as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current")): _*)
  }

  /** Diff two snapshots keyed by `keyCols`, comparing `compareCols`
    * value-wise (null-safe). Output: key columns + `change` in
    * {"added","removed","changed"} + each compared column's before/after
    * (`<c>_before`, `<c>_after`). Unchanged rows are NOT emitted — at
    * corpus scale the diff is the small output of a big join. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty)
    val b = before.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(true))
      .toDF(keyCols ++ compareCols.map(_ + "_before") :+ "__in_b": _*)
    val a = after.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_a", lit(true))
      .toDF(keyCols ++ compareCols.map(_ + "_after") :+ "__in_a": _*)
    val sameValues = compareCols.map(c =>
      col(c + "_before") <=> col(c + "_after")).reduce(_ && _)
    b.join(a, keyCols, "full")
      .withColumn("change",
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(!sameValues, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change") :++
        compareCols.flatMap(c => Seq(col(c + "_before"), col(c + "_after"))): _*)
  }
}
