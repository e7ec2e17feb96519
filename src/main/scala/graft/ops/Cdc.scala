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
    val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
    // one winner per key: lexicographic max over (seq, op-rank, payload).
    // op-rank D=2, U=1, I=0 makes same-seq ties deterministic (and favors
    // the delete); the payload tail makes the struct max total even for
    // byte-identical (seq, op) duplicates.
    val opRank = when(col(opCol) === "D", 2).when(col(opCol) === "U", 1)
      .when(col(opCol) === "I", 0)
    val winner = changes
      .filter(keyNotNull && col(seqCol).isNotNull && opRank.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        col(seqCol).as("__seq"), opRank.as("__op_rank"),
        struct(payload.filterNot(keyCols.contains).map(col): _*).as("__row")))
        .as("__w"))
      .select(keyCols.map(col) :+ col("__w.__op_rank").as("__op_rank") :+
        col("__w.__row").as("__row"): _*)
    val survivors = base.join(winner.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val upserts = winner.filter(col("__op_rank") < 2)
      .select(payload.map(c =>
        (if (keyCols.contains(c)) col(c) else col(s"__row.$c")).as(c)): _*)
    survivors.unionByName(upserts)
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
