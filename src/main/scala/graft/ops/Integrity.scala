package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level integrity checks (SURVEY.md §2.6 extension) — the
  * cross-row / cross-table complement of the row-level validator
  * catalogue: foreign-key orphans, duplicate-key violations, and a
  * one-row integrity summary. These are the checks a curation pipeline
  * runs over its OWN outputs (does every chunk still reference a
  * surviving document? did dedup leave the id column unique?).
  *
  * Execution shape: [[fkOrphans]] is one left-anti equi-join on the key
  * (the parent side is key-distinct-projected first, so the join builds
  * on unique keys; AQE broadcasts dimension-sized parents). [[dupKeys]]
  * is one partial-aggregable `groupBy(key).count` HAVING > 1 — the
  * violating-key list, delta-sized output. Both read each input once.
  */
object Integrity {

  /** Child rows whose key has NO match in `parent` — FK violations,
    * full child rows preserved for quarantine. `parentKeys` names the
    * parent's key columns when they differ from the child's (positional
    * correspondence; defaults to `keys`). SQL semantics: a child row
    * with any NULL key component never matches and therefore IS an
    * orphan (pass `ignoreNullKeys = true` to exempt nullable FKs, the
    * SQL-standard MATCH SIMPLE reading). */
  def fkOrphans(child: DataFrame, parent: DataFrame, keys: Seq[String],
                parentKeys: Seq[String] = Seq.empty,
                ignoreNullKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "fkOrphans needs at least one key column")
    val pk = if (parentKeys.isEmpty) keys else parentKeys
    require(pk.size == keys.size, "parentKeys must pair up with keys")
    val parentSide = parent.select(pk.zip(keys).map { case (p, c) =>
      col(p).as(c) }: _*).dropDuplicates()
    val orphans = child.join(parentSide, keys, "left_anti")
    if (ignoreNullKeys) orphans.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    else orphans
  }

  /** Keys appearing more than once: `(keys..., n)` with n ≥ 2 — the
    * uniqueness-violation report (empty means the constraint holds).
    * Null keys group together per SQL GROUP BY. */
  def dupKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dupKeys needs at least one key column")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  /** One-row table summary against a parent: row count, distinct keys,
    * null-key rows, orphan rows, duplicate-key groups — the integrity
    * dashboard line. Two joins + two aggregates, all partial-aggregable
    * or delta-sized. */
  def summary(child: DataFrame, parent: DataFrame, keys: Seq[String],
              parentKeys: Seq[String] = Seq.empty): DataFrame = {
    val keyNull = keys.map(col(_).isNull).reduce(_ || _)
    // COUNT(DISTINCT k1, k2, ...) — standard SQL semantics (rows with any
    // null key component excluded), NOT count_distinct(struct(...)),
    // which would count the null key as its own distinct value
    val base = child.agg(
      count(lit(1)).as("n_rows"),
      count_distinct(keys.map(col).head, keys.map(col).tail: _*).as("n_distinct_keys"),
      sum(when(keyNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphans = fkOrphans(child, parent, keys, parentKeys, ignoreNullKeys = true)
      .agg(count(lit(1)).as("n_orphans"))
    val dups = dupKeys(df = child, keys = keys).agg(count(lit(1)).as("n_dup_keys"))
    base.crossJoin(orphans).crossJoin(dups)
  }

  /** Join-skew diagnosis: the `topN` heaviest keys with their row count
    * and corpus share (1e-6 floor-rounded) — the report you run BEFORE a
    * big join to decide between plain, salted ([[Layout.saltedJoin]]), or
    * AQE-skew-trusted execution, and the evidence row a pipeline logs when
    * a stage straggles. Null keys count as a key (they hash to one reducer
    * too — the most common skew culprit).
    *
    * Scale: ONE partial-aggregable count exchange keyed by the key
    * columns, then a GLOBAL top-N — Spark plans `orderBy.limit` as
    * `TakeOrderedAndProject`, each map task keeping only its local top-N
    * (no window, no second full shuffle); the total-row count rides as a
    * broadcast single-row aggregate off the same counted frame. */
  def skewReport(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val total = broadcast(counts.agg(sum(col("cnt")).as("__total")))
    counts.crossJoin(total)
      .withColumn("share",
        floor(col("cnt") / col("__total") * 1e6) / 1e6)
      .drop("__total")
      .orderBy(col("cnt").desc +: keys.map(k => col(k).asc_nulls_first): _*)
      .limit(topN)
  }
}
