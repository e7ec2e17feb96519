package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-level validation session — the Spark re-expression of the
  * reference's `FilterRunner` (`filters/base.py::FilterRunner`, SURVEY.md
  * §2.5). Instead of a per-record session object, validation appends a
  * single `_errors` column; `valid` / `invalid` are DataFrame splits and
  * error statistics are ordinary aggregations.
  */
object Validate {
  val ErrorsCol = "_errors"

  /** Validate one column in place: replaces it with the cleaned value and
    * merges this column's errors into `_errors` (created if absent).
    * `key` defaults to the column name — the dotted context key on errors.
    */
  def column(df: DataFrame, colName: String, v: Validator, key: String = null): DataFrame = {
    val k = if (key == null) colName else key
    val vTmp = s"__vv_$colName"
    val eTmp = s"__ve_$colName"
    // backtick-quote references: a literal dotted column name ("user.name"
    // from a CSV header) must not parse as struct-field access
    def q(n: String) = col(s"`$n`")
    // Apply each chain step behind its own projection so step N+1
    // references step N's RESULT ATTRIBUTE, not its expression tree —
    // otherwise a value-coercing chain duplicates each step's CASE into
    // every reference the next step makes (exponential growth; large
    // chains then overflow codegen into interpreted evaluation).
    // CollapseProject keeps the barriers: the produced expressions are
    // non-cheap and multiply-referenced.
    var cur = df.withColumn(vTmp, df(s"`$colName`")).withColumn(eTmp, Errs.none)
    for (leaf <- v.flattened) {
      val (nv, ne) = leaf.step(q(vTmp), q(eTmp), lit(k))
      cur = cur.withColumns(Map(vTmp -> nv, eTmp -> ne))
    }
    val step2 = cur.withColumn(colName, q(vTmp))
    val step3 =
      if (df.columns.contains(ErrorsCol))
        // coalesce: a pre-existing null _errors (user column collision,
        // union with an unvalidated frame) must not null the whole merge —
        // concat(null, x) = null would silently drop the row from BOTH
        // valid and invalid splits
        step2.withColumn(ErrorsCol, concat(coalesce(col(ErrorsCol), Errs.none), q(eTmp)))
      else
        step2.withColumn(ErrorsCol, q(eTmp))
    step3.drop(vTmp, eTmp)
  }

  /** Validate several columns, accumulating all their errors — the
    * DataFrame-level equivalent of the reference's `FilterMapper` over a
    * whole record (each field's chain short-circuits individually; errors
    * from different fields all accumulate). */
  def columns(df: DataFrame, specs: (String, Validator)*): ValidationResult = {
    def annotate(src: DataFrame) =
      specs.foldLeft(src) { case (d, (c, v)) => column(d, c, v) }
    val useBarrier = specs.exists(_._2.needsBarrier)
    // Barrier pushdown hybrid: the barrier blocks EVERY conjunct of the
    // split filter from reaching the scan, including the free IsNotNull a
    // leading Required implies. Re-derive those input-level facts and plant
    // them BELOW the validation projections (directly on the source) for
    // the valid split — they push to parquet; the dropped rows were invalid
    // by construction. invalid/flagged/failFast must see every row, so only
    // `valid` uses the pre-filtered twin.
    val pushed = specs.flatMap { case (c, v) => v.pushedPredicate(df(s"`$c`")) }
    val pushedValid =
      if (useBarrier && pushed.nonEmpty) Some(annotate(df.filter(pushed.reduce(_ && _))))
      else None
    ValidationResult(annotate(df), useBarrier, pushedValid)
  }

  def apply(df: DataFrame, specs: (String, Validator)*): ValidationResult =
    columns(df, specs: _*)
}

/** Result of a validation run: the annotated DataFrame plus the
  * `is_valid` / `cleaned_data` / `errors` views the reference exposes.
  *
  * `useBarrier`: a chain's state expressions reference the previous step
  * ~3×, so when predicate pushdown substitutes the split filter through the
  * step projections the predicate grows ~3^steps (and filter codegen has no
  * common-subexpression elimination). Spark pushes even non-deterministic
  * CONDITIONS through deterministic projects (cardinality is unchanged), so
  * the only reliable barrier is a non-deterministic PROJECT FIELD that the
  * filter references: a `spark_partition_id()` tag column with an
  * always-true predicate on it. Long/heavy chains get the tag; short cheap
  * chains skip it so their predicates still push into the scan
  * (e.g. IsNotNull from Required reaches parquet PushedFilters). */
final case class ValidationResult(df: DataFrame, useBarrier: Boolean = false,
                                  pushedValid: Option[DataFrame] = None) {
  import Validate.ErrorsCol
  private val Tag = "__graft_barrier"

  private def split(base: DataFrame, cond: Column => Column): DataFrame =
    if (useBarrier)
      base.withColumn(Tag, spark_partition_id())
        .filter(cond(col(ErrorsCol)) && col(Tag) >= 0)
        .drop(Tag)
    else base.filter(cond(col(ErrorsCol)))

  /** Rows with no errors, `_errors` dropped (reference `cleaned_data`).
    * Uses the pushdown twin when present: same rows, but input-level
    * preconditions (IsNotNull from Required) sit below the barrier and
    * reach the scan. */
  def valid: DataFrame =
    split(pushedValid.getOrElse(df), e => size(e) === 0).drop(ErrorsCol)

  /** Rows with at least one error, `_errors` kept (quarantine split). */
  def invalid: DataFrame = split(df, e => size(e) > 0)

  /** Flag column instead of a split. */
  def flagged(flag: String = "_valid"): DataFrame =
    df.withColumn(flag, size(col(ErrorsCol)) === 0)

  /** One row per (key, code) with a count — reference `error_codes`
    * aggregated over the whole dataset. */
  def errorCodes: DataFrame =
    df.select(explode(col(ErrorsCol)).as("e"))
      .groupBy(col("e.key").as("key"), col("e.code").as("code"))
      .agg(count(lit(1)).as("n"))

  /** Invalid-value handler policies (reference `filters/handlers.py`):
    * the default is Collect/Memory (the `_errors` column itself). */

  /** ExceptionHandler: fail the JOB on the first invalid record —
    * `raise_error` inside the plan, so the check is distributed and
    * short-circuits the action. */
  def failFast: DataFrame = {
    val e = element_at(col(ErrorsCol), 1)
    val withAssert = df.withColumn("_assert",
      when(size(col(ErrorsCol)) > 0,
        raise_error(concat(lit("Invalid value ["), e.getField("key"), lit("/"),
          e.getField("code"), lit("]: "), e.getField("message"))))
        .otherwise(lit(null)))
    val guarded =
      if (useBarrier)
        withAssert.withColumn(Tag, spark_partition_id())
          .filter(col("_assert").isNull && col(Tag) >= 0).drop(Tag)
      else withAssert.filter(col("_assert").isNull)
    guarded.drop("_assert", ErrorsCol)
  }

  /** LogHandler: valid rows pass through; invalid rows are summarized to
    * the supplied logger (per key/code counts — bounded driver traffic,
    * never the rows themselves). The annotated frame is persisted so the
    * summary job and the caller's subsequent action on the returned frame
    * share one source scan + validation; call `.unpersist()` on `df` when
    * done, or use `observed()` + [[Metrics]] for a zero-extra-job variant. */
  def logInvalid(log: String => Unit): DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try errorCodes.collect().foreach { r =>
      log(s"[graft] ${r.getAs[String]("key")}/${r.getAs[String]("code")}: ${r.getAs[Long]("n")} invalid")
    } catch {
      // don't leak the cached frame when the summary job fails — the
      // caller never gets a handle to unpersist it
      case e: Throwable => df.unpersist(); throw e
    }
    valid
  }

  /** Per-run metric counters via `Dataset.observe` (no extra job): rows
    * observed + invalid rows, published to QueryExecutionListeners. */
  def observed(name: String = "graft_validation"): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(size(col(ErrorsCol)) > 0, 1L).otherwise(0L)).as("n_invalid"))
}
