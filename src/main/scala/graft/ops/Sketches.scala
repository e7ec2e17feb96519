package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
