package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for 100 TB table management (SURVEY.md §4 /
  * SCALE.md): co-located joins via bucketing, exchange reuse via explicit
  * key repartitioning, and salting for skewed keys. These don't add new
  * semantics — they shape where the shuffles happen so repeated big joins
  * and aggregations on the same keys pay for partitioning once.
  */
object Layout {

  /** Hash-repartition on join/agg keys. Chains of joins/aggs on the same
    * keys then reuse this single exchange (Catalyst recognizes the
    * partitioning and drops later ENSURE_REQUIREMENTS exchanges). */
  def repartitionByKeys(df: DataFrame, numPartitions: Int, keys: String*): DataFrame =
    df.repartition(numPartitions, keys.map(col): _*)

  /** Persist as a bucketed (and optionally sorted) parquet table. Two
    * tables bucketed on the same keys with the same bucket count equi-join
    * WITHOUT any shuffle — the scale path for repeated fact↔fact joins. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Salt the skewed (fact) side: deterministic salt derived from a row id
    * so re-runs are stable. Join key becomes (key, salt). */
  def saltFact(df: DataFrame, idCol: String, saltBuckets: Int,
               saltCol: String = "_salt"): DataFrame =
    df.withColumn(saltCol, pmod(xxhash64(col(idCol)), lit(saltBuckets)).cast("int"))

  /** Explode the small (dim) side across every salt value so each salted
    * fact partition finds its match. */
  def explodeDim(df: DataFrame, saltBuckets: Int, saltCol: String = "_salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(saltBuckets - 1))))

  /** Salted equi-join: behavior-identical to `fact.join(dim, keys)` but the
    * hot keys spread over `saltBuckets` reducers. Use when one key carries
    * a disproportionate share of rows and AQE skew handling isn't enough. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 factIdCol: String, saltBuckets: Int = 8): DataFrame = {
    val saltedF = saltFact(fact, factIdCol, saltBuckets)
    val saltedD = explodeDim(dim, saltBuckets)
    saltedF.join(saltedD, keys :+ "_salt").drop("_salt")
  }

  /** Deterministic train/val/test split by id hash: map-only, stable
    * across runs/clusters (no `rand()` — re-running a sample on new data
    * keeps every previously-assigned row in the same split), and
    * disjoint-and-exhaustive by construction. `fractions` are (name,
    * weight) pairs; weights are normalized. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         fractions: Seq[(String, Double)],
                         splitCol: String = "_split",
                         buckets: Int = 10000): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0))
    val total = fractions.map(_._2).sum
    val b = pmod(xxhash64(col(idCol)), lit(buckets))
    // cumulative upper bounds over the bucket space
    val bounds = fractions.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(f => math.round(f * buckets))
    val expr = fractions.init.zip(bounds.init).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), hi)) =>
        when(b < hi, name).otherwise(acc)
      }
    df.withColumn(splitCol, expr)
  }
}
