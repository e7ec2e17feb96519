package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Product quantization (Jégou et al. TPAMI 2011): encode correctness
  * against a hand-computable codebook, ADC ≡ its definition, training
  * monotonicity + partitioning determinism. */
class PqSpec extends SparkSuite {
  import spark.implicits._
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("pqEncode picks the nearest centroid per subspace; ties take the smallest index") {
    // m=2 subspaces of dim 2, k=2 centroids each — all hand-checkable.
    // subspace 0: c0=(0,0), c1=(1,1); subspace 1: c0=(2,2), c1=(-1,0)
    val cb = Array[Double](0, 0, 1, 1, 2, 2, -1, 0)
    val df = Seq(
      (1L, Seq(0.1, 0.0, 2.0, 2.0)), // near (0,0) and (2,2)   -> [0, 0]
      (2L, Seq(0.9, 1.1, -1.0, 0.1)) // near (1,1) and (-1,0)  -> [1, 1]
    ).toDF("id", "v")
    val got = Similarity.pqEncode(df, "v", cb, m = 2, k = 2)
      .select($"id", $"pq_codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0) && got(2L) == Seq(1, 1))
    // exact tie: point (0.5, 0.5) is equidistant from (0,0) and (1,1)
    // in subspace 0 -> the smaller index wins
    val tie = Similarity.pqEncode(
      Seq((3L, Seq(0.5, 0.5, 2.0, 2.0))).toDF("id", "v"), "v", cb, 2, 2)
      .select($"pq_codes").collect()(0).getSeq[Int](0)
    assert(tie == Seq(0, 0))
  }

  test("pqEncode surfaces shape errors as null, not wrong codes") {
    val cb = Array[Double](0, 0, 1, 1, 2, 2, -1, 0)
    val bad = Seq((1L, Seq(0.1, 0.2, 0.3))).toDF("id", "v") // len 3, m=2
    assert(Similarity.pqEncode(bad, "v", cb, 2, 2)
      .filter($"pq_codes".isNull).count() == 1)
  }

  test("pqAdc equals its definition: sum of the query LUT at the candidate's codes") {
    val m = 8; val k = 16; val subDim = 8
    val cb = Similarity.pqSyntheticCodebook(m, k, subDim)
    val enc = Similarity.pqEncode(
      emb.limit(50), "embedding", cb, m, k).select($"vec_id", $"pq_codes")
    val q = emb.filter($"vec_id" === 0).select(
      graft.expressions.native.pqLut(
        $"embedding".cast("array<double>"), lit(cb), m, k).as("lut"))
    val lut = q.collect()(0).getSeq[Long](0)
    val scored = enc.crossJoin(broadcast(q))
      .select($"vec_id", $"pq_codes",
        graft.expressions.native.pqAdc($"pq_codes", $"lut", k).as("dist9"))
      .collect()
    scored.foreach { r =>
      val codes = r.getSeq[Int](1)
      val want = codes.zipWithIndex.map { case (c, j) => lut(j * k + c) }.sum
      assert(r.getLong(2) == want, s"vec ${r.getLong(0)}")
    }
  }

  test("pqTopK self-consistency: ranks ascend, k respected, self excluded, deterministic") {
    val m = 8; val k = 16
    val cb = Similarity.pqSyntheticCodebook(m, k, 8)
    val qs = emb.filter($"vec_id" < 2)
    def run() = Similarity.pqTopK(emb, qs, "vec_id", "embedding", cb, m, k, topK = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted.toSeq
    val a = run()
    assert(a.count(_._1 == 0L) == 4 && a.count(_._1 == 1L) == 4)
    assert(a.forall { case (q, c, _, _) => q != c })
    // ranks 1..4 with non-decreasing distance per query
    for (qid <- Seq(0L, 1L)) {
      val rows = a.filter(_._1 == qid).sortBy(_._4)
      assert(rows.map(_._4).toSeq == Seq(1, 2, 3, 4))
      assert(rows.sliding(2).forall(p => p(0)._3 <= p(1)._3))
    }
    assert(a == run())
  }

  test("knnJoin at full probe equals brute force; nprobe=1 stays within the best cell") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 4)
    val left = emb.filter($"vec_id" < 10)
    val full = Similarity.knnJoin(left, emb, cents, "vec_id", "vec_id",
        "embedding", k = 3, nprobe = 4)
      .select("left_id", "right_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: top-3 cosine over all candidates, same tie rule
    val brute = Similarity.bruteForceTopK(emb, left, "vec_id", "embedding", k = 3)
      .select($"q_id", $"cand_id", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == brute)
    // nprobe=1: every returned right sits in its left's nearest cell
    val p1 = Similarity.knnJoin(left, emb, cents, "vec_id", "vec_id",
        "embedding", k = 3, nprobe = 1)
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cell = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
      .select($"vec_id", $"centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p1.nonEmpty && p1.forall { case (l, r) => cell(l) == cell(r) })
  }

  test("trainPqCodebook: quantization error non-increasing; partitioning-invariant") {
    val m = 4; val k = 4; val subDim = 16
    val sample = emb.limit(200)
    def err(cb: Array[Double]): Long = {
      val enc = Similarity.pqEncode(sample, "embedding", cb, m, k)
      // reconstruction error via the LUT of each vector against itself:
      // dist9(sub_j, centroid(code_j)) summed — exactly pqAdc(own lut)
      enc.select(graft.expressions.native.pqAdc($"pq_codes",
          graft.expressions.native.pqLut(
            $"embedding".cast("array<double>"), lit(cb), m, k), k).as("d"))
        .agg(sum($"d")).collect()(0).getLong(0)
    }
    val e0 = err(Similarity.pqSyntheticCodebook(m, k, subDim))
    val cb1 = Similarity.trainPqCodebook(sample, "embedding", m, k, subDim, iters = 1)
    val cb3 = Similarity.trainPqCodebook(sample, "embedding", m, k, subDim, iters = 3)
    assert(err(cb1) <= e0, s"${err(cb1)} > $e0")
    assert(err(cb3) <= err(cb1), s"${err(cb3)} > ${err(cb1)}")
    // Lloyd with grid-snapped means must not depend on partitioning...
    val cb3b = Similarity.trainPqCodebook(
      sample.repartition(7), "embedding", m, k, subDim, iters = 3)
    // ...up to avg() float-order in the mean; the 1e-6 snap absorbs it
    assert(cb3.zip(cb3b).forall { case (x, y) => math.abs(x - y) <= 1e-6 })
  }
}
