package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Embedding covariance + Jacobi PCA ([[Similarity.embeddingCovariance]],
  * [[Similarity.pcaComponents]], [[Similarity.pcaProject]]): hand-checkable
  * moments, eigenstructure of a known 2-D spread, projection arithmetic,
  * and the listwise null/short-vector contract. */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  test("embeddingCovariance: hand-computed 2-D moments, i ≤ j cells only") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 9.0f))
      .toDF("embedding")
    val out = Similarity.embeddingCovariance(df, "embedding", dims = 2)
      .as[(Int, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4.get)).toMap
    // means: x̄ = 3, ȳ = 5; population cov: xx = 8/3, xy = 14/3, yy = 26/3
    assert(out.keySet == Set((0, 0), (0, 1), (1, 1)))
    assert(out((0, 0))._1 == 3L)
    assert(math.abs(out((0, 0))._2 - 8.0 / 3) < 1e-8)
    assert(math.abs(out((0, 1))._2 - 14.0 / 3) < 1e-8)
    assert(math.abs(out((1, 1))._2 - 26.0 / 3) < 1e-8)
  }

  test("embeddingCovariance: null and short vectors drop listwise") {
    val df = Seq(Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f)),
      Some(Seq(9.0f)), None).toDF("embedding")
    val out = Similarity.embeddingCovariance(df, "embedding", dims = 3)
    assert(out.select("n").as[Long].collect().forall(_ == 2L))
    assert(out.count() == 6) // 3·4/2 pairs
    intercept[IllegalArgumentException] {
      Similarity.embeddingCovariance(df, "embedding", dims = 1)
    }
  }

  test("pcaComponents: recovers the dominant axis of a stretched 2-D cloud") {
    // spread along (1,1)/√2 with tiny orthogonal noise
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0; val e = ((i * 37) % 7 - 3) / 100.0
      Seq((t + e).toFloat, (t - e).toFloat)
    }
    val cov = Similarity.embeddingCovariance(pts.toDF("embedding"), "embedding", 2)
    val comps = Similarity.pcaComponents(cov, k = 2)
    assert(comps.size == 2 && comps(0)._1 > comps(1)._1)
    val v0 = comps(0)._2
    assert(math.abs(v0(0) - math.sqrt(0.5)) < 1e-2)
    assert(math.abs(v0(1) - math.sqrt(0.5)) < 1e-2)
    // unit-norm, orthogonal, deterministic sign (largest coord positive)
    comps.foreach { case (_, v) =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
      assert(v(v.indices.maxBy(i => (math.abs(v(i)), -i))) > 0)
    }
    val dotp = comps(0)._2.zip(comps(1)._2).map(p => p._1 * p._2).sum
    assert(math.abs(dotp) < 1e-9)
  }

  test("pcaProject: centered dot products against literal components") {
    val df = Seq((1L, Seq(2.0f, 0.0f)), (2L, Seq(0.0f, 4.0f))).toDF("id", "embedding")
    val comps = Seq(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = Similarity.pcaProject(df, "embedding", Array(1.0, 2.0), comps)
      .select("id", "pca").as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(1.0, -2.0)) // (2−1, 0−2)
    assert(out(2L) == Seq(-1.0, 2.0)) // (0−1, 4−2)
  }

  test("pca end-to-end: projection onto own components decorrelates") {
    val pts = (0 until 300).map { i =>
      val t = (i % 60) / 3.0; val u = ((i * 13) % 30) / 10.0
      (i.toLong, Seq((t + u).toFloat, (t - u).toFloat, (0.1 * t + 0.2 * u).toFloat))
    }
    val df = pts.toDF("id", "embedding")
    val cov = Similarity.embeddingCovariance(df, "embedding", 3)
    val means = (0 until 3).map { i =>
      pts.map(p => math.floor(p._2(i).toDouble * 1e6 + 0.5) / 1e6).sum / pts.size
    }.toArray
    val comps = Similarity.pcaComponents(cov, k = 2)
    val proj = Similarity.pcaProject(df, "embedding", means, comps.map(_._2))
      .select(element_at(col("pca"), 1).as("p1"), element_at(col("pca"), 2).as("p2"))
    val r = proj.agg(corr(col("p1"), col("p2"))).as[Double].head()
    assert(math.abs(r) < 1e-2, s"projected coords still correlated: $r")
  }
}
