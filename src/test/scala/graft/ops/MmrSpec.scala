package graft.ops

import graft.SparkSuite

/** MMR diversified rerank ([[Similarity.mmrRerank]]): hand-traced greedy
  * selections, redundancy suppression, short-pool truncation, and a local
  * greedy reference on random candidate sets. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  // unit-vector fixtures along axes: cos is 1 for same axis, 0 across
  private def embs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f)), // duplicate direction of 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("mmr: a redundant near-top candidate loses to a diverse lower one") {
    // rel: 1 > 2 > 3; doc 2 duplicates doc 1's direction.
    // λ=0.5: pick1 = 1 (0.5·1.0); then 2 scores 0.5·0.9 − 0.5·1 = −0.05,
    // 3 scores 0.5·0.8 − 0 = 0.4, 4 scores 0.5·0.5 = 0.25 → 3, then 4.
    val cand = Seq((7L, 1L, 1.0), (7L, 2L, 0.9), (7L, 3L, 0.8), (7L, 4L, 0.5))
      .toDF("qid", "doc_id", "rel")
    val out = Similarity.mmrRerank(cand, "qid", "doc_id", "rel",
        embs, "vec_id", "embedding", k = 3, lambda = 0.5)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 4L))
    assert(math.abs(out(0)._3 - 0.5) < 1e-9)
    assert(math.abs(out(1)._3 - 0.4) < 1e-9)
    assert(math.abs(out(2)._3 - 0.25) < 1e-9)
  }

  test("mmr: λ=1 is pure relevance order; ties break by doc id") {
    val cand = Seq((7L, 3L, 0.9), (7L, 1L, 0.9), (7L, 4L, 0.2))
      .toDF("qid", "doc_id", "rel")
    val out = Similarity.mmrRerank(cand, "qid", "doc_id", "rel",
        embs, "vec_id", "embedding", k = 3, lambda = 1.0)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 4L)) // 0.9-tie → lower id first
  }

  test("mmr: pool shorter than k truncates; missing vectors drop") {
    val cand = Seq((7L, 1L, 1.0), (7L, 99L, 0.9)).toDF("qid", "doc_id", "rel")
    val out = Similarity.mmrRerank(cand, "qid", "doc_id", "rel",
        embs, "vec_id", "embedding", k = 5, lambda = 0.5)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(1L)) // 99 has no vector
  }

  test("mmr matches a local greedy reference on random candidates") {
    val rnd = new scala.util.Random(53)
    val dim = 8
    val vecs = (0L until 40L).map(i =>
      (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
    val cands = for (q <- 1L to 6L; d <- rnd.shuffle(vecs.map(_._1)).take(12))
      yield (q, d, math.floor(rnd.nextDouble() * 1e6) / 1e6)
    val got = Similarity.mmrRerank(cands.toDF("qid", "doc_id", "rel"),
        "qid", "doc_id", "rel", vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4, lambda = 0.7)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    // local greedy with the same unit-normalize + 1e-9 floor rounding
    val unit = vecs.map { case (i, v) =>
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      i -> d.map(_ / n)
    }.toMap
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val want = cands.groupBy(_._1).view.mapValues { cs =>
      var sel = Vector.empty[(Long, Double)]
      var pool = cs.map(c => (c._2, c._3)).toVector
      for (_ <- 1 to 4 if pool.nonEmpty) {
        val scored = pool.map { case (id, rel) =>
          val sim = if (sel.isEmpty) 0.0
            else sel.map { case (sid, _) =>
              unit(id).zip(unit(sid)).map(p => p._1 * p._2).sum }.max
          val mmr = if (sel.isEmpty) r9(rel * 0.7)
            else r9(rel * 0.7 - (1.0 - 0.7) * math.max(-1.0, sim))
          (id, mmr)
        }
        val best = scored.minBy { case (id, m) => (-m, id) }
        sel :+= best
        pool = pool.filterNot(_._1 == best._1)
      }
      sel.toSeq
    }.toMap
    for (q <- want.keys) {
      assert(got(q).map(_._1) == want(q).map(_._1), s"qid=$q selection order")
      got(q).zip(want(q)).foreach { case ((_, gm), (_, wm)) =>
        assert(math.abs(gm - wm) < 1e-9, s"qid=$q mmr") }
    }
  }
}
