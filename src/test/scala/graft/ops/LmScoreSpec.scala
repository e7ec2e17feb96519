package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Unigram LM scoring ([[LmScore]]): vocabulary determinism, probability
  * bookkeeping, OOV handling, and a hand-computed reference pin. */
class LmScoreSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the the dog"),
    (3L, "zzz qqq")
  ).toDF("doc_id", "text")

  test("vocab: counts, logp over TOTAL tokens, deterministic tie order, top-k clamp") {
    val v = LmScore.unigramVocab(docs, "text", k = 3)
      .as[(String, Double)].collect().toMap
    // counts: the=3, cat/sat/dog/zzz/qqq=1 each; total=8; top-3 = the + 2
    // lexicographic singles (cat, dog)
    assert(v.keySet == Set("the", "cat", "dog"))
    assert(math.abs(v("the") - math.log(3.0 / 8.0)) < 1e-12)
    assert(math.abs(v("cat") - math.log(1.0 / 8.0)) < 1e-12)
  }

  test("scores: in-vocab mean, OOV floor, empty docs drop, hand-computed pin") {
    val v = LmScore.unigramVocab(docs, "text", k = 3)
    val oov = math.log(1.0 / 64.0)
    val out = LmScore.unigramLogLikelihood(docs, "doc_id", "text", v, oov)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 1: the(3/8) cat(1/8) sat(OOV)
    assert(out(1L) == ((3L, r6((math.log(3.0 / 8) + math.log(1.0 / 8) + oov) / 3))))
    // doc 3: both OOV
    assert(out(3L) == ((2L, r6(oov))))
    // well-modelled docs score higher than gibberish
    assert(out(1L)._2 > out(3L)._2)
    val withEmpty = docs.union(Seq((9L, " ")).toDF("doc_id", "text"))
    val n = LmScore.unigramLogLikelihood(withEmpty, "doc_id", "text", v, oov).count()
    assert(n == 3)
  }

  test("perplexity terciles: per-stratum boundaries, head=best third, null stratum grouped") {
    // 6 en docs with strictly ordered ll (token 'the' frequency rises) +
    // 2 null-lang docs — boundaries must be computed per stratum
    val corpus = Seq(
      (1L, "zz qq xx", "en"), (2L, "zz qq the", "en"), (3L, "zz the the", "en"),
      (4L, "the the xx", "en"), (5L, "the the the", "en"), (6L, "the the qq the", "en"),
      (10L, "zz zz zz", null), (11L, "the the zz", null))
      .toDF("doc_id", "text", "lang")
    val v = LmScore.unigramVocab(corpus, "text", k = 4)
    val out = LmScore.perplexityTerciles(corpus, "doc_id", "text", "lang", v, -20.0)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getString(4)))).toMap
    assert(out.size == 8)
    // en: strictly increasing ll by doc construction → terciles split 2/2/2
    val en = (1L to 6L).map(i => out(i)).sortBy(_._1)
    assert(en.map(_._2) == Seq("tail", "tail", "middle", "middle", "head", "head"),
      s"en buckets must follow the ll order, got $en")
    // null-lang docs get their OWN boundaries (null-safe grouping): the
    // better-modelled of the two is head, not judged by en's thresholds
    assert(out(11L)._2 == "head" && out(10L)._2 == "tail")
    // boundary semantics: a doc AT the rounded p67 boundary is head (>=)
    val bothSame = Seq((1L, "the the", "en"), (2L, "the the", "en"), (3L, "the the", "en"))
      .toDF("doc_id", "text", "lang")
    val same = LmScore.perplexityTerciles(bothSame, "doc_id", "text", "lang",
      LmScore.unigramVocab(bothSame, "text", 2), -20.0)
      .collect().map(_.getString(4))
    assert(same.forall(_ == "head"), "identical ll ⇒ everyone at the boundary ⇒ all head")
    // the percentile_approx scale path runs and keeps the schema
    val approx = LmScore.perplexityTerciles(corpus, "doc_id", "text", "lang", v, -20.0,
      approxAccuracy = 10000)
    assert(approx.columns.toSeq ==
      Seq("doc_id", "lang", "n_tok", "ll", "bucket") && approx.count() == 8)
  }

  test("importance weights favor target-like documents (DSIR selection order)") {
    val target = Seq((100L, "alpha beta alpha beta gamma")).toDF("doc_id", "text")
    val base = Seq((200L, "delta epsilon zeta delta epsilon"),
      (201L, "alpha delta epsilon zeta")).toDF("doc_id", "text")
    val vt = LmScore.unigramVocab(target, "text", k = 100)
    val vb = LmScore.unigramVocab(base, "text", k = 100)
    val docs = Seq(
      (1L, "alpha beta gamma"),   // target-like → positive log ratio
      (2L, "delta epsilon zeta"), // base-like → negative
      (3L, "qqq www eee")         // OOV both → ~0
    ).toDF("doc_id", "text")
    val w = LmScore.importanceWeights(docs, "doc_id", "text", vt, vb, oovLogp = -15.0)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > 0.5, s"target-like doc should score high, got ${w(1L)}")
    assert(w(2L) < -0.5, s"base-like doc should score low, got ${w(2L)}")
    assert(math.abs(w(3L)) < 0.5, s"OOV-everywhere doc should be neutral, got ${w(3L)}")
    assert(w(1L) > w(3L) && w(3L) > w(2L))
  }

  test("bigram vocab: conditional MLE over per-context totals, deterministic top-k") {
    val d = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val v = LmScore.bigramVocab(d, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // bigrams: (a,b)=3, (b,a)=1, (b,c)=1, (b,x)=1; ctx(a)=3, ctx(b)=3
    // k=3 keeps (a,b) then the lexicographically-first ties (b,a), (b,c)
    assert(v.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    assert(v(("a", "b")) == math.log(3.0 / 3.0))
    assert(v(("b", "a")) == math.log(1.0 / 3.0))
  }

  test("stupid backoff scoring: bigram hit, backoff+unigram, backoff+OOV, first token — hand pin") {
    val d = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val bi = LmScore.bigramVocab(d, "text", k = 3)
    val uni = LmScore.unigramVocab(d, "text", k = 2) // a, b at ln(3/8)
    val out = LmScore.bigramLogLikelihood(d, "doc_id", "text", bi, uni,
        backoff = 0.4, oovLogp = -20.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val uniA = math.log(3.0 / 8.0)
    // d1: uni(a) + bi(a,b) + bi(b,a) + bi(a,b) + bi(b,c)
    val d1 = (uniA + 0.0 + math.log(1.0 / 3.0) + 0.0 + math.log(1.0 / 3.0)) / 5.0
    // d2: uni(a) + bi(a,b) + [backoff → OOV x]
    val d2 = (uniA + 0.0 + (math.log(0.4) + -20.0)) / 3.0
    assert(out(1L) == ((5L, r6(d1))))
    assert(out(2L) == ((3L, r6(d2))))
  }

  test("bigram scoring plan: models broadcast; pairs built map-side (no self-join)") {
    val d = (0L until 200L).map(i => (i, s"t${i % 9} t${i % 5} t${i % 3} tail")).toDF("doc_id", "text")
    val bi = LmScore.bigramVocab(d, "text", k = 20)
    val uni = LmScore.unigramVocab(d, "text", k = 10)
    val plan = LmScore.bigramLogLikelihood(d, "doc_id", "text", bi, uni)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for the model lookups:\n${plan.take(2000)}")
  }

  test("collocations: hand-computed PMI, minCount floor, deterministic order") {
    // "new york" always together (5×), "the cat"/"the dog" split the
    // context of "the"; filler tokens pad the totals
    val d = Seq.tabulate(5)(i => (i.toLong, s"new york the cat f$i"))
      .++(Seq((10L, "the dog the dog the dog the dog the dog")))
      .toDF("id", "text")
    val out = LmScore.collocations(d, "text", k = 3, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // totals: tokens T = 5*5 + 10 = 35; bigrams T2 = 5*4 + 9 = 29
    // counts: new=5, york=5, the=5+5=10? the appears once per doc 0-4 and 5x in doc 10 → 10; cat=5, dog=5
    // bigram (new,york)=5; (york,the)=5; (the,cat)=5; (the,dog)=5; (dog,the)=4
    def pmi(n: Long, c1: Long, c2: Long) =
      math.floor(math.log((n / 29.0) / ((c1 / 35.0) * (c2 / 35.0))) * 1e6 + 0.5) / 1e6
    val expected = Seq(
      ("new", "york", 5L, pmi(5, 5, 5)),
      ("the", "cat", 5L, pmi(5, 10, 5)),
      ("the", "dog", 5L, pmi(5, 10, 5)),
      ("york", "the", 5L, pmi(5, 5, 10)))
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }.take(3)
    assert(out.toSeq == expected, s"got ${out.toSeq}, want $expected")
  }

  test("scoring a corpus under its own vocab separates natural docs from shuffled noise") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
    val v = LmScore.unigramVocab(real, "text", k = 500)
    val scored = LmScore.unigramLogLikelihood(real, "doc_id", "text", v, oovLogp = -20.0)
    // every in-corpus token is in the 31-word vocab → ll bounded well above
    // the OOV floor for all docs
    val lls = scored.select("ll").as[Double].collect()
    assert(lls.nonEmpty && lls.forall(_ > -10.0))
  }

  test("corpusDivergence: identical slices diverge by zero") {
    val a = Seq("the cat", "a dog", "the end").toDF("text")
    val out = LmScore.corpusDivergence(a, a, "text", k = 10).head()
    assert(out.getAs[Double]("kl_pq") == 0.0 &&
      out.getAs[Double]("kl_qp") == 0.0 && out.getAs[Double]("js") == 0.0)
  }

  test("corpusDivergence: hand-computed two-token case") {
    // A = {x:3, y:1}, B = {x:1, y:3}; vocab = {x, y}; smoothed
    // P = (4/6, 2/6), Q = (2/6, 4/6)
    val a = Seq("x x x y").toDF("text")
    val b = Seq("x y y y").toDF("text")
    val out = LmScore.corpusDivergence(a, b, "text", k = 10).head()
    val p = Seq(4.0 / 6, 2.0 / 6); val q = Seq(2.0 / 6, 4.0 / 6)
    def t(x: Double, y: Double) =
      math.floor(x * math.log(x / y) * 1e9 + 0.5) / 1e9
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val kl = r6(t(p(0), q(0)) + t(p(1), q(1)))
    val js = r6((t(p(0), (p(0) + q(0)) / 2) + t(p(1), (p(1) + q(1)) / 2) +
      t(q(0), (p(0) + q(0)) / 2) + t(q(1), (p(1) + q(1)) / 2)) / 2)
    assert(out.getAs[Long]("n_vocab") == 2L)
    assert(out.getAs[Double]("kl_pq") == kl && out.getAs[Double]("kl_qp") == kl)
    assert(out.getAs[Double]("js") == js && js > 0 && js <= math.log(2))
  }

  test("corpusDivergence: asymmetric slices, direction attributes") {
    // B concentrates on one token A spreads over many -> KL(P||Q) with P
    // the spread side exceeds... both positive; JS symmetric and bounded
    val a = Seq("a b c d e f g h").toDF("text")
    val b = Seq("a a a a a a a a").toDF("text")
    val out = LmScore.corpusDivergence(a, b, "text", k = 20).head()
    val ab = LmScore.corpusDivergence(b, a, "text", k = 20).head()
    assert(out.getAs[Double]("kl_pq") > 0 && out.getAs[Double]("kl_qp") > 0)
    assert(out.getAs[Double]("js") == ab.getAs[Double]("js")) // symmetric
    assert(out.getAs[Double]("js") < math.log(2) + 1e-9)
    // swapping the arguments swaps the two KLs exactly
    assert(out.getAs[Double]("kl_pq") == ab.getAs[Double]("kl_qp"))
  }

  test("corpusDivergence is partitioning-invariant (decimal term sums)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter(col("lang") === "en")
    val b = docs.filter(!(col("lang") <=> "en"))
    val one = LmScore.corpusDivergence(a.coalesce(1), b.coalesce(1), "text", 30).head()
    val many = LmScore.corpusDivergence(a.repartition(7), b.repartition(5), "text", 30).head()
    assert(one.getAs[Double]("kl_pq") == many.getAs[Double]("kl_pq"))
    assert(one.getAs[Double]("js") == many.getAs[Double]("js"))
  }

  test("knBigramModel: hand-computed interpolated KN on a tiny corpus") {
    import spark.implicits._
    // corpus "a b a b a c" → bigrams: (a,b)×2, (b,a)×2, (a,c)×1
    // ctx(a)=3, ctx(b)=2; nsucc(a)=2, nsucc(b)=1; npred(a)=1, npred(b)=1,
    // npred(c)=1; types=3; D=0.75
    val df = Seq("a b a b a c").toDF("text")
    val m = LmScore.knBigramModel(df, "text", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def kn(n: Long, ctx: Long, nsucc: Long, npred: Long) =
      math.floor((math.max(n - 0.75, 0.0) / ctx +
        0.75 * nsucc.toDouble / ctx * (npred.toDouble / 3.0)) * 1e6 + 0.5) / 1e6
    assert(m(("a", "b")) == ((2L, kn(2, 3, 2, 1))))
    assert(m(("b", "a")) == ((2L, kn(2, 2, 1, 1))))
    assert(m(("a", "c")) == ((1L, kn(1, 3, 2, 1))))
    assert(m.size == 3)
  }

  test("knBigramModel: observed + reserved-for-unseen mass is 1 per context") {
    // interpolated KN normalizes over the FULL vocabulary: the observed
    // rows sum to 1 − λ(w1)·(1 − Σ_seen P_cont), with λ(w1) = D·N1+(w1·)/c(w1·)
    // covering every unseen successor — verify the identity numerically
    import spark.implicits._
    val df = Seq("x y x z x y y z", "z x y q").toDF("text")
    val d = 0.5
    val toks = "x y x z x y y z".split(" ") ++ Array("§") ++ "z x y q".split(" ")
    val bigrams = Seq("x y x z x y y z".split(" "), "z x y q".split(" "))
      .flatMap(a => a.sliding(2).map(p => (p(0), p(1))).toSeq)
    val counts = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val types = counts.size.toDouble
    val ctx = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nsucc = counts.groupBy(_._1._1).view.mapValues(_.size).toMap
    val npred = counts.groupBy(_._1._2).view.mapValues(_.size).toMap
    val model = LmScore.knBigramModel(df, "text", k = 1000, discount = d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for (w1 <- ctx.keys) {
      val seen = counts.keys.filter(_._1 == w1).map(_._2).toSeq
      val observedSum = seen.map(w2 => model((w1, w2))).sum
      val lambda = d * nsucc(w1) / ctx(w1)
      val seenCont = seen.map(w2 => npred(w2) / types).sum
      assert(math.abs(observedSum + lambda * (1.0 - seenCont) - 1.0) < 1e-4,
        s"context $w1")
    }
  }

  test("knBigramModel: discount and k validated") {
    import spark.implicits._
    val df = Seq("a b").toDF("text")
    intercept[IllegalArgumentException](LmScore.knBigramModel(df, "text", 0))
    intercept[IllegalArgumentException](LmScore.knBigramModel(df, "text", 5, discount = 1.0))
  }
test("logOddsDiff: distinctive tokens surface, swap negates z") {
    // corpus A says "alpha" often and "beta" rarely; B is the reverse;
    // "common" is balanced and should score near zero
    val a = (Seq.fill(30)("alpha common") ++ Seq.fill(3)("beta common")).toDF("text")
    val b = (Seq.fill(3)("alpha common") ++ Seq.fill(30)("beta common")).toDF("text")
    val out = LmScore.logOddsDiff(a, b, "text", k = 2, minCount = 1L)
      .select("token", "z", "side").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val aSide = out.filter(_._3 == "a").map(t => t._1 -> t._2).toMap
    val bSide = out.filter(_._3 == "b").map(t => t._1 -> t._2).toMap
    assert(aSide.maxBy(_._2)._1 == "alpha" && bSide.minBy(_._2)._1 == "beta")
    assert(aSide("alpha") > 2.0 && bSide("beta") < -2.0)
    // antisymmetry: swapping the corpora negates every z
    val swapped = LmScore.logOddsDiff(b, a, "text", k = 2, minCount = 1L)
      .select("token", "z").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(swapped("alpha") + aSide("alpha")) < 2e-6)
  }

  test("logOddsDiff: minCount prunes rare tokens; null text drops") {
    val a = (Seq.fill(10)("kept") :+ "rare").map(Option(_)).toDF("text")
    val b = (Seq.fill(10)("kept") :+ (null: String)).map(Option(_)).toDF("text")
    val toks = LmScore.logOddsDiff(a, b, "text", k = 5, minCount = 5L)
      .select("token").collect().map(_.getString(0)).toSet
    assert(toks == Set("kept")) // "rare" (count 1) pruned, null row ignored
  }
}
