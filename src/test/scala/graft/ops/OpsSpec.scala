package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** LLM-pipeline operator coverage (SURVEY.md §2.6): dedup, similarity,
  * text analysis — semantic checks on the driver testdata. */
class OpsSpec extends SparkSuite {
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  import spark.implicits._

  test("exact dedup: distinct keys ≤ total rows; fingerprint dedup finds true dups") {
    val n = docs.count()
    val d = Dedup.distinctKeys(docs, Seq("lang", "source")).count()
    assert(d <= n && d > 0)
    // identical text → identical fingerprint
    val fps = docs.select(Dedup.fingerprint(col("text")).as("fp")).distinct().count()
    val texts = docs.select("text").distinct().count()
    assert(fps == texts)
  }

  test("minhash near-dups: an exact duplicate pair is always found") {
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    // append a copy of doc 0 with a new id — must surface as a candidate pair
    val dup = base.filter(col("doc_id") === 0).select(lit(9999L).as("doc_id"), col("text"))
    val out = Dedup.minhashNearDups(base.union(dup), "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.99)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9999L)), s"expected (0,9999) in $pairs")
  }

  test("minhash near-dups default banding auto-selects from the threshold") {
    // bands omitted → bandsForThreshold picks the banding; an exact dup
    // must still surface (recall at J=1.0 is ~certain under any banding)
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    val dup = base.filter(col("doc_id") === 0).select(lit(9999L).as("doc_id"), col("text"))
    val out = Dedup.minhashNearDups(base.union(dup), "doc_id", "text",
      numHashes = 64, threshold = 0.9)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 9999L)), s"expected (0,9999) in $pairs")
  }

  test("ngram near-dups: exact duplicate pair surfaces with est 1.0") {
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    val dup = base.filter(col("doc_id") === 1).select(lit(8888L).as("doc_id"), col("text"))
    val out = Dedup.ngramNearDups(base.union(dup), "doc_id", "text",
      ngram = 5, numHashes = 32, bands = 4, threshold = 0.99)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 8888L)), s"expected (1,8888) in $pairs")
  }

  test("hot-bucket guard: output identical to unguarded on a healthy distinct-sig corpus") {
    // the guard's contract: on a corpus of DISTINCT signatures (exact-sig
    // collapse is an identity) with every band bucket under the cap, the
    // guarded join is bit-identical to the exhaustive unguarded run
    val base = docs.limit(50).select(col("doc_id"), col("text"))
      .withColumn("__sig", Dedup.minhashSignature(col("text"), 32))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__sig").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__sig", "__rn")
    val guarded = Dedup.minhashNearDups(base, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.5, maxBucket = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val unguarded = Dedup.minhashNearDups(base, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.5, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guarded == unguarded, "guard changed output on a healthy corpus")
  }

  test("exact-sig collapse: identical-sig groups emit a min-id star, never shed") {
    // 5 identical docs + 1 distinct: the guarded path must emit exactly
    // the 4 star pairs (min-id rep → member, est 1.0) for the group —
    // linear, deterministic, and immune to the guard — while the
    // exhaustive path emits all 10 pairs
    val df = ((0L until 5L).map(i => (10L + i, "same text here")) :+ (99L, "different"))
      .toDF("doc_id", "text")
    val star = Dedup.minhashNearDups(df, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.9, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(star == (11L to 14L).map(i => (10L, i, 1.0)).toSet, s"got $star")
    val exhaustive = Dedup.minhashNearDups(df, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.9, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exhaustive.size == 10 && exhaustive.forall(_._3 == 1.0), s"got $exhaustive")
  }

  test("hot-bucket guard: a pathological clique is bounded but stays connected") {
    // 120 identical documents = one band bucket per band holding all 120
    // rows (w²/2 = 7140 candidates unguarded). With maxBucket = 10 the
    // candidate count must shrink well below that, yet the surviving pairs
    // must still connect the clique into ONE component (the guard's
    // recall contract: p = 1-(1-1/s)^bands per pair, clusters re-merge).
    val clique = (0L until 120L).map(i => (i, "the same exact document text repeated"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(clique, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.9, maxBucket = 10)
    val n = pairs.count()
    assert(n > 0, "guard must not drop the clique entirely")
    assert(n < 7140, s"guard must bound the quadratic blowup, got $n pairs")
    val comps = Clusters.connectedComponents(pairs)
      .select(countDistinct(col("rep"))).as[Long].head()
    assert(comps == 1L, s"clique must stay one component, got $comps")
  }

  test("nearDupsAgainstIndex: batch finds its dups in the built index, one pair per identical-sig clique") {
    // buildSignatureIndex collapses the 3-wide identical clique (10,11,12)
    // to its min-id rep ONCE at build time; the new batch has one dup of
    // the clique and one novel doc. Expected: exactly ONE pair — batch
    // dup → clique rep 10, est 1.0
    val sig = (t: org.apache.spark.sql.Column) => Dedup.minhashSignature(t, 32)
    val raw = Seq((10L, "aaa bbb ccc ddd"), (11L, "aaa bbb ccc ddd"),
      (12L, "aaa bbb ccc ddd"), (20L, "totally different words here"))
      .toDF("doc_id", "text").select(col("doc_id"), sig(col("text")).as("sig"))
    // persist the built index and read it back — the actual contract: the
    // build's sig-keyed exchange happens once at ingest, queries read the
    // stored table
    val idxDir = java.nio.file.Files.createTempDirectory("graft-sigidx-").toString
    Dedup.buildSignatureIndex(raw, "doc_id", "sig")
      .write.mode("overwrite").parquet(idxDir)
    val idx = spark.read.parquet(idxDir)
    assert(idx.count() == 2, "builder must collapse identical sigs to min-id reps")
    val batch = Seq((100L, "aaa bbb ccc ddd"), (101L, "unrelated brand new content"))
      .toDF("doc_id", "text").select(col("doc_id"), sig(col("text")).as("sig"))
    val out = Dedup.nearDupsAgainstIndex(idx, batch, "doc_id", "sig",
      numHashes = 32, threshold = 0.9)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((100L, 10L, 1.0)), s"got $rows")
    // the scale contract: the small batch side broadcasts and the index
    // streams through the band join — no exchange anywhere on the query
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast band join in:\n$plan")
    // no SHUFFLE exchange anywhere (the broadcast exchange is the point)
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"index side must not shuffle:\n$plan")
    // opt-out for over-broadcast-limit batches: hint gone, query still correct
    val big = Dedup.nearDupsAgainstIndex(idx, batch, "doc_id", "sig",
      numHashes = 32, threshold = 0.9, broadcastBatch = false)
    assert(big.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 10L)))
  }

  test("hot-bucket guard fires on wide buckets of DISTINCT near-identical sigs") {
    // 80 docs = 60 shared tokens + 1 unique token each: signatures are
    // DISTINCT (collapse is an identity) but near-identical, so band
    // buckets are ~80 wide — far over maxBucket=10 — and the sig-hash
    // sub-split path runs for real. Pairwise Jaccard 60/62 ≈ 0.97.
    val shared = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs80 = (0L until 80L).map(i => (i, s"$shared unique$i")).toDF("doc_id", "text")
    val guarded = Dedup.minhashNearDups(docs80, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.9, maxBucket = 10)
    val exhaustive = Dedup.minhashNearDups(docs80, "doc_id", "text",
      numHashes = 32, bands = 4, threshold = 0.9, maxBucket = Int.MaxValue)
    val (ng, ne) = (guarded.count(), exhaustive.count())
    // the guard must actually shed (proves the wide/sub-split path ran —
    // identical output would mean the test went vacuous) yet keep the
    // clique connected for cluster-level dedup
    assert(ng < ne, s"guard did not fire: guarded=$ng exhaustive=$ne")
    assert(ng > 0, "guard must not drop the clique entirely")
    val comps = Clusters.connectedComponents(guarded)
      .select(countDistinct(col("rep"))).as[Long].head()
    assert(comps == 1L, s"split clique must stay one component, got $comps")
  }

  test("nearDupsFromSignatures: stored signatures reproduce the text-path output") {
    // the index-reuse contract: persist minhashSignature once, re-run
    // candidates from the stored column — identical pairs
    val base = docs.limit(40).select(col("doc_id"), col("text"))
    val direct = Dedup.minhashNearDups(base, "doc_id", "text",
      numHashes = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val stored = base.filter(col("text").isNotNull)
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 32).as("sig"))
    val fromSigs = Dedup.nearDupsFromSignatures(stored, "doc_id", "sig",
      numHashes = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromSigs == direct)
  }

  test("embedding near-dups: identical vectors pair up at sim 1.0; none below threshold") {
    val base = emb.limit(50).select(col("vec_id"), col("embedding"))
    val dup = base.filter(col("vec_id") === 2)
      .select(lit(7777L).as("vec_id"), col("embedding"))
    val out = Similarity.embeddingNearDups(base.union(dup), "vec_id", "embedding",
      simThreshold = 0.999, bits = 6).collect()
    assert(out.exists(r => r.getLong(0) == 2L && r.getLong(1) == 7777L && r.getDouble(2) > 0.999))
  }

  test("jaccard: identical arrays → 1.0, disjoint → 0.0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("x", "y")
    val out = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0)
  }

  test("simhash: identical texts get identical hashes; different texts differ") {
    val hs = docs.limit(50)
      .select(TextAnalysis.fingerprintSimhash(col("text")).as("h"))
      .as[Long].collect()
    assert(hs.distinct.length > 1)
    val h2 = Seq("x y z", "x y z").toDF("t")
      .select(TextAnalysis.fingerprintSimhash(col("t"))).as[Long].collect()
    assert(h2(0) == h2(1))
  }

  test("brute-force topk: self excluded, k respected, sim descending per query") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 4).collect()
    assert(out.length == 12)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(!rows.exists(_.getLong(1) == q)) // no self-match
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH topk returns a subset consistent with brute force ranking head") {
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", 1).collect()
    val lsh = Similarity.lshTopK(emb, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", 1, bits = 4).collect()
    // LSH prunes, so it may miss the true top-1, but whatever it returns
    // must be a real (non-self) candidate with a valid sim
    lsh.foreach { r => assert(r.getLong(1) != 0L && !r.getDouble(2).isNaN) }
    assert(brute.length == 1)
  }

  test("IVF topk: nprobe=k centroids degenerates to exact brute force") {
    // with every cell probed, IVF must reproduce the exact ranking
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 4)
    assert(cents.count() == 4)
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
    assert(assigned.count() == emb.count(), "assignment must keep every vector exactly once")
    val ivf = Similarity.ivfTopK(assigned, emb.filter(col("vec_id") < 2), cents,
      "vec_id", "embedding", k = 3, nprobe = 4)
      .select("q_id", "cand_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val brute = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 2),
      "vec_id", "embedding", 3)
      .select("q_id", "cand_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(ivf.sorted.toSeq == brute.sorted.toSeq)
  }

  test("kmeansRefine keeps k centroids, preserves dims, and reduces inertia") {
    val seeds = Similarity.seedCentroids(emb, "vec_id", "embedding", 4)
    val refined = Similarity.kmeansRefine(emb, seeds, "vec_id", "embedding", iters = 2)
    assert(refined.count() == 4)
    val dims = refined.select(size(col("centroid_vec"))).distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) ==
      emb.select(size(col("embedding"))).first().getInt(0))
    // mean cosine-to-assigned-centroid must not get worse after refinement
    def meanSim(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
        .agg(avg("sim")).first().getDouble(0)
    assert(meanSim(refined) >= meanSim(seeds) - 1e-9,
      "Lloyd iteration must not reduce mean assignment similarity")
  }

  test("IVF topk with partial probing returns valid non-self candidates") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val assigned = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
    val out = Similarity.ivfTopK(assigned, emb.filter(col("vec_id") === 0), cents,
      "vec_id", "embedding", k = 3, nprobe = 2).collect()
    assert(out.nonEmpty && out.length <= 3)
    out.foreach { r => assert(r.getLong(1) != 0L && !r.getDouble(2).isNaN) }
  }

  test("repetition stats: duplicated lines/tokens detected, clean text scores low") {
    val df = Seq(
      (1L, "alpha beta\nalpha beta\ngamma"),   // 2 of 3 lines dup -> 1/3
      (2L, "a a a b"),                          // 2 of 4 tokens repeats -> 0.5
      (3L, "all unique words here")).toDF("doc_id", "t")
    val out = df.select(col("doc_id"),
      TextAnalysis.duplicateLineFraction(col("t")).as("dl"),
      TextAnalysis.duplicateTokenFraction(col("t")).as("dt")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(out(1L)._1 - 1.0 / 3) < 1e-12)
    assert(math.abs(out(2L)._2 - 0.5) < 1e-12)
    assert(out(3L)._1 == 0.0 && out(3L)._2 == 0.0)
  }

  test("contamination: benchmark doc scores 1.0, disjoint doc scores 0.0") {
    val corpus = Seq((1L, "the quick brown fox jumps over it"),
      (2L, "zz qq xx ww vv uu tt ss rr")).toDF("doc_id", "text")
    val bench = Seq("the quick brown fox jumps over it").toDF("bench_text")
    val out = Dedup.contamination(corpus, "doc_id", "text", bench, "bench_text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0, s"identical doc must be fully contaminated: ${out(1L)}")
    assert(out(2L) == 0.0, s"disjoint doc must be clean: ${out(2L)}")
  }

  test("bandsForThreshold: cheapest banding whose S-curve threshold clears the target") {
    // 64 hashes, target 0.9: b=8 (r=8) has (1/8)^(1/8)=0.771 <= 0.9; b=4 is 0.917 > 0.9
    assert(Dedup.bandsForThreshold(64, 0.9) == 8)
    // lower thresholds need more bands for recall
    assert(Dedup.bandsForThreshold(64, 0.5) == 16)
    val b = Dedup.bandsForThreshold(64, 0.7)
    assert(math.pow(1.0 / b, b / 64.0) <= 0.7)
    // more bands monotonically = lower curve threshold
    assert(Dedup.bandsForThreshold(64, 0.95) <= Dedup.bandsForThreshold(64, 0.5))
  }

  test("PII redaction replaces emails/phones/IPs; URLs extracted with domains") {
    val df = Seq(
      "mail bob.smith+x@corp.example.co.uk or call +44 207 946 0958 from 192.168.1.1 via https://sub.ex.org/p?q=1",
      "no pii here").toDF("t")
    val out = df.select(
      TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.extractUrls(col("t")).as("u"),
      TextAnalysis.extractDomains(col("t")).as("d")).collect()
    val r0 = out(0).getString(0)
    assert(r0.contains("<EMAIL>") && r0.contains("<PHONE>") && r0.contains("<IP>"),
      s"unexpected redaction: $r0")
    assert(!r0.contains("bob.smith") && !r0.contains("192.168.1.1"))
    // URL survives redaction-target extraction from the ORIGINAL text
    assert(out(0).getSeq[String](1) == Seq("https://sub.ex.org/p?q=1"))
    assert(out(0).getSeq[String](2) == Seq("sub.ex.org"))
    assert(out(1).getString(0) == "no pii here" && out(1).getSeq[String](1).isEmpty)
  }

  test("language id: null text yields null, not a tiebreak language") {
    val df = Seq(Some("the of and"), None).toDF("t")
    val out = df.select(TextAnalysis.languageId(col("t"))).collect()
    assert(out(0).getString(0) == "en" && out(1).isNullAt(0))
  }

  test("near-dup banding drops null-text rows instead of cliquing them") {
    val withNulls = Seq((1L, Some("a b c d e")), (2L, None), (3L, None), (4L, None))
      .toDF("doc_id", "text")
    val out = Dedup.minhashNearDups(withNulls, "doc_id", "text",
      numHashes = 16, bands = 4, threshold = 0.0)
    // null rows must not pair with each other (would be (2,3),(2,4),(3,4))
    assert(out.filter(col("id_a").isin(2L, 3L, 4L) || col("id_b").isin(2L, 3L, 4L)).count() == 0)
  }

  test("scriptCounts / dominantScript: per-class counts, tie order, all-zero → none") {
    import spark.implicits._
    val rows = Seq(
      (1L, "hello мир"),        // 5 latin, 3 cyrillic → latin
      (2L, "漢字 かな"),          // 2 cjk, 2 kana → cjk (declaration order)
      (3L, "12345"),            // digits only
      (4L, "!!! ..."),          // nothing classified
      (5L, "καλημέρα"))         // greek
      .toDF("id", "t")
    val out = rows.select(col("id"),
        TextAnalysis.scriptCounts(col("t")).as("c"),
        TextAnalysis.dominantScript(col("t")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getStruct(1).getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((5L, 3L, "latin")))
    assert(out(2L)._3 == "cjk", "ties resolve in declaration order")
    assert(out(3L)._3 == "digit")
    assert(out(4L)._3 == "none")
    assert(out(5L)._3 == "greek")
  }

  test("language id picks the language whose stopwords dominate") {
    val df = Seq(
      "the cat of the house and the dog", // en
      "el perro de la casa y el gato",    // es
      "qqq www eee")                      // none
      .toDF("t")
    val out = df.select(TextAnalysis.languageId(col("t"))).as[String].collect()
    assert(out(0) == "en" && out(1) == "es" && out(2) == "und")
  }

  test("quality score in [0,1]; token counts positive") {
    val out = docs.select(TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.subwordCount(col("text")).as("sw")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getLong(1) > 0 && r.getLong(2) >= r.getLong(1) - 1)
    }
  }

  test("readability: pinned Flesch counts/scores; guards and null behavior") {
    import spark.implicits._
    val df = Seq(
      "The cat sat. It was happy!", // 6 words, 2 sentences, 7 vowel groups
      "no punctuation here",        // sentence floor: max(0,1) = 1
      "tv bbc xyz.",                // vowel-poor: syllables floored at words... xyz has y
      "12345 !!!",                  // zero words -> null struct
      null.asInstanceOf[String]
    ).toDF("t")
    val out = df.select(TextAnalysis.readability(col("t")).as("r")).collect()
    val r0 = out(0).getStruct(0)
    assert(r0.getLong(0) == 6 && r0.getLong(1) == 2 && r0.getLong(2) == 7)
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(7/6), on the 1e-6 grid
    val flesch = math.floor((206.835 - 1.015 * 3.0 - 84.6 * (7.0 / 6.0)) * 1e6 + 0.5) / 1e6
    assert(r0.getDouble(3) == flesch)
    val grade = math.floor((0.39 * 3.0 + 11.8 * (7.0 / 6.0) - 15.59) * 1e6 + 0.5) / 1e6
    assert(r0.getDouble(4) == grade)
    assert(out(1).getStruct(0).getLong(1) == 1, "sentence count floors at 1")
    val r2 = out(2).getStruct(0)
    assert(r2.getLong(2) >= r2.getLong(0), "syllables floored at word count")
    assert(out(3).isNullAt(0) && out(4).isNullAt(0))
  }

  test("containment: asymmetric signal where Jaccard stays low; estimator identity on true J") {
    import spark.implicits._
    val sets = Seq(
      ("x1 x2 x3", "x1 x2 x3 y1 y2 y3 y4 y5 y6 y7 y8 y9"), // a ⊂ b
      ("x1 x2", "y1 y2")                                    // disjoint
    ).toDF("sa", "sb")
      .select(array_distinct(split(col("sa"), " ")).as("ta"),
        array_distinct(split(col("sb"), " ")).as("tb"))
    val rows = sets.select(
      Dedup.jaccard(col("ta"), col("tb")).as("j"),
      Dedup.containment(col("ta"), col("tb")).as("c"),
      Dedup.containmentFromJaccard(Dedup.jaccard(col("ta"), col("tb")),
        size(col("ta")), size(col("tb"))).as("ce"))
      .as[(Double, Double, Double)].collect()
    val (j1, c1, ce1) = rows(0)
    assert(c1 == 1.0, "full containment must score 1.0")
    assert(j1 == 0.25, "Jaccard stays low for the contained short doc")
    assert(math.abs(ce1 - c1) < 1e-12, "estimator is exact on true Jaccard")
    val (j2, c2, ce2) = rows(1)
    assert(j2 == 0.0 && c2 == 0.0 && math.abs(ce2) < 1e-12)
  }

  test("LSH banding recall MEASURED at the S-curve claim, not asserted from theory") {
    // plant token-set pairs at an EXACT known Jaccard (o shared + (n-o)
    // unique tokens per side, namespaced per pair so cross-pair overlap
    // is impossible → J = o/(2n-o) by construction), then measure the
    // fraction whose band arrays collide in ≥1 position. The scaladoc
    // claim under test: pairs AT the auto-selected banding's threshold
    // collide w.p. ≥ 1-1/e, climbing steeply above. Fixed seed; the
    // minhash kernel's hash family is fixed → fully deterministic.
    val rnd = new scala.util.Random(7)
    def pairAt(pid: String, j: Double, n: Int): (String, String) = {
      val o = math.round(2 * n * j / (1 + j)).toInt
      val shared = (0 until o).map(k => s"${pid}s$k")
      val a = shared ++ (0 until n - o).map(k => s"${pid}a$k")
      val b = shared ++ (0 until n - o).map(k => s"${pid}b$k")
      (rnd.shuffle(a).mkString(" "), rnd.shuffle(b).mkString(" "))
    }
    def bandRecall(numHashes: Int, threshold: Double, j: Double,
                   nPairs: Int): Double = {
      val b = Dedup.bandsForThreshold(numHashes, threshold)
      val r = numHashes / b
      val rows = (0 until nPairs)
        .map { p => val (ta, tb) = pairAt(s"h${numHashes}t${threshold}j$j-$p-", j, 40); (ta, tb) }
      val hits = rows.toDF("ta", "tb").select(
        exists(zip_with(
          Dedup.minhashBands(Dedup.minhashSignature(col("ta"), numHashes), b, r),
          Dedup.minhashBands(Dedup.minhashSignature(col("tb"), numHashes), b, r),
          (x, y) => x === y), h => h).as("hit"))
        .filter(col("hit")).count()
      hits.toDouble / nPairs
    }
    for ((numHashes, threshold) <- Seq((16, 0.7), (16, 0.5), (32, 0.8))) {
      val atT = bandRecall(numHashes, threshold, threshold, 200)
      val above = bandRecall(numHashes, threshold, threshold + 0.1, 200)
      assert(atT >= 0.6,
        s"recall $atT < 0.6 at J=threshold=$threshold (numHashes=$numHashes)")
      assert(above >= 0.9,
        s"recall $above < 0.9 at J=threshold+0.1 (threshold=$threshold, numHashes=$numHashes)")
      assert(above >= atT, "S-curve must climb above the threshold")
    }
  }

  test("end-to-end minhashNearDups recall on planted pairs above threshold") {
    // the full pipeline (banding + sigAgreement ≥ threshold verification)
    // on 100 planted pairs at J = threshold+0.15: the verification step
    // re-estimates J from 16 hashes, so per-pair estimates straddle the
    // cutoff — recall is necessarily below the banding-only number, but
    // must stay well above half on a comfortably-above-threshold corpus
    val rnd = new scala.util.Random(11)
    val n = 40
    val j = 0.65
    val o = math.round(2 * n * j / (1 + j)).toInt
    val docs = (0 until 100).flatMap { p =>
      val shared = (0 until o).map(k => s"p${p}s$k")
      val a = shared ++ (0 until n - o).map(k => s"p${p}a$k")
      val b = shared ++ (0 until n - o).map(k => s"p${p}b$k")
      Seq((2L * p, rnd.shuffle(a).mkString(" ")),
        (2L * p + 1, rnd.shuffle(b).mkString(" ")))
    }
    val found = Dedup.minhashNearDups(docs.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.5, maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = (0 until 100).count(p =>
      found.contains((2L * p, 2L * p + 1))).toDouble / 100
    assert(recall >= 0.9, s"end-to-end recall $recall < 0.9 on planted J=$j pairs at threshold 0.5")
    // namespaced pairs: nothing ELSE may pair up
    val falsePairs = found.filterNot { case (a, b) => b == a + 1 && a % 2 == 0 }
    assert(falsePairs.isEmpty, s"cross-pair false positives: $falsePairs")
  }

  test("approx distinct within rsd of exact") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val exact = ev.select("user_id").distinct().count().toDouble
    val approx = Dedup.approxDistinct(ev, "user_id").collect()(0).getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.15)
  }

  test("semanticDedup: within-cell merges to min-id rep, transitivity, singleton identity") {
    import spark.implicits._
    // two orthogonal directions define two cells; planted duplicates and a
    // transitive chain inside cell 1, an isolated vector in cell 2
    def v(x: Double, y: Double) = Array(x, y)
    val emb = Seq(
      (10L, v(1.0, 0.0)),          // cell A
      (11L, v(1.0, 0.0)),          // exact dup of 10 → merges
      (12L, v(0.999, 0.02)),       // near 10/11 → transitive chain
      (20L, v(0.0, 1.0)),          // cell B, alone
      (30L, v(0.7, 0.714)))        // between cells, lands in ONE cell only
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)))
      .toDF("centroid_id", "centroid_vec")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", cents,
        simThreshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 10L && out(11L) == 10L && out(12L) == 10L,
      s"cell-A near-dups must collapse to the min id: $out")
    assert(out(20L) == 20L && out(30L) == 30L)
    // survivors = rep == id
    assert(out.count { case (id, rep) => id == rep } == 3)
  }

  test("semanticDedup: cross-cell near-dups are accepted misses (the SemDeDup contract)") {
    import spark.implicits._
    // identical vectors would share a cell; force a miss with two vectors
    // equidistant-ish but assigned to DIFFERENT cells via the tiebreak
    def v(x: Double, y: Double) = Array(x, y)
    val emb = Seq(
      (1L, v(1.0, 0.9)),   // nearer cell 0
      (2L, v(0.9, 1.0)))   // nearer cell 1 — cosine(1,2) ≈ 0.994 but cells differ
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, v(1.0, 0.0)), (1L, v(0.0, 1.0)))
      .toDF("centroid_id", "centroid_vec")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding", cents,
        simThreshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L),
      "different cells never compare — documented approximation")
  }

  test("decontaminatedSplit: eval intact, overlapping train dropped, clean train kept") {
    // the split is a deterministic md5 draw — recompute it JVM-side to
    // pick ids that land on the sides the scenario needs
    def draw(id: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(s"t:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val thr = graft.ops.Sampling.fractionThreshold(0.5)
    val ids = (1L to 200L)
    val trainIds = ids.filter(draw(_) < thr)
    val evalIds = ids.filter(draw(_) >= thr)
    assert(trainIds.size >= 2 && evalIds.nonEmpty)
    val (tDirty, tClean, ev) = (trainIds(0), trainIds(1), evalIds(0))
    val df = Seq(
      (tDirty, "the quick brown fox jumps"),     // shares shingles with ev
      (tClean, "zqxjkvw bnmpl hgfds trewq"),     // unique text
      (ev, "the quick brown fox sleeps")
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminatedSplit(df, "doc_id", "text",
        trainFrac = 0.5, k = 8, salt = "t")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(out.get(ev).contains("eval"))
    assert(out.get(tClean).contains("train"))
    assert(!out.contains(tDirty), "overlapping train doc must drop")
  }

  test("datasetManifest: partitioning-invariant checksum that moves on any row change") {
    val df = (1L to 100L).map(i => (i, s"lang${i % 3}", i * 7))
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("shard", col("doc_id") % 4)
    def m(d: org.apache.spark.sql.DataFrame) =
      Layout.datasetManifest(d, "shard", Seq("doc_id", "lang", "n_chars"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val base = m(df)
    assert(base.map(_._2).sum == 100)
    assert(m(df.repartition(13)) == base, "order/partitioning must not matter")
    // one modified row moves exactly its shard's checksum, counts unchanged
    val tweaked = m(df.withColumn("n_chars",
      when(col("doc_id") === 8, lit(999L)).otherwise(col("n_chars"))))
    assert(tweaked.map(_._2) == base.map(_._2))
    assert(tweaked.count(t => !base.contains(t)) == 1)
    assert(tweaked.filter(t => !base.contains(t)).head._1 == 0L) // 8 % 4
  }

  test("tagKeywords: distinct-term hits per tag, minHits gate, folding both sides") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Fast cars go fast; slow cars go slow"), // fast+slow distinct=2
      (2L, "only fast here"),                       // 1 < minHits
      (3L, "TABLE row COLUMN table"),               // storage 3
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val dict = Seq(("perf", "FAST"), ("perf", "slow"), ("perf", "quick"),
      ("storage", "table"), ("storage", "row"), ("storage", "column"))
      .toDF("tag", "term")
    val out = TextAnalysis.tagKeywords(docs, "doc_id", "text", dict, "tag",
        "term", minHits = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, "perf") -> 2L, (3L, "storage") -> 3L))
  }

  test("tagKeywords: duplicate dictionary rows don't double-count; minHits=1 tags singles") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val dict = Seq(("t", "alpha"), ("t", "Alpha"), ("t", "ALPHA")).toDF("tag", "term")
    val out = TextAnalysis.tagKeywords(docs, "doc_id", "text", dict, "tag", "term")
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 1L)
  }
  test("lshRecallAudit: perfect on a separated corpus; exact dups always recalled; cap raises") {
    import spark.implicits._
    // 5 identical pairs far above threshold + 10 pairwise-distinct docs:
    // truth = the 5 identical pairs (J = 1.0), LSH recovers each as a
    // star (exact dups ALWAYS collide), and nothing else approaches 0.9
    // -> recall = precision = 1.0
    val fam = (0 until 5).flatMap { g =>
      val txt = s"group$g " + (0 until 30).map(i => s"tok${g}_$i").mkString(" ")
      Seq((g * 2L, txt), (g * 2L + 1, txt))
    }
    val filler = (0 until 10).map(i =>
      (100L + i, (0 until 25).map(j => s"only${i}_$j").mkString(" ")))
    val docs = (fam ++ filler).toDF("doc_id", "text")
    val out = Dedup.lshRecallAudit(docs, "doc_id", "text",
        numHashes = 64, threshold = 0.9)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(out == ((20L, 5L, 5L, 5L, Some(1.0), Some(1.0))))
    // empty truth and candidate sets: ratios null, not divide-by-zero
    val none = Dedup.lshRecallAudit(filler.toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 64, threshold = 0.9)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(none == ((10L, 0L, 0L, 0L, None, None)))
    // the quadratic-intent cap hard-fails FROM THE DRIVER, before the
    // quadratic-intent ground truth runs or pins (r15 advice fix)
    val err = intercept[IllegalArgumentException] {
      Dedup.lshRecallAudit(docs, "doc_id", "text", maxDocs = 5)
    }
    assert(err.getMessage.contains("maxDocs"))
  }

  test("bandsForRecall: inverse S-curve picks the cheapest banding that clears the target; audit confirms") {
    import spark.implicits._
    // closed form: at threshold 0.55 the default bandsForThreshold(64)
    // banding (16 bands of 4) only promises the 1-1/e floor — its band
    // collision at the threshold is ~0.78 — while a 0.99 target needs 32
    // bands of 2; the helper returns exactly that, and it is a divisor
    val b0 = Dedup.bandsForThreshold(64, 0.55)
    assert(b0 == 16 && Dedup.bandCollisionProb(64, b0, 0.55) < 0.99)
    val b1 = Dedup.bandsForRecall(64, 0.55, 0.99)
    assert(b1 == 32 && 64 % b1 == 0 &&
      Dedup.bandCollisionProb(64, b1, 0.55) >= 0.99)
    // recall is monotone in bands, so the found banding is the cheapest
    assert((1 until b1).filter(64 % _ == 0).forall(b =>
      Dedup.bandCollisionProb(64, b, 0.55) < 0.99))
    // unreachable target names the fix: more hashes
    val err = intercept[IllegalArgumentException] {
      Dedup.bandsForRecall(4, 0.1, 0.9)
    }
    assert(err.getMessage.contains("raise numHashes"))
    // end-to-end: 12 pairs COMFORTABLY above threshold (30 shared of 35
    // distinct tokens each side -> J = 30/40 = 0.75 vs threshold 0.55)
    // on a separated corpus; with the recall-targeted banding the audit
    // measures >= 0.9 recall at perfect precision, while the at-threshold
    // floor stays what lshRecallAudit documents
    val fam = (0 until 12).flatMap { g =>
      val shared = (0 until 30).map(i => s"s${g}_$i")
      Seq((g * 2L, (shared ++ (0 until 5).map(i => s"a${g}_$i")).mkString(" ")),
          (g * 2L + 1, (shared ++ (0 until 5).map(i => s"b${g}_$i")).mkString(" ")))
    }
    val filler = (0 until 8).map(i =>
      (200L + i, (0 until 25).map(j => s"only${i}_$j").mkString(" ")))
    val out = Dedup.lshRecallAudit((fam ++ filler).toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 64, threshold = 0.55,
        bands = Dedup.bandsForRecall(64, 0.55, 0.99))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(out._2 == 12L && out._5.exists(_ >= 0.9),
      s"expected >= 0.9 recall on above-threshold pairs, got $out")
  }

  test("lshRecallAudit: 3-clique scores full C(3,2) recall; truth is case-sensitive like the audited path") {
    import spark.implicits._
    // a 3-clique of IDENTICAL docs: truth = all 3 pairs; the star
    // collapse stores only 2 edges, but the audit expands the clique, so
    // measured recall is 1.0, not the 2/3 star artifact (r15 advice fix)
    val txt = "alpha beta " + (0 until 30).map(i => s"tok$i").mkString(" ")
    val trio = Seq((1L, txt), (2L, txt), (3L, txt))
    // two docs identical UP TO CASE: raw-token Jaccard 0 (every token
    // differs), so with the case-sensitive truth convention they are
    // neither truth nor candidates — under the old lowercased truth they
    // were a J=1.0 truth pair the raw-token LSH could never recall
    val caseVar = Seq(
      (50L, (0 until 25).map(i => s"Word$i").mkString(" ")),
      (51L, (0 until 25).map(i => s"word$i").mkString(" ")))
    val out = Dedup.lshRecallAudit((trio ++ caseVar).toDF("doc_id", "text"),
        "doc_id", "text", numHashes = 64, threshold = 0.9)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(out == ((5L, 3L, 3L, 3L, Some(1.0), Some(1.0))))
  }

test("lexicalDiversity: hand-computed tokens/types/hapax") {
    import spark.implicits._
    // tokens: the(3) cat(2) sat(1) mat(1) -> 7 tokens, 4 types, 2 hapax
    val df = Seq("The cat sat", "the MAT", "the cat").map(Option(_)).toDF("text")
      .unionByName(Seq(Option.empty[String]).toDF("text"))
    val out = TextAnalysis.lexicalDiversity(df, "text")
      .select("n_tokens", "n_types", "n_hapax", "ttr", "hapax_ratio")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out._1 == 7L && out._2 == 4L && out._3 == 2L)
    assert(out._4 == math.floor(4.0 / 7 * 1e6) / 1e6 && out._5 == 0.5)
  }
}
