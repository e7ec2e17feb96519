package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Deterministic sampling & mixing: stability across runs/partitionings is
  * the contract — no rand() anywhere. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("deterministicSample: stable across runs and repartitionings") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    // roughly the requested fraction (binomial, 500 rows)
    val n = docs.count().toDouble
    assert(a.size > n * 0.2 && a.size < n * 0.4, s"got ${a.size} of $n at fraction 0.3")
  }

  test("deterministicSample: fraction 1 keeps everything, 0 keeps nothing; salts are independent") {
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() == 0)
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "a")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "b")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s2, "different salts must draw different samples")
  }

  test("deterministicSample nests: a row kept at f must be kept at f' > f (same salt)") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big), "thresholded hash draws must nest")
  }

  test("hashSplit: total partition, id-stable under growth, sane proportions") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = (0 until 2000).toDF("id")
    val grown = (0 until 4000).toDF("id")
    val a = Sampling.hashSplit(small, "id", splits).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(grown, "id", splits).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // every id labeled; old ids keep their split when the corpus doubles
    assert(a.size == 2000 && a.forall { case (k, v) => b(k) == v })
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.04 &&
      math.abs(frac("val") - 0.1) < 0.03 && math.abs(frac("test") - 0.1) < 0.03, frac.toString)
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(small, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("stratifiedSample applies per-stratum rates; unknown strata get default") {
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.0), default = 0.0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"), s"only en should survive, got $langs")
    // rate change in one stratum must not reshuffle another's selection
    val enBefore = out.select("doc_id").as[Long].collect().toSet
    val enAfter = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.5), default = 0.0)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(enBefore == enAfter)
  }

  test("temperatureWeights: T=1 is the natural distribution; T<1 flattens it") {
    val natural = Sampling.temperatureWeights(docs, "lang", 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val flat = Sampling.temperatureWeights(docs, "lang", 0.3)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(natural.values.sum - 1.0) < 1e-4)
    assert(math.abs(flat.values.sum - 1.0) < 1e-4)
    val maxNat = natural.values.max
    val maxFlat = flat.values.max
    assert(maxFlat < maxNat, "lower temperature must shrink the dominant stratum's share")
  }

  test("capPerStratum: quota respected, deterministic, and nested across quotas") {
    val capped = Sampling.capPerStratum(docs, "lang", "doc_id", 5)
    val sizes = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ <= 5), s"quota violated: $sizes")
    // deterministic: same call → same set
    val s1 = capped.select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.capPerStratum(docs, "lang", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    // nesting: quota-5 selection ⊆ quota-20 selection (prefix of same order)
    val s20 = Sampling.capPerStratum(docs, "lang", "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s20))
  }

  test("capPerStratum plans a WindowGroupLimit (partial top-n before the exchange)") {
    // the scale claim: every map task prunes to a local top-n, so the
    // window exchange moves ≤ n×partitions rows per stratum
    val plan = Sampling.capPerStratum(docs, "lang", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("packSequences matches the naive global prefix sum and is partitioning-independent") {
    import org.apache.spark.sql.expressions.Window
    val withTok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
    // naive single-partition global window = the semantic definition
    val naive = withTok
      .withColumn("seq_id",
        expr("(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) div 256L"))
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    val packed = Sampling.packSequences(withTok, "doc_id", "n_tok", 256)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(packed == naive, "two-phase prefix sum must equal the global window")
    // same result under a different physical input partitioning
    val repacked = Sampling.packSequences(withTok.repartition(7), "doc_id", "n_tok", 256)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(repacked == naive)
    // sequences are contiguous in doc order and start at 0
    val ids = packed.values.toSeq.distinct.sorted
    assert(ids.head == 0L && ids == (ids.head to ids.last))
  }

  test("packBoundaries balances buckets under eviction pressure (the KMV point)") {
    // packing is CORRECT with any boundaries (prefix sums compose), so
    // only this test would catch a boundary-quality regression — the
    // sketch exists to keep bucket weights near-even. 5000 distinct keys
    // with skewed duplication, buckets*64 = 512 sketch slots → heavy
    // eviction. Deterministic: seeded keys + xxhash64 sketch hashing.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 30000).map { _ =>
      val k = rnd.nextInt(5000)
      Tuple1(f"k$k%04d")
    }
    val df = rows.toDF("k").repartition(8)
    val buckets = 8
    val bounds = Sampling.packBoundaries(df, "k", buckets)
    assert(bounds.nonEmpty && bounds.size <= buckets - 1)
    // exact bucket weights under the returned boundaries
    val sBounds = bounds.map(_.asInstanceOf[String])
    def bucketOf(k: String): Int = {
      val i = sBounds.indexWhere(b => k < b)
      if (i == -1) sBounds.size else i
    }
    val weights = rows.groupBy(r => bucketOf(r._1)).view.mapValues(_.size).toMap
    val ideal = rows.size.toDouble / (sBounds.size + 1)
    val maxW = weights.values.max
    assert(maxW <= ideal * 2.0,
      s"worst bucket ${maxW} vs ideal $ideal — boundaries unbalanced: $weights")
  }

  test("bucketExpr: when-chain and wide-array forms agree (incl. ties and duplicate bounds)") {
    // the wide form exists because a numShufflePartitions-deep when-chain
    // blows codegen's 64 KB method limit at cluster partition counts
    // (r10 ADVICE); both physical forms must compute the identical bucket
    val vals = (-3 to 13).map(_.toDouble) :+ 2.5 :+ 7.5
    val df = vals.toDF("v")
    def buckets(bounds: Seq[Any], chainMax: Int): Seq[Int] =
      df.select(col("v"), Sampling.bucketExpr(col("v"), bounds, chainMax).as("b"))
        .orderBy("v").collect().map(_.getInt(1)).toSeq
    for (bounds <- Seq(Seq[Any](0.0, 5.0, 10.0),
                       Seq[Any](5.0, 5.0, 10.0), // duplicate boundary value
                       Seq[Any](2.5),
                       (1 to 100).map(_.toDouble: Any))) { // forces wide form at default cap
      val chain = buckets(bounds, chainMax = Int.MaxValue)
      val wide = buckets(bounds, chainMax = 0)
      assert(chain == wide, s"forms disagree for bounds=$bounds: $chain vs $wide")
      // scala reference: first i with v < bounds(i), else bounds.length
      val sorted = df.orderBy("v").collect().map(_.getDouble(0))
      val ref = sorted.map { v =>
        val i = bounds.indexWhere(b => v < b.asInstanceOf[Double])
        if (i == -1) bounds.length else i
      }.toSeq
      assert(chain == ref, s"bucket semantics drifted for bounds=$bounds")
    }
    // string bounds ride the same code path (engine ordering, not numeric)
    val sdf = Seq("a", "mm", "z").toDF("v")
    val sb = sdf.select(Sampling.bucketExpr(col("v"), Seq[Any]("m", "x"), 0).as("b"))
      .orderBy("b").collect().map(_.getInt(0)).toSeq
    assert(sb == Seq(0, 1, 2))
  }

  test("packSequences degenerate inputs: empty frame and single row (literal offsets path)") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "n_tok")
    assert(Sampling.packSequences(empty, "k", "n_tok", 512L).count() == 0L)
    val one = Seq((7L, 100L)).toDF("k", "n_tok")
    val out = Sampling.packSequences(one, "k", "n_tok", 512L)
      .select("k", "seq_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((7L, 0L)))
  }

  test("packSequences serializes orderCol peers (ROWS frame, not the RANGE default)") {
    // 4 rows sharing ONE order key, 600 tokens each, budget 512. The
    // default RANGE frame would give every peer the same cumsum (2400) —
    // all four rows in sequence 4 with sequences 0–3 empty. Correct
    // contiguous packing serializes the peers: one row per sequence 0..3.
    val df = Seq((1L, "a", 600L), (1L, "b", 600L), (1L, "c", 600L), (1L, "d", 600L))
      .toDF("k", "payload", "n_tok")
    val out = Sampling.packSequences(df, "k", "n_tok", 512L)
    val seqs = out.select("seq_id").as[Long].collect().sorted.toSeq
    assert(seqs == Seq(0L, 1L, 2L, 3L), s"peers must serialize, got $seqs")
    // and the payload→seq assignment is deterministic across partitionings
    // (full-row hash tiebreak), not whatever order the sort happened upon
    val m1 = out.select("payload", "seq_id").as[(String, Long)].collect().toMap
    val m2 = Sampling.packSequences(df.repartition(3), "k", "n_tok", 512L)
      .select("payload", "seq_id").as[(String, Long)].collect().toMap
    assert(m1 == m2, "peer serialization must be partitioning-independent")
  }

  test("packSequences: random corpora with duplicate keys and nulls match the global reference") {
    // seeded trials over heavy-duplicate order keys, null token counts and
    // random budgets/partitionings, against the naive single-partition
    // global window using the SAME full-row tiebreak
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 200).map { _ =>
        (rnd.nextInt(20).toLong, rnd.alphanumeric.take(3).mkString,
          if (rnd.nextInt(10) == 0) null else java.lang.Long.valueOf(rnd.nextInt(500).toLong))
      }
      val df = rows.toDF("k", "payload", "n_tok")
      val budget = 64L + rnd.nextInt(500)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),   // n_tok ≥ 0, so -1 is a safe null sentinel
          if (r.isNullAt(3)) -1L else r.getLong(3))
      val packed = Sampling.packSequences(df.repartition(1 + rnd.nextInt(8)), "k", "n_tok", budget)
        .select("k", "payload", "n_tok", "seq_id").collect().map(key).sorted.toSeq
      val reference = df.withColumn("seq_id",
        expr(s"(sum(n_tok) OVER (ORDER BY k, xxhash64(k, payload, n_tok) " +
          s"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) div ${budget}L"))
        .select("k", "payload", "n_tok", "seq_id").collect().map(key).sorted.toSeq
      assert(packed == reference, s"seed=$seed budget=$budget diverged")
    }
  }

  test("packSequences with a STRING order column (boundary order must match the engine's <)") {
    // the KMV boundary sample sorts its survivors through a Spark job so
    // boundary order agrees with the engine's UTF8 binary `<` — a
    // driver-side Java compareTo would disagree outside ASCII. Non-ASCII
    // keys included deliberately.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val key = if (i % 7 == 0) s"kéy_${rnd.nextInt(10)}" else f"key_${rnd.nextInt(50)}%02d"
      (key, i.toLong % 97 + 1)
    }
    val df = rows.toDF("k", "n_tok")
    val packed = Sampling.packSequences(df.repartition(5), "k", "n_tok", 128)
      .select("k", "n_tok", "seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val reference = df.withColumn("seq_id",
      expr("(sum(n_tok) OVER (ORDER BY k, xxhash64(k, n_tok) " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) div 128L"))
      .select("k", "n_tok", "seq_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(packed == reference)
  }

  test("packSequences is bit-identical with exchange reuse disabled and AQE on/off") {
    // the round-5 driver failure: the cumsum and offsets branches each
    // held a repartitionByRange subtree, and whenever the physical
    // exchange was NOT reused, RangePartitioner re-sampled its boundaries
    // per execution — __pid diverged between branches and seq_ids went
    // wrong while row count and schema stayed right. The pin makes the
    // partitioning a fact of the data; this spec proves the output no
    // longer depends on ANY exchange-reuse / re-planning decision.
    val withTok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
    def run(): Map[Long, Long] =
      Sampling.packSequences(withTok.repartition(5), "doc_id", "n_tok", 256)
        .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    val conf = spark.conf
    val savedReuse = conf.get("spark.sql.exchange.reuse", "true")
    val savedAqe = conf.get("spark.sql.adaptive.enabled", "true")
    try {
      conf.set("spark.sql.exchange.reuse", "true")
      conf.set("spark.sql.adaptive.enabled", "true")
      val baseline = run()
      for (reuse <- Seq("false", "true"); aqe <- Seq("false", "true")) {
        conf.set("spark.sql.exchange.reuse", reuse)
        conf.set("spark.sql.adaptive.enabled", aqe)
        assert(run() == baseline, s"output drifted at reuse=$reuse aqe=$aqe")
      }
    } finally {
      conf.set("spark.sql.exchange.reuse", savedReuse)
      conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
  }

  test("weightedSample: k rows, deterministic, and inclusion tracks weight") {
    val weighted = (0L until 4000L).map(i => (i, if (i < 400) 50.0 else 1.0))
      .toDF("id", "w")
    val a = Sampling.weightedSample(weighted, "id", "w", k = 400)
      .select("id").as[Long].collect().toSet
    assert(a.size == 400)
    // stable across partitionings
    val b = Sampling.weightedSample(weighted.repartition(13), "id", "w", k = 400)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // the 10% of rows carrying 50× weight should dominate the sample:
    // E[heavy picks] ≈ 330 of 400; even a loose bound separates regimes
    val heavy = a.count(_ < 400L)
    assert(heavy > 200, s"only $heavy/400 heavy-weight rows sampled — weighting not applied")
    // zero/null weights never qualify
    val withZero = weighted.withColumn("w", when(col("id") % 2 === 0, lit(0.0)).otherwise(col("w")))
    val z = Sampling.weightedSample(withZero, "id", "w", k = 100)
      .select("id").as[Long].collect()
    assert(z.forall(_ % 2 == 1))
  }

  test("weightedSample stays weight-proportional at extreme weights (no rounding saturation)") {
    // the u^(1/w) form rounds to 1.000000 for w ≳ 1e6 and selection
    // collapses to ascending id; the ln(u)/w form must keep distinct
    // priorities and still favor the heavy rows
    val weighted = (0L until 2000L).map(i => (i, if (i < 200) 5e7 else 1e6))
      .toDF("id", "w")
    val out = Sampling.weightedSample(weighted, "id", "w", k = 200)
    val pris = out.select("priority").as[Double].collect()
    assert(pris.distinct.length > 150, s"only ${pris.distinct.length}/200 distinct priorities — saturated")
    val ids = out.select("id").as[Long].collect()
    val heavy = ids.count(_ < 200L)
    // heavy rows are 10% of the corpus at 50× weight → expect they dominate
    assert(heavy > 100, s"only $heavy/200 heavy rows sampled — weighting lost at large w")
    // NOT the id-prefix degenerate outcome
    assert(ids.toSet != (0L until 200L).toSet, "sample collapsed to ascending-id prefix")
  }

  test("weightedSample pre-prunes to top-k before the rank merge (no full-corpus sort)") {
    // for the partitionless rank ≤ k, LimitPushDownThroughWindow rewrites
    // to TakeOrderedAndProject(limit=k): each map task keeps a k-row heap
    // and the merge sees k rows per partition — strictly better than the
    // WindowGroupLimit shape the stratified variant gets
    val weighted = (0L until 1000L).map(i => (i, 1.0 + i)).toDF("id", "w")
    val plan = Sampling.weightedSample(weighted, "id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("WindowGroupLimit"),
      s"expected a partial top-k operator in:\n$plan")
  }

  /** Every partitionless logical Window in `df`'s plan must sit above a
    * BOUNDING operator — an Aggregate (the frame is #groups rows) or a
    * Limit (LimitPushDownThroughWindow's shape: the pushed limit feeds
    * the window ≤ k rows) — so the single-partition sort the WindowExec
    * warning complains about never sees the corpus. A global window over
    * raw rows has neither below it and fails here. */
  private def assertGlobalWindowsBounded(df: org.apache.spark.sql.DataFrame,
                                         name: String): Int = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    wins.foreach { w =>
      val bounded = w.child.collectFirst {
        case a: Aggregate => a
        case l: GlobalLimit => l
        case l: LocalLimit => l
      }.isDefined
      assert(bounded,
        s"$name: partitionless window NOT above an aggregate/limit — " +
          s"an unbounded global sort at scale:\n$w")
    }
    wins.size
  }

  test("every partitionless window sees a post-aggregate bounded frame, never the corpus") {
    // temperatureWeights: r7-late, normalization moved to the driver
    // (#strata rows, LocalRelation result) — NO window at all
    val nTw = assertGlobalWindowsBounded(
      Sampling.temperatureWeights(docs, "lang", 0.5), "temperatureWeights")
    assert(nTw == 0,
      "temperatureWeights must have no partitionless window (driver normalization)")
    // packSequences: r7-late, the offsets prefix sum is computed on the
    // driver (≤ #buckets longs) and embedded as a literal map — the
    // final plan has NO partitionless window at all (the per-row cumsum
    // window is partitioned by __pid)
    val withTok = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val nPack = assertGlobalWindowsBounded(
      Sampling.packSequences(withTok, "doc_id", "n_tok", 256), "packSequences")
    assert(nPack == 0,
      "packSequences must have no partitionless window (literal offsets)")
    // weightedSample: the LAST remaining partitionless window in the
    // library. LimitPushDownThroughWindow keeps the Window but feeds it
    // through TakeOrderedAndProject(limit=k), so WindowExec only ever
    // ranks ≤ k rows — bounded by the Limit below it (checked by the
    // helper), not by an aggregate
    val nWs = assertGlobalWindowsBounded(
      Sampling.weightedSample(docs, "doc_id", "n_chars", 50), "weightedSample")
    assert(nWs >= 1, "expected weightedSample's bounded rank window")
  }

  test("interleaveByWeight: prefix proportions track weights; vft ordering deterministic") {
    val rows = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "s")
    val out = Sampling.interleaveByWeight(rows, "s", "id",
      Map("en" -> 3.0, "de" -> 1.0))
      .orderBy(col("vft"), col("s"), col("id"))
      .select("s").as[String].collect()
    // any sizable prefix should hold en:de ≈ 3:1 until en (1000 rows) runs dry
    val prefix = out.take(800)
    val en = prefix.count(_ == "en")
    assert(en > 540 && en < 660, s"en=$en of 800 — expected ≈ 600 (3:1 mix)")
    // weight-0 / unlisted strata drop under default 0
    val out2 = Sampling.interleaveByWeight(rows, "s", "id", Map("en" -> 1.0))
    assert(out2.select("s").distinct().as[String].collect().toSeq == Seq("en"))
    // stable across partitionings (vft is a pure function of stratum rank)
    val v1 = Sampling.interleaveByWeight(rows, "s", "id", Map("en" -> 3.0, "de" -> 1.0))
      .select("id", "vft").as[(Long, Double)].collect().toMap
    val v2 = Sampling.interleaveByWeight(rows.repartition(11), "s", "id",
      Map("en" -> 3.0, "de" -> 1.0))
      .select("id", "vft").as[(Long, Double)].collect().toMap
    assert(v1 == v2)
  }

  test("interleaveByWeight: two-phase rank equals the single-window rank; no whole-stratum window") {
    // exact rank semantics: vft must equal the directly-computed
    // (2·rank−1)/(2w) with rank by (hashDraw, id) within stratum
    val rows = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
      .toDF("id", "s")
    val out = Sampling.interleaveByWeight(rows, "s", "id",
      Map("en" -> 2.0, "de" -> 1.0))
    val naive = rows.withColumn("__w",
        when(col("s") === "en", 2.0).otherwise(1.0))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("s")
          .orderBy(Sampling.hashDraw(col("id"), "graft"), col("id"))))
      .select(col("id"),
        ((col("__rk").cast("double") * 2.0 - 1.0) / (col("__w") * 2.0)).as("vft"))
    val a = out.select("id", "vft").as[(Long, Double)].collect().toMap
    val b = naive.as[(Long, Double)].collect().toMap
    assert(a == b, "two-phase rank must reproduce the reference single-window rank exactly")
    // the scale guard: every rank window must partition by MORE than the
    // stratum alone (stratum + draw bucket), so no reducer ever sees a
    // whole stratum
    val plan = out.queryExecution.executedPlan.toString
    val rankSpecs = "row_number\\(\\) windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(rankSpecs.nonEmpty, s"expected a row_number window in:\n${plan.take(1500)}")
    rankSpecs.foreach { s => assert(s.contains("__pid"),
      s"rank window must include the draw bucket in its partition keys: $s") }
  }

  test("budgetRates: rates hit the budget under the weights, capped at 1") {
    val withTok = docs.withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
    val w = Sampling.temperatureWeights(docs, "lang", 0.7)
      .select(col("lang"), col("weight"))
    val rates = Sampling.budgetRates(withTok, "lang", "n_tok", w, budget = 10000L)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Double]("rate"),
        r.getAs[Double]("stratum_tokens"), r.getAs[Double]("weight")))
    rates.foreach { case (lang, rate, tokens, weight) =>
      assert(rate > 0 && rate <= 1.0, s"$lang rate $rate out of range")
      if (rate < 1.0)
        assert(math.abs(rate * tokens - 10000L * weight) < tokens * 1e-3 + 10,
          s"$lang uncapped rate should satisfy rate*tokens ≈ budget*weight")
    }
  }

  test("temporalSplit: boundary semantics, embargo band, null passthrough") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-19 23:59:59"), (2L, "2024-01-20 00:00:00"),
      (3L, "2024-01-21 12:00:00"), (4L, "2024-01-22 00:00:00"),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-20 00:00:00", "2 days")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(out == Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> null))
  }

  test("temporalSplit: zero embargo makes the cutoff the test start") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-20 00:00:00")).toDF("id", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val out = Sampling.temporalSplit(df, "ts", "2024-01-20 00:00:00").collect()
    assert(out(0).getString(3) == "test")
  }

  test("kFoldAssign: exactly one fold per id, growth-stable, roughly balanced") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val folds = Sampling.kFoldAssign(ids, "id", k = 5)
      .as[(Long, String)].collect().toMap
    assert(folds.size == 2000 && folds.values.toSet == (0 until 5).map(_.toString).toSet)
    // balance: each fold within ±20% of 400 (md5 uniformity at n=2000)
    val sizes = folds.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(n => n > 320 && n < 480), sizes.toMap.toString)
    // growth stability: adding ids never relabels an existing one
    val grown = Sampling.kFoldAssign((1L to 4000L).toDF("id"), "id", 5)
      .as[(Long, String)].collect().toMap
    assert(folds.forall { case (id, f) => grown(id) == f })
    // a different salt draws an independent structure
    val other = Sampling.kFoldAssign(ids, "id", 5, salt = "fold2")
      .as[(Long, String)].collect().toMap
    assert(folds.exists { case (id, f) => other(id) != f })
  }
}
