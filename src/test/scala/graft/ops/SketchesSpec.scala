package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Sketch/profile aggregates: bounded-state summaries over the testdata. */
class SketchesSpec extends SparkSuite {
  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("exact and approx percentiles agree within tolerance") {
    val exact = Sketches.percentiles(li, "l_quantity", Seq(0.5))
      .collect()(0).getSeq[Double](0)
    val approx = Sketches.approxQuantiles(li, "l_quantity", Seq(0.5), 0.01)
      .collect()(0).getSeq[Double](0)
    assert(math.abs(exact.head - approx.head) <= 2.0, s"$exact vs $approx")
  }

  test("frequent items finds the dominant value") {
    val skewed = li.withColumn("k",
      when(col("l_orderkey") % 10 < 8, "hot").otherwise(concat(lit("cold"), col("l_orderkey"))))
    val freq = Sketches.frequentItems(skewed, Seq("k"), support = 0.5).collect()(0)
    assert(freq.getSeq[String](0).contains("hot"))
  }

  test("count-min sketch serializes; profile summarizes null rate and range") {
    val cms = Sketches.countMin(li, "l_returnflag").collect()(0)
    assert(cms.get(0) != null)
    val prof = Sketches.profile(li, "l_quantity").collect()(0)
    assert(prof.getLong(0) == li.count() && prof.getLong(1) == 0L)
    assert(prof.getDouble(3) == 1.0 && prof.getDouble(4) == 50.0)
  }

  test("winsorize clamps per stratum; null strata form their own band") {
    import spark.implicits._
    val df = Seq(
      ("a", 0.0), ("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 1000.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0), ("b", 8.0), ("b", 9.0)
    ).toDF("g", "v")
    val w = Sketches.winsorize(df, "v", "g", lo = 0.25, hi = 0.75)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // stratum a: p25 = 10, p75 = 30 -> 0 clamps up, 1000 clamps down
    assert(w.filter(_._1 == "a").map(_._3).sorted.toSeq == Seq(10.0, 10.0, 20.0, 30.0, 30.0))
    // stratum b untouched inside its band except the band edges
    assert(w.filter(_._1 == "b").map(_._3).min == 6.0)
    // null stratum winsorizes within itself, not against a/b
    val withNull = df.union(Seq((null: String, 100.0), (null, 200.0), (null, 300.0)).toDF("g", "v"))
    val nw = Sketches.winsorize(withNull, "v", "g", lo = 0.25, hi = 0.75)
      .filter(col("g").isNull).collect().map(_.getDouble(2)).sorted
    assert(nw.head == 150.0 && nw.last == 250.0, nw.toSeq.toString)
  }

  test("kmv sketch is exact below k, across partitions and duplicates") {
    import spark.implicits._
    // 300 distinct ids, each duplicated 3x, spread over 8 partitions
    val df = (0 until 900).map(_ % 300).toDF("id").repartition(8)
    val sk = df.agg(Sketches.kmv(col("id"), k = 1024).as("sk"))
      .select(size(col("sk")).as("n"),
        Sketches.kmvEstimate(col("sk"), 1024).as("est"))
      .head()
    assert(sk.getInt(0) == 300)
    assert(sk.getDouble(1) == 300.0)
  }

  test("kmv estimator lands near truth when the sketch saturates") {
    import spark.implicits._
    val df = (0 until 20000).toDF("id").repartition(16)
    val est = df.agg(Sketches.kmv(col("id"), k = 256).as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), 256)).head().getDouble(0)
    // (k-1)/theta with k=256: relative error ~1/sqrt(k) ≈ 6%; allow 3σ
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"estimate $est")
  }

  test("kmv set algebra: union / intersection exact below k") {
    import spark.implicits._
    val a = (0 until 400).toDF("id")
    val b = (300 until 700).toDF("id")
    val k = 1024
    val row = a.agg(Sketches.kmv(col("id"), k).as("ska"))
      .crossJoin(b.agg(Sketches.kmv(col("id"), k).as("skb")))
      .select(
        Sketches.kmvIntersectCount(col("ska"), col("skb"), k).as("ni"),
        size(Sketches.kmvUnion(col("ska"), col("skb"), k)).as("nu"),
        Sketches.kmvIntersectEstimate(col("ska"), col("skb"), k).as("est"))
      .head()
    assert(row.getLong(0) == 100L)
    assert(row.getInt(1) == 700)
    assert(row.getDouble(2) == 100.0)
  }

  test("quantileBuckets: monotone, stable for equal values, nulls null, ~equal sizes") {
    val df = spark.range(1, 101).select(col("id"), col("id").as("v"))
      .unionByName(spark.range(101, 102)
        .select(col("id"), lit(null).cast("long").as("v")))
    val out = Sketches.quantileBuckets(df, "v", 4)
      .select("v", "bucket").collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), Option(r.get(1))))
    assert(out.find(_._1.isEmpty).get._2.isEmpty, "null value -> null bucket")
    val vb = out.collect { case (Some(v), Some(b)) => v -> b.asInstanceOf[Int] }
    // monotone in v; 4 buckets of 25 on the uniform 1..100 column
    assert(vb.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    assert(vb.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
    // stability: equal values share a bucket under any partitioning
    val rep = Sketches.quantileBuckets(df.repartition(7), "v", 4)
      .select("v", "bucket").collect()
      .collect { case r if !r.isNullAt(0) => r.getLong(0) -> r.getInt(1) }.toMap
    assert(vb.toMap == rep)
    // approx path keeps the plan shape and the [0, n) range
    val approx = Sketches.quantileBuckets(df, "v", 4, exact = false)
      .filter(col("v").isNotNull).select("bucket").collect().map(_.getInt(0))
    assert(approx.forall(b => b >= 0 && b < 4))
  }

  test("globalRank equals the single-window row_number, incl. ties and approx path") {
    import org.apache.spark.sql.expressions.Window
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice") % 1000).as("v")) // % forces tie groups
    val want = o.withColumn("rank",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (exact <- Seq(true, false)) {
      val got = Sketches.globalRank(o.repartition(9), "v", "id", nBuckets = 8,
          exact = exact)
        .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"exact=$exact")
    }
  }

  test("globalRank drops null values/ids and ranks 1..n") {
    val df = spark.range(1, 51).select(col("id"), (col("id") * 2).as("v"))
      .unionByName(spark.range(51, 53)
        .select(col("id"), lit(null).cast("long").as("v")))
    val got = Sketches.globalRank(df, "v", "id", nBuckets = 4)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sorted.toSeq == (1L to 50L).toSeq)
    assert(!got.map(_._1).exists(i => i >= 51))
  }

  test("plan: globalRank/coverageCut windows are per-bucket, never corpus-global") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    // the scale hazard both operators exist to avoid: a row_number /
    // running sum whose windowspec has NO partition column ships the
    // corpus to one reducer. Every window over row data must partition
    // by the bucket; the only unpartitioned windows allowed are the ones
    // over the nBuckets-row counts table (which sort AFTER a groupBy on
    // the bucket — asserted by their input being an aggregate, which the
    // full-plan string check below approximates by requiring the
    // row-data window functions to name __b as a partition key).
    val rankPlan = Sketches.globalRank(li, "l_extendedprice", "l_orderkey",
        nBuckets = 4).queryExecution.executedPlan.toString
    assert(rankPlan.contains("row_number() windowspecdefinition(__b"),
      s"rank window must partition by bucket:\n${rankPlan.take(2000)}")
    assert(!rankPlan.contains("CartesianProduct"), rankPlan.take(2000))
    val cutPlan = Sketches.coverageCut(li, "l_partkey", 0.5, nBuckets = 4)
      .queryExecution.executedPlan.toString
    // the per-key running sum partitions by bucket; sum windows without
    // a partition only appear over the post-aggregate bucket tables
    assert(cutPlan.contains("windowspecdefinition(__b"),
      s"running-sum window must partition by bucket:\n${cutPlan.take(2000)}")
    assert(!cutPlan.contains("CartesianProduct"), cutPlan.take(2000))
  }

  test("coverageCut keeps the minimal head covering p, crossing key included") {
    import spark.implicits._
    // masses 40, 30, 20, 10 (total 100)
    val rows = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      Seq.fill(10)("d")
    val df = rows.toDF("k").repartition(5)
    def keys(p: Double) =
      Sketches.coverageCut(df, "k", p).collect().map(_.getString(0)).toSet
    assert(keys(0.3) == Set("a"))              // 40 crosses 30
    assert(keys(0.4) == Set("a"))              // exactly covered by a
    assert(keys(0.41) == Set("a", "b"))
    assert(keys(0.95) == Set("a", "b", "c", "d")) // 90 < 95 -> d kept
    assert(keys(1.0) == Set("a", "b", "c", "d"))
    // explicit weight column + tie-break by key: b and c tie at 25
    val wdf = Seq(("a", 50L), ("b", 25L), ("c", 25L)).toDF("k", "w")
    val cut = Sketches.coverageCut(wdf, "k", 0.75, weightCol = Some("w"))
      .collect().map(r => (r.getString(0), r.getDecimal(2).longValue()))
    assert(cut.map(_._1).toSet == Set("a", "b")) // ties walk in key order
    assert(cut.toMap == Map("a" -> 50L, "b" -> 75L))
  }

  test("selectByBudget takes the best rows until the budget crosses") {
    import spark.implicits._
    // (id, score, cost): walk b(9,5) -> a(7,10) -> d(5,4) -> c(2,100)
    val df = Seq((1L, 7.0, 10L), (2L, 9.0, 5L), (3L, 2.0, 100L),
      (4L, 5.0, 4L)).toDF("id", "score", "cost")
    def ids(b: Double) =
      Sketches.selectByBudget(df, "id", "score", "cost", b, nBuckets = 2)
        .collect().map(_.getLong(0)).toSet
    assert(ids(5.0) == Set(2L))              // b alone crosses
    assert(ids(5.1) == Set(2L, 1L))          // cum-before a = 5 < 5.1
    assert(ids(16.0) == Set(2L, 1L, 4L))     // d's cum-before = 15 < 16
    assert(ids(1000.0) == Set(1L, 2L, 3L, 4L))
    // emits the original columns plus cum_cost
    val row = Sketches.selectByBudget(df, "id", "score", "cost", 5.0, 2)
      .select("id", "score", "cost", "cum_cost").head()
    assert(row.getLong(0) == 2L && row.getDecimal(3).longValue() == 5L)
  }

  test("selectByBudget matches an exhaustive reference on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
      .withColumn("toks",
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long"))
    val rows = docs.select("doc_id", "n_chars", "toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val budget = 5000.0
    val sorted = rows.sortBy { case (id, s, _) => (-s, id) }
    val want = sorted.scanLeft(0L)(_ + _._3).init.zip(sorted)
      .collect { case (before, (id, _, _)) if before < budget => id }.toSet
    val got = Sketches.selectByBudget(docs, "doc_id", "n_chars", "toks",
        budget, nBuckets = 8)
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("selectByBudgetPerGroup walks each stratum independently") {
    import spark.implicits._
    val df = Seq(
      ("en", 1L, 9.0, 6L), ("en", 2L, 7.0, 6L), ("en", 3L, 5.0, 6L),
      ("fr", 4L, 4.0, 3L), ("fr", 5L, 3.0, 3L), ("fr", 6L, 2.0, 3L),
      ("de", 7L, 1.0, 100L)).toDF("lang", "id", "score", "cost")
    val got = Sketches.selectByBudgetPerGroup(df, "lang", "id", "score",
        "cost", 8.0).collect().map(_.getLong(1)).toSet
    // en: 1 (cum-before 0), 2 (6 < 8), not 3 (12); fr: 4,5,6 (0,3,6 < 8);
    // de: crossing row kept even though its cost alone exceeds the budget
    assert(got == Set(1L, 2L, 4L, 5L, 6L, 7L))
  }

  test("correlationMatrix: reference values, nulls pairwise, constant col null") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(5.0)),
      (Some(4.0), None: Option[Double], Some(5.0)),
      (None: Option[Double], Some(9.0), Some(5.0))
    ).toDF("a", "b", "c")
    val m = Sketches.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(m(("a", "a"))._2.contains(1.0))
    assert(m(("a", "b")) == ((3L, Some(1.0))), "b = 2a exactly on shared rows")
    assert(m(("a", "c"))._2.isEmpty, "constant column has zero variance")
    assert(m(("b", "c"))._1 == 4L, "pairwise n excludes only the null rows")
    // partitioning invariance: decimal moments make the matrix bitwise
    // identical however the rows are split
    val again = Sketches.correlationMatrix(df.repartition(7), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m.view.mapValues(_._2).toMap == again)
  }

  test("correlationMatrixComplete: listwise semantics; ≡ pairwise on null-free data") {
    import spark.implicits._
    val withNulls = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(6.0)),
      (Some(3.0), Some(6.0), Some(4.0)),
      (Some(4.0), None: Option[Double], Some(5.0)),
      (None: Option[Double], Some(9.0), Some(5.0))
    ).toDF("a", "b", "c")
    // listwise: every pair sees ONLY the 3 complete rows
    val m = Sketches.correlationMatrixComplete(withNulls, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(m.values.forall(_._1 == 3L), "all pairs share the complete-row count")
    assert(m(("a", "b"))._2.contains(1.0), "b = 2a on complete rows")
    // null-free data: complete-rows and pairwise matrices are bit-identical,
    // under any partitioning (shared vs per-pair moments sum the same grid)
    val dense = withNulls.na.drop()
    val pw = Sketches.correlationMatrix(dense, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val cm = Sketches.correlationMatrixComplete(dense.repartition(7), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(pw == cm)
  }

  test("correlationMatrix matches Spark's own corr on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = Sketches.correlationMatrix(li,
        Seq("l_quantity", "l_extendedprice", "l_discount"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    for ((x, y) <- Seq(("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"), ("l_extendedprice", "l_discount"))) {
      val want = li.agg(corr(col(x), col(y))).head().getDouble(0)
      // 1e-6 value grid + exact moments vs float accumulation: close, not equal
      assert(math.abs(got((x, y)) - want) < 1e-4, s"$x vs $y: ${got((x, y))} vs $want")
    }
  }

  test("giniConcentration: closed-form pins, invariances, exhaustive reference") {
    import spark.implicits._
    def gini(df: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val r = Sketches.giniConcentration(df, "k", lit(1L)).head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    // perfectly even: 4 keys x 5 rows each -> G = 0
    val even = (1 to 4).flatMap(k => Seq.fill(5)(k)).toDF("k")
    assert(gini(even) == ((4L, 20L, 0.0)))
    // hand-computed skew: masses (1,1,1,97) -> G = (2*394 - 5*100)/(4*100)
    val skew = (Seq(1, 2, 3) ++ Seq.fill(97)(4)).toDF("k")
    assert(gini(skew) == ((4L, 100L, 0.72)))
    assert(gini(skew.repartition(13)) == ((4L, 100L, 0.72)), "partitioning-proof")
    // exhaustive reference on real data
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").as("k"))
    val counts = orders.groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(x => (x._2, x._1))
    val n = counts.length.toDouble
    val s0 = counts.map(_._2).sum.toDouble
    val s1 = counts.zipWithIndex.map { case ((_, m), i) => (i + 1).toDouble * m }.sum
    val want = math.floor((2.0 * s1 - (n + 1.0) * s0) / (n * s0) * 1e9 + 0.5) / 1e9
    val (gn, gt, gg) = gini(orders)
    assert(gn == counts.length && gt == s0.toLong && gg == want)
  }

  test("coverageCut matches an exhaustive reference on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val counts = li.groupBy("l_partkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = counts.map(_._2).sum.toDouble
    val sorted = counts.sortBy { case (k, n) => (-n, k) }
    val want = sorted.scanLeft(0L)(_ + _._2).init.zip(sorted)
      .collect { case (before, (k, _)) if before < 0.6 * total => k }.toSet
    val got = Sketches.coverageCut(li, "l_partkey", 0.6, nBuckets = 8)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  // ---- profileDrift ------------------------------------------------------

  private def driftMap(before: org.apache.spark.sql.DataFrame,
                       after: org.apache.spark.sql.DataFrame) =
    Sketches.profileDrift(before, after, exact = true)
      .collect().map(r => r.getString(0) -> r).toMap

  test("profileDrift: schema changes are flagged with the right status") {
    import spark.implicits._
    val before = Seq((1L, "a", 1.0)).toDF("id", "gone", "num")
    val after = Seq((1L, true, "1.0")).toDF("id", "fresh", "num")
    val m = driftMap(before, after)
    assert(m("gone").getString(1) == "removed" && m("gone").getBoolean(15))
    assert(m("fresh").getString(1) == "added" && m("fresh").getBoolean(15))
    assert(m("num").getString(1) == "type_changed" &&
      m("num").getString(2) == "double" && m("num").getString(3) == "string" &&
      m("num").getBoolean(15))
    assert(m("id").getString(1) == "common" && !m("id").getBoolean(15))
  }

  test("profileDrift: null-rate drift fires over tolerance, not under") {
    import spark.implicits._
    val before = (1 to 100).map(i => Some(i)).toDF("v")
    val afterSmall = (1 to 100).map(i => if (i == 1) None else Some(i)).toDF("v")
    val afterBig = (1 to 100).map(i => if (i <= 70) None else Some(i)).toDF("v")
    // 1% exactly is NOT > tol; 70% is — and the 1e-6 grid keeps both exact
    assert(!driftMap(before, afterSmall)("v").getBoolean(15))
    val hit = driftMap(before, afterBig)("v")
    assert(hit.getBoolean(15) && hit.getDouble(8) == 0.7)
  }

  test("profileDrift: distinct-ratio drift, including the zero side") {
    import spark.implicits._
    val before = (1 to 100).map(i => i % 50).toDF("v")
    val collapsed = (1 to 100).map(i => i % 10).toDF("v")
    assert(driftMap(before, collapsed)("v").getBoolean(15))
    val similar = (1 to 100).map(i => i % 40).toDF("v")
    assert(!driftMap(before, similar)("v").getBoolean(15))
    // all-null after: distinct 50 -> 0 is drift (and rate drift too)
    val allNull = (1 to 100).map(_ => Option.empty[Int]).toDF("v")
    assert(driftMap(before, allNull)("v").getBoolean(15))
  }

  test("profileDrift: numeric min/max ride along as doubles, strings stay null") {
    import spark.implicits._
    val before = Seq((1L, "x"), (9L, "y")).toDF("n", "s")
    val after = Seq((3L, "z"), (12L, "w")).toDF("n", "s")
    val m = driftMap(before, after)
    assert(m("n").getDouble(11) == 1.0 && m("n").getDouble(12) == 9.0)
    assert(m("n").getDouble(13) == 3.0 && m("n").getDouble(14) == 12.0)
    assert(m("s").isNullAt(11) && m("s").isNullAt(14))
  }

  test("profileDrift: empty side yields zero rates, no division blowup") {
    import spark.implicits._
    val before = Seq((1L, "a")).toDF("id", "s")
    val after = before.filter(col("id") < 0)
    val m = driftMap(before, after)
    assert(m("id").getLong(5) == 0L && m("id").getDouble(8) == -0.0 ||
      m("id").getDouble(8) == 0.0)
  }

  test("profileDrift: dotted column names survive (aliases index by position)") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(StructField("a.b", LongType), StructField("c", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "x"), Row(2L, null)), 1), schema)
    val m = driftMap(df, df)
    assert(m("a.b").getString(1) == "common" && m("a.b").getLong(10) == 2L)
    assert(m("c").getLong(7) == 1L && !m("c").getBoolean(15))
  }

  test("profileDrift: approx path keeps the schema and statuses") {
    import spark.implicits._
    val before = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val after = before.drop("s").withColumn("t", lit(1))
    val out = Sketches.profileDrift(before, after, exact = false)
    assert(out.columns.toSeq == Sketches.profileDrift(before, after, exact = true).columns.toSeq)
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("id" -> "common", "s" -> "removed", "t" -> "added"))
  }

  test("percentileNormalize equals the per-stratum rank window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(3)
    val df = (0 until 500).map(i =>
      (i.toLong, s"g${i % 4}", rnd.nextInt(50).toDouble)).toDF("id", "g", "v")
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select(col("id"),
        (floor(col("rn").cast("double") / col("cnt") * 1e6) / 1e6).as("pct"))
      .as[(Long, Double)].collect().toMap
    val got = Sketches.percentileNormalize(df.repartition(7), "v", "id",
        Seq("g"), nBuckets = 8)
      .select("id", "pct").as[(Long, Double)].collect().toMap
    assert(got == want)
    // each stratum's max percentile is exactly 1.0; nulls drop
    val withNull = df.unionByName(Seq((999L, null.asInstanceOf[String], 1.0))
      .toDF("id", "g", "v"))
    val out = Sketches.percentileNormalize(withNull, "v", "id", Seq("g"))
    assert(!out.select("id").as[Long].collect().contains(999L))
    assert(out.groupBy("g").agg(max("pct")).as[(String, Double)]
      .collect().forall(_._2 == 1.0))
  }

  test("scorePsi: identical snapshots → all-zero terms; a shift is flagged") {
    import spark.implicits._
    val base = (1 to 1000).map(_.toDouble / 10).toDF("v")
    val same = Sketches.scorePsi(base, base, "v", nBins = 10)
      .select("psi_term").as[Double].collect()
    assert(same.forall(_ == 0.0), same.toSeq.toString) // pa == pb exactly
    // after-shift: top half doubled — mass leaves the lower baseline bins
    val shifted = base.select((when(col("v") > 50.0, col("v") * 2)
      .otherwise(col("v"))).as("v"))
    val psi = Sketches.scorePsi(base, shifted, "v", nBins = 10)
      .select("psi_term").as[Double].collect().sum
    assert(psi > 0.25, s"expected a retrain-grade PSI, got $psi")
  }

  test("scorePsi: empty bins smoothed finite, nulls drop, full spine") {
    import spark.implicits._
    val before = (1 to 100).map(_.toDouble).toDF("v")
    // after-snapshot collapses onto one value: 9 of 10 bins empty
    val after = Seq.fill(50)(Some(1.0)).toDF("v")
      .unionByName(Seq[Option[Double]](None).toDF("v"))
    val out = Sketches.scorePsi(before, after, "v", nBins = 10)
      .select("bin", "n_after", "psi_term")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 10L).toSeq) // every bin present
    assert(out.map(_._2).sum == 50L)                    // the null dropped
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("count-min: estimates never undercount, exact at generous width") {
    import spark.implicits._
    // skewed multiplicities: key k occurs k times
    val rows = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val exact = (1 to 40).map(k => k.toLong -> k.toLong).toMap
    val cands = (1 to 40).map(_.toLong).toDF("k")
    // tight width (16 buckets, 40 keys): collisions guaranteed, bound holds
    val tight = Sketches.cmsEstimate(
        Sketches.cmsBuild(rows, "k", depth = 4, width = 16),
        cands, "k", depth = 4, width = 16)
      .as[(Long, Long)].collect().toMap
    (1 to 40).foreach(k => assert(tight(k.toLong) >= exact(k.toLong),
      s"key $k: est ${tight(k.toLong)} < exact ${exact(k.toLong)}"))
    assert(tight.values.sum > exact.values.sum) // collisions DID overcount
    // generous width: 4 independent rows of 4096 buckets vs 40 keys — a
    // collision in ALL FOUR rows would be needed to overcount
    val wide = Sketches.cmsEstimate(
        Sketches.cmsBuild(rows, "k", depth = 4, width = 4096),
        cands, "k", depth = 4, width = 4096)
      .as[(Long, Long)].collect().toMap
    assert(wide == exact)
  }

  test("count-min: cell table bounded, merges by cell-wise addition") {
    import spark.implicits._
    val a = (1 to 500).map(i => (i % 60).toLong).toDF("k")
    val b = (1 to 300).map(i => (i % 37).toLong).toDF("k")
    val d = 4; val w = 32
    val ca = Sketches.cmsBuild(a, "k", d, w)
    val cb = Sketches.cmsBuild(b, "k", d, w)
    assert(ca.count() <= d * w && cb.count() <= d * w)
    // merged sketch = union + per-cell sum; estimates must equal the
    // sketch built over the concatenated corpus
    val merged = ca.unionByName(cb).groupBy("i", "bucket")
      .agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsBuild(a.unionByName(b), "k", d, w)
    val cands = (0 until 60).map(_.toLong).toDF("k")
    val em = Sketches.cmsEstimate(merged, cands, "k", d, w)
      .as[(Long, Long)].collect().toMap
    val ew = Sketches.cmsEstimate(whole, cands, "k", d, w)
      .as[(Long, Long)].collect().toMap
    assert(em == ew)
  }

  test("count-min: null keys drop; width must be a power of two") {
    import spark.implicits._
    val d = Seq(Some(1L), None, Some(1L)).toDF("k")
    val cms = Sketches.cmsBuild(d, "k", depth = 2, width = 8)
    assert(cms.agg(sum("cnt")).as[Long].head() == 2 * 2) // 2 rows × depth
    intercept[IllegalArgumentException] {
      Sketches.cmsBuild(d, "k", depth = 2, width = 100)
    }
  }

  test("skyline2D: dominance with ties and duplicated frontier points") {
    import spark.implicits._
    val pts = Seq(
      (1L, 1.0, 9.0),  // frontier (max y at min x, nothing right is ≥ 9)
      (2L, 1.0, 5.0),  // dominated by id 1 (same x, higher y)
      (3L, 5.0, 7.0),  // dominated by id 5 (greater x, equal y)
      (4L, 5.0, 7.0),  // duplicate of 3 — dominated with it
      (5L, 7.0, 7.0),  // frontier (nothing is ≥ in both dims with one strict)
      (6L, 9.0, 3.0),  // frontier (max x)
      (7L, 8.0, 2.0))  // dominated by 6
      .toDF("id", "x", "y")
    val got = Sketches.skyline2D(pts, "x", "y").select("id").as[Long]
      .collect().toSet
    assert(got == Set(1L, 5L, 6L))
  }

  test("skyline2D matches the quadratic dominance reference on random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val pts = (0 until 400).map(i =>
      (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(50).toDouble))
    for (buckets <- Seq(2, 64)) { // tiny bucket count forces the carry path
      val got = Sketches.skyline2D(pts.toDF("id", "x", "y"), "x", "y", buckets)
        .select("id").as[Long].collect().toSet
      val want = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._1).toSet
      assert(got == want, s"nBuckets=$buckets")
    }
  }

  test("ksStatistic: hand-computed D, identical slices → 0, grid snapping") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: CDFs diverge most at v=2 (1/2 vs 0)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val r = Sketches.ksStatistic(df, "v", col("g") === "a", col("g") === "b", 1.0)
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((4L, 4L, 0.5, 2.0)))
    val same = Sketches.ksStatistic(df, "v", col("g").isNotNull, col("g").isNotNull, 1.0)
      .as[(Long, Long, Double, Double)].head()
    assert(same._3 == 0.0)
    // grid 100 folds everything into one cell → D = 0
    val coarse = Sketches.ksStatistic(df, "v", col("g") === "a", col("g") === "b", 100.0)
      .as[(Long, Long, Double, Double)].head()
    assert(coarse._3 == 0.0)
  }

  test("ksStatistic matches a local reference on random samples") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val xs = (0 until 400).map(_ => ("a", rnd.nextInt(50).toDouble))
    val ys = (0 until 300).map(_ => ("b", (rnd.nextInt(50) + rnd.nextInt(10)).toDouble))
    val df = (xs ++ ys).toDF("g", "v")
    val got = Sketches.ksStatistic(df, "v", col("g") === "a", col("g") === "b", 1.0)
      .as[(Long, Long, Double, Double)].head()
    val va = xs.map(_._2).sorted; val vb = ys.map(_._2).sorted
    val support = (va ++ vb).distinct.sorted
    val dRef = support.map { x =>
      math.abs(va.count(_ <= x).toDouble / va.size - vb.count(_ <= x).toDouble / vb.size)
    }.max
    assert(math.abs(got._3 - dRef) < 1e-8, s"got ${got._3}, want $dRef")
  }

  test("ksStatisticBy: per-stratum D equals per-slice ksStatistic; empty side → null") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (for (g <- Seq("x", "y"); _ <- 1 to 200) yield
      (g, if (rnd.nextBoolean()) "a" else "b",
        (rnd.nextInt(30) + (if (g == "y") rnd.nextInt(10) else 0)).toDouble)) ++
      Seq(("z", "a", 5.0), ("z", "a", 7.0)) // no b rows in stratum z
    val df = rows.toDF("g", "side", "v")
    val by = Sketches.ksStatisticBy(df, "g", "v", col("side") === "a",
        col("side") === "b", 1.0)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    for (g <- Seq("x", "y")) {
      val single = Sketches.ksStatistic(df.filter(col("g") === g), "v",
        col("side") === "a", col("side") === "b", 1.0)
        .as[(Long, Long, Double, Double)].head()
      assert((by(g)._2, by(g)._3, by(g)._4.get, by(g)._5.get) ==
        ((single._1, single._2, single._3, single._4)), s"stratum $g")
    }
    assert(by("z")._4.isEmpty && by("z")._5.isEmpty) // empty b slice → null D
  }

  test("mutualInfo: independence → 0, determinism → H(X), hand 2×2") {
    import spark.implicits._
    // perfectly independent 2×2 (balanced): MI = 0
    val ind = Seq(("x", "u"), ("x", "w"), ("y", "u"), ("y", "w")).toDF("a", "b")
    val r0 = Sketches.mutualInfo(ind, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r0 == ((4L, 4L, 0.0, Some(0.0))))
    // y = f(x): MI = H(X) = ln 2 for a balanced binary x, normalized = 1
    val dep = Seq(("x", "u"), ("x", "u"), ("y", "w"), ("y", "w")).toDF("a", "b")
    val r1 = Sketches.mutualInfo(dep, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(math.abs(r1._3 - math.log(2.0)) < 1e-9)
    assert(math.abs(r1._4.get - 1.0) < 1e-9)
    // hand-computed skewed 2×2: counts (x,u)=2 (x,w)=1 (y,u)=1
    val skew = Seq(("x", "u"), ("x", "u"), ("x", "w"), ("y", "u")).toDF("a", "b")
    val r2 = Sketches.mutualInfo(skew, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    def t(p: Double, px: Double, py: Double) =
      math.floor(p * math.log(p / (px * py)) * 1e12 + 0.5) / 1e12
    val want = t(0.5, 0.75, 0.75) + t(0.25, 0.75, 0.25) + t(0.25, 0.25, 0.75)
    assert(math.abs(r2._3 - math.floor(want * 1e9 + 0.5) / 1e9) < 1e-12)
  }

  test("mutualInfo: single-level column → zero entropy → null normalized") {
    import spark.implicits._
    val df = Seq(("x", "u"), ("x", "w")).toDF("a", "b")
    val r = Sketches.mutualInfo(df, "a", "b")
      .as[(Long, Long, Double, Option[Double])].head()
    assert(r._3 == 0.0 && r._4.isEmpty) // H(a) = 0 → normalizer undefined
  }
}
