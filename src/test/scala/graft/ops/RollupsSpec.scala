package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class RollupsSpec extends SparkSuite {
  import spark.implicits._

  test("topKPerGroup: descending with tie break, nulls last") {
    val df = Seq(("g1", 1L, 5.0), ("g1", 2L, 9.0), ("g1", 3L, 9.0),
      ("g1", 4L, 1.0), ("g2", 5L, 2.0)).toDF("g", "id", "v")
    val out = Rollups.topKPerGroup(df, Seq("g"), "v", 2, "id")
      .orderBy("g", "rank")
      .select("g", "id", "rank").as[(String, Long, Int)].collect().toSeq
    // ties on v=9.0 resolve by id ascending
    assert(out == Seq(("g1", 2L, 1), ("g1", 3L, 2), ("g2", 5L, 1)))
  }

  test("topKPerGroup plans a WindowGroupLimit (map-side pre-prune)") {
    // the InferWindowGroupLimit rule does not fire over a LocalRelation
    // (verified empirically) — assert on the real-source plan, which is
    // the shape that matters at scale
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Rollups.topKPerGroup(o, Seq("o_orderpriority"),
      "o_totalprice", 3, "o_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan) // map-side pre-prune before the exchange
  }

  test("pivotCounts: explicit values, zero fill, other bucket") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", "zz"), ("de", "b"),
      ("de", null.asInstanceOf[String])).toDF("lang", "src")
    val out = Rollups.pivotCounts(df, "lang", "src", Seq("a", "b"))
      .orderBy("lang").as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("de", 0L, 1L, 1L), ("en", 2L, 0L, 1L)))
  }

  test("equiWidthHistogram: drop vs clamp, empty bins emitted") {
    val df = Seq(-1.0, 0.0, 0.5, 1.5, 9.9, 10.0, 99.0).toDF("v")
    // width 2.0: 0.0/0.5/1.5 -> bin 0, 9.9 -> bin 4; -1.0, 10.0, 99.0 drop
    val drop = Rollups.equiWidthHistogram(df, "v", 0.0, 10.0, 5)
      .orderBy("bin").select("bin", "n").as[(Long, Long)].collect().toSeq
    assert(drop == Seq((0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
    // clamp folds -1.0 into bin 0 and 10.0/99.0 into bin 4
    val clamp = Rollups.equiWidthHistogram(df, "v", 0.0, 10.0, 5, clamp = true)
      .orderBy("bin").select("bin", "n").as[(Long, Long)].collect().toSeq
    assert(clamp == Seq((0L, 4L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 3L)))
  }

  test("equiWidthHistogram: bin edges are exact") {
    val df = Seq(3.0).toDF("v")
    val row = Rollups.equiWidthHistogram(df, "v", 0.0, 10.0, 5)
      .filter(col("n") > 0).head()
    assert(row.getLong(0) == 1L && row.getDouble(1) == 2.0 && row.getDouble(2) == 4.0)
  }

  test("madOutliers: hand-computed modified z-scores and flags") {
    // group g: values 1..5 -> median 3, MAD 1; value 100 -> rz huge
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0),
      ("g", 4L, 4.0), ("g", 5L, 5.0), ("g", 6L, 100.0)).toDF("g", "id", "v")
    val out = Sketches.madOutliers(df, "v", "g")
      .orderBy("id").select("v_rz", "v_outlier")
      .as[(Option[Double], Boolean)].collect().toSeq
    // median of 6 values (1,2,3,4,5,100) = 3.5; residuals (2.5,1.5,.5,.5,1.5,96.5)
    // MAD = 1.5; rz(1.0) = .6745*(1-3.5)/1.5 = -1.124167
    assert(out.head._1.exists(v => math.abs(v - (-1.124167)) < 1e-9))
    assert(!out.head._2 && out.last._2) // 100 flags, 1 does not
  }

  test("imputeMedian: fills per-stratum, leaves all-null strata alone") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(3.0)),
      ("a", 3L, None), ("b", 4L, None)).toDF("g", "id", "v")
    val out = Sketches.imputeMedian(df, "v", "g")
      .orderBy("id").select("v_filled").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0), Some(3.0), Some(2.0), None))
  }

  test("imputeMedian: null stratum imputes within its own band") {
    val df = Seq((Option.empty[String], 1L, Some(5.0)),
      (Option.empty[String], 2L, None)).toDF("g", "id", "v")
    val out = Sketches.imputeMedian(df, "v", "g")
      .orderBy("id").select("v_filled").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(5.0), Some(5.0)))
  }

  test("exactWithMultiplicity preserves group size and weight mass") {
    val df = Seq((1L, "x", 10.0), (2L, "x", 5.0), (3L, "y", 1.0),
      (4L, "x", Double.NaN)).toDF("id", "k", "w")
      .withColumn("w", when(col("id") === 4, lit(null)).otherwise(col("w")))
    val out = Dedup.exactWithMultiplicity(df, Seq("k"), "id", Some("w"))
      .orderBy("k").select("id", "n_dups", "weight")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 15.0), (3L, 1L, 1.0))) // null weight counts 0
  }

  test("madOutliers: zero-MAD stratum yields null scores, false flags") {
    val df = Seq(("g", 1L, 7.0), ("g", 2L, 7.0), ("g", 3L, 7.0),
      ("g", 4L, 999.0)).toDF("g", "id", "v")
    val out = Sketches.madOutliers(df, "v", "g")
      .select("v_rz", "v_outlier").as[(Option[Double], Boolean)].collect()
    assert(out.forall(r => r._1.isEmpty && !r._2))
  }

  test("retentionCohorts: first-active cohorts, return offsets, dedup within month") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-05 00:00:00")), (1L, t("2024-01-20 00:00:00")), // dedup
      (1L, t("2024-03-01 00:00:00")),                                 // returns +2
      (2L, t("2024-01-02 00:00:00")), (2L, t("2024-02-02 00:00:00")), // +1
      (3L, t("2024-02-15 00:00:00")),                                 // feb cohort
      (4L, null.asInstanceOf[java.sql.Timestamp])                     // drops
    ).toDF("user_id", "ts")
    val got = Rollups.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val jan = 2024 * 12 + 1
    val feb = jan + 1
    assert(got == Map(
      (jan, 0) -> 2L, // users 1, 2 first active in jan (one row each)
      (jan, 1) -> 1L, // user 2 back in feb
      (jan, 2) -> 1L, // user 1 back in mar
      (feb, 0) -> 1L  // user 3's own cohort
    ))
  }
}
