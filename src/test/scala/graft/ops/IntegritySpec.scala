package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class IntegritySpec extends SparkSuite {
  import spark.implicits._

  private def parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")

  test("fkOrphans: missing keys and null keys are orphans by default") {
    val child = Seq(Some(1L), Some(3L), None).toDF("fk")
    val out = Integrity.fkOrphans(child, parent, Seq("fk"), Seq("pk"))
      .as[Option[Long]].collect().toSet
    assert(out == Set(Some(3L), None))
  }

  test("fkOrphans: ignoreNullKeys exempts nullable FKs") {
    val child = Seq(Some(1L), Some(3L), None).toDF("fk")
    val out = Integrity.fkOrphans(child, parent, Seq("fk"), Seq("pk"),
      ignoreNullKeys = true).as[Option[Long]].collect().toSet
    assert(out == Set(Some(3L)))
  }

  test("fkOrphans: duplicate parent keys don't duplicate children") {
    val p = Seq(1L, 1L, 1L).toDF("fk")
    val child = Seq(1L, 2L).toDF("fk")
    val out = Integrity.fkOrphans(child, p, Seq("fk")).as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("dupKeys reports only violating groups with counts") {
    val df = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("k")
    val out = Integrity.dupKeys(df, Seq("k")).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 3L)))
  }

  test("summary counts rows, distinct/null keys, orphans, dup groups") {
    val child = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val row = Integrity.summary(child, parent, Seq("fk"), Seq("pk")).head()
    assert(row.getAs[Long]("n_rows") == 4 && row.getAs[Long]("n_distinct_keys") == 2)
    assert(row.getAs[Long]("n_null_keys") == 1 && row.getAs[Long]("n_orphans") == 1)
    assert(row.getAs[Long]("n_dup_keys") == 1)
  }

  test("skewReport: heaviest first, null key counted, share floored, top-N cut, no window") {
    // key 1 × 6, null × 3, key 2 × 1 — 10 rows total
    val df = (Seq.fill(6)(Option(1L)) ++ Seq.fill(3)(Option.empty[Long]) ++
      Seq(Option(2L))).toDF("k")
    val got = Integrity.skewReport(df, Seq("k"), topN = 2)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getDouble(2)))
    assert(got.length == 2)
    assert(got(0) == (Some(1L), 6L, 0.6) && got(1) == (None, 3L, 0.3))
    // global top-N plans as TakeOrderedAndProject (map-side local top-N),
    // never a window over the key-count table
    val plan = Integrity.skewReport(
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(col("l_orderkey").as("k")), Seq("k"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("benfordCheck: exact digit extraction, zero/null exclusion, absent digits") {
    import spark.implicits._
    // 0.00123 -> grid-scales to 1230 -> digit 1; 905.5 -> digit 9;
    // zero and null excluded; negative uses magnitude
    val df = Seq(Some(0.00123), Some(905.5), Some(-20.0), Some(0.0),
      None, Some(100.0)).toDF("v")
    val rows = Integrity.benfordCheck(df, "v").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1)._1 == 2L && rows(9)._1 == 1L && rows(2)._1 == 1L)
    assert((1 to 9).map(rows(_)._1).sum == 4L)
    assert(rows(3)._1 == 0L && rows(3)._2 == 0.0)
  }

  test("benfordCheck: conforming data scores low MAD, uniform-digit data high") {
    import spark.implicits._
    // a log-uniform grid 10^(i/N) has Benford first digits by construction
    val logu = (0 until 3000).map(i => math.pow(10.0, i / 3000.0)).toDF("v")
    val flat = (1 to 300).map(i => 100.0 + i * 0.001).toDF("v")
    val madConf = Integrity.benfordCheck(logu, "v").head().getDouble(4)
    val madFlat = Integrity.benfordCheck(flat, "v").head().getDouble(4)
    assert(madConf < 0.005, s"conforming MAD $madConf")
    assert(madFlat > 0.1, s"uniform MAD $madFlat")
  }

  test("benfordCheck: expected literals are the pinned grid values") {
    assert(Integrity.benfordExpected(1) == 0.30103)
    assert(Integrity.benfordExpected(9) == 0.045757)
    assert(math.abs(Integrity.benfordExpected.values.sum - 1.0) < 1e-5)
  }
test("chiSquare: hand-computed 2x2 table, independence -> 0, null drop") {
    // observed: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=30; margins 40/40, n=80
    // expected: every cell 20; chi2 = 4 * (10^2/20) = 20; V = sqrt(20/80) = 0.5
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))
    val out = Integrity.chiSquare(rows.toDF("a", "b"), "a", "b")
      .select("n", "r_a", "r_b", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(out == ((80L, 2L, 2L, 1L, 20.0, 0.5)))
    // exact independence: uniform cross product -> chi2 = 0
    val indep = (for { a <- Seq("x", "y", "z"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val z = Integrity.chiSquare(indep, "a", "b")
      .select("chi2", "dof").as[(Double, Long)].head()
    assert(z == ((0.0, 2L)))
    // null categories drop before counting
    val withNull = rows.map { case (a, b) => (Option(a), Option(b)) }
      .toDF("a", "b")
      .unionByName(Seq((Option.empty[String], Option("p"))).toDF("a", "b"))
    assert(Integrity.chiSquare(withNull, "a", "b")
      .select("n").as[Long].head() == 80L)
  }
test("nullPatterns: realized masks, counts, shares") {
    val df = Seq(
      (Some("a"), Some(1)), (Some("b"), Some(2)),       // "11" x2
      (None: Option[String], Some(3)),                   // "01"
      (Some("c"), None: Option[Int])                     // "10"
    ).toDF("s", "n")
    val out = Integrity.nullPatterns(df, Seq("s", "n"))
      .select("pattern", "n", "share")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("01", 1L), ("10", 1L), ("11", 2L)))
    assert(out.find(_._1 == "11").get._3 == 0.5)
    intercept[IllegalArgumentException](Integrity.nullPatterns(df, Nil))
  }
test("fdViolations: only multi-RHS keys emit; null RHS is a version") {
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),                 // clean: one rhs
      (2L, Some("x")), (2L, Some("y")), (2L, Some("y")), // violation: 2 rhs
      (3L, Some("x")), (3L, None: Option[String])        // null IS a second version
    ).toDF("k", "v")
    val out = Integrity.fdViolations(df, Seq("k"), Seq("v"))
      .select("k", "n_distinct_rhs", "n_rows")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((2L, 2L, 3L), (3L, 2L, 2L)))
    // null LHS rows drop (no key to check)
    val withNullKey = df.unionByName(
      Seq((Option.empty[Long], Option("z"))).toDF("k", "v"))
    assert(Integrity.fdViolations(withNullKey, Seq("k"), Seq("v")).count() == 2)
  }
}
