package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Validate
import graft.{filters => F}

/** The validation-filter rewrite rule must (a) preserve split semantics
  * exactly — including 3-valued-logic corners — and (b) surface pushable
  * predicates to the scan. */
class SimplifyValidationFiltersSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("hello")), (2L, Some("")), (3L, None), (4L, Some("ab")),
    (5L, Some("  ")), (6L, Some("abcdef")))
    .toDF("id", "v")

  test("valid/invalid split counts survive the rewrite on a Required chain") {
    val res = Validate(df, "v" -> (F.Required() | F.MinLength(3)))
    // valid: "hello"(5), "abcdef"(6); "  " has length 2 -> too_short
    assert(res.valid.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 6L))
    assert(res.invalid.count() == 4)
    assert(res.valid.count() + res.invalid.count() == df.count())
  }

  test("nulls stay valid through non-Required chains after rewrite") {
    val res = Validate(df, "v" -> F.MinLength(3))
    // null passes (None-passthrough); "", "ab", "  " fail; hello/abcdef pass
    assert(res.valid.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 6L))
  }

  test("multi-column concat of error arrays rewrites to conjunction") {
    val two = Seq((1L, "a", 5.0), (2L, null.asInstanceOf[String], 3.0), (3L, "b", -1.0))
      .toDF("id", "s", "x")
    val res = Validate(two, "s" -> F.Required(), "x" -> F.Min(0.0))
    assert(res.valid.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(res.invalid.count() == 2)
  }

  test("Required chain pushes IsNotNull into the parquet scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Validate(docs, "text" -> F.Required()).valid
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(text)"), plan.take(2000))
    assert(!plan.contains("size("), "error-array CASE should be rewritten out of the filter")
  }

  test("size(concat)>0 over a NULLABLE array keeps 3VL: null operand rows stay dropped") {
    // a=null: size(concat(a, [1])) is NULL -> filter drops the row; the
    // rewrite must not invert this via Not(null-collapsed-to-false)
    val df = Seq((1, Seq(9)), (2, null.asInstanceOf[Seq[Int]])).toDF("id", "a")
    val cond = size(concat(col("a"), array(lit(1)))) > 0
    val kept = df.filter(cond).select("id").as[Int].collect().toSeq
    assert(kept == Seq(1), s"null-array row must stay dropped, got $kept")
  }

  test("size(CASE)>0: nullable leaf on an UNTAKEN branch must not drop the row") {
    // row 1: c=false, a=null -> CASE takes else -> array(1) non-empty -> KEEP.
    // A global IsNotNull(a) guard would wrongly drop it (round-2 ADVICE bug).
    val df = Seq((1, false, null.asInstanceOf[Seq[Int]]), (2, true, Seq(7)),
      (3, true, null.asInstanceOf[Seq[Int]]), (4, false, Seq(8)))
      .toDF("id", "c", "a")
    val cond = size(when(col("c"), col("a")).otherwise(array(lit(1)))) > 0
    val kept = df.filter(cond).select("id").as[Int].collect().sorted.toSeq
    // row 3: c=true, a=null -> size(null)=null -> dropped (3VL)
    assert(kept == Seq(1, 2, 4), s"expected rows 1,2,4 kept, got $kept")
  }

  test("size(CASE)=0 with nullable leaf on untaken branch keeps 3VL too") {
    val df = Seq((1, false, null.asInstanceOf[Seq[Int]]), (2, true, Seq.empty[Int]),
      (3, true, null.asInstanceOf[Seq[Int]])).toDF("id", "c", "a")
    val cond = size(when(col("c"), col("a")).otherwise(array())) === 0
    val kept = df.filter(cond).select("id").as[Int].collect().sorted.toSeq
    assert(kept == Seq(1, 2), s"expected rows 1,2 kept, got $kept")
  }

  test("size(concat with CASE part)>0: untaken-branch null inside concat stays kept") {
    val df = Seq((1, false, null.asInstanceOf[Seq[Int]]), (2, true, null.asInstanceOf[Seq[Int]]))
      .toDF("id", "c", "a")
    val cond = size(concat(when(col("c"), col("a")).otherwise(array(lit(1))), array(lit(2)))) > 0
    val kept = df.filter(cond).select("id").as[Int].collect().sorted.toSeq
    // row 1: concat([1],[2]) -> keep; row 2: concat(null,[2]) -> null -> drop
    assert(kept == Seq(1), s"expected row 1 kept, got $kept")
  }

  test("invalid split (size > 0) also rewrites and stays correct") {
    val res = Validate(df, "v" -> F.Required())
    val plan = res.invalid.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("size("), plan.take(2000))
    assert(res.invalid.count() == 2) // "" and null; whitespace is not empty
  }
}
