package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.{filters => F}
import graft.filters.Emptiness

/** The pushdown-barrier path and the plain path must produce identical
  * splits — the barrier is purely physical. */
class BarrierEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("heavy chain splits agree with and without the barrier") {
    val chain = F.Required(Emptiness.never) | F.Int() | F.Min(1) | F.Max(50)
    val annotated = Validate.columns(li, "l_quantity" -> chain)
    assert(annotated.useBarrier, "4-step chain with Int must trigger the barrier")
    val forcedOff = annotated.copy(useBarrier = false)
    assert(annotated.valid.count() == forcedOff.valid.count())
    assert(annotated.invalid.count() == forcedOff.invalid.count())
    // and the actual surviving keys agree
    val a = annotated.valid.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val b = forcedOff.valid.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("cheap short chains skip the barrier and still push scan filters") {
    val res = Validate.columns(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "text" -> F.Required())
    assert(!res.useBarrier)
    val plan = res.valid.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(text)"), plan.take(1500))
  }

  test("barrier chain starting with Required still pushes IsNotNull to the scan") {
    val chain = F.Required(Emptiness.never) | F.Int() | F.Min(1) | F.Max(50)
    val res = Validate.columns(li, "l_quantity" -> chain)
    assert(res.useBarrier && res.pushedValid.nonEmpty)
    val plan = res.valid.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity)"),
      plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // the hybrid must not change the split: same keys as the barrier-less plan
    import spark.implicits._
    val a = res.valid.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    val b = res.copy(useBarrier = false, pushedValid = None)
      .valid.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet
    assert(a == b)
    // invalid split keeps EVERY failing row (no precondition leak): null
    // quantities must appear there
    assert(res.invalid.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters"))
      .forall(!_.contains("IsNotNull(l_quantity)")))
  }

  test("barrier plan filters on the computed attribute, not an inlined chain") {
    val chain = F.Required(Emptiness.never) | F.Int() | F.Min(1) | F.Max(50)
    val res = Validate.columns(li, "l_quantity" -> chain)
    val optimized = res.valid.queryExecution.optimizedPlan.toString
    val filterLine = optimized.split("\n").find(_.contains("Filter")).getOrElse("")
    assert(filterLine.contains("_errors") || filterLine.contains("__ve_"),
      s"filter should reference the computed errors attribute: $filterLine")
    assert(filterLine.length < 500, s"filter line suspiciously large: ${filterLine.length}")
  }

  test("failFast with barrier still raises on invalid and passes clean data") {
    val chain = F.Required(Emptiness.never) | F.Int() | F.Min(1) | F.Max(50)
    val good = Seq(("5"), ("25")).toDF("v")
    assert(Validate.columns(good, "v" -> chain).failFast.count() == 2)
    val bad = Seq(("5"), ("99")).toDF("v")
    val ex = intercept[Exception] {
      Validate.columns(bad, "v" -> chain).failFast.count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("too_big")), ex.toString.take(300))
  }
}
