package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.expressions.native

/** `IsNotNull(total_kernel(args))` must fold to the args' null checks —
  * and must NOT fold for rejection-signaling kernels, whose null output on
  * non-null input carries the validation verdict. */
class SimplifyKernelNullChecksSpec extends SparkSuite {
  import spark.implicits._

  test("total kernel null guard folds out of the scan filter") {
    val df = Seq((1, "abc"), (2, null.asInstanceOf[String])).toDF("id", "s")
    val out = df.filter(native.caseFold(col("s")).isNotNull)
    assert(out.select("id").as[Int].collect().toSeq == Seq(1))
    val plan = out.queryExecution.executedPlan.toString
    val filterLines = plan.split("\n").filter(_.contains("Filter"))
    assert(filterLines.forall(!_.contains("static_invoke")),
      s"caseFold must not be re-evaluated in a filter:\n${filterLines.mkString("\n")}")
  }

  test("rejection kernels (base64Strict) keep their null checks — semantics intact") {
    val df = Seq((1, "aGk="), (2, "!!!not-base64!!!"), (3, null.asInstanceOf[String]))
      .toDF("id", "s")
    // invalid base64 → kernel null → row dropped; folding this guard to
    // IsNotNull(s) would wrongly keep row 2
    val kept = df.filter(native.base64Strict(col("s")).isNotNull)
      .select("id").as[Int].collect().toSeq
    assert(kept == Seq(1), s"only valid base64 must survive, got $kept")
  }

  test("dotI keeps its null check — dimension mismatch must not survive the filter") {
    // dotI returns null on mismatched dims (non-null inputs), so it is a
    // rejection kernel: folding IsNotNull(dot_i(a,b)) to
    // IsNotNull(a) AND IsNotNull(b) would let a bad-dims row through.
    // Repartition defeats ConvertToLocalRelation so the optimizer batch
    // (where SimplifyKernelNullChecks runs) actually sees the filter.
    val df = Seq(
      (1, Seq(1, 2), Seq(3, 4)),
      (2, Seq(1, 2, 3), Seq(3, 4)), // dim mismatch → dotI null
      (3, null.asInstanceOf[Seq[Int]], Seq(3, 4))
    ).toDF("id", "a", "b").repartition(2)
    val kept = df.filter(native.dotI(col("a"), col("b")).isNotNull)
      .select("id").as[Int].collect().toSeq.sorted
    assert(kept == Seq(1), s"mismatched-dims and null rows must be dropped, got $kept")
  }

  test("minhash near-dup scan filters contain no kernel invocations") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", 64, 4, 0.9)
      .queryExecution.executedPlan.toString
    val offending = plan.split("\n")
      .filter(l => (l.contains("Filter") || l.contains("DataFilters")) && l.contains("minhashSig"))
    assert(offending.isEmpty,
      s"minhashSig must run once per row, not inside filters:\n${offending.mkString("\n")}")
  }

  test("derived-comparison guards (sigAgreement >= t) do not re-evaluate kernels in scans") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val out = graft.ops.Dedup.minhashNearDups(docs, "doc_id", "text", 32, 4, 0.5)
    // sanity: query still executes and returns pairs deterministically
    assert(out.count() == out.count())
  }
}
