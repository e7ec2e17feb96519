package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Duplicated k-token span excision ([[Dedup.dedupSpansKeepFirst]]):
  * keep-first at window granularity, overlap merging, short-doc
  * passthrough, emptied-doc drop, repartition determinism. */
class DedupSpansSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int): Map[Long, String] =
    Dedup.dedupSpansKeepFirst(rows.toDF("id", "text"), "id", "text", k = k)
      .as[(Long, String)].collect().toMap

  test("a span duplicated into a later doc is excised there, kept in the first") {
    // context tokens are fully doc-unique: sharing even ONE token
    // adjacent to the span would create an extra duplicate window and
    // (correctly) extend the excision — the next test pins that
    val shared = "alpha beta gamma delta" // k=4 → exactly one window
    val out = run(Seq(
      (1L, s"d1a d1b $shared d1c d1d"),
      (2L, s"d2a d2b $shared d2c d2d")), k = 4)
    assert(out(1L) == s"d1a d1b $shared d1c d1d")
    assert(out(2L) == "d2a d2b d2c d2d")
  }

  test("shared context adjacent to a shared span extends the excision (maximal match)") {
    // both docs continue the span with the same token, so the window
    // sliding one past the span end is ALSO a duplicate — the repeated
    // region is excised to its maximal extent, like suffix-array
    // exact-substring dedup would
    val out = run(Seq(
      (1L, "d1a alpha beta gamma delta common d1b"),
      (2L, "d2a alpha beta gamma delta common d2b")), k = 4)
    assert(out(1L) == "d1a alpha beta gamma delta common d1b")
    assert(out(2L) == "d2a d2b")
  }

  test("a duplicated run longer than k is fully covered by overlapping windows") {
    val run9 = (1 to 9).map(i => s"t$i").mkString(" ")
    val out = run(Seq(
      (1L, s"$run9 unique tail here"),
      (2L, s"prefix of doc $run9")), k = 4)
    assert(out(1L) == s"$run9 unique tail here")
    // all 9 tokens of the run vanish from doc 2 (6 overlapping windows)
    assert(out(2L) == "prefix of doc")
  }

  test("self-repetition within one doc: the second occurrence is excised") {
    val out = run(Seq(
      (1L, "one two three four MID one two three four")), k = 4)
    assert(out(1L) == "one two three four MID")
  }

  test("docs shorter than k pass through whitespace-normalized; duplicates kept") {
    val out = run(Seq((1L, "  tiny\tdoc  "), (2L, "tiny doc")), k = 4)
    assert(out == Map(1L -> "tiny doc", 2L -> "tiny doc"))
  }

  test("a doc that is entirely an earlier doc's text drops; null text drops") {
    val body = "w1 w2 w3 w4 w5 w6"
    val out = run(Seq((1L, body), (2L, body), (3L, null)), k = 4)
    assert(out == Map(1L -> body))
  }

  test("keep-first is global (id, position) order, not input order") {
    val shared = "s1 s2 s3 s4"
    // doc 5 appears before doc 2 in the input; doc 2 must still win
    val out = run(Seq(
      (5L, s"l5a l5b $shared"),
      (2L, s"e2a e2b $shared")), k = 4)
    assert(out(2L) == s"e2a e2b $shared")
    assert(out(5L) == "l5a l5b")
  }

  test("plan: key-width joins only — no cartesian, no nested loop") {
    val df = (0L until 100L).map(i => (i, s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e"))
      .toDF("id", "text")
    val plan = Dedup.dedupSpansKeepFirst(df, "id", "text", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"span excision must stay on hash joins:\n$plan")
  }

  test("plan: winner selection is a partial aggregate, not an all-rows window (skew guard)") {
    // the r9 hazard: row_number() over (partition by __wkey) ships EVERY
    // occurrence of a hot span to one reducer. The rewrite must show a
    // partial+final HashAggregate on __wkey and NO window operator anywhere
    val df = (0L until 50L).map(i => (i, s"a$i b$i c$i d$i e$i"))
      .toDF("id", "text")
    val plan = Dedup.dedupSpansKeepFirst(df, "id", "text", k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"no unguarded all-rows window may remain in span excision:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"winner selection must be an aggregate (map-side combinable):\n$plan")
  }

  test("hot span: a k-run planted in EVERY doc excises everywhere but the first") {
    // the adversarial shape the skew guard exists for — one span key whose
    // occurrence count equals the corpus size
    val hot = "hot1 hot2 hot3 hot4"
    val n = 500L
    val rows = (0L until n).map(i => (i, s"u${i}x u${i}y $hot u${i}z"))
    val out = Dedup.dedupSpansKeepFirst(rows.toDF("id", "text"), "id", "text", k = 4)
      .as[(Long, String)].collect().toMap
    assert(out(0L) == s"u0x u0y $hot u0z", "global-first doc keeps the hot span")
    (1L until n).foreach { i =>
      assert(out(i) == s"u${i}x u${i}y u${i}z", s"doc $i must lose the hot span")
    }
  }

  test("deterministic under repartitioning") {
    val rows = (0L until 60L).map { i =>
      val shared = s"sh${i % 6}a sh${i % 6}b sh${i % 6}c sh${i % 6}d"
      (i, s"doc $i body $shared tail t$i")
    }
    val a = run(rows, k = 4)
    val b = Dedup.dedupSpansKeepFirst(
        rows.toDF("id", "text").repartition(17), "id", "text", k = 4)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // exactly the first doc of each shared group keeps its span
    (0L until 6L).foreach { g =>
      assert(a(g).contains(s"sh${g}a"), s"group $g first doc lost its span")
      // 'body' and 'tail' sit adjacent to the shared run in every doc of
      // the group, so their boundary windows are duplicates too —
      // maximal extension excises them along with the run
      assert(a(g + 6L) == s"doc ${g + 6} t${g + 6}")
    }
  }
}
