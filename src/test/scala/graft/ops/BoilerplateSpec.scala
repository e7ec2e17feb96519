package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Cross-document boilerplate removal ([[Boilerplate]]): threshold
  * semantics, order preservation, full-boilerplate drop, and the
  * within-doc-repeat rule (document frequency counts a doc once). */
class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "cookie banner\nreal content one\nfooter"),
    (2L, "cookie banner\nreal content two\nfooter"),
    (3L, "cookie banner\nunique line\nmore unique"),
    (4L, "footer\nfooter\nonly footers here") // footer twice in ONE doc
  ).toDF("doc_id", "text")

  test("lines in >= minDocs distinct docs are stripped; order and uniques survive") {
    val out = Boilerplate.removeFrequentLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    // "cookie banner" df=3, "footer" df=3 (doc 4's repeat counts once) → both stripped
    assert(out(1L) == "real content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "unique line\nmore unique")
    assert(out(4L) == "only footers here")
  }

  test("a doc of pure boilerplate drops from the output") {
    val d = docs.union(Seq((5L, "cookie banner\nfooter")).toDF("doc_id", "text"))
    val out = Boilerplate.removeFrequentLines(d, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(!out.contains(5L))
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("threshold above every document frequency is an identity (null text drops)") {
    val d = docs.union(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val out = Boilerplate.removeFrequentLines(d, "doc_id", "text", minDocs = 99)
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == "cookie banner\nreal content one\nfooter")
  }

  test("custom delimiter: token-level document-frequency pruning") {
    val d = Seq((1L, "the quick fox"), (2L, "the lazy dog"), (3L, "the end"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(d, "doc_id", "text",
      minDocs = 3, delim = " ", joinSep = " ")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "quick fox", 2L -> "lazy dog", 3L -> "end"))
  }

  test("fraction form equals the absolute form at ceil(fraction * corpus) — no count() action") {
    // 4 docs at fraction 0.6 → threshold ceil(2.4) = 3, the same stripping
    // as minDocs = 3; the corpus size comes from the grouping-sets () cell
    // inside the frequency aggregate, not a separate count() pass
    val frac = Boilerplate.removeFrequentLinesFraction(docs, "doc_id", "text", 0.6)
      .as[(Long, String)].collect().toMap
    val abs = Boilerplate.removeFrequentLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(frac == abs)
    // null-text docs are excluded from the denominator exactly like the
    // caller-side docs.filter(isNotNull).count() they replace
    val d = docs.union(Seq((6L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val frac2 = Boilerplate.removeFrequentLinesFraction(d, "doc_id", "text", 0.6)
      .as[(Long, String)].collect().toMap
    assert(frac2 == abs)
    // fraction 1.0 strips only corpus-universal units
    val all = Boilerplate.removeFrequentLinesFraction(docs, "doc_id", "text", 1.0)
      .as[(Long, String)].collect().toMap
    assert(all(1L) == "cookie banner\nreal content one\nfooter",
      "nothing is in all 4 docs — identity expected")
  }

  test("fraction threshold floors at 2 docs — a tiny corpus is never silently emptied") {
    // 1 doc at 0.6 → ceil(0.6) = 1 would mark EVERY unit frequent and
    // anti-join the whole corpus away; the floor keeps it intact
    val one = Seq((1L, "only line\nanother line")).toDF("doc_id", "text")
    val outOne = Boilerplate.removeFrequentLinesFraction(one, "doc_id", "text", 0.6)
      .as[(Long, String)].collect().toMap
    assert(outOne == Map(1L -> "only line\nanother line"))
    // 2 docs at a fraction small enough that ceil(f * 2) = 1: the floor
    // raises the bar to 2, so only the genuinely shared line strips
    val two = Seq((1L, "shared\nalpha"), (2L, "shared\nbeta")).toDF("doc_id", "text")
    val outTwo = Boilerplate.removeFrequentLinesFraction(two, "doc_id", "text", 0.4)
      .as[(Long, String)].collect().toMap
    assert(outTwo == Map(1L -> "alpha", 2L -> "beta"))
  }

  test("unitDocFrequency reports per-unit document counts") {
    val freq = Boilerplate.unitDocFrequency(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(freq("cookie banner") == 3)
    assert(freq("footer") == 3) // doc 4's double footer counts once
    assert(freq("unique line") == 1)
  }

  test("domain-scoped: a unit strips only where IT is frequent; cross-domain spread is content") {
    val d = Seq(
      (1L, "siteA", "navA\nbody one"),
      (2L, "siteA", "navA\nbody two"),
      (3L, "siteA", "navA\nbody three"),
      (4L, "siteB", "navA\nunique b"), // navA appears ONCE on siteB → content there
      (5L, "siteB", "navB\nmore b"),
      (6L, "siteB", "navB\nother b"),
      (7L, null.asInstanceOf[String], "navN\nnull one"),
      (8L, null.asInstanceOf[String], "navN\nnull two")
    ).toDF("doc_id", "source", "text")
    val out = Boilerplate.removeFrequentLinesByStratum(d, "doc_id", "source", "text",
      minDocs = 2).as[(Long, String)].collect().toMap
    assert(out(1L) == "body one" && out(3L) == "body three") // navA stripped on siteA
    assert(out(4L) == "navA\nunique b") // navA SURVIVES on siteB
    assert(out(5L) == "more b")         // navB stripped on siteB (df=2)
    assert(out(7L) == "null one")       // null stratum forms its own group
  }

  test("boilerplate stripping stays stable under partitioning") {
    val many = (0L until 60L).map { i =>
      (i, if (i % 2 == 0) s"shared header\nbody $i" else s"body $i\nshared header")
    }.toDF("doc_id", "text")
    val a = Boilerplate.removeFrequentLines(many, "doc_id", "text", minDocs = 10)
      .as[(Long, String)].collect().toMap
    val b = Boilerplate.removeFrequentLines(many.repartition(7), "doc_id", "text", minDocs = 10)
      .as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a(0L) == "body 0" && a(1L) == "body 1")
  }
}
