package graft.examples

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** First-pass crawl curation ([[WebCrawlCuration]]): every stage's effect
  * visible in one composed run, plus partitioning determinism. */
class WebCrawlCurationSpec extends SparkSuite {
  import spark.implicits._

  // site A (a.com): 3 pages sharing a nav bar, one page re-crawled under
  // two URL spellings, one syndicated paragraph later copied by site B;
  // site C is blocklisted.
  private lazy val crawl = Seq(
    (1L, "http://A.com/p1", "NAV\nalpha story\nSYNDICATED"),
    (2L, "http://a.com/p1/?utm_source=x", "NAV\nalpha story\nSYNDICATED"), // same page, re-crawl
    (3L, "http://a.com/p2", "NAV\nbravo story"),
    (4L, "http://a.com/p3", "NAV\ncharlie story"),
    (5L, "http://b.net/x", "SYNDICATED\ndelta story"),
    (6L, "http://b.net/y", "delta story\necho story"),
    (7L, "http://bad.org/z", "zulu story"),
    (8L, "http://sub.bad.org/z2", "yankee story")
  ).toDF("doc_id", "url", "text")

  test("all five stages compose: blocklist, URL dedup, boilerplate, unit dedup, exact dedup") {
    val out = WebCrawlCuration.curate(crawl, Seq("bad.org"))
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    // blocklisted domain (incl. subdomain) gone entirely
    assert(!out.contains(7L) && !out.contains(8L))
    // URL dedup: doc 2 is the same canonical page as doc 1 → min id wins
    assert(!out.contains(2L))
    assert(out(1L)._1 == "http://a.com/p1")
    // boilerplate: NAV (3 of 3 a.com docs) stripped everywhere on a.com
    assert(out(1L)._2 == "alpha story\nSYNDICATED")
    assert(out(3L)._2 == "bravo story")
    assert(out(4L)._2 == "charlie story")
    // unit dedup: SYNDICATED survives only at its first occurrence (doc 1);
    // doc 5 loses it, keeps its own content; doc 6 loses the repeated
    // "delta story" but keeps "echo story"
    assert(out(5L)._2 == "delta story")
    assert(out(6L)._2 == "echo story")
  }

  test("opt-in stage 4b excises a syndicated SPAN that unit dedup cannot see") {
    import org.apache.spark.sql.functions.col
    // the syndicated sentence lives INSIDE each page's single content
    // line, so unit-level keep-first (whole lines) cannot touch it —
    // only the span stage can; context tokens are doc-unique
    val crawl2 = Seq(
      (1L, "http://a.com/p1", "d1a d1b quote w1 w2 w3 w4 d1c"),
      (2L, "http://a.com/p2", "d2a d2b quote w1 w2 w3 w4 d2c"),
      (3L, "http://a.com/p3", "d3a d3b plainly unique content d3c")
    ).toDF("doc_id", "url", "text")
    val off = WebCrawlCuration.curate(crawl2, Seq("blocked.example"),
        boilerplateMinDocs = 99L)
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    assert(off(2L).contains("quote w1 w2 w3 w4"), "span must survive with spanK=0")
    val on = WebCrawlCuration.curate(crawl2, Seq("blocked.example"),
        boilerplateMinDocs = 99L, spanK = 5)
      .select("doc_id", "text_clean").as[(Long, String)].collect().toMap
    assert(on(1L) == "d1a d1b quote w1 w2 w3 w4 d1c", "first occurrence keeps")
    assert(on(2L) == "d2a d2b d2c", "later occurrence excised")
    assert(on(3L) == "d3a d3b plainly unique content d3c")
  }

  test("exact-dedup stage collapses docs made identical by cleaning") {
    // two sites, no shared domain boilerplate threshold reached, but the
    // same single unit after unit-dedup... construct: identical cleaned
    // text via duplicate docs on DIFFERENT urls with unit-unique content
    val c = Seq(
      (1L, "http://a.com/1", "same text"),
      (2L, "http://b.com/1", "same text"), // unit dedup removes its only unit → doc drops
      (3L, "http://c.com/1", "other text")
    ).toDF("doc_id", "url", "text")
    val out = WebCrawlCuration.curate(c, Nil, boilerplateMinDocs = 99L)
      .select("doc_id").as[Long].collect().toSet
    // doc 2's unit was seen first in doc 1 → doc 2 empties and drops at
    // the unit stage (before exact dedup even sees it)
    assert(out == Set(1L, 3L))
  }

  test("opt-in robots stage drops site-disallowed captures before everything else") {
    import graft.ops.Robots
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p2\n"),
      ("b.net", "User-agent: *\nDisallow: /y$\n"))
      .toDF("domain", "content")
    val rules = Robots.rulesFor(robots, "domain", "content", "graftbot")
    val out = WebCrawlCuration.curate(crawl, Seq("bad.org"),
        robotsRules = Some(rules))
      .as[(Long, String, String, String)].collect().map(_._1).toSet
    // doc 3 (/p2) and doc 6 (/y) die at the robots stage; the blocklist
    // and dedup survivors are otherwise unchanged
    val base = WebCrawlCuration.curate(crawl, Seq("bad.org"))
      .as[(Long, String, String, String)].collect().map(_._1).toSet
    assert(out == base -- Set(3L, 6L), s"got $out from base $base")
  }

  test("deterministic under repartitioning") {
    val a = WebCrawlCuration.curate(crawl, Seq("bad.org"))
      .as[(Long, String, String, String)].collect().toSet
    val b = WebCrawlCuration.curate(crawl.repartition(7), Seq("bad.org"))
      .as[(Long, String, String, String)].collect().toSet
    assert(a == b)
  }
}
