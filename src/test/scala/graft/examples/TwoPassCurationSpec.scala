package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The composed two-pass pipeline ([[TwoPassCuration]]): end-to-end
  * duplication invariance — re-crawling every page 10× (fresh, larger
  * doc_ids, same URLs and content) must curate to the IDENTICAL document
  * set — plus the per-stage effects visible across the seam. */
class TwoPassCurationSpec extends SparkSuite {
  import spark.implicits._

  // synthetic 3-domain crawl: per-domain nav boilerplate on every page,
  // exact-dup page pairs, near-dup page pairs (token Jaccard ≈ 0.94),
  // one blocked domain, and under-length junk the quality gate must drop
  private def crawl(copies: Int): DataFrame = {
    val base = (0 until 3).flatMap { d =>
      (0 until 40).map { i =>
        val id = (d * 40 + i).toLong
        val url = s"https://www.site$d.co.uk/p/$i"
        val nav = s"site$d home about contact navigation bar for every page of this domain"
        val body = s"the quick brown content block number ${i / 2} of domain $d " +
          "with plenty of common stopwords and some more words to pass the gates"
        // odd docs append ONE extra token → near-dup of their even twin
        // (J ≈ 30/31); even docs of a pair are EXACT dups after the nav
        // line strips
        val tail = if (i % 2 == 1) s"\nthe same closing line plus marker$d" else ""
        (id, url, s"$nav\n$body$tail")
      }
    } ++ (0 until 20).map { j =>
      val id = (200 + j).toLong
      (id, s"https://tracker.bad-site.com/x/$j",
        s"blocked domain content $j that would otherwise pass every gate with room to spare")
    } ++ (0 until 10).map { j =>
      val id = (300 + j).toLong
      (id, s"https://www.site0.co.uk/junk/$j", "x")
    }
    // re-crawl copies: SAME url + text, fresh larger ids — the survivor
    // set must not notice them (min-id wins every stage)
    val all = (0 until copies).flatMap { k =>
      base.map { case (id, u, t) => (id + 1000L * k, u, t) }
    }
    all.toDF("doc_id", "url", "text")
  }

  private def run(df: DataFrame): Map[Long, String] =
    TwoPassCuration.curate(df, Seq("bad-site.com"), nearDupThreshold = 0.9)
      .select("doc_id", "text").as[(Long, String)].collect().toMap

  test("10× re-crawl duplication curates to the IDENTICAL document set") {
    val once = run(crawl(1))
    val tenX = run(crawl(10))
    assert(once.nonEmpty, "pipeline curated everything away")
    assert(tenX == once,
      s"duplication changed the curated set: 1×=${once.keySet.toSeq.sorted} " +
        s"10×=${tenX.keySet.toSeq.sorted}")
  }

  test("each stage's effect is visible across the seam") {
    val out = TwoPassCuration.curate(crawl(1), Seq("bad-site.com"),
      nearDupThreshold = 0.9)
    val ids = out.select("doc_id").as[Long].collect().toSet
    // blocklist: no bad-site docs survive
    assert(ids.forall(id => id < 200 || id >= 300), s"blocked ids leaked: $ids")
    // quality/length gate: junk docs gone
    assert(ids.forall(_ < 300), "under-length junk survived")
    // boilerplate: the nav line is stripped from every surviving text
    val navLeaks = out.filter(col("text").contains("navigation bar")).count()
    assert(navLeaks == 0, s"$navLeaks docs still carry the domain nav line")
    // near-dup + exact dedup: each content-block pair keeps ONE doc —
    // far fewer survivors than the 120 content docs in
    assert(ids.size < 120 && ids.size >= 3, s"implausible survivor count ${ids.size}")
    // PSL domain survives to the output surface
    val domains = out.select("domain").distinct().as[String].collect().toSet
    assert(domains.subsetOf(Set("site0.co.uk", "site1.co.uk", "site2.co.uk")),
      s"unexpected domains: $domains")
  }

  test("deterministic under repartitioning") {
    val a = run(crawl(1))
    val b = run(crawl(1).repartition(17))
    assert(a == b)
  }
}
