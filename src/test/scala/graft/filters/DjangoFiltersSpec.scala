package graft.filters

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.core.Validate
import graft.ext.FilterRegistry

/** The `filters-django` pack ([[Slug]]/[[Slugify]]/[[Url]]): framework-
  * documented string rules, resolved through the same ServiceLoader SPI
  * as the iso pack — two independent namespaces in one JVM. */
class DjangoFiltersSpec extends SparkSuite {
  import spark.implicits._

  test("Slug validates, never transforms") {
    val df = Seq((1L, "valid-slug_123"), (2L, "No Spaces!"), (3L, "UPPER-ok"),
      (4L, ""), (5L, null.asInstanceOf[String])).toDF("id", "s")
    val res = Validate(df, "s" -> Slug()).flagged("ok")
      .select("id", "s", "ok").as[(Long, Option[String], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(res(1L) == ((Some("valid-slug_123"), true)))
    assert(res(2L)._2 == false)
    assert(res(3L) == ((Some("UPPER-ok"), true))) // django slug allows uppercase
    assert(res(4L)._2 == false)                   // empty is not a slug
    assert(res(5L) == ((None, true)))             // null passes through
  }

  test("Slugify matches the framework's documented examples") {
    val cases = Seq(
      "Hello, World!" -> "hello-world",
      "  spaces   and\ttabs " -> "spaces-and-tabs",
      "__trim_these__" -> "trim_these", // leading/trailing _ trimmed, inner kept
      "--a--b--" -> "a-b",
      "already-a-slug" -> "already-a-slug",
      "!!!" -> "")
    val df = cases.zipWithIndex.map { case ((in, _), i) => (i.toLong, in) }.toDF("id", "s")
    val got = Validate(df, "s" -> Slugify()).valid
      .select("id", "s").as[(Long, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"slugify('$in')")
    }
  }

  test("Slugify composes: its output always passes Slug (unless empty)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 60).as("s"))
    val slugged = Validate(docs, "s" -> Slugify()).valid
    val bad = Validate(slugged.filter(length(col("s")) > 0), "s" -> Slug())
      .invalid.count()
    assert(bad == 0, "a non-empty slugify output must validate as a slug")
  }

  test("Url accepts schemes with authority, rejects whitespace/junk, trims") {
    val df = Seq(
      (1L, "https://example.com/path?q=1"),
      (2L, " http://a.b "), // trimmed, then valid
      (3L, "ftp://files.example.org/x"),
      (4L, "not a url"),
      (5L, "https://"),     // empty authority
      (6L, "javascript:alert(1)")).toDF("id", "s")
    val res = Validate(df, "s" -> Url()).flagged("ok")
      .select("id", "s", "ok").as[(Long, Option[String], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(res(1L)._2 && res(2L)._2 && res(3L)._2)
    assert(res(2L)._1.contains("http://a.b"), "cleaned to trimmed form")
    assert(!res(4L)._2 && !res(5L)._2 && !res(6L)._2)
  }

  test("django pack resolves by name through the SPI, coexisting with iso") {
    assert(FilterRegistry.providers.keySet.contains("django"))
    assert(FilterRegistry.providers.keySet.contains("iso"))
    val names = FilterRegistry.names
    assert(Seq("django.slug", "django.slugify", "django.url", "iso.country")
      .forall(names.contains))
    val df = Seq((1L, "A Title!", "US")).toDF("id", "t", "cc")
    val out = Validate(df,
      "t" -> FilterRegistry("django.slugify"),
      "cc" -> FilterRegistry("iso.country")).valid
      .select("t", "cc").as[(String, String)].collect().head
    assert(out == (("a-title", "US")), "two packs in one validation pass")
  }
}
