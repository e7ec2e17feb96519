package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** RFC 9309 robots evaluation ([[Robots]]): kernel match vectors, group
  * parsing (exact vs `*`, consecutive UA lines, comments, empty
  * Disallow), longest-match + allow-tie decision, no-rules default,
  * plan shape. */
class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def m(path: String, pattern: String): Boolean =
    graft.expressions.Kernels.robotsMatch(
      org.apache.spark.unsafe.types.UTF8String.fromString(path),
      org.apache.spark.unsafe.types.UTF8String.fromString(pattern))

  test("robotsMatch: RFC 9309 vectors — prefix, *, $, edge shapes") {
    // plain prefix
    assert(m("/private/x", "/private/"))
    assert(!m("/public/x", "/private/"))
    assert(m("/private/", "/private/"))
    // * spans any run (including empty)
    assert(m("/a/b/file.zip", "/*.zip"))
    assert(m("/x.zipper", "/*.zip")) // unanchored: prefix semantics
    assert(m("/a/b.zip/c", "/*.zip"))
    assert(m("/ab", "/a*b"))
    assert(m("/axxb/tail", "/a*b"))
    // $ anchors the end
    assert(m("/a/b/file.zip", "/*.zip$"))
    assert(!m("/x.zipper", "/*.zip$"))
    assert(!m("/a/b.zip/c", "/*.zip$"))
    assert(m("/exact", "/exact$"))
    assert(!m("/exact/", "/exact$"))
    // ** collapses; leading * unanchors the start
    assert(m("/a/b", "/a**b"))
    assert(m("/x/sec/y", "*/sec/"))
    // empty pattern matches everything; bare "$" only the empty path
    assert(m("/anything", ""))
    assert(m("", "$"))
    assert(!m("/a", "$"))
    // "*$" matches everything (any end)
    assert(m("/whatever", "*$"))
  }

  private val robots = Seq(
    ("alpha.test",
      "# site policy\nUser-agent: *\nDisallow: /private/\nAllow: /private/ok\nDisallow: /*.zip$\nDisallow:\n"),
    ("beta.test",
      "User-agent: GraftBot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp/\n"),
    ("delta.test",
      "Disallow: /orphan/\nUser-agent: a\nUser-agent: b\nDisallow: /ab/\n"))
    .toDF("domain", "content")

  test("rulesFor: group selection, comment strip, empty Disallow dropped, orphan rules dropped") {
    val star = Robots.rulesFor(robots, "domain", "content", "graftbot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    // alpha: the * group's three real rules (empty Disallow vanishes);
    // beta: exact group wins for graftbot → only "Disallow: /";
    // delta: orphan rule before any UA line dropped; a/b group doesn't match
    assert(star == Set(
      ("alpha.test", false, "/private/"),
      ("alpha.test", true, "/private/ok"),
      ("alpha.test", false, "/*.zip$"),
      ("beta.test", false, "/")))
    // agent "b" matches delta's consecutive-UA group (case-insensitive)
    val forB = Robots.rulesFor(robots, "domain", "content", "B")
      .filter(col("domain") === "delta.test")
      .collect().map(r => (r.getBoolean(1), r.getString(2))).toSet
    assert(forB == Set((false, "/ab/")))
  }

  test("annotateAllowed: longest match decides, Allow wins ties, rule-less domains allowed") {
    val rules = Robots.rulesFor(robots, "domain", "content", "graftbot")
    val urls = Seq(
      (1L, "https://alpha.test/public/a"),      // no match → allowed
      (2L, "https://alpha.test/private/x"),     // /private/ → denied
      (3L, "https://alpha.test/private/ok/y"),  // allow len 11 > deny len 9
      (4L, "https://alpha.test/data/f.zip"),    // /*.zip$ → denied
      (5L, "https://beta.test/anything"),       // exact group: / → denied
      (6L, "https://gamma.test/whatever"),      // no robots at all → allowed
      (7L, "https://alpha.test"))               // pathless → "/" → allowed
      .toDF("id", "url")
    val out = Robots.annotateAllowed(urls, "url", "id", rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("robots_allowed"))).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> true))
    val kept = Robots.filterAllowed(urls, "url", "id", rules)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 6L, 7L))
  }

  test("allow-tie at equal pattern length goes to Allow") {
    val r = Seq(("t.test", "User-agent: *\nDisallow: /x/\nAllow: /x/\n"))
      .toDF("domain", "content")
    val rules = Robots.rulesFor(r, "domain", "content", "any")
    val out = Robots.annotateAllowed(
        Seq((1L, "https://t.test/x/page")).toDF("id", "url"), "url", "id", rules)
      .head.getBoolean(2)
    assert(out, "equal-length Allow/Disallow must resolve to allow per RFC 9309")
  }

  test("unparseable URLs surface a NULL verdict; filterAllowed decides via keepUnparseable") {
    val rules = Robots.rulesFor(robots, "domain", "content", "graftbot")
    val urls = Seq(
      (1L, "https://alpha.test/public/a"), // parseable, allowed
      (2L, "not a url at all"),            // no host → policy unknowable
      (3L, "/relative/only"),              // scheme-less → no host
      (4L, null.asInstanceOf[String]))     // null url
      .toDF("id", "url")
    val out = Robots.annotateAllowed(urls, "url", "id", rules)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("robots_allowed"))) null
         else Boolean.box(r.getBoolean(r.fieldIndex("robots_allowed"))))).toMap
    assert(out(1L) == Boolean.box(true))
    assert(out(2L) == null && out(3L) == null && out(4L) == null,
      s"hostless rows must carry a NULL (unknowable) verdict, got $out")
    // historical fail-open default keeps them; the conservative posture drops
    assert(Robots.filterAllowed(urls, "url", "id", rules)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    assert(Robots.filterAllowed(urls, "url", "id", rules, keepUnparseable = false)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("duplicate ids with different URLs keep independent verdicts") {
    val rules = Robots.rulesFor(robots, "domain", "content", "graftbot")
    val urls = Seq(
      (1L, "https://alpha.test/public/a"),  // allowed
      (1L, "https://alpha.test/private/x")) // denied — same id!
      .toDF("id", "url")
    val out = Robots.annotateAllowed(urls, "url", "id", rules)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getBoolean(r.fieldIndex("robots_allowed"))).toMap
    assert(out((1L, "https://alpha.test/public/a")) === true)
    assert(out((1L, "https://alpha.test/private/x")) === false,
      "verdicts for distinct URLs sharing an id must not merge (r10 ADVICE)")
  }

  test("plan: domain-keyed join only, no cartesian; 1:1 row preservation") {
    val rules = Robots.rulesFor(robots, "domain", "content", "graftbot")
    val urls = (0L until 500L).map(i => (i, s"https://alpha.test/p$i")).toDF("id", "url")
    val annotated = Robots.annotateAllowed(urls, "url", "id", rules)
    val plan = annotated.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"), plan.take(2000))
    assert(annotated.count() == 500L, "annotation must be row-preserving")
  }
}
