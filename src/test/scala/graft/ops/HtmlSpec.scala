package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** HTML-to-text extraction ([[Html.htmlToText]]): subtree drops, tag
  * strip, entity decode (named/decimal/hex, incl. supplementary planes),
  * whitespace collapse — each pinned on hand-checked vectors, plus the
  * map-only plan shape. */
class HtmlSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String): String = {
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Html.htmlToText(col("h")).as("t")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("basic page: head kept as text, style dropped, blocks become newlines") {
    assert(extract("<html><head><title>T</title><style>p{color:red}</style>" +
      "</head><body><h1>Hello</h1><p>World &amp; friends</p></body></html>")
      == "T\nHello\nWorld & friends")
  }

  test("script/style/noscript subtrees drop entirely, case-insensitive, with attributes") {
    assert(extract("""a<SCRIPT type="text/javascript">var x = "<p>not text</p>";</script>b""")
      == "a b")
    assert(extract("a<style media='all'>.x{}</STYLE >b") == "a b")
    assert(extract("a<noscript><img src=x></noscript>b") == "a b")
    // unclosed script: open tag strips as a tag, body stays (documented)
    assert(extract("a<script>leftover") == "a leftover")
  }

  test("comments drop, including markup hidden inside them; nested tags strip") {
    assert(extract("<div>A<!-- hidden <b>x</b> -->B<span>C</span></div>") == "A B C")
    assert(extract("<!-- <script>alert(1)</script> -->ok") == "ok")
    assert(extract("<ul><li>one<li>two</ul>") == "one\ntwo")
  }

  test("CDATA unwraps to raw content; bare < stays when not a tag") {
    assert(extract("""<p>X<![CDATA[1 < 2 & "raw"]]>Y</p>""") == """X1 < 2 & "raw"Y""")
    assert(extract("a < b and c > d") == "a < b and c > d")
  }

  test("entity decode: named, decimal, hex, supplementary; unknown pass through; no double decode") {
    assert(extract("&#65;&#x42;c &copy; &ldquo;q&rdquo;") == "ABc © “q”")
    // supplementary plane via surrogate-pair-safe toChars
    assert(extract("smile &#x1F600; end") == "smile 😀 end")
    // unknown / malformed references stay verbatim
    assert(extract("&unknown; &#xZZ; 100% &#55296;") == "&unknown; &#xZZ; 100% &#55296;")
    // single pass: &amp;lt; is the LITERAL string "&lt;"
    assert(extract("x &amp;lt;tag&amp;gt; y") == "x &lt;tag&gt; y")
  }

  test("C1 numeric references take the HTML5 windows-1252 remap, not raw controls") {
    // Word-exported HTML: &#147;…&#148; are curly quotes (U+201C/U+201D),
    // &#150; an en dash — NOT invisible C1 bytes that would survive the
    // whitespace collapse and perturb fingerprint keys
    assert(extract("&#147;quoted&#148; a&#150;b &#133;") == "“quoted” a–b …")
    // hex spellings of the same block remap identically
    assert(extract("&#x93;q&#x94;") == "“q”")
    // the five code points cp1252 leaves undefined reject verbatim
    assert(extract("x &#129; &#x8d; y") == "x &#129; &#x8d; y")
  }

  test("uppercase hex digits and X marker decode like lowercase") {
    assert(extract("&#X42;&#x6F;&#X6B;") == "Bok")
    assert(extract("smile &#X1F600; end") == "smile 😀 end")
    assert(extract("&#x201C;q&#X201D;") == "“q”")
  }

  test("known regex-class limits, pinned: quoted '>' in attributes, nested template") {
    // a '>' inside a quoted attribute value ends the tag match early —
    // the attribute tail leaks as text (documented extractor limit; a
    // DOM parser belongs at ingest if this matters for a corpus)
    assert(extract("""<a title="a>b">link</a>""") == """b">link""")
    // nested <template>: the lazy subtree regex drops to the FIRST close
    // tag, the orphan close tag then strips as a plain tag — inner
    // content c survives where a browser would drop it
    assert(extract("<template>a<template>b</template>c</template>x") == "c x")
  }

  test("whitespace collapse: nbsp joins the space class, newline runs fold, ends trim") {
    assert(extract("  a&nbsp;&nbsp;b\t c  ") == "a b c")
    assert(extract("<p>a</p><p></p><p>b</p>") == "a\nb")
    assert(extract("<br><br>x<br/>y<br />") == "x\ny")
  }

  test("all-markup page yields empty string, null propagates") {
    assert(extract("<html><head><script>x()</script></head></html>") == "")
    val r = Seq(Tuple1(null: String)).toDF("h")
      .select(Html.htmlToText(col("h")).as("t")).head()
    assert(r.isNullAt(0))
  }

  test("plan is map-only: no exchange, stays in whole-stage codegen") {
    val df = spark.range(100).select(
      concat(lit("<p>doc "), col("id"), lit(" &amp; more</p>")).as("h"))
    val plan = df.select(Html.htmlToText(col("h")).as("t"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"extraction must be map-only:\n$plan")
    assert(plan.contains("*(1)"), s"fell out of codegen:\n$plan")
  }

  test("anchorProfile: totals, distinct docs, anchor variety, top anchor with asc tie") {
    val links = Seq(
      (1L, "u1", "home"), (2L, "u1", "home"), (2L, "u1", "start page"),
      (3L, "u1", "home"), (3L, "u1", "aaa"),
      // u2: two anchors at count 1 each — tie breaks to the asc-first
      (1L, "u2", "zed"), (4L, "u2", "alpha"),
      (5L, null, "dropped")
    ).toDF("doc_id", "href", "anchor")
    val out = Html.anchorProfile(links).orderBy("href")
      .as[(String, Long, Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      ("u1", 5L, 3L, 3L, "home", 3L),
      ("u2", 2L, 2L, 2L, "alpha", 1L)))
  }

  test("anchorProfile composes with extractLinks end to end") {
    val docs = Seq(
      (1L, """<a href="https://t/x">click here</a> <a href="https://t/x">click here</a>"""),
      (2L, """<a href="https://t/x">other</a> <a href="https://t/y">solo</a>"""))
      .toDF("doc_id", "html")
    val out = Html.anchorProfile(Html.extractLinks(docs, "doc_id", "html"))
      .orderBy("href")
      .as[(String, Long, Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      ("https://t/x", 3L, 2L, 2L, "click here", 2L),
      ("https://t/y", 1L, 1L, 1L, "solo", 1L)))
  }
}
