package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.native

/** HTML-to-text extraction (SURVEY.md §2.6 extension) — the step UPSTREAM
  * of every shipped text operator on a real crawl: raw fetched markup →
  * plain text, before language-ID / quality / boilerplate / dedup ever
  * run. The whole pipeline is map-only `Column` work — chained
  * `regexp_replace` passes plus one native entity-decode kernel
  * ([[graft.expressions.Kernels.htmlEntityDecode]]) — so it stays inside
  * whole-stage codegen, pushes down around it, and costs zero shuffles at
  * any corpus size.
  *
  * This is a text EXTRACTOR, not an HTML parser: regex passes over tag
  * syntax, with the known limits of that class, each pinned as a spec
  * vector (HtmlSpec "known regex-class limits"): a literal `</script>`
  * inside a JS string ends the script subtree early; an unclosed
  * `<script>` leaves its body as text after the open tag strips; a `>`
  * inside a QUOTED attribute value ends the tag match early and leaks
  * the attribute tail as text; nested `<template>` elements drop only
  * to the first close tag (inner content past it survives). Real crawl
  * pipelines (C4, CCNet) accept exactly these semantics from their
  * extractors; documents needing DOM fidelity should use a parser at
  * ingest, not a Column expression.
  *
  * Stage order is load-bearing: comments/CDATA first (a commented-out
  * `<script>` must not open a subtree), subtree drops before tag strip
  * (else script BODIES leak into text), tags before entity decode (so
  * `&lt;script&gt;` can never BECOME a tag — the safe direction), decode
  * before whitespace collapse (nbsp → U+00A0 joins the collapse class).
  */
object Html {

  /** Tags whose entire element content is dropped — machine payload,
    * never prose. */
  private val DropSubtrees = "script|style|noscript|template"

  /** Tags that end a text block — each becomes a newline, so paragraph /
    * list / heading / row boundaries survive into unit-based downstream
    * ops ([[Boilerplate]], [[Dedup.dedupUnitsKeepFirst]], [[Chunking]]). */
  private val BlockTags =
    "p|div|br|li|ul|ol|dl|dt|dd|h[1-6]|tr|table|thead|tbody|blockquote|pre|" +
      "section|article|header|footer|nav|aside|form|fieldset|hr|figure|figcaption"

  /** Extract plain text from an HTML fragment or document:
    *
    *   1. comments dropped (`<!-- … -->`, dot-matches-newline);
    *   2. CDATA sections unwrapped to their raw content;
    *   3. `<script>/<style>/<noscript>/<template>` SUBTREES dropped
    *      (case-insensitive, attribute-tolerant, lazy to the matching
    *      close tag);
    *   4. block-level tags ([[BlockTags]], open or close or self-closed)
    *      → newline; every other tag (incl. `<!DOCTYPE …>`) → space;
    *   5. character references decoded — named subset, decimal, hex —
    *      in one left-to-right kernel pass (`&amp;lt;` → literal `&lt;`);
    *   6. whitespace collapsed: horizontal runs (incl. decoded nbsp) →
    *      one space, newline-bearing runs → one newline, ends trimmed.
    *
    * Null propagates. A page that is all markup yields the empty string —
    * feed the result through the usual `NotEmpty`/quality gates. */
  def htmlToText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noCdata = regexp_replace(noComments, "(?s)<!\\[CDATA\\[(.*?)\\]\\]>", "$1")
    val noSubtrees = regexp_replace(noCdata,
      s"(?is)<($DropSubtrees)\\b[^>]*>.*?</\\1\\s*>", " ")
    val blocks = regexp_replace(noSubtrees,
      s"(?i)</?($BlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)</?[A-Za-z!][^>]*>", " ")
    val decoded = native.htmlEntityDecode(noTags)
    val collapsed = regexp_replace(
      regexp_replace(decoded, "[ \\t\\x0B\\f\\r\\u00A0]+", " "),
      " ?\\n[ \\n]*", "\n")
    trim(collapsed, " \n")
  }

  /** `<a href="…">anchor</a>` pattern: group 1 = the double-quoted href
    * value, group 2 = the inner HTML. Same regex class (and limits) as
    * [[htmlToText]]; single-quoted/unquoted hrefs and `<a>` without an
    * href (anchors, JS handlers) deliberately don't match. */
  private val LinkPattern =
    "(?is)<a\\b[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a\\s*>"

  /** Hyperlink extraction — the crawl-frontier / link-graph feed: one row
    * per `<a href>` link, `(idCol, link_pos, href, anchor)` with
    * `link_pos` the 0-based in-document position, `href` the raw
    * attribute value (canonicalize downstream with [[Urls.canonicalize]])
    * and `anchor` the link text with inner tags stripped and whitespace
    * collapsed. Linkless documents emit nothing; null html drops.
    *
    * Map-only: two `regexp_extract_all` passes (href group, anchor
    * group — identical pattern, so the arrays align) zipped and
    * posexploded. Zero shuffles at any corpus size; feeds
    * [[Graphs.pageRank]] directly. */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.filter(h.isNotNull)
      .select(col(idCol),
        posexplode(arrays_zip(
          regexp_extract_all(h, lit(LinkPattern), lit(1)),
          regexp_extract_all(h, lit(LinkPattern), lit(2)))).as(Seq("link_pos", "__z")))
      .select(col(idCol), col("link_pos"),
        col("__z.0").as("href"),
        trim(regexp_replace(regexp_replace(col("__z.1"), "<[^>]*>", " "),
          "\\s+", " ")).as("anchor"))
  }

  /** Anchor-text profile per link target — the inbound-signal aggregation
    * a crawl ranks and labels pages by (anchor text is the classic
    * off-page description of what a target IS): over an [[extractLinks]]
    * edge list, emit one row per `href` with
    * `(n_links, n_docs, n_anchors, top_anchor, top_anchor_n)` — total
    * inbound links, distinct linking documents, distinct anchor strings,
    * and the most frequent anchor (ties by anchor asc).
    *
    * Scale: the heavy reduction is the FIRST `groupBy(href, anchor)` —
    * partial-aggregable, so a target with a billion identical-anchor
    * inlinks ships one row per partition. Everything after runs on the
    * (href, anchor)-distinct table, bounded by anchor VARIETY, not link
    * volume; the top-anchor `row_number ≤ 1` is WindowGroupLimit-pruned
    * map-side. The distinct-doc count is its own partial-agg pass
    * (count-distinct over (href, doc) — swap in `approx_count_distinct`
    * upstream if exactness isn't worth the second exchange). */
  def anchorProfile(links: DataFrame, hrefCol: String = "href",
                    docCol: String = "doc_id",
                    anchorCol: String = "anchor"): DataFrame = {
    val byAnchor = links.filter(col(hrefCol).isNotNull)
      .groupBy(col(hrefCol), col(anchorCol)).agg(count(lit(1)).as("__cnt"))
    val wH = Window.partitionBy(col(hrefCol))
    val top = byAnchor
      .withColumn("n_links", sum(col("__cnt")).over(wH))
      .withColumn("n_anchors", count(lit(1)).over(wH))
      .withColumn("__rk", row_number().over(
        wH.orderBy(col("__cnt").desc, col(anchorCol))))
      .filter(col("__rk") === 1)
    val docs = links.filter(col(hrefCol).isNotNull)
      .groupBy(col(hrefCol)).agg(countDistinct(col(docCol)).as("n_docs"))
    top.join(docs, Seq(hrefCol))
      .select(col(hrefCol), col("n_links"), col("n_docs"), col("n_anchors"),
        col(anchorCol).as("top_anchor"), col("__cnt").as("top_anchor_n"))
  }
}
