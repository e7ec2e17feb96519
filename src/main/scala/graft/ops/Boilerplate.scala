package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document boilerplate removal (SURVEY.md §2.6 extension) — the
  * C4/RefinedWeb-style pass that strips lines occurring in many documents
  * (nav bars, cookie banners, license footers) BEFORE near-dup analysis:
  * corpus-frequent lines both pollute training data and glue unrelated
  * documents into spurious near-dup cliques.
  *
  * Unlike [[TextAnalysis.duplicateLineFraction]] (within-document, map-
  * only), frequency here is across the corpus, so the operator is
  * DataFrame-level and shuffles. Shape, in order:
  *
  *   1. split each document into units on `delim` (regex; "\n" for real
  *      corpora — any segmentation works, e.g. " " prunes by token
  *      document-frequency) — a map-only posexplode;
  *   2. document frequency per unit, counted on the unit's 128-bit md5 so
  *      the aggregate shuffles 16-byte keys, never text
  *      (`count(DISTINCT doc)` — within-doc repeats count once);
  *   3. the over-threshold hash set — small by construction for a
  *      boilerplate threshold — BROADCASTS back against the exploded
  *      units as a hash-key anti-join;
  *   4. surviving units reassemble in document order (one exchange keyed
  *      by doc id; `array_sort` on the collected (pos, unit) structs keeps
  *      the aggregation partial-able, where a window would sort the whole
  *      corpus).
  *
  * Two exchanges (unit-hash agg, doc reassembly) + one broadcast,
  * regardless of corpus size. Documents whose every unit is boilerplate
  * drop from the output (they carry no signal); count them via
  * `input.count - output.count`. Null-text documents drop likewise.
  */
object Boilerplate {

  /** Remove units (lines, by default) that occur in at least `minDocs`
    * distinct documents. Returns `(idCol, cleanCol)` — the id and the
    * reassembled text with boilerplate units deleted and surviving units
    * re-joined by `joinSep` in original order.
    *
    * `minDocs` is an absolute document count; callers wanting a fraction
    * multiply by their corpus size (kept explicit — a fraction computed
    * inside would hide a full count() pass in an innocuous-looking call).
    *
    * `broadcastFrequent` (default true) hints the over-threshold hash set
    * as a broadcast — right for boilerplate thresholds, where the set is
    * small by construction. A LOW threshold on a heavily-templated corpus
    * (or token-granularity `delim`) can make the set corpus-scale; pass
    * false there and the anti-join falls back to the planner's shuffled
    * choice instead of blowing the 8 GB broadcast limit.
    */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
                          minDocs: Long, delim: String = "\n",
                          joinSep: String = "\n",
                          cleanCol: String = "text_clean",
                          broadcastFrequent: Boolean = true): DataFrame =
    removeFrequent(df, idCol, Nil, textCol, minDocs, delim, joinSep,
      cleanCol, broadcastFrequent)

  /** Domain-scoped variant — the RefinedWeb-accurate form: boilerplate is
    * DOMAIN-specific (one site's nav bar, another's cookie banner), so a
    * unit strips from a document only when it is frequent WITHIN that
    * document's own `stratumCol` (source/domain) group. A line shared by
    * 3 docs of a 5-doc domain is that domain's boilerplate; the same line
    * appearing once each on 50 unrelated domains is content.
    *
    * Same shape as [[removeFrequentLines]] with the stratum joined into
    * every key: DF counted per (stratum, unit-md5), over-threshold set
    * broadcast anti-joined on both columns. `minDocs` applies per
    * stratum; null strata form their own group (their units compete only
    * with other null-stratum docs). */
  def removeFrequentLinesByStratum(df: DataFrame, idCol: String,
                                   stratumCol: String, textCol: String,
                                   minDocs: Long, delim: String = "\n",
                                   joinSep: String = "\n",
                                   cleanCol: String = "text_clean",
                                   broadcastFrequent: Boolean = true): DataFrame =
    removeFrequent(df, idCol, Seq(stratumCol), textCol, minDocs, delim,
      joinSep, cleanCol, broadcastFrequent)

  /** Fractional-threshold form: remove units occurring in at least
    * `fraction` of the (non-null-text) documents. Unlike a caller-side
    * `ceil(fraction * df.count())`, the corpus size here comes out of the
    * SAME aggregate that computes per-unit document frequencies — a
    * grouping-sets `()` cell counting distinct doc ids over the exploded
    * units (every non-null-text document emits at least one unit, so the
    * two counts agree by construction). No second count() action, no
    * extra corpus scan: the threshold costs one Expand duplication
    * through the one exchange the operator already pays. The global cell
    * joins back as a broadcast 1-row frame; the frequency subtree above
    * the shared exchange is deduplicated by ReuseExchange (and the
    * aggregate is exact either way — this is a cost concern, never a
    * determinism one). The effective threshold is floored at 2 documents:
    * on a corpus small enough that `ceil(fraction * total) == 1`, every
    * unit would be "frequent" and the output silently empty. */
  def removeFrequentLinesFraction(df: DataFrame, idCol: String,
                                  textCol: String, fraction: Double,
                                  delim: String = "\n",
                                  joinSep: String = "\n",
                                  cleanCol: String = "text_clean",
                                  broadcastFrequent: Boolean = true): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0,1], got $fraction")
    val units = explodeUnits(df, idCol, Nil, textCol, delim)
    val cells = units
      .groupingSets(Seq(Seq(col("__h")), Seq.empty[org.apache.spark.sql.Column]), col("__h"))
      .agg(count_distinct(col(idCol)).as("__df"))
    // the () cell is the only row with a null __h (md5 of a non-null
    // string is never null)
    val total = cells.filter(col("__h").isNull)
      .select(col("__df").as("__total"))
    // Floor the threshold at 2 docs: ceil(fraction * total) can reach 1
    // on tiny corpora (any fraction <= 1/total, or a 1-doc corpus), at
    // which point EVERY unit is "frequent" and the anti-join silently
    // empties the corpus. The absolute form guards the same edge with
    // require(minDocs >= 2); this mirrors it without a driver-side count.
    val frequent0 = cells.filter(col("__h").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("__df") >=
        greatest(ceil(lit(fraction) * col("__total")).cast("long"), lit(2L)))
      .select(col("__h"))
    reassemble(units, frequent0, Nil, idCol, joinSep, cleanCol, broadcastFrequent)
  }

  /** Map-only unit explosion shared by every form: one row per
    * (doc, position, unit) with the unit's 128-bit md5, so downstream
    * aggregates shuffle 16-byte keys, never text. */
  private def explodeUnits(df: DataFrame, idCol: String,
                           strataCols: Seq[String], textCol: String,
                           delim: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol) +: strataCols.map(col) :+
        posexplode(split(col(textCol), delim)).as(Seq("__pos", "__u")): _*)
      .withColumn("__h", md5(col("__u").cast("binary")))

  /** Anti-join the frequent set back (null-safe `<=>` on each stratum
    * key — a null-stratum doc's units must match the null-stratum
    * frequent set, which a plain join key would silently never do) and
    * reassemble survivors in document order (`array_sort` on collected
    * (pos, unit) structs keeps the aggregation partial-able, where a
    * window would sort the whole corpus). */
  private def reassemble(units: DataFrame, frequent0: DataFrame,
                         strataCols: Seq[String], idCol: String,
                         joinSep: String, cleanCol: String,
                         broadcastFrequent: Boolean): DataFrame = {
    val frequent = if (broadcastFrequent) broadcast(frequent0) else frequent0
    val joinCond = (strataCols.map(c => units(c) <=> frequent(c)) :+
      (units("__h") === frequent("__h"))).reduce(_ && _)
    units.join(frequent, joinCond, "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__u")))),
        x => x.getField("__u")), joinSep).as(cleanCol))
  }

  /** Shared pipeline behind the absolute-threshold forms: DF aggregate
    * keyed by (strata..., unit-md5), over-threshold set anti-joined back,
    * order-preserving reassembly. */
  private def removeFrequent(df: DataFrame, idCol: String,
                             strataCols: Seq[String], textCol: String,
                             minDocs: Long, delim: String, joinSep: String,
                             cleanCol: String,
                             broadcastFrequent: Boolean): DataFrame = {
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    val units = explodeUnits(df, idCol, strataCols, textCol, delim)
    val frequent0 = units.groupBy(strataCols.map(col) :+ col("__h"): _*)
      .agg(count_distinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(strataCols.map(col) :+ col("__h"): _*)
    reassemble(units, frequent0, strataCols, idCol, joinSep, cleanCol,
      broadcastFrequent)
  }

  /** Document frequency per distinct unit — the profiling companion:
    * returns `(unit, doc_freq)` sorted nowhere (caller orders). Exposes
    * what [[removeFrequentLines]] would strip at a given threshold. The
    * aggregate is keyed by the unit hash (16-byte shuffle keys); one
    * representative unit string rides along per hash via `min`. */
  def unitDocFrequency(df: DataFrame, idCol: String, textCol: String,
                       delim: String = "\n"): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), delim)).as("__u"))
      .withColumn("__h", md5(col("__u").cast("binary")))
      .groupBy("__h")
      .agg(min(col("__u")).as("unit"), count_distinct(col(idCol)).as("doc_freq"))
      .drop("__h")
      .select(col("unit"), col("doc_freq"))
  }
