package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus keyword retrieval — BM25 top-k (SURVEY.md §2.6 extension). The
  * training-data use cases are retrieval-shaped curation steps: pulling the
  * documents most relevant to a benchmark prompt (contamination triage
  * beyond exact n-gram hits), building targeted eval slices ("every doc
  * about X"), and seed-query corpus exploration. BM25 (Robertson et al.,
  * TREC-3 Okapi; the `k1`/`b` form every open-source engine ships) is the
  * standard lexical scorer, and its structure is pure OLAP — term
  * statistics are aggregations, scoring is a broadcast join, ranking is a
  * group-limited window — so the whole operator stays declarative and
  * Catalyst-optimized.
  *
  * Scale shape: ONE exploded pass over the corpus builds `(doc, term, tf,
  * dl)` — tf by a partial-aggregated `(doc, term)` exchange, doc length by
  * an id-partition window over the already-aggregated rows (bounded: a
  * doc's distinct-term count ≤ its token count — no skew hazard). The
  * query set is model-sized and BROADCASTS; the corpus side is pruned to
  * query-matching terms BEFORE document frequencies are counted, so the
  * expensive statistics are only paid for terms someone asked about.
  * Final ranking is `row_number ≤ k` over qid — Spark's WindowGroupLimit
  * rewrites it to a map-side top-k pre-prune per partition, so a query
  * matching half the corpus ships ≤ k·partitions rows, not its whole
  * posting list (plan-asserted in `RetrievalSpec`).
  */
object Retrieval {

  /** Lexical terms: lowercase alphanumeric runs. Splitting on the
    * complement (plus an empty-token filter for leading separators)
    * yields exactly the `[a-z0-9]+` extraction — the form a DuckDB/SQL
    * mirror expresses as `regexp_extract_all(lower(text), '[a-z0-9]+')`. */
  def terms(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Per-(document, term) statistics: `(idCol, term, tf, dl)` with `tf`
    * the in-document term frequency and `dl` the document's total token
    * count. One exploded aggregation + one bounded id-window; the reusable
    * index half of BM25 (build once, persist/write, score many query
    * sets against it). */
  def termStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    tf.withColumn("dl", sum(col("tf")).over(Window.partitionBy(col(idCol))))
  }

  /** BM25 top-`k` documents per query. `queries` is a model-sized frame
    * `(qidCol, qtextCol)` — it broadcasts; never pass a corpus here.
    * Scores use the Lucene-style always-positive idf
    * `ln(1 + (N − df + ½)/(df + ½))` and are rounded to 1e-6 BEFORE
    * ranking (the `q_quality` rounding form — plain double arithmetic,
    * no engine-specific halfway rule) so cross-engine ulp drift in the
    * per-term sum cannot reorder ranks; residual exact ties break by
    * document id. Query terms absent from the corpus contribute nothing
    * (no df row → no score row), matching every BM25 implementation.
    *
    * Output: `(qidCol, idCol, score, rk)` with `rk` 1-based, ≤ `k`. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // pinned, not persisted: the index feeds the corpus-scalar action AND
    // the lazy scoring plan, but a bare persist would squat in the session
    // cacheManager with no caller-visible handle to release it (r10
    // verdict). The pin's storage lives as long as the returned frame;
    // callers building a reusable index should [[writeIndex]] it and score
    // with [[bm25OverIndex]] under their own lifecycle.
    bm25OverIndex(Checkpoints.pin(termStats(docs, idCol, textCol)).df,
      idCol, queries, qidCol, qtextCol, k, k1, b)
  }

  /** Persist the [[termStats]] inverted index as a parquet table BUCKETED
    * BY TERM — the index-once / query-many deployment: every subsequent
    * [[bm25OverIndex]] run reads back posting lists already
    * hash-distributed on `term`, so the document-frequency roll-up needs
    * NO exchange (the bucketed scan satisfies the aggregate's
    * distribution requirement) and no per-query re-tokenization of the
    * corpus. Re-index on corpus change — or append a delta index and
    * union, since BM25 statistics are additive per (doc, term). */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 table: String, buckets: Int = 32): Unit =
    Layout.writeBucketed(termStats(docs, idCol, textCol), table, buckets,
      keys = Seq("term"))

  /** BM25 top-`k` over a prebuilt [[termStats]] index (a [[writeIndex]]
    * table read back, a pinned frame, a delta-unioned pair) — the scoring
    * half of [[bm25TopK]] with the index's lifecycle in the CALLER's
    * hands. Semantics and output schema are identical to [[bm25TopK]]. */
  def bm25OverIndex(stats: DataFrame, idCol: String,
                    queries: DataFrame, qidCol: String, qtextCol: String,
                    k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // corpus scalars: document count + mean length — bounded driver state,
    // same as every model-sized collect in this library
    val corpus = stats.groupBy(col(idCol)).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val nDocs = corpus.getLong(0)
    val avgdl = corpus.getDouble(1)
    val qterms = queries.select(col(qidCol),
      explode(array_distinct(terms(col(qtextCol)))).as("term"))
    // prune the corpus to query-matching terms FIRST; document frequency
    // is then counted over only those posting lists. (idCol, term) rows
    // are unique post-aggregation, so count(*) == containing-doc count.
    val matched = stats.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perTerm = matched
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("__idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__s", col("__idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    perTerm.groupBy(col(qidCol), col(idCol)).agg(sum(col("__s")).as("__raw"))
      .withColumn("score", floor(col("__raw") * 1e6 + lit(0.5)) / 1e6)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("score"), col("rk").cast("integer").as("rk"))
  }

  /** TF-IDF top-`k` terms per document — the keyword-profile step behind
    * topic tagging, per-domain vocabulary drift, and "what is this doc
    * about" eval slices. Standard smooth idf `ln((1+N)/(1+df)) + 1`
    * (never negative, defined for df=N), score `tf · idf` rounded to 1e-6
    * BEFORE ranking (the [[bm25TopK]] rounding form) so cross-engine ulp
    * drift cannot reorder ranks; residual ties break by term asc.
    *
    * Output: `(idCol, term, tf, tfidf, rk)` with `rk` 1-based, ≤ `k`.
    *
    * Scale: ONE exploded pass builds `(doc, term, tf)` (partial-agg
    * exchange); `N` rides along as a broadcast single-row aggregate (no
    * driver action — the plan stays lazy end to end); document frequency
    * is a vocabulary-sized roll-up of the already-unique `(doc, term)`
    * rows, rejoined on `term` — web-corpus vocabularies are NOT
    * model-sized, so that join is deliberately left to AQE/sort-merge
    * (the `q_collocations` rationale), never a forced broadcast. Final
    * ranking is `row_number ≤ k` per doc: WindowGroupLimit prunes to
    * k·partitions rows map-side, bounded by the doc's distinct-term
    * count. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = broadcast(
      tf.select(col(idCol)).distinct().agg(count(lit(1)).as("__n")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(nDocs)
      .withColumn("__raw", col("tf") *
        (log((lit(1.0) + col("__n")) / (lit(1.0) + col("__df"))) + lit(1.0)))
      .withColumn("tfidf", floor(col("__raw") * 1e6 + lit(0.5)) / 1e6)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"),
        col("rk").cast("integer").as("rk"))
  }

  /** c-TF-IDF cluster labels (the BERTopic class-based TF-IDF): the `k`
    * most DISTINCTIVE terms of each cluster, treating every cluster as
    * one concatenated document — how a near-dup/SemDeDup/topic cluster
    * gets a human-readable name. `score = (tf_c / total_c) ·
    * ln(1 + A / f_t)` with `tf_c` the term's count in the cluster,
    * `total_c` the cluster's token count, `A` the mean tokens per
    * cluster, and `f_t` the term's count across ALL clusters. Scores
    * floor-round on the 1e-6 grid BEFORE ranking, term-asc tiebreak
    * (the tfidf idiom).
    *
    * Scale shape: one exploded partial-agg exchange to the
    * (cluster, term) table, a term-total aggregate over THAT table, a
    * 2-scalar broadcast, and a per-cluster top-k window
    * (WindowGroupLimit pre-prunes map-side). Null cluster/text drops. */
  def clusterLabels(df: DataFrame, clusterCol: String, textCol: String,
                    k: Int = 5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = df.filter(col(clusterCol).isNotNull && col(textCol).isNotNull)
      .select(col(clusterCol), explode(terms(col(textCol))).as("term"))
      .groupBy(col(clusterCol), col("term")).agg(count(lit(1)).as("tf"))
    val ft = tf.groupBy(col("term")).agg(sum(col("tf")).as("__ft"))
    val scalars = broadcast(tf.agg(
      (sum(col("tf")).cast("double") /
        countDistinct(col(clusterCol))).as("__avg")))
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(col("score").desc, col("term"))
    tf.withColumn("__total", sum(col("tf")).over(
        Window.partitionBy(col(clusterCol))))
      .join(ft, Seq("term"))
      .crossJoin(scalars)
      .withColumn("score", floor(
        col("tf").cast("double") / col("__total") *
          log(lit(1.0) + col("__avg") / col("__ft")) * 1e6 + lit(0.5)) / 1e6)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(clusterCol), col("term"), col("tf"), col("score"),
        col("rk").cast("integer").as("rk"))
  }

  /** Exact phrase search: documents containing a query's tokens as a
    * CONTIGUOUS sequence (the positional-query half every lexical engine
    * pairs with BM25 — benchmark-prompt contamination triage and "this
    * exact quote" slicing want adjacency, not bag-of-words overlap).
    *
    * Two stages, both standard IR shapes:
    *  1. candidate prune — the `(doc, term)` posting pairs are joined to
    *     the phrase vocabulary (model-sized → BROADCAST) and a doc
    *     qualifies for a phrase only if it contains ALL its distinct
    *     terms (`count(distinct matched) == phrase vocabulary size`, a
    *     partial-aggregable roll-up). At corpus scale this is the whole
    *     point: adjacency is only verified on the usually-tiny
    *     conjunctive-match set, never the corpus.
    *  2. positional verify — candidates re-join their token arrays
    *     (id-keyed equi-join, AQE-sized: the candidate side is
    *     selectivity-bounded) and ONE codegen expression counts starting
    *     positions where all `L` tokens match (overlapping occurrences
    *     count — the published convention for positional postings
    *     intersection, which this expression evaluates doc-locally
    *     without materializing per-position rows).
    *
    * Tokenization is [[terms]], shared with BM25/TF-IDF, so "phrase"
    * means adjacency in the SAME term stream the other retrieval ops
    * score. Phrases with no alphanumeric tokens are dropped; docs with
    * null text never match. Output: `(pidCol, idCol, n_occ)`, matches
    * only (`n_occ ≥ 1`). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame, pidCol: String, phraseCol: String): DataFrame = {
    val ptoks = phrases.select(col(pidCol), terms(col(phraseCol)).as("__ptoks"))
      .filter(size(col("__ptoks")) > 0)
    val pterms = ptoks.select(col(pidCol),
        size(array_distinct(col("__ptoks"))).as("__need"),
        explode(array_distinct(col("__ptoks"))).as("term"))
    val postings = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(array_distinct(terms(col(textCol)))).as("term"))
    val cand = postings.join(broadcast(pterms), Seq("term"))
      .groupBy(col(pidCol), col(idCol), col("__need"))
      .agg(count(lit(1)).as("__have"))
      .filter(col("__have") === col("__need"))
      .select(col(pidCol), col(idCol))
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), terms(col(textCol)).as("__toks"))
    val L = size(col("__ptoks"))
    // sequence() generates DESCENDING when start > stop — an over-long
    // phrase must yield an empty start set, not [1, 0]; guard explicitly
    val starts = when(size(col("__toks")) >= L,
      sequence(lit(1), size(col("__toks")) - L + 1)).otherwise(array())
    cand.join(toks, Seq(idCol))
      .join(broadcast(ptoks), Seq(pidCol))
      .withColumn("n_occ", size(filter(starts, i =>
        size(filter(sequence(lit(1), L), j =>
          element_at(col("__toks"), (i + j - 1).cast("integer")) ===
            element_at(col("__ptoks"), j.cast("integer")))) === L)))
      .filter(col("n_occ") >= 1)
      .select(col(pidCol), col(idCol), col("n_occ"))
  }

  /** Coordination-level (boolean term-overlap) top-`k`: rank documents by
    * HOW MANY distinct query terms they contain — the classic cheap
    * recall-oriented ranker, and the standard lexical partner fed to
    * [[rrfFusion]] alongside a precision-oriented scorer like BM25.
    * Ties (coordination scores are small integers, so they are the norm)
    * break by document id. Documents matching zero terms are absent.
    *
    * Output: `(qidCol, idCol, n_overlap, rk)` — `rk` 1-based, ≤ `k`.
    *
    * Scale: one exploded distinct-term pass over the corpus joined to the
    * broadcast query-term list, a partial-aggregable count, and a
    * WindowGroupLimit-pruned per-query top-k — candidates per query are
    * bounded by the posting lists of its terms, never the corpus. */
  def coordinationTopK(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, qidCol: String, qtextCol: String,
                       k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qterms = queries.select(col(qidCol),
      explode(array_distinct(terms(col(qtextCol)))).as("term"))
    val postings = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(array_distinct(terms(col(textCol)))).as("term"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("n_overlap").desc, col(idCol))
    postings.join(broadcast(qterms), Seq("term"))
      .groupBy(col(qidCol), col(idCol)).agg(count(lit(1)).as("n_overlap"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("n_overlap"),
        col("rk").cast("integer").as("rk"))
  }

  /** Reciprocal-rank fusion over N rankings — the standard hybrid-retrieval
    * combiner (lexical BM25 + dense ANN, or any mix): each system
    * contributes `1/(kRrf + rank)` per (query, doc) it returned, summed
    * across systems; missing from a system contributes 0. RRF needs no
    * score calibration between systems — only ranks — which is exactly why
    * it is the default fusion in hybrid search stacks.
    *
    * Each input frame must carry `(qidCol, docCol, rankCol)` with 1-based
    * ranks. Fused scores are snapped to the 1e-12 grid before re-ranking
    * (the [[Graphs.pageRank]] quantum rationale: 1/(k+r) sums are tiny and
    * ulp drift must not reorder), residual ties break by doc id.
    *
    * Output: `(qidCol, docCol, rrf_score, rk)` — `rk` 1-based, ≤ `topN`.
    *
    * Scale: the inputs are already per-query top-k lists, so the unioned
    * candidate set is ≤ systems × k rows per query — the groupBy and the
    * per-query window both run on bounded groups regardless of corpus
    * size. */
  def rrfFusion(rankings: Seq[DataFrame], qidCol: String, docCol: String,
                rankCol: String = "rk", kRrf: Int = 60,
                topN: Int = 10): DataFrame = {
    require(rankings.size >= 2, s"need ≥ 2 rankings to fuse, got ${rankings.size}")
    require(kRrf > 0 && topN > 0, s"kRrf/topN must be positive")
    val tagged = rankings.map(_.select(col(qidCol), col(docCol),
      col(rankCol).cast("double").as("__rk")))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_score").desc, col(docCol))
    tagged.reduce(_ unionByName _)
      .groupBy(col(qidCol), col(docCol))
      .agg(sum(lit(1.0) / (lit(kRrf.toDouble) + col("__rk"))).as("__raw"))
      .withColumn("rrf_score", floor(col("__raw") / 1e-12 + lit(0.5)) * 1e-12)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topN)
      .select(col(qidCol), col(docCol), col("rrf_score"),
        col("rk").cast("integer").as("rk"))
  }
}
