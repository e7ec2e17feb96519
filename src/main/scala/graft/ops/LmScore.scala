package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram language-model scoring (SURVEY.md §2.6 extension) — the
  * CCNet-style "perplexity filter": score each document by its mean token
  * log-probability under a reference vocabulary and keep the
  * well-modelled band (too low = gibberish/noise, suspiciously high =
  * boilerplate). A real deployment swaps the unigram table for a KenLM
  * model behind the same two-step shape; the Spark-side structure —
  * broadcast model, map-side lookup, one id-keyed aggregation — is
  * identical, which is the part that matters at 100 TB.
  *
  * Scale shape: the vocabulary is top-K by construction (model-sized, not
  * corpus-sized) and BROADCASTS; documents explode to one row per token
  * map-side, the hash-join lookup adds no exchange, and the per-document
  * mean is a single partial-aggregated exchange keyed by id. The corpus
  * text crosses the wire only as its own id-keyed aggregation rows.
  */
object LmScore {

  /** Build a top-`k` unigram vocabulary from a corpus: `(token, logp)`
    * with `logp = ln(count / total)`, total over ALL tokens (so OOV mass
    * is implicit). Ties at the count boundary break lexicographically —
    * the vocabulary is deterministic. Tokens are whitespace-split and
    * lowercased (matching [[TextAnalysis.tokens]] ∘ lower). */
  def unigramVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n")).as("t")
    counts.crossJoin(broadcast(total.select(col("sum(n)").as("__total"))))
      .withColumn("logp", log(col("n").cast("double") / col("__total").cast("double")))
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      .select(col("token"), col("logp"))
  }

  /** DSIR-style importance weights for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS'23 — public method): per document, the LOG importance ratio
    * `mean logp_target − mean logp_base` between a target-domain unigram
    * model and a base-corpus model. Selecting the top-weighted documents
    * (e.g. [[Sampling.weightedSample]] ranks monotonically, so the log
    * weight works directly as a priority) shifts the corpus toward the
    * target distribution without training a classifier.
    *
    * Output: `(idCol, n_tok, log_ratio)` — kept in the log domain on
    * purpose: `exp` would add nothing to the ordering and another
    * transcendental to the cross-engine story. Both models broadcast;
    * the plan is two map-side lookups over one exploded pass + one
    * id-keyed aggregation. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        targetVocab: DataFrame, baseVocab: DataFrame,
                        oovLogp: Double): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    toks
      .join(broadcast(targetVocab.select(col("token"), col("logp").as("__lt"))),
        Seq("token"), "left")
      .join(broadcast(baseVocab.select(col("token"), col("logp").as("__lb"))),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        (floor((avg(coalesce(col("__lt"), lit(oovLogp)))
          - avg(coalesce(col("__lb"), lit(oovLogp)))) * 1e6 + 0.5) / 1e6).as("log_ratio"))
  }

  /** Mean token log-probability per document under `vocab` (`(token,
    * logp)`), out-of-vocabulary tokens scored at `oovLogp`. Output:
    * `(idCol, n_tok, ll)` with `ll` rounded to 6 dp (the floor-round
    * convention of [[TextAnalysis.qualityScore]] — `ln` is the one
    * non-IEEE-exact op, and its ≤1-ulp wobble is ~1e-10 under the 1e-6
    * quantum). Documents with no tokens drop. */
  def unigramLogLikelihood(df: DataFrame, idCol: String, textCol: String,
                           vocab: DataFrame, oovLogp: Double): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        (floor(avg(coalesce(col("logp"), lit(oovLogp))) * 1e6 + 0.5) / 1e6).as("ll"))
  }

  /** CCNet-style per-stratum perplexity bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" — public method): score each document by mean token log-prob
    * under `vocab` (the [[unigramLogLikelihood]] scoring, stratum carried
    * through), compute per-stratum tercile boundaries, and label each
    * document `head` (best-modelled third), `middle`, or `tail`. CCNet
    * computes the boundaries per LANGUAGE over the corpus itself and
    * keeps only head+middle for training — compose the label with a
    * filter or [[Sampling.stratifiedSample]] for that policy.
    *
    * Both `ll` and the boundaries floor-round to 1e-6 BEFORE comparison
    * (the library's cross-engine convention): an ulp of percentile-
    * interpolation drift can then never flip a boundary document's
    * bucket. Null-stratum documents form their own group (null-safe
    * join), matching every stratified operator here.
    *
    * Scale shape: scoring is the broadcast-lookup + one id-keyed exchange
    * of [[unigramLogLikelihood]]; boundaries are a #strata × 2 aggregate
    * that BROADCASTS back — no second corpus exchange. The boundary
    * aggregate uses EXACT interpolated `percentile` (mirrorable by
    * DuckDB's `quantile_cont`, same as `q_quantiles`), which keeps a
    * per-group value-count map: document `ll` values are high-cardinality,
    * so at true corpus scale pass `approxAccuracy > 0` to switch the
    * boundary pass to `percentile_approx` (bounded state, documented
    * rank-error trade — the labels move only for documents within the
    * approximation band of a boundary).
    *
    * Output: `(idCol, stratumCol, n_tok, ll, bucket)`. */
  def perplexityTerciles(df: DataFrame, idCol: String, textCol: String,
                         stratumCol: String, vocab: DataFrame,
                         oovLogp: Double,
                         approxAccuracy: Int = 0): DataFrame = {
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(stratumCol),
        explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val scored = toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol), col(stratumCol))
      .agg(count(lit(1)).as("n_tok"),
        (floor(avg(coalesce(col("logp"), lit(oovLogp))) * 1e6 + 0.5) / 1e6).as("ll"))
    def pct(p: Double) =
      if (approxAccuracy > 0) percentile_approx(col("ll"), lit(p), lit(approxAccuracy))
      else percentile(col("ll"), lit(p))
    val bounds = scored.groupBy(col(stratumCol).as("__s"))
      .agg((floor(pct(1.0 / 3) * 1e6 + 0.5) / 1e6).as("__p33"),
        (floor(pct(2.0 / 3) * 1e6 + 0.5) / 1e6).as("__p67"))
    scored.join(broadcast(bounds), col(stratumCol) <=> col("__s"))
      .withColumn("bucket",
        when(col("ll") >= col("__p67"), lit("head"))
          .when(col("ll") >= col("__p33"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__s", "__p33", "__p67")
  }

  /** Whitespace tokens, lowercased, empties dropped — as an ARRAY (the
    * same token stream [[unigramVocab]] sees exploded). */
  private def tokArray(textCol: String) =
    filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0)

  /** Top-`k` bigram table `(w1, w2, logp)` with CONDITIONAL
    * log-probabilities `ln(c(w1,w2) / c(w1,·))` — the context total is the
    * sum of bigram counts sharing the first word (standard conditional
    * MLE). Ties at the count boundary break lexicographically on
    * `(w1, w2)` — deterministic like [[unigramVocab]]. The context-total
    * window partitions by `w1`, bounded by that word's distinct-successor
    * count (≤ vocabulary size — not corpus-sized; no skew hazard). */
  def bigramVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = tokArray(textCol)
    val bi = df.filter(col(textCol).isNotNull)
      .select(a.as("__a"))
      .filter(size(col("__a")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__a")) - 1),
        i => struct(element_at(col("__a"), i).as("w1"),
          element_at(col("__a"), i + 1).as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    bi.withColumn("__ctx", sum(col("n")).over(Window.partitionBy(col("w1"))))
      .withColumn("logp", log(col("n").cast("double") / col("__ctx").cast("double")))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("logp"))
  }

  /** Top-`k` collocations by pointwise mutual information —
    * `pmi(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )` with the bigram
    * probability over total bigram count and unigram probabilities over
    * total token count (the standard Church & Hanks formulation).
    * `minCount` floors the bigram count (PMI famously explodes on
    * hapax pairs). Returned ordered by `(pmi6 desc, w1, w2)` with `pmi6`
    * floor-rounded to 6 dp — the rounding happens BEFORE the ranking so
    * a SQL mirror orders identically despite `ln` ulp wobble.
    *
    * Scale shape: two partial-aggregated count passes over one exploded
    * pair stream (bigrams + unigrams-as-second-position), two scalar
    * totals, broadcast unigram join onto the (already-aggregated,
    * bigram-vocabulary-sized) pair counts, global top-k via
    * orderBy+limit = `TakeOrderedAndProject` (k rows per partition to
    * the driver merge, no global sort). */
  def collocations(df: DataFrame, textCol: String, k: Int,
                   minCount: Long = 5L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val a = tokArray(textCol)
    val pairs = df.filter(col(textCol).isNotNull)
      .select(a.as("__a"))
      .filter(size(col("__a")) >= 1)
      .select(explode(transform(sequence(lit(1), size(col("__a"))),
        i => struct(
          when(i === 1, lit(null).cast("string"))
            .otherwise(element_at(col("__a"), i - 1)).as("w1"),
          element_at(col("__a"), i).as("w2")))).as("__t"))
      .select(col("__t.w1").as("w1"), col("__t.w2").as("w2"))
    val uni = pairs.groupBy(col("w2").as("token")).agg(count(lit(1)).as("cu"))
    val uniTotal = uni.agg(sum(col("cu"))).head.getLong(0).toDouble
    val bi = pairs.filter(col("w1").isNotNull)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    val biTotal = pairs.filter(col("w1").isNotNull).count().toDouble
    // vocab-sized join sides — NOT broadcast-hinted: a web-corpus
    // vocabulary is not model-sized, so AQE picks broadcast only when
    // the counts actually fit
    bi
      .join(uni.select(col("token").as("w1"), col("cu").as("__c1")), Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("cu").as("__c2")), Seq("w2"))
      .withColumn("pmi", floor(
        log((col("n") / lit(biTotal)) /
          ((col("__c1") / lit(uniTotal)) * (col("__c2") / lit(uniTotal)))) * 1e6
          + lit(0.5)) / 1e6)
      .select(col("w1"), col("w2"), col("n"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Top-`k` interpolated Kneser–Ney bigram model (Kneser & Ney 1995;
    * the Chen & Goodman 1998 interpolated form with one fixed discount) —
    * the standard smoothing when a CALIBRATED probability is wanted
    * (perplexity comparisons, mixture weighting), where [[bigramLogLikelihood]]'s
    * stupid backoff only ranks:
    * {{{
    *   P_kn(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *               + D · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)
    * }}}
    * with `N1+(w1·)` = distinct successors of `w1`, `N1+(·w2)` = distinct
    * predecessors of `w2` (the continuation count — "how many contexts
    * does w2 complete", the insight that makes KN beat Good-Turing on
    * burst-prone corpora), `N1+(··)` = distinct bigram types.
    *
    * Every quantity is an aggregate of the bigram-count table: context
    * totals and successor counts are windows over `w1`, predecessor
    * counts a window over `w2` — all bounded by a word's distinct
    * neighbor count (vocabulary-, never corpus-sized); the type total
    * rides along as a broadcast single-row aggregate (lazy, no driver
    * action). `p_kn` is floor-rounded to 1e-6 AFTER the fixed-shape
    * double expression, so a SQL mirror reproduces it bitwise.
    *
    * Output: `(w1, w2, n, p_kn)`, top-`k` by `(n desc, w1, w2)`. Rows
    * sum to ≤ 1 per context by construction (exactly 1 with k = ∞). */
  def knBigramModel(df: DataFrame, textCol: String, k: Int,
                    discount: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val a = tokArray(textCol)
    val bi = df.filter(col(textCol).isNotNull)
      .select(a.as("__a"))
      .filter(size(col("__a")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__a")) - 1),
        i => struct(element_at(col("__a"), i).as("w1"),
          element_at(col("__a"), i + 1).as("w2")))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val types = broadcast(bi.agg(count(lit(1)).as("__tt")))
    val withStats = bi
      .withColumn("__ctx", sum(col("n")).over(Window.partitionBy(col("w1"))))
      .withColumn("__nsucc", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("__npred", count(lit(1)).over(Window.partitionBy(col("w2"))))
      .crossJoin(types)
    val d = lit(discount)
    val p = greatest(col("n").cast("double") - d, lit(0.0)) / col("__ctx") +
      d * col("__nsucc").cast("double") / col("__ctx") *
        (col("__npred").cast("double") / col("__tt"))
    withStats
      .withColumn("p_kn", floor(p * 1e6 + lit(0.5)) / 1e6)
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("n"), col("p_kn"))
  }

  /** Per-document mean token log-probability under a bigram model with
    * STUPID BACKOFF (Brants et al., "Large Language Models in Machine
    * Translation", EMNLP'07 — the smoothing designed FOR distributed
    * corpus-scale LMs): token i ≥ 2 scores the bigram conditional if
    * `(w_{i−1}, w_i)` is in the table, otherwise `ln(backoff)` + its
    * unigram log-prob (OOV → `oovLogp`); the first token scores by
    * unigram alone. No probability-space interpolation means no `exp` —
    * every score is a table lookup plus additions, which keeps the whole
    * operator exactly SQL-mirrorable (the `q_bigram_ll` oracle) where
    * Jelinek-Mercer mixing would not be.
    *
    * Scale shape: token/bigram pairs are built MAP-SIDE from the token
    * array (no self-join of the exploded stream to reach the previous
    * token); both models broadcast; one id-keyed partial aggregation.
    * Output `(idCol, n_tok, ll)`, `ll` floor-rounded to 6 dp (the
    * [[unigramLogLikelihood]] convention). */
  def bigramLogLikelihood(df: DataFrame, idCol: String, textCol: String,
                          bigrams: DataFrame, unigrams: DataFrame,
                          backoff: Double = 0.4, oovLogp: Double = -20.0): DataFrame = {
    require(backoff > 0 && backoff <= 1, s"backoff must be in (0,1], got $backoff")
    val a = tokArray(textCol)
    val pairs = df.filter(col(textCol).isNotNull)
      .select(col(idCol), a.as("__a"))
      .filter(size(col("__a")) >= 1)
      .select(col(idCol), explode(transform(sequence(lit(1), size(col("__a"))),
        i => struct(
          when(i === 1, lit(null).cast("string"))
            .otherwise(element_at(col("__a"), i - 1)).as("w1"),
          element_at(col("__a"), i).as("w2")))).as("__t"))
      .select(col(idCol), col("__t.w1").as("w1"), col("__t.w2").as("w2"))
    val uniPath = coalesce(col("__lu"), lit(oovLogp))
    pairs
      .join(broadcast(bigrams.select(col("w1"), col("w2"), col("logp").as("__lb"))),
        Seq("w1", "w2"), "left")
      .join(broadcast(unigrams.select(col("token").as("w2"), col("logp").as("__lu"))),
        Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        (floor(avg(coalesce(col("__lb"),
          when(col("w1").isNull, uniPath)
            .otherwise(lit(math.log(backoff)) + uniPath))) * 1e6 + 0.5) / 1e6).as("ll"))
  }

  /** Distribution drift between two corpus slices: KL(P‖Q), KL(Q‖P) and
    * the Jensen–Shannon divergence between their unigram distributions
    * over a shared top-`k` vocabulary (by combined count, ties on token)
    * with add-one smoothing — the monitoring signal for "did this week's
    * crawl shift", "does the deduped corpus still match the raw mix",
    * "how far is slice X from slice Y" (JS is symmetric, bounded by
    * ln 2, and zero-safe; the two KLs attribute the direction).
    *
    * Every probability is a ratio of integer counts (smoothed within the
    * vocab, so both distributions normalize over it exactly); each
    * per-token term is floor-rounded to 1e-9 and summed as DECIMAL —
    * the sum is EXACT and addition-order-free, so the result is
    * bit-stable across partitionings and mirrors in SQL. Output: one row
    * `(n_vocab, kl_pq, kl_qp, js)`, 1e-6 floor-rounded.
    *
    * Execution shape: two partial-aggregable token-count passes, top-k
    * via TakeOrderedAndProject, scalar totals broadcast, then #vocab-row
    * arithmetic — the corpus is read once per slice, everything after is
    * model-state-sized. */
  def corpusDivergence(a: DataFrame, b: DataFrame, textCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(textCol).isNotNull)
        .select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as(out))
    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val vocab = ca.join(cb, Seq("token"), "full")
      .select(col("token"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .orderBy((col("n_a") + col("n_b")).desc, col("token"))
      .limit(k)
    val totals = vocab.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    // smoothed in-vocab distributions: p = (n+1)/(total+|V|). |V| is the
    // REALIZED vocab size (≤ k on small corpora) so both sides normalize.
    val withT = vocab.crossJoin(broadcast(totals))
      .crossJoin(broadcast(vocab.agg(count(lit(1)).as("__v"))))
    def term(num: Column, den: Column): Column =
      (floor(num * log(num / den) * 1e9 + 0.5) / 1e9).cast("decimal(28,9)")
    val scored = withT.select(
      col("__v"),
      term((col("n_a") + 1) / (col("__ta") + col("__v")),
        (col("n_b") + 1) / (col("__tb") + col("__v"))).as("__t_pq"),
      term((col("n_b") + 1) / (col("__tb") + col("__v")),
        (col("n_a") + 1) / (col("__ta") + col("__v"))).as("__t_qp"),
      term((col("n_a") + 1) / (col("__ta") + col("__v")),
        ((col("n_a") + 1) / (col("__ta") + col("__v")) +
          (col("n_b") + 1) / (col("__tb") + col("__v"))) / 2).as("__t_pm"),
      term((col("n_b") + 1) / (col("__tb") + col("__v")),
        ((col("n_a") + 1) / (col("__ta") + col("__v")) +
          (col("n_b") + 1) / (col("__tb") + col("__v"))) / 2).as("__t_qm"))
    def r6(c: Column): Column = floor(c.cast("double") * 1e6 + 0.5) / 1e6
    scored.groupBy(col("__v").as("n_vocab"))
      .agg(sum(col("__t_pq")).as("__kl_pq"), sum(col("__t_qp")).as("__kl_qp"),
        sum(col("__t_pm")).as("__kl_pm"), sum(col("__t_qm")).as("__kl_qm"))
      .select(col("n_vocab").cast("long").as("n_vocab"),
        r6(col("__kl_pq")).as("kl_pq"), r6(col("__kl_qp")).as("kl_qp"),
        r6((col("__kl_pm") + col("__kl_qm")) / 2).as("js"))
  }

  /** Token-level corpus comparison by log-odds ratio with a Dirichlet
    * prior (Monroe/Colaresi/Quinn "Fightin' Words", 2008) — WHERE two
    * corpora differ, the complement to [[corpusDivergence]]'s
    * how-much. For token w with counts `y_a`, `y_b`, totals `n_a`,
    * `n_b`, prior `α` per token (`α₀ = α·|V|`):
    * `δ = ln((y_a+α)/(n_a+α₀−y_a−α)) − ln((y_b+α)/(n_b+α₀−y_b−α))`,
    * `z = δ / sqrt(1/(y_a+α) + 1/(y_b+α))`. Emits the `k` most
    * A-distinctive and `k` most B-distinctive tokens among those with
    * combined count ≥ `minCount`, z floor-rounded on the 1e-6 grid
    * BEFORE ranking with a token tiebreak (the bm25 idiom), labeled
    * `side` ('a' / 'b').
    *
    * Execution shape: two partial-aggregable token-count passes, one
    * vocab-sized full join, scalar totals broadcast, map-only z
    * arithmetic, two TakeOrdered top-ks — the corpora are read once
    * each; nothing after the counts is corpus-sized. */
  def logOddsDiff(a: DataFrame, b: DataFrame, textCol: String,
                  k: Int = 20, alpha: Double = 0.01,
                  minCount: Long = 5L): DataFrame = {
    require(k > 0 && alpha > 0 && minCount >= 0)
    def counts(df: DataFrame, out: String): DataFrame =
      df.filter(col(textCol).isNotNull)
        .select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as(out))
    val vocab = counts(a, "y_a").join(counts(b, "y_b"), Seq("token"), "full")
      .select(col("token"), coalesce(col("y_a"), lit(0L)).as("y_a"),
        coalesce(col("y_b"), lit(0L)).as("y_b"))
      .filter(col("y_a") + col("y_b") >= minCount)
    val withT = vocab
      .crossJoin(broadcast(vocab.agg(sum("y_a").as("__na"),
        sum("y_b").as("__nb"), count(lit(1)).as("__v"))))
    val a0 = lit(alpha) * col("__v")
    def lo(y: Column, n: Column): Column =
      log((y + alpha) / (n + a0 - y - lit(alpha)))
    val delta = lo(col("y_a"), col("__na")) - lo(col("y_b"), col("__nb"))
    val sigma = sqrt(lit(1.0) / (col("y_a") + alpha) +
      lit(1.0) / (col("y_b") + alpha))
    val scored = withT
      .select(col("token"), col("y_a"), col("y_b"),
        (floor(delta / sigma * 1e6 + 0.5) / 1e6).as("z"))
    val topA = scored.orderBy(col("z").desc, col("token")).limit(k)
      .withColumn("side", lit("a"))
    val topB = scored.orderBy(col("z").asc, col("token")).limit(k)
      .withColumn("side", lit("b"))
    topA.unionByName(topB)
  }

  /** Zipf's-law fit over the top-`topK` token frequencies: the OLS slope
    * of `ln(freq)` on `ln(rank)` — natural language sits near −1, so the
    * slope is a one-number corpus-health audit (templated/duplicated
    * corpora flatten toward 0 because the head repeats; OCR noise and
    * mojibake fatten the tail and steepen it). Complements
    * [[corpusDivergence]]: KL needs a reference corpus, the Zipf slope
    * needs none.
    *
    * Execution shape: one token-count pass (partial-aggregable), a
    * TakeOrderedAndProject top-k, then the regression over k ≤ 1000 rows
    * — the model-state class. Numeric discipline = [[Classifier.fitOLS2]]:
    * ln values snap to 1e-6 in double, means come from exact DECIMAL
    * sums re-snapped to the same grid, moments accumulate as DECIMAL
    * over the CENTERED values (no catastrophic determinant
    * cancellation), and the closed form runs in double, 1e-6-floored.
    *
    * Returns ONE row: `(n_tokens_ranked, slope, intercept, r2)` —
    * `slope` null when fewer than 3 distinct ranked tokens exist. */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    require(topK >= 3, s"topK must be ≥ 3, got $topK")
    def snap6(c: Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
    val ranked = counts.orderBy(col("n").desc, col("token")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))))
      .select(snap6(log(col("rank").cast("double"))).as("x"),
        snap6(log(col("n").cast("double"))).as("y"))
    def meanOf(c: String) = snap6(
      sum(col(c).cast("decimal(19,6)")).cast("double") /
        count(lit(1)).cast("double"))
    val means = ranked.agg(meanOf("x").as("mx"), meanOf("y").as("my"),
      count(lit(1)).as("k"))
    val shifted = ranked.crossJoin(broadcast(means))
      .select(col("k"), col("mx"), col("my"),
        snap6(col("x") - col("mx")).cast("decimal(19,6)").as("cx"),
        snap6(col("y") - col("my")).cast("decimal(19,6)").as("cy"))
    val m = shifted.groupBy(col("k"), col("mx"), col("my"))
      .agg(sum(col("cx") * col("cx")).as("sxx"),
        sum(col("cx") * col("cy")).as("sxy"),
        sum(col("cy") * col("cy")).as("syy"))
    def r6(c: Column) = floor(c * 1e6 + lit(0.5)) / 1e6
    val sxxRaw = col("sxx").cast("double")
    // null-guarded divisors (ANSI + CSE hoisting — see proportionZTest)
    val sxx = when(sxxRaw > 0, sxxRaw)
    val sxy = col("sxy").cast("double")
    val syyRaw = col("syy").cast("double")
    val syy = when(syyRaw > 0, syyRaw)
    val slope = sxy / sxx
    val ok = col("k") >= 3 && sxxRaw > 0
    m.select(col("k").as("n_tokens_ranked"),
      when(ok, r6(slope)).as("slope"),
      when(ok, r6(col("my") - slope * col("mx"))).as("intercept"),
      when(ok && syy > 0, r6(lit(1.0) - (syy - slope * sxy) / syy)).as("r2"))
  }
}
