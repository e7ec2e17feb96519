package graft.ops

import org.apache.spark.sql.DataFrame
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
}
