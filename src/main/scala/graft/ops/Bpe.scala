package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenization (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the real subword
  * algorithm, not the regex approximation `TextAnalysis.subwordCount`
  * uses for cheap counting.
  *
  * Representation: a word's symbol sequence is its characters joined by a
  * single space ("the" → "t h e"); a merge rule is the pair string to find
  * ("t h") and its concatenation ("th"). Applying a merge = one non-regex
  * `replace`, whose greedy left-to-right scan reproduces BPE's leftmost-
  * first overlap resolution EXACTLY ("a a a" under merge (a,a) → "aa a"),
  * and identically in DuckDB — which is what lets the harness oracle a
  * real tokenizer.
  *
  * [[apply]]/[[tokenize]]/[[tokenCount]] are pure map-only Column
  * expressions (a fold of `replace` calls over the literal merge table —
  * codegen-resident, zero shuffle, linear at any corpus size). [[learn]]
  * is the distributed fit: pair counting runs as vocab-table aggregations
  * (the corpus is read ONCE into a word-frequency table; each of the
  * `numMerges` iterations scans that table, not the corpus), with only the
  * single best pair collected per iteration — driver-side model state of
  * the same class as `Similarity.kmeansRefine`'s centroids. Production
  * vocabularies are learned once and shipped as literals (the committed-
  * artifact pattern the harness query uses).
  */
object Bpe {

  /** A word as its space-joined character sequence ("the" → "t h e"). */
  def charSeq(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Fold the merge table (in learned rank order) over one symbol
    * sequence. */
  def applyMerges(symbolSeq: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolSeq) { case (acc, (pair, joined)) =>
      replace(acc, lit(pair), lit(joined))
    }

  /** Non-empty lowercased whitespace words. */
  private def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** BPE-tokenize a document: `array<string>` of subword tokens, word by
    * word in document order. */
  def tokenize(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(words(text),
      w => split(applyMerges(charSeq(w), merges), " ")))

  /** Subword token count under the merge table — the training-cost
    * estimator a corpus budget actually needs. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(tokenize(text, merges)).cast("long")

  /** Learn `numMerges` merge rules from a corpus. Per iteration: re-apply
    * the merges so far to the word-frequency table, count adjacent symbol
    * pairs weighted by word frequency (one partial-aggregable shuffle of
    * pair keys), and take the single most frequent pair (ties broken
    * lexicographically — deterministic on any cluster). Only that one row
    * is ever collected. */
  def learn(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val wordFreq = df
      .select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val pinned = Checkpoints.pin(wordFreq)
    try {
      var merges = Vector.empty[(String, String)]
      var continue = true
      while (continue && merges.size < numMerges) {
        val syms = split(applyMerges(charSeq(col("w")), merges), " ")
        val pairs = pinned.df
          .select(col("n"), explode(
            when(size(syms) < 2, array().cast("array<string>"))
              .otherwise(transform(sequence(lit(1), size(syms) - 1),
                i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1)))))
            .as("pair"))
          .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(1).collect()
        if (pairs.isEmpty) continue = false
        else {
          val pair = pairs(0).getString(0)
          merges = merges :+ (pair -> pair.replace(" ", ""))
        }
      }
      merges
    } finally pinned.delete()
  }
}
