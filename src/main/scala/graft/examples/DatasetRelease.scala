package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Layout, Sketches}

/** Dataset release — the LAST mile after curation and mixing: freeze a
  * quality-gated, budget-bounded corpus into reproducible shards with a
  * verifiable publishing manifest.
  *
  *   1. quality gate: word count ≥ `minWords` (stand-in for the full
  *      [[graft.ops.QualityRules.gopherKeep]] battery — swap in any
  *      Column predicate)
  *   2. budget-greedy selection: longest documents first until
  *      `tokenBudget` tokens are taken ([[Sketches.selectByBudget]] —
  *      decimal mass, no global window)
  *   3. deterministic shard assignment ([[Layout.assignShards]] — pure
  *      function of (seed, id), stable under corpus growth)
  *   4. publishing manifest ([[Layout.datasetManifest]] — per-shard
  *      counts + order-free mod-prime checksums a consumer re-derives
  *      with nothing but md5)
  *
  * Shuffle census: ONE partial-agg exchange for the token-mass
  * boundaries/bucket sums (over the pinned gated slice), one for the
  * manifest roll-up; the gate and shard assignment are map-only. The
  * whole chain is closed-form SQL-mirrorable, which is how
  * `q_release_e2e` oracle-checks it end to end.
  */
object DatasetRelease {

  /** Returns the release manifest `(shard, n_rows, checksum)`. Run
    * [[Layout.verifyManifest]] against the same (re-derived) selection
    * to prove a received copy intact — `DatasetReleaseSpec` pins that
    * roundtrip as empty. */
  def release(docs: DataFrame, minWords: Int, tokenBudget: Double,
              nShards: Int, seed: String = "graft"): DataFrame = {
    val selected = select(docs, minWords, tokenBudget)
    val sharded = Layout.assignShards(selected, "doc_id", nShards, seed = seed)
    Layout.datasetManifest(sharded, "shard", Seq("doc_id", "lang", "n_chars"))
  }

  /** Stages 1–2 only: the selected slice (with its `toks` cost column),
    * for callers who want the documents rather than the manifest. */
  def select(docs: DataFrame, minWords: Int, tokenBudget: Double): DataFrame = {
    val gated = docs.filter(col("text").isNotNull)
      .withColumn("toks", size(filter(split(col("text"), "\\s+"),
        t => length(t) > 0)).cast("long"))
      .filter(col("toks") >= minWords)
    Sketches.selectByBudget(gated, "doc_id", "n_chars", "toks", tokenBudget,
      nBuckets = 8)
  }
}
