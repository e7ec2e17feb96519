package graft.examples

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.Layout

/** End-to-end release pipeline: gate → budget-select → shard → manifest,
  * plus the consumer-side verification roundtrip. */
class DatasetReleaseSpec extends SparkSuite {
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("manifest rows account for exactly the selected documents") {
    val selected = DatasetRelease.select(docs, minWords = 30, tokenBudget = 20000.0)
    val manifest = DatasetRelease.release(docs, 30, 20000.0, nShards = 8)
    val nSel = selected.count()
    assert(nSel > 0)
    assert(manifest.agg(sum("n_rows")).head().getLong(0) == nSel)
    // every shard id in range, no empty-shard ghosts
    val shards = manifest.select("shard").collect().map(_.getInt(0))
    assert(shards.forall(s => s >= 0 && s < 8) && shards.distinct.length == shards.length)
  }

  test("a received copy verifies clean; a tampered copy is caught") {
    val manifest = DatasetRelease.release(docs, 30, 20000.0, nShards = 8)
    val copy = Layout.assignShards(
      DatasetRelease.select(docs, 30, 20000.0), "doc_id", 8)
    val clean = Layout.verifyManifest(copy, manifest, "shard",
      Seq("doc_id", "lang", "n_chars"))
    assert(clean.count() == 0)
    // corrupt one row's content -> exactly that shard flags checksum_mismatch
    val tampered = copy.withColumn("n_chars",
      when(col("doc_id") === copy.select(min("doc_id")).head().getLong(0),
        col("n_chars") + 1).otherwise(col("n_chars")))
    val bad = Layout.verifyManifest(tampered, manifest, "shard",
      Seq("doc_id", "lang", "n_chars")).collect()
    assert(bad.length == 1 && bad(0).getString(1) == "checksum_mismatch")
  }

  test("selection is budget-greedy: longest docs kept, budget honored") {
    val sel = DatasetRelease.select(docs, 30, 20000.0)
      .select("doc_id", "n_chars", "toks", "cum_cost").collect()
    val total = sel.map(_.getLong(2)).sum
    val maxCost = sel.map(_.getLong(2)).max
    // crossing-row rule: total may exceed the budget by at most one doc
    assert(total - maxCost < 20000L)
    // kept set is a prefix of the (n_chars desc, doc_id) walk: every kept
    // doc is at least as long as any dropped doc above the word gate...
    val keptMin = sel.map(_.getLong(1)).min
    val dropped = DatasetRelease.select(docs, 30, Double.MaxValue)
      .select("doc_id", "n_chars").collect()
      .filterNot(r => sel.exists(_.getLong(0) == r.getLong(0)))
    // ...allowing the boundary tie (equal n_chars split by doc_id)
    assert(dropped.forall(_.getLong(1) <= keptMin))
  }
}
