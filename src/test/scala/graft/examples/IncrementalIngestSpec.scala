package graft.examples

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.Dedup

/** Daily-ingest composition: exact fingerprints + signature index filter
  * a new batch down to genuinely novel documents. */
class IncrementalIngestSpec extends SparkSuite {
  import spark.implicits._

  test("novelDocs drops exact dups and near dups, keeps novel documents") {
    val corpusRaw = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog again and again"),
      (1001L, "completely unrelated corpus document about something else"))
      .toDF("doc_id", "text")
    val corpus = IncrementalIngest.annotate(corpusRaw, "doc_id", "text", numHashes = 32)
    val index = Dedup.buildSignatureIndex(corpus, "doc_id", "sig")
    val batchRaw = Seq(
      // exact dup of 1000 — must drop at the fingerprint level
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      // near dup of 1000 (one word changed) — must drop at the LSH level
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      // novel — must survive
      (3L, "a brand new document with entirely fresh vocabulary tokens"))
      .toDF("doc_id", "text")
    val batch = IncrementalIngest.annotate(batchRaw, "doc_id", "text", numHashes = 32)
    val novel = IncrementalIngest.novelDocs(batch, corpus.select("fp"), index,
      "doc_id", numHashes = 32, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(novel == Set(3L), s"got $novel")
  }

  test("an empty batch and an empty corpus are both fine") {
    val empty = IncrementalIngest.annotate(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 32)
    val corpus = IncrementalIngest.annotate(
      Seq((1L, "some corpus text here")).toDF("doc_id", "text"), "doc_id", "text", 32)
    val index = Dedup.buildSignatureIndex(corpus, "doc_id", "sig")
    assert(IncrementalIngest.novelDocs(empty, corpus.select("fp"), index,
      "doc_id", 32).count() == 0)
    // empty corpus: everything is novel
    val emptyIdx = Dedup.buildSignatureIndex(empty, "doc_id", "sig")
    assert(IncrementalIngest.novelDocs(corpus, empty.select("fp"), emptyIdx,
      "doc_id", 32).count() == 1)
  }
}
