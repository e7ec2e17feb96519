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

  test("bloom pre-routed novelDocs returns the identical novel set") {
    val corpusRaw = (0L until 300L).map(i => (1000L + i, s"corpus doc body $i"))
      .toDF("doc_id", "text")
    val corpus = IncrementalIngest.annotate(corpusRaw, "doc_id", "text", numHashes = 32)
    val index = Dedup.buildSignatureIndex(corpus, "doc_id", "sig")
    val batchRaw = Seq(
      (1L, "corpus doc body 7"),                       // exact dup
      (2L, "totally novel text alpha beta gamma")      // novel
    ).toDF("doc_id", "text")
    val batch = IncrementalIngest.annotate(batchRaw, "doc_id", "text", numHashes = 32)
    val plain = IncrementalIngest.novelDocs(batch, corpus.select("fp"), index,
      "doc_id", numHashes = 32, threshold = 0.7)
      .select("doc_id").as[Long].collect().toSet
    val sketch = Dedup.seenFilter(corpus, col("fp"), expectedItems = 1000)
    val routed = IncrementalIngest.novelDocs(batch, corpus.select("fp"), index,
      "doc_id", numHashes = 32, threshold = 0.7, seenFp = Some(sketch))
      .select("doc_id").as[Long].collect().toSet
    assert(routed == plain)
  }

  test("updatedClusters folds batch pairs into the stored assignment") {
    import graft.ops.Clusters
    val corpusRaw = Seq(
      (1000L, "shared text body one two three four five"),
      (1001L, "shared text body one two three four five"),
      (1002L, "unrelated corpus entry entirely different"))
      .toDF("doc_id", "text")
    val corpus = IncrementalIngest.annotate(corpusRaw, "doc_id", "text", numHashes = 32)
    val index = Dedup.buildSignatureIndex(corpus, "doc_id", "sig")
    // stored assignment: {1000, 1001} clustered from the corpus build
    val assignment = Clusters.connectedComponents(
      Seq((1000L, 1001L)).toDF("id_a", "id_b"))
    // batch: one near-dup of the 1000-clique, one novel pair within batch
    val batchRaw = Seq(
      (1L, "shared text body one two three four five"),
      (2L, "fresh pair text aaa bbb ccc"),
      (3L, "fresh pair text aaa bbb ccc"))
      .toDF("doc_id", "text")
    val batch = IncrementalIngest.annotate(batchRaw, "doc_id", "text", numHashes = 32)
    val merged = IncrementalIngest.updatedClusters(assignment, batch, index,
      "doc_id", numHashes = 32, threshold = 0.7)
      .as[(Long, Long)].collect().toMap
    // doc 1 joins the 1000-cluster (rep = min id = 1); docs 2,3 form their own
    assert(merged(1L) == 1L && merged(1000L) == 1L && merged(1001L) == 1L)
    assert(merged(2L) == 2L && merged(3L) == 2L)
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
