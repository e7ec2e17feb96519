package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.ops.Dedup

/** Pins for [[StreamingValidate.streamNearDups]] — the contracts the
  * single-batch `q_stream_neardup` oracle cannot see:
  *  - MULTI-batch runs equal the sequential batch replay
  *    `m_i = nearDupsAgainstIndex(index_{i-1}, batch_i)`,
  *    `index_i = buildSignatureIndex(index_{i-1} ∪ batch_i)` — including
  *    matches against docs ingested by EARLIER STREAM BATCHES (the index
  *    growth path), not just the static index;
  *  - `growIndex = false` degrades to every batch probing the original
  *    index only;
  *  - pinned state stays at one generation per frame (superseded
  *    local-checkpoint pins released per batch), not one per batch. */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val vocabA = "the quick brown fox jumps over the lazy dog while rain falls on tin roofs"
  private val vocabB = "ships sail harbor winds carry salt spray across weathered planks at dusk"

  /** doc i of a family: the family sentence + one unique trailing token —
    * pairwise word-Jaccard within a family ≈ 0.85–0.92 around the 0.9
    * estimate, identical docs across batches score 1.0. */
  private def doc(id: Long, family: String, marker: String) =
    (id, s"$family extra$marker")

  // index corpus (ids 100+): family A docs — stream family-A docs match these
  private val indexDocs = (0 until 6).map(i => doc(100L + i, vocabA, s"x$i"))
  // batch 1: two EXACT copies of index docs + one novel family-B doc
  private val b1 = Seq(
    (0L, s"$vocabA extrax0"),            // identical to doc 100
    (1L, s"$vocabA extrax3"),            // identical to doc 103
    (2L, s"$vocabB extranew"))           // novel: seeds the B family
  // batch 2: an exact copy of the b1 novel doc (cross-STREAM-batch dup —
  // only the index-growth path can catch it) + a fresh index near-dup
  private val b2 = Seq(
    (10L, s"$vocabB extranew"),          // identical to stream doc 2
    (11L, s"$vocabA extrax5"))           // identical to doc 105
  // batch 3: copy of a b2 doc + a no-match doc
  private val b3 = Seq(
    (20L, s"$vocabB extranew"),          // identical to docs 2 and 10
    (21L, "completely unrelated words about gardening tomatoes compost"))

  private def sigs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), Dedup.minhashSignature(col("text"), 64).as("sig"))

  private def writeBatches(dir: String): Unit = {
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      val f = new java.io.File(s"$dir/b$i")
      b.toDF("doc_id", "text").coalesce(1).write.parquet(f.toString)
      // file-source ordering is by modification time — pin it explicitly
      f.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1700000000000L + i * 60000L))
    }
  }

  private def replay(batches: Seq[Seq[(Long, String)]],
                     grow: Boolean): Set[(Long, Long)] = {
    var index = Dedup.buildSignatureIndex(
      sigs(indexDocs.toDF("doc_id", "text")), "doc_id", "sig")
    val out = scala.collection.mutable.Set.empty[(Long, Long)]
    for (b <- batches) {
      val bs = sigs(b.toDF("doc_id", "text"))
      out ++= Dedup.nearDupsAgainstIndex(index, bs, "doc_id", "sig",
          numHashes = 64, threshold = 0.9)
        .select("id_new", "id_index").as[(Long, Long)].collect()
      if (grow)
        index = Dedup.buildSignatureIndex(index.unionByName(bs), "doc_id", "sig")
    }
    out.toSet
  }

  private def runStream(dir: String, grow: Boolean): Set[(Long, Long)] = {
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(dir)
    val index = Dedup.buildSignatureIndex(
      sigs(indexDocs.toDF("doc_id", "text")), "doc_id", "sig")
    StreamingValidate.streamNearDups(sigs(stream), index, "doc_id", "sig",
        numHashes = 64, threshold = 0.9, growIndex = grow)
      .select("id_new", "id_index").as[(Long, Long)].collect().toSet
  }

  test("multi-batch stream equals the sequential batch replay (grown index)") {
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    writeBatches(dir)
    val pinsBefore = spark.sparkContext.getRDDStorageInfo.length
    val got = runStream(dir, grow = true)
    val want = replay(Seq(b1, b2, b3), grow = true)
    assert(got == want, s"stream=$got replay=$want")
    // the growth path specifically: doc 10 (batch 2) and doc 20 (batch 3)
    // duplicate STREAM doc 2 — invisible to the static index; doc 20 pairs
    // with min-id rep 2 (not 10: identical sigs collapse to one index row)
    assert(got.contains((10L, 2L)) && got.contains((20L, 2L)))
    assert(!got.exists(_._2 == 10L), "identical-sig group must keep ONE rep")
    // exact copies of index docs match across every batch
    assert(got.contains((0L, 100L)) && got.contains((11L, 105L)))
    // no-match docs stay absent
    assert(!got.exists(p => p._1 == 21L))
    // state discipline: superseded pins released — generations do not
    // accumulate per batch (async unpersist: allow a little slack)
    Thread.sleep(500)
    val pinsAfter = spark.sparkContext.getRDDStorageInfo.length
    assert(pinsAfter - pinsBefore <= 3,
      s"pinned-RDD generations grew $pinsBefore -> $pinsAfter")
  }

  test("growIndex=false probes only the original index") {
    val dir = java.nio.file.Files.createTempDirectory("neardup_static").toString
    writeBatches(dir)
    val got = runStream(dir, grow = false)
    val want = replay(Seq(b1, b2, b3), grow = false)
    assert(got == want)
    // the cross-stream-batch dups are NOT caught without growth
    assert(!got.contains((10L, 2L)) && !got.contains((20L, 2L)))
    assert(got.contains((0L, 100L)) && got.contains((11L, 105L)))
  }
}
