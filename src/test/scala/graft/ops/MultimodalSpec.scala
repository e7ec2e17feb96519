package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Multimodal binary-column plumbing (decode step is a marked STUB; the
  * distribution shape — schema, per-partition batches, flatMap fan-out —
  * is the thing under test). */
class MultimodalSpec extends SparkSuite {
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("binary payload column + metadata struct schema") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(10), "text")
    assert(withBin.schema("payload").dataType.typeName == "binary")
    val withMeta = Multimodal.withImageMeta(withBin, "payload")
    val metaType = withMeta.schema("image_meta").dataType
    assert(metaType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val rows = withMeta.select("image_meta.width", "image_meta.height").collect()
    assert(rows.length == 10)
    rows.foreach { r => assert(r.getInt(0) >= 64 && r.getInt(1) >= 64) }
  }

  test("stub decode is deterministic (same bytes → same metadata)") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(5), "text")
    val a = Multimodal.withImageMeta(withBin, "payload")
      .select("doc_id", "image_meta.width").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Multimodal.withImageMeta(withBin, "payload")
      .select("doc_id", "image_meta.width").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("feature extraction emits fixed-width float vectors composable with similarity ops") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(8), "text")
    val feats = Multimodal.extractFeatures(withBin, "payload", dims = 16)
    val rows = feats.select("doc_id", "features").collect()
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    // composes with cosine search over the extracted features
    val topk = Similarity.bruteForceTopK(feats, feats.limit(2), "doc_id", "features", 2)
    assert(topk.count() == 4)
  }

  test("binaryFile source end-to-end: files on disk → decode → features") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toFile
    try {
      for (i <- 1 to 3)
        java.nio.file.Files.write(new java.io.File(dir, s"img_$i.bin").toPath,
          Array.fill[Byte](100 + i)(i.toByte))
      java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath, "x".getBytes)
      val files = graft.sources.ValidatedIO.binaryFiles(spark, dir.getAbsolutePath, "*.bin")
      assert(files.count() == 3, "glob filter must exclude non-matching files")
      assert(Seq("path", "modificationTime", "length", "content")
        .forall(files.columns.contains))
      val meta = Multimodal.withImageMeta(files, "content")
        .select("path", "image_meta.width").collect()
      assert(meta.length == 3 && meta.forall(_.getInt(1) >= 64))
      val feats = Multimodal.extractFeatures(files.withColumn("id",
        regexp_extract(col("path"), "img_([0-9])", 1).cast("long")), "content", dims = 8)
      assert(feats.select("features").collect().forall(_.getSeq[Float](0).length == 8))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("resize emits bounded payloads; frame sampling fans out with stride") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(3), "text")
    val resized = Multimodal.resizeImages(withBin, "payload", 32, 32).collect()
    resized.foreach { r =>
      val out = r.getAs[Array[Byte]]("resized")
      assert(out.length <= 32 * 32 * 3 / 64 && r.getAs[Int]("target_w") == 32)
    }
    val frames = Multimodal.sampleFrames(withBin, "payload", frameSize = 16, stride = 2)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r => assert(r.getLong(1) >= 1) }
  }
}
