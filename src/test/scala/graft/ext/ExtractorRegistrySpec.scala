package graft.ext

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSuite
import graft.ops.Multimodal

/** A simulated third-party extractor pack (a stand-in for a real
  * model-backed extractor jar): registered ONLY through the test
  * classpath's META-INF/services entry, exactly like an external jar. */
final class TestExtractorPackProvider extends ExtractorProvider {
  val namespace = "modelpack"
  override val featureExtractors: Map[String, Seq[String] => Array[Byte] => Seq[Float]] = Map(
    // "embedding model": constant-dim vector of byte-sum statistics; the
    // arg parameterizes the dimension like a model-size knob would
    "bytestats" -> (args => {
      val dims = args.headOption.map(_.toInt).getOrElse(4)
      bytes => {
        val out = new Array[Float](dims)
        var i = 0
        while (i < bytes.length) { out(i % dims) += (bytes(i) & 0xff) / 255.0f; i += 1 }
        out.toSeq
      }
    }))
  override val frameSamplers: Map[String, Seq[String] => Array[Byte] => Iterator[(Int, Array[Byte])]] =
    Map("pairs" -> (_ => bytes => bytes.grouped(2).zipWithIndex.map(_.swap)))
}

/** ServiceLoader discovery for multimodal extractor packs: the engine's
  * own pack and a foreign test pack both resolve by qualified name and
  * power the `*Via` Multimodal operators end-to-end — the two JDK
  * stubs are integration points, not dead ends. */
class ExtractorRegistrySpec extends SparkSuite {

  private def imageBytes(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def binDf(rows: Seq[(Long, Array[Byte])]) = {
    val schema = StructType.fromDDL("id BIGINT, payload BINARY")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2), schema)
  }

  test("discovers the built-in graft pack and a third-party pack") {
    assert(ExtractorRegistry.providers.keySet.contains("graft"))
    assert(ExtractorRegistry.providers.keySet.contains("modelpack"))
    assert(ExtractorRegistry.names.contains("graft.histogram"))
    assert(ExtractorRegistry.names.contains("modelpack.bytestats"))
  }

  test("extractFeaturesVia runs the REAL histogram extractor on a real PNG") {
    val df = binDf(Seq(1L -> imageBytes(16, 16), 2L -> Array[Byte](1, 2, 3), 3L -> null))
    val out = Multimodal.extractFeaturesVia(df, "payload", "graft.histogram", Seq("4"))
      .select(col("id"), col("features")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
    assert(out(1L).get.length == 12, "3 channels x 4 bins")
    assert(math.abs(out(1L).get.take(4).sum - 1.0f) < 1e-4, "per-channel L1 normalized")
    assert(out(2L).isEmpty, "non-image payload -> null features")
    assert(out(3L).isEmpty, "null payload short-circuits")
  }

  test("a third-party extractor powers the same operator unchanged") {
    val df = binDf(Seq(1L -> Array[Byte](10, 20, 30, 40)))
    val Seq(f) = Multimodal.extractFeaturesVia(df, "payload", "modelpack.bytestats", Seq("2"))
      .select(col("features")).collect().map(_.getSeq[Float](0)).toSeq
    // expected values accumulate per byte, matching the extractor's
    // float-add order (x/255 + y/255 ≠ (x+y)/255 in float rounding)
    assert(f == Seq(10 / 255.0f + 30 / 255.0f, 20 / 255.0f + 40 / 255.0f))
  }

  test("sampleFramesVia fans out one row per sampled frame with indices") {
    val df = binDf(Seq(1L -> Array.tabulate[Byte](10)(_.toByte)))
    val rows = Multimodal.sampleFramesVia(df, "payload", "graft.chunks", Seq("3", "2"))
      .select(col("frame_idx"), col("frame")).collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq)).sortBy(_._1)
    // chunks of 3: idx 0,1,2,3 -> stride 2 keeps 0 and 2
    assert(rows.toSeq == Seq(0 -> Seq[Byte](0, 1, 2), 2 -> Seq[Byte](6, 7, 8)))
  }

  test("unknown pack / entry fail fast at call time with a discoverable error") {
    val df = binDf(Seq(1L -> Array[Byte](1)))
    val e1 = intercept[NoSuchElementException](
      Multimodal.extractFeaturesVia(df, "payload", "nope.thing"))
    assert(e1.getMessage.contains("graft"), "error must list available packs")
    val e2 = intercept[NoSuchElementException](
      Multimodal.extractFeaturesVia(df, "payload", "graft.nope"))
    assert(e2.getMessage.contains("histogram"), "error must list the pack's extractors")
  }

  test("semantically invalid numeric args fail at construction, not per-row on executors") {
    // "0".toInt parses, so without factory require()s these would pass the
    // driver-side resolve and then throw Arithmetic/IllegalArgument
    // exceptions from every task mid-job
    intercept[IllegalArgumentException](ExtractorRegistry.featureExtractor("graft.histogram", "0"))
    intercept[IllegalArgumentException](ExtractorRegistry.featureExtractor("graft.hash", "-1"))
    intercept[IllegalArgumentException](ExtractorRegistry.frameSampler("graft.chunks", "0"))
    intercept[IllegalArgumentException](ExtractorRegistry.frameSampler("graft.chunks", "4096", "0"))
    val df = binDf(Seq(1L -> Array[Byte](1)))
    intercept[IllegalArgumentException](
      Multimodal.sampleFramesVia(df, "payload", "graft.chunks", Seq("4096", "0")))
  }
}
