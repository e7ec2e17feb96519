package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSuite

/** Multimodal binary columns: REAL JDK ImageIO decode (PNG/JPEG/GIF/BMP)
  * plus the distribution shape — schema, per-partition batches, flatMap
  * fan-out. Fixtures are genuine encoded images generated in-process. */
class MultimodalSpec extends SparkSuite {
  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Encode a w×h image with deterministic pixel content. */
  private def imageBytes(w: Int, h: Int, format: String, seed: Int = 7): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 17 + seed * 101) & 0xffffff)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def imageDf(rows: Seq[(Long, Array[Byte])]) = {
    val schema = StructType.fromDDL("id BIGINT, payload BINARY")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, b) => Row(i, b) }, 2), schema)
  }

  test("withImageMeta decodes real PNG/JPEG/GIF/BMP headers") {
    val df = imageDf(Seq(
      1L -> imageBytes(40, 30, "png"),
      2L -> imageBytes(64, 8, "jpg"),
      3L -> imageBytes(16, 16, "gif"),
      4L -> imageBytes(10, 20, "bmp")))
    val meta = Multimodal.withImageMeta(df, "payload")
      .select("id", "image_meta.width", "image_meta.height", "image_meta.format")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(meta(1L) == ((40, 30, "png")))
    assert(meta(2L)._1 == 64 && meta(2L)._2 == 8 && meta(2L)._3.startsWith("jp"))
    assert(meta(3L) == ((16, 16, "gif")))
    assert(meta(4L) == ((10, 20, "bmp")))
  }

  test("withImageMeta reports channel count and nulls out non-image bytes") {
    val df = imageDf(Seq(
      1L -> imageBytes(8, 8, "png"),
      2L -> "definitely not an image".getBytes("UTF-8"),
      3L -> Array.empty[Byte],
      4L -> null))
    val rows = Multimodal.withImageMeta(df, "payload").select("id", "image_meta").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getStruct(1))).toMap
    assert(rows(1L).getInt(2) == 3, "RGB PNG must report 3 bands")
    // non-image bytes → all-null meta struct; empty → all-null; null → null struct
    assert(rows(2L).isNullAt(0) && rows(2L).isNullAt(3))
    assert(rows(3L).isNullAt(0))
    assert(rows(4L) == null)
  }

  test("decode survives truncated/corrupt headers without failing the job") {
    val png = imageBytes(32, 32, "png")
    val df = imageDf(Seq(
      1L -> png.take(8),                      // magic only, no IHDR
      2L -> png.take(png.length / 2),         // header ok, body truncated
      3L -> png.map(b => (b ^ 0x5a).toByte))) // scrambled
    // must not throw; row 2 still has a parseable header (dims live in IHDR)
    val rows = Multimodal.withImageMeta(df, "payload")
      .select("id", "image_meta.width").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(rows(1L) == null)
    assert(rows(2L) == 32)
    assert(rows.size == 3)
  }

  test("resize really rescales: output decodes to the target dims") {
    val df = imageDf(Seq(1L -> imageBytes(64, 48, "png"), 2L -> "junk".getBytes))
    val out = Multimodal.resizeImages(df, "payload", 16, 12).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized")).toMap
    val back = Multimodal.decodeImageMeta(out(1L))
    assert(back.getInt(0) == 16 && back.getInt(1) == 12)
    assert(out(2L) == null, "undecodable payload must yield null, not garbage")
  }

  test("imageHistogramFeatures: real per-channel histogram, L1-normalized") {
    val df = imageDf(Seq(1L -> imageBytes(20, 10, "png"), 2L -> "junk".getBytes))
    val rows = Multimodal.imageHistogramFeatures(df, "payload", bins = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    val f = rows(1L)
    assert(f.length == 12)
    // each channel's histogram sums to ~1
    Seq(0, 4, 8).foreach { off =>
      val s = f.slice(off, off + 4).sum
      assert(math.abs(s - 1f) < 1e-3, s"channel at $off sums to $s")
    }
    assert(rows(2L) == null)
    // composes with similarity search
    val feats = Multimodal.imageHistogramFeatures(
      imageDf((1L to 6L).map(i => i -> imageBytes(16, 16, "png", seed = i.toInt))), "payload")
    val topk = Similarity.bruteForceTopK(feats, feats.limit(2), "id", "features", 2)
    assert(topk.count() == 4)
  }

  test("hash-stub feature extraction still covers arbitrary binary payloads") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(8), "text")
    val feats = Multimodal.extractFeatures(withBin, "payload", dims = 16)
    val rows = feats.select("doc_id", "features").collect()
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    val topk = Similarity.bruteForceTopK(feats, feats.limit(2), "doc_id", "features", 2)
    assert(topk.count() == 4)
  }

  test("binaryFile source end-to-end: image files on disk → decode → features") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toFile
    try {
      for (i <- 1 to 3)
        java.nio.file.Files.write(new java.io.File(dir, s"img_$i.png").toPath,
          imageBytes(8 * i, 8, "png", seed = i))
      java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath, "x".getBytes)
      val files = graft.sources.ValidatedIO.binaryFiles(spark, dir.getAbsolutePath, "*.png")
      assert(files.count() == 3, "glob filter must exclude non-matching files")
      assert(Seq("path", "modificationTime", "length", "content")
        .forall(files.columns.contains))
      val meta = Multimodal.withImageMeta(files, "content")
        .select("path", "image_meta.width").collect()
        .map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
      assert(meta.map(_._2).toSeq == Seq(8, 16, 24))
      val feats = Multimodal.imageHistogramFeatures(files, "content", bins = 8)
      assert(feats.select("features").collect().forall(_.getSeq[Float](0).length == 24))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("frame sampling fans out with stride on arbitrary payloads") {
    val withBin = Multimodal.asBinaryPayload(docs.limit(3), "text")
    val frames = Multimodal.sampleFrames(withBin, "payload", frameSize = 16, stride = 2)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r => assert(r.getLong(1) >= 1) }
  }

  /** Encode an animated GIF (pure JDK: the gif ImageWriter supports
    * multi-frame sequences) with one solid-color frame per entry. */
  private def animatedGif(colors: Seq[Int], w: Int = 12, h: Int = 8): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      colors.foreach { c =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, c)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("graft.frames REALLY decodes animated-GIF frames (not byte chunks)") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val df = imageDf(Seq(1L -> animatedGif(colors), 2L -> "not a gif".getBytes))
    val out = Multimodal.sampleFramesVia(df, "payload", "graft.frames")
      .select("id", "frame_idx", "frame").collect()
    // undecodable payload contributes no frames; the gif yields one row
    // per stored frame, each a decodable image of the ORIGINAL dims
    assert(out.forall(_.getLong(0) == 1L))
    assert(out.map(_.getInt(1)).sorted.toSeq == (0 until colors.length))
    val metas = out.map(r => Multimodal.decodeImageMeta(r.getAs[Array[Byte]](2)))
    assert(metas.forall(m => m.getInt(0) == 12 && m.getInt(1) == 8),
      "each sampled frame must itself decode to the frame dimensions")
    // frames carry the per-frame pixel content: the red and blue frames
    // must produce different histograms (a byte-chunker cannot — its
    // chunks aren't images at all)
    val byIdx = out.map(r => r.getInt(1) -> r.getAs[Array[Byte]](2)).toMap
    val histR = Multimodal.histogramFeature(byIdx(0), 4)
    val histB = Multimodal.histogramFeature(byIdx(2), 4)
    assert(histR != null && histB != null && histR != histB)
    // stride sampling keeps every stride-th frame
    val strided = Multimodal.sampleFramesVia(df, "payload", "graft.frames", Seq("2"))
      .select("frame_idx").collect().map(_.getInt(0)).sorted.toSeq
    assert(strided == Seq(0, 2, 4))
  }

  test("graft.rp_image features derive from PIXELS: re-encodings agree, stand-in cannot") {
    // the same deterministic image encoded losslessly two ways: raw bytes
    // differ wildly, decoded pixels are identical
    val png = imageBytes(24, 16, "png", seed = 3)
    val bmp = imageBytes(24, 16, "bmp", seed = 3)
    assert(!java.util.Arrays.equals(png, bmp))
    val df = imageDf(Seq(1L -> png, 2L -> bmp, 3L -> imageBytes(24, 16, "png", seed = 9),
      4L -> "junk bytes".getBytes))
    val feats = Multimodal.extractFeaturesVia(df, "payload", "graft.rp_image",
      Seq("32", "7")).select("id", "features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(feats(1L).length == 32)
    assert(feats(1L) == feats(2L),
      "PNG and BMP of the same pixels must embed identically — proves decode, not byte-hash")
    assert(feats(1L) != feats(3L), "different pixels must embed differently")
    assert(feats(4L) == null, "undecodable payload → null vector")
    // unit-normalized, deterministic across invocations
    val norm = math.sqrt(feats(1L).map(f => f.toDouble * f).sum)
    assert(math.abs(norm - 1.0) < 1e-4)
    val again = Multimodal.extractFeaturesVia(df, "payload", "graft.rp_image",
      Seq("32", "7")).select("id", "features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(again(1L) == feats(1L))
    // composes with the similarity operators (the embeddings-table shape)
    val featDf = Multimodal.extractFeaturesVia(
      imageDf((1L to 6L).map(i => i -> imageBytes(16, 16, "png", seed = i.toInt))),
      "payload", "graft.rp_image", Seq("16"))
    val topk = Similarity.bruteForceTopK(featDf, featDf.limit(2), "id", "features", 2)
    assert(topk.count() == 4)
  }

  test("sniffFormat recognizes magic bytes, unknowns, nulls, real encoders") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vectors = Seq(
      1L -> "89504E470D0A1A0A0000",      // png
      2L -> "FFD8FFE000104A464946",      // jpeg/JFIF
      3L -> "474946383961AAAA",          // gif89a
      4L -> "474946383761AAAA",          // gif87a
      5L -> "52494646AAAAAAAA57415645",  // riff/wave
      6L -> "52494646AAAAAAAA41564920",  // riff but AVI -> unknown
      7L -> "255044462D312E34",          // pdf
      8L -> "89504E",                    // truncated magic -> unknown
      9L -> "00112233445566778899")      // junk -> unknown
    val df = vectors.toDF("id", "hex")
      .withColumn("bin", unhex(col("hex")))
      .withColumn("f", Multimodal.sniffFormat(col("bin")))
    val got = df.select("id", "f").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "gif", 4L -> "gif",
      5L -> "wav", 6L -> "unknown", 7L -> "pdf", 8L -> "unknown", 9L -> "unknown"))
    // null propagates; a REAL ImageIO-encoded png sniffs as png
    val nullRow = Seq((1L, null.asInstanceOf[Array[Byte]])).toDF("id", "bin")
      .select(Multimodal.sniffFormat(col("bin"))).head()
    assert(nullRow.isNullAt(0))
    val real = imageDf(Seq(1L -> imageBytes(8, 8, "png", seed = 1)))
      .select(Multimodal.sniffFormat(col("payload"))).head().getString(0)
    assert(real == "png")
  }

  /** Encode 16-bit little-endian PCM WAV from a sample function. */
  private def wavBytes(n: Int, sampleRate: Float = 8000f, channels: Int = 1)(
      sample: Int => Double): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val data = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n) {
      val v = (sample(i).max(-1.0).min(1.0) * 32767).toInt.toShort
      for (c <- 0 until channels) {
        val off = (i * channels + c) * 2
        data(off) = (v & 0xff).toByte
        data(off + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("withAudioMeta decodes real WAV headers; non-audio yields nulls") {
    val tone = wavBytes(8000, 8000f)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / 8000))
    val stereo = wavBytes(4000, 16000f, channels = 2)(_ => 0.1)
    val df = imageDf(Seq(1L -> tone, 2L -> stereo,
      3L -> "not audio".getBytes("UTF-8"), 4L -> null))
    val m = Multimodal.withAudioMeta(df, "payload")
      .select("id", "audio_meta.sample_rate", "audio_meta.channels",
        "audio_meta.n_frames", "audio_meta.duration_s")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getFloat(1) == 8000f && m(1L).getInt(2) == 1 &&
      m(1L).getLong(3) == 8000L && math.abs(m(1L).getDouble(4) - 1.0) < 1e-6)
    assert(m(2L).getFloat(1) == 16000f && m(2L).getInt(2) == 2 &&
      math.abs(m(2L).getDouble(4) - 0.25) < 1e-6)
    assert(m(3L).isNullAt(1) && m(4L).isNullAt(1))
  }

  test("audioFeatures: RMS and zero-crossing rate match the signal's physics") {
    val sr = 8000f
    // first half silence, second half a 0.8-amplitude 400 Hz tone
    val mixed = wavBytes(8000, sr)(i =>
      if (i < 4000) 0.0 else 0.8 * math.sin(2 * math.Pi * 400 * i / sr))
    val df = imageDf(Seq(1L -> mixed, 2L -> "junk".getBytes("UTF-8")))
    val rows = Multimodal.audioFeatures(df, "payload", windows = 4)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    val f = rows(1L)
    assert(f.length == 8)
    // silent windows: ~0 RMS and ~0 ZCR; tone windows: RMS ≈ 0.8/√2,
    // ZCR ≈ 2·400/8000 = 0.1 crossings per sample
    assert(f(0) < 0.01 && f(2) < 0.01, s"silence RMS: ${f(0)}, ${f(2)}")
    assert(math.abs(f(4) - 0.8 / math.sqrt(2)) < 0.05, s"tone RMS: ${f(4)}")
    assert(math.abs(f(5) - 0.1) < 0.02, s"tone ZCR: ${f(5)}")
    assert(rows(2L) == null)
  }

  test("dHash is stable under re-encode + upscale; distinct images diverge") {
    // gradient image so downscaled luminance gradients are well-defined
    def gradient(w: Int, h: Int, format: String): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255) / w
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.dHashOf(gradient(64, 48, "png")).get
    val reenc = Multimodal.dHashOf(gradient(64, 48, "bmp")).get
    val upscaled = Multimodal.dHashOf(gradient(128, 96, "png")).get
    assert(dist(base, reenc) <= 2, s"re-encode moved ${dist(base, reenc)} bits")
    assert(dist(base, upscaled) <= 10, s"upscale moved ${dist(base, upscaled)} bits")
    val noise = Multimodal.dHashOf(imageBytes(64, 48, "png", seed = 99)).get
    assert(dist(base, noise) > 10, s"unrelated image only ${dist(base, noise)} bits away")
    assert(Multimodal.dHashOf("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDups pairs perceptual copies, not unrelated images") {
    def gradient(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 255) / w
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = imageDf(Seq(
      1L -> gradient(64, 48),
      2L -> gradient(128, 96),            // perceptual copy (upscaled)
      3L -> imageBytes(64, 48, "png", 5), // unrelated
      4L -> "garbage".getBytes("UTF-8"))) // undecodable -> drops
    val pairs = Multimodal.imageNearDups(df, "id", "payload", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("Dedup.hammingPairs banded blocking is lossless vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val hashes = (0 until 80).map { i =>
      // half are mutations of a few base hashes -> dense near pairs
      val base = Array(0x0123456789abcdefL, -1L, 0L)(i % 3)
      val flips = rnd.nextInt(12)
      (i.toLong, (0 until flips).foldLeft(base)((h, _) => h ^ (1L << rnd.nextInt(64))))
    }
    for (maxDist <- Seq(0, 3, 10)) {
      val want = (for {
        (i1, h1) <- hashes; (i2, h2) <- hashes
        if i1 < i2
        d = java.lang.Long.bitCount(h1 ^ h2) if d <= maxDist
      } yield (i1, i2, d)).toSet
      val got = Dedup.hammingPairs(hashes.toDF("id", "h"), "id", "h", maxDist)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"maxDist=$maxDist")
    }
  }
test("imageDimsFromHeader: real encoded images parse without decoding") {
    // genuine ImageIO-encoded PNG/GIF/BMP: header arithmetic must agree
    // with the decoder's ground truth
    val rows = Seq(
      1L -> imageBytes(37, 21, "png"),
      2L -> imageBytes(300, 2, "gif"),
      3L -> imageBytes(64, 48, "bmp"),
      4L -> imageBytes(16, 16, "jpg"),          // marker scan → null here
      5L -> Array[Byte](0x0B, 0xAD.toByte))     // junk → null
    val out = imageDf(rows)
      .select(col("id"), Multimodal.imageDimsFromHeader(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("png", 37L, 21L)))
    assert(out(2L) == (("gif", 300L, 2L)))
    assert(out(3L) == (("bmp", 64L, 48L)))
    assert(out(4L) == null && out(5L) == null)
    // signed BMP height: a hand-built top-down DIB (height = -48)
    val topDown = {
      val b = imageBytes(64, 48, "bmp")
      val neg = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-48).array()
      System.arraycopy(neg, 0, b, 22, 4); b
    }
    val td = imageDf(Seq(9L -> topDown))
      .select(Multimodal.imageDimsFromHeader(col("payload")).as("m"))
      .select(col("m.height")).head().getLong(0)
    assert(td == -48L)
  }
}
