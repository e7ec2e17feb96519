package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (BASELINE.json mandate, SURVEY.md §2.6): image/audio/
  * video as opaque `binary` columns + typed metadata structs.
  *
  * Image decode is REAL: JDK `javax.imageio` (PNG/JPEG/GIF/BMP/WBMP — the
  * readers that ship with the JRE; no external codec). Metadata extraction
  * reads only the header (ImageIO readers parse dimensions lazily), so
  * `withImageMeta` never materializes pixel data. `resizeImages` and
  * `imageHistogramFeatures` DO decode pixels — both are per-partition batch
  * shapes with bounded per-row output. Undecodable payloads yield null
  * metadata / null output rather than failing the job (quarantine them with
  * `Validate` on the null meta downstream).
  *
  * Both extractor roles now have REAL pure-JVM implementations registered
  * through the SPI: `graft.rp_image` (decoded-pixel histogram through a
  * seeded random-projection + tanh layer — the random-features regime;
  * weights derive deterministically from the seed) and `graft.frames`
  * (ImageIO multi-frame decode — every frame of an animated GIF). The
  * byte-level `graft.hash` / `graft.chunks` entries remain as documented
  * fallbacks for payloads no JDK codec can decode (raw video, audio);
  * a model-backed pack plugs into the same SPI.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType.fromDDL(
    "width INT, height INT, channels INT, format STRING")

  private val nullMeta = Row(null, null, null, null)

  /** Real header decode: dimensions + band count + format via the JDK's
    * registered ImageIO readers. Only the header is parsed — `getWidth`/
    * `getHeight`/`getImageTypes` on an ImageReader are metadata reads, not
    * a pixel decode. Returns all-null metadata for non-image bytes. */
  private[ops] def decodeImageMeta(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length == 0) return nullMeta
    // MemoryCacheImageInputStream (useCache=false default for stream input
    // below): no executor-local temp files per image
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    if (iis == null) return nullMeta
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return nullMeta
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        val types = reader.getImageTypes(0)
        val channels: Any =
          if (types.hasNext) types.next().getNumBands else null
        Row(w, h, channels, reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
      } finally reader.dispose()
    } catch {
      case _: Exception => nullMeta // truncated/corrupt header
    } finally iis.close()
  }

  /** Full pixel decode; None for non-image payloads. */
  private[ops] def decodeImage(bytes: Array[Byte]): Option[BufferedImage] = {
    if (bytes == null || bytes.length == 0) return None
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }
  }

  /** Attach decoded metadata to a binary column via per-partition batch
    * decode (`mapPartitions` — the JVM analog of a vectorized decode UDF:
    * one pass per partition, streamed rows, no driver collect). */
  def withImageMeta(df: DataFrame, binCol: String, metaCol: String = "image_meta"): DataFrame = {
    val outSchema = df.schema.add(metaCol, imageMetaSchema)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // the ImageIO registry is JVM-global and thread-safe; no per-partition
      // init needed beyond disabling the disk cache for this executor
      ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else decodeImageMeta(bytes)))
      }
    }(enc)
  }

  /** Deterministic hash-derived feature kernel — the STAND-IN for a learned
    * embedding model (none ships with the JDK). Exposed for the `graft.hash`
    * extractor-pack entry. */
  private[graft] def hashFeature(bytes: Array[Byte], dims: Int): Seq[Float] = {
    if (bytes == null) return null
    val arr = new Array[Float](dims)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      arr(i % dims) += (h % 1000) / 1000.0f
      i += 1
    }
    arr.toSeq
  }

  /** Seeded random-projection layer weights: `outDims` rows of
    * `inDims + 1` floats (bias first), drawn from the JDK's spec-fixed
    * PRNG (`java.util.Random` documents its exact LCG and nextGaussian
    * algorithm, so the "model" reproduces bit-identically on every JVM)
    * and scaled 1/sqrt(inDims) per the random-features convention. */
  private[graft] def rpWeights(inDims: Int, outDims: Int,
                               seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    val scale = 1.0 / math.sqrt(inDims.toDouble)
    Array.fill(outDims) {
      val row = new Array[Float](inDims + 1)
      var i = 0
      while (i < row.length) { row(i) = (rnd.nextGaussian() * scale).toFloat; i += 1 }
      row
    }
  }

  /** REAL learned-style feature extractor: the decoded-pixel color
    * histogram (a genuine image signal, not raw bytes) pushed through a
    * fixed seeded random-projection + tanh layer, L2-normalized — the
    * random-features regime (random projections preserve distances per
    * Johnson–Lindenstrauss, so nearby images stay nearby in feature
    * space). Because the input is PIXELS, re-encodings of the same image
    * (PNG vs BMP) produce the SAME vector — the property a byte-hash
    * stand-in cannot have. Null for undecodable payloads. Exposed for the
    * `graft.rp_image` extractor-pack entry. */
  private[graft] def rpFeature(bytes: Array[Byte], bins: Int,
                               weights: Array[Array[Float]]): Seq[Float] = {
    val hist = histogramFeature(bytes, bins)
    if (hist == null) return null
    val in = hist.toArray
    val out = new Array[Float](weights.length)
    var j = 0
    while (j < weights.length) {
      val row = weights(j)
      var s = row(0).toDouble // bias
      var i = 0
      while (i < in.length) { s += row(i + 1) * in(i); i += 1 }
      out(j) = math.tanh(s).toFloat
      j += 1
    }
    var n = 0.0
    var i = 0
    while (i < out.length) { n += out(i).toDouble * out(i); i += 1 }
    val inv = if (n == 0) 0f else (1.0 / math.sqrt(n)).toFloat
    i = 0
    while (i < out.length) { out(i) *= inv; i += 1 }
    out.toSeq
  }

  /** REAL per-channel color-histogram feature kernel (see
    * [[imageHistogramFeatures]]); null for undecodable payloads. Exposed for
    * the `graft.histogram` extractor-pack entry. */
  private[graft] def histogramFeature(bytes: Array[Byte], bins: Int): Seq[Float] =
    decodeImage(bytes).map { img =>
      val hist = new Array[Float](3 * bins)
      val w = img.getWidth; val h = img.getHeight
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          hist(((rgb >> 16) & 0xff) * bins / 256) += 1f
          hist(bins + (((rgb >> 8) & 0xff) * bins / 256)) += 1f
          hist(2 * bins + ((rgb & 0xff) * bins / 256)) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      var i = 0
      while (i < hist.length) { hist(i) /= n; i += 1 }
      hist.toSeq
    }.orNull

  /** Byte-hash feature fallback: binary payload → fixed-width float vector
    * from a rolling hash of the raw bytes — for payloads no JDK codec can
    * decode. Output shape matches the `embeddings` table so the similarity
    * operators compose directly. For DECODABLE images use the REAL
    * extractors instead: [[imageHistogramFeatures]] or
    * `extractFeaturesVia(df, col, "graft.rp_image")` (seeded
    * random-projection features over decoded pixels). */
  def extractFeatures(df: DataFrame, binCol: String, dims: Int = 64,
                      outCol: String = "features"): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ hashFeature(bytes, dims))
      }
    }(enc)
  }

  /** Feature extraction through the [[graft.ext.ExtractorRegistry]] SPI:
    * `extractor` is a namespace-qualified pack entry (e.g.
    * `"graft.histogram"`, or a third-party `"mypack.clip_image"`). The
    * closure captures only the NAME and args — the extractor function
    * itself resolves from the ServiceLoader registry ON THE EXECUTOR, once
    * per JVM (lazy object init), which is exactly how a real model-backed
    * extractor wants to load: per-executor weights, never serialized
    * through the driver. */
  def extractFeaturesVia(df: DataFrame, binCol: String, extractor: String,
                         args: Seq[String] = Nil,
                         outCol: String = "features"): DataFrame = {
    // resolve once on the DRIVER too, so an unknown name fails at call
    // time with the registry's discoverable error, not mid-job
    graft.ext.ExtractorRegistry.featureExtractor(extractor, args: _*)
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val f = graft.ext.ExtractorRegistry.featureExtractor(extractor, args: _*)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else f(bytes)))
      }
    }(enc)
  }

  /** REAL image features: per-channel intensity histogram over the decoded
    * pixels (`3 * bins` floats, L1-normalized per channel) — the classic
    * color-histogram descriptor; composes with the similarity operators.
    * Non-image payloads → null vector. Decodes pixels: budget partitions
    * accordingly (`maxPartitionBytes`) when payloads are large. */
  def imageHistogramFeatures(df: DataFrame, binCol: String, bins: Int = 8,
                             outCol: String = "features"): DataFrame = {
    require(bins > 0 && bins <= 256, s"bins must be in 1..256, got $bins")
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ histogramFeature(bytes, bins))
      }
    }(enc)
  }

  /** REAL resize: decode → scale (bilinear) → re-encode PNG. Undecodable
    * payloads → null output. Map-only; per-row output bounded by the target
    * dims, so a 100 TB corpus of mixed-size images emits uniform rows. */
  def resizeImages(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val outSchema = df.schema
      .add("resized", BinaryType).add("target_w", IntegerType).add("target_h", IntegerType)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val out = decodeImage(bytes).map { img =>
          val target = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = target.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(target, "png", bos)
          bos.toByteArray
        }.orNull
        Row.fromSeq(r.toSeq ++ Seq(out, w, h))
      }
    }(enc)
  }

  /** REAL multi-frame decode: ImageIO readers expose EVERY frame of a
    * multi-image container — an animated GIF's frames in particular (the
    * GIF reader ships with the JRE; TIFF pages too on JDK 9+). Every
    * `stride`-th frame is re-encoded as PNG. Frames are the raw per-frame
    * rasters as stored (GIF delta frames are NOT composited against
    * previous frames — fine for sampling/feature extraction; a player
    * would apply disposal methods). Empty for undecodable payloads.
    * Exposed for the `graft.frames` sampler-pack entry. */
  private[graft] def imageFrames(bytes: Array[Byte],
                                 stride: Int): Iterator[(Int, Array[Byte])] = {
    if (bytes == null || bytes.length == 0) return Iterator.empty
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    if (iis == null) return Iterator.empty
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Iterator.empty
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        // allowSearch: the GIF reader must scan the stream to count frames
        val n = reader.getNumImages(true)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
        var i = 0
        while (i < n) {
          if (i % stride == 0) {
            val bos = new ByteArrayOutputStream()
            ImageIO.write(reader.read(i), "png", bos)
            out += ((i, bos.toByteArray))
          }
          i += 1
        }
        out.iterator
      } finally reader.dispose()
    } catch {
      case _: Exception => Iterator.empty // truncated/corrupt container
    } finally iis.close()
  }

  /** Byte-chunk frame kernel — the fallback for payloads no JDK codec can
    * decode (raw video/audio). Exposed for the `graft.chunks` sampler-pack
    * entry: (original chunk index, chunk bytes) for every `stride`-th
    * chunk. For DECODABLE containers (animated GIF) prefer
    * [[imageFrames]] via the `graft.frames` entry, which is real. */
  private[graft] def chunkFrames(bytes: Array[Byte], frameSize: Int,
                                 stride: Int): Iterator[(Int, Array[Byte])] =
    if (bytes == null) Iterator.empty
    else bytes.grouped(frameSize).zipWithIndex.collect {
      case (chunk, idx) if idx % stride == 0 => (idx, chunk)
    }

  /** Frame sampling through the [[graft.ext.ExtractorRegistry]] SPI —
    * `sampler` names a pack entry (e.g. `"graft.chunks"`, or a third-party
    * `"mypack.ffmpeg_keyframes"`); same executor-side resolution as
    * [[extractFeaturesVia]]. One row fans out to (frame_idx, frame) rows. */
  def sampleFramesVia(df: DataFrame, binCol: String, sampler: String,
                      args: Seq[String] = Nil): DataFrame = {
    graft.ext.ExtractorRegistry.frameSampler(sampler, args: _*) // fail fast driver-side
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      val f = graft.ext.ExtractorRegistry.frameSampler(sampler, args: _*)
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else f(bytes).map { case (idx, frame) => Row.fromSeq(r.toSeq ++ Seq(idx, frame)) }
      }
    }(enc)
  }

  /** Byte-chunk frame fallback for payloads no JDK codec can decode: split
    * the payload into `frameSize` chunks, keep every `stride`-th. For real
    * multi-frame containers (animated GIF) use
    * `sampleFramesVia(df, col, "graft.frames")` instead. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int, stride: Int): DataFrame = {
    // fail at call time on the driver, not as an executor-side
    // ArithmeticException mid-scan
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    require(stride > 0, s"stride must be positive, got $stride")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        if (bytes == null) Iterator.empty
        else bytes.grouped(frameSize).zipWithIndex.collect {
          case (chunk, idx) if idx % stride == 0 => Row.fromSeq(r.toSeq ++ Seq(idx, chunk))
        }
      }
    }(enc)
  }

  /** Synthesize a binary test payload column from any string column
    * (documents.text stands in for undecoded media in this harness). */
  def asBinaryPayload(df: DataFrame, textCol: String, out: String = "payload"): DataFrame =
    df.withColumn(out, col(textCol).cast(BinaryType))

  /** Perceptual difference hash (dHash, 64-bit): decode → 9×8 grayscale
    * bilinear downscale → one bit per horizontal luminance gradient.
    * Survives re-encoding, resizing, and mild compression noise — the
    * standard cheap perceptual fingerprint for image-level near-dup
    * (Hamming distance ≲ 10 of 64 ≈ same picture). None for
    * undecodable payloads. */
  private[graft] def dHashOf(bytes: Array[Byte]): Option[Long] =
    decodeImage(bytes).map { img =>
      val target = new BufferedImage(9, 8, BufferedImage.TYPE_BYTE_GRAY)
      val g = target.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
      g.dispose()
      val raster = target.getRaster
      var bits = 0L
      var i = 0
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (raster.getSample(x + 1, y, 0) > raster.getSample(x, y, 0))
            bits |= (1L << i)
          i += 1; x += 1
        }
        y += 1
      }
      bits
    }

  /** Add the [[dHashOf]] perceptual hash as a long column (null for
    * undecodable payloads). Map-only pixel decode — the
    * [[imageHistogramFeatures]] partition-budget note applies. */
  def withDHash(df: DataFrame, binCol: String,
                outCol: String = "dhash"): DataFrame = {
    val outSchema = df.schema.add(outCol, LongType)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ dHashOf(bytes).map(Long.box).orNull)
      }
    }(enc)
  }

  /** Image-level near-duplicate pairs: [[withDHash]] then lossless
    * Hamming-banded blocking ([[graft.ops.Dedup.hammingPairs]]).
    * `maxDist` ≈ 10 finds re-encoded/resized copies; 0 is exact
    * perceptual identity. Undecodable payloads drop (no hash, no
    * pair). */
  def imageNearDups(df: DataFrame, idCol: String, binCol: String,
                    maxDist: Int = 10): DataFrame =
    Dedup.hammingPairs(
      withDHash(df.select(col(idCol), col(binCol)), binCol),
      idCol, "dhash", maxDist)

  // ------------------------------------------------------- audio (WAV)
  //
  // REAL decode via the JDK's javax.sound.sampled (WAV/AU/AIFF PCM — the
  // codecs that ship with the JRE, mirroring the ImageIO stance: no
  // external library, undecodable payloads → null, never a job failure).

  val audioMetaSchema: StructType = StructType.fromDDL(
    "sample_rate FLOAT, channels INT, bits INT, n_frames BIGINT, duration_s DOUBLE")

  private val nullAudioMeta = Row(null, null, null, null, null)

  /** Real audio header decode: sample rate / channels / bit depth /
    * frame count / duration. Header-only (the stream is opened, not
    * drained). */
  private[ops] def decodeAudioMeta(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length == 0) return nullAudioMeta
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val dur = if (frames >= 0 && f.getFrameRate > 0)
          frames.toDouble / f.getFrameRate else null
        Row(f.getSampleRate, f.getChannels, f.getSampleSizeInBits,
          if (frames >= 0) frames else null, dur)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => nullAudioMeta }
  }

  /** Add typed audio metadata (null struct fields for non-audio bytes) —
    * the [[withImageMeta]] counterpart for the audio column. */
  def withAudioMeta(df: DataFrame, binCol: String,
                    metaCol: String = "audio_meta"): DataFrame = {
    val outSchema = df.schema.add(metaCol, audioMetaSchema)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ decodeAudioMeta(bytes))
      }
    }(enc)
  }

  /** Real windowed audio features over decoded PCM: for each of
    * `windows` equal time slices of the (mono-mixed) signal, RMS energy
    * and zero-crossing rate — `2 * windows` floats, the classic cheap
    * audio descriptor (silence/speech/music triage, energy-profile
    * near-dup via the similarity operators). 16/8-bit PCM decode is
    * exact integer arithmetic; other encodings are converted by the JDK
    * where a converter exists, else null. Undecodable payloads → null. */
  private[graft] def audioFeature(bytes: Array[Byte], windows: Int): Seq[Float] = {
    if (bytes == null || bytes.length == 0) return null
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val f0 = raw.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f0.getSampleRate, 16, f0.getChannels,
        2 * f0.getChannels, f0.getSampleRate, false)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
      try {
        val all = in.readAllBytes()
        val ch = target.getChannels
        val n = all.length / (2 * ch)
        if (n == 0) return Seq.fill(2 * windows)(0f)
        // mono mix into [-1, 1]
        val mono = new Array[Double](n)
        var i = 0
        while (i < n) {
          var s = 0.0
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            s += ((all(off) & 0xff) | (all(off + 1) << 8)).toShort / 32768.0
            c += 1
          }
          mono(i) = s / ch
          i += 1
        }
        (0 until windows).flatMap { w =>
          val lo = (w.toLong * n / windows).toInt
          val hi = ((w + 1).toLong * n / windows).toInt.max(lo + 1).min(n)
          var sumSq = 0.0
          var zc = 0
          var j = lo
          while (j < hi) {
            sumSq += mono(j) * mono(j)
            if (j > lo && (mono(j) >= 0) != (mono(j - 1) >= 0)) zc += 1
            j += 1
          }
          val len = hi - lo
          Seq(math.sqrt(sumSq / len).toFloat,
            if (len > 1) zc.toFloat / (len - 1) else 0f)
        }
      } finally { in.close(); raw.close() }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** [[audioFeature]] as a column — output shape composes with the
    * similarity operators (`Array[Float]`, fixed length), exactly like
    * [[imageHistogramFeatures]] does for images. */
  def audioFeatures(df: DataFrame, binCol: String, windows: Int = 8,
                    outCol: String = "features"): DataFrame = {
    require(windows > 0, s"windows must be positive, got $windows")
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ audioFeature(bytes, windows))
      }
    }(enc)
  }

  /** Container-format sniffing from magic bytes — the first triage step
    * over an opaque media column (route to the right decoder, drop
    * mislabeled payloads) BEFORE any expensive decode. Pure Column
    * expression over `hex(substring(bin, 1, 12))`: map-only, codegen'd,
    * no UDF, no decode. Recognizes PNG, JPEG, GIF(87a/89a), RIFF/WAVE,
    * PDF; anything else (including payloads shorter than the magic) is
    * `"unknown"`; null stays null. */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h = hex(substring(bin, 1, 12)) // Spark hex() emits uppercase
    when(bin.isNull, lit(null).cast("string"))
      .when(h.startsWith("89504E470D0A1A0A"), lit("png"))
      .when(h.startsWith("FFD8FF"), lit("jpeg"))
      .when(h.startsWith("474946383761") || h.startsWith("474946383961"), lit("gif"))
      .when(h.startsWith("52494646") && substring(h, 17, 8) === "57415645", lit("wav"))
      .when(h.startsWith("255044462D"), lit("pdf"))
      .otherwise(lit("unknown"))
  }

  /** Image dimensions parsed from the HEADER BYTES alone — pure Column
    * byte arithmetic over fixed-offset fields (PNG IHDR big-endian,
    * GIF87a/89a logical-screen little-endian, BMP DIB little-endian
    * int32), NO decode: the 100 TB triage path reads tens of bytes per
    * payload where [[withImageMeta]] decodes megapixels ("drop
    * thumbnails below 64×64" should never decode the keepers). JPEG
    * needs a marker scan (variable offsets) and reports null here —
    * route jpegs through the decode path. BMP's signed height (top-down
    * DIB) converts to its magnitude-less raw signed value. Returns a
    * struct `(format, width, height)`; unknown/short/null payloads →
    * null struct. */
  def imageDimsFromHeader(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def b(pos: Int) = conv(hex(substring(bin, pos, 1)), 16, 10).cast("long")
    def be4(pos: Int) = conv(hex(substring(bin, pos, 4)), 16, 10).cast("long")
    def le2(pos: Int) = b(pos) + b(pos + 1) * 256L
    def le4(pos: Int) = b(pos) + b(pos + 1) * 256L +
      b(pos + 2) * 65536L + b(pos + 3) * 16777216L
    val h = hex(substring(bin, 1, 8))
    // BMP height is a SIGNED int32 (negative = top-down row order)
    val bmpH = {
      val raw = le4(23)
      when(raw >= 2147483648L, raw - 4294967296L).otherwise(raw)
    }
    def out(f: String, w: org.apache.spark.sql.Column,
            ht: org.apache.spark.sql.Column) =
      struct(lit(f).as("format"), w.as("width"), ht.as("height"))
    when(h === "89504E470D0A1A0A" &&
        hex(substring(bin, 13, 4)) === "49484452",
        out("png", be4(17), be4(21)))
      .when(hex(substring(bin, 1, 6)) === "474946383761" ||
        hex(substring(bin, 1, 6)) === "474946383961",
        out("gif", le2(7), le2(9)))
      .when(hex(substring(bin, 1, 2)) === "424D",
        out("bmp", le4(19), bmpH))
  }
}
