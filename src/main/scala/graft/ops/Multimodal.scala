package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (BASELINE.json mandate, SURVEY.md §2.6): image/audio/
  * video as opaque `binary` columns + typed metadata structs.
  *
  * The Spark-side plumbing — schema, partition sizing, per-partition batch
  * decode shape — is real and tested. The actual media DECODE step is a
  * clearly-marked deterministic STUB (`fakeDecode*`): this container ships
  * no image/audio codecs, so the stub derives plausible metadata from the
  * byte content. Swap `fakeDecodeImage` for a real codec (e.g. TwelveMonkeys
  * ImageIO) without touching any of the distribution logic.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType.fromDDL(
    "width INT, height INT, channels INT, format STRING")

  /** STUB decode: deterministic metadata from the payload bytes. A real
    * implementation decodes the header; the plumbing (batch iteration,
    * output schema, null handling) is identical. */
  private[ops] def fakeDecodeImage(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length == 0) return Row(null, null, null, null)
    var h = 1125899906842597L
    var i = 0
    while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + (math.abs(h) % 512).toInt
    val ht = 64 + (math.abs(h >> 16) % 512).toInt
    Row(w, ht, 3, "stub/raw")
  }

  /** Attach decoded metadata to a binary column via per-partition batch
    * decode (`mapPartitions` — the JVM analog of a vectorized decode UDF:
    * one decoder init per partition, streamed rows, no driver collect). */
  def withImageMeta(df: DataFrame, binCol: String, metaCol: String = "image_meta"): DataFrame = {
    val outSchema = df.schema.add(metaCol, imageMetaSchema)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec); stub needs none
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ (if (bytes == null) null else fakeDecodeImage(bytes)))
      }
    }(enc)
  }

  /** Feature-extraction stub: binary payload → fixed-width float embedding
    * (deterministic hash-derived features; a real extractor plugs in a
    * model here). Output shape matches the `embeddings` table so the
    * similarity operators compose directly. */
  def extractFeatures(df: DataFrame, binCol: String, dims: Int = 64,
                      outCol: String = "features"): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val feats = if (bytes == null) null else {
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
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** "Resize" stub: emits a downsampled payload (here: truncated bytes) +
    * target dims — models the shape of a distributed media transform:
    * map-only, bounded output size per row. */
  def resizeImages(df: DataFrame, binCol: String, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val outSchema = df.schema
      .add("resized", BinaryType).add("target_w", IntegerType).add("target_h", IntegerType)
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    // Long math: 30000x30000x3 overflows Int to a negative budget, which
    // would silently truncate every payload to 1 byte
    val budget = math.min(w.toLong * h * 3 / 64, scala.Int.MaxValue).toInt
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val out = if (bytes == null) null else bytes.take(math.max(budget, 1))
        Row.fromSeq(r.toSeq ++ Seq(out, w, h))
      }
    }(enc)
  }

  /** Frame sampling stub for video-ish payloads: split the payload into
    * `frameSize` chunks, keep every `stride`-th — exercises the
    * one-row→many-rows (flatMap) shape with bounded memory. */
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
}
