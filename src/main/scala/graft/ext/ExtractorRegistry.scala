package graft.ext

import java.util.ServiceLoader
import scala.jdk.CollectionConverters._

/** SPI for multimodal feature/frame extractor packs — the integration
  * point the two JDK-capability stubs in [[graft.ops.Multimodal]] plug
  * into. The JDK ships no learned-embedding model and no video codec, so
  * the engine keeps honest stand-ins (`graft.hash`, `graft.chunks`); a
  * deployment with a real model registers its own pack jar
  * (`META-INF/services/graft.ext.ExtractorProvider`) and the SAME
  * pipeline code runs it — mirroring [[ValidatorProvider]], which
  * re-expresses the reference's setuptools entry-point registry
  * (`filters/extensions/__init__.py::FilterExtensionRegistry`).
  *
  * Extractor functions resolve BY NAME per JVM (lazy object init), so a
  * model-backed pack loads its weights once per executor and nothing
  * model-sized ever serializes through the driver.
  */
trait ExtractorProvider {
  /** Pack namespace; entries resolve as `"<namespace>.<name>"`. */
  def namespace: String

  /** Binary payload → fixed-width float feature vector factories by name.
    * Args are string-typed (like SQL literals). Extractors may return
    * null for undecodable payloads; they never see null input (the
    * engine short-circuits null rows). */
  def featureExtractors: Map[String, Seq[String] => Array[Byte] => Seq[Float]] = Map.empty

  /** Binary payload → sampled (frame_idx, frame) factories by name. */
  def frameSamplers: Map[String, Seq[String] => Array[Byte] => Iterator[(Int, Array[Byte])]] =
    Map.empty
}

/** Classpath-discovered extractor registry ([[FilterRegistry]] twin). */
object ExtractorRegistry {
  // last provider wins on a namespace collision, matching FilterRegistry.
  // Resolution prefers the thread CONTEXT classloader: this registry is the
  // first to resolve on EXECUTORS (inside extractFeaturesVia/sampleFramesVia
  // tasks), where pack jars shipped via --jars live in the task context
  // loader (MutableURLClassLoader) — the defining loader alone would miss
  // them whenever the engine jar sits on the executor system classpath.
  // The context loader delegates to its parents, so the engine's own pack
  // is always found too; a null context (bare JVM) falls back.
  private lazy val loaded: Map[String, ExtractorProvider] = {
    val cl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    ServiceLoader.load(classOf[ExtractorProvider], cl)
      .asScala.map(p => p.namespace -> p).toMap
  }

  /** All discovered packs by namespace. */
  def providers: Map[String, ExtractorProvider] = loaded

  /** Every constructible entry, namespace-qualified and sorted. */
  def names: Seq[String] = loaded.flatMap { case (ns, p) =>
    p.featureExtractors.keys.map(ns + "." + _) ++ p.frameSamplers.keys.map(ns + "." + _)
  }.toSeq.sorted

  private def resolve[T](fqName: String, kind: String,
                         table: ExtractorProvider => Map[String, T]): T = {
    val i = fqName.lastIndexOf('.')
    require(i > 0 && i < fqName.length - 1,
      s"extractor name must be namespace-qualified ('ns.name'), got '$fqName'")
    val (ns, n) = (fqName.substring(0, i), fqName.substring(i + 1))
    val pack = loaded.getOrElse(ns, throw new NoSuchElementException(
      s"no extractor pack '$ns' on the classpath; packs: " +
        loaded.keys.toSeq.sorted.mkString("[", ", ", "]")))
    table(pack).getOrElse(n, throw new NoSuchElementException(
      s"pack '$ns' has no $kind '$n'; it provides: " +
        table(pack).keys.toSeq.sorted.mkString("[", ", ", "]")))
  }

  /** Construct a feature extractor by qualified name, e.g.
    * `ExtractorRegistry.featureExtractor("graft.histogram", "8")`. */
  def featureExtractor(fqName: String, args: String*): Array[Byte] => Seq[Float] =
    resolve(fqName, "feature extractor", _.featureExtractors)(args)

  /** Construct a frame sampler by qualified name. */
  def frameSampler(fqName: String, args: String*): Array[Byte] => Iterator[(Int, Array[Byte])] =
    resolve(fqName, "frame sampler", _.frameSamplers)(args)
}

/** The engine's own pack, self-registered through the SAME SPI a
  * third-party model pack would use (see `src/main/resources/META-INF/
  * services/`): `histogram` (ImageIO color-histogram descriptor),
  * `rp_image` (seeded random-projection features over decoded pixels —
  * the weights derive deterministically from the seed, loaded once per
  * factory exactly like a real model's) and `frames` (ImageIO
  * multi-frame decode — animated GIF frames) are REAL; `hash`/`chunks`
  * are byte-level fallbacks for payloads no JDK codec can decode. */
final class GraftExtractorProvider extends ExtractorProvider {
  val namespace = "graft"
  // factories validate numeric args HERE, at driver-side construction —
  // the whole point of the fail-fast resolve is that a bad name OR a bad
  // arg surfaces before any task launches, not as a per-row
  // Arithmetic/IllegalArgumentException mid-job on the executors
  override val featureExtractors: Map[String, Seq[String] => Array[Byte] => Seq[Float]] = Map(
    "histogram" -> (args => {
      val bins = args.headOption.map(_.toInt).getOrElse(8)
      require(bins > 0, s"histogram bins must be positive, got $bins")
      bytes => graft.ops.Multimodal.histogramFeature(bytes, bins)
    }),
    "rp_image" -> (args => {
      val dims = args.headOption.map(_.toInt).getOrElse(64)
      val seed = args.lift(1).map(_.toLong).getOrElse(42L)
      val bins = args.lift(2).map(_.toInt).getOrElse(16)
      require(dims > 0, s"rp_image dims must be positive, got $dims")
      require(bins > 0 && bins <= 256, s"rp_image bins must be in 1..256, got $bins")
      // the "model load": weights built once per factory (per executor
      // partition), deterministically from the seed — never serialized
      val w = graft.ops.Multimodal.rpWeights(3 * bins, dims, seed)
      bytes => graft.ops.Multimodal.rpFeature(bytes, bins, w)
    }),
    "hash" -> (args => {
      val dims = args.headOption.map(_.toInt).getOrElse(64)
      require(dims > 0, s"hash dims must be positive, got $dims")
      bytes => graft.ops.Multimodal.hashFeature(bytes, dims)
    }))
  override val frameSamplers: Map[String, Seq[String] => Array[Byte] => Iterator[(Int, Array[Byte])]] =
    Map("frames" -> (args => {
      val stride = args.headOption.map(_.toInt).getOrElse(1)
      require(stride > 0, s"frame stride must be positive, got $stride")
      bytes => graft.ops.Multimodal.imageFrames(bytes, stride)
    }),
    "chunks" -> (args => {
      val (size, stride) = (args.headOption.map(_.toInt).getOrElse(4096),
        args.lift(1).map(_.toInt).getOrElse(1))
      require(size > 0, s"chunk size must be positive, got $size")
      require(stride > 0, s"chunk stride must be positive, got $stride")
      bytes => graft.ops.Multimodal.chunkFrames(bytes, size, stride)
    }))
}
