package graft.ext

import java.util.ServiceLoader
import scala.jdk.CollectionConverters._
import graft.core.Validator

/** SPI for third-party validator packs — the Spark-side re-expression of
  * the reference's setuptools entry-point registry
  * (`filters/extensions/__init__.py::FilterExtensionRegistry`, where
  * installed packages surface as `filters.ext.<Name>`). The JVM's
  * entry-point mechanism is `java.util.ServiceLoader`: a pack jar ships
  * `META-INF/services/graft.ext.ValidatorProvider` naming its provider
  * class, and its validators become constructible by
  * `"<namespace>.<name>"` with no code change here.
  */
trait ValidatorProvider {
  /** Pack namespace; validators resolve as `"<namespace>.<name>"`. */
  def namespace: String

  /** Factories by simple name. Args are string-typed (like SQL literals);
    * zero-arg validators ignore them. */
  def validators: Map[String, Seq[String] => Validator]
}

/** Classpath-discovered validator registry (`filters.ext` parity). Lazy,
  * like the reference registry: providers instantiate on first lookup, and
  * a broken pack fails at USE time with a named error, not at JVM start. */
object FilterRegistry {
  // last provider wins on a namespace collision, matching the reference's
  // "most recently installed distribution" entry-point behavior. Context
  // classloader first (same reasoning as [[ExtractorRegistry]]): pack jars
  // shipped via --jars live in Spark's task/session context loader, which
  // the defining loader can't see when the engine jar is on the system
  // classpath; the context chain still delegates up to the engine's own
  // resources.
  private lazy val loaded: Map[String, ValidatorProvider] = {
    val cl = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(getClass.getClassLoader)
    ServiceLoader.load(classOf[ValidatorProvider], cl)
      .asScala.map(p => p.namespace -> p).toMap
  }

  /** All discovered packs by namespace. */
  def providers: Map[String, ValidatorProvider] = loaded

  /** Every constructible name, namespace-qualified and sorted. */
  def names: Seq[String] =
    loaded.flatMap { case (ns, p) => p.validators.keys.map(ns + "." + _) }.toSeq.sorted

  /** Construct a validator by qualified name, e.g.
    * `FilterRegistry("iso.country")`. Unknown pack/name errors list what IS
    * available — the reference registry's discoverability contract. */
  def apply(fqName: String, args: String*): Validator = {
    val i = fqName.lastIndexOf('.')
    require(i > 0 && i < fqName.length - 1,
      s"validator name must be namespace-qualified ('ns.name'), got '$fqName'")
    val (ns, n) = (fqName.substring(0, i), fqName.substring(i + 1))
    val pack = loaded.getOrElse(ns, throw new NoSuchElementException(
      s"no validator pack '$ns' on the classpath; packs: " +
        loaded.keys.toSeq.sorted.mkString("[", ", ", "]")))
    val factory = pack.validators.getOrElse(n, throw new NoSuchElementException(
      s"pack '$ns' has no validator '$n'; it provides: " +
        pack.validators.keys.toSeq.sorted.mkString("[", ", ", "]")))
    factory(args)
  }
}

/** The `filters-iso` pack, self-registered through the SAME SPI a third
  * party would use (see `src/main/resources/META-INF/services/`) — so the
  * library's own extension exercises the discovery path end-to-end. */
final class IsoProvider extends ValidatorProvider {
  val namespace = "iso"
  val validators: Map[String, Seq[String] => Validator] = Map(
    "country"  -> (_ => graft.filters.Country()),
    "language" -> (_ => graft.filters.Language()),
    "currency" -> (_ => graft.filters.Currency()),
    "locale"   -> (_ => graft.filters.LocaleTag()))
}

/** The `filters-django` pack (the reference ecosystem's OTHER production
  * extension), through the same SPI — a second independent pack proves
  * the registry handles multiple coexisting namespaces in one JVM. */
final class DjangoProvider extends ValidatorProvider {
  val namespace = "django"
  val validators: Map[String, Seq[String] => Validator] = Map(
    "slug"    -> (_ => graft.filters.Slug()),
    "slugify" -> (_ => graft.filters.Slugify()),
    "url"     -> (_ => graft.filters.Url()))
}
