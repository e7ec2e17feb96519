package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.ScalarFilter

/** Web-framework validators — the Spark analog of the reference
  * ecosystem's second production extension package (`filters-django`,
  * alongside `filters-iso`; reference registry
  * `filters/extensions/__init__.py::FilterExtensionRegistry`). The
  * semantics mirror the framework's PUBLIC, documented validators
  * (`validate_slug`, `slugify`, `URLValidator` — all textbook string
  * rules), re-expressed as pure Column trees: map-only, codegen'd,
  * zero shuffle, like every other filter here.
  */
object Django {
  /** `validate_slug`: ASCII letters, digits, hyphens, underscores. */
  private[filters] val slugPattern = "^[-a-zA-Z0-9_]+$"

  /** Simplified `URLValidator`: scheme://authority/rest, no whitespace.
    * The framework's full rule (IDN hosts, IPv6 literals, port ranges)
    * is a far longer regex; this covers the documented common case and
    * rejects the same malformed shapes the reference tests use. */
  private[filters] val urlPattern =
    "^(https?|ftp)://[^\\s/$.?#][^\\s]*$"
}

/** Slug VALIDATION (`django.core.validators.validate_slug`): the value
  * must already be a slug — ASCII letters/digits/hyphens/underscores
  * only. Pure check, no cleaning. */
case class Slug() extends ScalarFilter {
  val name = "Slug"
  val code = "invalid_slug"
  override protected def defaultMessage =
    "This value is not a valid slug (letters, numbers, hyphens, underscores)."
  override protected def invalid(v: Column) = !v.rlike(Django.slugPattern)
}

/** Slugification (`django.utils.text.slugify`, ASCII mode): lowercase,
  * drop everything but word chars / whitespace / hyphens, collapse
  * whitespace-and-hyphen runs to single hyphens, trim leading/trailing
  * hyphens and underscores. A pure TRANSFORM — it never rejects (the
  * framework's slugify maps any string, possibly to ""). Guard with
  * `NotEmpty` downstream when an empty slug is an error. */
case class Slugify() extends ScalarFilter {
  val name = "Slugify"
  val code = "unslugifiable" // never emitted: invalid() is never
  override protected def clean(v: Column) =
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(trim(v)), "[^\\w\\s-]", ""),
        "[-\\s]+", "-"),
      "^[-_]+|[-_]+$", "")
}

/** URL validation (`django.core.validators.URLValidator`, common case):
  * http/https/ftp scheme, a non-empty authority, no whitespace. Cleaned
  * to its trimmed form. */
case class Url() extends ScalarFilter {
  val name = "Url"
  val code = "invalid_url"
  override protected def defaultMessage = "This value is not a valid URL."
  override protected def invalid(v: Column) = !trim(v).rlike(Django.urlPattern)
  override protected def clean(v: Column) = trim(v)
}
