package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.ScalarFilter

/** ISO-code validators — the Spark analog of the reference's `filters-iso`
  * extension package (SURVEY.md §2.5: extension registry entry points
  * `filters.ext.Country` / `Currency` / `Locale`). Code sets come from the
  * JDK's own ISO tables (`java.util.Locale` / `java.util.Currency`) and are
  * inlined as literal sets in the expression tree — map-only membership
  * checks, no lookup table to broadcast or join.
  */
object Iso {
  val countryCodes: Seq[String] =
    java.util.Locale.getISOCountries.toSeq.sorted
  val languageCodes: Seq[String] =
    java.util.Locale.getISOLanguages.toSeq.sorted
  val currencyCodes: Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.util.Currency.getAvailableCurrencies.asScala.map(_.getCurrencyCode).toSeq.sorted
  }
}

/** ISO-3166 alpha-2 country code; cleaned to uppercase canonical form.
  * Reference: `filters-iso` extension `Country`. */
case class Country() extends ScalarFilter {
  val name = "Country"
  val code = "invalid_country"
  override protected def defaultMessage = "This value is not an ISO 3166-1 country code."
  override protected def invalid(v: Column) = !upper(v).isin(Iso.countryCodes: _*)
  override protected def clean(v: Column) = upper(v)
}

/** ISO-639-1 language code; cleaned to lowercase canonical form.
  * Reference: `filters-iso` extension `Locale` (language part). */
case class Language() extends ScalarFilter {
  val name = "Language"
  val code = "invalid_language"
  override protected def defaultMessage = "This value is not an ISO 639-1 language code."
  override protected def invalid(v: Column) = !lower(v).isin(Iso.languageCodes: _*)
  override protected def clean(v: Column) = lower(v)
}

/** ISO-4217 currency code; cleaned to uppercase canonical form.
  * Reference: `filters-iso` extension `Currency`. */
case class Currency() extends ScalarFilter {
  val name = "Currency"
  val code = "invalid_currency"
  override protected def defaultMessage = "This value is not an ISO 4217 currency code."
  override protected def invalid(v: Column) = !upper(v).isin(Iso.currencyCodes: _*)
  override protected def clean(v: Column) = upper(v)
}

/** BCP-47 locale tag (`en`, `en-US`, `zh-Hant-TW`): language must be a
  * real ISO-639 code and, when a region subtag is present, it must be a
  * real ISO-3166 code. Cleaned to the canonical `ll-RR` casing.
  * Reference: `filters-iso` extension `Locale`. */
case class LocaleTag() extends ScalarFilter {
  val name = "LocaleTag"
  val code = "invalid_locale"
  override protected def defaultMessage = "This value is not a valid locale tag."
  private def parts(v: Column) = split(regexp_replace(v, "_", "-"), "-")
  override protected def invalid(v: Column) = {
    val p = parts(v)
    val lang = lower(p.getItem(0))
    // region subtag is the first 2-letter ALL-ALPHA part after the language
    val region = upper(try_element_at(filter(slice(p, 2, 10),
      x => x.rlike("^[A-Za-z]{2}$")), lit(1)))
    !lang.isin(Iso.languageCodes: _*) ||
      (region.isNotNull && !region.isin(Iso.countryCodes: _*))
  }
  override protected def clean(v: Column) = {
    val p = parts(v)
    concat_ws("-",
      (lower(p.getItem(0)) +:
        Seq(transform(slice(p, 2, 100), x =>
          when(x.rlike("^[A-Za-z]{2}$"), upper(x))
            .when(x.rlike("^[A-Za-z]{4}$"), initcap(lower(x)))
            .otherwise(lower(x))))): _*)
  }
}
