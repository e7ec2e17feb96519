package graft.filters

import graft.SparkSuite
import graft.{filters => F}

/** ISO-code validators (the `filters-iso` extension surface): membership
  * against the JDK's own ISO tables + canonical-casing cleanup. */
class IsoFiltersSpec extends SparkSuite {

  test("Country: ISO-3166 alpha-2, uppercased; rejects non-codes") {
    assertPasses(F.Country(), "STRING", "us", "US")
    assertPasses(F.Country(), "STRING", "DE", "DE")
    assertPasses(F.Country(), "STRING", null, null)
    assertErrors(F.Country(), "STRING", "USA", Seq("invalid_country"))
    assertErrors(F.Country(), "STRING", "ZZ", Seq("invalid_country"))
  }

  test("Language: ISO-639-1, lowercased") {
    assertPasses(F.Language(), "STRING", "EN", "en")
    assertPasses(F.Language(), "STRING", "zh", "zh")
    assertErrors(F.Language(), "STRING", "english", Seq("invalid_language"))
  }

  test("Currency: ISO-4217, uppercased") {
    assertPasses(F.Currency(), "STRING", "usd", "USD")
    assertPasses(F.Currency(), "STRING", "EUR", "EUR")
    assertErrors(F.Currency(), "STRING", "DOLLARS", Seq("invalid_currency"))
  }

  test("LocaleTag: canonical ll-Ssss-RR casing; validates language+region") {
    assertPasses(F.LocaleTag(), "STRING", "en", "en")
    assertPasses(F.LocaleTag(), "STRING", "EN-us", "en-US")
    assertPasses(F.LocaleTag(), "STRING", "zh-hant-tw", "zh-Hant-TW")
    assertPasses(F.LocaleTag(), "STRING", "en_US", "en-US") // underscore form
    assertErrors(F.LocaleTag(), "STRING", "xx-US", Seq("invalid_locale"))
    assertErrors(F.LocaleTag(), "STRING", "en-ZZ", Seq("invalid_locale"))
    assertPasses(F.LocaleTag(), "STRING", null, null)
  }
}
