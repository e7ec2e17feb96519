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
    assertErrors(F.LocaleTag(), "STRING", "not a locale", Seq("invalid_locale"))
    assertPasses(F.LocaleTag(), "STRING", null, null)
  }

  test("LocaleTag: 3-letter languages, numeric regions, extension subtags") {
    // 3-letter primary subtags (no ISO-639-1 equivalent) are accepted
    assertPasses(F.LocaleTag(), "STRING", "fil-ph", "fil-PH")
    assertPasses(F.LocaleTag(), "STRING", "yue-HK", "yue-HK")
    // UN M49 numeric region
    assertPasses(F.LocaleTag(), "STRING", "es-419", "es-419")
    // extension subtags are NOT misread as regions, and keep lowercase
    assertPasses(F.LocaleTag(), "STRING", "en-u-fw-mon", "en-u-fw-mon")
    assertPasses(F.LocaleTag(), "STRING", "JA-JP-u-ca-japanese", "ja-JP-u-ca-japanese")
    // region inside an extension-bearing tag still validated positionally
    assertErrors(F.LocaleTag(), "STRING", "en-ZZ-u-fw-mon", Seq("invalid_locale"))
  }
}
