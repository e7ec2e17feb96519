package graft.ext

import graft.SparkSuite
import graft.core.Validator
import graft.{filters => F}

/** A simulated third-party pack: registered ONLY through the test
  * classpath's META-INF/services entry, exactly like an external jar. */
final class TestPackProvider extends ValidatorProvider {
  val namespace = "testpack"
  val validators: Map[String, Seq[String] => Validator] = Map(
    "shouty" -> (_ => F.Regex("^[A-Z ]+$")),
    // an arg-taking factory: min length parsed from the string args
    "at_least" -> (args => F.MinLength(args.head.toInt)))
}

/** ServiceLoader discovery (`filters.ext` parity): the library's own iso
  * pack and a foreign test pack both resolve by qualified name. */
class FilterRegistrySpec extends SparkSuite {

  test("discovers the built-in iso pack through META-INF/services") {
    assert(FilterRegistry.providers.contains("iso"))
    assert(FilterRegistry.names.contains("iso.country"))
    assertPasses(FilterRegistry("iso.country"), "STRING", "us", "US")
    assertErrors(FilterRegistry("iso.country"), "STRING", "XX", Seq("invalid_country"))
  }

  test("discovers a third-party pack from another classpath entry") {
    assert(FilterRegistry.providers.contains("testpack"))
    assertPasses(FilterRegistry("testpack.shouty"), "STRING", "LOUD", Seq("LOUD"))
    assertErrors(FilterRegistry("testpack.at_least", "5"), "STRING", "abc", Seq("too_short"))
    assertPasses(FilterRegistry("testpack.at_least", "2"), "STRING", "abc", "abc")
  }

  test("registry validators chain with core filters like any other") {
    val chain = F.Strip() | FilterRegistry("iso.currency")
    assertPasses(chain, "STRING", "  usd  ", "USD")
  }

  test("unknown pack and unknown name fail with a discoverable error") {
    val e1 = intercept[NoSuchElementException](FilterRegistry("nope.thing"))
    assert(e1.getMessage.contains("iso"), "error must list available packs")
    val e2 = intercept[NoSuchElementException](FilterRegistry("iso.nope"))
    assert(e2.getMessage.contains("country"), "error must list the pack's validators")
    intercept[IllegalArgumentException](FilterRegistry("unqualified"))
  }
}
