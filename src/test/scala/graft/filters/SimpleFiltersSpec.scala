package graft.filters

import graft.SparkSuite
import graft.{filters => F}

/** Vectors mirror the reference's `test/simple_test.py` style (SURVEY.md §5):
  * happy path, None passthrough, empty values, boundaries. */
class SimpleFiltersSpec extends SparkSuite {

  test("Required rejects null and empty, passes values") {
    assertErrors(F.Required(), "STRING", null, Seq("empty"))
    assertErrors(F.Required(), "STRING", "", Seq("empty"))
    assertPasses(F.Required(), "STRING", "x", "x")
    assertPasses(F.Required(), "STRING", "  ", "  ") // whitespace is NOT empty
  }

  test("NotEmpty rejects empty but passes null (allow_none default)") {
    assertPasses(F.NotEmpty(), "STRING", null, null)
    assertErrors(F.NotEmpty(), "STRING", "", Seq("empty"))
    assertPasses(F.NotEmpty(), "STRING", "x", "x")
  }

  test("Empty requires len==0; null passes") {
    assertPasses(F.Empty(), "STRING", "", "")
    assertPasses(F.Empty(), "STRING", null, null)
    assertErrors(F.Empty(), "STRING", "x", Seq("not_empty"))
  }

  test("Optional substitutes default for null/empty") {
    assertPasses(F.Optional("dflt"), "STRING", null, "dflt")
    assertPasses(F.Optional("dflt"), "STRING", "", "dflt")
    assertPasses(F.Optional("dflt"), "STRING", "x", "x")
  }

  test("NoOp is identity incl. null passthrough") {
    assertPasses(F.NoOp(), "STRING", "x", "x")
    assertPasses(F.NoOp(), "STRING", null, null)
  }

  test("Choice membership") {
    assertPasses(F.Choice(Seq("a", "b")), "STRING", "a", "a")
    assertErrors(F.Choice(Seq("a", "b")), "STRING", "c", Seq("not_valid_choice"))
    assertPasses(F.Choice(Seq("a", "b")), "STRING", null, null)
    assertPasses(F.Choice(Seq("A", "B"), caseSensitive = false), "STRING", "a", "a")
  }

  test("Min/MaxLength boundaries") {
    assertPasses(F.MinLength(3), "STRING", "abc", "abc")
    assertErrors(F.MinLength(3), "STRING", "ab", Seq("too_short"))
    assertPasses(F.MaxLength(3), "STRING", "abc", "abc")
    assertErrors(F.MaxLength(3), "STRING", "abcd", Seq("too_long"))
  }

  test("Length exact (chain gives distinct codes)") {
    assertPasses(F.Length(2), "STRING", "ab", "ab")
    assertErrors(F.Length(2), "STRING", "a", Seq("too_short"))
    assertErrors(F.Length(2), "STRING", "abc", Seq("too_long"))
  }

  test("chain short-circuits: only first error reported") {
    // Required fails → MinLength never reports
    assertErrors(F.Required() | F.MinLength(5), "STRING", "", Seq("empty"))
    // Required passes → MinLength reports
    assertErrors(F.Required() | F.MinLength(5), "STRING", "abc", Seq("too_short"))
  }

  test("Type checks castability without coercing") {
    assertPasses(F.Type(org.apache.spark.sql.types.LongType), "STRING", "42", "42")
    assertErrors(F.Type(org.apache.spark.sql.types.LongType), "STRING", "xyz", Seq("wrong_type"))
  }
}
