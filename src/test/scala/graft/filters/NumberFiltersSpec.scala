package graft.filters

import graft.SparkSuite
import graft.{filters => F}

/** Vectors mirror the reference's `test/number_test.py` style (SURVEY.md §5). */
class NumberFiltersSpec extends SparkSuite {

  test("Int coerces whole numbers, rejects fractions and non-numeric") {
    assertPasses(F.Int(), "STRING", "42", 42L)
    assertPasses(F.Int(), "STRING", "42.0", 42L)
    assertErrors(F.Int(), "STRING", "42.5", Seq("not_int"))
    assertErrors(F.Int(), "STRING", "abc", Seq("not_int"))
    assertErrors(F.Int(), "STRING", "NaN", Seq("not_int"))
    assertErrors(F.Int(), "STRING", "Infinity", Seq("not_int"))
    assertPasses(F.Int(), "STRING", null, null)
    assertPasses(F.Int(), "DOUBLE", 7.0d, 7L)
    assertErrors(F.Int(), "DOUBLE", 7.5d, Seq("not_int"))
  }

  test("Decimal pins precision/scale, rejects non-finite") {
    assertPasses(F.Decimal(12, 2), "STRING", "123.456", new java.math.BigDecimal("123.46"))
    assertErrors(F.Decimal(12, 2), "STRING", "xyz", Seq("not_numeric"))
    assertErrors(F.Decimal(12, 2), "DOUBLE", Double.NaN, Seq("not_numeric"))
    assertErrors(F.Decimal(12, 2), "DOUBLE", Double.PositiveInfinity, Seq("not_numeric"))
  }

  test("Min/Max inclusive and exclusive bounds") {
    assertPasses(F.Min(5), "INT", 5, 5)
    assertErrors(F.Min(5), "INT", 4, Seq("too_small"))
    assertErrors(F.Min(5, exclusive = true), "INT", 5, Seq("too_small"))
    assertPasses(F.Max(5), "INT", 5, 5)
    assertErrors(F.Max(5), "INT", 6, Seq("too_big"))
    assertErrors(F.Max(5, exclusive = true), "INT", 5, Seq("too_big"))
    assertPasses(F.Min(5), "INT", null, null)
  }

  test("Round half-up to scale and to nearest multiple") {
    assertPasses(F.Round(), "DOUBLE", 2.5d, 3.0d)
    assertPasses(F.Round(1), "DOUBLE", 2.34d, 2.3d)
    assertPasses(F.Round(toNearest = Some(0.25)), "DOUBLE", 0.30d, 0.25d)
  }

  test("Round halfEven (banker's) rounds .5 to the even neighbor") {
    assertPasses(F.Round(halfEven = true), "DOUBLE", 2.5d, 2.0d)
    assertPasses(F.Round(halfEven = true), "DOUBLE", 3.5d, 4.0d)
    assertPasses(F.Round(1, halfEven = true), "DOUBLE", 2.25d, 2.2d)
  }

  test("canonical chain: Required | Int | Min | Max") {
    val chain = F.Required(Emptiness.never) | F.Int() | F.Min(1) | F.Max(50)
    assertPasses(chain, "STRING", "25", 25L)
    assertErrors(chain, "STRING", null, Seq("empty"))
    assertErrors(chain, "STRING", "0", Seq("too_small"))
    assertErrors(chain, "STRING", "51", Seq("too_big"))
    assertErrors(chain, "STRING", "x", Seq("not_int"))
  }
}
