package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  private def recs = Seq(
    // cluster {1, 2}: "acme corp" vs typo'd dup, complementary attrs
    (1L, "Acme Corp", Some("NY"), Option.empty[String], Some(10.0)),
    (2L, "acme  corpx", None, Some("555"), None),
    // cluster {3, 4}: the DUP is more complete → canonical key flips to it
    (3L, "Beta LLC", None, None, Some(1.0)),
    (4L, "beta llcs", Some("CA"), Some("777"), None),
    // singleton, far from everything
    (5L, "Gamma Industries", Some("TX"), None, None))
    .toDF("rid", "name", "state", "phone", "bal")

  private def resolved = EntityResolution.resolve(
      recs, "rid", "name", Seq("state", "phone", "bal"), maxDist = 1)
    .collect().map(r => r.getLong(0) -> r).toMap

  test("clusters merge transitively; singletons pass through") {
    val m = resolved
    assert(m.keySet == Set(1L, 3L, 5L))
    assert(m(1L).getLong(1) == 2 && m(3L).getLong(1) == 2 && m(5L).getLong(1) == 1)
  }

  test("survivorship is attribute-level from the most complete member") {
    val m = resolved
    // entity 1: record 1 (2 attrs) beats record 2 (1 attr) for shared
    // picks, but phone exists ONLY on record 2
    assert(m(1L).getString(2) == "Acme Corp")
    assert(m(1L).getString(3) == "NY" && m(1L).getString(4) == "555")
    assert(m(1L).getDouble(5) == 10.0)
    // entity 3: record 4 (2 attrs) beats record 3 (1 attr) — canonical
    // key comes from the DUP; bal still survives from record 3
    assert(m(3L).getString(2) == "beta llcs")
    assert(m(3L).getString(3) == "CA" && m(3L).getString(4) == "777")
    assert(m(3L).getDouble(5) == 1.0)
  }

  test("attribute nobody has stays null; singleton keeps its raw key") {
    val m = resolved
    assert(m(5L).getString(2) == "Gamma Industries")
    assert(m(5L).getString(3) == "TX" && m(5L).isNullAt(4) && m(5L).isNullAt(5))
  }

  test("completeness ties break by id asc") {
    val df = Seq(
      (7L, "delta co", Some("A")),
      (8L, "delta cox", Some("B"))).toDF("rid", "name", "tag")
    val out = EntityResolution.resolve(df, "rid", "name", Seq("tag"), maxDist = 1)
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L && out(0).getString(3) == "A")
  }

  test("key normalization: case and whitespace runs don't block a match") {
    val df = Seq(
      (1L, "  ALPHA   one ", Some("x")),
      (2L, "alpha one", Option.empty[String])).toDF("rid", "name", "tag")
    val out = EntityResolution.resolve(df, "rid", "name", Seq("tag"), maxDist = 0)
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 2)
  }

  test("non-integral id fails fast") {
    val df = Seq(("a", "x", Some(1.0))).toDF("rid", "name", "bal")
    val e = intercept[IllegalArgumentException] {
      EntityResolution.resolve(df, "rid", "name", Seq("bal"))
    }
    assert(e.getMessage.contains("integral id"))
  }
}
