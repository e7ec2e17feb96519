package graft.filters

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSuite
import graft.core.Validate
import graft.{filters => F}

/** Mirrors reference `test/complex_test.py` (SURVEY.md §5): dotted error
  * keys for mapper, indexed keys for repeater, switch routing. */
class ComplexFiltersSpec extends SparkSuite {

  private def errPairs(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.select(explode(col("_errors")).as("e"))
      .select("e.key", "e.code").collect().toSeq
      .map(r => (r.getString(0), r.getString(1)))

  test("FilterMapper validates per-field with dotted keys; collects all field errors") {
    val schema = StructType.fromDDL("rec STRUCT<event_type: STRING, value: DOUBLE>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row("bogus", -5.0d))), 1), schema)
    val mapper = FilterMapper(Seq(
      "event_type" -> F.Choice(Seq("signup", "purchase")),
      "value" -> F.Min(0.0)))
    val out = Validate.column(df, "rec", mapper)
    assert(errPairs(out).sorted == Seq(
      ("rec.event_type", "not_valid_choice"), ("rec.value", "too_small")))
  }

  test("FilterMapper passes valid records and rebuilds cleaned struct") {
    val schema = StructType.fromDDL("rec STRUCT<a: STRING, b: STRING>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row("x", "  y  "))), 1), schema)
    val mapper = FilterMapper(Seq("b" -> F.Strip()))
    val out = Validate.column(df, "rec", mapper).collect()(0)
    assert(out.getStruct(0).getString(1) == "y")
  }

  test("FilterRepeater validates each element with indexed keys") {
    val schema = StructType.fromDDL("arr ARRAY<DOUBLE>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(0.5d, 9.0d, -3.0d))), 1), schema)
    val rep = FilterRepeater(F.Min(0.0) | F.Max(1.0))
    val out = Validate.column(df, "arr", rep)
    assert(errPairs(out).sorted == Seq(("arr.1", "too_big"), ("arr.2", "too_small")))
    // cleaned array keeps valid elements, nulls invalid ones
    val cleaned = out.collect()(0).getSeq[Any](0)
    assert(cleaned == Seq(0.5d, null, null))
  }

  test("FilterSwitch routes by getter; default and no-case behavior") {
    val schema = StructType.fromDDL("rec STRUCT<t: STRING, v: DOUBLE>")
    val rows = Seq(
      Row(Row("big", 5.0d)),   // routed: Min(10) fails
      Row(Row("big", 50.0d)),  // routed: passes
      Row(Row("other", 1.0d))) // no case, no default → no_valid_case
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val switch = FilterSwitch(_.getField("t"),
      Seq("big" -> FilterMapper(Seq("v" -> F.Min(10.0)))))
    val out = Validate.column(df, "rec", switch)
    assert(errPairs(out).sorted == Seq(("rec", "no_valid_case"), ("rec.v", "too_small")))
  }

  test("FilterSwitch with default routes unmatched to default") {
    val schema = StructType.fromDDL("rec STRUCT<t: STRING, v: DOUBLE>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row("other", 1.0d))), 1), schema)
    val switch = FilterSwitch(_.getField("t"),
      Seq("big" -> FilterMapper(Seq("v" -> F.Min(10.0)))),
      default = Some(F.NoOp()))
    val out = Validate.column(df, "rec", switch)
    assert(errPairs(out).isEmpty)
  }

  // ---- FilterMapperDynamic: all four key-policy combinations ------------

  private def dynDf(maps: Seq[Map[String, String]]) = {
    val schema = StructType.fromDDL("m MAP<STRING, STRING>")
    spark.createDataFrame(
      spark.sparkContext.parallelize(maps.map(Row(_)), 1), schema)
  }

  test("FilterMapperDynamic strict: extra_key AND missing_key fire") {
    val dyn = FilterMapperDynamic(
      Seq("k" -> F.MinLength(2), "v" -> F.NoOp()),
      allowExtraKeys = false, allowMissingKeys = false)
    val out = Validate.column(dynDf(Seq(Map("k" -> "ab", "z" -> "boom"))), "m", dyn)
    assert(errPairs(out).sorted == Seq(("m.v", "missing_key"), ("m.z", "extra_key")))
  }

  test("FilterMapperDynamic lenient: extras and missing both tolerated") {
    val dyn = FilterMapperDynamic(
      Seq("k" -> F.MinLength(2), "v" -> F.NoOp()),
      allowExtraKeys = true, allowMissingKeys = true)
    val out = Validate.column(dynDf(Seq(Map("k" -> "ab", "z" -> "boom"))), "m", dyn)
    assert(errPairs(out).isEmpty)
    // allowed extra passes through untouched; declared key cleaned in place
    val m = out.collect()(0).getMap[String, String](0)
    assert(m == Map("k" -> "ab", "z" -> "boom"))
  }

  test("FilterMapperDynamic allow-extra only: missing_key fires, extra passes") {
    val dyn = FilterMapperDynamic(Seq("k" -> F.NoOp(), "v" -> F.NoOp()),
      allowExtraKeys = true, allowMissingKeys = false)
    val out = Validate.column(dynDf(Seq(Map("k" -> "x", "z" -> "boom"))), "m", dyn)
    assert(errPairs(out) == Seq(("m.v", "missing_key")))
  }

  test("FilterMapperDynamic allow-missing only: extra_key fires, missing passes") {
    val dyn = FilterMapperDynamic(Seq("k" -> F.NoOp(), "v" -> F.NoOp()),
      allowExtraKeys = false, allowMissingKeys = true)
    val out = Validate.column(dynDf(Seq(Map("k" -> "x", "z" -> "boom"))), "m", dyn)
    assert(errPairs(out) == Seq(("m.z", "extra_key")))
  }

  test("FilterMapperDynamic runs field chains on present keys; rejected extras null out") {
    val dyn = FilterMapperDynamic(Seq("k" -> (F.Strip() | F.MinLength(2))),
      allowExtraKeys = false, allowMissingKeys = true)
    val rows = Seq(Map("k" -> "  ab  "), Map("k" -> "x"), Map("k" -> "ok", "z" -> "boom"))
    val out = Validate.column(dynDf(rows), "m", dyn)
    assert(errPairs(out).sorted == Seq(("m.k", "too_short"), ("m.z", "extra_key")))
    val cleaned = out.collect().map(_.getMap[String, String](0))
    assert(cleaned(0) == Map("k" -> "ab"))            // chain cleaned in place
    assert(cleaned(1) == Map("k" -> null))            // field error → null value
    assert(cleaned(2) == Map("k" -> "ok", "z" -> null)) // rejected extra → null value
  }

  test("FilterMapperDynamic: missing key sees missing_key, NOT the field chain") {
    // a Required chain must not ALSO fire its own empty error on an absent
    // key — absence is the policy's fact, not the chain's
    val dyn = FilterMapperDynamic(Seq("k" -> F.Required()),
      allowExtraKeys = true, allowMissingKeys = false)
    val out = Validate.column(dynDf(Seq(Map("other" -> "x"))), "m", dyn)
    assert(errPairs(out) == Seq(("m.k", "missing_key")))
  }

  test("FilterMapperDynamic: null map passes through (None-passthrough)") {
    val dyn = FilterMapperDynamic(Seq("k" -> F.Required()),
      allowExtraKeys = false, allowMissingKeys = false)
    val out = Validate.column(dynDf(Seq(null)), "m", dyn)
    assert(errPairs(out).isEmpty)
    assert(out.collect()(0).isNullAt(0))
  }

  test("null struct passes through mapper/repeater (None-passthrough)") {
    val schema = StructType.fromDDL("rec STRUCT<a: STRING>, arr ARRAY<DOUBLE>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null, null)), 1), schema)
    val out1 = Validate.column(df, "rec", FilterMapper(Seq("a" -> F.Required())))
    assert(errPairs(out1).isEmpty)
    val out2 = Validate.column(df, "arr", FilterRepeater(F.Min(0.0)))
    assert(errPairs(out2).isEmpty)
  }

  // ---- FilterMapperVariant: heterogeneous dynamic documents --------------

  private def varDf(jsons: Seq[String]) = {
    import spark.implicits._
    jsons.toDF("js").select(parse_json(col("js")).as("doc"))
  }

  test("FilterMapperVariant extracts each field at its own type and runs chains") {
    val vm = FilterMapperVariant(Seq(
      ("n", "bigint", F.Min(5.0)), ("s", "string", F.MinLength(2))))
    val out = Validate.column(varDf(Seq("""{"n": 7, "s": "ab"}""")), "doc", vm)
    assert(errPairs(out).isEmpty)
    val rec = out.collect()(0).getStruct(0)
    assert(rec.getLong(0) == 7L && rec.getString(1) == "ab")
  }

  test("FilterMapperVariant: uncastable value → invalid_type, field nulled") {
    val vm = FilterMapperVariant(Seq(("n", "bigint", F.NoOp())))
    val out = Validate.column(varDf(Seq("""{"n": "oops"}""")), "doc", vm)
    assert(errPairs(out) == Seq(("doc.n", "invalid_type")))
    assert(out.collect()(0).getStruct(0).isNullAt(0))
  }

  test("FilterMapperVariant: variant coercions are the lenient ones") {
    // JSON "123" → bigint 123, number 9 → string "9" (verified Spark 4.1
    // variant-cast behavior the class contract documents)
    val vm = FilterMapperVariant(Seq(
      ("n", "bigint", F.NoOp()), ("s", "string", F.NoOp())))
    val out = Validate.column(varDf(Seq("""{"n": "123", "s": 9}""")), "doc", vm)
    assert(errPairs(out).isEmpty)
    val rec = out.collect()(0).getStruct(0)
    assert(rec.getLong(0) == 123L && rec.getString(1) == "9")
  }

  test("FilterMapperVariant: JSON null is present — None-passthrough, no error") {
    // even under a Required-style absence policy: the KEY is there
    val vm = FilterMapperVariant(Seq(("n", "bigint", F.Min(0.0))),
      allowMissingKeys = false)
    val out = Validate.column(varDf(Seq("""{"n": null}""")), "doc", vm)
    assert(errPairs(out).isEmpty)
    assert(out.collect()(0).getStruct(0).isNullAt(0))
  }

  test("FilterMapperVariant key policies: missing_key and extra_key") {
    val strict = FilterMapperVariant(Seq(("n", "bigint", F.NoOp())),
      allowExtraKeys = false, allowMissingKeys = false)
    val out = Validate.column(varDf(Seq("""{"z": 1}""")), "doc", strict)
    assert(errPairs(out).sorted == Seq(("doc.n", "missing_key"), ("doc.z", "extra_key")))
    val lenient = FilterMapperVariant(Seq(("n", "bigint", F.NoOp())),
      allowExtraKeys = true, allowMissingKeys = true)
    assert(errPairs(Validate.column(varDf(Seq("""{"z": 1}""")), "doc", lenient)).isEmpty)
  }

  test("FilterMapperVariant: chain error nulls only its own field") {
    val vm = FilterMapperVariant(Seq(
      ("n", "bigint", F.Min(100.0)), ("s", "string", F.Strip())))
    val out = Validate.column(varDf(Seq("""{"n": 3, "s": " x "}""")), "doc", vm)
    assert(errPairs(out) == Seq(("doc.n", "too_small")))
    val rec = out.collect()(0).getStruct(0)
    assert(rec.isNullAt(0) && rec.getString(1) == "x")
  }

  test("FilterMapperVariant: null variant passes through (None-passthrough)") {
    val vm = FilterMapperVariant(Seq(("n", "bigint", F.NoOp())),
      allowExtraKeys = false, allowMissingKeys = false)
    import spark.implicits._
    val df = Seq(Option.empty[String]).toDF("js")
      .select(try_parse_json(col("js")).as("doc"))
    val out = Validate.column(df, "doc", vm)
    assert(errPairs(out).isEmpty)
    assert(out.collect()(0).isNullAt(0))
  }
}
