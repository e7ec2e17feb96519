package graft.filters

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.SparkSuite
import graft.core.Validate
import graft.{filters => F}

/** Long-tail filter coverage: Call, ByteString/ByteArray, Omit, array
  * emptiness strategies, Split keyed struct, case-insensitive Choice. */
class MiscFiltersSpec extends SparkSuite {
  import spark.implicits._

  test("Call wraps an arbitrary Column transform (stays native)") {
    assertPasses(F.Call(c => upper(c), "Upper"), "STRING", "abc", "ABC")
    assertPasses(F.Call(c => upper(c)), "STRING", null, null)
  }

  test("Call.jvm wraps an arbitrary Scala function (UDF escape hatch)") {
    val rev = F.Call.jvm((s: String) => s.reverse, "Reverse")
    assertPasses(rev, "STRING", "abc", "cba")
    assertPasses(rev, "STRING", null, null) // None-passthrough before the UDF
  }

  test("ByteString/ByteArray coerce to UTF-8 bytes") {
    val Seq((v, codes)) = runFilter(F.ByteString(), "STRING", Seq("hé"))
    assert(codes.isEmpty)
    assert(java.util.Arrays.equals(v.asInstanceOf[Array[Byte]], "hé".getBytes("UTF-8")))
    val Seq((v2, _)) = runFilter(F.ByteArray(), "INT", Seq(42))
    assert(new String(v2.asInstanceOf[Array[Byte]], "UTF-8") == "42")
  }

  test("Omit drops struct fields; others preserved") {
    val schema = StructType.fromDDL("rec STRUCT<a: INT, b: STRING, c: DOUBLE>")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(1, "x", 2.5))), 1), schema)
    val out = Validate.column(df, "rec", F.Omit(Seq("b"))).select("rec.*")
    assert(out.columns.toSeq == Seq("a", "c"))
    assert(out.collect()(0) == Row(1, 2.5))
  }

  test("ByteArrayFromInts packs 0-255 ints to bytes, rejects out-of-range") {
    val Seq((v, c)) = runFilter(F.ByteArrayFromInts(), "ARRAY<INT>", Seq(Seq(72, 105, 255, 0)))
    assert(c.isEmpty && v.asInstanceOf[Array[Byte]].toSeq == Seq(72, 105, -1, 0).map(_.toByte))
    assertErrors(F.ByteArrayFromInts(), "ARRAY<INT>", Seq(72, 256), Seq("bad_encoding"))
    assertErrors(F.ByteArrayFromInts(), "ARRAY<INT>", Seq(-1), Seq("bad_encoding"))
    assertPasses(F.ByteArrayFromInts(), "ARRAY<INT>", null, null)
    // other integral widths validate instead of failing analysis
    val Seq((v2, c2)) = runFilter(F.ByteArrayFromInts(), "ARRAY<BIGINT>", Seq(Seq(1L, 200L)))
    assert(c2.isEmpty && v2.asInstanceOf[Array[Byte]].toSeq == Seq(1, 200.toByte))
    assertErrors(F.ByteArrayFromInts(), "ARRAY<BIGINT>", Seq(5000000000L), Seq("bad_encoding"))
  }

  test("OmitMap drops map keys; null map passes through") {
    val schema = StructType.fromDDL("m MAP<STRING, INT>")
    val rows = Seq(Row(Map("a" -> 1, "b" -> 2, "c" -> 3)), Row(null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Validate.column(df, "m", F.OmitMap(Seq("b"))).select("m").collect()
    assert(out(0).getMap[String, Int](0).toMap == Map("a" -> 1, "c" -> 3))
    assert(out(1).isNullAt(0))
  }

  test("JSON record validation end-to-end: JsonDecode | FilterMapper with dotted keys") {
    // the dynamic-dict pattern: parse JSON, then per-field chains with
    // errors keyed under the parsed record's path
    val df = Seq(
      (1L, """{"kind": "purchase", "amount": 90}"""),
      (2L, """{"kind": "refund", "amount": 5}"""),
      (3L, "not json")).toDF("id", "props")
    val v = F.JsonDecode("kind STRING, amount BIGINT") |
      FilterMapper(Seq(
        "kind" -> F.Choice(Seq("purchase", "refund")),
        "amount" -> F.Min(10L)))
    val res = Validate(df, "props" -> v)
    val byId = res.df.select(col("id"), col("_errors")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Row](1).map(e => (e.getString(0), e.getString(1))))
      .toMap
    assert(byId(1L).isEmpty)
    assert(byId(2L) == Seq(("props.amount", "too_small")))
    assert(byId(3L) == Seq(("props", "not_json")))
  }

  test("Empty/NotEmpty with array emptiness strategy") {
    val schema = StructType.fromDDL("arr ARRAY<INT>")
    val rows = Seq(Row(Seq.empty[Int]), Row(Seq(1)), Row(null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Validate.column(df, "arr", F.NotEmpty(Emptiness.array))
    val errCounts = out.select(size(col("_errors")).as("n")).as[scala.Int].collect().toSeq
    assert(errCounts == Seq(1, 0, 0)) // [] rejected; [1] ok; null passes
  }

  test("Split with keys produces a named struct") {
    val Seq((v, codes)) = runFilter(F.Split("-", Seq("y", "m", "d")), "STRING", Seq("2024-01-15"))
    assert(codes.isEmpty)
    val r = v.asInstanceOf[Row]
    assert(r.getString(0) == "2024" && r.getString(1) == "01" && r.getString(2) == "15")
  }

  test("Split keyed rejects part/key count mismatch") {
    assertErrors(F.Split("-", Seq("y", "m", "d")), "STRING", "2024-01", Seq("wrong_count"))
    assertErrors(F.Split("-", Seq("y", "m", "d")), "STRING", "2024-01-15-extra", Seq("wrong_count"))
    // keyless split never rejects
    assertPasses(F.Split("-"), "STRING", "just-two", Seq("just", "two"))
  }

  test("Choice case-insensitive keeps original value") {
    assertPasses(F.Choice(Seq("Red", "Blue"), caseSensitive = false), "STRING", "RED", "RED")
    assertErrors(F.Choice(Seq("Red", "Blue"), caseSensitive = false), "STRING", "green",
      Seq("not_valid_choice"))
    // ICU full fold, matching CaseFold/choiceFolded: ß case-equals SS
    assertPasses(F.Choice(Seq("SS"), caseSensitive = false), "STRING", "ß", "ß")
    assertPasses(F.Choice(Seq("straße"), caseSensitive = false), "STRING", "STRASSE", "STRASSE")
  }

  test("JsonDecodeVariant parses schema-free JSON; fields via variant_get") {
    val df = Seq((1L, """{"a": {"b": 7}}"""), (2L, "{bad")).toDF("id", "v")
    val out = Validate.column(df, "v", F.JsonDecodeVariant())
    val ok = out.filter(size(col("_errors")) === 0)
      .selectExpr("id", "variant_get(v, '$.a.b', 'bigint') AS b").collect()
    assert(ok.length == 1 && ok(0).getLong(1) == 7L)
    assert(out.filter(size(col("_errors")) > 0).count() == 1)
  }

  test("FilterRepeaterMap validates map values with key-context errors") {
    val schema = StructType.fromDDL("m MAP<STRING, DOUBLE>")
    val rows = Seq(Row(Map("a" -> 1.0, "b" -> -5.0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Validate.column(df, "m", F.FilterRepeaterMap(F.Min(0.0)))
    val errs = out.select(explode(col("_errors")).as("e")).select("e.key", "e.code")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(errs.toSeq == Seq(("m.b", "too_small")))
    // cleaned map keeps the valid entry, nulls the invalid one
    val cleaned = out.select("m").collect()(0).getMap[String, Any](0)
    assert(cleaned("a") == 1.0 && cleaned("b") == null)
  }

  test("Optional with a numeric default and Choice over ints") {
    assertPasses(F.Optional(lit(0.0), Emptiness.never), "DOUBLE", null, 0.0)
    assertPasses(F.Choice(Seq(1, 2, 3)), "INT", 2, 2)
    assertErrors(F.Choice(Seq(1, 2, 3)), "INT", 9, Seq("not_valid_choice"))
  }

  test("Strip with alternation pattern keeps anchors (no interior stripping)") {
    assertPasses(F.Strip(leading = "foo|bar", trailing = "foo|bar"),
      "STRING", "bazbarqux", "bazbarqux")
    assertPasses(F.Strip(leading = "foo|bar", trailing = "foo|bar"),
      "STRING", "barbazfoo", "baz") // "bar" head + "foo" tail stripped
  }

  test("Int rejects whole numbers beyond Long range instead of nulling out") {
    assertErrors(F.Int(), "STRING", "10000000000000000000", Seq("not_int")) // > Long.MaxValue
    assertErrors(F.Int(), "STRING", "-10000000000000000000", Seq("not_int"))
    assertPasses(F.Int(), "STRING", Long.MaxValue.toString, Long.MaxValue)
  }

  test("minhash/simhash tokenize on any whitespace, matching TextAnalysis.tokens") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.expressions.Kernels
    val a = Kernels.minhashSig(UTF8String.fromString("hello world"), 16)
    val b = Kernels.minhashSig(UTF8String.fromString("hello\nworld"), 16)
    assert((0 until 16).forall(i => a.getLong(i) == b.getLong(i)))
    assert(Kernels.simHash(UTF8String.fromString("a\tb")) ==
      Kernels.simHash(UTF8String.fromString("a b")))
  }

  test("near-dup banding rejects non-divisible hash/band configs") {
    intercept[IllegalArgumentException] {
      graft.ops.Dedup.minhashNearDups(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", numHashes = 16, bands = 5)
    }
  }

  test("Regex with Unicode property classes; Strip with custom classes") {
    val Seq((v, c)) = runFilter(F.Regex("\\p{L}+"), "STRING", Seq("ab1cd2é"))
    assert(c.isEmpty && v == Seq("ab", "cd", "é"))
    assertPasses(F.Strip(leading = "[x]+", trailing = "[y]+"), "STRING", "xxhelloyy", "hello")
  }

  test("Min/MaxLength with array size strategy") {
    val rep = F.MinLength(2, len = c => size(c))
    val schema = StructType.fromDDL("arr ARRAY<INT>")
    val rows = Seq(Row(Seq(1)), Row(Seq(1, 2, 3)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = Validate.column(df, "arr", rep)
    val errs = out.select(size(col("_errors"))).collect().map(_.getInt(0)).toSeq
    assert(errs == Seq(1, 0))
  }

  test("MaxBytes truncate preserves short values untouched") {
    assertPasses(F.MaxBytes(100), "STRING", "short", "short")
    assertPasses(F.MaxBytes(100), "STRING", null, null)
  }

  test("Required on numeric column via Emptiness.never") {
    assertErrors(F.Required(Emptiness.never), "DOUBLE", null, Seq("empty"))
    assertPasses(F.Required(Emptiness.never), "DOUBLE", 0.0d, 0.0d) // zero is not empty
  }

  test("Type passes dynamic strings castable to the target type") {
    assertPasses(F.Type(org.apache.spark.sql.types.DoubleType), "STRING", "3.14", "3.14")
    assertErrors(F.Type(org.apache.spark.sql.types.DateType), "STRING", "nope", Seq("wrong_type"))
  }
}
