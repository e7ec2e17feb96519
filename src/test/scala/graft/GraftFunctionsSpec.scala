package graft

import graft.SparkSuite

/** SQL surface: kernels registered in the FunctionRegistry are callable
  * from spark.sql and stay native (StaticInvoke, not UDF). */
class GraftFunctionsSpec extends SparkSuite {

  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT casefold('Straße') AS cf, uuid_normalize('{123E4567-E89B-42D3-A456-426614174000}') AS uu, " +
        "ip_normalize('2001:0db8::1', false, true) AS ip, rolling_hash('abc') AS rh, " +
        "cast(base64_strict('aGVsbG8=') AS STRING) AS b64").collect()(0)
    assert(r.getString(0) == "strasse")
    assert(r.getString(1) == "123e4567-e89b-42d3-a456-426614174000")
    assert(r.getString(2) == "2001:db8::1")
    assert(r.getString(4) == "hello")
  }

  test("round-5 kernels reachable from SQL: zvalue, quantize_i8, dot_i") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT zvalue(3, 1) AS z, zvalue3(1, 1, 1) AS z3, quantize_i8(array(0.5d, -1.0d), 1.0d) AS q, " +
        "dot_i(array(2, 3), array(4, 5)) AS d").collect()(0)
    assert(r.getLong(0) == 7L) // interleave(0b11, 0b01) = 0b0111
    assert(r.getLong(1) == 7L) // 3-way interleave of (1,1,1) = 0b111
    assert(r.getSeq[Int](2) == Seq(64, -127))
    assert(r.getLong(3) == 23L)
  }

  test("robots_match reachable from SQL (r10 kernel)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT robots_match('/private/x', '/private/') AS a, " +
        "robots_match('/a/b/f.zip', '/*.zip$') AS b, " +
        "robots_match('/public', '/private/') AS c").collect()(0)
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("null propagates through registered functions") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT casefold(CAST(NULL AS STRING)) AS x").collect()(0)
    assert(r.isNullAt(0))
  }

  test("extensions-injected functions work without explicit register()") {
    // SparkSuite session is built withExtensions(GraftExtensions)
    val r = spark.sql("SELECT simhash('a b c') AS s, cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0)
    assert(!r.isNullAt(0) && math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("declared inputTypes give builtin-style implicit casts (no codegen ClassCastException)") {
    GraftFunctions.register(spark)
    // pre-fix this threw ClassCastException inside generated code; with
    // inputTypes the analyzer inserts an int->string cast like any builtin
    val r0 = spark.sql("SELECT casefold(42) AS x").collect()(0)
    assert(r0.getString(0) == "42")
    // float arrays flow into the double-typed cosine kernel via implicit cast
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(1.0d, 0.0d)) AS c")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("composite Column functions reachable from SQL: url_canonical/url_host/url_domain") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT url_canonical('HTTP://u@WWW.Ex.COM:80/A/?utm_source=s&b=1#f') AS c, " +
        "url_host('https://A.B.Ex.org/x') AS h, url_domain('https://a.b.ex.org/x') AS d, " +
        "url_canonical('not a url') AS n").collect()(0)
    assert(r.getString(0) == "http://www.ex.com/A?b=1")
    assert(r.getString(1) == "a.b.ex.org")
    assert(r.getString(2) == "ex.org")
    assert(r.isNullAt(3))
    // extensions-injected path too: a FRESH session state (no explicit
    // register() call) must already have the function via GraftExtensions
    val fresh = spark.newSession()
    val r2 = fresh.sql("SELECT url_canonical('https://A.com/x/') AS c").collect()(0)
    assert(r2.getString(0) == "https://a.com/x")
    // wrong arity fails analysis cleanly, not at runtime
    intercept[Exception] { spark.sql("SELECT url_host('a', 'b')").collect() }
  }

  test("r11 quality surface reachable from SQL: gopher_keep/c4_clean/char_entropy/quality_score/dedup_normalize") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT char_entropy('abcd') AS e, " +
        "c4_clean('This line has five words.\nshort') AS c, " +
        "dedup_normalize('Héllo, WORLD!') AS d, " +
        "gopher_keep('x') AS g, quality_score('the data') AS q").collect()(0)
    assert(r.getDouble(0) == 2.0)
    assert(r.getString(1) == "This line has five words.")
    assert(r.getString(2) == "hello world")
    assert(!r.getBoolean(3)) // one word: fails the 50-word floor
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("plan stays codegen-native (no BatchEvalPython/ScalaUDF nodes)") {
    GraftFunctions.register(spark)
    val plan = spark.sql("SELECT casefold(c) FROM VALUES ('A') t(c)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }

  test("encoding repair reachable from SQL: latin1_misdecode/fix_mojibake") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT latin1_misdecode('café') AS bad, " +
        "fix_mojibake('cafÃ©', 1) AS fixed, " +
        "fix_mojibake(latin1_misdecode(t), 1) AS roundtrip " +
        "FROM VALUES ('“smart” — naïve 中文') v(t)").collect()(0)
    assert(r.getString(0) == "cafÃ©")
    assert(r.getString(1) == "café")
    assert(r.getString(2) == "“smart” — naïve 中文")
  }
}
