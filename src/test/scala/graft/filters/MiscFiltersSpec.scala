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

  test("Choice case-insensitive keeps original value") {
    assertPasses(F.Choice(Seq("Red", "Blue"), caseSensitive = false), "STRING", "RED", "RED")
    assertErrors(F.Choice(Seq("Red", "Blue"), caseSensitive = false), "STRING", "green",
      Seq("not_valid_choice"))
  }

  test("Type passes dynamic strings castable to the target type") {
    assertPasses(F.Type(org.apache.spark.sql.types.DoubleType), "STRING", "3.14", "3.14")
    assertErrors(F.Type(org.apache.spark.sql.types.DateType), "STRING", "nope", Seq("wrong_type"))
  }
}
