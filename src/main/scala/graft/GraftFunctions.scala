package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import graft.expressions.Kernels

/** SQL-surface registration of graft's native kernels (SURVEY.md §7 step 4:
  * "register via FunctionRegistry for SQL usability") — after
  * `GraftFunctions.register(spark)`, `spark.sql("SELECT casefold(name) …")`
  * works and stays codegen'd (StaticInvoke, not UDF).
  *
  * This table is the single source of truth; `plans.GraftExtensions`
  * consumes it too, so the two registration paths cannot drift. */
object GraftFunctions {

  /** (sqlName, returnType, kernelMethod, paramTypes) for every exposed
    * kernel. Param types flow into `StaticInvoke.inputTypes` so SQL calls
    * get analysis-time type checking + implicit casts (a mistyped
    * `casefold(42)` fails as a clean AnalysisException, and
    * `cosine_sim(array<float>, …)` gets an automatic cast to double). */
  val kernelFunctions: Seq[(String, DataType, String, Seq[DataType])] = Seq(
    ("nfc", StringType, "nfc", Seq(StringType)),
    ("unicode_clean", StringType, "unicodeClean", Seq(StringType)),
    ("casefold", StringType, "caseFold", Seq(StringType)),
    ("base64_strict", BinaryType, "base64Strict", Seq(StringType)),
    ("utf8_truncate", StringType, "utf8Truncate", Seq(StringType, IntegerType, StringType)),
    ("ip_normalize", StringType, "ipNormalize", Seq(StringType, BooleanType, BooleanType)),
    ("uuid_normalize", StringType, "uuidNormalize", Seq(StringType)),
    ("rolling_hash", LongType, "rollingHash", Seq(StringType)),
    ("dedup_normalize", StringType, "dedupNormalize", Seq(StringType)),
    ("simhash", LongType, "simHash", Seq(StringType)),
    ("minhash_sig", ArrayType(LongType, containsNull = false), "minhashSig",
      Seq(StringType, IntegerType)),
    ("cosine_sim", DoubleType, "cosineD",
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))),
    ("zvalue", LongType, "zValue2", Seq(LongType, LongType)),
    ("zvalue3", LongType, "zValue3", Seq(LongType, LongType, LongType)),
    ("quantize_i8", ArrayType(IntegerType, containsNull = false), "quantizeI8D",
      Seq(ArrayType(DoubleType), DoubleType)),
    ("dot_i", LongType, "dotI",
      Seq(ArrayType(IntegerType), ArrayType(IntegerType))),
    ("robots_match", BooleanType, "robotsMatch", Seq(StringType, StringType)),
    ("latin1_misdecode", StringType, "latin1Misdecode", Seq(StringType)),
    ("fix_mojibake", StringType, "fixMojibake", Seq(StringType, IntegerType)),
    ("deflate_ratio", DoubleType, "deflateRatio", Seq(StringType, IntegerType)),
    ("jaro_winkler", DoubleType, "jaroWinkler", Seq(StringType, StringType)))

  def builder(dt: DataType, kernel: String,
              paramTypes: Seq[DataType]): Seq[Expression] => Expression =
    (args: Seq[Expression]) => StaticInvoke(Kernels.getClass, dt, kernel, args,
      paramTypes, propagateNull = true, returnNullable = true)

  /** COMPOSITE Column-expression functions on the same SQL surface — not
    * single kernels but library functions whose body is an ordinary
    * Catalyst tree (regexp/array/string ops, codegen-resident, no UDF).
    * The builder bridges argument Expressions → Columns → the library
    * function → back, via GraftSqlShim. (name, arity, fn). */
  val columnFunctions: Seq[(String, Int,
      Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)] = Seq(
    ("url_canonical", 1, args => graft.ops.Urls.canonicalizeUrl(args.head)),
    ("url_host", 1, args => graft.ops.Urls.urlHost(args.head)),
    ("url_domain", 1, args => graft.ops.Urls.registrableDomain(args.head)),
    ("html_to_text", 1, args => graft.ops.Html.htmlToText(args.head)),
    // r11 quality/repetition surface
    ("gopher_keep", 1, args => graft.ops.QualityRules.gopherKeep(args.head)),
    ("c4_clean", 1, args => graft.ops.QualityRules.c4CleanLines(args.head)),
    ("char_entropy", 1, args => graft.ops.TextAnalysis.charEntropy(args.head)),
    ("quality_score", 1, args => graft.ops.TextAnalysis.qualityScore(args.head)))

  def columnBuilder(name: String, arity: Int,
                    fn: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = { (args: Seq[Expression]) =>
    require(args.length == arity,
      s"$name expects $arity argument(s), got ${args.length}")
    org.apache.spark.sql.GraftSqlShim.expressionEager(
      fn(args.map(org.apache.spark.sql.GraftSqlShim.column)))
  }

  def register(spark: SparkSession): Unit = {
    kernelFunctions.foreach { case (name, dt, kernel, pts) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder(dt, kernel, pts), "scala_udf")
    }
    columnFunctions.foreach { case (name, arity, fn) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, columnBuilder(name, arity, fn), "scala_udf")
    }
  }
}
