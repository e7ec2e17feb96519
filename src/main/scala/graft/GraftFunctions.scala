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

  /** (sqlName, returnType, kernelMethod) for every exposed kernel. */
  val kernelFunctions: Seq[(String, DataType, String)] = Seq(
    ("nfc", StringType, "nfc"),
    ("unicode_clean", StringType, "unicodeClean"),
    ("casefold", StringType, "caseFold"),
    ("base64_strict", BinaryType, "base64Strict"),
    ("utf8_truncate", StringType, "utf8Truncate"),
    ("ip_normalize", StringType, "ipNormalize"),
    ("uuid_normalize", StringType, "uuidNormalize"),
    ("rolling_hash", LongType, "rollingHash"),
    ("simhash", LongType, "simHash"),
    ("minhash_sig", ArrayType(LongType, containsNull = false), "minhashSig"),
    ("cosine_sim", DoubleType, "cosineD"))

  def builder(dt: DataType, kernel: String): Seq[Expression] => Expression =
    (args: Seq[Expression]) => StaticInvoke(Kernels.getClass, dt, kernel, args,
      propagateNull = true, returnNullable = true)

  def register(spark: SparkSession): Unit =
    kernelFunctions.foreach { case (name, dt, kernel) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder(dt, kernel), "scala_udf")
    }
}
