package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import graft.expressions.Kernels

/** SQL-surface registration of graft's native kernels (SURVEY.md §7 step 4:
  * "register via FunctionRegistry for SQL usability") — after
  * `GraftFunctions.register(spark)`, `spark.sql("SELECT casefold(name) …")`
  * works and stays codegen'd (StaticInvoke, not UDF). */
object GraftFunctions {

  private def inv(dt: DataType, fn: String)(args: Seq[Expression]): Expression =
    StaticInvoke(Kernels.getClass, dt, fn, args,
      propagateNull = true, returnNullable = true)

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "nfc" -> inv(StringType, "nfc") _,
    "unicode_clean" -> inv(StringType, "unicodeClean") _,
    "casefold" -> inv(StringType, "caseFold") _,
    "base64_strict" -> inv(BinaryType, "base64Strict") _,
    "utf8_truncate" -> inv(StringType, "utf8Truncate") _,
    "ip_normalize" -> inv(StringType, "ipNormalize") _,
    "uuid_normalize" -> inv(StringType, "uuidNormalize") _,
    "rolling_hash" -> inv(LongType, "rollingHash") _,
    "simhash" -> inv(LongType, "simHash") _)

  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
