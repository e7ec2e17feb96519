package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import graft.expressions.Kernels

/** Session extensions: inject graft's optimizer rule and register the
  * native kernels as SQL functions, so a plain
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` session gets
  * the full surface (`SELECT casefold(c) …`) with zero driver code. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, dt: DataType, kernel: String)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(Kernels.getClass.getName, name),
      (args: Seq[Expression]) => StaticInvoke(Kernels.getClass, dt, kernel, args,
        propagateNull = true, returnNullable = true))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SimplifyValidationFilters)
    Seq(
      fn("nfc", StringType, "nfc"),
      fn("unicode_clean", StringType, "unicodeClean"),
      fn("casefold", StringType, "caseFold"),
      fn("base64_strict", BinaryType, "base64Strict"),
      fn("utf8_truncate", StringType, "utf8Truncate"),
      fn("ip_normalize", StringType, "ipNormalize"),
      fn("uuid_normalize", StringType, "uuidNormalize"),
      fn("rolling_hash", LongType, "rollingHash"),
      fn("simhash", LongType, "simHash"),
      fn("minhash_sig", ArrayType(LongType, containsNull = false), "minhashSig"),
      fn("cosine_sim", DoubleType, "cosineD")
    ).foreach(ext.injectFunction)
  }
}
