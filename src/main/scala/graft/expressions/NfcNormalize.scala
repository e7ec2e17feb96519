package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFC normalization as a first-class Catalyst `UnaryExpression` with
  * `doGenCode` (SURVEY.md §7 step 4 shape): whole-stage codegen emits a
  * direct static call into [[Kernels.nfc]] — same performance class as
  * `StaticInvoke`, but with builtin-style null handling via
  * `nullSafeCodeGen`. (`ExpectsInputTypes` is private[sql], so input
  * typing is the caller's contract — callers pass string columns.)
  * The remaining kernels use `StaticInvoke` (equivalent generated code,
  * less boilerplate); this one is the reference implementation of the
  * pattern. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    Kernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
