package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** Optimizer rule: rewrite validation-split filters into plain predicates.
  *
  * `ValidationResult.valid` filters on `size(_errors) == 0` where `_errors`
  * is the nested CASE tree a validator chain builds. As an opaque
  * array-valued CASE, nothing reaches the parquet scan. This rule pushes
  * the `size(..) == 0` comparison algebraically through CASE / concat /
  * literal-array nodes, yielding a boolean AND/OR tree over the raw row —
  * which Catalyst then simplifies (BooleanSimplification) and pushes into
  * the scan (e.g. `IsNotNull(text)` from a Required chain reaches
  * PushedFilters).
  *
  * Soundness: CASE evaluates branches top-down treating a null predicate
  * as false — mirrored here by wrapping each branch condition in
  * `coalesce(cond, false)`. Rewrites only apply when the CASE has an else
  * branch (our error trees always do); anything unrecognized falls back to
  * the original `size(..) == 0` comparison.
  */
object SimplifyValidationFilters extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transform {
        case e @ EqualTo(Size(arr, _), IntegerLiteral(0)) => guarded(e, zeroCond(arr))
        case e @ EqualTo(IntegerLiteral(0), Size(arr, _)) => guarded(e, zeroCond(arr))
        case e @ GreaterThan(Size(arr, _), IntegerLiteral(0)) => guarded(e, nonZeroCond(arr))
        case e @ LessThan(IntegerLiteral(0), Size(arr, _)) => guarded(e, nonZeroCond(arr))
      }
      val withNN = withImpliedNotNulls(rewritten)
      if (withNN fastEquals cond) f else Filter(withNN, child)
  }

  /** `size(arr) == 0` as a boolean. Null-safe under Filter semantics: a
    * null fallback leaf makes a conjunct null/false, never true — matching
    * the original (size(null-ish) = null, row dropped). */
  private def zeroCond(arr: Expression): Expression = sizeIsZero(arr)._1

  /** `size(arr) > 0` as a boolean. `Not(zero)` alone would INVERT 3VL for
    * nullable fallback leaves (null AND false = false; Not(false) = true
    * keeps a row the original dropped) — so conjoin IsNotNull for every
    * fallback leaf. graft's own error trees have no nullable leaves, so
    * this adds nothing to their plans. */
  private def nonZeroCond(arr: Expression): Expression = {
    val (zero, leaves) = sizeIsZero(arr)
    val guards = leaves.map(l => IsNotNull(l).asInstanceOf[Expression])
    (guards :+ Not(zero)).reduce(And)
  }

  /** Chains whose filters TRANSFORM the value nest the transformed-value
    * CASE inside every downstream condition — naive push-through then
    * duplicates that subtree per branch, exponentially. Only take the
    * rewrite when it doesn't blow the predicate up (the size(..)=0 form
    * evaluates the error CASE once and is already cheap). */
  private def guarded(original: Expression, rewritten: Expression): Expression = {
    def sz(e: Expression): Int = 1 + e.children.map(sz).sum
    if (sz(rewritten) <= 3 * sz(original) + 64) rewritten else original
  }

  /** `NOT coalesce(<…OR isnull(a)…>, false)` as a top-level conjunct implies
    * `a IS NOT NULL`. The `coalesce` wrapper itself can't be translated to a
    * parquet filter, but the implied IsNotNull can — conjoin it (redundant,
    * so semantics unchanged) to enable scan-level row-group skipping. */
  private def withImpliedNotNulls(cond: Expression): Expression = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def isNullTargets(e: Expression): Seq[Attribute] = e match {
      case Or(l, r) => isNullTargets(l) ++ isNullTargets(r)
      case IsNull(a: Attribute) => Seq(a)
      case _ => Nil
    }
    val existing = conjuncts(cond)
    val implied = existing.flatMap {
      case Not(Coalesce(Seq(c, Literal(false, _)))) => isNullTargets(c)
      case _ => Nil
    }.distinct.map(a => IsNotNull(a).asInstanceOf[Expression])
      .filterNot(n => existing.exists(_ semanticEquals n))
    if (implied.isEmpty) cond else (cond +: implied).reduce(And)
  }

  /** Boolean expression equivalent to `size(arr) == 0`, pushed through the
    * shapes our validators produce. */
  private def and(a: Expression, b: Expression): Expression =
    if (a == Literal.TrueLiteral) b
    else if (b == Literal.TrueLiteral) a
    else if (a == Literal.FalseLiteral || b == Literal.FalseLiteral) Literal.FalseLiteral
    else And(a, b)

  private def or(a: Expression, b: Expression): Expression =
    if (a == Literal.FalseLiteral) b
    else if (b == Literal.FalseLiteral) a
    else if (a == Literal.TrueLiteral || b == Literal.TrueLiteral) Literal.TrueLiteral
    else Or(a, b)

  /** Boolean equivalent of `size(arr) == 0`, plus the "fallback leaves" —
    * subexpressions whose size we could not push through (kept as
    * `size(leaf) == 0`), which are the only possible null sources. */
  private def sizeIsZero(arr: Expression): (Expression, Seq[Expression]) = arr match {
    case CaseWhen(branches, Some(elseValue)) =>
      branches.foldRight(sizeIsZero(elseValue)) { case ((c, v), (rest, restLeaves)) =>
        val cond = Coalesce(Seq(c, Literal.FalseLiteral))
        val (vz, vLeaves) = sizeIsZero(v)
        (or(and(cond, vz), and(Not(cond), rest)), vLeaves ++ restLeaves)
      }
    case Concat(children) if children.nonEmpty =>
      val parts = children.map(sizeIsZero)
      (parts.map(_._1).reduce(and), parts.flatMap(_._2))
    case Cast(child, _: ArrayType, _, _) => sizeIsZero(child)
    case CreateArray(items, _) =>
      (if (items.isEmpty) Literal.TrueLiteral else Literal.FalseLiteral, Nil)
    case l @ Literal(value, _: ArrayType) if value != null =>
      (if (value.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() == 0)
        Literal.TrueLiteral
      else Literal.FalseLiteral, Nil)
    case other =>
      (EqualTo(Size(other, legacySizeOfNull = false), Literal(0)), Seq(other))
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }
}
