package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, IsNotNull, Literal}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.expressions.Kernels

/** `IsNotNull(kernel(args))` → `AND(IsNotNull(arg)…)` for TOTAL kernels
  * (null-propagating StaticInvokes that never return null on non-null
  * input — [[Kernels.totalKernels]]).
  *
  * Why this matters: constraint inference turns a filter like
  * `sigAgreement(a, b) >= t` into an `IsNotNull(sigAgreement(a, b))` guard,
  * substitutes the columns' defining expressions, and pushes the result
  * into the scan — where the kernel then runs a SECOND time per row purely
  * to check for a null it can never produce. Rewriting the guard to its
  * arguments' null checks keeps the pushed filter cheap (plain
  * `IsNotNull(text)`), and downstream BooleanSimplification usually folds
  * it into guards that already exist.
  *
  * Soundness: exact value-level equivalence — with `propagateNull=true`
  * the invoke is null iff some argument is null, and a total kernel adds
  * no other null source. Applied everywhere expressions appear (the
  * equivalence is unconditional, not Filter-specific).
  */
object SimplifyKernelNullChecks extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case IsNotNull(si: StaticInvoke)
          if si.propagateNull && si.staticObject == Kernels.getClass &&
            Kernels.totalKernels.contains(si.functionName) =>
        si.arguments.filter(_.nullable).map(IsNotNull(_): Expression)
          .reduceOption(And).getOrElse(Literal.TrueLiteral)
    }
}
