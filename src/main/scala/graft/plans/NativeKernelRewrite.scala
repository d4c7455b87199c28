package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the declarative higher-order L2 pattern to the
  * native codegen'd [[L2Distance]] kernel.
  *
  * The §7.3 escalation ladder so far stopped at custom Expressions — this
  * is the next rung (`Rule[LogicalPlan]`, registered through
  * `SparkSessionExtensions.injectOptimizerRule` in [[GraftExtensions]]):
  * a user who writes the natural declarative form
  * {{{ aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0d, _ + _) }}}
  * (or `sqrt(...)` of it — [[graft.functions.VectorFunctions.l2Sq]]/`l2`)
  * gets the compiled kernel without knowing it exists — the measured gap
  * is an interpreted lambda dispatch per element vs a primitive loop
  * (the q_embed_neardup_lsh signature was 6.3 s → 0.2 s on the same
  * shape).
  *
  * Safe by construction: [[L2Distance]] is bit-identical to the HOF fold
  * (same left-to-right double accumulation, same NULL semantics — the
  * L2DistanceSpec parity suite is the proof), so the rewrite can never
  * change a result, only the physical cost. The match is deliberately
  * exact — any deviation from the canonical pattern (different lambda
  * body, non-0.0 zero, a non-identity finish, non-double arrays)
  * falls through untouched.
  */
object NativeKernelRewrite extends Rule[LogicalPlan] {

  // DoubleType ONLY — [[L2Distance]]'s kernel reads getDouble, and an
  // optimizer-rule substitution bypasses checkInputDataTypes
  // re-validation, so admitting ArrayType(FloatType) here would be a
  // silent-corruption trap if the pattern ever matched a float array
  // (today TypeCoercion's inserted Cast breaks the float match, but the
  // guard must not rely on that).
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Matches `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0.0,
    * (acc, v) => acc + v)` (with the implicit identity finish lambda)
    * and returns (a, b). */
  private def squaredL2Operands(e: Expression): Option[(Expression, Expression)] =
    e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(
              Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
              Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _),
              _),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc1: NamedLambdaVariable, el1: NamedLambdaVariable, _),
            Seq(accv: NamedLambdaVariable, elv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(finv: NamedLambdaVariable), _))
        if x1.exprId == xv.exprId && x2.exprId == xv.exprId &&
           y1.exprId == yv.exprId && y2.exprId == yv.exprId &&
           acc1.exprId == accv.exprId && el1.exprId == elv.exprId &&
           fin.exprId == finv.exprId &&
           isDoubleArray(a) && isDoubleArray(b) =>
        Some((a, b))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Sqrt(inner) if squaredL2Operands(inner).isDefined =>
        val (a, b) = squaredL2Operands(inner).get
        L2Distance(a, b)
      case e if squaredL2Operands(e).isDefined =>
        val (a, b) = squaredL2Operands(e).get
        L2Distance(a, b, squared = true)
    }
}
