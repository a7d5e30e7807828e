package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Catalyst optimizer rules injected by [[GraftExtensions]] (SURVEY.md
  * §2.10 preference order (c): whole-session plan rewrites).
  */
object GraftRules {

  /** Rewrites the canonical builtin dot-product fold
    *
    *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, x) => acc + x)
    *
    * into the native codegen'd [[NativeExpressions.DotProduct]]. The
    * higher-order builtins are CodegenFallback with a per-element lambda
    * dispatch (~7x slower on this shape), so user code written in plain
    * DataFrame/SQL style silently gets the fast path — the same service
    * Catalyst's own ReplaceExpressions performs for builtins.
    *
    * Fires when both arrays are `array<double>`; NULL elements and
    * length mismatches yield NULL in both forms, and both multiply and
    * add are matched commutatively (the fold is a left-to-right sum
    * either way, so the result is bit-identical).
    */
  object DotProductRewrite extends Rule[LogicalPlan] {

    private def isDoubleArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }

    /** f is the two-argument lambda (p, q) => p op q, matched commutatively. */
    private def isCommutativeOp(
        f: LambdaFunction,
        opSides: PartialFunction[Expression, (Expression, Expression)]): Boolean =
      f.arguments match {
        case Seq(p: NamedLambdaVariable, q: NamedLambdaVariable) =>
          opSides.lift(f.function).exists {
            case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
              (l.exprId == p.exprId && r.exprId == q.exprId) ||
                (l.exprId == q.exprId && r.exprId == p.exprId)
            case _ => false
          }
        case _ => false
      }

    private def isIdentity(f: LambdaFunction): Boolean =
      (f.arguments, f.function) match {
        case (Seq(v: NamedLambdaVariable), fv: NamedLambdaVariable) =>
          v.exprId == fv.exprId
        case _ => false
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, mult: LambdaFunction),
            Literal(0.0, DoubleType),
            merge: LambdaFunction,
            finish: LambdaFunction)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isCommutativeOp(mult, { case Multiply(l, r, _) => (l, r) }) &&
            isCommutativeOp(merge, { case Add(l, r, _) => (l, r) }) &&
            isIdentity(finish) =>
        NativeExpressions.DotProduct(a, b)
    }
  }
}
