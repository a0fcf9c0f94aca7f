package graft.plans

import graft.functions.DotProduct

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the native codegen [[DotProduct]] expression. The HOF form is what
  * users naturally write with `functions._`; the native form runs as a tight
  * generated loop. The rewrite is value-exact, bit for bit:
  *
  *  - both sum strictly in index order with a +0.0 seed (the rule requires
  *    the literal zero to be positive 0.0 — a -0.0 seed could flip the sign
  *    bit of an all-negative-zero sum);
  *  - IEEE multiply/add are commutative, so either operand order matches;
  *  - zip_with null-pads when lengths differ, making the HOF sum null, and
  *    DotProduct returns null on length mismatch — same result.
  *
  * This also covers squared norms (dot(a, a)) inside the cosine pattern.
  * Registered through GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations` via GraftFunctions.register.
  */
object RewriteVectorHof extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf.function match {
    case v: NamedLambdaVariable =>
      lf.arguments.size == 1 && lf.arguments.head.exprId == v.exprId
    case _ => false
  }

  private def argIds(lf: LambdaFunction): Set[Long] =
    lf.arguments.collect { case v: NamedLambdaVariable => v.exprId.id }.toSet

  private def isElementProduct(lf: LambdaFunction): Boolean = lf.function match {
    case m: Multiply => (m.left, m.right) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        Set(x.exprId.id, y.exprId.id) == argIds(lf) && lf.arguments.size == 2
      case _ => false
    }
    case _ => false
  }

  private def isRunningSum(lf: LambdaFunction): Boolean = lf.function match {
    case a: Add => (a.left, a.right) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        Set(x.exprId.id, y.exprId.id) == argIds(lf) && lf.arguments.size == 2
      case _ => false
    }
    case _ => false
  }

  private def isPositiveZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, product: LambdaFunction),
            zero, merge: LambdaFunction, finish: LambdaFunction)
          if isDoubleArray(a) && isDoubleArray(b) && isPositiveZero(zero) &&
            isElementProduct(product) && isRunningSum(merge) &&
            isIdentity(finish) =>
        DotProduct(a, b)
    }
}
