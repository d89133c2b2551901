package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatVecDot

/** Optimizer rule: recognize the interpreted higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  *
  * over float arrays and rewrite it to the codegen'd [[FloatVecDot]]
  * (bit-identical semantics, ~7x on the similarity scans). Users who
  * write the idiomatic-but-slow form through the public API get the
  * fast expression automatically when the session is built with
  * GraftExtensions.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x * y (in either order), where both sides cast the lambda vars. */
  private def isProductOf(e: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = e match {
    case Multiply(l, r, _) =>
      def castOf(c: Expression, v: NamedLambdaVariable) = c match {
        case Cast(`v`, DoubleType, _, _) => true
        case `v` => false // no cast: not our pattern (would be float mult)
        case _ => false
      }
      (castOf(l, x) && castOf(r, y)) || (castOf(l, y) && castOf(r, x))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(accL: NamedLambdaVariable, vL: NamedLambdaVariable, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finishFn)
          if isFloatArray(a) && isFloatArray(b) &&
            isProductOf(mult, x, y) &&
            accL.exprId == acc.exprId && vL.exprId == v.exprId &&
            isIdentityFinish(finishFn) =>
        FloatVecDot(a, b)
    }

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
