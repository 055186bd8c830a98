package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProductF

/** Optimizer rule: recognize the declarative dot-product fold
  *
  *   aggregate(zip_with(transform(a, cast double),
  *                      transform(b, cast double), *), 0.0, +)
  *
  * over array<float> columns and replace it with the codegen'd
  * `DotProductF` kernel (same double accumulation, same fold order —
  * proven bit-identical in CatalystExpressionsSpec). Users who write
  * the idiomatic higher-order-function form get kernel speed without
  * knowing the kernel exists.
  *
  * The match is deliberately strict — every lambda body must be exactly
  * the canonical shape over its own lambda variables — so the rewrite
  * can never change semantics of a look-alike expression.
  */
object NativeKernelRule extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** transform(arr, x -> cast(x as double)) over array<float> */
  private object CastToDoubleTransform {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayTransform(arr,
        LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _), Seq(a: NamedLambdaVariable), _))
        if v.exprId == a.exprId && isFloatArray(arr) => Some(arr)
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(
          CastToDoubleTransform(a),
          CastToDoubleTransform(b),
          LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
          Seq(la: NamedLambdaVariable, lv: NamedLambdaVariable), _),
        finish @ LambdaFunction(fv: NamedLambdaVariable, Seq(ff: NamedLambdaVariable), _))
      if x.exprId == zx.exprId && y.exprId == zy.exprId &&
        acc.exprId == la.exprId && v.exprId == lv.exprId &&
        fv.exprId == ff.exprId =>
      DotProductF(a, b)
  }
}
