package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{DotProduct, IntDotProduct}

/** Optimizer rule: fuse the portable dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the codegen'd [[graft.functions.DotProduct]]. Spark's higher-order
  * array functions are CodegenFallback — each element goes through an
  * interpreted lambda with boxing — so users writing the portable form (or
  * the SQL `aggregate(zip_with(...))` spelling) silently pay interpreter
  * cost on what should be a memory-bandwidth loop. This rule gives them the
  * compiled loop without a query change.
  *
  * The rewrite is only fired when it is bit-exact:
  *   - both inputs are array<double> (no implicit numeric widening hidden
  *     in the lambdas);
  *   - the fold seed is literal +0.0 (a -0.0 seed changes the sign of a
  *     -0.0 dot product);
  *   - merge/zip lambdas are plain Add/Multiply of the lambda variables
  *     (either operand order — IEEE + and * are commutative bit-for-bit);
  *   - the finish lambda is identity.
  * Null semantics already agree: zip_with null-pads a length mismatch and
  * the null element poisons the fold -> null, exactly DotProduct's contract.
  */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isIdentityLambda(f: LambdaFunction): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** The lambda body uses exactly its two bound variables, in either order. */
  private def usesBothVars(x: NamedLambdaVariable, y: NamedLambdaVariable,
      args: Seq[NamedExpression]): Boolean = args match {
    case Seq(a: NamedLambdaVariable, b: NamedLambdaVariable) =>
      Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  private def isPlusZero(l: Literal): Boolean = l match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_.containsPattern(
        org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _), zipArgs, _)),
          zero: Literal,
          LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, _), mergeArgs, _),
          finish: LambdaFunction)
        if isPlusZero(zero) && isIdentityLambda(finish) &&
          usesBothVars(mx, my, zipArgs) && usesBothVars(aa, av, mergeArgs) &&
          isDoubleArray(a) && isDoubleArray(b) =>
        DotProduct(a, b)
      // integer twin: same pattern over array<bigint> with a 0L seed ->
      // the codegen'd IntDotProduct. Long + and * are exactly associative
      // and commutative, so values never drift; overflow behavior is
      // preserved by BINDING the matched operators' evalMode (not the
      // session conf at optimization time): ANSI folds keep throwing,
      // LEGACY folds keep wrapping, and TRY folds (null on overflow — a
      // semantics IntDotProduct does not implement) are left alone.
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, mulMode), zipArgs, _)),
          Literal(0L, LongType),
          LambdaFunction(Add(aa: NamedLambdaVariable, av: NamedLambdaVariable, addMode), mergeArgs, _),
          finish: LambdaFunction)
        if isIdentityLambda(finish) &&
          usesBothVars(mx, my, zipArgs) && usesBothVars(aa, av, mergeArgs) &&
          isLongArray(a) && isLongArray(b) &&
          mulMode.evalMode == addMode.evalMode &&
          mulMode.evalMode != EvalMode.TRY =>
        IntDotProduct(a, b, failOnError = mulMode.evalMode == EvalMode.ANSI)
    }
}
