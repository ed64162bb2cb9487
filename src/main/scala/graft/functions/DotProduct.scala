package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two double arrays — the fused form of
  * the portable fold `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * ([[graft.operators.VectorOps.dot]]), which Spark evaluates through
  * interpreted lambdas with per-element boxing.
  *
  * Exact semantics parity with the portable fold (asserted in
  * FuseDotProductSpec):
  *   - same left-to-right accumulation order starting at +0.0 -> identical
  *     IEEE result bits;
  *   - length mismatch -> null (zip_with null-pads, which nulls the fold);
  *   - null ELEMENT -> null (same propagation);
  *   - both empty -> 0.0 (fold over empty array returns the zero element).
  *
  * [[graft.plans.FuseDotProduct]] rewrites the portable pattern to this
  * expression automatically, so SQL/portable-form users get the compiled
  * loop without changing their queries.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true // length mismatch / null element

  private lazy val mayContainNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (mayContainNull) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val nullScan =
        if (mayContainNull)
          s"""for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
             |  if ($a.isNullAt($j) || $b.isNullAt($j)) ${ev.isNull} = true;
             |}""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
         |}
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point: `dot_product(a, b)` (float arrays widen
    * exactly).
    */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
