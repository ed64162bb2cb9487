package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two BIGINT arrays — the fused
  * form of the portable fold `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`,
  * which Spark evaluates through interpreted lambdas with per-element
  * boxing. This is the stage-1 scorer of the two-stage int8 ANN
  * (`s17_knn_int8_rescore`): at serving scale the quantized scan evaluates
  * this once per (query, candidate), so the compiled tight loop — the JVM
  * stand-in for the integer-SIMD kernel real vector stores run — is the
  * whole point of quantizing.
  *
  * Exact semantics parity with the portable fold (asserted in Round11Spec
  * and PropertySpec): long addition is associative so there is no
  * accumulation-order caveat; length mismatch -> null (zip_with null-pads,
  * which nulls the fold); null element -> null; both empty -> 0L; and —
  * like Spark's own Multiply/Add — overflow THROWS under ANSI mode
  * (`failOnError`, captured from `spark.sql.ansi.enabled` at plan time,
  * Spark 4's default) and wraps silently otherwise, so fusing the fold
  * never changes overflow behavior.
  */
case class IntDotProduct(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_dot"
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
    var dot = 0L
    var i = 0
    if (failOnError) {
      while (i < n) {
        dot = Math.addExact(dot, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        i += 1
      }
    } else {
      while (i < n) {
        dot += x.getLong(i) * y.getLong(i)
        i += 1
      }
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
      val accumulate =
        if (failOnError)
          s"$dot = java.lang.Math.addExact($dot, " +
            s"java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$dot += $a.getLong($i) * $b.getLong($i);"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |final int $n = $a.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $accumulate
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

object IntDotProduct {
  /** Column-API entry point: `intDot(a, b)` over array<bigint> columns. */
  def intDot(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotProduct(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
}
