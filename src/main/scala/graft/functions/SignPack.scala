package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd sign-bit packer: one BIGINT whose bit `i` is set iff
  * element `i` of the input double array is `>= 0` (Spark comparison
  * semantics: `-0.0 >= 0` and `NaN >= 0` are both true). Elements beyond 64
  * are ignored; a null ELEMENT leaves its bit unset — exactly the portable
  * spelling `aggregate(zip_with(slice(v,...), sequence(...), (x, i) ->
  * when(x >= 0, 2^i, 0L)), 0L, or)` this replaces (bit-identity asserted in
  * Round12Spec), which Spark evaluates through interpreted lambdas with
  * per-element boxing.
  *
  * This is the code BUILD of the binary-quantized ANN
  * (`s21_knn_binary_rescore`): at 100 TB the build is a full-corpus pass, so
  * the compiled loop — not a CodegenFallback lambda chain — is the right
  * shape for the same reason [[IntDotProduct]] is for the int8 scan.
  */
case class SignPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_pack"

  private lazy val mayContainNull: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), 64)
    var code = 0L
    var i = 0
    while (i < n) {
      if (!(mayContainNull && arr.isNullAt(i))) {
        val x = arr.getDouble(i)
        // Spark's >= treats -0.0 == 0.0 (primitive >= agrees) and NaN as
        // the largest double (primitive >= does not — hence the escape).
        if (x >= 0.0 || java.lang.Double.isNaN(x)) code |= 1L << i
      }
      i += 1
    }
    code
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val code = ctx.freshName("code")
      val nullGuard = if (mayContainNull) s"!$a.isNullAt($i) && " else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), 64);
         |long $code = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard true) {
         |    final double $x = $a.getDouble($i);
         |    if ($x >= 0.0 || java.lang.Double.isNaN($x)) $code |= 1L << $i;
         |  }
         |}
         |${ev.value} = $code;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignPack {
  /** Column-API entry point: `sign_pack(v)` over an array<double> column
    * (float arrays widen exactly).
    */
  def signPack(v: Column): Column =
    ColumnBridge.column(SignPack(ColumnBridge.expression(v.cast("array<double>"))))
}
