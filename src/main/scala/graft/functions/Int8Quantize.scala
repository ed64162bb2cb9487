package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd per-vector symmetric int8 quantizer (s07's scheme):
  * scale = 127/max|x| (1 when the vector is all-zero), code =
  * clamp(-127, 127, floor(x·scale + 0.5)) — one compiled two-pass loop per
  * row replacing the portable ArrayTransform chain
  * `array_max(transform(v, abs))` + `transform(v, …greatest/least/floor…)`,
  * which Spark evaluates through interpreted lambdas (higher-order
  * functions are CodegenFallback) with per-element boxing. Quantization is
  * the int8 family's CORPUS-BUILD pass — at 100 TB it touches every vector
  * once per (re)build, exactly the full-scan shape where interpreted
  * evaluation dominates (profiled r13: the inline chain cost ~0.5 s per
  * 2000×64 pass on one core inside broadcast builds).
  *
  * Arithmetic parity with the portable chain is bit-exact on finite
  * doubles (Round13Spec): the same IEEE ops in the same order — abs/max
  * scan, one double division for the scale, per-element multiply-add-floor
  * — and the same long-domain clamp. The floor result always lies in
  * [-127.5, 127.5] by construction (|x| ≤ max|x|), so the double→long
  * narrowing cannot overflow under either ANSI or legacy cast semantics.
  * Stricter than the lambda chain on degenerate input: a null ELEMENT
  * nulls the whole result (a partially-known vector has no meaningful
  * codes), and a NaN/Infinity element does the same — NaN/Infinity are
  * out of the quantizer's domain, and silently emitting garbage codes
  * ((long)NaN == 0) where the portable ANSI chain would raise was the
  * one parity gap the r13 advice flagged; an explicit null makes
  * degenerate input visible to SQL users of `int8_quantize` (Round13Spec
  * pins the null, and bit-exact parity on finite doubles is unchanged).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_quantize"
  override def nullable: Boolean = true // null input or null element

  private lazy val mayContainNull: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var j = 0
    while (j < n) {
      if (mayContainNull && v.isNullAt(j)) return null
      if (!java.lang.Double.isFinite(v.getDouble(j))) return null
      j += 1
    }
    var mx = 0.0
    var i = 0
    while (i < n) {
      val ax = Math.abs(v.getDouble(i))
      if (ax > mx) mx = ax
      i += 1
    }
    val scale = if (mx > 0.0) 127.0 / mx else 1.0
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      var q = Math.floor(v.getDouble(i) * scale + 0.5).toLong
      if (q > 127L) q = 127L else if (q < -127L) q = -127L
      out(i) = q
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val mx = ctx.freshName("mx")
      val ax = ctx.freshName("ax")
      val scale = ctx.freshName("scale")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      // one pre-pass rejects null AND non-finite elements (short-circuit
      // order matters: isNullAt guards the getDouble)
      val nullCheck = if (mayContainNull) s"$a.isNullAt($j) || " else ""
      val nullScan =
        s"""for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if (${nullCheck}!java.lang.Double.isFinite($a.getDouble($j))) ${ev.isNull} = true;
           |}""".stripMargin
      s"""
         |final int $n = $a.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = java.lang.Math.abs($a.getDouble($i));
         |  if ($ax > $mx) $mx = $ax;
         |}
         |final double $scale = $mx > 0.0 ? 127.0 / $mx : 1.0;
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $q = (long) java.lang.Math.floor($a.getDouble($i) * $scale + 0.5);
         |  if ($q > 127L) $q = 127L; else if ($q < -127L) $q = -127L;
         |  $out[$i] = $q;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8Quantize {
  /** Column-API entry point over an array<double> column. */
  def int8Quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(
      ColumnBridge.expression(v.cast("array<double>"))))
}
