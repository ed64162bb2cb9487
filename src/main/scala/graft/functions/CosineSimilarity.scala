package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd cosine similarity over two double arrays.
  *
  * Spark's higher-order array functions (`aggregate`, `zip_with`, used by
  * [[graft.operators.VectorOps.cosine]]) are `CodegenFallback` — every
  * element goes through an interpreted lambda with boxing. This expression
  * compiles to a single fused Java loop inside whole-stage codegen, which is
  * the difference between scanning 100 TB of embeddings at memory bandwidth
  * and at interpreter speed.
  *
  * Semantics are bit-identical to the portable fold in VectorOps (verified
  * in CosineSimilaritySpec): one left-to-right accumulation per term, then
  * `dot / (sqrt(na) * sqrt(nb))`, zero-norm -> NaN.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true // length mismatch / null element -> null

  // Whether either input's element type admits null slots. Parquet arrays
  // usually do; literal arrays usually don't. Drives both eval and codegen
  // so the per-element null check is only emitted when it can ever fire.
  private lazy val mayContainNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, n) => n
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // the portable form zip_with-pads the shorter array with nulls, which
    // nulls the whole fold -> cosine null; mirror that instead of silently
    // truncating to the shorter vector
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (mayContainNull) {
      // a null ELEMENT nulls the portable fold (null den -> null result);
      // mirror it instead of reading the slot as 0.0 / NPE-ing
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) Double.NaN else dot / den
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val mismatch = ctx.freshName("mismatch")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val den = ctx.freshName("den")
      val j = ctx.freshName("j")
      // null-element scan only compiled in when the schema admits null slots
      // (mirrors the portable fold's null propagation; see nullSafeEval)
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
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.getDouble($i);
         |  final double $y = $b.getDouble($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? Double.NaN : $dot / $den;
         |}
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosine_sim(a, b)`. Inputs are cast to
    * array<double> here (float arrays widen exactly).
    */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
