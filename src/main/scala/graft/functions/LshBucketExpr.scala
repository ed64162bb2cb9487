package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native sign-random-projection bucket id — same deterministic plane
  * formula as [[graft.operators.VectorOps.planeWeight]] and the same
  * left-to-right accumulation as [[graft.operators.VectorOps.lshBucket]]
  * (equality asserted in LshBucketSpec), computed in one compiled loop
  * instead of `planes` interpreted 64-element folds per row.
  */
case class LshBucketExpr(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // portable form: any length mismatch null-pads zip_with -> null dot ->
    // the when() falls to otherwise(0) for EVERY plane -> bucket 0. A null
    // ELEMENT nulls the dot the same way -> bucket 0 too (and scanning first
    // avoids GenericArrayData.toDoubleArray NPE-ing on the null slot).
    if (arr.numElements() != dims) return 0L
    var j = 0
    while (j < dims) {
      if (arr.isNullAt(j)) return 0L
      j += 1
    }
    val v = arr.toDoubleArray()
    val n = dims
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val w = (((p.toLong * dims + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5
        dot += v(d) * w
        d += 1
      }
      if (dot >= 0) bucket += 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketExpr {
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    ColumnBridge.column(
      LshBucketExpr(ColumnBridge.expression(v.cast("array<double>")), planes, dims))
}
