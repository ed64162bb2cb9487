package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Count-only array intersection over two BIGINT arrays — the fused form of
  * {{{ size(array_intersect(a, b)) }}} for the case where only the COUNT is
  * needed. `array_intersect` builds and returns the full intersection array
  * (hash set + output buffer + element copies) and `size` then throws the
  * array away; this expression keeps the hash set (open addressing over a
  * primitive long table, no boxing) and never materializes the result.
  * It is the exact-Jaccard verify's inner loop ([[graft.operators.Dedup
  * .jaccardOnPairs]] — d04/d09 and the stored verified-pair build): at
  * verification scale it runs once per LSH candidate pair — millions of
  * pairs times feature arrays hundreds of elements long — so the per-pair
  * allocation it removes is the dominant cost of the whole verify family.
  *
  * Exact semantics parity with `size(array_intersect(a, b))` under the
  * default (non-legacy) `size` semantics, pinned in Round16Spec: the count
  * is over DISTINCT common elements (duplicates on either side count once —
  * the set side dedups on insert, the probe side marks a slot counted and
  * never recounts it), a null ELEMENT counts once iff both sides contain
  * null, and a null input ARRAY nulls the result.
  */
case class LongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "intersect_count"
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val mayContainNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountImpl.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], mayContainNull)

  // The loop body needs a hash table, so the generated code calls the same
  // static helper eval uses — the call stays inside whole-stage codegen
  // (one virtual call per ROW; the per-element work is the compiled
  // primitive loop in IntersectCountImpl, exactly like the text-hash
  // family's heavy helpers).
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCountImpl.count(" +
        s"$a, $b, $mayContainNull);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongIntersectCount {
  /** Column-API entry point: `intersectCount(a, b)` over array<bigint>
    * columns.
    */
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(LongIntersectCount(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
}

/** Standalone object (no companion class) so the compiler emits a static
  * forwarder `IntersectCountImpl.count(...)` callable from generated Java.
  */
object IntersectCountImpl {

  /** |distinct(a) ∩ distinct(b)|, counting a shared null element once when
    * `nullsPossible` (callers with containsNull=false schemas skip every
    * per-element null check).
    */
  def count(a: ArrayData, b: ArrayData, nullsPossible: Boolean): Int = {
    // build the set from the SMALLER side: the table is O(min(|a|, |b|))
    // and the larger side is a straight probe scan
    val (s, p) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = s.numElements()
    if (n == 0 || p.numElements() == 0) return 0
    // open addressing, linear probing, power-of-two capacity >= 2n;
    // state: 0 = empty, 1 = filled, 2 = already counted.
    // Capacity math in Long: `n << 1` in Int overflows negative at
    // n >= 2^30, the loop would exit at cap=4, and the insert loop would
    // then spin forever once 4 distinct values fill the table — a hang,
    // not an error. With Long math, any n > 2^29 needs cap = 2^31, whose
    // toInt-then-allocate below fails loudly instead. Unreachable for
    // realistic shingle arrays, but the guard costs nothing.
    var cap = 4L
    while (cap < 2L * n) cap <<= 1
    val capI = cap.toInt
    val mask = capI - 1
    val table = new Array[Long](capI)
    val state = new Array[Byte](capI)
    var setHasNull = false
    var i = 0
    while (i < n) {
      if (nullsPossible && s.isNullAt(i)) {
        setHasNull = true
      } else {
        val v = s.getLong(i)
        var idx = (scramble(v) & mask).toInt
        while (state(idx) != 0 && table(idx) != v) idx = (idx + 1) & mask
        if (state(idx) == 0) {
          table(idx) = v
          state(idx) = 1
        }
      }
      i += 1
    }
    var cnt = 0
    var nullCounted = false
    val m = p.numElements()
    var j = 0
    while (j < m) {
      if (nullsPossible && p.isNullAt(j)) {
        if (setHasNull && !nullCounted) {
          cnt += 1
          nullCounted = true
        }
      } else {
        val v = p.getLong(j)
        var idx = (scramble(v) & mask).toInt
        while (state(idx) != 0 && table(idx) != v) idx = (idx + 1) & mask
        if (state(idx) == 1) {
          cnt += 1
          state(idx) = 2 // a duplicate in the probe side must not recount
        }
      }
      j += 1
    }
    cnt
  }

  /** Finalizer-style mix so clustered hash values spread over the table
    * (shingle hashes are products mod a fixed prime — low bits correlate).
    */
  @inline private def scramble(v: Long): Long = {
    val h = v * 0x9E3779B97F4A7C15L
    (h ^ (h >>> 32)) & Long.MaxValue
  }
}
