package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native codegen'd slot-agreement count over two BIGINT arrays — the fused
  * form of the portable fold
  * {{{ aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
  *               0, _ + _) }}}
  * which Spark evaluates through interpreted lambdas with per-element
  * boxing. This is the MinHash estimator's inner loop (d14/d20): at
  * verification scale it runs once per candidate pair — millions of pairs
  * times a 12..48-slot signature — so the compiled tight loop replaces the
  * dominant interpreted cost of the whole family (~13 s of d14's sf1 line).
  *
  * Exact semantics parity with the portable fold (pinned in Round16Spec):
  * unlike the dot-product family, a LENGTH MISMATCH does not null the
  * result — zip_with null-pads the shorter side and `when(null === y, 1)
  * .otherwise(0)` maps the padded slots to 0 — and a null ELEMENT likewise
  * contributes 0 (null-safe equality is never true there). Only a null
  * input array nulls the count. So: count of positions where both elements
  * are present and equal, over any pair of array lengths.
  */
case class ArrayAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "agree_count"
  override def nullable: Boolean = left.nullable || right.nullable

  private lazy val mayContainNull: Boolean = Seq(left, right).exists {
    _.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // padded slots past min(n) always contribute 0 in the fold
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if ((!mayContainNull || (!x.isNullAt(i) && !y.isNullAt(i))) &&
          x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val agree = ctx.freshName("agree")
      val nullGuard =
        if (mayContainNull) s"!$a.isNullAt($i) && !$b.isNullAt($i) && "
        else ""
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($nullGuard$a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayAgreeCount {
  /** Column-API entry point: `agreeCount(a, b)` over array<bigint> columns. */
  def agreeCount(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayAgreeCount(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
}
