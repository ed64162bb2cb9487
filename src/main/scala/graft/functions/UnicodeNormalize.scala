package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Text cleaning is the first pass of every LLM training pipeline, and
  * canonical composition (NFC) is its standard first step: visually
  * identical strings with different codepoint sequences (é as U+00E9 vs
  * e+U+0301) must hash identically for dedup, n-gram features, and exact
  * oracles to behave. Spark has no built-in for it; a Scala UDF would add
  * per-row boxing + serialization. This expression stays inside
  * whole-stage codegen and short-circuits on the dominant case: ASCII (and
  * any already-NFC string) is returned as the SAME UTF8String, zero
  * allocation — `Normalizer.isNormalized` is a cheap scan that bails on the
  * first non-trivial codepoint.
  *
  * Semantics pinned against `java.text.Normalizer` (the ICU-aligned JDK
  * implementation) in UnicodeNormalizeSpec; the DuckDB oracle side is
  * `nfc_normalize(...)`.
  */
case class UnicodeNormalizeNFC(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeNFC.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalizeNFC.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalizeNFC {
  /** Static entry point shared by eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point: `nfc_normalize(text)`. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(UnicodeNormalizeNFC(ColumnBridge.expression(text)))
}
