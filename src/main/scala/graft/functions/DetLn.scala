package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine natural log of a positive BIGINT.
  *
  * `ln()` itself cannot appear in an engine/oracle-shared fixed-point
  * (`floor(ln(x) * 1e6)` bets on the JVM's and DuckDB's libm agreeing to
  * the last ulp — a difference adjacent to an integer boundary flips the
  * floor). This helper computes ln using ONLY operations IEEE 754 defines
  * as correctly rounded — `+ - * /` on doubles — plus exact integer
  * bit-length/shift, so both engines produce bit-identical results by
  * construction:
  *
  *   - `e = bitlength(n) - 1` (exact integer; `bin()` exists in both
  *     engines), `m = n / 2^e ∈ [1, 2)` — division by a power of two is
  *     exact;
  *   - `ln m = 2z · Σ z²ᵏ/(2k+1)` with `z = (m-1)/(m+1) ∈ [0, 1/3)`
  *     (atanh series), evaluated by Horner with IDENTICAL association in
  *     all three renderings (Column / SQL / Scala reference below);
  *   - `ln n = e·ln2 + ln m` with ln2 spliced as a shortest-round-trip
  *     double literal (parses to the same bits in every engine).
  *
  * With z² < 1/9, [[Terms]]=21 puts the series truncation (~9⁻²² ≈ 1e-21)
  * far below double ulp; accuracy vs libm ln is asserted in Round12Spec.
  */
object DetLn {

  /** Correctly-rounded double nearest ln 2, as a round-trip literal. */
  val Ln2 = 0.6931471805599453

  /** Series terms after the leading 1 (k = 1..Terms). */
  val Terms = 21

  private def coef(k: Int): Double = 1.0 / (2 * k + 1)

  /** Shortest-round-trip rendering — parses back to identical bits in the
    * JVM, Spark's SQL parser, and DuckDB.
    */
  private def dlit(d: Double): String = java.lang.Double.toString(d)

  /** Spark Column form: deterministic ln of a positive BIGINT column. */
  def detLn(n: Column): Column = {
    val e = (length(bin(n.cast("long"))) - 1).cast("int")
    val m = n.cast("double") / call_function("shiftleft", lit(1L), e).cast("double")
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val z2 = z * z
    val horner = (Terms - 1 to 1 by -1).foldLeft(lit(coef(Terms))) {
      (acc, k) => lit(coef(k)) + z2 * acc
    }
    e.cast("double") * lit(Ln2) + (lit(2.0) * z) * (lit(1.0) + z2 * horner)
  }

  /** DuckDB SQL form over a positive-BIGINT expression `x` — the same
    * operations in the same association as [[detLn]]. `z`/`z2` are inlined
    * textually (pure expressions, so duplication cannot change the value).
    */
  def detLnSql(x: String): String = {
    val e = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    val m = s"(CAST($x AS DOUBLE) / CAST((CAST(1 AS BIGINT) << $e) AS DOUBLE))"
    val z = s"(($m - 1.0) / ($m + 1.0))"
    val z2 = s"($z * $z)"
    val horner = (Terms - 1 to 1 by -1).foldLeft(dlit(coef(Terms))) {
      (acc, k) => s"(${dlit(coef(k))} + ($z2 * $acc))"
    }
    s"((CAST($e AS DOUBLE) * ${dlit(Ln2)}) + ((2.0 * $z) * (1.0 + ($z2 * $horner))))"
  }

  /** Scala reference (same order of operations — used by specs to pin the
    * other two renderings).
    */
  def detLnScala(n: Long): Double = {
    require(n > 0, s"detLn is defined for positive integers, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val m = n.toDouble / (1L << e).toDouble
    val z = (m - 1.0) / (m + 1.0)
    val z2 = z * z
    var acc = coef(Terms)
    var k = Terms - 1
    while (k >= 1) { acc = coef(k) + z2 * acc; k -= 1 }
    e.toDouble * Ln2 + (2.0 * z) * (1.0 + z2 * acc)
  }
}
