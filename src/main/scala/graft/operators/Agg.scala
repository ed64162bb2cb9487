package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType}

/** Deterministic floating-point aggregation.
  *
  * `avg`/`sum` over doubles depend on summation order, which depends on
  * partitioning and partial-merge arrival order — so the same query can
  * produce last-ulp-different results run to run (and engine to engine),
  * occasionally flipping a `round(_, 2)` boundary. That is unacceptable for
  * a correctness-gated engine and for reproducible pipelines at 100 TB,
  * where partition counts change constantly.
  *
  * Fix: quantize to DECIMAL(30, 6) (exact, associative, overflow-safe to
  * 1e24 — far beyond 100 TB of money columns), sum exactly, then perform at
  * most ONE IEEE double operation at the end. Identical inputs -> identical
  * bits on every engine, every partitioning.
  */
object Agg {
  private val Dec = DataTypes.createDecimalType(30, 6)

  /** Exact-decimal-backed average. Null semantics match `avg` (nulls
    * excluded from both numerator and denominator; all-null group -> null,
    * guarded so ANSI mode's divide-by-zero cannot fire).
    */
  def decAvg(c: Column): Column =
    when(count(c) > 0, sum(c.cast(Dec)).cast(DoubleType) / count(c))
      .otherwise(lit(null).cast(DoubleType))

  /** Exact-decimal-backed sum, surfaced as double. */
  def decSum(c: Column): Column =
    sum(c.cast(Dec)).cast(DoubleType)

  /** Partial-aggregate building block: the exact decimal sum WITHOUT the
    * final double cast, so partials can be re-aggregated (sum of partial
    * sums == one-shot sum, exactly — decimals are associative). Pair with a
    * `count` partial and divide only at the outermost level (see
    * q51_incremental_agg).
    */
  def decPartialSum(c: Column): Column =
    sum(c.cast(Dec))

  /** Re-aggregate decimal partials into the same value [[decAvg]] would have
    * produced over the raw rows: sum the exact partial sums and counts, and
    * only then perform the single double division. Bit-identical to the
    * one-shot form because decimal addition is associative — this is what
    * makes pre-aggregated (rolled-up) fact summaries safe for a hash-gated
    * engine.
    */
  def decReAvg(partialSum: Column, partialCount: Column): Column =
    when(sum(partialCount) > 0, sum(partialSum).cast(DoubleType) / sum(partialCount))
      .otherwise(lit(null).cast(DoubleType))

  /** Engine-portable decimal rounding. Spark's `round` converts the exact
    * binary double to BigDecimal and rounds HALF_UP; DuckDB multiplies by
    * 10^d first, which can snap a near-boundary value onto .5 — so the two
    * disagree on values like 51449.854999...  This formula is a fixed
    * sequence of IEEE ops (multiply, add, floor, divide) that every engine
    * evaluates bit-identically on identical inputs. Half values round toward
    * +inf (for negatives that differs from HALF_UP — consistently so).
    */
  def roundAt(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  /** DuckDB-side spellings of the above, for oracle authors:
    *   decAvg: CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE) / count(x)
    *   decSum: CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    *   roundAt: floor((x) * 100 + 0.5) / 100
    */
}
