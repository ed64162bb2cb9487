package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DoubleType}

/** Deterministic numeric statistics, built like [[Agg]]: every sum is an
  * exact DECIMAL(30,6) reduction and only a fixed sequence of IEEE double
  * ops follows, so mean/stddev/correlation are bit-identical across engines
  * and partitionings (built-in `stddev`/`corr` accumulate doubles in
  * partition order and are not reproducible run-to-run at scale).
  */
object Stats {
  private val Dec = DataTypes.createDecimalType(30, 6)

  private def s1(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  def decMean(c: Column): Column = Agg.decAvg(c)

  /** Sample standard deviation from exact sums:
    * sqrt(max((m2 - s^2/n) / (n-1), 0)); null for n < 2.
    * The squares are IEEE double multiplies of identical inputs, then
    * quantized — same on every engine.
    *
    * Numerical limitation (deliberate portability tradeoff): this is the
    * naive sum-of-squares form, which cancels catastrophically when
    * |mean| >> stddev (the greatest(...,0) clamp then maps tiny negative
    * residue to stddev 0 rather than surfacing the precision loss). The
    * stable alternative (shift by a per-group pivot, sum((x-k)^2)) needs a
    * second data-dependent pass/join per group; we accept the naive form
    * because cross-engine hash-equality requires the oracle SQL to evaluate
    * the exact same expression tree, and the fixtures' value ranges
    * (|mean|/stddev < 1e6) keep the error below the 1e-6 quantization.
    */
  def decStddev(c: Column): Column = {
    val n = count(c).cast(DoubleType)
    val s = s1(c)
    val m2 = s1(c * c)
    when(count(c) > 1,
      sqrt(greatest((m2 - s * s / n) / (n - 1), lit(0.0))))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Pearson correlation from exact sums:
    * (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2));
    * null when either variance term is non-positive (constant column).
    */
  def decCorr(x: Column, y: Column): Column = {
    val both = x.isNotNull && y.isNotNull
    val xs = when(both, x)
    val ys = when(both, y)
    val n = count(xs).cast(DoubleType)
    val sx = s1(xs)
    val sy = s1(ys)
    val sxx = s1(xs * xs)
    val syy = s1(ys * ys)
    val sxy = s1(xs * ys)
    val vx = n * sxx - sx * sx
    val vy = n * syy - sy * sy
    when(vx > 0 && vy > 0, (n * sxy - sx * sy) / (sqrt(vx) * sqrt(vy)))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Global z-score normalization (the standardization sibling of
    * [[Score.minMaxScore]]): lazy broadcast of the 1-row mean/stddev.
    */
  def zScore(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
    val mm = broadcast(df.agg(
      decMean(col(valueCol)).as("__mean"), decStddev(col(valueCol)).as("__sd")))
    df.crossJoin(mm)
      .withColumn(outCol,
        when(col("__sd").isNull || col("__sd") === 0, lit(null).cast(DoubleType))
          .otherwise((col(valueCol) - col("__mean")) / col("__sd")))
      .drop("__mean", "__sd")
  }

  /** Fixed-width histogram bucket id (integer-exact, engine-portable). */
  def bucket(c: Column, width: Double): Column =
    floor(c / width).cast("long")
}
