package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape operators for scale: skew salting and as-of joins.
  *
  * Both are pure plan rewrites — the output is identical to the naive
  * formulation (the DuckDB oracles check the salted join against a plain
  * join, and the as-of join against DuckDB's native ASOF JOIN), but the
  * physical shape survives 100 TB:
  *
  *   - saltedJoin splits each hot key into `factor` sub-keys so one key's
  *     rows spread over `factor` reducers instead of one straggler task.
  *     (AQE's skew-join handles moderate skew adaptively; explicit salting
  *     is the deterministic heavy-hammer for known-pathological keys.)
  *   - asofJoin is the union + ordered-window formulation: one shuffle on
  *     the key, one sort, no per-key driver logic, no range-explosion —
  *     the scalable shape for "latest right row at or before each left
  *     row" (market-data style temporal alignment).
  */
object JoinOps {

  /** Inner equi-join with the left side's hot keys salted across `factor`
    * sub-partitions. `saltFrom` must be a left-side column expression that
    * varies within a key (any unique-ish id) — it only controls row
    * placement, never the result.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFrom: Column, factor: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(saltFrom), lit(factor)))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** The q97 join-skew report's salt factor for `fact` keyed by `keys`:
    * ⌈max_rows · n_keys / total_rows⌉ in exact integer arithmetic — how
    * many salt buckets flatten the heaviest key down to the mean key
    * size; 1 for a flat distribution. This is a 1-row constant-size
    * aggregate (three longs) collected to the driver — the same
    * diagnosis pass q97_join_skew_report reports, consumed as a plan
    * parameter. At 100 TB the pass is one map-side-combinable aggregate
    * over the fact's join key; in steady state a pipeline reads the
    * factor from the persisted skew report instead of recomputing.
    */
  def skewSaltFactor(fact: DataFrame, keys: Seq[String]): Int = {
    val r = fact.groupBy(keys.map(col): _*).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sz")).as("total_rows"),
        max(col("sz")).as("max_rows"))
      .head()
    if (r.isNullAt(2) || r.getLong(1) == 0L) 1
    else {
      val (nKeys, total, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // BigInt ceiling: mx·nKeys overflows Long at the very scales this
      // exists for (~1e10 keys × 1e9-row hot key ≈ 1e19), and a wrapped
      // negative factor would silently DISABLE salting on exactly the
      // most skewed inputs; clamp the quotient into Int range (callers
      // cap far below it anyway)
      ((BigInt(mx) * BigInt(nKeys) + BigInt(total) - 1) / BigInt(total))
        .min(BigInt(Int.MaxValue)).toInt
    }
  }

  /** [[saltedJoin]] with the factor chosen by the skew diagnosis itself
    * (q26 applies a fixed factor; this closes the q97 → q26 loop): the
    * fact side's [[skewSaltFactor]] picks the fan-out, capped at
    * `maxFactor` because the dimension side is replicated `factor`× —
    * the cap bounds that duplication however pathological the key. A
    * flat distribution (factor 1) degenerates to the plain join — same
    * plan, no salt column. Result-identical to the plain inner join by
    * the same argument as saltedJoin (JoinOpsSpec pins both the result
    * equality and the factor choice against q97's reported value).
    */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFrom: Column, maxFactor: Int = 64): DataFrame = {
    val factor = math.min(maxFactor, skewSaltFactor(left, keys))
    if (factor <= 1) left.join(right, keys)
    else saltedJoin(left, right, keys, saltFrom, factor)
  }

  /** Left as-of join: for every left row, attach the latest `rightVals`
    * from the right row with the same `keys` and right.`ts` <= left.`ts`
    * (inclusive); null when no such row. The right side must be unique per
    * (keys, ts) — pre-dedupe with [[Snapshot.latestPerKeyWindow]] —
    * otherwise the match is ambiguous.
    *
    * Implementation: tag and union both sides, then carry the last
    * non-null right value forward over a per-key window ordered by
    * (ts, side) with right rows sorting before left rows at equal ts.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Pack the right values into ONE struct so the window carries whole
    // right rows atomically: a matched row's genuinely-null value survives
    // (carrying columns independently with ignoreNulls would skip it and
    // resurrect a stale older value, or mix columns from different rows).
    val rBase = right.select(
      (keys :+ ts).map(col) :+ struct(rightVals.map(col): _*).as("__rv"): _*)
      .withColumn("__side", lit(0))
    val rvType = rBase.schema("__rv").dataType
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = leftCols.filterNot(c => keys.contains(c) || c == ts).foldLeft(rBase) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val outCols = (leftCols :+ "__rv" :+ "__side").map(col)
    val all = l.select(outCols: _*).unionByName(r.select(outCols: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col("__rv").getField(v).as(v)): _*)
  }

  /** Data×data interval OVERLAP join — no equi key on either side, both
    * sides corpus-scale, so neither broadcast (q36's shape) nor a plain
    * range theta-join (a cartesian at 100 TB) survives. The classic
    * bucket decomposition instead: each interval explodes into the
    * aligned `bucketMicros`-wide time buckets it touches, the join is a
    * plain EQUI-join on the bucket id plus the exact closed-interval
    * overlap predicate — one hash shuffle on a key both sides share, the
    * shape Catalyst already knows how to scale (AQE handles a hot bucket
    * as ordinary join skew).
    *
    * Dedup-free pair attribution: a pair overlapping across several
    * buckets would emit once per shared bucket, and `distinct` on the
    * output is a second pair-scale shuffle. Instead each pair is kept
    * ONLY in the bucket containing `max(lStart, rStart)` — that instant
    * lies inside both intervals whenever they overlap (max(starts) ≤
    * min(ends)), so exactly one exploded bucket row qualifies and the
    * join output needs no dedup at all.
    *
    * `lStart`/`lEnd`/`rStart`/`rEnd` are epoch-micros Long columns
    * (closed intervals, start ≤ end); bucket math is exact integer `div`
    * (non-negative epochs). Column names across the two sides must be
    * disjoint. Pick `bucketMicros` near the typical interval length: the
    * explode factor is len/bucket + 1 per row, bucket occupancy rises as
    * the width shrinks.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    // the temp bucket column would silently REPLACE a caller column of
    // the same name (withColumn semantics) and the final drop would then
    // remove the caller's data — wrong results with no error; refuse loudly
    require(!left.columns.contains("__bucket") &&
        !right.columns.contains("__bucket"),
      "__bucket is reserved by intervalOverlapJoin; rename the input column")
    def buckets(df: DataFrame, s: String, e: String) =
      df.withColumn("__bucket",
        explode(sequence(expr(s"$s div $bucketMicros"),
          expr(s"$e div $bucketMicros"))))
    val lb = buckets(left, lStart, lEnd)
    val rb = buckets(right, rStart, rEnd)
    lb.join(rb,
        lb("__bucket") === rb("__bucket") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        lb("__bucket") === expr(
          s"greatest($lStart, $rStart) div $bucketMicros"))
      .drop("__bucket")
  }
}
