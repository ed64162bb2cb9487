package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match records ACROSS two tables
  * that have no shared key — the tabular twin of the text near-dup
  * pipeline (d02–d04), with the same two-phase scale discipline:
  *
  *   1. BLOCKING generates candidate pairs from cheap deterministic keys
  *      (a name prefix, a profile tuple) — the LSH-band analog. All-pairs
  *      comparison is quadratic in the corpus and never runs; only rows
  *      sharing a block key ever meet, so the pairwise term is bounded by
  *      Σ_k |A_k|·|B_k| over block keys, and the physical plan is plain
  *      equi-joins Catalyst already scales (AQE handles a hot block as
  *      ordinary join skew).
  *   2. VERIFY scores each candidate with the real (expensive) similarity
  *      — here codegen'd Levenshtein — and resolution keeps the best
  *      match per left record.
  *
  * Multiple blocking passes trade recall for candidate volume exactly
  * like LSH bands: a pair is found iff SOME pass keys it together, and
  * the union is deduplicated before verification so no pair is scored
  * twice. Blocking recall < 1 is inherent (a pair no pass co-keys is
  * never seen) — the output contract is "best match under THIS blocking
  * scheme", deterministic and auditable, which is how production ER
  * systems are actually specified.
  */
object Linkage {

  /** Candidate pairs from the union of blocking passes, deduplicated.
    *
    * Each pass is a (leftKey, rightKey) expression pair; rows with equal
    * non-null keys join (a null block key drops its row from that pass —
    * SQL equality, never a null×null block). Column names of `a` and `b`
    * must be disjoint; the output carries all of both sides' columns,
    * one row per distinct candidate pair even when several passes key it
    * together. The distinct is one candidate-scale shuffle — the price of
    * multi-pass dedup, paid BEFORE the expensive verify instead of
    * scoring duplicates.
    *
    * `maxSide` is BLOCK PURGING, the standard ER guard against
    * low-selectivity keys: a block whose membership on a side exceeds it
    * is dropped from that pass entirely (both sides' memberships must be
    * bounded for the pair term to be). Without it a profile-style key
    * whose block sizes grow linearly with the corpus makes the pairwise
    * term quadratic at scale — purging caps every block's contribution at
    * maxSide² and turns candidate volume linear in the number of blocks.
    * The purged pairs are a deterministic, auditable recall loss, exactly
    * like the pairs no pass co-keys. The per-key membership count is a
    * window over the same key the join shuffles on, so the exchange is
    * shared — purging costs no extra shuffle.
    */
  def blockedCandidates(a: DataFrame, b: DataFrame,
      blockings: Seq[(Column, Column)],
      maxSide: Int = Int.MaxValue): DataFrame = {
    require(blockings.nonEmpty, "at least one blocking pass")
    def bounded(df: DataFrame, key: Column) = {
      val keyed = df.withColumn("__bk", key)
      if (maxSide == Int.MaxValue) keyed
      else keyed
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__bk"))))
        .filter(col("__n") <= maxSide)
        .drop("__n")
    }
    blockings.map { case (ka, kb) =>
      bounded(a, ka).join(bounded(b, kb), "__bk").drop("__bk")
    }.reduce(_ unionByName _).distinct()
  }

  /** Resolution: keep each left record's best-scoring candidate —
    * smallest `distance`, ties broken by the smallest `tieBreak` (a
    * right-side unique id, for determinism). One shuffle on the left id.
    */
  def bestMatch(scored: DataFrame, leftId: String, distance: String,
      tieBreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(leftId))
      .orderBy(col(distance).asc, col(tieBreak).asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }
}
