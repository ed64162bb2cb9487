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
    // the temp key/count columns would silently replace same-named caller
    // columns (withColumn semantics) and corrupt the output — refuse loudly
    for (df <- Seq(a, b); c <- Seq("__bk", "__n"))
      require(!df.columns.contains(c),
        s"$c is reserved by blockedCandidates; rename the input column")
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

  /** Global 1-based positions of `df` under `order` (which must be a
    * TOTAL order — include a unique tie-break column), appended as `pos`.
    *
    * `row_number` over an unpartitioned window is a single partition at
    * 100 TB. The scalable two-phase form instead: range-repartition on
    * the order (contiguous, ordered key ranges per partition — equal
    * tuples land together, and the order is total so tuples are unique),
    * rank WITHIN each partition in parallel, then add per-partition
    * offsets — a prefix sum over the per-partition counts, which is
    * #partitions rows, bounded by the cluster, never by data. The offset
    * table is explicitly broadcast back (it is partition-count-sized by
    * construction).
    */
  def withGlobalPositions(df: DataFrame, order: Seq[Column]): DataFrame = {
    // `pos` is the OUTPUT column and the internals are temps: any of them
    // already present would be silently replaced (withColumn) and then a
    // caller keying on its own `pos` — sortedNeighborhood's exact shape —
    // would pair on the wrong order with no error; refuse loudly
    for (c <- Seq("pos", "__pid", "__rn", "__off", "__opid", "__cnt"))
      require(!df.columns.contains(c),
        s"$c is reserved by withGlobalPositions; rename the input column")
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val withRn = parted.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(order: _*)))
    val offsets = withRn.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("__pid"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid").as("__opid"), col("__off"))
    withRn.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn("pos", col("__off") + col("__rn"))
      .drop("__pid", "__opid", "__rn", "__off")
  }

  /** Sorted-neighborhood candidate generation, blocking's classic
    * complement: merge both sides into ONE totally-ordered list on the
    * sort key and pair records from opposite sides within `window`
    * positions of each other. Where blocking needs keys to match
    * EXACTLY, the sorted neighborhood tolerates key-local noise — close
    * keys sort together even when no block key agrees.
    *
    * Scale shape: positions via [[withGlobalPositions]] (no global
    * window), then the positional band-join runs as the same aligned
    * bucket decomposition as JoinOps.intervalOverlapJoin — bucket =
    * pos div window, the left side explodes to its three admissible
    * buckets {b−1, b, b+1}, a plain equi-join meets them, and the exact
    * |Δpos| ≤ window filter lands each pair exactly once (the right
    * bucket is single-valued). Candidate volume is ≤ 2·window per
    * record by construction — linear in the corpus at ANY window.
    *
    * `aId`/`bId` are unique per side; output is the two sides' columns
    * for each candidate pair (names must be disjoint).
    */
  def sortedNeighborhood(a: DataFrame, b: DataFrame,
      aSort: Column, bSort: Column, aId: String, bId: String,
      window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    // the pair-id temps are joined back against the caller's frames; a
    // same-named caller column would make the join-back ambiguous (or, for
    // __apos/__bpos/__bucket, silently feed the band filter) — refuse loudly
    for (df <- Seq(a, b); c <- Seq("__aid", "__bid", "__apos", "__bpos",
        "__bucket"))
      require(!df.columns.contains(c),
        s"$c is reserved by sortedNeighborhood; rename the input column")
    // the long cast below would silently NULL a non-numeric id — losing
    // the order's unique tie-break AND emptying the payload re-join —
    // so refuse anything but integral id columns up front
    def integral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Set("byte", "short", "integer", "long")
          .contains(dt.typeName),
        s"$c must be an integral id column, found ${dt.typeName}")
    }
    integral(a, aId)
    integral(b, bId)
    val merged = a.select(aSort.as("__k"), lit(0).as("__side"),
        col(aId).cast("long").as("__id"))
      .unionByName(b.select(bSort.as("__k"), lit(1).as("__side"),
        col(bId).cast("long").as("__id")))
    // total order: key, then side, then the per-side unique id
    val pos = withGlobalPositions(merged,
      Seq(col("__k"), col("__side"), col("__id")))
    val pa = pos.filter(col("__side") === 0)
      .select(col("__id").as("__aid"), col("pos").as("__apos"),
        explode(sequence(expr(s"pos div $window - 1"),
          expr(s"pos div $window + 1"))).as("__bucket"))
    val pb = pos.filter(col("__side") === 1)
      .select(col("__id").as("__bid"), col("pos").as("__bpos"),
        expr(s"pos div $window").as("__bucket"))
    val pairs = pa.join(pb, "__bucket")
      .filter(abs(col("__apos") - col("__bpos")) <= window)
      .select(col("__aid"), col("__bid"))
    a.join(pairs, col(aId) === col("__aid"))
      .join(b, col("__bid") === col(bId))
      .drop("__aid", "__bid")
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
