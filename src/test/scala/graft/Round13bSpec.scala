package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Kmeans

/** Round-13 second batch: the until-convergence k-means contract (s32),
  * the LSH banding-design table's S-curve invariants (d20), and the
  * inverted-index lake round trip + partition pruning (t32).
  */
class Round13bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = ExtensionQueries.embeddingsD(spark, dir)
    .select(col("vec_id"), col("v"))

  private def centList(cent: org.apache.spark.sql.DataFrame) =
    cent.orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toList

  // ---- s32: until-convergence k-means ----

  test("fitConverged stops under the cap and equals its own depth's fixed run") {
    val (cent, _, iters) = Kmeans.fitConverged(emb, k = 8,
      maxIters = ExtensionQueries8.KmConvMaxIters)
    assert(iters < ExtensionQueries8.KmConvMaxIters,
      s"cap hit at $iters — no convergence margin")
    // the adaptive result IS a fixed-iteration run of its own depth
    val (fixedAtDepth, _) = Kmeans.fit(emb, k = 8, iters = iters)
    assert(centList(cent) == centList(fixedAtDepth))
  }

  test("past the fixed point extra Lloyd iterations are no-ops (the oracle's unroll argument)") {
    val (cent, _, iters) = Kmeans.fitConverged(emb, k = 8,
      maxIters = ExtensionQueries8.KmConvMaxIters)
    val (overshoot, _) = Kmeans.fit(emb, k = 8, iters = iters + 3)
    assert(centList(cent) == centList(overshoot),
      "recompute∘assign must be idempotent at the fixed point")
    assert(iters <= ExtensionQueries8.KmConvOracleUnroll,
      s"oracle unroll ${ExtensionQueries8.KmConvOracleUnroll} is below the " +
        s"measured depth $iters — the oracle would compare a pre-convergence round")
  }

  test("s05's fixed 2-iteration budget does NOT reach the fixed point here") {
    // fine for IVF routing (centroids only need to partition space), but
    // the distinction s32 exists for: the budgeted answer and the
    // converged answer are DIFFERENT tables on this fixture (depth 13).
    val (cent, _, iters) = Kmeans.fitConverged(emb, k = 8,
      maxIters = ExtensionQueries8.KmConvMaxIters)
    assert(iters > 2, s"fixture converged at $iters — pick a deeper fixture")
    val (budget2, _) = Kmeans.fit(emb, k = 8, iters = 2)
    assert(centList(cent) != centList(budget2))
  }

  test("s33: the fixed-size sample bounds training depth below the full corpus's") {
    // the scale motivation measured end-to-end: full-corpus depth GROWS
    // with data (13/25/30/127 at sf0.001→sf1) while the hash-prefix
    // sample's stays flat (8/9/6/5) — here both are re-derived live on
    // the fixture rather than trusted from the notes
    val samp = emb.withColumn("hrank",
        pmod(pmod(col("vec_id"), lit(1000003L)) * lit(427799L), lit(1000003L)))
      .orderBy(col("hrank"), col("vec_id")).limit(ExtensionQueries8.KmSampleN)
      .select(col("vec_id"), col("v"))
    val (_, _, sampIters) = Kmeans.fitConverged(samp, k = 8,
      maxIters = ExtensionQueries8.KmConvMaxIters)
    val (_, _, fullIters) = Kmeans.fitConverged(emb, k = 8,
      maxIters = ExtensionQueries8.KmConvMaxIters)
    assert(sampIters < fullIters,
      s"sample depth $sampIters should undercut full depth $fullIters")
    assert(sampIters <= ExtensionQueries8.KmSampleOracleUnroll,
      s"s33 oracle unroll is below the sample depth $sampIters")
  }

  test("s33: full-corpus assignment covers every vector exactly once") {
    val rows = ExtensionQueries8.all("s33_kmeans_sampled")(spark, dir)
      .select(col("cell"), col("n_members")).distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val corpus = emb.count()
    assert(rows.map(_._2).sum == corpus,
      s"per-cell members ${rows.toList} must partition the $corpus-vector corpus")
  }

  // ---- d20: banding-design S-curve invariants ----

  test("d20 rows are ordered by rows-per-band with monotone threshold and candidate volume") {
    val rows = ExtensionQueries8.all("d20_lsh_band_tuning")(spark, dir)
      .collect().toList.map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.length == ExtensionQueries8.BandGrid.size)
    assert(rows.forall { case (b, r, _, _, _, _, _) =>
      b * r == ExtensionQueries8.LshSigSize })
    val nPairs = rows.map(_._4).distinct
    assert(nPairs.size == 1, s"every scheme prices the same pair set: $nPairs")
    // deeper bands (more rows per band) ⇒ higher collision threshold,
    // fewer expected candidates, more expected missed dups — the S-curve
    // tradeoff the table exists to price
    val byR = rows.sortBy(_._2)
    assert(byR.map(_._2) == rows.map(_._2), "output is ordered by rows_per_band")
    assert(byR.map(_._3).sliding(2).forall(p => p.head < p.last),
      "s* strictly increases with rows per band")
    assert(byR.map(_._5).sliding(2).forall(p => p.head > p.last),
      "expected candidates strictly decrease with rows per band")
    assert(byR.map(_._6).sliding(2).forall(p => p.head <= p.last),
      "expected missed dups cannot decrease with rows per band")
    // probabilities stay probabilities after the fixed-point sums
    assert(rows.forall { case (_, _, _, n, cand, _, fal) =>
      cand >= 0 && cand <= n.toDouble && fal >= 0 && fal <= cand })
  }

  test("e17: variants partition every event and z's sign follows the mean gap") {
    val rows = ExtensionQueries8.all("e17_ab_test")(spark, dir)
      .collect().toList.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.load(spark, dir, "events").count()
    assert(rows.map(r => r._2 + r._3).sum == total,
      "the two variants must partition every event exactly once")
    rows.foreach { case (tpe, _, _, ma, mb, z, sig) =>
      assert((z > 0) == (mb > ma) || z == 0.0, s"$tpe: z=$z vs means $ma/$mb")
      assert(sig == (math.abs(z) >= 1.959964), s"$tpe: flag disagrees with z=$z")
    }
  }

  test("t33: the effective token budget never exceeds the raw one and sees the planted dups") {
    val rows = ExtensionQueries8.all("t33_dedup_weighted_tokens")(spark, dir)
      .collect().toList.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, raw, eff, frac) =>
      assert(nDocs > 0 && raw > 0, src)
      assert(eff > 0 && eff <= raw.toDouble, s"$src: effective $eff vs raw $raw")
      assert(frac > 0 && frac <= 1.0, s"$src: fraction $frac")
    }
    assert(rows.exists(_._5 < 1.0),
      "the fixture plants near-duplicates — some source must be discounted")
  }

  test("e18: users partition into variants and the flag follows the rounded z") {
    val r = ExtensionQueries8.all("e18_ab_conversion")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (na, nb, ca, cb) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val users = graft.sources.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(na + nb == users, "variants must partition the user base")
    assert(ca <= na && cb <= nb)
    assert(ca > 0 && ca < na, "conversion must be interior — a saturated rate has no variance")
    val z = row.getDouble(6)
    assert(row.getBoolean(7) == (math.abs(z) >= 1.959964))
  }

  test("d21: pair and doc exposure shrink monotonically as the threshold rises") {
    val rows = ExtensionQueries8.all("d21_dedup_threshold_sweep")(spark, dir)
      .collect().toList.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.map(_._1) == rows.map(_._1).sorted)
    assert(rows.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "dup pairs cannot grow with a stricter threshold")
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "doc exposure cannot grow with a stricter threshold")
    rows.foreach { case (t, pairs, docs) =>
      assert(docs <= 2 * pairs, s"t=$t: $docs docs from $pairs pairs")
      assert(pairs == 0 || docs > 0)
    }
  }

  // ---- t32: inverted-index lake ----

  test("index-serving BM25 equals t25's end-to-end computation") {
    val served = ExtensionQueries8.all("t32_inverted_index_lake")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val direct = ExtensionQueries4.all("t25_bm25")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(served.toList == direct.toList)
  }

  test("the serving scan is pruned to the probe terms' hash-bucket partitions") {
    val df = ExtensionQueries8.all("t32_inverted_index_lake")(spark, dir)
    val probeBuckets = ExtensionQueries4.Bm25Terms
      .map(t => (ExtensionQueries8.md5Hash48Lit(t) % ExtensionQueries8.IndexBuckets).toInt)
      .toSet
    assert(probeBuckets.size < ExtensionQueries8.IndexBuckets,
      "fixture probe terms should not cover every bucket")
    // inputFiles reports the UNPRUNED listing — inspect the physical scan's
    // selected partitions instead (the PlanSpec partition-pruning pattern)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def leaves(p: SparkPlan): Seq[SparkPlan] = p.collectLeaves().flatMap {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case x => Seq(x)
    }
    val scans = leaves(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("/postings")) => f
    }
    assert(scans.nonEmpty, "serving must scan the postings artifact:\n" +
      df.queryExecution.executedPlan.toString)
    val touched = scans.flatMap(_.selectedPartitions.toPartitionArray.flatMap { pf =>
      "pbucket=(\\d+)".r.findFirstMatchIn(pf.filePath.toString).map(_.group(1).toInt)
    }).toSet
    assert(touched.nonEmpty && touched.subsetOf(probeBuckets),
      s"scan touched non-probe buckets: ${touched -- probeBuckets} (touched $touched)")
  }

  test("driver-side md5Hash48Lit mirrors the engine hash bit-for-bit") {
    val terms = ExtensionQueries4.Bm25Terms ++ Seq("", "a", "Zürich", "the quick brown fox")
    import spark.implicits._
    val engine = terms.toDF("t")
      .select(ExtensionQueries3.md5Hash48(col("t")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(engine == terms.map(ExtensionQueries8.md5Hash48Lit))
  }
}
