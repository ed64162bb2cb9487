package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20: production-shaped geometry for the graph-ANN family and the
  * published-artifact steady-state serve.
  *
  *  - [[ExtensionQueries11.ivfCellsFor]] is the n/target rule: the in-cap
  *    fraction of the scaled index is ~capR/target at EVERY corpus scale
  *    (s45 reads it off; the r20 gate is ≥ 50%), where the pinned
  *    fixture geometry saturates at k·capR = 256 vectors total.
  *  - s46 serves s43's exact rows from the PUBLISHED maintained artifacts
  *    alone — publication is a commitReplace v2 with v1 (the prior
  *    build's serving artifacts) time-travelable.
  *  - The maintenance refactor (idx threading, r19 verdict item 3) changes
  *    nothing: the maintenance DAG is built once per body and repeated
  *    invocations do not grow the session's persisted-RDD set.
  */
class Round20Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("ivfCellsFor is the n/target occupancy rule") {
    import ExtensionQueries11.{ivfCellsFor, GraphTargetCell, OracleScaledCells}
    assert(GraphTargetCell == 48)
    assert(ivfCellsFor(500) == 11)
    assert(OracleScaledCells == 11, "oracle k must bake the same rule")
    assert(ivfCellsFor(2000) == 42)
    assert(ivfCellsFor(200000) == 4167)
    assert(ivfCellsFor(1) == 2, "Lloyd's needs at least two cells")
    // the property the rule exists for: max servable fraction k*capR/n
    // is scale-free (>= target coverage) where the pinned 8 cells decay
    for (n <- Seq(500L, 20000L, 200000L)) {
      val frac = ivfCellsFor(n).toDouble * ExtensionQueries3.GraphCapR / n
      assert(frac >= ExtensionQueries3.GraphCapR.toDouble / GraphTargetCell,
        s"n=$n: cap capacity must stay >= capR/target")
    }
  }

  test("s45's audit reads production-shaped coverage at the oracle scale") {
    val row = ExtensionQueries11.all("s45_graph_coverage_scaled")(spark, dir)
      .collect().head
    val n = row.getAs[Long]("n_vectors")
    val k = row.getAs[Int]("n_cells")
    val inCap = row.getAs[Long]("n_in_cap")
    val reach = row.getAs[Long]("n_reachable")
    val pct = row.getAs[Double]("in_cap_pct")
    assert(n == 500L && k == 11)
    assert(inCap <= k.toLong * ExtensionQueries3.GraphCapR,
      "in-cap is bounded by cells x capR")
    assert(reach <= inCap, "only cap members can be anyone's neighbor")
    assert(pct >= 50.0,
      s"the scaled geometry must keep >=50% of the corpus servable, got $pct")
  }

  test("s44's walk serves candidates outside the pinned geometry's " +
      "256-vector ceiling") {
    val rows = ExtensionQueries11.all("s44_graph_walk_scaled")(spark, dir)
      .collect()
    assert(rows.length == 15, "3 fixed queries x top-5 (the output law)")
    // r22, closing the r20 "vacuous assertion" advice: the old comment
    // claimed "every result is in-cap under the SCALED posting", and that
    // claim is FALSE — checked this round: the walk's candidate universe
    // is the SYMMETRIZED edge endpoints plus the IVF entry heads (built
    // over the full assignment), so reversed edges legally serve
    // out-of-cap vectors (3 of 15 on this fixture). What the scaled
    // geometry actually promises — and what this test's name says — is
    // that the servable set outgrows the pinned geometry's k·capR = 256
    // ceiling with the corpus. Assert THAT, structurally, by rebuilding
    // the scaled posting from the same factored operators; the oracle
    // pins the row values.
    val served = rows.map(_.getAs[Long]("vec_id")).toSet
    assert(served.nonEmpty)
    val e = ExtensionQueries.embeddingsD(spark, dir)
    val k = ExtensionQueries11.ivfCellsFor(
      graft.sources.Tables.rowCount(spark, dir, "embeddings"))
    val (cent, assigned) = graft.operators.Kmeans.fit(
      e.select(col("vec_id"), col("v")), k = k,
      iters = ExtensionQueries.IvfIters)
    val inCap = ExtensionQueries3.cappedPosting(assigned, cent,
        Some(ExtensionQueries3.GraphCapR))
      .select(col("vec_b")).collect().map(_.getLong(0)).toSet
    val pinnedCeiling = ExtensionQueries.IvfCells * ExtensionQueries3.GraphCapR
    assert(inCap.size > pinnedCeiling,
      s"scaled posting (${inCap.size}) must outgrow the pinned " +
        s"$pinnedCeiling-member ceiling")
    // and the walk does draw on the scaled set: most served ids are
    // in-cap members (the out-of-cap minority rides reversed edges)
    assert(served.count(inCap) > served.size / 2,
      s"served=$served inCapServed=${served.filter(inCap)}")
  }

  test("s46 serves s43's exact rows from the published artifacts alone") {
    val published =
      ExtensionQueries11.all("s46_graph_walk_published")(spark, dir)
        .collect().toSeq
    val fused = ExtensionQueries10.all("s43_graph_walk_maintained")(spark, dir)
      .collect().toSeq
    assert(published.nonEmpty && published == fused,
      "the publication round trip must change nothing")
    // the lifecycle is real: v2 published over a time-travelable v1
    val root = ExtensionQueries11.s46Root(spark, dir)
    for (t <- Seq("edges", "heads"))
      assert(graft.sources.Snapshots.versions(spark, s"$root/$t") ==
        Seq(1, 2), s"$t must carry the prior build (v1) and the publish (v2)")
    assert(graft.sources.Snapshots.versions(spark, s"$root/centroids") ==
      Seq(1), "the codebook is fixed between nightly rebuilds")
    // v1 really is the prior build's serving artifact
    val prior = ExtensionQueries10.s41PriorRoot(spark, dir)
    val priorEdges = graft.sources.Snapshots
      .readLatest(spark, s"$prior/edges")
    val raw = priorEdges.select(col("vec_id").as("src"),
      col("neighbor").as("dst"))
    val priorSym = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().orderBy(col("src"), col("dst")).collect().toSeq
    val v1 = graft.sources.Snapshots.readAsOf(spark, s"$root/edges", 1)
      .orderBy(col("src"), col("dst")).collect().toSeq
    assert(v1 == priorSym)
  }

  test("s47's routed assignment audit: the candidate saving is real and " +
      "the agreement is graded against the exact argmax") {
    import ExtensionQueries11.{superCellsFor, SuperProbe}
    assert(SuperProbe == 2)
    assert(superCellsFor(11) == 5)     // oracle-scale geometry
    assert(superCellsFor(4167) == 92)  // sf10 audit geometry
    val row = ExtensionQueries11.all("s47_routed_assign_audit")(spark, dir)
      .collect().head
    val n = row.getAs[Long]("n_vectors")
    val k = row.getAs[Int]("n_cells")
    val m = row.getAs[Int]("n_supercells")
    val agree = row.getAs[Long]("n_agree")
    val pct = row.getAs[Double]("agree_pct")
    val cand = row.getAs[Double]("avg_cand_per_vec_routed")
    assert(n == 500L && k == 11 && m == 5)
    assert(agree <= n && pct ==
      math.floor(agree * 100.0 / n * 100 + 0.5) / 100)
    assert(cand < k.toDouble,
      s"routing must scan fewer candidates than flat argmax ($cand vs $k)")
    assert(agree * 100.0 / n >= 60.0,
      s"routing should mostly agree with the exact argmax, got $pct%")
  }

  test("repeated maintenance-family invocations do not grow the " +
      "persisted-RDD set (idx threading + CacheManager plan dedupe)") {
    def runOnce(): Unit = {
      ExtensionQueries10.all("s42_graph_coverage")(spark, dir).count()
      ExtensionQueries10.all("s43_graph_walk_maintained")(spark, dir).count()
    }
    runOnce()
    val n1 = spark.sparkContext.getPersistentRDDs.size
    runOnce()
    val n2 = spark.sparkContext.getPersistentRDDs.size
    assert(n2 == n1,
      s"second invocation must reuse the first's cache entries ($n1 -> $n2)")
  }
}
