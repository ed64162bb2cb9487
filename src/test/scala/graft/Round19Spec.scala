package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19: the stored graph-ANN serving family's contracts.
  *
  *  - s40's storage round trip changes NOTHING: the serve over stored
  *    artifacts is row-identical to s39's live-build walk (the s24
  *    precedent applied to the graph family).
  *  - s41's incremental maintenance equals the fixed-codebook full
  *    rebuild at fixture scale (the oracle's claim, re-proven here
  *    engine-side so a DuckDB dialect accident can't mask a drift).
  *  - The EVICTION contract on constructed geometry: a delta vector
  *    entering a cell's occupancy cap evicts the rank-R member, and
  *    every prober of that cell re-ranks from the cell's new full list
  *    — the case where per-edge patching (stored edges ∪ delta edges)
  *    would be provably wrong, because a stored edge to an evicted
  *    member has no stored rank-4 fallback.
  *  - The UNCHANGED-cell contract: a delta that lands in a cell without
  *    entering its top-R leaves that cell's probers' stored rows
  *    spliced through untouched (changed-cell detection, step 3 of
  *    [[ExtensionQueries10.maintainGraph]]).
  */
class Round19Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  import ExtensionQueries.{IvfCells, IvfIters, IvfProbe}
  import ExtensionQueries3.GraphCapR

  // ---- s40: stored serve ≡ live-build walk ----

  test("s40 serves s39's exact rows from stored artifacts alone") {
    val stored = ExtensionQueries10.all("s40_graph_walk_stored")(spark, dir)
      .collect().toSeq
    val live = ExtensionQueries8.all("s39_graph_walk_ivf_sym")(spark, dir)
      .collect().toSeq
    assert(stored.nonEmpty && stored == live,
      "the storage round trip must change nothing")
    // the artifacts really are versioned Snapshots tables
    val root = ExtensionQueries10.s40Root(spark, dir)
    for (t <- Seq("edges", "heads", "centroids"))
      assert(graft.sources.Snapshots.versions(spark, s"$root/$t") == Seq(1))
  }

  // ---- s41: incremental ≡ fixed-codebook rebuild at fixture scale ----

  test("s41's maintained graph equals the fixed-codebook full rebuild") {
    val maintained = ExtensionQueries10.all("s41_incremental_graph")(spark, dir)
      .collect().toSeq
    val e = ExtensionQueries.embeddingsD(spark, dir)
      .select(col("vec_id"), col("v"))
    val prior = e.filter(ExtensionQueries.priorCorpus(col("vec_id")))
    val delta = e.filter(ExtensionQueries.ingestDelta(col("vec_id")))
    val (cent, assigned) = graft.operators.Kmeans.fit(
      prior, k = IvfCells, iters = IvfIters)
    val member = assigned.unionByName(
      graft.operators.Kmeans.assign(delta, cent))
    val rebuilt = ExtensionQueries3.knnGraphEdges(
        ExtensionQueries3.graphProbes(e, cent, IvfProbe),
        ExtensionQueries3.cappedPosting(member, cent, Some(GraphCapR)))
      .orderBy(col("vec_id"), col("rank"))
      .collect().toSeq
    assert(maintained.nonEmpty && maintained == rebuilt,
      "incremental maintenance must reproduce the rebuild row-for-row")
  }

  // ---- constructed geometry: eviction + unchanged-cell contracts ----

  // 2-dim fixture around two fixed unit centroids. Cell 0: p1 dominates,
  // p2 is the cap's rank-2 member, p3 sits outside the cap (capR = 2).
  // Cell 1: p4/p5 fill the cap. Delta d1 lands in cell 0 ABOVE p2
  // (eviction), d2 lands in cell 1 BELOW both members (touched, not
  // changed).
  private def vecDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }
  private lazy val centC = {
    import spark.implicits._
    Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("cell", "cv")
  }
  private val priorRows = Seq(
    1L -> Seq(1.0, 0.0),   // p1: cell 0, bcos 1.0
    2L -> Seq(0.9, 0.1),   // p2: cell 0, bcos ~0.9939 (cap rank 2)
    3L -> Seq(0.8, 0.2),   // p3: cell 0, bcos ~0.9701 (outside cap)
    4L -> Seq(0.0, 1.0),   // p4: cell 1, bcos 1.0
    5L -> Seq(0.1, 0.9))   // p5: cell 1, bcos ~0.9939
  private val deltaRows = Seq(
    10L -> Seq(0.99, 0.01), // d1: cell 0, bcos ~0.99995 — evicts p2
    11L -> Seq(0.3, 0.7))   // d2: cell 1, bcos ~0.9191 — below the cap
  private val CapR = 2
  private val NProbe = 1

  private def buildIndex(corpus: DataFrame) = {
    val member = graft.operators.Kmeans.assign(corpus, centC)
    val posting = ExtensionQueries3.cappedPosting(member, centC, Some(CapR))
    val probes = ExtensionQueries3.graphProbes(corpus, centC, NProbe)
    val edges = ExtensionQueries3.knnGraphEdges(probes, posting)
    (posting, probes, edges)
  }

  test("a delta entering the cap evicts the rank-R member and every " +
      "prober of that cell re-ranks — where per-edge patching would be wrong") {
    val prior = vecDf(priorRows)
    val delta = vecDf(deltaRows)
    val (posting, probes, edges) = buildIndex(prior)
    // the stored graph DID carry p3 -> p2 (so the retraction below is real)
    val storedP3 = edges.filter(col("vec_id") === 3L)
      .collect().map(_.getAs[Long]("neighbor")).toSet
    assert(storedP3 == Set(1L, 2L))
    val maintained = ExtensionQueries10.maintainGraph(
        centC, posting, probes, edges, delta, NProbe, CapR)
      .orderBy(col("vec_id"), col("rank"))
    val got = maintained.collect().toSeq
    // equality with the rebuild over the full constructed corpus
    val (_, _, rebuiltEdges) = buildIndex(prior.unionByName(delta))
    val rebuilt = rebuiltEdges.orderBy(col("vec_id"), col("rank"))
      .collect().toSeq
    assert(got == rebuilt)
    // the eviction was honored: cell 0's cap is now {p1, d1}, so p3's
    // re-ranked edges are {p1, d1} — p2 retracted, not patched around
    val p3Edges = got.filter(_.getAs[Long]("vec_id") == 3L)
      .map(_.getAs[Long]("neighbor")).toSet
    assert(p3Edges == Set(1L, 10L),
      s"p3 must re-rank to {p1, d1} after p2's eviction, got $p3Edges")
    assert(!got.exists(r => r.getAs[Long]("neighbor") == 2L),
      "no maintained edge may still point at the evicted member")
  }

  test("a touched-but-unchanged cell splices its probers' stored rows " +
      "through untouched") {
    val prior = vecDf(priorRows)
    val d2Only = vecDf(deltaRows.filter(_._1 == 11L))
    val (posting, probes, edges) = buildIndex(prior)
    val maintained = ExtensionQueries10.maintainGraph(
        centC, posting, probes, edges, d2Only, NProbe, CapR)
    // d2 lands in cell 1 below both cap members: cell 1 is touched but
    // its cap is unchanged, so p4/p5 keep their stored rows verbatim
    val keep = maintained.filter(col("vec_id").isin(4L, 5L))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val stored = edges.filter(col("vec_id").isin(4L, 5L))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(keep == stored)
    // d2 itself still gets served edges from its probed cell's cap
    val d2Edges = maintained.filter(col("vec_id") === 11L)
      .collect().map(_.getAs[Long]("neighbor")).toSet
    assert(d2Edges == Set(4L, 5L))
    // and the whole table still equals the rebuild
    val (_, _, rebuiltEdges) = buildIndex(prior.unionByName(d2Only))
    assert(maintained.orderBy(col("vec_id"), col("rank")).collect().toSeq ==
      rebuiltEdges.orderBy(col("vec_id"), col("rank")).collect().toSeq)
  }

  // ---- s43: serve from maintained ≡ serve from rebuilt ----

  test("s43's walk over the maintained artifacts equals the walk over " +
      "the fixed-codebook rebuild") {
    val served = ExtensionQueries10.all("s43_graph_walk_maintained")(spark, dir)
      .collect().toSeq
    // the rebuild-side serve, constructed independently of the
    // maintenance pass: fixed-codebook graph + heads from full membership
    val e = ExtensionQueries.embeddingsD(spark, dir)
      .select(col("vec_id"), col("v"))
    val prior = e.filter(ExtensionQueries.priorCorpus(col("vec_id")))
    val delta = e.filter(ExtensionQueries.ingestDelta(col("vec_id")))
    val (cent, assigned) = graft.operators.Kmeans.fit(
      prior, k = IvfCells, iters = IvfIters)
    val member = assigned.unionByName(
      graft.operators.Kmeans.assign(delta, cent))
    val raw = ExtensionQueries3.knnGraphEdges(
        ExtensionQueries3.graphProbes(e, cent, IvfProbe),
        ExtensionQueries3.cappedPosting(member, cent, Some(GraphCapR)))
      .select(col("vec_id").as("src"), col("neighbor").as("dst"))
    val g = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val heads = ExtensionQueries8.ivfHeads(cent, member)
    val q = ExtensionQueries.embeddingsD(spark, dir)
      .filter(col("vec_id") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val seeds = ExtensionQueries8.ivfQCells(q, cent)
      .join(heads, Seq("cell")).select(col("query_id"), col("vec_id"))
    val rebuiltServe = ExtensionQueries8.walkOver(g,
        ExtensionQueries.embeddingsD(spark, dir), q, (_, _) => seeds)
      .collect().toSeq
    assert(served.nonEmpty && served == rebuiltServe,
      "the intraday serve must match the rebuild-side serve hop for hop")
  }

  // ---- artifact lifecycle: publish the maintained graph as v2 ----

  test("the maintained graph publishes as version 2 of the artifact " +
      "tables — time travel to the prior build intact") {
    // isolated scratch root: the session-shared s41PriorRoot must NOT be
    // mutated (s41/s42/s43 read its latest version as 'the prior')
    val prior = vecDf(priorRows)
    val delta = vecDf(deltaRows)
    val (posting, probes, edges) = buildIndex(prior)
    val root = graft.sources.Scratch.fresh(spark, "r19_publish_test")
    val v1 = graft.sources.Snapshots.commit(spark, s"$root/edges", edges)
    assert(v1 == 1)
    val maintained = ExtensionQueries10.maintainGraph(
      centC, posting, probes, edges, delta, NProbe, CapR)
    // the nightly/maintenance publication is a whole-table rewrite of
    // the edge artifact (commitReplace): readers before the publish see
    // v1, after see v2, and v1 stays time-travelable
    val v2 = graft.sources.Snapshots.commitReplace(spark, s"$root/edges",
      maintained)
    assert(v2 == 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("vec_id"), col("rank")).collect().toSeq
    assert(rows(graft.sources.Snapshots.readAsOf(spark, s"$root/edges", 1)) ==
      rows(edges))
    assert(rows(graft.sources.Snapshots.readLatest(spark, s"$root/edges")) ==
      rows(maintained))
  }

  // ---- s22 carries the composition row ----

  test("s22's method table includes graph_walk_ivf_sym") {
    assert(ExtensionQueries6.AnnMethodNames.contains("graph_walk_ivf_sym"))
  }

  // ---- s42: coverage audit consistency ----

  test("s42's coverage audit is consistent with the maintained artifacts") {
    val rows = ExtensionQueries10.all("s42_graph_coverage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("delta", "prior"))
    val n = ExtensionQueries.embeddingsD(spark, dir).count()
    assert(rows.values.map(_._1).sum == n, "lanes must partition the corpus")
    // the prior index never evicts its own lane's rows FOR the delta
    // lane; evictions land on prior members only
    assert(rows("delta")._4 == 0L)
    for ((lane, (nv, inCap, reach, ev)) <- rows) {
      assert(inCap <= nv && reach <= nv && ev <= nv, s"$lane counts bounded")
    }
    // in-cap delta members are exactly the cap's delta rows
    val root = ExtensionQueries10.s41PriorRoot(spark, dir)
    val posting = graft.sources.Snapshots.readLatest(spark, s"$root/posting")
    val cent = graft.sources.Snapshots.readLatest(spark, s"$root/centroids")
    val delta = ExtensionQueries.embeddingsD(spark, dir)
      .filter(ExtensionQueries.ingestDelta(col("vec_id")))
      .select(col("vec_id"), col("v"))
    val idx = ExtensionQueries10.maintainPosting(cent, posting, delta,
      GraphCapR)
    val deltaInCap = idx.capAfter
      .join(delta.select(col("vec_id").as("vec_b")), Seq("vec_b"),
        "left_semi")
      .select(col("vec_b")).distinct().count()
    assert(rows("delta")._2 == deltaInCap)
  }
}
