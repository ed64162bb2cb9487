package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 additions: the stored + incrementally-maintained graph-ANN
  * serving family — the one LLM-pipeline family whose 100 TB artifact
  * story was still build-per-session (r18 verdict item 1).
  *
  * s40 persists the symmetrized occupancy-capped kNN graph, the IVF
  * entry heads, and the codebook as versioned Snapshots tables (the
  * s24/q94 stored-artifact pattern) and registers the serving row that
  * reads ONLY stored artifacts — row-equal to s39's live-build form by
  * construction (training is deterministic and doubles round-trip
  * parquet bit-exactly; Round19Spec pins the equality, and the shared
  * oracle is the hash gate).
  *
  * s41 applies the d17/d22/d29 incremental-maintenance discipline to the
  * stored graph: the day's delta vectors attach through delta×stored-index
  * candidate joins plus an occupancy-cap re-rank per touched cell — never
  * a prior×prior re-match — and the maintained edge table PROVABLY equals
  * the fixed-codebook rebuild (the oracle; proof sketch at
  * [[maintainGraph]]). What is NOT maintainable this way is pinned as
  * contract, d29-style: retraining the codebook moves every cell
  * boundary, so codebook refresh belongs to the nightly full rebuild
  * (s31/s39's path), exactly the d28/d29 and q99/q104 split.
  */
object ExtensionQueries10 {

  import ExtensionQueries.{IvfCells, IvfIters, IvfProbe}
  import ExtensionQueries3.GraphCapR

  private val s40Memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Session-scoped stored SERVING artifacts for s40 (in a deployment:
    * written by the nightly graph-build job): the symmetrized capped
    * edge set, the per-cell entry heads, and the codebook, each a
    * versioned Snapshots table. The edge set is s31's capped graph
    * symmetrized at BUILD time (out ∪ reversed, deduplicated) — the
    * symmetrization is a projection of stored edges (≤ 2·n·R rows), and
    * persisting the projected form means the serve pays zero per-query
    * union/distinct. Heads and codebook are cells-bounded (≤ k rows).
    * computeIfAbsent for the same reason as [[ExtensionQueries8
    * .d22PriorRoot]]: a racing duplicate build would interleave
    * Scratch.fresh's delete+mkdir under one path.
    */
  private[graft] def s40Root(s: SparkSession, dir: String): String = {
    s40Memo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
    s40Memo.computeIfAbsent((s, dir), { _ =>
      val e = ExtensionQueries.embeddingsD(s, dir)
      val (cent, assigned) = graft.operators.Kmeans.fit(
        e.select(col("vec_id"), col("v")), k = IvfCells, iters = IvfIters)
      val raw = ExtensionQueries3.knnGraph(s, dir, IvfProbe, Some(GraphCapR))
        .select(col("vec_id").as("src"), col("neighbor").as("dst"))
      val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val root = graft.sources.Scratch.fresh(s,
        s"s40_graph_${graft.sources.Scratch.dirTag(dir)}")
      graft.sources.Snapshots.commit(s, s"$root/edges", sym)
      graft.sources.Snapshots.commit(s, s"$root/heads",
        ExtensionQueries8.ivfHeads(cent, assigned))
      graft.sources.Snapshots.commit(s, s"$root/centroids", cent)
      root
    })
  }

  private val s41Memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Session-scoped stored PRIOR index for s41 (in a deployment: written
    * by yesterday's graph-build job over yesterday's corpus — every
    * vector outside the shared [[ExtensionQueries.ingestDelta]]
    * convention): the codebook, the occupancy-capped posting lists WITH
    * vectors (what IVF stores — cell scans never touch the raw corpus),
    * the probe index with vectors (the s24 assignments-with-vectors
    * artifact fanned by nprobe, so the maintenance pass reads affected
    * vectors from the index instead of re-passing the corpus), and the
    * prior capped graph's edges. Posting is cells·R-bounded; probes and
    * edges are linear in the prior corpus (nprobe·n and 3·n rows).
    */
  private[graft] def s41PriorRoot(s: SparkSession, dir: String): String = {
    s41Memo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
    s41Memo.computeIfAbsent((s, dir), { _ =>
      val prior = ExtensionQueries.embeddingsD(s, dir)
        .filter(ExtensionQueries.priorCorpus(col("vec_id")))
        .select(col("vec_id"), col("v"))
      val (cent, assigned) = graft.operators.Kmeans.fit(
        prior, k = IvfCells, iters = IvfIters)
      val posting = ExtensionQueries3.cappedPosting(assigned, cent,
        Some(GraphCapR))
      val probes = ExtensionQueries3.graphProbes(prior, cent, IvfProbe)
      // persist: probes feeds both the edge build below and the commit;
      // posting likewise — without it the candidate join re-runs per sink
      posting.persist(); probes.persist()
      val edges = ExtensionQueries3.knnGraphEdges(probes, posting)
      val root = graft.sources.Scratch.fresh(s,
        s"s41_prior_${graft.sources.Scratch.dirTag(dir)}")
      graft.sources.Snapshots.commit(s, s"$root/centroids", cent)
      graft.sources.Snapshots.commit(s, s"$root/posting", posting)
      graft.sources.Snapshots.commit(s, s"$root/probes", probes)
      graft.sources.Snapshots.commit(s, s"$root/edges", edges)
      root
    })
  }

  /** The incremental graph-maintenance pass: fold a delta of new vectors
    * into a stored capped-kNN-graph index under a FIXED codebook, and
    * return the maintained edge table.
    *
    * Steps (all delta-driven — prior×prior candidate work never re-runs):
    *  1. assign each delta vector to its nearest stored centroid (the
    *     s30 IVF-insert rule) — its posting cell and probe cells;
    *  2. re-rank the occupancy cap of each TOUCHED cell over
    *     (stored top-R ∪ that cell's delta members);
    *  3. a touched cell is CHANGED iff a delta member entered its top-R
    *     (otherwise the re-rank provably returns the stored list:
    *     stored members dominate the union's ranking);
    *  4. affected vectors = delta vectors ∪ prior vectors whose stored
    *     probe index reaches a changed cell; ONLY their edges are
    *     recomputed, over the updated posting lists — eviction is
    *     handled exactly because a prober of a changed cell re-ranks
    *     from the cell's full new list, never by patching stored rows
    *     (a stored edge to an evicted member has no stored rank-4
    *     fallback, so per-edge patching cannot be exact);
    *  5. splice: stored edges for unaffected vectors ∪ recomputed rows.
    *
    * EQUALITY (the s41 oracle, pinned on constructed eviction geometry
    * by Round19Spec): the result equals the graph rebuilt from scratch
    * over the full corpus under the SAME codebook and membership rule.
    * Cap exactness: top-R(P ∪ D) = top-R(top-R(P) ∪ D) — any prior
    * member outside the stored cap has ≥ R stored members above it, all
    * present in the union, so it cannot enter the new top-R. Probe sets
    * are a pure function of the fixed codebook, so prior probe rows
    * never move; a vector none of whose probed cells changed has an
    * unchanged candidate set, so its stored edges are the rebuild's
    * rows verbatim.
    *
    * CONTRACT (what incremental maintenance cannot do): refresh the
    * codebook. Retraining moves every cell boundary — membership,
    * probes, caps — which retracts candidate pairs globally; that is
    * the nightly rebuild (s31/s39/s40's build). The d29 name-lane
    * ruling, applied to geometry.
    *
    * Scale shape: per-ingest work is |delta| assignments (k-row
    * broadcast), a cap re-rank bounded by touched·(R+delta-per-cell),
    * and an edge recompute bounded by |probers of changed cells|·R·
    * nprobe candidate rows. Nothing here scans the prior corpus — the
    * probe index carries affected vectors' values — and the only
    * corpus-proportional term, |affected|, is the true damage radius of
    * the ingest: at production cell counts (cells ~ n/targetCellSize) a
    * bounded delta touches a bounded cell set; the fixture's 8 cells
    * make every cell change at ANY delta (affected = everyone), which
    * prices the worst case — still cheaper than the rebuild by the
    * whole training phase (see PLANS.md r19 for the measured split).
    */
  /** The posting half of the maintenance pass (steps 1–3 above), shared
    * by s41's edge maintenance and s42's coverage audit: `assignD` the
    * delta's cell assignments (keyed as posting rows), `changed` the
    * cells whose capped list actually moved, `capAfter` the maintained
    * posting lists.
    */
  private[graft] case class MaintainedIndex(
      assignD: DataFrame, changed: DataFrame, capAfter: DataFrame)

  /** Cache ownership (r19 advice item 2, measured r20): the persists here
    * are keyed by CANONICAL PLAN in Spark's CacheManager, and every
    * invocation over the same stored root builds the identical plan — so
    * repeated bench/Verify invocations reuse ONE cache entry per
    * intermediate ("Asked to cache already cached data"), they do not
    * accumulate copies. Round20Spec pins this: the persisted-RDD count is
    * flat across repeated s42/s43 invocations. Session end clears the rest.
    */
  private[graft] def maintainPosting(
      cent: DataFrame,    // (cell, cv) — the stored codebook
      posting: DataFrame, // (vec_b, vb, cell_b) — stored capped posting
      delta: DataFrame,   // (vec_id, v) — the day's new vectors
      capR: Int): MaintainedIndex = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.VectorOps
    val assignD = graft.operators.Kmeans.assign(delta, cent)
      .select(col("vec_id").as("vec_b"), col("v").as("vb"),
        col("cell").as("cell_b"))
      .persist()
    val touched = assignD.select(col("cell_b")).distinct()
    val wCap = Window.partitionBy(col("cell_b"))
      .orderBy(col("bcos").desc, col("vec_b").asc)
    val touchedCap = posting
      .join(broadcast(touched), Seq("cell_b"), "left_semi")
      .unionByName(assignD)
      .join(broadcast(cent.select(col("cell").as("cell_b"), col("cv"))),
        Seq("cell_b"))
      .withColumn("bcos", VectorOps.cosineFast(col("vb"), col("cv")))
      .withColumn("brn", row_number().over(wCap))
      .filter(col("brn") <= capR)
      .select(col("vec_b"), col("vb"), col("cell_b"))
      .persist()
    // changed ⇔ a delta member entered the cell's top-R (delta and prior
    // ids are disjoint by the ingest convention, so membership in assignD
    // identifies the delta rows)
    val changed = touchedCap
      .join(assignD.select(col("vec_b")), Seq("vec_b"), "left_semi")
      .select(col("cell_b")).distinct()
    val capAfter = posting
      .join(broadcast(changed), Seq("cell_b"), "left_anti")
      .unionByName(
        touchedCap.join(broadcast(changed), Seq("cell_b"), "left_semi"))
    MaintainedIndex(assignD, changed, capAfter)
  }

  /** Convenience form: builds the [[MaintainedIndex]] itself. Callers that
    * also need the index (s42's audit, s43's heads, s46's publication)
    * pass a precomputed one to the 8-arg form instead, so the
    * delta-assignment + cap re-rank DAG is constructed exactly once per
    * body (r19 verdict item 3).
    */
  private[graft] def maintainGraph(
      cent: DataFrame, posting: DataFrame, probes: DataFrame,
      edges: DataFrame, delta: DataFrame,
      nprobe: Int, capR: Int): DataFrame =
    maintainGraph(cent, posting, probes, edges, delta, nprobe, capR,
      maintainPosting(cent, posting, delta, capR))

  private[graft] def maintainGraph(
      cent: DataFrame,    // (cell, cv) — the stored codebook
      posting: DataFrame, // (vec_b, vb, cell_b) — stored capped posting
      probes: DataFrame,  // (vec_a, va, cell) — stored probe index
      edges: DataFrame,   // (vec_id, rank, neighbor, cell, cos) — stored graph
      delta: DataFrame,   // (vec_id, v) — the day's new vectors
      nprobe: Int, capR: Int,
      idx: MaintainedIndex): DataFrame = {
    val probesD = ExtensionQueries3.graphProbes(delta, cent, nprobe)
    // affected: no broadcast hint — bounded by the ingest's damage radius,
    // corpus-proportional only in the worst case (let AQE decide)
    val affected = probes
      .join(broadcast(idx.changed.select(col("cell_b").as("cell"))),
        Seq("cell"), "left_semi")
      .select(col("vec_a"))
      .unionByName(probesD.select(col("vec_a")))
      .distinct()
    val recomputed = ExtensionQueries3.knnGraphEdges(
      probes.unionByName(probesD).join(affected, Seq("vec_a"), "left_semi"),
      idx.capAfter)
    edges
      .join(affected.select(col("vec_a").as("vec_id")), Seq("vec_id"),
        "left_anti")
      .unionByName(recomputed)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stored graph-ANN serving (s40): the s39 walk over STORED artifacts
    // only — symmetrized capped edges, IVF entry heads, codebook, each a
    // versioned Snapshots table written by the (nightly) build job. The
    // serve routes each query over the stored codebook (k-row broadcast),
    // enters at the probed cells' stored heads, and beam-walks the stored
    // edge set: O(beam · degree · hops) per query, independent of n, and
    // — unlike s39's live-build row, which prices trainer + graph build
    // per session — this row prices ONLY the serve, which is what a
    // deployment pays per request. Its oracle is s39's verbatim, and
    // Round19Spec pins row-equality with the live-build form: the storage
    // round trip changes nothing (the s24 contract, applied to the graph
    // family).
    "s40_graph_walk_stored" -> ((s, dir) => {
      val root = s40Root(s, dir)
      val g = graft.sources.Snapshots.readLatest(s, s"$root/edges")
      val cent = graft.sources.Snapshots.readLatest(s, s"$root/centroids")
      val heads = graft.sources.Snapshots.readLatest(s, s"$root/heads")
      val e = ExtensionQueries.embeddingsD(s, dir)
      val q = e.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val seeds = ExtensionQueries8.ivfQCells(q, cent)
        .join(heads, Seq("cell"))
        .select(col("query_id"), col("vec_id"))
      ExtensionQueries8.walkOver(g, e, q, (_, _) => seeds)
    }),

    // Incremental graph maintenance (s41): fold the day's ingest into the
    // STORED graph index — delta×stored-index candidate edges + an
    // occupancy-cap re-rank per touched cell, recomputing only the
    // affected vectors' rows — instead of rebuilding trainer + graph over
    // the whole corpus (s31/s39's build, which stays the nightly
    // codebook-refresh path). The maintained table PROVABLY equals the
    // fixed-codebook rebuild (proof sketch at maintainGraph; Round19Spec
    // pins it on constructed eviction geometry where per-edge patching
    // would be wrong); the oracle IS that rebuild — prior corpus trains
    // the codebook, the full corpus is membered/probed under it, capped,
    // and edge-ranked from scratch. Equality is the contract, exactly
    // d29's shape: what cannot be maintained (codebook refresh) is pinned
    // to the nightly rebuild, not approximated.
    "s41_incremental_graph" -> ((s, dir) => {
      val root = s41PriorRoot(s, dir)
      def a(name: String) =
        graft.sources.Snapshots.readLatest(s, s"$root/$name")
      maintainGraph(a("centroids"), a("posting"), a("probes"), a("edges"),
          ExtensionQueries.embeddingsD(s, dir)
            .filter(ExtensionQueries.ingestDelta(col("vec_id")))
            .select(col("vec_id"), col("v")),
          IvfProbe, GraphCapR)
        .orderBy(col("vec_id"), col("rank"))
    }),

    // Serving from the MAINTAINED artifacts (s43): the ingest→maintain→
    // serve loop closed with no rebuild anywhere — s41's maintained
    // directed graph symmetrized (a projection, the s38/s40 rule), entry
    // heads re-read as the rank-1 rows of the MAINTAINED caps, queries
    // routed over the unchanged stored codebook, and the s39 beam walk
    // served over the result. This is the intraday serving path a
    // deployment runs between nightly rebuilds: the day's vectors are
    // walkable (enterable through their cells' heads, traversable
    // through their re-ranked edges) the moment the maintenance pass
    // lands. The oracle walks the fixed-codebook REBUILD's graph and
    // heads — equality holds because the maintained artifacts provably
    // equal the rebuild's (s41's contract), so the walk over them must
    // match hop for hop. Scale shape: maintenance as s41; the serve is
    // s40's O(beam · degree · hops) per query, independent of n.
    "s43_graph_walk_maintained" -> ((s, dir) => {
      val root = s41PriorRoot(s, dir)
      def a(name: String) =
        graft.sources.Snapshots.readLatest(s, s"$root/$name")
      val cent = a("centroids")
      val e = ExtensionQueries.embeddingsD(s, dir)
      val delta = e.filter(ExtensionQueries.ingestDelta(col("vec_id")))
        .select(col("vec_id"), col("v"))
      val idx = maintainPosting(cent, a("posting"), delta, GraphCapR)
      val maintained = maintainGraph(cent, a("posting"), a("probes"),
        a("edges"), delta, IvfProbe, GraphCapR, idx)
      val raw = maintained
        .select(col("vec_id").as("src"), col("neighbor").as("dst"))
      // persist: the beam loop references the edge set at EVERY hop, and
      // without the cache each reference re-executes the whole
      // maintenance DAG (walkFrom persists its edge set for the same
      // reason — measured here: 35.3 s unpersisted vs ~3 s cached at
      // sf0.1 standalone)
      val g = raw
        .union(raw.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .persist()
      // entry heads over the MAINTAINED caps: rank-1 per cell = rank-1
      // of the full fixed-codebook membership (the cap preserves top-R
      // order, so its first row is the membership's first row)
      val heads = ExtensionQueries8.ivfHeads(cent,
        idx.capAfter.select(col("vec_b").as("vec_id"),
          col("vb").as("v"), col("cell_b").as("cell")))
      val q = e.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      // no persist (r21): walkOver materializes each hop's beam to a
      // local relation, so the hop-0 seed sub-DAG executes exactly once
      val seeds = ExtensionQueries8.ivfQCells(q, cent)
        .join(heads, Seq("cell"))
        .select(col("query_id"), col("vec_id"))
      ExtensionQueries8.walkOver(g, e, q, (_, _) => seeds)
    }),

    // Graph serving-coverage audit (s42): the per-ingest monitoring row a
    // deployment alarms on after s41's maintenance pass — per lane
    // (prior/delta): how many vectors sit in some capped posting list
    // (in-cap: candidates for anyone's edges), how many have DIRECTED
    // in-edges in the maintained graph (reachable as a walk result
    // without symmetrization — the anti-hub count that motivated s38;
    // a vector with zero in-edges is invisible to a directed walk no
    // matter the hop budget), and how many stored cap members this
    // ingest EVICTED (the churn the occupancy cap trades for bounded
    // posting state). A delta vector that never enters a cap is ingested
    // but UNSERVABLE until the nightly rebuild — exactly the number that
    // decides the rebuild cadence. Scale shape: three id-projections of
    // the maintained artifacts joined to the corpus's (vec_id, lane)
    // pair, one |lanes|-row aggregate; nothing rescans vectors.
    "s42_graph_coverage" -> ((s, dir) => {
      val root = s41PriorRoot(s, dir)
      def a(name: String) =
        graft.sources.Snapshots.readLatest(s, s"$root/$name")
      val cent = a("centroids"); val posting = a("posting")
      val probes = a("probes"); val edges = a("edges")
      val e = ExtensionQueries.embeddingsD(s, dir)
      val delta = e.filter(ExtensionQueries.ingestDelta(col("vec_id")))
        .select(col("vec_id"), col("v"))
      val idx = maintainPosting(cent, posting, delta, GraphCapR)
      val maintained = maintainGraph(cent, posting, probes, edges, delta,
        IvfProbe, GraphCapR, idx)
      val inCap = idx.capAfter.select(col("vec_b").as("vec_id"))
        .distinct().withColumn("in_cap", lit(1L))
      val reach = maintained.select(col("neighbor").as("vec_id"))
        .distinct().withColumn("reachable", lit(1L))
      val evicted = posting.select(col("vec_b"), col("cell_b"))
        .join(idx.capAfter.select(col("vec_b"), col("cell_b")),
          Seq("vec_b", "cell_b"), "left_anti")
        .select(col("vec_b").as("vec_id"))
        .distinct().withColumn("evicted", lit(1L))
      e.select(col("vec_id"),
          when(ExtensionQueries.ingestDelta(col("vec_id")), "delta")
            .otherwise("prior").as("lane"))
        .join(inCap, Seq("vec_id"), "left")
        .join(reach, Seq("vec_id"), "left")
        .join(evicted, Seq("vec_id"), "left")
        .groupBy(col("lane"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(coalesce(col("in_cap"), lit(0L))).as("n_in_cap"),
          sum(coalesce(col("reachable"), lit(0L))).as("n_reachable"),
          sum(coalesce(col("evicted"), lit(0L))).as("n_evicted"))
        .orderBy(col("lane"))
    }))

  // ---- DuckDB SQL mirrors ----

  private def cosSql(a: String, b: String): String = {
    import ExtensionQueries.dotSql
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
  }

  /** The fixed-codebook rebuild's CTE chain, shared by the s41 and s42
    * oracles (ONE home — the IngestMod rule): `ef` the full corpus, `e`
    * the prior corpus (kmTrainingCtes' training input), training CTEs,
    * `dassign` the delta's nearest-centroid insert (the s30 rule),
    * `member` the full membership (prior = the training assignment
    * a$iters — what the stored index holds), `posting` the capped
    * lists, `probes` the full corpus's probe index, `ranked` the edge
    * ranking — knnGraphSql's verbatim shapes over that membership.
    */
  private def rebuildChainCtes: String = {
    val iters = IvfIters
    val mod = ExtensionQueries.IngestMod
    s"""ef AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),
      e AS (SELECT vec_id, v FROM ef WHERE vec_id % $mod <> 0),${
        ExtensionQueries.kmTrainingCtes(IvfCells, iters)},
      dassign AS (
        SELECT vec_id, v, cell FROM (
          SELECT d.vec_id, d.v, c.cell,
                 row_number() OVER (PARTITION BY d.vec_id ORDER BY
                   ${cosSql("d.v", "c.cv")} DESC, c.cell ASC) AS rn
          FROM (SELECT vec_id, v FROM ef WHERE vec_id % $mod = 0) d
          CROSS JOIN c$iters c
        ) t WHERE rn = 1
      ),
      member AS (
        SELECT vec_id, v, cell FROM a$iters
        UNION ALL
        SELECT vec_id, v, cell FROM dassign
      ),
      posting AS (
        SELECT vec_id, v, cell FROM (
          SELECT b.vec_id, b.v, b.cell,
                 row_number() OVER (PARTITION BY b.cell ORDER BY
                   ${cosSql("b.v", "c.cv")} DESC, b.vec_id ASC) AS brn
          FROM member b JOIN c$iters c ON b.cell = c.cell
        ) x WHERE brn <= $GraphCapR
      ),
      probes AS (
        SELECT vec_a, va, cell FROM (
          SELECT f.vec_id AS vec_a, f.v AS va, c.cell,
                 row_number() OVER (PARTITION BY f.vec_id ORDER BY
                   ${cosSql("f.v", "c.cv")} DESC, c.cell ASC) AS prn
          FROM ef f CROSS JOIN c$iters c
        ) p WHERE prn <= $IvfProbe
      ),
      scored AS (
        SELECT p.vec_a, b.vec_id AS vec_b, b.cell,
               floor((${cosSql("p.va", "b.v")}) * 1000000 + 0.5)
                 / 1000000 AS cos
        FROM probes p
        JOIN posting b
          ON p.cell = b.cell AND p.vec_a <> b.vec_id
      ),
      ranked AS (
        SELECT vec_a, vec_b, cell, cos,
               row_number() OVER (PARTITION BY vec_a ORDER BY cos DESC, vec_b ASC)
                 AS rank
        FROM scored
      )"""
  }

  /** s41's oracle: the fixed-codebook full rebuild. The engine's
    * incremental pass must reproduce this from stored artifacts + the
    * delta alone (see [[rebuildChainCtes]] for the chain).
    */
  private def s41RebuildSql: String = s"""
      WITH $rebuildChainCtes
      SELECT vec_a AS vec_id, CAST(rank AS INTEGER) AS rank, vec_b AS neighbor,
             cell, cos
      FROM ranked WHERE rank <= 3
      ORDER BY vec_id, rank"""

  /** s42's oracle: the same coverage arithmetic over the fixed-codebook
    * rebuild's CTEs ([[rebuildChainCtes]] — the maintained artifacts
    * provably equal the rebuild's, so the audit must reproduce from the
    * rebuild what the engine reads off the maintained tables), plus the
    * STORED (prior-only) cap for the eviction count.
    */
  private def s42CoverageSql: String = {
    val iters = IvfIters
    val mod = ExtensionQueries.IngestMod
    s"""
      WITH $rebuildChainCtes,
      stored_cap AS (
        SELECT vec_id, cell FROM (
          SELECT b.vec_id, b.cell,
                 row_number() OVER (PARTITION BY b.cell ORDER BY
                   ${cosSql("b.v", "c.cv")} DESC, b.vec_id ASC) AS brn
          FROM a$iters b JOIN c$iters c ON b.cell = c.cell
        ) x WHERE brn <= $GraphCapR
      ),
      lanes AS (
        SELECT vec_id,
               CASE WHEN vec_id % $mod = 0 THEN 'delta' ELSE 'prior' END AS lane
        FROM ef
      ),
      in_cap AS (SELECT DISTINCT vec_id FROM posting),
      reach AS (
        SELECT DISTINCT vec_b AS vec_id FROM ranked WHERE rank <= 3
      ),
      evict AS (
        SELECT DISTINCT s.vec_id FROM stored_cap s
        LEFT JOIN posting p ON s.vec_id = p.vec_id AND s.cell = p.cell
        WHERE p.vec_id IS NULL
      )
      SELECT l.lane,
             CAST(count(*) AS BIGINT) AS n_vectors,
             CAST(sum(CASE WHEN ic.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_in_cap,
             CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_reachable,
             CAST(sum(CASE WHEN ev.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_evicted
      FROM lanes l
      LEFT JOIN in_cap ic ON l.vec_id = ic.vec_id
      LEFT JOIN reach r ON l.vec_id = r.vec_id
      LEFT JOIN evict ev ON l.vec_id = ev.vec_id
      GROUP BY 1 ORDER BY 1"""
  }

  /** s43's oracle: the s39-shaped beam walk over the fixed-codebook
    * REBUILD's symmetrized edges and heads — one flat WITH sharing
    * [[rebuildChainCtes]] (the maintained artifacts provably equal the
    * rebuild's, so the walk over them must match hop for hop). The walk
    * chain mirrors ExtensionQueries8.walkSql's shapes with the FULL
    * corpus `ef` as the scoring table (the chain's `e` is the prior
    * training corpus — kmTrainingCtes hardcodes that name); walk CTEs
    * stay w-prefixed clear of the training chain's c<i>/a<i>.
    */
  private def s43WalkMaintainedSql: String = {
    import ExtensionQueries8.{WalkBeam, WalkHops}
    val iters = IvfIters
    def scoreCte(h: Int, from: String) = s"""
      ws$h AS (
        SELECT c.query_id, c.vec_id,
               floor((${cosSql("q.qv", "f.v")}) * 1000000 + 0.5)
                 / 1000000 AS cos
        FROM $from c JOIN q ON c.query_id = q.query_id
        JOIN ef f ON c.vec_id = f.vec_id
        WHERE c.vec_id <> c.query_id
      ),
      wb$h AS (
        SELECT query_id, vec_id, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rn FROM ws$h
        ) x WHERE rn <= $WalkBeam
      )"""
    val hops = (1 to WalkHops).map { h =>
      s"""
      w$h AS (
        SELECT DISTINCT query_id, vec_id FROM (
          SELECT query_id, vec_id FROM wb${h - 1}
          UNION ALL
          SELECT b.query_id, g.dst AS vec_id
          FROM wb${h - 1} b JOIN g ON g.src = b.vec_id
        ) u
      ),${scoreCte(h, s"w$h")}"""
    }.mkString(",")
    s"""
      WITH $rebuildChainCtes,
      g0 AS (SELECT vec_a AS src, vec_b AS dst FROM ranked WHERE rank <= 3),
      g AS (
        SELECT DISTINCT src, dst FROM (
          SELECT src, dst FROM g0
          UNION ALL
          SELECT dst AS src, src AS dst FROM g0
        ) u
      ),
      q AS (SELECT vec_id AS query_id, v AS qv FROM ef WHERE vec_id <= 2),
      heads AS (
        SELECT cell, vec_id FROM (
          SELECT b.cell, b.vec_id,
                 row_number() OVER (PARTITION BY b.cell ORDER BY
                   ${cosSql("b.v", "c.cv")} DESC, b.vec_id ASC) AS brn
          FROM member b JOIN c$iters c ON b.cell = c.cell
        ) h WHERE brn = 1
      ),
      qcells AS (
        SELECT query_id, cell FROM (
          SELECT q.query_id, c.cell,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   ${cosSql("q.qv", "c.cv")} DESC, c.cell ASC) AS prn
          FROM q CROSS JOIN c$iters c
        ) p WHERE prn <= $IvfProbe
      ),
      w0 AS (SELECT qc.query_id, h.vec_id FROM qcells qc
             JOIN heads h ON qc.cell = h.cell),${scoreCte(0, "w0")},$hops
      SELECT query_id, CAST(rn AS INTEGER) AS rank, vec_id, cos FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rn FROM wb$WalkHops
      ) f WHERE rn <= 5
      ORDER BY query_id, rank"""
  }

  val oracles: Map[String, String] = Map(
    // Stored-serving replay: s39's oracle VERBATIM — the round trip
    // through storage must change nothing (the s24 precedent).
    "s40_graph_walk_stored" -> ExtensionQueries8.graphWalkIvfSymSql,
    "s41_incremental_graph" -> s41RebuildSql,
    "s42_graph_coverage" -> s42CoverageSql,
    "s43_graph_walk_maintained" -> s43WalkMaintainedSql)
}
