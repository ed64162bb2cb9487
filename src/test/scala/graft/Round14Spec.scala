package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 batch: the whole-lake statistics sweep (q99) and the d22
  * stored-prior serving form.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // ---- q99: whole-lake statistics sweep ----

  test("q99 sweep: one row per (table, column) of the audit registry") {
    val rows = ExtensionQueries8.all("q99_lake_stats_sweep")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = ExtensionQueries8.LakeAudit.flatMap {
      case (tbl, _, cols) => cols.map(c => (tbl, c.name))
    }.toSet
    assert(rows == expected,
      "the sweep must cover exactly the audit registry, nothing more")
  }

  test("q99 sweep: per-table rows recount, and the text min/max lane is " +
      "the 32-char parquet-style truncation") {
    val cat = ExtensionQueries8.all("q99_lake_stats_sweep")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    ExtensionQueries8.LakeAudit.foreach { case (tbl, _, cols) =>
      val n = graft.sources.Tables.load(spark, dir, tbl).count()
      cols.foreach { c =>
        assert(cat((tbl, c.name)).getLong(2) == n,
          s"$tbl.${c.name}: n_rows must equal count(*)")
      }
    }
    val text = cat(("documents", "text"))
    val (mnStr, mxStr) =
      (text.getAs[String]("min_str"), text.getAs[String]("max_str"))
    assert(mnStr.length <= 32 && mxStr.length <= 32,
      "text min/max must be the bounded-width truncation, not raw KB strings")
    // the truncated lane still equals min/max over the prefixed values
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(substring(col("text"), 1, 32).as("p"))
      .agg(min(col("p")), max(col("p"))).head()
    assert(mnStr == docs.getString(0) && mxStr == docs.getString(1))
  }

  test("q99 sweep: incremental refresh over TWO tables — appending one " +
      "table's shard leaves the other table's catalog rows byte-identical") {
    import graft.sources.{Scratch, Tables}
    val shards = ExtensionQueries7.SketchShards.toLong
    val root = Scratch.fresh(spark, "r14_lake_incr")
    val audited = ExtensionQueries8.LakeAudit
      .filter(a => a._1 == "nation" || a._1 == "events")
    def serve(tbl: String, shardKey: String,
        cols: Seq[ExtensionQueries8.AuditCol]) =
      ExtensionQueries8.serveCatalog(spark,
        ExtensionQueries8.catalogLongForm(Tables.load(spark, dir, tbl),
          pmod(col(shardKey).cast("long"), lit(shards)),
          cols.map(ExtensionQueries8.auditSpec)),
        s"$root/$tbl")
    // phase 1: nation complete; events WITHOUT shard 3
    audited.foreach { case (tbl, shardKey, cols) =>
      val shard = pmod(col(shardKey).cast("long"), lit(shards))
      val rows = Tables.load(spark, dir, tbl)
      val phase1 = if (tbl == "events") rows.filter(shard =!= 3) else rows
      ExtensionQueries8.writeCatalogShards(
        ExtensionQueries8.catalogLongForm(phase1, shard,
          cols.map(ExtensionQueries8.auditSpec)),
        s"$root/$tbl", "overwrite")
    }
    val nationBefore = serve("nation", "n_nationkey",
      audited.find(_._1 == "nation").get._3).collect().map(_.toSeq).toList
    // phase 2: the events ingest appends ONLY its shard-3 catalog rows
    val (_, evKey, evCols) = audited.find(_._1 == "events").get
    val evShard = pmod(col(evKey).cast("long"), lit(shards))
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(
        Tables.load(spark, dir, "events").filter(evShard === 3), evShard,
        evCols.map(ExtensionQueries8.auditSpec)),
      s"$root/events", "append")
    // events: append-then-merge equals a direct full rebuild
    val evAfter = serve("events", evKey, evCols).collect().map(_.toSeq).toList
    val evRoot = Scratch.fresh(spark, "r14_lake_incr_direct")
    val evDirect = ExtensionQueries8.statsCatalog(spark,
        Tables.load(spark, dir, "events"), evShard,
        evCols.map(ExtensionQueries8.auditSpec), evRoot)
      .collect().map(_.toSeq).toList
    assert(evAfter == evDirect,
      "appending one shard's catalog rows must equal a full rebuild")
    // nation: untouched by the events ingest — served rows byte-identical
    val nationAfter = serve("nation", "n_nationkey",
      audited.find(_._1 == "nation").get._3).collect().map(_.toSeq).toList
    assert(nationAfter == nationBefore,
      "an ingest into one table must not perturb another table's catalog")
  }

  // ---- clusterMemo LRU bound (r13-advice item) ----

  test("clusterMemo is bounded: many distinct fixtures evict LRU entries " +
      "instead of pinning persisted results without limit") {
    import spark.implicits._
    import graft.operators.Dedup
    // 20 distinct (docs, pairs) plans — each a distinct memo key
    (0 until 20).foreach { i =>
      val ids = (0L to 3L).map(_ + i * 100).toDF("id")
      val pairs = Seq((i * 100L, i * 100L + 1)).toDF("doc_a", "doc_b")
      val labels = Dedup.labelClusters(ids, pairs, 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels(i * 100L + 1) == i * 100L, "eviction must not corrupt results")
    }
    assert(Dedup.clusterMemoSize <= 16,
      s"memo grew to ${Dedup.clusterMemoSize} — the LRU cap must bound it")
    // a re-query after eviction still returns correct clusters (recompute)
    val ids0 = (0L to 3L).toDF("id")
    val pairs0 = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val again = Dedup.labelClusters(ids0, pairs0, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  // ---- degreeCapEdges: optional pre-propagation sampling ----

  test("degreeCapEdges: capped clusters only ever REFINE the uncapped ones, " +
      "and the both-ends-saturated weak bridge is the quantified loss") {
    import spark.implicits._
    import graft.operators.Dedup
    // two strong triangles bridged by one weak edge (3,4): with
    // maxDegree = 2, BOTH endpoints rank the bridge below their two
    // strong edges, so it is the only edge the cap drops
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L),
      (3L, 4L, 1L)).toDF("doc_a", "doc_b", "n_shared_bands")
    val capped = Dedup.degreeCapEdges(pairs, maxDegree = 2)
    // one-sided loss: exactly the weak bridge is gone
    assert(capped.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)))
    val full = Dedup.labelClusters(ids, pairs, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sampled = Dedup.labelClusters(ids, capped, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet == Set(1L), "uncapped merges everything")
    assert(sampled.values.toSet == Set(1L, 4L),
      "the dropped bridge splits exactly at the weak edge")
    // refinement property: same capped label => same uncapped label
    // (capping can under-merge, never over-merge)
    sampled.groupBy(_._2).values.foreach { members =>
      assert(members.map(m => full(m._1)).toSet.size == 1,
        "a capped cluster must sit inside one uncapped cluster")
    }
    // an edge kept by EITHER endpoint survives: node 3 keeps (1,3)/(2,3)
    // even though 1 and 2 are themselves saturated
    assert(Dedup.degreeCapEdges(pairs, maxDegree = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      .contains((1L, 2L)))
    // star counterexample (pins the DOCUMENTED semantics): every leaf
    // keeps its only edge, so the hub's surviving DEGREE exceeds any
    // per-node bound — the guarantee is the global n·cap edge count,
    // and hub connectivity is preserved by design (dropping those edges
    // would disconnect docs whose only evidence is the hub)
    val star = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (0L, 4L, 1L))
      .toDF("doc_a", "doc_b", "n_shared_bands")
    assert(Dedup.degreeCapEdges(star, maxDegree = 1).count() == 4,
      "a star must survive capping intact")
  }

  // ---- q101 / TxCatalog: cross-table atomic publish ----

  test("TxCatalog: a reader inside the commit window never pairs one " +
      "table's new version with the other's old") {
    import spark.implicits._
    import graft.sources.{Scratch, Snapshots, TxCatalog}
    val root = Scratch.fresh(spark, "r14_txcat")
    val (cat, tA, tB) = (s"$root/cat", s"$root/a", s"$root/b")
    def rows(tag: String, n: Int) =
      (0 until n).map(i => (i.toLong, tag)).toDF("id", "tag")
    // v1: both tables at generation g1, one transaction
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("g1", 3), tB -> rows("g1", 4)))
    def observedTags(): Set[String] = {
      val snap = TxCatalog.snapshot(spark, cat)
      Set(tA, tB).flatMap(t =>
        snap(t).select("tag").distinct().as[String].collect())
    }
    assert(observedTags() == Set("g1"))
    // v2: replace both to g2; the hook fires BETWEEN the member commits
    // and the catalog publish — table A's g2 rows are already durable in
    // its Snapshots table, but a catalog-resolved reader must still see
    // the (g1, g1) pair
    var insideWindow: Set[String] = null
    var tableALatestInsideWindow: Set[String] = null
    TxCatalog.commitAll(spark, cat,
      Seq(tA -> rows("g2", 3), tB -> rows("g2", 4)),
      beforePublish = { _ =>
        insideWindow = observedTags()
        tableALatestInsideWindow = Snapshots.readLatest(spark, tA)
          .select("tag").distinct().as[String].collect().toSet
      })
    assert(tableALatestInsideWindow == Set("g1", "g2"),
      "the member commit IS durable before the catalog publish (append)")
    assert(insideWindow == Set("g1"),
      "a catalog-resolved reader inside the window must see the old pair")
    // after the publish: both tables' g2 rows visible together (appends,
    // so both generations are present — the PAIR moved atomically)
    val snap = TxCatalog.snapshot(spark, cat)
    Seq(tA, tB).foreach { t =>
      assert(snap(t).select("tag").distinct().as[String].collect().toSet ==
        Set("g1", "g2"), s"$t must expose the transaction's new version")
    }
  }

  test("TxCatalog: unlisted tables carry their pin forward, and a crashed " +
      "transaction's member commit stays catalog-invisible") {
    import spark.implicits._
    import graft.sources.{Scratch, Snapshots, TxCatalog}
    val root = Scratch.fresh(spark, "r14_txcat2")
    val (cat, tA, tB) = (s"$root/cat", s"$root/a", s"$root/b")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a1"), tB -> rows("b1")))
    // a single-table transaction must not disturb B's pin
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a2")))
    val pins = TxCatalog.latestPins(spark, cat)
    assert(pins(tA) == 2 && pins(tB) == 1)
    // simulate a crash: a member commit with NO catalog publish
    Snapshots.commit(spark, tB, rows("b-orphan"))
    val snap = TxCatalog.snapshot(spark, cat)
    assert(snap(tB).select("tag").as[String].collect().toSet == Set("b1"),
      "an orphaned member commit must stay invisible through the catalog")
  }

  test("TxCatalog time travel: a historical catalog version reproduces " +
      "the exact historical table PAIR, not whatever the tables hold now") {
    import spark.implicits._
    import graft.sources.{Scratch, TxCatalog}
    val root = Scratch.fresh(spark, "r14_txcat3")
    val (cat, tA, tB) = (s"$root/cat", s"$root/a", s"$root/b")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    val v1 = TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a1"), tB -> rows("b1")))
    val v2 = TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a2"), tB -> rows("b2")))
    def tags(snap: Map[String, org.apache.spark.sql.DataFrame], t: String) =
      snap(t).select("tag").as[String].collect().toSet
    val hist = TxCatalog.snapshotAsOf(spark, cat, v1)
    assert(tags(hist, tA) == Set("a1") && tags(hist, tB) == Set("b1"),
      "version-1 resolution must see only generation-1 rows in BOTH tables")
    val now = TxCatalog.snapshotAsOf(spark, cat, v2)
    assert(tags(now, tA) == Set("a1", "a2") && tags(now, tB) == Set("b1", "b2"))
  }

  test("TxCatalog: a commit losing the publish race max-merges over the " +
      "winner's pins instead of regressing them") {
    import spark.implicits._
    import graft.sources.{Scratch, TxCatalog}
    val root = Scratch.fresh(spark, "r14_txcat4")
    val (cat, tA, tB) = (s"$root/cat", s"$root/a", s"$root/b")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a1"), tB -> rows("b1")))
    // W1 (this thread) commits to table A; inside its publish window a
    // COMPETING transaction W2 commits to BOTH tables and wins the
    // catalog version W1 was about to take. W1 must lose, retry against
    // the new tip, and max-merge — never regress B's pin to its stale
    // pre-W2 view (the pre-fix lost-update: prev read from one listing,
    // v from a later one)
    var fired = false
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a2-w1")),
      beforePublish = { _ =>
        if (!fired) {
          fired = true
          TxCatalog.commitAll(spark, cat,
            Seq(tA -> rows("a2-w2"), tB -> rows("b2-w2")))
        }
      })
    val pins = TxCatalog.latestPins(spark, cat)
    // table A: both writers committed member versions (2 and 3, order
    // by who staged first) — the final pin must be the MAX
    assert(pins(tA) == 3, s"A's pin must be the max member version: $pins")
    // table B: W1 didn't write it — W2's new pin (2) must survive W1's
    // retry, NOT regress to the v1 pin W1 saw before the race
    assert(pins(tB) == 2, s"B's pin must keep the winner's version: $pins")
    val snap = TxCatalog.snapshot(spark, cat)
    assert(snap(tB).select("tag").as[String].collect().toSet ==
      Set("b1", "b2-w2"),
      "the winner's B rows must stay catalog-visible after the loser retries")
    assert(snap(tA).select("tag").as[String].collect().toSet ==
      Set("a1", "a2-w1", "a2-w2"))
  }

  test("q101 equals q96: the transactional publish is output-invisible") {
    val tx = ExtensionQueries8.all("q101_tx_stats_publish")(spark, dir)
      .collect().map(_.toSeq).toList
    val plain = ExtensionQueries8.all("q96_column_stats_catalog")(spark, dir)
      .collect().map(_.toSeq).toList
    assert(tx == plain)
  }

  // ---- e21: mSPRT always-valid sequential monitoring ----

  test("e21 mSPRT: the decision is monotone (once significant, always " +
      "significant), the running max is exact, and a planted effect " +
      "triggers it") {
    import spark.implicits._
    val rows = ExtensionQueries8.all("e21_msprt")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    // running max is exactly the prefix max of ln_lambda, and the flag
    // is monotone in it
    var mx = Double.NegativeInfinity
    rows.foreach { case (_, _, ll, llmax, sig) =>
      mx = math.max(mx, ll)
      assert(llmax == mx, "ln_lambda_max must be the exact prefix max")
      assert(sig == (mx >= ExtensionQueries8.MsprtLnAlphaInv))
    }
    // cumulative arms only grow
    assert(rows.map(_._1).sliding(2).forall(s => s.head <= s.last))
    assert(rows.map(_._2).sliding(2).forall(s => s.head <= s.last))
    // the user-hash split is an A/A comparison on this fixture — the
    // always-valid monitor must NOT fire (that is its whole point
    // under daily peeking)
    assert(rows.forall(!_._5), "A/A must stay non-significant")

    // planted effect: variant 1's purchase values shifted +5 — the
    // monitor fires and STAYS fired
    val tdir = graft.sources.Scratch.fresh(spark, "r14_e21")
    val planted = (for {
      day <- 1 to 5; u <- 0L until 20L
    } yield (day * 100L + u,
      java.sql.Timestamp.valueOf(f"2024-01-0$day%d 10:00:00"),
      u, "purchase",
      10.0 + (u % 2) * 5.0 + (u % 3) * 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    planted.write.parquet(s"$tdir/events.parquet")
    val p = ExtensionQueries8.all("e21_msprt")(spark, tdir)
      .collect().map(r => (r.getDouble(6), r.getBoolean(7)))
    assert(p.last._2, s"a +50% planted effect must fire the monitor: $p")
    val firstSig = p.indexWhere(_._2)
    assert(p.drop(firstSig).forall(_._2),
      "once significant, always significant")
  }

  // ---- t38: hybrid RRF fusion ----

  test("t38 RRF: every fused score recomputes exactly from the two arm " +
      "rankings (shared RrfK constant), arm flags included") {
    val lex = ExtensionQueries3.all("t19_doc_similarity")(spark, dir)
      .filter(col("doc_id") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val vec = ExtensionQueries.all("s01_knn_brute")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    def fp(rank: Option[Int]) = rank
      .map(r => 1000000000L / (ExtensionQueries4.RrfK + r)).getOrElse(0L)
    val fused = ExtensionQueries8.all("t38_hybrid_rrf")(spark, dir)
      .collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect = fp(lex.get(key)) + fp(vec.get(key))
      assert(r.getLong(3) == expect,
        s"$key: rrf ${r.getLong(3)} != exact recompute $expect")
      assert(r.getBoolean(4) == lex.contains(key) &&
        r.getBoolean(5) == vec.contains(key))
    }
    // (the exact recompute above IS the complete fusion property — a
    // separate "both-arms dominance" check would be tautological given
    // it, since fp(r) ≥ 1 for any present arm)
  }

  // ---- q102: theta-sketch difference ----

  test("q102 difference agrees with exact set algebra in the exact regime, " +
      "and the two directions partition the union") {
    import spark.implicits._
    val row = ExtensionQueries8.all("q102_sketch_difference")(spark, dir)
      .collect().head
    val (theta, nAnotB, nBnotA) =
      (row.getLong(1), row.getLong(2), row.getLong(3))
    val ev = graft.sources.Tables.load(spark, dir, "events")
    def users(tpe: String) = ev.filter(col("event_type") === tpe)
      .select("user_id").as[Long].collect().toSet
    val (a, b) = (users("view"), users("purchase"))
    if (theta == (1L << 48)) {
      // exact regime: neither sketch saturated — the estimates ARE the
      // exact difference cardinalities
      assert(nAnotB == (a -- b).size && nBnotA == (b -- a).size)
      assert(row.getDouble(4) == (a -- b).size.toDouble &&
        row.getDouble(5) == (b -- a).size.toDouble)
    }
    // structural identity either way: |A\B| + |B\A| + |A∩B| = |A∪B|
    // on the θ-trimmed samples — recompute from q87's own row
    val q87 = ExtensionQueries6.all("q87_sketch_set_ops")(spark, dir)
      .collect().head
    assert(q87.getLong(3) == theta, "q87 and q102 must trim at the same θ")
    assert(nAnotB + nBnotA + q87.getLong(5) == q87.getLong(4),
      "difference, intersection and union counts must partition")
  }

  // ---- s36: graph-walk ANN serving ----

  test("s36 walk: 5 strictly-ranked non-self results per query, every one " +
      "reachable from the entry set, and the walk's top-1 beats or ties " +
      "entry-only scoring") {
    val rows = ExtensionQueries8.all("s36_graph_walk_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      assert(rs.forall(_._3 != q), "the query itself must never be served")
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"q$q: cos must be non-increasing in rank")
    }
    // hops must add value over hop-0: the final top-1 is at least the
    // best entry-point cosine (the beam keeps its best-so-far, so the
    // walk can only improve it)
    import graft.operators.VectorOps
    val e = ExtensionQueries.embeddingsD(spark, dir)
    val entries = e.orderBy(col("vec_id")).limit(ExtensionQueries8.WalkEntryN)
      .select(col("vec_id").as("evid"), col("v").as("ev"))
    val entryBest = e.filter(col("vec_id") <= 2)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .crossJoin(entries).filter(col("evid") =!= col("query_id"))
      .withColumn("cos",
        graft.operators.Agg.roundAt(VectorOps.cosineFast(col("qv"), col("ev")), 6))
      .groupBy(col("query_id")).agg(max(col("cos")).as("best"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byQ.foreach { case (q, rs) =>
      assert(rs.minBy(_._2)._4 >= entryBest(q),
        s"q$q: the walked top-1 fell below the entry-only best")
    }
  }

  // ---- d22: stored-prior serving form ----

  test("d22 serving form: the stored prior + incremental pass equals an " +
      "inline both-worlds rebuild") {
    import graft.operators.Dedup
    // inline both-worlds form (the pre-r14 d22 body): prior built fresh
    val feats = ExtensionQueries.docFeatures(spark, dir)
    val oldF = feats.filter(col("id") % 4 =!= 0)
    val delta = feats.filter(col("id") % 4 === 0)
    val prior = Dedup.labelClusters(oldF.select("id"),
      Dedup.lshCandidatePairs(oldF, bands = 4, rows = 3),
      ExtensionQueries.ClusterMaxRounds)
    val stars = prior.select(col("id").as("doc_a"), col("label").as("doc_b"))
    val newPairs = Dedup.incrementalCandidatePairs(
        Dedup.bandFingerprints(oldF, bands = 4, rows = 3), delta,
        bands = 4, rows = 3)
      .select(col("doc_new").as("doc_a"), col("doc_matched").as("doc_b"))
    val inline = Dedup.labelClusters(feats.select("id"),
        stars.unionByName(newPairs), ExtensionQueries.ClusterMaxRounds)
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toList
    val served = ExtensionQueries8.all("d22_incremental_clusters")(spark, dir)
      .collect().map(_.toSeq).toList
    assert(served == inline,
      "the Snapshots round trip of the prior assignment and band index " +
        "must change nothing")
  }
}
