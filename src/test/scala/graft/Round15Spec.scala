package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 batch: the q99 truth-column gating, s22's stored-eval-run
  * serving form, the e21 overflow guard, the TxCatalog replace-writer
  * guard + conditional-put backend seam, and graph-walk recall on
  * clustered geometry.
  */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // ---- q99 / q96: the exact-NDV truth column moved out of the sweep ----

  test("no catalog entry carries ndv_true (q96/q99/q101 price the " +
      "production ANALYZE); the estimate still lands within 10% of the " +
      "exact truth this spec computes itself") {
    val sweep = ExtensionQueries8.all("q99_lake_stats_sweep")(spark, dir)
    assert(!sweep.columns.contains("ndv_true"),
      "the production sweep must not pay an exact per-column distinct")
    assert(sweep.columns.contains("ndv_est"))
    // r16: q96/q101 dropped the truth column too — the accuracy grading
    // lives HERE, paying the countDistinct at spec time, and the DuckDB
    // oracle still recomputes the full HLL estimate cross-engine. The
    // p=12 HLL estimate must land within 10% of the exact truth on every
    // audited column (typical error at m=4096 is ~1.6%; small
    // cardinalities are exact through the linear-counting branch).
    // one q96 build serves both the column check and the accuracy rows
    // (each invocation rewrites the catalog artifacts on the fixture)
    val q96 = ExtensionQueries8.all("q96_column_stats_catalog")(spark, dir)
    val q101 = ExtensionQueries8.all("q101_tx_stats_publish")(spark, dir)
    for ((q, served) <- Seq("q96_column_stats_catalog" -> q96,
        "q101_tx_stats_publish" -> q101)) {
      assert(!served.columns.contains("ndv_true"),
        s"$q must not pay the grading-only exact distinct")
    }
    val rows = q96.collect()
    assert(rows.nonEmpty)
    val truthRows = ExtensionQueries8.ndvTruth(
      ExtensionQueries8.catalogLongForm(
        graft.sources.Tables.load(spark, dir, "orders"),
        pmod(col("o_orderkey"),
          lit(ExtensionQueries7.SketchShards.toLong)),
        ExtensionQueries8.ordersAuditSpecs))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val est = r.getAs[Double]("ndv_est")
      val truth = truthRows(r.getString(0))
      if (truth == 0L) assert(est == 0.0, s"${r.getString(0)}: $est vs 0")
      else assert(math.abs(est - truth) / truth <= 0.10,
        s"${r.getString(0)}: ndv_est $est strays >10% from exact $truth")
    }
  }

  // ---- fused catalog pass: the register bank row-equals the direct form ----

  test("fused register path emits exactly hllRegRows' rows — only-seen " +
      "buckets, null sentinel, byte rho math — on a fixture with nulls " +
      "and an all-null column") {
    // the direct equality HllRegsAgg's doc claims (r15 advice item):
    // regsFrom(fusedCatalogAgg(longF)) must reproduce the groupBy(bucket)
    // register derivation row-for-row, including the -1 null sentinel
    // holding no register evidence and the all-null column emitting NO
    // register rows at all
    import spark.implicits._
    val df = (0 until 100).map(i => (
        i.toLong,
        if (i % 5 == 0) null else s"cat_${i % 7}",
        null: String)).toDF("id", "cat", "dead")
    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    val specs: Seq[ExtensionQueries8.ColSpec] = Seq(
      ("id", col("id").cast("double"), nullS, col("id").cast("string")),
      ("cat", nullD, col("cat"), col("cat")),
      ("dead", nullD, col("dead"), col("dead")))
    val longF = ExtensionQueries8.catalogLongForm(
      df, pmod(col("id"), lit(4L)), specs)
    val fused = ExtensionQueries8.regsFrom(
        ExtensionQueries8.fusedCatalogAgg(longF))
      .select(col("shard").cast("long"), col("seg"),
        col("bucket").cast("long"), col("reg").cast("int"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    val direct = ExtensionQueries7.hllRegRows(
        longF.filter(col("cval").isNotNull)
          .withColumn("h", ExtensionQueries3.md5Hash48(col("cval"))),
        ExtensionQueries7.HllRemBits12, Seq("shard", "seg"))
      .select(col("shard").cast("long"), col("seg"),
        col("bucket").cast("long"), col("reg").cast("int"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    assert(fused.nonEmpty, "fixture must produce register rows")
    assert(fused == direct,
      "fused register bank must row-equal the direct groupBy(bucket) form")
    assert(!fused.exists(_(1) == "dead"),
      "the all-null column must emit no register rows on either path")
  }

  // ---- s22: stored-eval-run serving form ----

  test("s22 grouped grading over the stored eval runs equals the " +
      "per-method harness row-for-row") {
    val root = ExtensionQueries6.s22RankingsRoot(spark, dir)
    val exact = spark.read.parquet(s"$root/truth").withColumn("__rel", lit(1L))
    val queries = exact.select(col("query_id")).distinct()
    val stored = spark.read.parquet(s"$root/rankings")
    val reference = ExtensionQueries6.AnnMethodNames
      .map(name => ExtensionQueries5.gradedMetrics(exact, queries, name,
        stored.filter(col("method") === name)))
      .reduce(_.unionAll(_))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    val grouped = ExtensionQueries6.all("s22_ann_method_metrics")(spark, dir)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    assert(grouped == reference,
      "one-pass grouped grading must reproduce the per-method union")
    // every registered family appears, all-zero rows included
    assert(grouped.size ==
      ExtensionQueries6.AnnMethodNames.size * queries.count().toInt)
  }

  // ---- e21: the n_a·n_b overflow guard ----

  test("e21 overflow guard: in-range products are exact, out-of-range " +
      "products fail loudly instead of wrapping negative") {
    import spark.implicits._
    val ok = Seq((3L, 4L)).toDF("na", "nb")
      .select(ExtensionQueries8.msprtLnArg(col("na"), col("nb")).as("x"))
      .head().getLong(0)
    assert(ok == 3L + 4L + 12L)
    // 4e9 per arm → n_a*n_b = 1.6e19 > 2^63: the old code wrapped
    // negative and detLn produced garbage; the guard must raise
    val big = Seq((4000000000L, 4000000000L)).toDF("na", "nb")
      .select(ExtensionQueries8.msprtLnArg(col("na"), col("nb")).as("x"))
    val ex = intercept[Throwable] { big.collect() }
    def msgs(t: Throwable, depth: Int): String =
      if (t == null || depth > 8) ""
      else (Option(t.getMessage).getOrElse("")) + "\n" + msgs(t.getCause, depth + 1)
    assert(msgs(ex, 0).contains("mSPRT"),
      s"expected the mSPRT overflow error, got: ${msgs(ex, 0).take(400)}")
  }

  // ---- TxCatalog: replace-maintained tables refuse concurrent writers ----

  test("TxCatalog: concurrent transactions over a replace-maintained " +
      "table FAIL the max-merge instead of silently mixing pin sets") {
    import spark.implicits._
    import graft.sources.{Scratch, TxCatalog}
    import graft.sources.TxCatalog.TxWrite
    val root = Scratch.fresh(spark, "r15_txcat_replace")
    val (cat, tv) = (s"$root/cat", s"$root/view")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    // single-writer replace maintenance through the catalog is fine:
    // no contention, no guard — the maintained-view shape (q103's)
    TxCatalog.commitAllWrites(spark, cat, Seq(TxWrite(tv, rows("v1"), replace = true)))
    TxCatalog.commitAllWrites(spark, cat, Seq(TxWrite(tv, rows("v2"), replace = true)))
    assert(TxCatalog.readTable(spark, cat, tv)
      .select("tag").as[String].collect().toSet == Set("v2"))
    // a COMPETING replace transaction lands inside this writer's publish
    // window: the loser's retry sees a tip pinning a replace version
    // that does not contain its own — max-merge would drop one writer's
    // rows while keeping the other's pins elsewhere, so it must refuse
    var fired = false
    val ex = intercept[IllegalStateException] {
      TxCatalog.commitAllWrites(spark, cat,
        Seq(TxWrite(tv, rows("v3-loser"), replace = true)),
        beforePublish = { _ =>
          if (!fired) {
            fired = true
            TxCatalog.commitAllWrites(spark, cat,
              Seq(TxWrite(tv, rows("v3-winner"), replace = true)))
          }
        })
    }
    assert(ex.getMessage.contains("replace-maintained"))
    // the winner's state is untouched by the refused merge
    assert(TxCatalog.readTable(spark, cat, tv)
      .select("tag").as[String].collect().toSet == Set("v3-winner"))
  }

  test("TxCatalog: a writer whose own replace table was advanced by a " +
      "concurrent member commit fails BEFORE publishing — the tip check " +
      "closes the side the contended-merge guard cannot see") {
    import spark.implicits._
    import graft.sources.{Scratch, Snapshots, TxCatalog}
    import graft.sources.TxCatalog.TxWrite
    val root = Scratch.fresh(spark, "r15_txcat_tip")
    val (cat, tv) = (s"$root/cat", s"$root/view")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    TxCatalog.commitAllWrites(spark, cat, Seq(TxWrite(tv, rows("v1"), replace = true)))
    // the competing writer advances the TABLE (member commit) but has
    // not published any catalog version — the catalog-tip-based guard
    // alone would see no contention and publish our stale pin
    var fired = false
    val ex = intercept[IllegalStateException] {
      TxCatalog.commitAllWrites(spark, cat,
        Seq(TxWrite(tv, rows("v2-ours"), replace = true)),
        beforePublish = { _ =>
          if (!fired) {
            fired = true
            Snapshots.commitReplace(spark, tv, rows("v2-theirs"))
          }
        })
    }
    assert(ex.getMessage.contains("advanced replace-maintained"))
    // nothing published: the catalog still serves the v1 pin
    assert(TxCatalog.readTable(spark, cat, tv)
      .select("tag").as[String].collect().toSet == Set("v1"))
  }

  test("TxCatalog: the same interleave over APPEND tables still " +
      "max-merges (the monotone path the guard verifies and allows)") {
    import spark.implicits._
    import graft.sources.{Scratch, TxCatalog}
    val root = Scratch.fresh(spark, "r15_txcat_append")
    val (cat, tA) = (s"$root/cat", s"$root/a")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a1")))
    var fired = false
    TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a2-loser")),
      beforePublish = { _ =>
        if (!fired) {
          fired = true
          TxCatalog.commitAll(spark, cat, Seq(tA -> rows("a2-winner")))
        }
      })
    // append manifests are supersets: the max pin carries BOTH writers
    assert(TxCatalog.readTable(spark, cat, tA)
      .select("tag").as[String].collect().toSet ==
      Set("a1", "a2-loser", "a2-winner"))
  }

  // ---- TxCatalog: conditional-put backend seam ----

  /** Simulated S3-style conditional put: the atomic claim is a
    * putIfAbsent on the object key (not rename/link exclusivity); the
    * claimed key's bytes then land via a plain move this writer already
    * owns. Same protocol, different primitive — what a real object
    * store implements with `If-None-Match: *`.
    */
  private class CondPutBackend extends graft.sources.Snapshots.PublishBackend {
    private val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val publishes = new java.util.concurrent.atomic.AtomicInteger(0)
    override def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
        tmp: org.apache.hadoop.fs.Path,
        dst: org.apache.hadoop.fs.Path): Boolean = {
      publishes.incrementAndGet()
      if (!claimed.add(dst.toString)) false
      else {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        true
      }
    }
  }

  test("TxCatalog over a conditional-put backend: same protocol, same " +
      "losing-writer max-merge — only the publish primitive changes") {
    import spark.implicits._
    import graft.sources.{Scratch, TxCatalog}
    import graft.sources.TxCatalog.TxWrite
    val backend = new CondPutBackend
    val root = Scratch.fresh(spark, "r15_txcat_condput")
    val (cat, tA, tB) = (s"$root/cat", s"$root/a", s"$root/b")
    def rows(tag: String) = Seq((1L, tag)).toDF("id", "tag")
    TxCatalog.commitAllWrites(spark, cat,
      Seq(TxWrite(tA, rows("a1")), TxWrite(tB, rows("b1"))),
      backend = backend)
    // the r14 losing-writer scenario, replayed over the simulated store:
    // W2 wins the catalog version W1 was about to take; W1 must lose the
    // conditional put, retry against the new tip, and max-merge
    var fired = false
    TxCatalog.commitAllWrites(spark, cat, Seq(TxWrite(tA, rows("a2-w1"))),
      beforePublish = { _ =>
        if (!fired) {
          fired = true
          TxCatalog.commitAllWrites(spark, cat,
            Seq(TxWrite(tA, rows("a2-w2")), TxWrite(tB, rows("b2-w2"))),
            backend = backend)
        }
      },
      backend = backend)
    val pins = TxCatalog.latestPins(spark, cat)
    assert(pins(tA) == 3 && pins(tB) == 2,
      s"conditional-put merge must land the same pins as FsBackend: $pins")
    val snap = TxCatalog.snapshot(spark, cat)
    assert(snap(tA).select("tag").as[String].collect().toSet ==
      Set("a1", "a2-w1", "a2-w2"))
    assert(snap(tB).select("tag").as[String].collect().toSet ==
      Set("b1", "b2-w2"))
    assert(backend.publishes.get() >= 4,
      "member and catalog publishes must all route through the backend")
  }

  // ---- m11: exact-dup classes appear as self rows ----

  test("m11 surfaces every exact-dup hash class as a self row — " +
      "including classes that near-dup no other hash") {
    val out = ExtensionQueries3.all("m11_phash_dedup_groups")(spark, dir)
      .collect()
    val selfRows = out.filter(r => r.getLong(0) == r.getLong(1))
    // independent truth: hash groups with >= 2 members
    val groups = graft.operators.Multimodal.dHash64(
        graft.operators.Multimodal.mediaFromDocuments(
          graft.sources.Tables.load(spark, dir, "documents"))).toDF()
      .groupBy(col("phash"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(selfRows.map(_.getLong(0)).toSet == groups.keySet,
      "self rows must be exactly the >=2-member exact-dup classes")
    selfRows.foreach { r =>
      val n = groups(r.getLong(0))
      assert(r.getLong(2) == n && r.getLong(3) == n)
      assert(r.getAs[Int]("hamming") == 0 && r.getAs[Boolean]("is_dup"))
      assert(r.getAs[Long]("n_doc_pairs") == n * (n - 1) / 2,
        "the self row must carry the within-class pair count")
    }
    assert(selfRows.nonEmpty, "fixture must exercise the self-row path")
    // r16: the serving report is near-dup-only — every emitted row is a
    // dup (m05, the diag entry, keeps the full candidate-verdict listing)
    assert(out.forall(r =>
      r.getAs[Int]("hamming") <= 6 && r.getAs[Boolean]("is_dup")),
      "m11 must emit only hamming-<=6 rows")
  }

  // ---- d07: star-contraction CC equals label propagation ----

  test("star contraction reaches label propagation's exact fixed point " +
      "on adversarial graphs and on the fixture candidate graph") {
    import spark.implicits._
    import graft.operators.Dedup
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def check(ids: Seq[Long], edges: Seq[(Long, Long)], tag: String): Unit = {
      val docs = ids.toDF("id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val prop = labels(Dedup.labelClustersUncached(docs, pairs, 64)._1)
      val star = labels(Dedup.starContractClusters(docs, pairs))
      assert(star == prop, s"$tag: star $star vs propagation $prop")
    }
    // worst-case diameter: a long chain, edges oriented against the min
    check(1L to 40L, (1L to 39L).map(i => (i + 1, i)), "40-chain")
    // two dense clusters joined by one bridge (the d22 hard case)
    check(1L to 12L,
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L),
        (3L, 10L)), "bridged triangles")
    // star around a hub that is NOT the minimum
    check(1L to 9L, (1L to 8L).map(i => (9L, i)), "hub-star")
    // duplicate + self + reversed edges, isolated nodes 50/60
    check(Seq(1L, 2L, 3L, 50L, 60L),
      Seq((2L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L)),
      "dups/self/isolated")
    // empty edge set: every doc its own component
    check(Seq(5L, 6L), Seq.empty, "no edges")
    // the real fixture candidate graph
    val feats = ExtensionQueries.docFeatures(spark, dir)
    val pairs = Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
    val ids = feats.select(col("id"))
    assert(labels(Dedup.starContractClusters(ids, pairs)) ==
      labels(Dedup.labelClustersUncached(ids, pairs, 64)._1),
      "fixture LSH graph: the two exact-CC engines must agree")
  }

  // ---- s36/s37: graph-walk recall on CLUSTERED geometry ----

  /** Deterministic clustered fixture: 8 clusters of 25 points in 16
    * dims, each cluster a distinct 2-hot direction plus a small
    * deterministic per-(id, dim) perturbation — within-cluster cosine
    * ≫ cross-cluster, so the kNN graph IS navigable (unlike the
    * registered fixture's isotropic embeddings, where the honest walk
    * read-off is ~chance — r14's recorded ~0.07).
    */
  private def clusteredFixture: DataFrame = {
    import spark.implicits._
    val (dims, clusters, per) = (16, 8, 25)
    (0 until clusters).flatMap { c =>
      (0 until per).map { i =>
        val id = (c * per + i).toLong
        val v = Seq.tabulate(dims) { d =>
          val base = if (d == 2 * c || d == 2 * c + 1) 1.0 else 0.0
          // prime-modulus hash with period ≫ |points|×|dims| — a short
          // period (the first draft's % 13) makes ids congruent mod the
          // period IDENTICAL vectors, and exact duplicates are walk-
          // unreachable when no edge points at them
          val h = ((id * 2654435761L + d * 97) % 101 + 101) % 101
          base + 0.08 * (h.toDouble - 50.0) / 50.0
        }
        (id, v)
      }
    }.toDF("vec_id", "v")
  }

  test("graph walk on clustered structure: recall lands far above " +
      "chance once the entries route to the query's region") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.VectorOps
    import spark.implicits._
    val e = clusteredFixture.persist()
    try {
      // exact top-3 kNN digraph (the s31 shape at in-test scale)
      val a = e.select(col("vec_id").as("src"), col("v").as("sv"))
      val b = e.select(col("vec_id").as("dst"), col("v").as("dv"))
      val wG = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst").asc)
      val g = a.join(b, col("src") =!= col("dst"))
        .withColumn("cos",
          graft.operators.Agg.roundAt(VectorOps.cosineFast(col("sv"), col("dv")), 6))
        .withColumn("rn", row_number().over(wG)).filter(col("rn") <= 3)
        .select(col("src"), col("dst")).persist()
      val q = e.filter(col("vec_id").isin(5L, 55L, 105L))
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      // s37's entry shape without re-training: one head per cluster
      // (the routing layer a deployment stores) — seeds are ALL heads;
      // hop-0 ranking keeps the query's own region on top
      val heads = (0 until 8).map(c => Tuple1((c * 25).toLong)).toDF("vec_id")
      def recallAt(hops: Int, graph: DataFrame = g): Double = {
        val walked = ExtensionQueries8.walkOver(graph, e, q,
            (qq, _) => qq.select(col("query_id")).crossJoin(heads),
            hops = hops)
          .select(col("query_id"), col("vec_id"))
        val wQ = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        val truth = q.join(e, col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            graft.operators.Agg.roundAt(VectorOps.cosineFast(col("qv"), col("v")), 6))
          .withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 5)
          .select(col("query_id"), col("vec_id"))
        walked.join(truth, Seq("query_id", "vec_id")).count() / 15.0
      }
      (2 to 6).foreach(h => info(s"hops=$h recall=${recallAt(h)}"))
      val atDefault = recallAt(ExtensionQueries8.WalkHops)
      assert(atDefault >= 0.6,
        s"walk recall on navigable structure must be far above the " +
          s"5/200 chance floor, got $atDefault at the default hops")
      // tuning read-off: more hops must never hurt on clustered
      // structure (the beam only refines toward the query)
      assert(recallAt(5) >= atDefault)
      // s38's motivation, measured: the hop curve SATURATES at the
      // directed graph's reachable set (anti-hub points with no
      // in-edges stay invisible at any hop budget); making each stored
      // link traversable both ways lifts that ceiling at identical
      // beam/hops
      val gSym = g.union(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val symRecall = recallAt(ExtensionQueries8.WalkHops, gSym)
      info(s"sym recall=$symRecall vs directed $atDefault")
      assert(symRecall > atDefault,
        s"bidirectional traversal must lift the directed ceiling: " +
          s"$symRecall vs $atDefault")
    } finally { e.unpersist(); () }
  }
}
