package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 third batch: the persisted column-statistics catalog (q96)
  * and the training-mixture design table (t34).
  */
class Round13cSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // ---- q96: persisted column-statistics catalog ----

  /** A fixture with real nulls in both lanes (the TPC-H tables have
    * none, so the null accounting must be exercised here): 100 rows,
    * `cat` null on every 5th row, `score` null on every 4th, and `dead`
    * ALL null — the column with no NDV registers at all.
    */
  private def nullFixture = {
    import spark.implicits._
    (0L until 100L).map { i =>
      (i,
        if (i % 5 == 0) null else s"cat_${i % 7}",
        if (i % 4 == 0) None else Some(i * 1.5),
        None: Option[String])
    }.toDF("id", "cat", "score", "dead")
  }

  private def fixtureSpecs: Seq[ExtensionQueries8.ColSpec] = {
    val nullS = lit(null).cast("string")
    val nullD = lit(null).cast("double")
    Seq(
      ("id", col("id"), nullS, col("id")),
      ("cat", nullD, col("cat"), col("cat")),
      ("score", col("score"), nullS,
        floor(col("score") * 100 + 0.5).cast("long")),
      ("dead", nullD, col("dead"), col("dead")))
  }

  private def catalogOf(shards: Long, tag: String) = {
    val root = graft.sources.Scratch.fresh(spark, s"r13c_catalog_$tag")
    ExtensionQueries8.statsCatalog(spark, nullFixture,
      pmod(col("id"), lit(shards)), fixtureSpecs, root)
  }

  test("q96 catalog: null accounting, exact NDV, and both min/max lanes") {
    val rows = catalogOf(8, "nulls").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("id", "cat", "score", "dead"))
    // the ALL-NULL column must still get its catalog row (no registers
    // exist for it — the estimate left-join backfills ndv 0)
    val dead = rows("dead")
    assert(dead.getLong(1) == 100 && dead.getLong(2) == 100)
    assert(dead.getDouble(3) == 0.0 && dead.getLong(4) == 0)
    assert(dead.isNullAt(5) && dead.isNullAt(6) &&
      dead.isNullAt(7) && dead.isNullAt(8))
    val id = rows("id")
    assert(id.getLong(1) == 100 && id.getLong(2) == 0)   // n_rows, n_null
    assert(id.getLong(4) == 100)                          // ndv_true
    assert(id.getDouble(5) == 0.0 && id.getDouble(6) == 99.0)
    assert(id.isNullAt(7) && id.isNullAt(8))              // no string lane
    val cat = rows("cat")
    assert(cat.getLong(2) == 20, "every 5th cat is null")
    assert(cat.getLong(4) == 7, "non-null cats cover cat_0..cat_6")
    assert(cat.getString(7) == "cat_0" && cat.getString(8) == "cat_6")
    assert(cat.isNullAt(5) && cat.isNullAt(6))            // no numeric lane
    val sc = rows("score")
    assert(sc.getLong(2) == 25, "every 4th score is null")
    assert(sc.getLong(4) == 75)
    assert(sc.getDouble(5) == 1.5 && sc.getDouble(6) == 148.5)
  }

  test("q96 catalog: the shard layer is transparent (1 shard == 8 shards)") {
    val one = catalogOf(1, "s1").collect().map(_.toSeq).toList
    val eight = catalogOf(8, "s8").collect().map(_.toSeq).toList
    assert(one == eight,
      "merge-on-read must reproduce the direct single-shard catalog")
  }

  test("q96 catalog: small-range NDV estimate is near-exact (linear-counting regime)") {
    val rows = catalogOf(8, "acc").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getLong(4)))
    rows.foreach { case (name, est, truth) =>
      assert(math.abs(est - truth) <= math.max(2.0, 0.05 * truth),
        s"$name: est $est vs true $truth — p=12 linear counting should be " +
          "near-exact at N << m")
    }
  }

  test("q96 catalog: incremental refresh — appending one shard equals a full rebuild") {
    val shard = pmod(col("id"), lit(8L))
    val base = nullFixture.filter(shard =!= 7)
    val delta = nullFixture.filter(shard === 7)
    val root = graft.sources.Scratch.fresh(spark, "r13c_incr")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(base, shard, fixtureSpecs),
      root, "overwrite")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(delta, shard, fixtureSpecs),
      root, "append")
    val incr = ExtensionQueries8.serveCatalog(spark,
        ExtensionQueries8.catalogLongForm(nullFixture, shard, fixtureSpecs),
        root)
      .collect().map(_.toSeq).toList
    val direct = catalogOf(8, "incr_direct").collect().map(_.toSeq).toList
    assert(incr == direct,
      "a delta ingest writing only its own shard's catalog rows must be " +
        "indistinguishable from rebuilding the whole catalog")
  }

  test("q96 on orders: row counts recount; estimate accurate vs the " +
      "spec's own exact distinct (the served catalog carries no truth)") {
    val cat = ExtensionQueries8.all("q96_column_stats_catalog")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val o = graft.sources.Tables.load(spark, dir, "orders")
    val n = o.count()
    assert(cat.values.forall(r => r.getLong(1) == n && r.getLong(2) == 0))
    // r16: ndv_true is gone from every served catalog (production shape);
    // the exact recount is the spec's to pay
    val trueKeys = o.select(countDistinct(col("o_orderkey"))).head.getLong(0)
    // production-geometry estimate accuracy on the highest-card column
    val est = cat("o_orderkey").getDouble(3)
    assert(math.abs(est - trueKeys) <= 0.05 * trueKeys,
      s"ndv_est $est vs $trueKeys")
  }

  // ---- t34: training-mixture design table ----

  private lazy val mix =
    ExtensionQueries8.all("t34_mixture_weights")(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("t34: weights form a distribution and draws exhaust the budget, per alpha") {
    mix.groupBy(_._1).foreach { case (alpha, rows) =>
      val wsum = rows.map(_._4).sum
      assert(math.abs(wsum - 1.0) < 1e-4, s"alpha=$alpha weight sum $wsum")
      val draw = rows.map(_._5).sum
      assert(math.abs(draw - ExtensionQueries8.MixTokenBudget) <
        1e-3 * ExtensionQueries8.MixTokenBudget,
        s"alpha=$alpha expected draw $draw vs budget")
    }
  }

  test("t34: alpha=0.5 flattens the mixture relative to proportional sampling") {
    def spread(alpha: Double) = {
      val ws = mix.filter(_._1 == alpha).map(_._4)
      ws.max / ws.min
    }
    assert(spread(0.5) < spread(1.0),
      "sqrt temperature must compress the weight ratio between the largest " +
        "and smallest source")
    // and at alpha=1 the weight IS the token share
    val total = mix.filter(_._1 == 1.0).map(_._3).sum
    mix.filter(_._1 == 1.0).foreach { case (_, src, eff, w, _, _) =>
      assert(math.abs(w - eff / total) < 1e-5, s"$src proportional weight")
    }
  }

  test("t34: epochs = expected draw over effective tokens, for every row") {
    mix.foreach { case (alpha, src, eff, _, draw, epochs) =>
      assert(math.abs(epochs - draw / eff) < 1e-4,
        s"alpha=$alpha $src epochs $epochs vs ${draw / eff}")
    }
  }

  // ---- e19: CUPED variance-reduced A/B ----

  private lazy val cuped =
    ExtensionQueries8.all("e19_cuped")(spark, dir).head()

  test("e19: CUPED never increases in-sample variance (the OLS residual property)") {
    val vr = cuped.getDouble(9)
    assert(vr >= -1e-6 && vr < 1.0, s"var_reduction $vr out of [0, 1)")
  }

  test("e19: the adjustment conserves the overall mean (Σ ycup = Σ y)") {
    val (nA, nB) = (cuped.getLong(0), cuped.getLong(1))
    val post = nA * cuped.getDouble(2) + nB * cuped.getDouble(3)
    val cup = nA * cuped.getDouble(4) + nB * cuped.getDouble(5)
    assert(math.abs(post - cup) < 1e-2,
      s"overall post mean $post vs adjusted $cup — θ·Σ(x − x̄) must vanish")
  }

  test("e19: theta matches an independent driver-side recompute") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val xs = ev.groupBy(_._1).map { case (_, rows) =>
      (rows.filter(_._2 < ExtensionQueries8.CupedSplitUs).map(_._3).sum,
        rows.filter(_._2 >= ExtensionQueries8.CupedSplitUs).map(_._3).sum)
    }.toArray
    val n = xs.length.toDouble
    val (mx, my) = (xs.map(_._1).sum / n, xs.map(_._2).sum / n)
    val cov = xs.map { case (x, y) => (x - mx) * (y - my) }.sum / (n - 1)
    val vx = xs.map { case (x, _) => (x - mx) * (x - mx) }.sum / (n - 1)
    val theta = cov / vx
    assert(math.abs(cuped.getDouble(8) - theta) < 1e-3,
      s"engine theta ${cuped.getDouble(8)} vs naive $theta")
  }

  // ---- q97: join-skew diagnosis ----

  private lazy val skew =
    ExtensionQueries8.all("q97_join_skew_report")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

  test("q97: the report's internal identities hold for every candidate key") {
    assert(skew.keySet == Set("user_id", "event_type"))
    skew.values.foreach { r =>
      val (n, total, mean) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val (mx, p50, p99) = (r.getLong(4), r.getDouble(5), r.getDouble(6))
      val (ratio, salt) = (r.getDouble(7), r.getLong(8))
      assert(math.abs(mean - total.toDouble / n) < 1e-4)
      assert(p50 <= p99 + 1e-9 && p99 <= mx.toDouble + 1e-9)
      assert(math.abs(ratio - mx / (total.toDouble / n)) < 1e-4)
      assert(salt == math.ceil(mx.toDouble * n / total).toLong,
        s"salt_factor $salt must be the exact ceiling of the skew ratio")
    }
  }

  test("q97: salting by the reported factor flattens the heaviest key") {
    val r = skew("user_id")
    val (preMax, salt) = (r.getLong(4), r.getLong(8))
    val post = graft.sources.Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), pmod(col("event_id"), lit(salt)).as("salt"))
      .agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).head.getLong(0)
    assert(salt == 1 || post < preMax,
      s"post-salt max group $post must shrink below $preMax")
  }

  // ---- t35: eval-contamination report ----

  test("t35: planted clean / partial / burned eval docs get the right verdicts") {
    import spark.implicits._
    val tdir = graft.sources.Scratch.fresh(spark, "r13c_t35")
    val trainText = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (0L, trainText),                                     // eval, burned
      (97L, "one unique sentence that nothing here shares"), // eval, clean
      (194L, "alpha beta gamma delta unrelatedx wordsy tailz"), // eval, 2/5
      (291L, "too short"),                                 // eval, no shingles
      (1L, trainText),
      (2L, "completely different training content body text filler"))
      .toDF("doc_id", "text").write.parquet(s"$tdir/documents.parquet")
    val rows = SparkEntry.queries("t35_contamination_report")(spark, tdir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(0L, 97L, 194L, 291L),
      "a < 3-token eval doc must still appear in the report")
    assert(rows(291L).getLong(1) == 0 && rows(291L).getDouble(4) == 0.0 &&
      rows(291L).getString(5) == "clean")
    assert(rows(0L).getString(5) == "burned" && rows(0L).getDouble(4) == 1.0)
    assert(rows(97L).getString(5) == "clean" &&
      rows(97L).getDouble(4) == 0.0 && rows(97L).getLong(3) == 0)
    assert(rows(194L).getString(5) == "partial" &&
      rows(194L).getDouble(4) == 0.4 && rows(194L).getLong(2) == 2)
  }

  test("t35: bounds and verdict thresholds hold on the real fixture") {
    val rows = ExtensionQueries8.all("t35_contamination_report")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nc, frac, v) =
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getString(5))
      assert(nc >= 0 && nc <= ns)
      assert(math.abs(frac - math.floor(nc.toDouble / ns * 1e6 + 0.5) / 1e6) == 0.0)
      val expect = if (frac >= 0.8) "burned"
        else if (frac >= 0.2) "partial" else "clean"
      assert(v == expect)
    }
  }

  // ---- d22: incremental cluster maintenance ----

  test("d22: a delta doc bridging two old clusters merges them through the stars") {
    import spark.implicits._
    import graft.operators.Dedup
    val oldIds = Seq(1L, 2L, 3L, 5L).toDF("id")
    val oldPairs = Seq((1L, 2L), (3L, 5L)).toDF("doc_a", "doc_b")
    val prior = Dedup.labelClusters(oldIds, oldPairs, 64)
    assert(prior.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 5L -> 3L))
    val allIds = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val stars = prior.select(col("id").as("doc_a"), col("label").as("doc_b"))
    // the new doc collides with a NON-representative member of each old
    // cluster — the merge must route through the stored representatives
    val deltaEdges = Seq((4L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val incr = Dedup.labelClusters(allIds, stars.unionByName(deltaEdges), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.labelClusters(allIds, oldPairs.unionByName(deltaEdges), 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full, "star-compressed graph must match the full graph")
    assert(incr.values.toSet == Set(1L),
      "all five docs must merge to the global min representative")
  }

  test("d22 equals d07's full recompute row-for-row on the fixture") {
    val incr = ExtensionQueries8.all("d22_incremental_clusters")(spark, dir)
      .collect().map(_.toSeq).toList
    val full = ExtensionQueries.all("d07_dedup_clusters")(spark, dir)
      .collect().map(_.toSeq).toList
    assert(incr == full)
  }

  // ---- t36: DSIR importance selection ----

  test("t36: the selection flag is exactly the top-quantile threshold cut") {
    val rows = ExtensionQueries8.all("t36_dsir_selection")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getBoolean(4)))
    val n = rows.length
    val nSel = rows.count(_._2)
    assert(nSel >= n / 4 && nSel < n,
      s"$nSel of $n selected at the 75th percentile")
    assert(rows.filter(_._2).map(_._1).min >=
      rows.filterNot(_._2).map(_._1).max,
      "every selected score must be at or above every unselected score")
  }

  test("t36: planted target-like train doc outscores a disjoint one, and the " +
      "engine score equals an exact driver-side DetLn recompute") {
    import spark.implicits._
    val tdir = graft.sources.Scratch.fresh(spark, "r13c_t36")
    val docs = Seq(
      (0L, "alpha beta gamma"),      // eval target
      (1L, "alpha beta gamma"),      // train, target-like
      (2L, "zeta eta theta"),        // train, disjoint
      (3L, "iota kappa lambda mu"))  // train, disjoint filler
    docs.toDF("doc_id", "text").write.parquet(s"$tdir/documents.parquet")
    val got = SparkEntry.queries("t36_dsir_selection")(spark, tdir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exact recompute with the same bucket hash and DetLn reference
    val B = ExtensionQueries8.DsirBuckets
    def bucket(t: String) = ExtensionQueries8.md5Hash48Lit(t) % B
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").toSeq
    val evalToks = toks(docs.head._2)
    val trainDocs = docs.tail
    val tcnt = evalToks.groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong }
    val allTrain = trainDocs.flatMap(d => toks(d._2))
    val ccnt = allTrain.groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong }
    import graft.functions.DetLn.detLnScala
    def wFp(b: Long) = math.floor((detLnScala(tcnt.getOrElse(b, 0L) + 1) -
      detLnScala(ccnt(b) + 1)) * 1e6).toLong
    val gFp = math.floor((detLnScala(allTrain.size + B) -
      detLnScala(evalToks.size + B)) * 1e6).toLong
    trainDocs.foreach { case (id, text) =>
      val tk = toks(text)
      val expect = tk.groupBy(bucket).map { case (b, xs) => xs.size * wFp(b) }.sum +
        tk.size * gFp
      assert(got(id)._2 == expect, s"doc $id engine ${got(id)._2} vs $expect")
    }
    assert(got(1L)._2 > got(2L)._2,
      "the target-identical train doc must outscore the disjoint one")
  }

  // ---- s34: prototype pruning ----

  private lazy val pruned =
    ExtensionQueries8.all("s34_prototype_pruning")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))

  test("s34: each cell keeps its hard half — a clean median cut") {
    pruned.groupBy(_._2).foreach { case (cell, rows) =>
      val kept = rows.filter(_._4)
      val frac = kept.length.toDouble / rows.length
      assert(frac >= 0.5 - 1e-9 && frac <= 0.75,
        s"cell $cell keeps ${kept.length}/${rows.length}")
      if (kept.nonEmpty && kept.length < rows.length)
        assert(kept.map(_._3).max <= rows.filterNot(_._4).map(_._3).min,
          s"cell $cell: kept (hard) cosines must all lie below dropped ones")
    }
  }

  test("s34: every vector sits in its own argmax cell (assignment audit)") {
    val e = ExtensionQueries.embeddingsD(spark, dir)
      .select(col("vec_id"), col("v")).limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val samp = ExtensionQueries.embeddingsD(spark, dir)
      .select(col("vec_id"), col("v"))
      .withColumn("hrank",
        pmod(pmod(col("vec_id"), lit(1000003L)) * lit(427799L), lit(1000003L)))
      .orderBy(col("hrank"), col("vec_id"))
      .limit(ExtensionQueries8.KmSampleN)
      .select(col("vec_id"), col("v"))
    val (cent, _, _) = graft.operators.Kmeans.fitConverged(samp,
      k = ExtensionQueries.IvfCells, maxIters = ExtensionQueries8.KmConvMaxIters)
    val cs = cent.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cellOf = pruned.map(p => p._1 -> p._2).toMap
    e.foreach { case (id, v) =>
      val own = cos(v, cs(cellOf(id)))
      cs.foreach { case (c, cv) =>
        assert(own >= cos(v, cv) - 1e-9,
          s"vec $id assigned to ${cellOf(id)} but cell $c is closer")
      }
    }
  }

  // ---- q98: persisted KMV sample lake ----

  test("q98: exact regime — the persisted-sample estimate IS the exact count") {
    val rows = ExtensionQueries8.all("q98_kmv_sample_lake")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(3).toLong == r.getLong(6),
        s"${r.getString(0)}: n_kept ${r.getInt(3)} vs true ${r.getLong(6)}")
      assert(r.getDouble(5) == r.getLong(6).toDouble,
        s"${r.getString(0)}: below saturation the estimate must be exact")
    }
  }

  test("q98: union-and-trim of SATURATED shard samples equals the global bottom-k") {
    import spark.implicits._
    val k = 8
    val all = (1L to 100L).map(h => h * 37 % 101).distinct
    val shards = all.grouped(25).map(g => g.sorted.take(k)).toSeq
    val merged = shards.toDF("hs")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("hs"))))),
        1, k).as("m"))
      .head.getSeq[Long](0).toList
    assert(merged == all.sorted.take(k).toList,
      "the shard layer must be algebraically transparent at saturation")
  }

  // ---- g04: duplicate-cluster health ----

  test("g04: bucket rows partition the cluster set and the verdict recomputes") {
    val rows = ExtensionQueries8.all("g04_cluster_health")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (nClusters, nDocs) = (rows.head.getLong(3), rows.head.getLong(4))
    assert(rows.map(_.getLong(1)).sum == nClusters,
      "bucket cluster counts must sum to n_clusters")
    assert(rows.map(_.getLong(2)).sum == nDocs,
      "bucket doc counts must sum to n_docs")
    val giantFrac = rows.head.getDouble(7)
    val expect = if (giantFrac >= 0.1) "giant_component" else "healthy"
    assert(rows.forall(_.getString(8) == expect))
    // the summary recounts against d07's clusters directly
    val sizes = ExtensionQueries.all("d07_dedup_clusters")(spark, dir)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    assert(nClusters == sizes.length && nDocs == sizes.sum &&
      rows.head.getLong(5) == sizes.max)
  }

  // ---- t37: epoch-reshuffled reader shards ----

  test("t37: shares sum to 1 per epoch, docs conserve, and epochs reshuffle") {
    val rows = ExtensionQueries8.all("t37_reader_shards")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (epoch, rs) =>
      assert(rs.map(_._3).sum == 500, s"epoch $epoch must cover every doc once")
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4)
    }
    // the per-epoch hash genuinely reshuffles: some doc changes reader
    import org.apache.spark.sql.functions.{concat_ws => cws}
    val assign = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (ExtensionQueries3.md5Hash48(cws(":", lit(0), col("doc_id"))) % 4)
          .as("r0"),
        (ExtensionQueries3.md5Hash48(cws(":", lit(1), col("doc_id"))) % 4)
          .as("r1"))
      .filter(col("r0") =!= col("r1")).count()
    assert(assign > 0, "epoch 1 must assign some docs to different readers")
  }

  // ---- s35: ANN recall Wilson intervals ----

  test("s35: every interval is in [0,1], contains its point recall, and recomputes") {
    val rows = ExtensionQueries8.all("s35_recall_ci")(spark, dir).collect()
    assert(rows.nonEmpty)
    val z = 1.959964
    rows.foreach { r =>
      val (nT, nH) = (r.getLong(2), r.getLong(3))
      val (rec, lo, hi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= rec + 1e-9 && rec <= hi + 1e-9,
        s"${r.getString(0)}: [$lo, $hi] must bracket $rec")
      val p = nH.toDouble / nT
      val denom = 1.0 + z * z / nT
      val center = (p + z * z / (2.0 * nT)) / denom
      val half = z * math.sqrt(p * (1 - p) / nT + z * z / (4.0 * nT * nT)) / denom
      assert(math.abs(lo - (center - half)) < 1e-5 &&
        math.abs(hi - (center + half)) < 1e-5,
        s"${r.getString(0)}: Wilson recompute mismatch")
    }
  }

  // ---- e20: sample-ratio-mismatch guardrail ----

  test("e20: counts recount, chi2 matches, and the healthy fixture split passes") {
    val r = ExtensionQueries8.all("e20_srm_check")(spark, dir).head()
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val users = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    assert(nA == users.count(_ % 2 == 0) && nB == users.count(_ % 2 == 1))
    val chi2 = (nA - nB).toDouble * (nA - nB) / (nA + nB)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-4)
    assert(!r.getBoolean(4),
      "the fixture's hash split is healthy — SRM must not fire")
  }
}
