package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 second batch: the two new join families — the data×data
  * interval-overlap join (JoinOps.intervalOverlapJoin) and blocked record
  * linkage (operators.Linkage). The overlap join's contract is checked
  * against the naive theta join on adversarial geometry (multi-bucket
  * spans, pairs sharing several buckets, closed-endpoint touching); the
  * plan check pins that the production query never degrades to the
  * theta-join fallback (BroadcastNestedLoopJoin / CartesianProduct).
  */
class Round17bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  import graft.operators.{JoinOps, Linkage}

  private val W = 1000L

  /** Deterministic pseudo-random closed intervals: lengths from sub-bucket
    * to many-bucket so pairs overlap across several shared buckets (the
    * dedup-free attribution's hard case).
    */
  private def intervals(seed: Int, n: Int, prefix: String) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      val start = rnd.nextLong(10 * W)
      val len = rnd.nextLong(4 * W)
      (i.toLong, start, start + len)
    }
    spark.createDataFrame(rows).toDF(s"${prefix}_id", s"${prefix}_s",
      s"${prefix}_e")
  }

  test("intervalOverlapJoin equals the naive theta join on random " +
      "multi-bucket intervals, one row per overlapping pair — across " +
      "bucket widths incl. the degenerate decompositions") {
    val l = intervals(1, 150, "l")
    val r = intervals(2, 150, "r")
    val naive = l.crossJoin(r)
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(naive.length > 1000, "fixture geometry should overlap densely")
    // width 37: ragged alignment; W: the intended scale; 20 000·W: every
    // interval lands in one bucket (the join degenerates to a single
    // shared key, attribution still unique)
    Seq(37L, W, 20000 * W).foreach { w =>
      val bucketed = JoinOps.intervalOverlapJoin(l, r, "l_s", "l_e",
          "r_s", "r_e", w)
        .select("l_id", "r_id").collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      // exactly once per pair: multi-bucket-shared overlaps do not
      // duplicate at any width
      assert(bucketed.length == bucketed.distinct.length, s"width $w")
      assert(bucketed.sorted.toSeq == naive.sorted.toSeq, s"width $w")
    }
  }

  test("intervalOverlapJoin closed-interval semantics: endpoint touching " +
      "counts as overlap, one-past misses, across a bucket boundary") {
    val l = spark.createDataFrame(Seq((1L, 0L, W))).toDF("l_id", "l_s", "l_e")
    val r = spark.createDataFrame(Seq(
      (10L, W, 2 * W),      // touches l's end exactly (next bucket)
      (11L, W + 1, 2 * W),  // one past: no overlap
      (12L, 0L, 0L)         // touches l's start exactly, zero-length
    )).toDF("r_id", "r_s", "r_e")
    val got = JoinOps.intervalOverlapJoin(l, r, "l_s", "l_e", "r_s", "r_e", W)
      .select("r_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 12L))
  }

  test("blockedCandidates: a pair co-keyed by BOTH passes appears once; " +
      "a pair only the second pass keys is found; null block keys drop " +
      "their row from that pass only") {
    val a = spark.createDataFrame(Seq(
      (1L, "x", "p"), (2L, "y", "q"), (3L, null.asInstanceOf[String], "r")))
      .toDF("a_id", "a_k1", "a_k2")
    val b = spark.createDataFrame(Seq(
      (10L, "x", "p"),  // meets 1 in both passes -> once
      (11L, "z", "q"),  // meets 2 only via k2
      (12L, null.asInstanceOf[String], "r")))  // meets 3 only via k2
      .toDF("b_id", "b_k1", "b_k2")
    val got = Linkage.blockedCandidates(a, b,
        Seq((col("a_k1"), col("b_k1")), (col("a_k2"), col("b_k2"))))
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("block purging drops an oversized block whole (either side over " +
      "the cap kills the pass's pairs) and leaves bounded blocks alone") {
    val a = spark.createDataFrame(
      (1L to 5L).map(i => (i, "hot")) :+ (6L, "cold"))
      .toDF("a_id", "a_k")
    val b = spark.createDataFrame(Seq((10L, "hot"), (11L, "cold")))
      .toDF("b_id", "b_k")
    // cap 4: the 5-member hot block purges on a's side even though b's
    // side has one member; cold (1x1) survives
    val got = Linkage.blockedCandidates(a, b,
        Seq((col("a_k"), col("b_k"))), maxSide = 4)
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == Seq((6L, 11L)))
    // no cap: all 5 hot pairs + cold
    val uncapped = Linkage.blockedCandidates(a, b,
        Seq((col("a_k"), col("b_k")))).count()
    assert(uncapped == 6)
  }

  test("bestMatch keeps exactly one row per left id: min distance, then " +
      "min tie-break key") {
    val scored = spark.createDataFrame(Seq(
      (1L, 30L, 2), (1L, 20L, 1), (1L, 10L, 1),  // dist tie at 1 -> key 10
      (2L, 40L, 0)))
      .toDF("a_key", "b_key", "distance")
    val got = Linkage.bestMatch(scored, "a_key", "distance", "b_key")
      .select("a_key", "b_key").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 10L), (2L, 40L)))
  }

  /** Brute-force stabbing truth for peak concurrency: within a bucket the
    * concurrency function is piecewise constant, changing only at delta
    * instants, so its max over the bucket is attained at the bucket start
    * or at a delta instant inside it — count intervals containing each
    * candidate instant directly, no sweep formulation shared with the
    * operator.
    */
  private def stabbingPeaks(iv: Seq[(Long, Long)], w: Long) = {
    val deltaUs = iv.flatMap { case (s, e) => Seq(s, e + 1) }
    val buckets = deltaUs.map(_ / w).distinct.sorted
    buckets.map { b =>
      val points = (b * w) +: deltaUs.filter(u => u / w == b)
      val peak = points.map(t => iv.count { case (s, e) =>
        s <= t && t <= e }.toLong).max
      (b, peak)
    }
  }

  test("peakConcurrencyByBucket equals brute-force interval stabbing " +
      "(per-bucket peak) and conserves net deltas, on random " +
      "multi-bucket intervals") {
    val iv = intervals(7, 300, "x")
    val got = graft.operators.EventOps
      .peakConcurrencyByBucket(iv, "x_s", "x_e", W)
      .select("bucket", "peak", "net").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val raw = iv.select("x_s", "x_e").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = stabbingPeaks(raw, W)
    assert(got.nonEmpty && got.map(x => (x._1, x._2)) == truth)
    // exact per-bucket nets, independently: arrivals bucket by start,
    // departures by end+1
    val netTruth = got.map { case (b, _, _) =>
      b -> (raw.count(_._1 / W == b).toLong -
        raw.count(iv => (iv._2 + 1) / W == b).toLong)
    }.toMap
    assert(got.forall { case (b, _, net) => net == netTruth(b) })
    // and they telescope: total sums to zero (every +1 has its -1)
    assert(got.map(_._3).sum == 0L)
    // the geometry genuinely overlaps (peak > 1 somewhere)
    assert(got.exists(_._2 > 1))
  }

  test("peakConcurrencyByBucket boundary semantics: adjacent intervals " +
      "(end+1 == start) are NOT concurrent, endpoint-touching ones ARE, " +
      "and a departure-only bucket peaks at the carried-in base") {
    // A=[0, W-1], B=[W, 5W]: adjacent, never overlap -> peak 1 everywhere
    val adjacent = spark.createDataFrame(Seq(
      (0L, W - 1), (W, 5 * W))).toDF("x_s", "x_e")
    val gotAdj = graft.operators.EventOps
      .peakConcurrencyByBucket(adjacent, "x_s", "x_e", W)
      .select("peak").collect().map(_.getLong(0)).max
    assert(gotAdj == 1L)
    // A=[0, W], B=[W, 5W]: touch at W (closed) -> peak 2 in bucket 1
    val touching = spark.createDataFrame(Seq(
      (0L, W), (W, 5 * W))).toDF("x_s", "x_e")
    val gotTouch = graft.operators.EventOps
      .peakConcurrencyByBucket(touching, "x_s", "x_e", W)
      .select("peak").collect().map(_.getLong(0)).max
    assert(gotTouch == 2L)
    // A=[0, 1.5W): bucket 1 holds only A's departure, yet A is open
    // through half of it — peak there is 1 (the base), not 0
    val departing = spark.createDataFrame(Seq(
      (0L, (3 * W) / 2 - 1))).toDF("x_s", "x_e")
    val gotDep = graft.operators.EventOps
      .peakConcurrencyByBucket(departing, "x_s", "x_e", W)
      .select("bucket", "peak").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(gotDep == Seq((0L, 1L), (1L, 1L)))
  }

  test("withGlobalPositions equals the one-partition global row_number " +
      "under the same total order, including duplicate keys") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(40).toString))
    val df = spark.createDataFrame(rows).toDF("id", "k")
    val got = Linkage.withGlobalPositions(df, Seq(col("k"), col("id")))
      .select("id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val truth = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == truth)
  }

  test("sortedNeighborhood pairs exactly the opposite-side records " +
      "within the window of the merged total order, each pair once") {
    val rnd = new scala.util.Random(13)
    val aRows = (0L until 120L).map(i => (i * 2, rnd.nextInt(30).toString))
    val bRows = (0L until 120L).map(i => (i * 2 + 1, rnd.nextInt(30).toString))
    val a = spark.createDataFrame(aRows).toDF("a_key", "a_name")
    val b = spark.createDataFrame(bRows).toDF("b_key", "b_name")
    val w = 4
    val got = Linkage.sortedNeighborhood(a, b, col("a_name"), col("b_name"),
        "a_key", "b_key", w)
      .select("a_key", "b_key").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // naive: merged (k, side, id) total order, all cross-side pairs with
    // |Δpos| <= w
    val merged = (aRows.map { case (id, k) => (k, 0, id) } ++
      bRows.map { case (id, k) => (k, 1, id) })
      .sortBy { case (k, s, id) => (k, s, id) }.zipWithIndex
    val naive = for {
      ((ka, sa, ia), pa) <- merged if sa == 0
      ((kb, sb, ib), pb) <- merged if sb == 1
      if math.abs(pa - pb) <= w
    } yield (ia, ib)
    assert(got.length == got.distinct.length)
    assert(got.sorted.toSeq == naive.sorted.toSeq)
    assert(naive.nonEmpty)
  }

  test("t39 weighted sample equals the Scala-reference Efraimidis-" +
      "Spirakis computation: same keys (bit-identical doubles), same " +
      "top-K cut, and the heaviest docs are genuinely over-represented") {
    val out = ExtensionQueries9.all("t39_weighted_sample")(spark, dir)
      .collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h48(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${ExtensionQueries9.SampleSeed}:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val ref = docs.filter(_._2 > 0).map { case (id, w) =>
      val lnU = graft.functions.DetLn.detLnScala(h48(id) + 1) -
        ExtensionQueries9.Ln2x48
      (id, lnU / w.toDouble)
    }
    val refTop = ref.sortBy { case (id, s) => (-s, id) }
      .take(ExtensionQueries9.SampleK).sortBy(_._1)
    assert(out.length == ExtensionQueries9.SampleK)
    assert(out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Double]("score"))).toSeq == refTop.toSeq)
    // weight proportionality, coarsely: the selected docs' mean weight
    // exceeds the corpus mean (inclusion probability grows with weight)
    val selMean = out.map(_.getAs[Long]("weight")).sum.toDouble / out.length
    val allMean = docs.map(_._2).sum.toDouble / docs.length
    assert(selMean > allMean)
  }

  test("t40 takes exactly StratumK docs per source, each stratum's cut " +
      "consistent with t39's global keys restricted to that source") {
    val out = ExtensionQueries9.all("t40_stratified_sample")(spark, dir)
      .collect()
    val perSource = out.groupBy(_.getAs[String]("source"))
      .map { case (s, rows) => s -> rows.length }
    assert(perSource.values.forall(_ == ExtensionQueries9.StratumK))
    assert(perSource.size == 20)
    // within a stratum, the selected set is the top-K by (score desc,
    // doc_id) of that source's docs — cross-check one stratum against
    // independently recomputed keys
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("source") === "src3")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h48(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${ExtensionQueries9.SampleSeed}:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val refTop = docs.filter(_._2 > 0).map { case (id, w) =>
      (id, (graft.functions.DetLn.detLnScala(h48(id) + 1) -
        ExtensionQueries9.Ln2x48) / w.toDouble)
    }.sortBy { case (id, s) => (-s, id) }
      .take(ExtensionQueries9.StratumK).map(_._1).sorted.toSeq
    val gotSrc3 = out.filter(_.getAs[String]("source") == "src3")
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(gotSrc3 == refTop)
  }

  test("t41 apportionment: allocations sum exactly to the budget, every " +
      "source's count equals its alloc, and each alloc sits within 1 of " +
      "its exact quota") {
    val out = ExtensionQueries9.all("t41_mixture_sample")(spark, dir)
      .collect()
    assert(out.length == ExtensionQueries9.MixtureBudget)
    val perSource = out.groupBy(_.getAs[String]("source"))
      .map { case (s, rows) =>
        val alloc = rows.head.getAs[Int]("alloc")
        assert(rows.length == alloc, s"$s emitted ${rows.length} != $alloc")
        s -> alloc.toLong
      }
    assert(perSource.values.sum == ExtensionQueries9.MixtureBudget.toLong)
    // quota bound: |alloc - B*w/W| < 1 for every source
    val w = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("n_chars") > 0)
      .groupBy("source").agg(sum("n_chars").as("w")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w")).toMap
    val wtot = w.values.sum.toDouble
    perSource.foreach { case (s, alloc) =>
      val quota = ExtensionQueries9.MixtureBudget * w(s) / wtot
      assert(math.abs(alloc - quota) < 1.0, s"$s alloc=$alloc quota=$quota")
    }
  }

  test("m12 channel stats: every image emits 3 channel rows, sums match " +
      "a direct byte recount of one doc's raster, and both flags fire " +
      "in both directions on the fixture") {
    val out = ExtensionQueries9.all("m12_image_channel_stats")(spark, dir)
      .collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 === 0).select("doc_id", "text").collect()
    assert(out.length == docs.length * 3)
    // recount one raster by hand: text space-padded/truncated to W*H*3
    val w = graft.operators.Multimodal.ImgW
    val h = graft.operators.Multimodal.ImgH
    val d0 = docs.minBy(_.getLong(0))
    val raster = d0.getString(1).padTo(w * h * 3, ' ').take(w * h * 3)
    (0 until 3).foreach { c =>
      val bytes = (0 until w * h).map(i => raster(i * 3 + c).toLong)
      val row = out.find(r => r.getAs[Long]("doc_id") == d0.getLong(0) &&
        r.getAs[Int]("channel") == c).get
      assert(row.getAs[Long]("psum") == bytes.sum)
      assert(row.getAs[Long]("psumsq") == bytes.map(b => b * b).sum)
    }
    Seq("too_dark", "low_contrast").foreach { f =>
      assert(out.exists(_.getAs[Boolean](f)), s"$f never fires")
      assert(out.exists(!_.getAs[Boolean](f)), s"$f always fires")
    }
  }

  test("e22's physical plan never falls back to the theta join: no " +
      "CartesianProduct, no BroadcastNestedLoopJoin") {
    val df = ExtensionQueries9.all("e22_incident_exposure")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  test("t40's rank filter pushes into the shuffle as WindowGroupLimit " +
      "(per-stratum top-K heaps, never full-stratum sorts at the limit)") {
    val plan = ExtensionQueries9.all("t40_stratified_sample")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("d25's plan stays equi-join shaped: no CartesianProduct, no " +
      "BroadcastNestedLoopJoin anywhere in blocking/verify/resolution") {
    val plan = ExtensionQueries9.all("d25_record_linkage")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }

  test("d25 emits one best match per even-key customer at edit distance " +
      ">= 1 (the odd side can never carry the same name)") {
    val out = ExtensionQueries9.all("d25_record_linkage")(spark, dir)
      .collect()
    val evens = graft.sources.Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 2 === 0).count()
    assert(out.length == evens)
    assert(out.map(_.getAs[Long]("a_key")).distinct.length == out.length)
    assert(out.forall { r =>
      val d = r.getAs[Int]("distance")
      d >= 1 && d <= ExtensionQueries9.LinkMaxDist
    })
  }
}
