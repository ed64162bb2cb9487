package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18: the advice-item guards (reserved temp-name collisions now
  * fail loudly instead of corrupting results), channelStats' exactness
  * contract off the 16×9 fixture, the session-gap boundary convention
  * shared by the e11/e22/e23 oracles pinned through the ONE helper all
  * three engine queries call, and the d27 purge-cap design table checked
  * against an independent per-cap re-run of the real blocking operator.
  */
class Round18Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  import graft.operators.{JoinOps, Linkage, Multimodal, Ppm}

  // the d25/d27/d28 linkage fixture, re-derived here independently of
  // ExtensionQueries9's private helpers (cross-formulation on purpose)
  private lazy val cust =
    graft.sources.Tables.load(spark, dir, "customer")
  private def side(p: String, even: Boolean) = cust
    .filter(if (even) col("c_custkey") % 2 === 0
            else col("c_custkey") % 2 =!= 0)
    .select(col("c_custkey").as(s"${p}_key"),
      col("c_name").as(s"${p}_name"),
      col("c_nationkey").as(s"${p}_nation"),
      col("c_mktsegment").as(s"${p}_segment"),
      col("c_acctbal").as(s"${p}_acctbal"))
  private def prof(p: String) = concat_ws(":",
    col(s"${p}_nation"), col(s"${p}_segment"),
    expr(s"CAST(floor(${p}_acctbal + ${ExtensionQueries9.LinkBalShift})" +
      s" AS BIGINT) div 1000"))
  private def pre(p: String) =
    expr(s"substr(${p}_name, 1, length(${p}_name) - 1)")

  private def iv(prefix: String, extra: String*) = {
    import spark.implicits._
    val base = Seq((1L, 0L, 10L)).toDF(s"${prefix}_id", s"${prefix}_s",
      s"${prefix}_e")
    extra.foldLeft(base)((df, c) => df.withColumn(c, lit(0)))
  }

  test("reserved temp-name collisions fail loudly: intervalOverlapJoin, " +
      "blockedCandidates, withGlobalPositions, sortedNeighborhood") {
    import spark.implicits._
    // __bucket on either side would be silently clobbered then dropped
    val l = iv("l", "__bucket")
    val r = iv("r")
    val e1 = intercept[IllegalArgumentException](
      JoinOps.intervalOverlapJoin(l, r, "l_s", "l_e", "r_s", "r_e", 5L))
    assert(e1.getMessage.contains("__bucket"))
    intercept[IllegalArgumentException](
      JoinOps.intervalOverlapJoin(iv("l"), iv("r", "__bucket"),
        "l_s", "l_e", "r_s", "r_e", 5L))
    // a caller column named __bk or __n would corrupt blocking
    val ca = Seq((1L, "x")).toDF("a_key", "a_name").withColumn("__bk", lit(1))
    val cb = Seq((2L, "y")).toDF("b_key", "b_name")
    val e2 = intercept[IllegalArgumentException](
      Linkage.blockedCandidates(ca, cb,
        Seq((col("a_name"), col("b_name")))))
    assert(e2.getMessage.contains("__bk"))
    // an input already carrying pos would make sortedNeighborhood pair
    // on the wrong order — withGlobalPositions refuses it (and its temps)
    val withPos = Seq((1L, "x")).toDF("id", "k").withColumn("pos", lit(9L))
    val e3 = intercept[IllegalArgumentException](
      Linkage.withGlobalPositions(withPos, Seq(col("k"), col("id"))))
    assert(e3.getMessage.contains("pos"))
    // sortedNeighborhood's join-back temps
    val sa = Seq((1L, "x")).toDF("a_key", "a_name").withColumn("__aid", lit(1))
    val sb = Seq((2L, "y")).toDF("b_key", "b_name")
    val e4 = intercept[IllegalArgumentException](
      Linkage.sortedNeighborhood(sa, sb, col("a_name"), col("b_name"),
        "a_key", "b_key", 4))
    assert(e4.getMessage.contains("__aid"))
  }

  test("channelStats is integer-exact on a raster far past the Long " +
      "fixed-point bound (n = 640x480: the variance numerator times 1e6 " +
      "overflows 2^63, where the pre-r18 Long math silently wrapped)") {
    import spark.implicits._
    val w = 640
    val h = 480
    val n = w * h
    // full-range pattern: channel c of pixel i = (i*7 + c*31) mod 256 —
    // large sums, large variance, nothing degenerate
    val px = new Array[Byte](n * 3)
    for (i <- 0 until n; c <- 0 until 3)
      px(i * 3 + c) = ((i * 7 + c * 31) % 256).toByte
    val media = Seq(Multimodal.MediaRecord(42L, "image",
      Ppm.encode(w, h, px), w, h)).toDS()
    val out = Multimodal.channelStats(media, 64L * 1000000L,
      1000L * 1000000L).collect().sortBy(_.channel)
    assert(out.length == 3)
    for (c <- 0 until 3) {
      val bytes = (0 until n).map(i => BigInt(px(i * 3 + c) & 0xff))
      val s = bytes.sum
      val sq = bytes.map(b => b * b).sum
      // independent BigInt formulation of the same fixed-point contract
      val meanFp = s * 1000000 / n
      val varFp = (BigInt(n) * sq - s * s) * 1000000 / (BigInt(n) * n)
      assert((BigInt(n) * sq - s * s) * 1000000 > BigInt(Long.MaxValue),
        "fixture must actually exceed the Long fixed-point product bound")
      val row = out(c)
      assert(row.psum == s.toLong && row.psumsq == sq.toLong)
      assert(row.mean_fp == meanFp.toLong, s"channel $c mean")
      assert(row.var_fp == varFp.toLong, s"channel $c variance")
    }
  }

  test("session-gap boundary: two events EXACTLY SessionGapSec apart " +
      "merge into one session through the shared sessionWindowed helper " +
      "(the > rule all three of e11/e22/e23's oracles encode); one " +
      "microsecond past the gap splits") {
    import spark.implicits._
    def run(ts2: String): Seq[(Long, Long)] = {
      val ev = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L,
          "view", 1.0),
        (2L, java.sql.Timestamp.valueOf(ts2), 7L, "view", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      graft.streaming.EventStreams
        .sessionWindowed(ev, ExtensionQueries5.SessionGapSec)
        .select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }
    // SessionGapSec = 1800: 00:30:00 is exactly gap after 00:00:00
    assert(run("2024-01-01 00:30:00") == Seq((7L, 2L)),
      "exact-gap events must merge into ONE session")
    assert(run("2024-01-01 00:30:00.000001").sortBy(_._2) ==
      Seq((7L, 1L), (7L, 1L)),
      "one microsecond past the gap must split")
  }

  test("d27 cap table matches an independent per-cap re-run of " +
      "blockedCandidates (candidates AND verified matches), is " +
      "cumulative in cap, and covers the whole grid") {
    val out = ExtensionQueries9.all("d27_linkage_cap_tuning")(spark, dir)
      .collect().sortBy(_.getAs[Int]("cap"))
    assert(out.map(_.getAs[Int]("cap")).toSeq ==
      Seq(1, 2, 4, 8, 16, 32, 64, 128))
    // every measure is nondecreasing in cap; matches never exceed cands
    for (m <- Seq("name_blocks", "name_pairs", "profile_blocks",
        "profile_pairs", "n_candidates", "n_matches")) {
      val vs = out.map(_.getAs[Long](m)).toSeq
      assert(vs == vs.sorted, s"$m not cumulative: $vs")
    }
    out.foreach(r => assert(r.getAs[Long]("n_matches") <=
      r.getAs[Long]("n_candidates")))
    // independent formulation: actually RUN the blocking operator at
    // each probed cap and count its distinct candidates + verified
    // matches — the design table must price exactly what the operator
    // would do
    for (cap <- Seq(1, 8, 64)) {
      val cands = Linkage.blockedCandidates(
        side("a", even = true), side("b", even = false),
        Seq((pre("a"), pre("b")), (prof("a"), prof("b"))),
        maxSide = cap)
      val nCand = cands.count()
      val nMatch = cands.filter(
        levenshtein(col("a_name"), col("b_name")) <=
          ExtensionQueries9.LinkMaxDist).count()
      val row = out.find(_.getAs[Int]("cap") == cap).get
      assert(row.getAs[Long]("n_candidates") == nCand,
        s"cap $cap candidates: table ${row.getAs[Long]("n_candidates")} " +
          s"vs operator $nCand")
      assert(row.getAs[Long]("n_matches") == nMatch,
        s"cap $cap matches: table ${row.getAs[Long]("n_matches")} " +
          s"vs operator $nMatch")
    }
    // the production cap choice is citable: at LinkMaxBlock the table
    // row exists and carries every match the loosest grid cap finds on
    // this fixture's self-bounding name blocks
    val at64 = out.find(_.getAs[Int]("cap") == ExtensionQueries9
      .LinkMaxBlock).get
    assert(at64.getAs[Long]("n_matches") > 0)
  }

  test("d28 entity groups equal an exact driver-side union-find over the " +
      "same verified match edges (true connected components, not bounded " +
      "rounds), label every record, and use the component-min id") {
    val out = ExtensionQueries9.all("d28_entity_groups")(spark, dir)
      .collect()
    assert(out.length == cust.count())
    val labels = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent exact formulation: collect the verified matches (tiny
    // at sf0.001) and union-find them on the driver
    val matches = Linkage.blockedCandidates(
        side("a", even = true), side("b", even = false),
        Seq((pre("a"), pre("b")), (prof("a"), prof("b"))),
        maxSide = ExtensionQueries9.LinkMaxBlock)
      .filter(levenshtein(col("a_name"), col("b_name")) <=
        ExtensionQueries9.LinkMaxDist)
      .select(col("a_key"), col("b_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(matches.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    matches.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // exact components: every record's entity = min key reachable from it
    val expected = labels.keys.map(k => k -> find(k)).toMap
    assert(labels == expected,
      s"engine labels differ from exact union-find on " +
        s"${labels.count(kv => expected(kv._1) != kv._2)} records")
    // structural: the entity id is a member (its own label) and the min
    out.groupBy(_.getLong(1)).foreach { case (label, rows) =>
      assert(rows.map(_.getLong(0)).min == label)
    }
  }

  test("d29 incremental entity maintenance equals the purge-free " +
      "name-lane full recompute (exact union-find over ALL matches at " +
      "once — a derivation sharing nothing with the stars+delta pass), " +
      "and the delta genuinely attaches to prior entities") {
    val out = ExtensionQueries9.all("d29_incremental_entities")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == cust.count())
    val labels = out.toMap
    // independent full recompute: every name-lane match of the WHOLE
    // corpus in one pass, union-found on the driver (the bridge case for
    // the shared stars+delta propagation engine is pinned adversarially
    // in Round13cSpec; the name lane's prefix cliques are complete, so
    // this fixture exercises attach, not bridge)
    val a = side("a", even = true).withColumn("k", pre("a"))
      .select(col("k"), col("a_key"), col("a_name"))
    val b = side("b", even = false).withColumn("k", pre("b"))
      .select(col("k"), col("b_key"), col("b_name"))
    val matches = a.join(b, "k")
      .filter(levenshtein(col("a_name"), col("b_name")) <=
        ExtensionQueries9.LinkMaxDist)
      .select(col("a_key"), col("b_key"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    matches.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val expected = labels.keys.map(k => k -> find(k)).toMap
    assert(labels == expected,
      s"incremental labels differ from the full recompute on " +
        s"${labels.count(kv => expected(kv._1) != kv._2)} records")
    // the ingest convention is live: some entity holds BOTH a delta
    // record (key % IngestMod == 0) and a prior record
    val byEntity = out.groupBy(_._2)
    assert(byEntity.exists { case (_, members) =>
      members.exists(_._1 % 4 == 0) && members.exists(_._1 % 4 != 0)
    }, "no entity spans the delta/prior split — the convention is dead")
  }

  test("the d29 contract boundary is real: under a PURGED lane, a delta " +
      "that pushes a block past the cap makes stars+delta DIVERGE from " +
      "the full recompute — incremental maintenance of capped blocking " +
      "is impossible, not merely unimplemented") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // one block key shared by everyone; cap = 2 per side. Prior corpus:
    // 2 left + 2 right (block admitted, all pairs match) -> one prior
    // entity {1,2,3,4}. Delta: a third left record -> the full
    // recompute's block now holds 3 > cap on the left and is PURGED
    // WHOLE (no matches at all: five singleton entities), but the
    // incremental pass cannot retract the prior entity's connectivity.
    val cap = 2
    def feed(ids: Seq[Long], p: String) =
      ids.toDF(s"${p}_key").withColumn(s"${p}_name", lit("k"))
    def entities(matches: DataFrame, all: Seq[Long]): Map[Long, Long] = {
      val pairs = matches.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      all.map(k => k -> find(k)).toMap
    }
    def blocked(a: DataFrame, b: DataFrame) = Linkage.blockedCandidates(
      a, b, Seq((col("a_name"), col("b_name"))), maxSide = cap)
      .select(col("a_key"), col("b_key"))
    // prior: left {1,3}, right {2,4} -> block sides 2/2, admitted
    val priorFull = entities(
      blocked(feed(Seq(1L, 3L), "a"), feed(Seq(2L, 4L), "b")),
      Seq(1L, 2L, 3L, 4L))
    assert(priorFull.values.toSet.size == 1, s"prior must merge: $priorFull")
    // full recompute WITH the delta (left gains 5): block purged whole
    val fullNow = entities(
      blocked(feed(Seq(1L, 3L, 5L), "a"), feed(Seq(2L, 4L), "b")),
      Seq(1L, 2L, 3L, 4L, 5L))
    assert(fullNow.values.toSet.size == 5,
      s"the crossed cap must purge the whole block: $fullNow")
    // incremental: prior-entity star edges + delta-touching edges (the
    // delta's own block view also purges — but the STARS keep the old
    // connectivity that the full recompute just retracted)
    val stars = priorFull.toSeq.toDF("s", "t")
      .select(col("s").as("a_key"), col("t").as("b_key"))
    val incremental = entities(stars, Seq(1L, 2L, 3L, 4L, 5L))
    assert(incremental != fullNow,
      "stars+delta must DIVERGE from the full recompute here — if this " +
        "ever passes as equal, the d29 name-lane-only contract can be " +
        "widened")
    assert(incremental.filter(_._1 <= 4L).values.toSet.size == 1,
      "the stars bake in exactly the retracted connectivity")
  }

  test("d27/d28/d29 plans stay equi-join shaped: no CartesianProduct, " +
      "no BroadcastNestedLoopJoin anywhere") {
    for (q <- Seq("d27_linkage_cap_tuning", "d28_entity_groups",
        "d29_incremental_entities")) {
      val plan = ExtensionQueries9.all(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop"), s"$q:\n$plan")
    }
  }
}
