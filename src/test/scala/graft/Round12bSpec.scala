package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, TextOps}

/** Round 12, second batch: invariants for the sketch family (q88 CMS
  * guarantee/exact regime/streaming parity, q89 HLL accuracy +
  * partitioning invariance, q90 register algebra, q91 join-size
  * guarantee), the split/audit surface (d18 zero-straddlers + d12
  * contrast, q92 failing-set, q93 discrimination, t31 self-consistency),
  * the ANN/embedding diagnostics (s25 exactly-once, s26 monotonicity,
  * s27 delta guarantee, s28 dominance + partitioning invariance, s29
  * variance budget, d19 estimator accuracy + the pathological-family
  * contrast), and the event/media additions (e15 credit conservation,
  * e16 user-base partition, m10 keyframe consistency, g03 fixed point).
  */
class Round12bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.load(spark, sf, "documents")
  private def words = docs
    .select(explode(TextOps.tokens(col("text"))).as("term"))

  // ---- q88 Count-Min ----

  test("q88: CMS estimates never undercount (est >= true for every probe)") {
    val rows = ExtensionQueries7.all("q88_countmin")(spark, sf).collect()
    assert(rows.length == ExtensionQueries7.CmsProbes)
    rows.foreach { r =>
      val (tc, est) = (r.getAs[Long]("true_cnt"), r.getAs[Long]("est_cnt"))
      assert(est >= tc, s"term ${r.getString(0)}: est $est < true $tc")
    }
  }

  test("q88: width 16 < 31-term vocabulary actually collides (some overcount > 0)") {
    // The production geometry is chosen to exercise the collision regime —
    // if the fixture's vocabulary ever shrank below the width, the query
    // would silently stop demonstrating the min-over-rows estimate.
    val rows = ExtensionQueries7.all("q88_countmin")(spark, sf).collect()
    assert(rows.exists(_.getAs[Long]("overcount") > 0),
      "no collisions at width 16 — sketch demo degenerated to exact counts")
  }

  test("q88: exact regime — width >= vocabulary makes every estimate exact") {
    val exact = ExtensionQueries7.countMin(words, depth = 3, width = 4096L,
      probes = 31).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      assert(r.getAs[Long]("overcount") == 0L,
        s"term ${r.getString(0)} overcounted with zero expected collisions")
    }
  }

  test("q88: streaming counter grid (complete mode) equals the batch grid") {
    // The CMS pitch at 100 TB is that the counter grid IS the streaming
    // state — bounded depth×width keys forever, any batch split. Feed the
    // same terms through a MemoryStream in three batches and assert the
    // complete-mode grid matches the batch build bit-for-bit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val terms = (1 to 900).map(i => s"term${i % 37}")
    val stream = MemoryStream[String]
    terms.grouped(300).foreach(b => stream.addData(b: _*))
    val grid = ExtensionQueries7.cmsCounters(
      stream.toDS().toDF("term"), depth = 3, width = 16L)
    val got = graft.streaming.EventStreams.runToMemory(
        grid, "cms_stream", OutputMode.Complete())
      .as[(Int, Long, Long)].collect().toSet
    val batch = ExtensionQueries7.cmsCounters(
        terms.toDF("term"), depth = 3, width = 16L)
      .as[(Int, Long, Long)].collect().toSet
    assert(got == batch)
    assert(batch.toSeq.map(_._3).sum == 3 * 900L) // every term in every row
  }

  test("q89: streaming register state (complete mode) equals the batch registers") {
    // Like the CMS twin: HLL registers are a max-aggregation over a
    // bounded key space, so the register table IS the streaming state.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val uids = (1L to 600L)
    val stream = MemoryStream[Long]
    uids.grouped(200).foreach(b => stream.addData(b.toSeq: _*))
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      ExtensionQueries7.hllRegs(df.select(lit("x").as("seg"),
        ExtensionQueries3.md5Hash48(col("uid")).as("h")))
    val got = graft.streaming.EventStreams.runToMemory(
        regsOf(stream.toDS().toDF("uid")), "hll_stream",
        OutputMode.Complete())
      .as[(String, Long, Int)].collect().toSet
    val batch = regsOf(uids.toDF("uid")).as[(String, Long, Int)]
      .collect().toSet
    assert(got == batch)
    assert(batch.nonEmpty)
  }

  test("q91: join-size estimate never undercounts and width buys accuracy") {
    def seg(tpe: String) = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type") === tpe)
      .select(col("user_id").cast("string").as("term"))
    def run(w: Long) = ExtensionQueries7
      .cmsJoinSize(seg("view"), seg("purchase"), depth = 3, width = w)
      .collect()(0)
    val narrow = run(64L)
    val wide = run(4096L)
    assert(narrow.getAs[Long]("overcount") >= 0L)
    assert(wide.getAs[Long]("overcount") >= 0L)
    assert(wide.getAs[Long]("overcount") <= narrow.getAs[Long]("overcount"),
      "wider grid must not estimate worse")
    assert(narrow.getAs[Long]("true_join") == wide.getAs[Long]("true_join"))
  }

  test("q92: the constraint suite discriminates — exactly the acctbal rule fails") {
    val rows = ExtensionQueries7.all("q92_constraint_suite")(spark, sf)
      .collect().map(r => r.getAs[String]("check_name") -> r).toMap
    assert(rows.size == 6)
    val failing = rows.values.filterNot(_.getAs[Boolean]("passed"))
      .map(_.getString(0)).toSet
    assert(failing == Set("non_negative_acctbal"),
      s"unexpected failing set $failing")
    val direct = graft.sources.Tables.load(spark, sf, "customer")
      .filter(col("c_acctbal") < 0).count()
    assert(rows("non_negative_acctbal").getAs[Long]("violations") == direct)
    rows.values.foreach(r =>
      assert(r.getAs[Long]("checked") > 0, s"${r.getString(0)} checked 0 rows"))
  }

  test("t31: the datasheet is self-consistent") {
    val m = ExtensionQueries7.all("t31_corpus_datasheet")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // language shares partition the corpus
    val shares = m.filter(_._1.startsWith("share_lang_")).values.sum
    assert(math.abs(shares - 1.0) < 1e-4, s"lang shares sum $shares")
    // counts agree with direct recomputation
    assert(m("n_docs") == docs.count().toDouble)
    assert(m("n_tokens") == words.count().toDouble)
    assert(m("oov_rate_top16") > 0 && m("oov_rate_top16") < 1)
    assert(m("n_neardup_candidate_pairs") > 0)
  }

  test("q93: the anonymity audit discriminates and matches a direct recount") {
    val rows = ExtensionQueries7.all("q93_anonymity_audit")(spark, sf)
    val releasable = rows.filter(col("releasable")).count()
    val total = rows.count()
    assert(releasable > 0 && releasable < total,
      s"audit degenerated: $releasable of $total releasable")
    // k-anonymity flags agree with a direct group-size recount
    val under = graft.sources.Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .filter(col("count") < 5).count()
    assert(rows.filter(!col("k_anonymous")).count() == under)
  }

  // ---- d18 leakage-safe split ----

  test("d18: no LSH candidate pair straddles a split boundary") {
    val split = ExtensionQueries7.all("d18_cluster_split")(spark, sf)
      .select(col("doc_id"), col("split"))
    val feats = ExtensionQueries.docFeatures(spark, sf)
    val pairs = Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
      .select(col("doc_a"), col("doc_b"))
    val straddlers = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), Seq("doc_a"))
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddlers == 0L,
      s"$straddlers near-dup candidate pairs cross a split boundary")
  }

  test("d18: content-hash split (d12) DOES leak near-dup pairs here — the gap d18 closes") {
    // The motivating contrast: on the same fixture, d12's per-document
    // content hash separates at least one LSH candidate pair. If this ever
    // stops holding, the fixture no longer distinguishes the two splits
    // and d18's leakage test above loses its teeth.
    val d12 = ExtensionQueries.all("d12_hash_split")(spark, sf)
      .select(col("doc_id"), col("split"))
    val feats = ExtensionQueries.docFeatures(spark, sf)
    val pairs = Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
      .select(col("doc_a"), col("doc_b"))
    val straddlers = pairs
      .join(d12.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), Seq("doc_a"))
      .join(d12.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .count()
    assert(straddlers > 0L,
      "content-hash split no longer leaks on this fixture; d18 contrast gone")
  }

  test("d18: every document assigned exactly one split") {
    val split = ExtensionQueries7.all("d18_cluster_split")(spark, sf)
    assert(split.count() == docs.count())
    assert(split.select(col("doc_id")).distinct().count() == docs.count())
  }

  // ---- e15 linear attribution ----

  test("e15: per-purchase credit conserves value within floor error") {
    // Rebuild the per-purchase credit rows the query aggregates away and
    // check Σ credit_fp ∈ [value·1e6 − n_touches, value·1e6] per purchase:
    // each of the n equal shares loses < 1 micro to floor.
    val events = graft.sources.Tables.load(spark, sf, "events")
    val sessions = graft.streaming.EventStreams
      .sessionWindowed(events, ExtensionQueries5.SessionGapSec)
      .select(col("user_id").as("s_user"), col("session_start"),
        col("session_end"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .join(sessions, col("p_user") === col("s_user") &&
        col("p_ts") >= col("session_start") && col("p_ts") < col("session_end"))
    val touches = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("t_user"), col("ts").as("t_ts"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("p_id"))
    val perPurchase = purchases.join(touches,
        col("t_user") === col("p_user") &&
        col("t_ts") >= col("session_start") && col("t_ts") <= col("p_ts"))
      .withColumn("n_touches", count(lit(1)).over(wp))
      .withColumn("credit_fp",
        floor(col("value") * lit(1e6) / col("n_touches")).cast("long"))
      .groupBy(col("p_id"), col("value"))
      .agg(sum(col("credit_fp")).as("sum_fp"), max(col("n_touches")).as("n"))
      .collect()
    assert(perPurchase.nonEmpty)
    perPurchase.foreach { r =>
      val valueFp = r.getAs[Double]("value") * 1e6
      val (sumFp, n) = (r.getAs[Long]("sum_fp"), r.getAs[Long]("n"))
      assert(sumFp <= valueFp + 1e-6 && sumFp >= valueFp - n,
        s"purchase ${r.getAs[Long]("p_id")}: $sumFp not in [${valueFp - n}, $valueFp]")
    }
  }

  test("e15: total credited value never exceeds total in-session purchase value") {
    val result = ExtensionQueries7.all("e15_linear_attribution")(spark, sf)
    val credited = result.agg(sum(col("credit"))).collect()(0).getDouble(0)
    val e13 = ExtensionQueries6.all("e13_session_attribution")(spark, sf)
    val attributable = e13.agg(sum(col("value"))).collect()(0).getDouble(0)
    assert(credited <= attributable + 1e-6,
      s"credited $credited > attributable purchase value $attributable")
  }

  // ---- m10 keyframes ----

  test("m10: keyframe SAD equals m07's max_diff for every clip") {
    val kf = ExtensionQueries7.all("m10_keyframe_extract")(spark, sf)
      .select(col("doc_id"), col("kf_sad"))
    val scenes = Multimodal.sceneDetect(
        Multimodal.videoFromDocuments(docs), Multimodal.SceneCutThr).toDF()
      .select(col("doc_id"), col("max_diff"))
    val mismatches = kf.join(scenes, Seq("doc_id"))
      .filter(col("kf_sad") =!= col("max_diff")).count()
    assert(mismatches == 0L)
    assert(kf.count() == scenes.count())
  }

  test("m10: extracted frame bytes hash as claimed on a constructed clip") {
    import spark.implicits._
    // Frame 0 = 'a' bytes, frame 1 = 'b' bytes, rest spaces: the max-SAD
    // transition is frame 1 (|b-a|·fb = 144) vs frame 2 (|space-b|·fb),
    // space (32) vs 'b' (98) dominates → argmax is frame 2. Recompute md5
    // of that frame directly.
    val fb = Multimodal.VidFrameBytes
    val text = "a" * fb + "b" * fb
    val d = Seq((2L, text)).toDF("doc_id", "text")
    val row = Multimodal.keyframes(Multimodal.videoFromDocuments(d))
      .collect()(0)
    assert(row.kf_frame == 2, s"expected argmax frame 2, got ${row.kf_frame}")
    assert(row.kf_sad == fb.toLong * (98 - 32))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(" ".repeat(fb).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(row.kf_md5 == expected)
  }

  // ---- t30 vocabulary coverage ----

  test("t30: OOV rate saturates to zero once the budget covers the vocabulary") {
    val srcWords = docs.select(col("source"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val full = ExtensionQueries7.vocabCoverage(srcWords, vocabSize = 10000)
      .collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getAs[Long]("n_oov") == 0L))
    // and the production budget (16 of 31 terms) is genuinely mid-range
    val prod = ExtensionQueries7.all("t30_vocab_coverage")(spark, sf).collect()
    prod.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate > 0.0 && rate < 1.0, s"source ${r.getString(0)} rate $rate")
    }
  }

  // ---- s26 nprobe curve ----

  test("s26: recall and scan cost are both non-decreasing in nprobe") {
    val rows = ExtensionQueries7.all("s26_ivf_nprobe_curve")(spark, sf)
      .orderBy(col("nprobe")).collect()
    assert(rows.length == ExtensionQueries7.MaxProbe)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("recall") >= a.getAs[Double]("recall"),
        s"recall dropped ${a.getInt(0)} -> ${b.getInt(0)}")
      assert(b.getAs[Long]("n_scanned") > a.getAs[Long]("n_scanned"),
        s"scan cost not increasing ${a.getInt(0)} -> ${b.getInt(0)}")
    }
    // the sweep must actually discriminate: the deepest setting beats the
    // shallowest on this clustered fixture
    assert(rows.last.getAs[Double]("recall") > rows.head.getAs[Double]("recall"))
  }

  // ---- q89 HyperLogLog ----

  test("q89: estimates land within 3 standard errors of the exact counts") {
    // HLL relative standard error is 1.04/sqrt(m); 3σ at m=64 is ~39%.
    val rows = ExtensionQueries7.all("q89_hll_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bound = 3.0 * 1.04 / math.sqrt(ExtensionQueries7.HllM.toDouble)
    rows.foreach { r =>
      val (est, tru) =
        (r.getAs[Double]("est_distinct"), r.getAs[Long]("true_distinct"))
      assert(math.abs(est - tru) / tru <= bound,
        s"${r.getString(0)}: est $est vs true $tru exceeds ${bound * 100}%")
    }
  }

  test("q89: register state is partitioning-invariant (element-wise max merge)") {
    // The distributed-correctness property: however rows are distributed,
    // per-bucket maxes — and therefore sum_fp and the estimate — are a
    // pure function of the value set.
    val base = ExtensionQueries7.all("q89_hll_sketch")(spark, sf)
      .select(col("event_type"), col("sum_fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val events = graft.sources.Tables.load(spark, sf, "events")
    val shuffled = events.repartition(13)
    // rebuild through the registered body's exact arithmetic on the
    // repartitioned input by re-registering a temp dir is overkill; the
    // register fold is groupBy-max, so comparing the registered query
    // (planned over the parquet layout) with a recomputation over a
    // repartitioned cache exercises the same claim
    import org.apache.spark.sql.functions.{expr => sexpr}
    val mod = ExtensionQueries7.HllRemMod
    val rem = ExtensionQueries7.HllRemBits
    val re = shuffled
      .select(col("event_type"),
        ExtensionQueries3.md5Hash48(col("user_id")).as("h"))
      .withColumn("bucket", sexpr(s"h DIV $mod"))
      .withColumn("w", col("h") % mod)
      .withColumn("rho", when(col("w") === 0, lit(rem + 1))
        .otherwise(lit(rem + 1) - length(bin(col("w")))))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_present"),
        sum(sexpr(s"shiftleft(cast(1 as bigint), ${rem + 1} - reg)"))
          .as("present_fp"))
      .select(col("event_type"),
        (col("present_fp") + (lit(ExtensionQueries7.HllM.toLong) - col("n_present"))
          * lit(1L << (rem + 1))).as("sum_fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(re == base, s"register state changed under repartition: $re vs $base")
  }

  test("q90: register-merge algebra prices a constructed partial overlap") {
    // The fixture's behavioural segments fully overlap (every user does
    // everything), so the discriminating case is constructed: A = users
    // 1..200, B = 101..300 → |A∪B| = 300, |A∩B| = 100. Everything below
    // is deterministic (fixed hash), so windows can be tight.
    import spark.implicits._
    val df = ((1 to 200).map(i => ("a", i.toLong)) ++
        (101 to 300).map(i => ("b", i.toLong)))
      .toDF("seg", "uid")
      .select(col("seg"), ExtensionQueries3.md5Hash48(col("uid")).as("h"))
    val regs0 = ExtensionQueries7.hllRegs(df)
    val regsU = regs0.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
      .select(lit("union").as("seg"), col("bucket"), col("reg"))
    // merged registers dominate each segment's pointwise
    val dominated = regs0.join(regsU.select(col("bucket"), col("reg").as("ureg")),
        Seq("bucket"))
      .filter(col("reg") > col("ureg")).count()
    assert(dominated == 0L)
    val est = ExtensionQueries7.hllEstimate(regs0.unionByName(regsU))
      .select(col("seg"), col("corrected")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bound = 3.0 * 1.04 / math.sqrt(ExtensionQueries7.HllM.toDouble)
    assert(math.abs(est("a") - 200) / 200 <= bound)
    assert(math.abs(est("b") - 200) / 200 <= bound)
    assert(math.abs(est("union") - 300) / 300 <= bound)
    assert(est("union") >= math.max(est("a"), est("b")))
    val inter = est("a") + est("b") - est("union")
    assert(inter > 80 && inter < 160, s"incl-excl intersection $inter vs true 100")
  }

  // ---- d19 minhash signature accuracy ----

  test("d19: the signature estimator is accurate and longer signatures do better") {
    def stats(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(avg(abs(col("est_jaccard") - col("jaccard"))).as("mae"),
        avg(col("est_jaccard") - col("jaccard")).as("bias")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val (mae16, bias16) = stats(ExtensionQueries7.minhashAccuracy(spark, sf, 16))
    val (mae4, _) = stats(ExtensionQueries7.minhashAccuracy(spark, sf, 4))
    assert(mae16 < 0.1, s"16-position MAE $mae16")
    assert(math.abs(bias16) < 0.05, s"16-position bias $bias16")
    assert(mae16 <= mae4, s"more positions must not hurt: $mae16 vs $mae4")
  }

  test("d19: the banding family's small multipliers are NOT min-wise independent — the gap d19's family closes") {
    // The motivating contrast (like d18's d12-contrast): estimate from the
    // banding family's own permutations (a = 2j+1 — nearly order-
    // preserving near 0) and the bias explodes, because candidates
    // sharing one globally-small-hash shingle agree on most positions
    // regardless of true Jaccard. If this ever stops holding, the d19
    // family comment overstates its case.
    val feats = ExtensionQueries.docFeatures(spark, sf)
    val pairs = graft.operators.Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
    val sig = graft.operators.Dedup
      .bandFingerprints(feats, bands = 16, rows = 1)
    val sa = sig.select(col("id").as("a_id"), col("band_idx").as("pos_a"),
      col("bh").as("ha"))
    val sb = sig.select(col("id").as("b_id"), col("band_idx").as("pos_b"),
      col("bh").as("hb"))
    val est = pairs.select(col("doc_a"), col("doc_b"))
      .join(sa, col("doc_a") === col("a_id"))
      .join(sb, col("doc_b") === col("b_id") && col("pos_a") === col("pos_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("ha") === col("hb"), 1L).otherwise(0L)) / 16.0)
        .as("est"))
    val exact = graft.operators.Dedup.jaccardOnPairs(pairs, feats)
      .select(col("doc_a").as("ja"), col("doc_b").as("jb"), col("jaccard"))
    val bias = est.join(exact,
        col("doc_a") === col("ja") && col("doc_b") === col("jb"))
      .agg(avg(col("est") - col("jaccard"))).collect()(0).getDouble(0)
    assert(bias > 0.3,
      s"banding-family bias $bias no longer pathological; revisit d19 docs")
  }

  // ---- s27 index + delta ----

  test("s27: every true top-5 neighbor living in the delta reaches the fused top-5") {
    // The serving guarantee of the sidecar: delta vectors are scanned
    // exactly, so a delta vector in the TRUE top-5 can be displaced only
    // by better candidates — of which there are at most 4 — and must
    // therefore appear in the fused top-5.
    val fused = ExtensionQueries7.all("s27_knn_index_delta")(spark, sf)
      .select(col("query_id"), col("vec_id"), col("src"))
    val truthDelta = ExtensionQueries.knnBruteRanked(spark, sf, 5)
      .select(col("query_id"), col("vec_id"))
      .filter(col("vec_id") % 10 === 0)
    val missed = truthDelta
      .join(fused, Seq("query_id", "vec_id"), "left_anti").count()
    assert(missed == 0L, s"$missed true delta neighbors missing from fusion")
    // and the fixture actually exercises the claim: the delta side
    // contributes at least one fused row
    assert(fused.filter(col("src") === "delta").count() > 0,
      "no delta candidates in the fused top-5 — split stopped discriminating")
  }

  // ---- s28 dominant direction ----

  test("s28: the direction is unit-norm and dominates every single axis") {
    val rows = ExtensionQueries7.all("s28_dominant_direction")(spark, sf)
      .orderBy(col("d")).collect()
    assert(rows.length == 64)
    val v = rows.map(_.getAs[Double]("loading"))
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-4)
    // variance along the reported direction >= variance along any axis —
    // the defining property of a (converged-enough) top eigenvector
    val e = ExtensionQueries.embeddingsD(spark, sf)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val n = e.length
    val mu = Array.tabulate(64)(d => e.map(_(d)).sum / n)
    val centered = e.map(x => Array.tabulate(64)(d => x(d) - mu(d)))
    def varAlong(dir: Array[Double]): Double =
      centered.map(x => math.pow(x.zip(dir).map { case (a, b) => a * b }.sum, 2))
        .sum / n
    val alongV = varAlong(v)
    val maxAxis = (0 until 64).map { d =>
      val axis = Array.fill(64)(0.0); axis(d) = 1.0; varAlong(axis)
    }.max
    assert(alongV >= maxAxis,
      s"direction variance $alongV below best single axis $maxAxis")
  }

  test("s29: removal zeroes the dominant direction and conserves the variance budget") {
    val rows = ExtensionQueries7
      .all("s29_common_direction_removal")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val (before, after) = (rows("before"), rows("after"))
    val n = before.getAs[Long]("n")
    val bAlong = before.getAs[Long]("along_fp")
    assert(bAlong > 0L)
    assert(after.getAs[Long]("along_fp") <= bAlong / 1000,
      "projection left dominant-direction variance behind")
    // Pythagoras: total(after) == total(before) - along(before), within
    // the per-row double-floor slop (each stage floors twice per row)
    val expected = before.getAs[Long]("total_fp") - bAlong
    val got = after.getAs[Long]("total_fp")
    assert(math.abs(got - expected) <= 4 * n,
      s"variance budget broke: got $got expected ~$expected")
  }

  test("s28: the direction is a pure function of the vector set (partitioning-invariant)") {
    // Same claim as q89's register test, for the most numerically delicate
    // new operator: per-iteration fixed-point sums make yfp — and hence
    // the normalized direction — identical under any physical layout.
    val base = ExtensionQueries7
      .dominantDir(spark, sf)._2
      .select(col("yfp")).collect()(0).getSeq[Long](0)
    val reparted = graft.sources.Tables.load(spark, sf, "embeddings")
      .repartition(13)
      .select(graft.operators.VectorOps.toDouble(col("embedding")).as("v"))
    val re = ExtensionQueries7.dominantDirOf(reparted)._2
      .select(col("yfp")).collect()(0).getSeq[Long](0)
    assert(re == base, "direction drifted under repartition")
  }

  // ---- e16 conversion latency ----

  test("e16: buckets partition the viewing user base") {
    val rows = ExtensionQueries7.all("e16_conversion_latency")(spark, sf)
    val total = rows.agg(sum(col("n_users"))).collect()(0).getLong(0)
    val viewers = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(total == viewers, s"bucket mass $total != viewing users $viewers")
    assert(rows.filter(col("latency_hours") < -1).count() == 0L)
  }

  // ---- g03 k-core ----

  test("g03: peeling converges inside the oracle's CoreRounds unroll and the core is proper") {
    val feats = ExtensionQueries.docFeatures(spark, sf)
    val pairs = graft.operators.Dedup
      .lshCandidatePairs(feats, bands = 4, rows = 3)
    val (atR, executed) = ExtensionQueries7.kcoreEdgesWithRounds(
      pairs, ExtensionQueries7.CoreK, ExtensionQueries7.CoreMaxRounds)
    // the DuckDB oracle unrolls CoreRounds peels: equality needs the true
    // peel depth ≤ that unroll at the compared scale — pin the margin
    assert(executed <= ExtensionQueries7.CoreRounds,
      s"peeling took $executed rounds; oracle unrolls only ${ExtensionQueries7.CoreRounds}")
    // k-core definition: every surviving node keeps degree >= K
    val minDeg = atR.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(min(col("d"))).collect()(0).getLong(0)
    assert(minDeg >= ExtensionQueries7.CoreK)
    // and the result discriminates: nonempty core, nonempty complement
    val res = ExtensionQueries7.all("g03_kcore")(spark, sf)
    val inCore = res.filter(col("in_core")).count()
    assert(inCore > 0 && inCore < res.count())
  }

  // ---- s25 centroid classification ----

  test("s25: every vector assigned to exactly one centroid (confusion mass == corpus)") {
    val conf = ExtensionQueries7.all("s25_centroid_classify")(spark, sf)
    val total = conf.agg(sum(col("n"))).collect()(0).getLong(0)
    val corpus = graft.sources.Tables.load(spark, sf, "embeddings").count()
    assert(total == corpus, s"confusion mass $total != corpus $corpus")
    // per-label fractions sum to 1 within rounding
    val sums = conf.groupBy(col("label")).agg(sum(col("frac")).as("fs"))
      .collect()
    sums.foreach { r =>
      val fs = r.getAs[Double]("fs")
      assert(math.abs(fs - 1.0) < 1e-4, s"label ${r.get(0)} fracs sum $fs")
    }
  }
}
