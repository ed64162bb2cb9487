package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Scratch, Snapshots}

/** Round-10 properties the hash oracles can't see: NULL-keyed rows are
  * first-class citizens of the merge-on-read delete/upsert path (a plain
  * equi-anti-join would leak them past every delete forever).
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshot delete masks NULL-keyed rows (null-safe <=> anti-join)") {
    val tbl = Scratch.fresh(spark, "spec_snap_null_delete")
    val rows = Seq(
      (Option(1L), "keep-1"),
      (Option(2L), "delete-me"),
      (Option.empty[Long], "null-key-delete-me"),
      (Option.empty[Long], "null-key-delete-me-too"),
      (Option(3L), "keep-3")
    ).toDF("id", "payload")
    Snapshots.commit(spark, tbl, rows)
    // predicate matches the id=2 row AND both NULL-keyed rows; with a
    // non-null-safe mask the NULL-keyed rows would silently survive
    Snapshots.delete(spark, tbl, col("payload").contains("delete-me"), Seq("id"))
    val left = Snapshots.readLatest(spark, tbl)
      .select("payload").as[String].collect().toSet
    assert(left == Set("keep-1", "keep-3"),
      s"NULL-keyed rows must be masked by a key delete, got $left")
  }

  test("snapshot upsert replaces a NULL-keyed row instead of duplicating it") {
    val tbl = Scratch.fresh(spark, "spec_snap_null_upsert")
    Snapshots.commit(spark, tbl, Seq(
      (Option(1L), "v1-of-1"), (Option.empty[Long], "v1-of-null")
    ).toDF("id", "payload"))
    Snapshots.upsert(spark, tbl, Seq(
      (Option.empty[Long], "v2-of-null"), (Option(2L), "v1-of-2")
    ).toDF("id", "payload"), Seq("id"))
    val got = Snapshots.readLatest(spark, tbl)
      .select("payload").as[String].collect().toSet
    assert(got == Set("v1-of-1", "v2-of-null", "v1-of-2"),
      s"upsert must mask the old NULL-keyed row exactly once, got $got")
  }

  test("m05 banding completeness: every hamming<=7 pair shares an 8-bit band") {
    // the pigeonhole m05's is_dup (hamming <= 6) verdict rests on: 8
    // bands x 8 bits means <= 7 differing bits cannot touch all 8 bands,
    // so candidate generation is complete for the threshold. Randomized
    // over seeds + flip counts, plus the exact adversarial pair the old
    // 4x16 banding missed.
    def bands8(h: Long): Set[(Int, Long)] =
      (0 until 8).map(b => b -> ((h >>> (8 * b)) & 255L)).toSet
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5000) {
      val base = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(8))
      val other = flips.foldLeft(base)((h, p) => h ^ (1L << p))
      assert((bands8(base) intersect bands8(other)).nonEmpty,
        s"hamming<=7 pair with no shared 8-bit band: $base vs $other")
    }
    // hamming-6 pair touching all four 16-bit half-words: the pre-r10
    // 4x16 banding generated NO candidate for it; 8x8 must
    val a = 0L
    val b = Seq(0, 1, 16, 32, 33, 48).foldLeft(a)((h, p) => h ^ (1L << p))
    val old4x16 = (0 until 4).map(i => i -> ((a >>> (16 * i)) & 65535L)).toSet
    val old4x16b = (0 until 4).map(i => i -> ((b >>> (16 * i)) & 65535L)).toSet
    assert((old4x16 intersect old4x16b).isEmpty, "fixture must be the old blind spot")
    assert(java.lang.Long.bitCount(a ^ b) == 6)
    assert((bands8(a) intersect bands8(b)).nonEmpty)
    // the r15 band-PAIR candidate rule rests on the stronger pigeonhole:
    // hamming <= 6 touches at most 6 of 8 bands, so >= 2 stay intact and
    // some intact PAIR collides — randomized over seeds + flip counts
    for (_ <- 1 to 5000) {
      val base = rnd.nextLong()
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(7))
      val other = flips.foldLeft(base)((h, p) => h ^ (1L << p))
      assert((bands8(base) intersect bands8(other)).size >= 2,
        s"hamming<=6 pair with <2 shared bands: $base vs $other")
    }
    // and at hamming 6 spread over 6 DISTINCT bands, exactly 2 survive —
    // the minimal case the >= 2 rule is tight against
    val c = Seq(0, 8, 16, 24, 32, 40).foldLeft(a)((h, p) => h ^ (1L << p))
    assert(java.lang.Long.bitCount(a ^ c) == 6)
    assert((bands8(a) intersect bands8(c)).size == 2)
  }

  test("t17 two-hash rule: a single-hash collision is NOT a duplicated span") {
    // Adversarial pair: "zz b!" and "zz a@" collide under charHash
    // (98*31+33 == 97*31+64 == 3071 after the shared prefix) but differ
    // under charHash2 (base 131, different modulus). A single-hash t17
    // marks both docs as cross-duplicated; the (h, h2) pair rule must not.
    val collide = Seq("zz b!", "zz a@").toDF("s")
      .select(graft.operators.TextOps.charHash(col("s")).as("h"),
        graft.operators.TextOps.charHash2(col("s")).as("h2"))
      .collect()
    assert(collide(0).getLong(0) == collide(1).getLong(0),
      "fixture must be a real charHash collision")
    assert(collide(0).getLong(1) != collide(1).getLong(1),
      "charHash2 must separate the charHash collision")

    val docs = Seq(
      (1L, "zz b!"),          // h1-collides with doc 2's only span
      (2L, "zz a@"),
      (3L, "qq ww unique-a"), // genuinely shares span "qq ww" with doc 4
      (4L, "qq ww unique-b")
    ).toDF("doc_id", "text")
    val got = ExtensionQueries3.substringDedup(docs, spanK = 2)
      .select("doc_id", "n_dup_spans", "has_cross_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((1L, 0L, false), (2L, 0L, false),
      (3L, 1L, true), (4L, 1L, true)),
      s"only the true shared span may count as duplicated, got $got")
  }

  test("z-ordered compaction preserves the view, keeps time travel, and out-skips plain compaction") {
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select(pmod(col("l_orderkey") * 131 + col("l_linenumber"), lit(1024)).as("pa"),
        pmod(col("l_partkey") * 31 + col("l_suppkey"), lit(1024)).as("sb"),
        col("l_quantity").as("qty"))
    val tblZ = Scratch.fresh(spark, "spec_snap_zcompact")
    val tblP = Scratch.fresh(spark, "spec_snap_pcompact")
    for (tbl <- Seq(tblZ, tblP)) {
      // four random-ordered ingest batches + one merge-on-read delete, so
      // compaction has both small files and delete debt to fold
      for (i <- 0 until 4)
        Snapshots.commit(spark, tbl, li.filter(col("pa") % 4 === i))
      Snapshots.delete(spark, tbl, col("qty") > lit(45.0), Seq("pa", "sb", "qty"))
    }
    val expected = Snapshots.readLatest(spark, tblZ)
      .collect().map(_.toString).sorted
    val preVersion = 5 // 4 commits + 1 delete

    Snapshots.compactLatestZOrdered(spark, tblZ, "pa", "sb", bits = 10, nFiles = 8)
    Snapshots.compactLatest(spark, tblP, targetBytes = 1L) // same view, row-order files

    // the rewrite changed layout only: same rows, and the pre-compaction
    // version still time-travels to the same view
    assert(Snapshots.readLatest(spark, tblZ).collect().map(_.toString).sorted
      .sameElements(expected), "z-compaction must not change the visible rows")
    assert(Snapshots.readAsOf(spark, tblZ, preVersion).collect().map(_.toString).sorted
      .sameElements(expected), "pre-compaction version must stay readable")

    // file-skipping: per-file min/max stats under a box predicate — the
    // z-ordered rewrite must prune files the row-order rewrite cannot
    def boxHits(tbl: String): (Long, Long) = {
      val stats = Snapshots.readLatest(spark, tbl)
        .groupBy(input_file_name().as("f"))
        .agg(min("pa").as("pa_lo"), max("pa").as("pa_hi"),
          min("sb").as("sb_lo"), max("sb").as("sb_hi"))
      (stats.filter(col("pa_hi") >= 128 && col("pa_lo") <= 255 &&
        col("sb_hi") >= 2 && col("sb_lo") <= 128).count(), stats.count())
    }
    val (zHit, zTotal) = boxHits(tblZ)
    val (pHit, pTotal) = boxHits(tblP)
    assert(zTotal >= 4 && pTotal >= 4, s"both rewrites must emit several files ($zTotal, $pTotal)")
    assert(pHit == pTotal,
      s"row-order compaction leaves every file intersecting the box ($pHit/$pTotal)")
    assert(zHit < zTotal,
      s"z-ordered compaction must let the box skip files ($zHit/$zTotal)")
  }

  test("streaming incremental dedup hash-equals the batch ingest loop across a restart") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val B = 4; val R = 3
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").as("id"),
        graft.functions.TextHash.shingleHashes(col("text"), 2).as("features"))
      .persist()
    val corpus = docs.filter(col("id") % 4 =!= 0)
    val d1 = docs.filter(col("id") % 8 === 0) // day 1's crawl
    val d2 = docs.filter(col("id") % 8 === 4) // day 2's crawl

    // expected: the sequential batch ingest loop — day 2 joins an index
    // that already contains day 1's fingerprints
    val idx0 = Dedup.bandFingerprints(corpus, B, R)
    val p1 = Dedup.incrementalCandidatePairs(idx0, d1, B, R)
    val idx1 = idx0.unionAll(Dedup.bandFingerprints(d1, B, R))
    val p2 = Dedup.incrementalCandidatePairs(idx1, d2, B, R)
    val expected = p1.unionAll(p2).collect().map(_.toString).sorted
    assert(expected.nonEmpty, "fixture must produce candidate pairs")

    // streaming twin: the index and the pair results live as snapshot
    // tables (the stored artifacts); each micro-batch of arriving doc ids
    // probes the CURRENT index, commits its pairs, then appends its own
    // fingerprints. Both commits are gated on a batch_id column, so a
    // batch replayed after a crash/restart is a no-op per table —
    // exactly-once without sink transactions.
    val idxTbl = Scratch.fresh(spark, "spec_sdedup_idx")
    val pairsTbl = Scratch.fresh(spark, "spec_sdedup_pairs")
    Snapshots.commit(spark, idxTbl,
      Dedup.bandFingerprints(corpus, B, R).withColumn("batch_id", lit(-1L)))
    def applied(tbl: String, batchId: Long): Boolean =
      Snapshots.versions(spark, tbl).nonEmpty &&
        Snapshots.readLatest(spark, tbl)
          .filter(col("batch_id") === batchId).limit(1).count() > 0

    val stream = MemoryStream[Long]
    val ckpt = Scratch.fresh(spark, "spec_sdedup_ckpt")
    def start() = stream.toDS().toDF("id").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val delta = docs.join(batch, Seq("id"))
          if (!applied(pairsTbl, batchId)) {
            val idx = Snapshots.readLatest(spark, idxTbl).drop("batch_id")
            Snapshots.commit(spark, pairsTbl,
              Dedup.incrementalCandidatePairs(idx, delta, B, R)
                .withColumn("batch_id", lit(batchId))): Unit
          }
          if (!applied(idxTbl, batchId)) {
            Snapshots.commit(spark, idxTbl,
              Dedup.bandFingerprints(delta, B, R)
                .withColumn("batch_id", lit(batchId))): Unit
          }
        }
      }.start()

    val d1Ids = d1.select("id").as[Long].collect().toSeq
    val d2Ids = d2.select("id").as[Long].collect().toSeq
    val q1 = start()
    stream.addData(d1Ids: _*)
    q1.processAllAvailable()
    q1.stop() // crash/redeploy between the two days

    val q2 = start() // new incarnation, same checkpoint
    stream.addData(d2Ids: _*)
    q2.processAllAvailable()
    q2.stop()

    val streamed = Snapshots.readLatest(spark, pairsTbl).drop("batch_id")
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(expected),
      "streamed ingest-by-ingest dedup must equal the batch loop")

    // replaying an already-applied batch is a no-op on both tables
    val pairsV = Snapshots.versions(spark, pairsTbl).last
    val idxV = Snapshots.versions(spark, idxTbl).last
    assert(!applied(pairsTbl, 99L) && applied(pairsTbl, 0L) && applied(idxTbl, 1L))
    assert(Snapshots.versions(spark, pairsTbl).last == pairsV &&
      Snapshots.versions(spark, idxTbl).last == idxV)
  }

  test("t23 trimming excises whole duplicated runs, keeps unique text, empties exact dups") {
    val docs = Seq(
      (1L, "aa bb cc dd ee one"),  // shares run "cc dd ee" with doc 2
      (2L, "xx yy cc dd ee two"),
      (3L, "solo text never repeated anywhere"),
      (4L, "twin twin twin twin"), // exact dup of doc 5: trims to empty
      (5L, "twin twin twin twin")
    ).toDF("doc_id", "text")
    val got = ExtensionQueries3.substringTrim(docs, spanK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1)
    // the 3-token run is covered by its two overlapping dup 2-grams —
    // the whole run goes, not just one window
    assert(got(0) == ((1L, 6L, 3L, 3L, md5Hex("aa bb one"))), s"got ${got(0)}")
    assert(got(1) == ((2L, 6L, 3L, 3L, md5Hex("xx yy two"))), s"got ${got(1)}")
    assert(got(2) == ((3L, 5L, 5L, 0L, md5Hex("solo text never repeated anywhere"))))
    assert(got(3) == ((4L, 4L, 0L, 4L, md5Hex(""))), "exact dup must trim to empty")
    assert(got(4) == ((5L, 4L, 0L, 4L, md5Hex(""))))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("snapshot delete of a non-NULL key never over-deletes NULL-keyed rows") {
    // the converse direction: <=> must not make a concrete key tuple
    // match NULL-keyed data rows
    val tbl = Scratch.fresh(spark, "spec_snap_null_preserve")
    Snapshots.commit(spark, tbl, Seq(
      (Option(7L), "dead"), (Option.empty[Long], "alive-null")
    ).toDF("id", "payload"))
    Snapshots.delete(spark, tbl, col("id") === 7L, Seq("id"))
    val got = Snapshots.readLatest(spark, tbl)
      .select("payload").as[String].collect().toSet
    assert(got == Set("alive-null"))
  }

  test("Vid round-trips geometry and rejects malformed payloads") {
    import graft.operators.Multimodal
    val frames = Array.tabulate[Byte](2 * 3 * 4)(i => (i * 11 % 256).toByte)
    val clip = Multimodal.Vid.parse(
      Multimodal.Vid.encodeHeader(2, 3, 4) ++ frames)
    assert(clip.w == 2 && clip.h == 3 && clip.nFrames == 4)
    assert(clip.frames.toSeq == frames.toSeq)
    intercept[IllegalArgumentException]( // wrong magic
      Multimodal.Vid.parse("PPM\n2 3 4\n".getBytes ++ frames))
    intercept[IllegalArgumentException]( // geometry/body mismatch
      Multimodal.Vid.parse(Multimodal.Vid.encodeHeader(2, 3, 5) ++ frames))
    intercept[IllegalArgumentException](
      Multimodal.Vid.parse(Array[Byte]()))
  }

  test("sceneDetect: cuts fire exactly at content transitions, still tail is SAD-0") {
    import graft.operators.Multimodal
    val fb = Multimodal.VidFrameBytes
    // frame 0 = 'a'*144, frame 1 = 'z'*144 (SAD 144*25 = 3600 > thr = cut),
    // frames 2..5 = space padding (one 'z'->' ' cut, then three SAD-0 stills)
    val docs = Seq((2L, "a" * fb + "z" * fb)).toDF("doc_id", "text")
    val got = Multimodal.sceneDetect(
      Multimodal.videoFromDocuments(docs), Multimodal.SceneCutThr).collect()
    assert(got.length == 1)
    val f = got(0)
    assert(f.n_frames == Multimodal.VidFrames)
    assert(f.max_diff == fb.toLong * ('z' - ' '), "z->space is the biggest jump")
    assert(f.total_diff ==
      fb.toLong * ('z' - 'a') + fb.toLong * ('z' - ' '),
      "three still padding transitions contribute zero")
    assert(f.n_cuts == 2, "a->z and z->padding, nothing in the still tail")
  }

  test("chunk_overlap tiles every document: stitched chunks reconstruct the text") {
    // coverage property the md5 oracle can't see: dropping each chunk's
    // leading overlap and concatenating in index order is the identity
    val size = ExtensionQueries4.ChunkSize
    val stride = ExtensionQueries4.ChunkStride
    for (len <- Seq(0, 1, size - 1, size, size + 1, 2 * size, 1000)) {
      val text = Iterator.continually("abcdefghij").flatten.take(len).mkString
      val nChunks = 1 + math.ceil(math.max(len - size, 0) / stride.toDouble).toInt
      val chunks = (0 until nChunks).map(i => text.slice(i * stride, i * stride + size))
      val stitched = chunks.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else c.drop(size - stride)
      }.mkString
      assert(stitched == text, s"len=$len must reconstruct")
      // and every adjacent pair genuinely overlaps by size - stride chars
      chunks.sliding(2).filter(_.length == 2).zipWithIndex.foreach {
        case (Seq(a, b), i) =>
          val want = text.slice((i + 1) * stride, math.min(i * stride + size, len))
          assert(a.takeRight(want.length) == want && b.startsWith(want),
            s"len=$len chunk $i overlap mismatch")
      }
    }
  }

  test("e09 spike rule: integer cross-multiply flags only true rate spikes") {
    import java.sql.Timestamp
    // one type, daily counts 10,10,10,21: 21*3 > 2*30 spikes; a fourth day
    // at 20 would not (20*3 = 60 == 2*30 fails strict >)
    val rows = for {
      (day, n) <- Seq((1, 10), (2, 10), (3, 10), (4, 21), (5, 20))
      i <- 0 until n
    } yield (Timestamp.valueOf(f"2024-01-0$day%d 12:00:${i % 60}%02d"),
      "click", i.toLong)
    val df = rows.toDF("ts", "event_type", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    // replicate the registered query's window logic on the in-memory frame
    // (the registered entry reads from a fixture dir; the constants are
    // shared so the rule under test is the same)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-ExtensionQueries4.SpikeWindow, -1)
    val out = df.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("prev_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .withColumn("prev_days", count(col("n_events")).over(w).cast("int"))
      .withColumn("is_spike",
        col("prev_days") === ExtensionQueries4.SpikeWindow &&
          col("n_events") * ExtensionQueries4.SpikeWindow *
            ExtensionQueries4.SpikeDen >
            lit(ExtensionQueries4.SpikeNum) * col("prev_sum"))
      .orderBy(col("day"))
      .select(col("n_events"), col("is_spike"))
      .as[(Long, Boolean)].collect().toSeq
    assert(out.map(_._1) == Seq(10L, 10L, 10L, 21L, 20L))
    assert(out.map(_._2) == Seq(false, false, false, true, false),
      "only the 21-count day clears 2x the trailing-3 mean; 20 ties and fails strict >")
  }

  test("filteredKnn is a PRE-filter: cross-label vectors never outrank in-label ones") {
    // query 0 (label 1): vector 10 (label 2) is nearly identical to the
    // query — a post-filter top-1 would waste its slot on it and then drop
    // it; the pre-filter must return the farther SAME-label vectors 11, 12
    val vecs = Seq(
      (0L, 1, Seq(1.0, 0.0, 0.0)),
      (10L, 2, Seq(0.999, 0.01, 0.0)), // closest overall, wrong label
      (11L, 1, Seq(0.8, 0.6, 0.0)),
      (12L, 1, Seq(0.0, 1.0, 0.0)),
      (13L, 2, Seq(0.9, 0.1, 0.0))
    ).toDF("vec_id", "label", "v")
    val got = ExtensionQueries4.filteredKnn(vecs, col("vec_id") === 0L, k = 2)
      .select("rank", "vec_id", "label")
      .as[(Int, Long, Int)].collect().toSeq
    assert(got == Seq((1, 11L, 1), (2, 12L, 1)),
      s"expected only label-1 neighbors in cosine order, got $got")
  }

  test("bm25: tf raises score with saturation, doc length normalizes, rarity wins") {
    def doc(id: Long, s: String) = (id, s)
    val docs = Seq(
      doc(1, "alpha beta beta filler filler filler filler filler"),
      doc(2, "alpha filler filler filler filler filler filler filler"),
      doc(3, "alpha filler"), // same single hit as 2 but much shorter
      doc(4, "rare filler filler filler filler filler filler filler"),
      doc(5, "filler filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = ExtensionQueries4.bm25(docs, Seq("alpha", "beta", "rare"), k = 10)
      .select("doc_id", "n_hits", "score_fp")
      .as[(Long, Long, Long)].collect().toList
    val score = got.map(r => r._1 -> r._3).toMap
    assert(!score.contains(5L), "doc without any query term never scores")
    assert(score(1L) > score(2L), "extra matched term must raise the score")
    assert(score(3L) > score(2L), "same tf in a shorter doc must score higher")
    // 'rare' (df=1) must outweigh one hit of 'alpha' (df=3) at equal length
    assert(score(4L) > score(2L), "rarer term carries more idf weight")
    assert(got.map(_._1) == got.sortBy(r => (-r._3, r._1)).map(_._1),
      "output is ordered by score desc, doc_id asc")
  }

  test("hybrid RRF: fused score is exactly the integer rank formula, order follows it") {
    val rows = ExtensionQueries4.all("s16_hybrid_rrf")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lex_rank", "vec_rank", "rrf_fp")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        r.getLong(3)))
      .toSeq
    assert(rows.nonEmpty)
    def contrib(rank: Option[Int]): Long =
      rank.map(r => 1000000000L / (ExtensionQueries4.RrfK + r)).getOrElse(0L)
    for ((doc, lex, vec, fp) <- rows) {
      assert(lex.isDefined || vec.isDefined, s"doc $doc in neither ranker")
      assert(fp == contrib(lex) + contrib(vec),
        s"doc $doc: rrf_fp $fp != ${contrib(lex)} + ${contrib(vec)}")
    }
    assert(rows == rows.sortBy(r => (-r._4, r._1)),
      "rows must be ordered by fused score desc, doc_id asc")
    // both rankers' full top-k survive fusion (RRF's recall property)
    assert(rows.flatMap(_._2).sorted == (1 to rows.count(_._2.isDefined)).toList)
  }
}
