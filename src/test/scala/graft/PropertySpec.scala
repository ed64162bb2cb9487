package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Property tests (SURVEY §5.3). Plain ScalaCheck generators (no
  * scalatestplus bridge in the offline cache) sampled with fixed seeds;
  * each property checks a batch per sample to keep Spark job counts sane.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("minMaxScore ∈ [0,100] ∪ {NaN}; 0 and 100 attained unless degenerate") {
    for (xs <- samples(Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)), 8)) {
      val scores = Score.minMaxScore(xs.toDF("v"), "v", "s")
        .select("s").as[Double].collect()
      assert(scores.forall(s => s.isNaN || (s >= 0.0 && s <= 100.0)))
      if (xs.distinct.size > 1) {
        assert(scores.min == 0.0 && scores.max == 100.0)
      }
    }
  }

  test("int_dot ≡ the interpreted fold on arbitrary in-range longs") {
    // magnitudes capped so products never overflow: parity of VALUES
    val bound = 3037000498L // floor(sqrt(Long.MaxValue))/8 per element
    val arr = Gen.choose(1, 8).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-bound / 8, bound / 8)),
        Gen.listOfN(n, Gen.choose(-bound / 8, bound / 8))))
    for (batch <- Seq(samples(arr, 24))) {
      val df = batch.toDF("a", "b")
      val native = df.select(graft.functions.IntDotProduct.intDot($"a", $"b"))
        .as[Long].collect().toSeq
      val fold = df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v))
        .as[Long].collect().toSeq
      assert(native === fold)
      // and both equal the plain Scala loop
      val scala_ = batch.map { case (a, b) =>
        a.zip(b).foldLeft(0L) { case (acc, (x, y)) => acc + x * y } }
      assert(native === scala_)
    }
  }

  test("int_dot overflow THROWS under ANSI mode, matching the fold it fuses") {
    // Spark 4 runs ANSI by default: the interpreted fold's Multiply throws
    // on long overflow. The native expression must not silently wrap where
    // the expression it replaces errors — failOnError captures the conf.
    val df = Seq((Seq(Long.MaxValue / 2 + 1L, 0L), Seq(4L, 0L))).toDF("a", "b")
    intercept[Exception] {
      df.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (acc, v) => acc + v))
        .collect()
    }
    intercept[Exception] {
      df.select(graft.functions.IntDotProduct.intDot($"a", $"b")).collect()
    }
  }

  test("argmax-join ≡ window row_number when the max is unique per key") {
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 1000)))
    for (raw <- samples(gen, 5) if raw.nonEmpty) {
      // one row per (key, ord) -> unique max per key -> both forms agree
      val rows = raw.distinct.map { case (k, ord) => (k, ord, s"p$k-$ord") }
      val df = rows.toDF("k", "ord", "payload")
      val a = Snapshot.latestPerKeyJoin(df, Seq("k"), "ord")
        .select("k", "ord").as[(Int, Int)].collect().sorted.toSeq
      val b = Snapshot.latestPerKeyWindow(df, Seq("k"), Seq(col("ord").desc))
        .select("k", "ord").as[(Int, Int)].collect().sorted.toSeq
      assert(a == b)
    }
  }

  test("roundAt(x, 2) within half a cent of x, and idempotent") {
    for (seed <- samples(Gen.choose(-1e7, 1e7), 3)) {
      val xs = (0 until 50).map(i => seed + i * 0.137)
      val out = xs.toDF("v").select(col("v"), Agg.roundAt(col("v"), 2).as("r"),
        Agg.roundAt(Agg.roundAt(col("v"), 2), 2).as("rr")).collect()
      out.foreach { row =>
        val (v, r, rr) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
        assert(math.abs(r - v) <= 0.005 + 1e-9)
        assert(r == rr)
      }
    }
  }

  test("charHash stays in [0, P) and is a pure function of the string") {
    val gen = Gen.listOfN(20, Gen.alphaNumStr.suchThat(_.nonEmpty))
    for (ss <- samples(gen, 3) if ss.nonEmpty) {
      val df = ss.toDF("t")
      val h1 = df.select(TextOps.charHash(col("t"))).as[Long].collect()
      val h2 = df.select(TextOps.charHash(col("t"))).as[Long].collect()
      assert(h1.toSeq == h2.toSeq)
      assert(h1.forall(h => h >= 0 && h < TextOps.P))
    }
  }
}
