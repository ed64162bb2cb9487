package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

/** Space-Saving sketch semantics beyond t12's exact-regime oracle: the
  * approximate regime's guarantees under skew, and partition-invariance
  * where the theory promises it.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def summarize(rows: Seq[Seq[String]], capacity: Int, parts: Int) =
    spark.createDataset(rows).repartition(parts)
      .select(HeavyHitters.spaceSaving(capacity).toColumn).toDF("ss")
      .select(explode(col("ss")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime: capacity >= distinct keys is exact, err-free, and partition-invariant") {
    val rows = (1 to 200).map(i => Seq(s"k${i % 7}", s"k${i % 3}"))
    val truth = rows.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 4, 13)) {
      val got = summarize(rows, capacity = 16, parts = parts)
      assert(got.map(e => e._1 -> e._2).toMap == truth, s"at $parts partitions")
      assert(got.forall(_._3 == 0L), s"err must be 0 in the exact regime ($parts partitions)")
    }
  }

  test("approximate regime: the heavy hitter survives eviction pressure with a bounded estimate") {
    // one hot key (500 occurrences) over a 100-key uniform tail (5 each):
    // n = 1000, capacity 8 -> error slack n/capacity = 125
    val hot = Seq.fill(500)("hot")
    val tail = (1 to 100).flatMap(i => Seq.fill(5)(f"tail$i%03d"))
    val rows = new scala.util.Random(7).shuffle(hot ++ tail).grouped(10).toSeq
    val n = 1000L
    val cap = 8
    for (parts <- Seq(1, 4)) {
      val got = summarize(rows, capacity = cap, parts = parts)
      assert(got.size <= cap)
      val hotEntry = got.find(_._1 == "hot")
      assert(hotEntry.isDefined, s"true count 500 > n/cap = ${n / cap}: must be present ($parts parts)")
      val est = hotEntry.get._2
      assert(math.abs(est - 500L) <= n / cap,
        s"estimate $est must be within n/capacity of true 500 ($parts parts)")
      // single-summary invariant (no trim merges fire at 1 partition):
      // est overcounts, never undercounts, and by at most err
      if (parts == 1) {
        assert(est >= 500L, "Space-Saving estimates overcount within one summary")
        assert(est - hotEntry.get._3 <= 500L, "est - err is a lower bound on the true count")
      }
    }
  }

  test("summary size is bounded by capacity no matter the key cardinality") {
    val rows = (1 to 5000).map(i => Seq(s"u$i"))
    val got = summarize(rows, capacity = 32, parts = 8)
    assert(got.size <= 32)
  }

  test("the sketch aggregates a stream: complete-mode summary matches the batch summary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val rows = (1 to 300).map(i => Seq(s"k${i % 5}", s"k${i % 11}"))
    val stream = MemoryStream[Seq[String]]
    stream.addData(rows: _*)
    // global typed aggregation over an unbounded source — the sketch buffer
    // IS the streaming state, bounded at capacity entries forever
    val summary = stream.toDS().groupByKey(_ => 0)
      .agg(HeavyHitters.spaceSaving(64).toColumn.name("ss"))
    val got = graft.streaming.EventStreams.runToMemory(
        summary.toDF("gid", "ss"), "hh_stream", OutputMode.Complete())
      .select(explode(col("ss")).as("e"))
      .select(col("e.term"), col("e.est")).as[(String, Long)].collect().toMap
    val batch = summarize(rows, capacity = 64, parts = 4)
      .map(e => e._1 -> e._2).toMap
    assert(got == batch)
  }
}
