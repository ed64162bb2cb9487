package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{JoinOps, VectorAgg, VectorOps}

class JoinOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin result is identical to the plain join") {
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumnRenamed("l_suppkey", "suppkey")
    val sup = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .withColumnRenamed("s_suppkey", "suppkey")
    val salted = JoinOps.saltedJoin(li, sup, Seq("suppkey"),
        col("l_orderkey") * 8 + col("l_linenumber"), 8)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .orderBy("s_nationkey").as[(Int, Long)].collect().toSeq
    val plain = li.join(sup, Seq("suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
      .orderBy("s_nationkey").as[(Int, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("skewSaltFactor: exact ceiling on a constructed skewed fixture, " +
      "and autoSaltedJoin result is identical to the plain join") {
    // key A: 90 rows, B: 5, C: 5 -> n_keys=3, total=100, max=90 ->
    // factor = ceil(90*3/100) = 3
    val fact = ((0 until 90).map(i => ("A", i.toLong)) ++
        (0 until 5).map(i => ("B", 100L + i)) ++
        (0 until 5).map(i => ("C", 200L + i))).toDF("k", "rid")
    assert(JoinOps.skewSaltFactor(fact, Seq("k")) == 3)
    val dim = Seq(("A", 1), ("B", 2), ("C", 3)).toDF("k", "v")
    val auto = JoinOps.autoSaltedJoin(fact, dim, Seq("k"), col("rid"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(auto == plain)
    // flat distribution -> factor 1 -> degenerate plain join (no salt
    // column anywhere in the plan)
    val flat = (0 until 30).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "rid")
    assert(JoinOps.skewSaltFactor(flat, Seq("k")) == 1)
    val flatPlan = JoinOps.autoSaltedJoin(flat, dim, Seq("k"), col("rid"))
      .queryExecution.analyzed.toString
    assert(!flatPlan.contains("__salt"))
  }

  test("autoSaltedJoin picks exactly the factor q97's skew report computes") {
    val dir = "/root/testdata/sf0.001"
    val report = ExtensionQueries8.all("q97_join_skew_report")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(8)).toMap
    val ev = graft.sources.Tables.load(spark, dir, "events")
    Seq("user_id", "event_type").foreach { key =>
      assert(JoinOps.skewSaltFactor(ev, Seq(key)).toLong == report(key),
        s"$key: the join must consume the same factor the report publishes")
    }
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest at-or-before match per key, inclusive, null on miss") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // matches right@09:00
      (1L, 11L, ts("2024-01-01 08:00:00")), // before any right -> null
      (2L, 12L, ts("2024-01-01 12:00:00")), // equal-ts match (inclusive)
      (3L, 13L, ts("2024-01-01 12:00:00"))  // key with no right rows -> null
    ).toDF("k", "lid", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 09:30:00"), 200.0), // later but still <= 10:00 -> wins
      (2L, ts("2024-01-01 12:00:00"), 300.0)
    ).toDF("k", "ts", "val")
    val got = JoinOps.asofJoin(left, right, Seq("k"), "ts", Seq("val"))
      .orderBy("lid").select("lid", "val").as[(Long, Option[Double])].collect().toSeq
    assert(got == Seq((10L, Some(200.0)), (11L, None), (12L, Some(300.0)), (13L, None)))
  }

  test("asofJoin carries whole right rows: a matched null value stays null") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), Some(5.0), 100L),
      (1L, ts("2024-01-01 09:00:00"), Option.empty[Double], 200L)
    ).toDF("k", "ts", "v", "rid")
    val got = JoinOps.asofJoin(left, right, Seq("k"), "ts", Seq("v", "rid"))
      .select("lid", "v", "rid").as[(Long, Option[Double], Option[Long])].collect()
    // the as-of match is the 09:00 row: its null v must NOT be replaced by
    // the stale 08:00 value, and rid must come from the same row
    assert(got.toSeq == Seq((10L, None, Some(200L))))
  }
}

class VectorAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("typed Aggregator centroid agrees with the explode+decAvg form") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("label"), VectorOps.toDouble(col("embedding")).as("v"))
    // fast path: element-wise sum via Aggregator, divided by count
    val fast = e.as[(Int, Array[Double])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(VectorAgg.sumVec(64).toColumn.name("sum"))
      .collect().toMap
    val counts = e.groupBy("label").count().as[(Int, Long)].collect().toMap
    // oracle-checkable path
    val slow = e.select(col("label"), posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy(col("label"), col("dim"))
      .agg(graft.operators.Agg.decAvg(col("val")).as("c"))
      .as[(Int, Int, Double)].collect()
    slow.foreach { case (label, dim, c) =>
      val fastAvg = fast(label)(dim) / counts(label)
      // decAvg quantizes inputs at 6 decimals, so agreement is bounded by
      // that quantization, not machine epsilon
      assert(math.abs(fastAvg - c) < 1e-6, s"label=$label dim=$dim")
    }
  }

  test("Aggregator input mapping uses _2 as the vector") {
    val df = Seq((0, Array(1.0, 2.0)), (0, Array(3.0, 4.0))).toDS()
    val got = df.groupByKey(_._1).mapValues(_._2).agg(VectorAgg.sumVec(2).toColumn).collect()
    assert(got.head._2.toSeq == Seq(4.0, 6.0))
  }
}
