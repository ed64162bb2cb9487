package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")

  test("decStddev matches built-in stddev_samp within quantization tolerance") {
    val got = li.agg(Stats.decStddev(col("l_extendedprice")),
      stddev_samp(col("l_extendedprice"))).first
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) / got.getDouble(1) < 1e-6)
  }

  test("decStddev is bit-identical under repartitioning; built-in is the baseline risk") {
    val a = li.repartition(1).agg(Stats.decStddev(col("l_extendedprice"))).first.getDouble(0)
    val b = li.repartition(13).agg(Stats.decStddev(col("l_extendedprice"))).first.getDouble(0)
    assert(a == b)
  }

  test("decCorr matches built-in corr within tolerance; sane bounds") {
    val got = li.agg(Stats.decCorr(col("l_quantity"), col("l_extendedprice")),
      corr(col("l_quantity"), col("l_extendedprice"))).first
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) < 1e-6)
    assert(got.getDouble(0) >= -1.0 && got.getDouble(0) <= 1.0)
  }

  test("decCorr of a column with itself is 1; constant column is null") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("x", "c")
      .withColumn("k", lit(5.0))
    val r = df.agg(Stats.decCorr(col("x"), col("x")),
      Stats.decCorr(col("x"), col("k"))).first
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.isNullAt(1))
  }

  test("zScore: mean maps to 0, standardized spread, null on constant input") {
    val got = Stats.zScore(Seq(1.0, 2.0, 3.0).toDF("v"), "v", "z")
      .orderBy("v").select("z").as[Double].collect()
    assert(math.abs(got(1)) < 1e-12) // mean element
    assert(math.abs(got(0) + 1.0) < 1e-9 && math.abs(got(2) - 1.0) < 1e-9)
    val const = Stats.zScore(Seq(4.0, 4.0).toDF("v"), "v", "z")
      .select("z").collect()
    assert(const.forall(_.isNullAt(0)))
  }
}
