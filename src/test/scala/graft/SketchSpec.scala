package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch profile has no oracle (sketch internals are engine-specific);
  * instead pin its error against the exact twin, q31_profile_exact.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("HLL distinct within 5% and approx p50 within 2% of exact, per group") {
    val dir = "/root/testdata/sf0.01"
    val approx = RelationalQueries.sketchProfile(spark, dir)
      .select("l_returnflag", "approx_parts", "approx_p50")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (d, p50)) =>
      val (ad, ap) = approx(flag)
      assert(math.abs(ad - d).toDouble / d < 0.05, s"$flag distinct: $ad vs $d")
      assert(math.abs(ap - p50) / p50 < 0.02, s"$flag p50: $ap vs $p50")
    }
  }
}
