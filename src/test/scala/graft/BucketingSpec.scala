package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join story for 100 TB. Two tables bucketed by
  * the same key into the same bucket count join WITHOUT a shuffle exchange —
  * at scale that converts every fact-to-fact join on the bucket key from a
  * full-network shuffle into a local merge.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join with no Exchange in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val li = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li_b").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/o_b").saveAsTable("o_b")

    // The fixture tables are tiny, so the planner would broadcast (its own
    // kind of exchange); disable that to surface the bucketed SMJ shape the
    // same join takes when both sides are fact-sized.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("ShuffleExchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
