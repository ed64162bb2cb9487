package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

class LshBucketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native lshBucket is value-identical to the portable fold on the fixture") {
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(VectorOps.toDouble(col("embedding")).as("v"))
    for (planes <- Seq(6, 8)) {
      val diff = e.select(
          VectorOps.lshBucket(col("v"), planes, 64).as("a"),
          VectorOps.lshBucketFast(col("v"), planes, 64).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0)
    }
  }
}
