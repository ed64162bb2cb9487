package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape lock-ins: these assertions fail if a refactor silently loses
  * pushdown, the native expressions, or broadcast structure.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("filter and projection reach the parquet scan") {
    val p = plan("q10_projection_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), LessThan(p_size,20)]"), p)
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string,p_size:int,p_retailprice:double>"), p)
  }

  test("native expressions run in the hot paths") {
    val d03 = plan("d03_lsh_candidates")
    assert(d03.contains("minhash_bands") && d03.contains("shingle_hashes"), d03)
    assert(plan("s01_knn_brute").contains("cosine_sim"))
    assert(plan("d06_embedding_neardup").contains("lsh_bucket"))
  }

  test("flagship never plans a cartesian product") {
    assert(!plan("flagship_location_summary").contains("CartesianProduct"))
  }

  test("scalar-subquery filter becomes a broadcast join, not a driver collect") {
    val p = plan("q07_scalar_subquery_filter")
    assert(p.contains("BroadcastExchange"), p)
  }

  test("a filter on the partition column prunes partitions at the scan") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/out"
    // partition by a real column with several values (STATE of the flagship
    // output is a single region — use lineitem's returnflag instead)
    graft.sources.Tables.load(spark, dir, "lineitem")
      .write.partitionBy("l_returnflag").parquet(tmp)
    val q = spark.read.parquet(tmp).filter(col("l_returnflag") === "R")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(l_returnflag"), p)
    // pruning is real: the scan reads strictly fewer files than the table has
    val scan = q.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    val all = spark.read.parquet(tmp).queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.selectedPartitions.partitionCount < all.selectedPartitions.partitionCount)
  }
}
