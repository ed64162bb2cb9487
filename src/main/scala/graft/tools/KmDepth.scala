package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc: Lloyd convergence depth of s32's k-means at a fixture scale —
  * the measurement [[graft.ExtensionQueries8.KmConvOracleUnroll]]'s margin
  * rests on. `runMain graft.tools.KmDepth [sfDir]`
  */
object KmDepth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.ExtensionQueries.embeddingsD(spark, sfDir)
      .select(col("vec_id"), col("v"))
    val (_, _, iters) = graft.operators.Kmeans.fitConverged(e,
      k = graft.ExtensionQueries.IvfCells,
      maxIters = graft.ExtensionQueries8.KmConvMaxIters)
    println(s"KMDEPTH dir=$sfDir k=${graft.ExtensionQueries.IvfCells} iters=$iters")
    spark.stop()
  }
}
