package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val df = graft.pipeline.LocationSummary.build(spark, "/root/testdata/sf0.001")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/flagship_plan.txt"),
      df.queryExecution.executedPlan.toString)
    df.count()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/flagship_plan_final.txt"),
      df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
