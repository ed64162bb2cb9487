package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-22 optimization lock-ins. */
class Round22Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** The original portable spelling md5_hash48 replaced — kept here as the
    * reference the native expression is pinned against.
    */
  private def md5Hash48Reference(v: org.apache.spark.sql.Column) =
    conv(substring(md5(v.cast("string")), 1, 12), 16, 10).cast("long")

  test("native md5_hash48 is bit-identical to the conv/substring/md5 spelling") {
    import spark.implicits._
    // edge literals: empty, ascii, multi-byte unicode (2/3/4-byte UTF-8),
    // long strings, leading-zero-digest-prone values, and NULL
    val edges = Seq(
      "", "a", "abc", "hello world", "0", "-1", "1.5",
      "café", "日本語", "😀emoji",
      "x" * 10000, "NaN", "null", "Infinity",
      null.asInstanceOf[String])
    val edf = edges.toDF("s")
    val mismatch = edf.select(
        graft.functions.Md5Hash48.md5Hash48(col("s")).as("fast"),
        md5Hash48Reference(col("s")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(mismatch.count() == 0, mismatch.collect().mkString("\n"))

    // fixture values through the REAL call-site shapes: string text,
    // long keys, double amounts (decimal rendering), dates
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("text").as("v"))
    val nums = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_totalprice").cast("string").as("v"))
      .union(graft.sources.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").cast("string").as("v")))
      .union(graft.sources.Tables.load(spark, dir, "orders")
        .select(col("o_orderdate").cast("string").as("v")))
    val bad = docs.union(nums).select(
        graft.functions.Md5Hash48.md5Hash48(col("v")).as("fast"),
        md5Hash48Reference(col("v")).as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(bad.count() == 0, bad.take(5).mkString("\n"))
  }

  test("md5_hash48 runs as the native expression in the sketch hot paths") {
    // q89 hashes live in its returned plan (q96/q99 hash inside their
    // artifact-build side effect, which the returned serve plan no longer
    // references — so they are asserted via the shared helper q89 also
    // uses, ExtensionQueries3.md5Hash48)
    for (q <- Seq("q89_hll_sketch", "t36_dsir_selection")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("md5_hash48"),
        s"$q lost the native hash expression:\n$p")
    }
  }
}
