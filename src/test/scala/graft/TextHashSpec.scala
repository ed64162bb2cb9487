package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHash
import graft.operators.TextOps

/** The native compiled expressions must be value-identical to the portable
  * column-composition forms (which the DuckDB oracles mirror).
  */
class TextHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = graft.sources.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")

  test("ShingleHashes equals the portable shingleHashes on the fixture") {
    val diff = docs.select(
        TextOps.shingleHashes(col("text"), 2).as("a"),
        TextHash.shingleHashes(col("text"), 2).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
  }

  test("MinhashBands equals the portable bandHash per band on the fixture") {
    val feats = docs.select(TextHash.shingleHashes(col("text"), 2).as("features"))
    val checks = (0 until 4).map(b =>
      (TextOps.bandHash(col("features"), b, 3) =!=
        element_at(TextHash.minhashBands(col("features"), 4, 3), b + 1)).cast("int"))
    val mismatches = feats.select(checks.reduce(_ + _).as("m"))
      .agg(sum(col("m"))).first.getLong(0)
    assert(mismatches == 0)
  }

  test("SimHash32 equals the portable simhash32 on the fixture (incl. empty features)") {
    val feats = docs.select(TextHash.shingleHashes(col("text"), 2).as("features"))
    val diff = feats.select(
        TextOps.simhash32(col("features")).as("a"),
        TextHash.simhash32(col("features")).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
    // empty feature set -> 0 in both forms
    val empty = Seq(Seq.empty[Long]).toDF("features")
      .select(TextOps.simhash32(col("features")).as("a"),
        TextHash.simhash32(col("features")).as("b"))
      .head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("CharNgramHashes equals the portable charNgramHashes on the fixture") {
    val diff = docs.select(
        TextOps.charNgramHashes(col("text"), 3).as("a"),
        TextHash.charNgramHashes(col("text"), 3).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
  }

  test("CharNgramHashes n=5 parity on the fixture (d09's hot-path width)") {
    // d09 runs the compiled form at n=5; pin that exact width against the
    // portable form, not just the n=3 case above
    val diff = docs.select(
        TextOps.charNgramHashes(col("text"), 5).as("a"),
        TextHash.charNgramHashes(col("text"), 5).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
  }

  test("CharNgramHashes edge cases: short text, spaces, CJK codepoints") {
    val df = Seq((1L, "ab"), (2L, "   "), (3L, "abc"), (4L, " a b "),
        (5L, "一二三四"), (6L, "MiXeD CaSe"))
      .toDF("id", "text")
    val diff = df.select(
        TextOps.charNgramHashes(col("text"), 3).as("a"),
        TextHash.charNgramHashes(col("text"), 3).as("b"))
      .filter(!(col("a") <=> col("b")))
      .count()
    assert(diff == 0)
    // under-n text yields the empty set in the native form too
    val empt = df.filter(col("id") <= 2)
      .select(TextHash.charNgramHashes(col("text"), 3).as("f"))
      .collect()
    empt.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("short docs: empty features -> null bands in BOTH forms (no garbage candidates)") {
    val df = Seq((1L, "solo"), (2L, "tiny")).toDF("id", "text")
      .select(col("id"), TextHash.shingleHashes(col("text"), 2).as("features"))
    // native bands must be null (portable array_min over empty is null);
    // compare with null-safe equality — =!= is blind to null mismatches
    val bandsNull = df.select(TextHash.minhashBands(col("features"), 4, 3).as("b"))
      .filter(col("b").isNotNull).count()
    assert(bandsNull == 0)
    // and therefore short docs never become mutual LSH candidates
    val pairs = graft.operators.Dedup.lshCandidatePairs(df, 4, 3).count()
    assert(pairs == 0)
  }

  test("tab/newline-wrapped text hashes identically in portable and native forms") {
    val df = Seq("\tengine row scan\n", "  padded with spaces  ").toDF("text")
    val diff = df.select(
        TextOps.shingleHashes(col("text"), 2).as("a"),
        TextHash.shingleHashes(col("text"), 2).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("edge cases: under-n tokens give empty features; scalar fold matches") {
    assert(TextHash.shingleHashes("solo", 2).isEmpty)
    assert(TextHash.hashChars("hi", 0, 2) == 3329L)
    val viaDf = Seq("engine row scan").toDF("t")
      .select(TextHash.shingleHashes(col("t"), 2)).as[Seq[Long]].first
    assert(viaDf.length == 2)
  }
}
