package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 batch: the fused LSH candidate+verify pass
  * (Dedup.lshVerifiedPairs) that replaced the split
  * lshCandidatePairs→jaccardOnPairs derivation in d04/d09 and the stored
  * verified-pair build. Round16Spec's stored-vs-live pin already
  * cross-checks the fused build against the split derivation on the d04
  * geometry (word shingles, 4×3); this spec covers the OTHER production
  * geometry and the column contract.
  */
class Round17Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def splitForm(feats: org.apache.spark.sql.DataFrame,
      bands: Int, rows: Int) =
    graft.operators.Dedup.jaccardOnPairs(
      graft.operators.Dedup.lshCandidatePairs(feats, bands, rows), feats)

  test("lshVerifiedPairs row-equals the split derivation on the d09 " +
      "geometry (char 5-grams, 2 bands x 6 rows) — same pairs, same " +
      "band counts, bit-identical jaccard doubles") {
    val feats = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        graft.functions.TextHash.charNgramHashes(col("text"), 5)
          .as("features"))
    val cols = Seq("doc_a", "doc_b", "n_shared_bands", "jaccard")
    val fused = graft.operators.Dedup.lshVerifiedPairs(feats, 2, 6)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    val split = splitForm(feats, 2, 6)
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toList
    assert(fused.nonEmpty)
    assert(fused == split)
  }

  test("q104's incremental lake sweep is byte-equal to q99's full " +
      "rebuild — prior artifacts + delta-only refresh merge to the same " +
      "catalog (the full sweep is the truth the incremental path serves)") {
    // the merge algebra must make the two indistinguishable: stats by
    // sum/min/max, NDV by register-max, ndv_est from identical merged
    // registers — so every column including the estimate DOUBLE matches
    val full = ExtensionQueries8.all("q99_lake_stats_sweep")(spark, dir)
      .collect().map(_.toSeq).toList
    val incr = ExtensionQueries8.all("q104_incremental_lake_sweep")(spark, dir)
      .collect().map(_.toSeq).toList
    assert(full.nonEmpty)
    assert(incr == full)
  }

  test("a table with an EMPTY ingest delta (no rows today) writes an " +
      "empty artifact and serves its prior catalog unchanged") {
    // every fixture table's delta is non-empty (keys start at 0), so the
    // no-ingest nightly is pinned here on a synthetic table: the delta
    // write produces a file-less dir and the explicit-schema read must
    // yield zero rows, leaving the served catalog equal to prior-only
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val rows = Seq((1L, "a"), (2L, "b"), (17L, "c")).toDF("k", "v")
    val specs = Seq(ExtensionQueries8.auditSpec(
        ExtensionQueries8.AuditCol("k", "int")),
      ExtensionQueries8.auditSpec(ExtensionQueries8.AuditCol("v", "str")))
    val root = graft.sources.Scratch.fresh(spark, "r17_empty_delta")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(rows,
        ExtensionQueries8.lakeShard("k"), specs), s"$root/prior", "overwrite")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(rows.filter(lit(false)),
        ExtensionQueries8.lakeShard("k"), specs), s"$root/delta", "overwrite")
    val pStats = spark.read.parquet(s"$root/prior/stats")
    val pRegs = spark.read.parquet(s"$root/prior/ndv_regs")
    val dStats = spark.read.schema(pStats.schema)
      .parquet(s"$root/delta/stats")
    val dRegs = spark.read.schema(pRegs.schema)
      .parquet(s"$root/delta/ndv_regs")
    assert(dStats.count() === 0L && dRegs.count() === 0L)
    val merged = ExtensionQueries8.serveCatalogFrom(None,
      pStats.unionByName(dStats), pRegs.unionByName(dRegs))
      .collect().map(_.toSeq).toList
    val priorOnly = ExtensionQueries8.serveCatalogFrom(None, pStats, pRegs)
      .collect().map(_.toSeq).toList
    assert(merged == priorOnly && merged.nonEmpty)
  }

  test("lshVerifiedPairs emits each candidate pair ONCE with the " +
      "multi-band collision count, never one row per colliding band") {
    import spark.implicits._
    // two identical docs collide in EVERY band (all minhash slots equal);
    // a third unrelated doc collides in none
    val feats = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L, 40L)),
      (3L, Seq(999L, 888L, 777L, 666L))).toDF("id", "features")
    val got = graft.operators.Dedup.lshVerifiedPairs(feats, 4, 3)
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("doc_a") === 1L && r.getAs[Long]("doc_b") === 2L)
    assert(r.getAs[Long]("n_shared_bands") === 4L)
    assert(r.getAs[Double]("jaccard") === 1.0)
  }
}
