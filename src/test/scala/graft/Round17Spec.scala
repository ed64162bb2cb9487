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
      "empty artifact and serves its prior catalog unchanged; an empty " +
      "PRIOR (first-ever nightly) serves delta-only; the declared " +
      "artifact schemas match what a real write round-trips") {
    // the fixture tables all have non-empty deltas AND non-empty priors,
    // so both degenerate nightlies are pinned here on a synthetic table:
    // a file-less artifact root must read as the empty frame (explicit
    // schema — inference throws on no files) and the merge treats it as
    // the identity
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val rows = Seq((1L, "a"), (2L, "b"), (17L, "c")).toDF("k", "v")
    val specs = Seq(ExtensionQueries8.auditSpec(
        ExtensionQueries8.AuditCol("k", "int")),
      ExtensionQueries8.auditSpec(ExtensionQueries8.AuditCol("v", "str")))
    val root = graft.sources.Scratch.fresh(spark, "r17_empty_delta")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(rows,
        ExtensionQueries8.lakeShard("k"), specs), s"$root/full", "overwrite")
    ExtensionQueries8.writeCatalogShards(
      ExtensionQueries8.catalogLongForm(rows.filter(lit(false)),
        ExtensionQueries8.lakeShard("k"), specs), s"$root/none", "overwrite")
    // the declared read schemas must be exactly what a real write
    // round-trips (name -> type; nullability differs by inference)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name -> f.dataType).toList
    assert(shape(spark.read.parquet(s"$root/full/stats").schema).toSet ==
      shape(ExtensionQueries8.statsArtifactSchema).toSet)
    assert(shape(spark.read.parquet(s"$root/full/ndv_regs").schema).toSet ==
      shape(ExtensionQueries8.regsArtifactSchema).toSet)
    val fStats = spark.read.schema(ExtensionQueries8.statsArtifactSchema)
      .parquet(s"$root/full/stats")
    val fRegs = spark.read.schema(ExtensionQueries8.regsArtifactSchema)
      .parquet(s"$root/full/ndv_regs")
    val eStats = spark.read.schema(ExtensionQueries8.statsArtifactSchema)
      .parquet(s"$root/none/stats")
    val eRegs = spark.read.schema(ExtensionQueries8.regsArtifactSchema)
      .parquet(s"$root/none/ndv_regs")
    assert(eStats.count() === 0L && eRegs.count() === 0L)
    val fullOnly = ExtensionQueries8.serveCatalogFrom(None, fStats, fRegs)
      .collect().map(_.toSeq).toList
    // empty delta: prior ∪ empty == prior
    val emptyDelta = ExtensionQueries8.serveCatalogFrom(None,
      fStats.unionByName(eStats), fRegs.unionByName(eRegs))
      .collect().map(_.toSeq).toList
    // empty prior: empty ∪ delta == delta
    val emptyPrior = ExtensionQueries8.serveCatalogFrom(None,
      eStats.unionByName(fStats), eRegs.unionByName(fRegs))
      .collect().map(_.toSeq).toList
    assert(fullOnly.nonEmpty)
    assert(emptyDelta == fullOnly && emptyPrior == fullOnly)
  }

  test("d24's incrementally-maintained pair table equals the full fused " +
      "derivation over all docs (stored old-pairs + delta-only verify " +
      "is exhaustive and value-identical)") {
    import org.apache.spark.sql.functions.col
    val incr = ExtensionQueries.all("d24_incremental_verify")(spark, dir)
      .collect().map(_.toSeq).toList
    val feats = ExtensionQueries.docFeatures(spark, dir)
    val full = graft.operators.Dedup.lshVerifiedPairs(feats, 4, 3)
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        graft.operators.Agg.roundAt(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
      .collect().map(_.toSeq).toList
    assert(full.nonEmpty)
    assert(incr == full)
  }

  test("a NULL shard key routes to the prior side (total predicate) and " +
      "the split prior+delta catalog still equals the full build") {
    // a row whose shard key is null makes the raw mod-16 comparison
    // null; without coalesce the row would pass NEITHER filter and
    // silently vanish from the incremental catalog while the full build
    // counts it in the null shard group
    import spark.implicits._
    val rows = Seq((Some(1L), "a"), (Some(16L), "b"), (None, "c"))
      .toDF("k", "v")
    assert(rows.filter(ExtensionQueries8.ingestDeltaPred("k")).count() === 1L)
    assert(rows.filter(!ExtensionQueries8.ingestDeltaPred("k")).count() === 2L,
      "the null-keyed row must land on the prior side, not nowhere")
    val specs = Seq(ExtensionQueries8.auditSpec(
        ExtensionQueries8.AuditCol("k", "int")),
      ExtensionQueries8.auditSpec(ExtensionQueries8.AuditCol("v", "str")))
    val root = graft.sources.Scratch.fresh(spark, "r17_null_key")
    def build(df: org.apache.spark.sql.DataFrame, name: String) = {
      ExtensionQueries8.writeCatalogShards(
        ExtensionQueries8.catalogLongForm(df,
          ExtensionQueries8.lakeShard("k"), specs), s"$root/$name",
        "overwrite")
      (spark.read.schema(ExtensionQueries8.statsArtifactSchema)
        .parquet(s"$root/$name/stats"),
       spark.read.schema(ExtensionQueries8.regsArtifactSchema)
        .parquet(s"$root/$name/ndv_regs"))
    }
    val (fS, fR) = build(rows, "full")
    val (pS, pR) = build(rows.filter(!ExtensionQueries8.ingestDeltaPred("k")),
      "prior")
    val (dS, dR) = build(rows.filter(ExtensionQueries8.ingestDeltaPred("k")),
      "delta")
    val full = ExtensionQueries8.serveCatalogFrom(None, fS, fR)
      .collect().map(_.toSeq).toList
    val split = ExtensionQueries8.serveCatalogFrom(None,
      pS.unionByName(dS), pR.unionByName(dR))
      .collect().map(_.toSeq).toList
    assert(full.nonEmpty && split == full)
    // n_rows must include the null-keyed row
    assert(full.exists(r => r.head == "k" && r(1) == 3L))
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
