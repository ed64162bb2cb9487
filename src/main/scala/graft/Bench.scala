package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. `value` is the total seconds across ALL registered
  * queries; the `queries` map reports a fixed headline subset only, so the
  * line stays well under the harness's 2000-char output tail no matter how
  * many queries are registered (round 1's full 59-query map at full double
  * precision was ~2.9 KB and fell out of the tail -> `parsed: null`).
  */
object Bench {
  /** One representative per operator family; keep this list stable across
    * rounds so per-query numbers are comparable round-over-round.
    */
  private val headline = Vector(
    "flagship_location_summary", "flagship_sql",
    "q01_dim_decode_join", "q03_latest_per_key_window", "q05_self_alias_join",
    "q11_multi_avg", "q16_topk_per_group", "q21_rollup", "q23_running_window",
    "q26_salted_join", "q27_asof_join", "q28_percentiles",
    "d01_dedup_exact", "d03_lsh_candidates", "d07_dedup_clusters",
    "s01_knn_brute", "s04_knn_ivf", "s05_knn_ivf_learned", "s06_knn_lsh_multiprobe",
    "t01_token_stats", "t05_distinctive_terms",
    "e01_tumbling_daily", "e03_sessionize", "m01_media_plumbing",
    "m03_binary_source", "q46_csv_roundtrip", "q47_json_roundtrip",
    "q56_append_sink_roundtrip",
    // round-6 additions (appended; earlier entries stay comparable)
    "t09_normalize", "t10_bigram_lm", "d11_source_cap", "d12_hash_split",
    "s08_recall_eval", "m04_thumbnail", "d13_simhash_neardup",
    "q58_schema_evolution", "q59_recursive_hierarchy", "q60_sql_udf",
    "e07_variant_extract", "t11_curation_pipeline",
    // round-7 additions
    "q61_partition_pruned_lake", "q62_zorder_layout", "q63_stats_index_scan",
    "q64_compact_small_files", "q65_snapshot_read",
    "t12_heavy_hitters", "t13_bpe_merges", "t14_lm_perplexity",
    "s09_knn_pq", "g01_pagerank",
    // round-8 additions
    "d14_minhash_estimate", "s11_knn_ivfpq", "q72_compact_partitioned",
    "d15_mixture_sample", "t15_sequence_pack", "t16_bpe_apply",
    "q73_quantile_sketch", "q74_snapshot_changes",
    "s12_semantic_dedup", "t17_substring_dedup",
    "q75_snapshot_delete", "q76_bloom_index_scan",
    "q77_distinct_sketch", "q78_drift_psi",
    "t18_classifier_score", "d16_bloom_decontaminate",
    "q79_snapshot_upsert", "t19_doc_similarity", "t20_budget_select",
    "g02_triangles", "t21_adaptive_cutoff", "m05_phash_neardup",
    "d17_incremental_dedup", "q80_grouped_distinct_sketch",
    "q81_change_events", "s13_knn_graph", "t22_pack_manifest",
    "q82_table_history", "q83_corrupt_json", "e08_attribution",
    "s14_matryoshka_eval")

  private def r3(x: Double): Double = math.floor(x * 1000 + 0.5) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.FuseDotProduct)
    // Untimed warmup: JIT, codegen cache, parquet footer/file-index reads,
    // OS page cache for EVERY fixture table — otherwise whichever query
    // first touches a table absorbs its listing+footer+disk cost and the
    // per-query numbers are noise (flagship measured 2.5 s warmed vs 5.8 s
    // when it happened to run first).
    // per-table try: one absent/broken table must not abort warming the rest
    graft.sources.Tables.all.foreach(t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () })
    try SparkEntry.queries("q01_dim_decode_join")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // sorted order: deterministic run sequence, comparable round-over-round
    val results = SparkEntry.queries.toVector.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // Full per-query map on stderr for local tuning (never on stdout — the
    // driver tails stdout and the full map would blow the 2000-char budget).
    if (sys.env.contains("SPARK_GRAFT_BENCH_FULL")) {
      val full = results.toVector.sortBy(-_._2)
        .map { case (n, v) => s"\"$n\":${r3(v)}" }.mkString("{", ",", "}")
      System.err.println(s"BENCH_FULL $full")
    }
    // Variance hygiene: the headline per-query numbers are best-of-two —
    // a second timed pass over ONLY the headline subset, min'd against the
    // first, suppresses the one-off GC/scheduler/page-cache spikes that
    // twice flagged phantom regressions on a loaded box. `total` stays the
    // single FIRST-pass sum so it remains comparable round-over-round.
    val second = headline.flatMap { h =>
      SparkEntry.queries.get(h).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        h -> (System.nanoTime() - t0) / 1e9
      }
    }.toMap
    val qs = headline.flatMap(h => results.get(h).map(v =>
        s"\"$h\":${r3(math.min(v, second.getOrElse(h, v)))}"))
      .mkString("{", ",", "}")
    val total = r3(if (results.nonEmpty) results.values.sum else 0.0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"hmode":"min2","queries":$qs,"sf":"$sfDir"}""")
    spark.catalog.clearCache()
    spark.stop()
  }
}
