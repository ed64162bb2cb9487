package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Agg, Layout}
import graft.sources.Tables

/** Round-7 lake-layout operators: partition-pruned reads over a
  * directory-partitioned table, z-order (Morton) clustering for
  * multi-column file skipping, and small-file compaction. These are the
  * WRITE-side levers of 100 TB scan performance — each query executes the
  * real layout operation against scratch storage and reads its own output
  * back, while the DuckDB oracle reads the ORIGINAL parquet, so any loss or
  * corruption in the layout round trip fails the hash.
  */
object RelationalQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB mirror of [[Layout.zorderKey]] over non-negative ints, built
    * from the same bit placement (a's bit i at 2i+1, b's at 2i) with
    * portable arithmetic (`//` floor division == truncation for the
    * non-negative inputs here).
    */
  private def zorderSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"(($a // $p) % 2) * ${1L << (2 * i + 1)} + (($b // $p) % 2) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")

  /** The q62 clustering geometry: 10 bits covers pa (0..1023) and sb
    * (0..99); the box predicate selects a pa stripe × sb stripe.
    */
  private val ZBits = 10

  /** q76 bloom geometry: 2^14 bits / 4 hashes over ~1k keys per file puts
    * the per-file false-positive rate near 0.2% — candidates ≈ the files
    * that truly hold a key.
    */
  private val BloomBits = 1 << 14
  private val BloomK = 4

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Directory-partitioned lake write + pruned read: orders land under
    // o_year=YYYY/ directories, and the year-filtered read-back touches
    // exactly one of the seven partition subtrees — the scan's
    // PartitionFilters (asserted in Round7Spec) prune the rest at PLANNING
    // time, before any file is opened. At 100 TB this is the difference
    // between scanning a day and scanning the lake: partition on the
    // dominant access predicate (almost always event time).
    "q61_partition_pruned_lake" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"lake_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        // spread the single-file fixture scan before the write, like q46
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_year") === 1997)
        .groupBy(month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_month"))
    }),

    // Z-order clustered layout + box query: lineitem is rewritten sorted by
    // the Morton key of (pa, sb), then read back through a two-column box
    // predicate on the STORED cluster columns — so the filter reaches the
    // parquet scan (PushedFilters) and the curve's locality makes per-file
    // min/max stats tight on BOTH columns at once (a single-column sort
    // gets tight stats on one). sum_z pins the interleave arithmetic
    // bit-for-bit against the oracle's replay; Round7Spec measures the
    // actual file-skip ratio the layout buys.
    "q62_zorder_layout" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"zorder_${graft.sources.Scratch.dirTag(dir)}")
      val src = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"), col("l_returnflag"),
          pmod(col("l_partkey"), lit(1024)).as("pa"),
          pmod(col("l_suppkey"), lit(1024)).as("sb"))
      Layout.writeZOrdered(src, col("pa"), col("sb"), ZBits, nFiles = 8, dir = tmp)
      s.read.parquet(tmp)
        // sb's live range is suppkey-bounded (10 at sf0.001), so the sb
        // stripe sits low; pa's is partkey-bounded and wide at every SF
        .filter(col("pa").between(128, 255) && col("sb").between(2, 6))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("zkey")).as("sum_z"),
          min(col("zkey")).as("min_z"),
          max(col("zkey")).as("max_z"),
          sum(col("qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Stats-index (manifest-style) scan: the skipping index external table
    // formats maintain, built and USED natively — per-file min/max stats
    // over the z-ordered layout select the candidate file subset for the
    // box (file METADATA on the driver, exactly what an Iceberg/Delta
    // planner holds), and only those files are opened. The aggregate over
    // the pruned read must still match the whole-table oracle: skipping
    // may only skip files the predicate proves empty. Round7Spec asserts
    // the candidate set is a strict subset.
    "q63_stats_index_scan" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"statsidx_${graft.sources.Scratch.dirTag(dir)}")
      val src = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"),
          col("l_returnflag"),
          pmod(col("l_partkey"), lit(1024)).as("pa"),
          pmod(col("l_suppkey"), lit(1024)).as("sb"))
      Layout.writeZOrdered(src, col("pa"), col("sb"), ZBits, nFiles = 8, dir = tmp)
      val idx = Layout.statsIndex(s, tmp, Seq("pa", "sb"))
      val files = Layout.filesForBox(idx, Map("pa" -> (128L, 255L), "sb" -> (2L, 6L)))
      require(files.nonEmpty, "fixture box must be populated")
      s.read.parquet(files: _*)
        .filter(col("pa").between(128, 255) && col("sb").between(2, 6))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Small-file compaction: the ingest-shaped layout (64 tiny files — what
    // a streaming or per-batch writer leaves behind) rewritten to
    // size-targeted files via a narrow coalesce (no shuffle: compaction is
    // an I/O rewrite and must not pay a network pass). The read-back
    // aggregate hash-matching the original-table oracle proves the rewrite
    // lost nothing; Round7Spec asserts the file count actually dropped.
    "q64_compact_small_files" -> ((s, dir) => {
      val small = graft.sources.Scratch.fresh(s, s"small_${graft.sources.Scratch.dirTag(dir)}")
      val packed = graft.sources.Scratch.fresh(s, s"packed_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "documents").repartition(64)
        .write.mode("overwrite").parquet(small)
      val totalBytes = {
        val p = new org.apache.hadoop.fs.Path(small)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(st => st.isFile &&
          !st.getPath.getName.startsWith("_")).map(_.getLen).sum
      }
      // target a quarter of the data per file -> 4 output files at any SF
      Layout.compact(s, small, packed, targetBytes = math.max(1L, totalBytes / 4))
      s.read.parquet(packed)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"))
        .orderBy(col("source"))
    }),

    // Full outer join — the one outer-join shape the inventory lacked:
    // activity in two disjoint years per customer, keys surviving from
    // EITHER side (coalesce), presence flags from null-ness. AQE picks the
    // join strategy; a full outer can't broadcast, so both agg sides
    // shuffle on the key — correct and unavoidable (the aggregates are
    // |customers|-sized, not fact-sized).
    "q66_full_outer_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      def yearAgg(y: Int, n: String) = o
        .filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(n))
      val a = yearAgg(1997, "n_97")
      val b = yearAgg(1999, "n_99")
        .withColumnRenamed("o_custkey", "ck_b")
      a.join(b, col("o_custkey") === col("ck_b"), "full_outer")
        .select(coalesce(col("o_custkey"), col("ck_b")).as("custkey"),
          col("o_custkey").isNotNull.as("has_97"),
          col("ck_b").isNotNull.as("has_99"),
          coalesce(col("n_97"), lit(0L)).as("n_97"),
          coalesce(col("n_99"), lit(0L)).as("n_99"))
        .orderBy(col("custkey"))
    }),

    // Null semantics, explicitly: NULL grouping (one group), count(*) vs
    // count(col), null-safe equality joins (<=> / IS NOT DISTINCT FROM —
    // the ONLY equality under which NULL matches NULL), and explicit
    // NULLS FIRST ordering (Spark and DuckDB DEFAULT differently — ASC is
    // nulls-first in Spark, nulls-last in DuckDB — so portable SQL must
    // say it).
    "q67_null_semantics" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), nullif(col("s_nationkey"), lit(3)).as("nk"))
      val grouped = sup.groupBy(col("nk"))
        .agg(count(lit(1)).as("n_rows"), count(col("nk")).as("n_nonnull"))
      val pairs = sup.alias("a")
        .join(sup.alias("b"), col("a.nk") <=> col("b.nk"))
        .groupBy(col("a.nk").as("nk2")).agg(count(lit(1)).as("n_pairs"))
      grouped.join(pairs, col("nk") <=> col("nk2"))
        .select(col("nk"), col("n_rows"), col("n_nonnull"), col("n_pairs"))
        .orderBy(col("nk").asc_nulls_first)
    }),

    // Raw text source/sink round trip — the rawest corpus format an LLM
    // pipeline ingests (one record per line, fields packed by the writer).
    // The write requires exactly one string column; the read surfaces one
    // `value` column the reader re-parses — both directions exercised,
    // with the oracle on the ORIGINAL table so any packing/parsing loss
    // fails the hash. (Fixture text is newline- and tab-free; a real lake
    // escapes or length-prefixes.)
    "q71_text_source_roundtrip" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"text_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "documents")
        .select(concat_ws("\t", col("doc_id"), col("lang"), col("text")).as("value"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").text(tmp)
      s.read.text(tmp)
        .select(split(col("value"), "\t").as("f"))
        .select(element_at(col("f"), 1).cast("long").as("doc_id"),
          element_at(col("f"), 2).as("lang"),
          element_at(col("f"), 3).as("text"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("text")).cast("long")).as("sum_len"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("lang"))
    }),

    // Union by NAME across drifted schemas: batch B reorders columns and
    // adds one — positional UNION would silently cross-assign columns;
    // name-based union with missing-column fill is the only safe way to
    // append evolving batches (the in-memory sibling of q58's mergeSchema
    // read).
    "q70_union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val b = o.filter(year(col("o_orderdate")) === 1999)
        .select(col("o_totalprice"), col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first)
    }),

    // Time-interval RANGE window frame — the one window frame shape the
    // inventory lacked: a VALUE-based sliding frame over event time
    // (trailing 30 days per customer), vs q23/q38's row-based frames.
    // RANGE frames are tie-stable by construction (all date peers share a
    // frame), and the exact-decimal sum keeps the sliding accumulation
    // order-independent, so the result is deterministic and replayable.
    "q69_range_interval_window" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("n_30d", expr(
          "count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate " +
            "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"))
        .withColumn("rev_30d", Agg.roundAt(expr(
          "sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate " +
            "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)").cast("double"), 2))
        .select(col("o_orderkey"), col("o_custkey"), col("n_30d"), col("rev_30d"))
        .orderBy(col("o_orderkey"))),

    // MapType surface: per-order maps built from grouped entries
    // (map_from_entries), consumed with element_at / map_keys /
    // map_contains_key. Maps never reach the output (engines disagree on
    // map serialization order by design — keys are unordered); the query
    // extracts scalars, which is also the only hash-stable way to consume
    // a map.
    "q68_map_funcs" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_orderkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("l_returnflag"), col("cnt"))))).as("m"))
        .select(col("l_orderkey"),
          size(map_keys(col("m"))).as("n_flags"),
          coalesce(element_at(col("m"), "R"), lit(0L)).as("n_returned"),
          col("m").getField("A").isNotNull.as("has_a"),
          map_contains_key(col("m"), "N").as("has_n"))
        .orderBy(col("l_orderkey"))
    }),

    // Versioned-snapshot (time-travel) table: two commits build the corpus
    // (even doc_ids, then odd), each publishing an atomic manifest; the
    // as-of-latest read reassembles EXACTLY the committed whole, which the
    // full-table oracle hash-checks. This is the reproducibility contract
    // a training run needs — "the corpus exactly as version N published
    // it" — and Round7Spec pins the historical view (v1 = even half only)
    // and crash isolation (an orphaned batch dir stays invisible).
    "q65_snapshot_read" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snap_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 === 0))
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 =!= 0))
      graft.sources.Snapshots.readLatest(s, tbl)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Incremental snapshot read (round 8): the "what's new since version
    // N" contract an incremental training run consumes. Append-only
    // manifests are strict supersets, so the delta is a plain scan of the
    // batch dirs v2 lists beyond v1 — O(new data), no anti-join against
    // the old corpus (at 100 TB THE difference between incremental and
    // full reprocessing). The oracle recomputes the delta as the odd-doc
    // filter the second commit wrote, so a leaked or missed batch fails
    // the hash; Round8Spec pins the replace-boundary refusal.
    "q74_snapshot_changes" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snapdiff_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 === 0))
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 =!= 0))
      graft.sources.Snapshots.readChanges(s, tbl, fromV = 1, toV = 2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Bloom-filter file index (round 8): equality lookups on a
    // high-cardinality key over a TIME-ordered layout — the case where
    // q63's min/max boxes skip nothing (every file spans nearly the whole
    // key range). The index build is one aggregation pass producing
    // files-sized metadata (256 longs per file here); the probe consults
    // only the index and reads the candidate file subset. Pruning cannot
    // change results (no false negatives by construction), so the oracle
    // is the plain filtered table — a key lost to over-pruning fails the
    // hash; Round8Spec asserts the skip actually happens (candidates <
    // total files).
    "q76_bloom_index_scan" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"bloom_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "orders").repartitionByRange(16, col("o_orderdate"))
        .write.mode("overwrite").parquet(tmp)
      val idx = Layout.bloomIndex(s, tmp, "o_orderkey", mBits = BloomBits, k = BloomK)
      val keys = t(s, dir, "orders").select(col("o_orderkey"))
        .orderBy(col("o_orderkey")).limit(3)
        .collect().map(_.getLong(0)).toSeq
      Layout.bloomScan(s, tmp, idx, keys, mBits = BloomBits, k = BloomK)
        .filter(col("o_orderkey").isin(keys: _*))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_orderkey"))
    }),

    // Merge-on-read row-level delete (round 8): GDPR-shaped erasure on the
    // versioned table WITHOUT rewriting data — the delete commit writes
    // only the matched doc_id key set as an equality-delete sidecar, and
    // the read applies one anti-join (broadcast-sized build side). The
    // post-delete view hash-matches a filtered-table oracle, so a key
    // leaking through the mask — or the mask over-deleting — fails the
    // hash; Round8Spec pins time travel to the PRE-delete version, the
    // delete-then-reappend ordering rule, and that compaction folds the
    // mask away.
    "q75_snapshot_delete" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snapdel_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 === 0))
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 =!= 0))
      graft.sources.Snapshots.delete(s, tbl, col("lang") === "zh", Seq("doc_id"))
      graft.sources.Snapshots.readLatest(s, tbl)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Z-order-clustered compaction (round 10): one maintenance pass folds
    // merge-on-read delete debt AND rewrites the visible rows along the
    // (l_partkey, l_suppkey) space-filling curve —
    // Snapshots.compactLatestZOrdered, the composition of q64's compaction
    // with q62's clustering. The gate proves the rewrite is layout-only:
    // the post-compaction view must hash-equal the oracle's direct replay
    // of ingest-minus-deletes, byte for byte, while the clustering payoff
    // (box predicates skipping most files via per-file stats) is pinned in
    // Round10Spec where file geometry is observable.
    "q84_zorder_compact" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"zcomp_${graft.sources.Scratch.dirTag(dir)}")
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"))
      for (i <- 0 to 3)
        graft.sources.Snapshots.commit(s, tbl, li.filter(col("l_orderkey") % 4 === i))
      // key = the full tuple: (l_orderkey, l_linenumber) is NOT unique in
      // the synthetic lineitem, and a sub-tuple key would mask innocent
      // rows sharing it; full-tuple equality deletes exactly the
      // predicate-matched rows even where tuples repeat
      graft.sources.Snapshots.delete(s, tbl, col("l_quantity") > 45.0,
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity"))
      graft.sources.Snapshots.compactLatestZOrdered(s, tbl,
        "l_partkey", "l_suppkey", bits = 12, nFiles = 8)
      graft.sources.Snapshots.readLatest(s, tbl)
        .groupBy((col("l_partkey") % 16).as("pk_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
        .orderBy(col("pk_bucket"))
    }),

    // Corrupt-tolerant JSON ingestion (round 8): web-scale feeds are
    // never clean, and a reader that dies on the first malformed line
    // cannot ingest a crawl. Every doc_id % 7 == 0 line is written
    // deliberately broken (truncated JSON); the PERMISSIVE read captures
    // them in a _corrupt column instead of failing, and the summary
    // reports good rows per lang plus the quarantine count — the
    // good-vs-quarantined split a real ingest routes to separate sinks.
    // The oracle recomputes both sides from the raw table, so a line
    // misclassified in either direction fails the hash.
    "q83_corrupt_json" -> ((s, dir) => {
      val tmp = graft.sources.Scratch.fresh(s, s"cjson_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "documents")
        .select(when(col("doc_id") % 7 === 0,
            concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"lang\": TRUNC")))
          .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
          .as("value"))
        .repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").text(tmp)
      // persisted for two reasons: the good/bad branches both consume it,
      // and Spark refuses corrupt-column-only predicates against a raw
      // file scan (the column exists only after parsing materializes)
      val parsed = s.read
        .schema("doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(tmp)
        .persist()
      val good = parsed.filter(col("_corrupt").isNull)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_good"), sum(col("n_chars")).as("sum_chars"))
      val bad = parsed.filter(col("_corrupt").isNotNull)
        .agg(count(lit(1)).as("n_good")) // row shape below: lang='__corrupt'
        .select(lit("__corrupt").as("lang"), col("n_good"),
          lit(null).cast("long").as("sum_chars"))
      good.unionByName(bad).orderBy(col("lang"))
    }),

    // Table history audit (round 8): DESCRIBE HISTORY for the versioned
    // table — every committed version's view re-read and summarized in
    // one result (append, append, delete here), which is both the audit
    // surface a lakehouse exposes and a second proof that EVERY
    // historical version stays exactly readable (q65/q75 each pin one
    // version; this pins them all). The version list is manifest
    // metadata (driver-side, planner-scale); each version's summary is
    // one aggregation.
    "q82_table_history" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snaphist_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 === 0))
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 2 =!= 0))
      graft.sources.Snapshots.delete(s, tbl, col("lang") === "zh", Seq("doc_id"))
      graft.sources.Snapshots.versions(s, tbl).map { v =>
        graft.sources.Snapshots.readAsOf(s, tbl, v)
          .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_chars"),
            col("n_langs"))
      }.reduce(_.unionAll(_)).orderBy(col("version"))
    }),

    // Change-event feed across an upsert (round 8): the delete-inclusive
    // CDC read q74 refuses — one event per inserted row and per deleted
    // key, ordered by manifest position so replaying the feed reproduces
    // the version transition. The summary aggregates the feed per op; an
    // upsert's mask and rows appear as matching delete/insert counts
    // (an UPDATE, split into its two events, as every CDC protocol
    // transports it).
    "q81_change_events" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snapev_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs)
      val changed = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
      graft.sources.Snapshots.upsert(s, tbl, changed, Seq("doc_id"))
      graft.sources.Snapshots.readChangeEvents(s, tbl, fromV = 1, toV = 2)
        .groupBy(col("_op"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("doc_id")).as("n_keys"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("_op").as("op"), col("n_events"), col("n_keys"),
          col("sum_chars"))
        .orderBy(col("op"))
    }),

    // MERGE INTO on the versioned table (round 8): a CDC-shaped batch of
    // changed rows (every doc_id % 5 == 0 document re-measured 1000 chars
    // longer) lands as ONE atomic version — an equality-delete mask plus
    // the new rows in the same manifest publish, no data rewrite (q53 is
    // the copy-on-write merge over plain tables; this is the
    // merge-on-read form a few-minute CDC cadence needs). The read-back
    // hash-matches a latest-wins oracle over the raw table, so a row
    // duplicated (mask missed) or lost (mask over-matched) fails;
    // Round8Spec pins atomicity (one version), insert-of-new-keys, and
    // pre-upsert time travel.
    "q79_snapshot_upsert" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"snapup_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs)
      val changed = docs.filter(col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 1000)
      graft.sources.Snapshots.upsert(s, tbl, changed, Seq("doc_id"))
      graft.sources.Snapshots.readLatest(s, tbl)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("lang"))
    }),

    // Distribution-drift monitoring (PSI) between table versions: the
    // population stability index of the n_chars distribution, version 1
    // (two-thirds of the corpus) vs version 2 (all of it) — the standard
    // "did yesterday's ingest shift the data" gate, run against the
    // versioned table so the comparison is between PUBLISHED states, not
    // racing reads. Fixed bin edges (PSI convention — reference bins,
    // never data-dependent min/max), per-bin contributions
    // (p-q)·ln(p/q) where both sides are populated, and the total
    // summed as fixed-point longs so bin-count partitioning can't
    // reorder double additions (the g01 rule). Each version's histogram
    // is one map-side-combinable aggregation; the bin join is
    // bins-sized. Oracle replays both versions from the raw table.
    "q78_drift_psi" -> ((s, dir) => {
      val tbl = graft.sources.Scratch.fresh(s, s"psi_${graft.sources.Scratch.dirTag(dir)}")
      val docs = t(s, dir, "documents")
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 3 =!= 0))
      graft.sources.Snapshots.commit(s, tbl, docs.filter(col("doc_id") % 3 === 0))
      def hist(df: DataFrame) = df
        .select(least(lit(15), floor(col("n_chars") / lit(64.0)).cast("int")).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
      val ref = hist(graft.sources.Snapshots.readAsOf(s, tbl, 1))
      val cur = hist(graft.sources.Snapshots.readAsOf(s, tbl, 2))
      val p = col("n_ref").cast("double") / col("rt")
      val q = col("n_cur").cast("double") / col("ct")
      val contrib = when(col("n_ref") > 0 && col("n_cur") > 0,
        (p - q) * log(p / q))
      val j = ref.select(col("bin"), col("n").as("n_ref"))
        .join(cur.select(col("bin").as("bin_c"), col("n").as("n_cur")),
          col("bin") === col("bin_c"), "full_outer")
        .select(coalesce(col("bin"), col("bin_c")).as("bin"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cur"), lit(0L)).as("n_cur"))
        .crossJoin(broadcast(ref.agg(sum(col("n")).as("rt"))))
        .crossJoin(broadcast(cur.agg(sum(col("n")).as("ct"))))
        .withColumn("fp", floor(contrib * lit(1e9)).cast("long"))
        .persist() // bins-sized; feeds both the per-bin rows and the total
      val tot = j.agg((sum(col("fp")).cast("double") / lit(1e9)).as("__t"))
        .select(Agg.roundAt(col("__t"), 6).as("psi_total"))
      j.select(col("bin"), col("n_ref"), col("n_cur"),
          Agg.roundAt(contrib, 6).as("psi_bin"))
        .crossJoin(broadcast(tot))
        .orderBy(col("bin"))
    }),

    // Partition-preserving compaction (round 8): the ingest-shaped layout a
    // per-trigger writer leaves behind — MANY small files inside EVERY
    // o_year=YYYY partition dir — rewritten per-partition (independent
    // narrow coalesces, no shuffle, partition dirs never coupled), so the
    // directory layout and its planning-time pruning survive the rewrite.
    // The read-back aggregates across ALL partitions and hash-matches the
    // original-table oracle, so a lost or duplicated partition dir fails
    // loudly; Round8Spec asserts per-partition file counts actually
    // dropped and that the compacted table still prunes.
    "q72_compact_partitioned" -> ((s, dir) => {
      val small = graft.sources.Scratch.fresh(s, s"psmall_${graft.sources.Scratch.dirTag(dir)}")
      val packed = graft.sources.Scratch.fresh(s, s"ppacked_${graft.sources.Scratch.dirTag(dir)}")
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .repartition(16) // 16 small files per partition dir — ingest-shaped
        .write.mode("overwrite").partitionBy("o_year").parquet(small)
      Layout.compactPartitioned(s, small, packed, targetBytes = 64L * 1024 * 1024)
      s.read.parquet(packed)
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          Agg.roundAt(Agg.decSum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("o_year"))
    })
  )

  val oracles: Map[String, String] = Map(

    "q61_partition_pruned_lake" -> """
      SELECT CAST(month(o_orderdate) AS INTEGER) AS o_month, count(*) AS n,
             count(DISTINCT o_custkey) AS n_cust,
             floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      FROM orders
      WHERE year(o_orderdate) = 1997
      GROUP BY 1 ORDER BY 1""",

    // whole-table replay — a partition dir lost/duplicated by the rewrite
    // shows up as a wrong group row
    "q72_compact_partitioned" -> """
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n,
             count(DISTINCT o_custkey) AS n_cust,
             floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      FROM orders
      GROUP BY 1 ORDER BY 1""",

    "q62_zorder_layout" -> s"""
      WITH z AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               l_partkey % 1024 AS pa, l_suppkey % 1024 AS sb,
               ${zorderSql("(l_partkey % 1024)", "(l_suppkey % 1024)", ZBits)} AS zkey
        FROM lineitem
      )
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(zkey) AS BIGINT) AS sum_z,
             CAST(min(zkey) AS BIGINT) AS min_z,
             CAST(max(zkey) AS BIGINT) AS max_z,
             CAST(sum(qty) AS BIGINT) AS sum_qty
      FROM z
      WHERE pa BETWEEN 128 AND 255 AND sb BETWEEN 2 AND 6
      GROUP BY 1 ORDER BY 1""",

    "q64_compact_small_files" -> """
      SELECT source, count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT lang) AS n_langs
      FROM documents
      GROUP BY 1 ORDER BY 1""",

    // Skipping may only skip provably-empty files, so the pruned read must
    // reproduce the whole-table box aggregate.
    "q63_stats_index_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem
      WHERE (l_partkey % 1024) BETWEEN 128 AND 255
        AND (l_suppkey % 1024) BETWEEN 2 AND 6
      GROUP BY 1 ORDER BY 1""",

    "q65_snapshot_read" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT source) AS n_sources
      FROM documents
      GROUP BY 1 ORDER BY 1""",

    // the delta IS the second commit: odd doc_ids only
    "q74_snapshot_changes" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT source) AS n_sources
      FROM documents
      WHERE doc_id % 2 <> 0
      GROUP BY 1 ORDER BY 1""",

    // good rows are the non-%7 slice per lang; the quarantine row counts
    // the deliberately-broken lines
    "q83_corrupt_json" -> """
      SELECT lang, count(*) AS n_good, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents WHERE doc_id % 7 <> 0
      GROUP BY 1
      UNION ALL
      SELECT '__corrupt', count(*), CAST(NULL AS BIGINT)
      FROM documents WHERE doc_id % 7 = 0
      ORDER BY lang""",

    // v1 = even half, v2 = all, v3 = all minus zh — replayed as filters
    "q82_table_history" -> """
      SELECT 1 AS version, count(*) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT lang) AS n_langs
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT lang)
      FROM documents
      UNION ALL
      SELECT 3, count(*), CAST(sum(n_chars) AS BIGINT), count(DISTINCT lang)
      FROM documents WHERE lang <> 'zh'
      ORDER BY version""",

    // the feed is the %5 keys twice: once as the delete mask (no data
    // columns), once as the updated rows
    "q81_change_events" -> """
      SELECT 'delete' AS op, count(*) AS n_events,
             count(DISTINCT doc_id) AS n_keys,
             CAST(NULL AS BIGINT) AS sum_chars
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 'insert', count(*), count(DISTINCT doc_id),
             CAST(sum(n_chars + 1000) AS BIGINT)
      FROM documents WHERE doc_id % 5 = 0
      ORDER BY op""",

    // latest-wins merge replay: the %5 rows carry the updated measure,
    // row counts unchanged (pure update, no inserts in the oracled path)
    "q79_snapshot_upsert" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
                           ELSE n_chars END) AS BIGINT) AS sum_chars,
             count(DISTINCT source) AS n_sources
      FROM documents
      GROUP BY 1 ORDER BY 1""",

    // PSI replay: v1/v2 are the %3 filters, same fixed bins, same
    // (p-q)·ln(p/q) arithmetic, same fixed-point total
    "q78_drift_psi" -> """
      WITH ref AS (
        SELECT least(15, CAST(floor(n_chars / 64.0) AS INTEGER)) AS bin,
               count(*) AS n
        FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1
      ),
      cur AS (
        SELECT least(15, CAST(floor(n_chars / 64.0) AS INTEGER)) AS bin,
               count(*) AS n
        FROM documents GROUP BY 1
      ),
      rt AS (SELECT CAST(sum(n) AS BIGINT) AS rt FROM ref),
      ct AS (SELECT CAST(sum(n) AS BIGINT) AS ct FROM cur),
      j AS (
        SELECT COALESCE(ref.bin, cur.bin) AS bin,
               CAST(COALESCE(ref.n, 0) AS BIGINT) AS n_ref,
               CAST(COALESCE(cur.n, 0) AS BIGINT) AS n_cur
        FROM ref FULL OUTER JOIN cur ON ref.bin = cur.bin
      ),
      c AS (
        SELECT bin, n_ref, n_cur,
               CASE WHEN n_ref > 0 AND n_cur > 0 THEN
                 (CAST(n_ref AS DOUBLE) / rt - CAST(n_cur AS DOUBLE) / ct)
                   * ln((CAST(n_ref AS DOUBLE) / rt) / (CAST(n_cur AS DOUBLE) / ct))
               END AS contrib
        FROM j CROSS JOIN rt CROSS JOIN ct
      ),
      tot AS (
        SELECT floor((CAST(sum(CAST(floor(contrib * 1000000000) AS BIGINT)) AS DOUBLE)
                 / 1000000000) * 1000000 + 0.5) / 1000000 AS psi_total
        FROM c
      )
      SELECT bin, n_ref, n_cur,
             floor(contrib * 1000000 + 0.5) / 1000000 AS psi_bin,
             psi_total
      FROM c CROSS JOIN tot
      ORDER BY bin""",

    // the three smallest orderkeys, straight off the raw table — pruning
    // must be invisible to results
    "q76_bloom_index_scan" -> """
      SELECT o_orderkey, count(*) AS n,
             floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      FROM orders
      WHERE o_orderkey IN (SELECT o_orderkey FROM orders ORDER BY 1 LIMIT 3)
      GROUP BY 1 ORDER BY 1""",

    // the masked table: every zh row dead, everything else untouched
    "q75_snapshot_delete" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             count(DISTINCT source) AS n_sources
      FROM documents
      WHERE lang <> 'zh'
      GROUP BY 1 ORDER BY 1""",

    // the z-ordered rewrite is layout-only, so the oracle is simply the
    // ingested-minus-deleted view aggregated straight off the base table
    "q84_zorder_compact" -> """
      SELECT l_partkey % 16 AS pk_bucket, count(*) AS n,
             sum(l_quantity) AS sum_qty,
             min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
      FROM lineitem
      WHERE l_quantity <= 45.0
      GROUP BY 1 ORDER BY 1""",

    "q66_full_outer_join" -> """
      WITH a AS (
        SELECT o_custkey, count(*) AS n_97
        FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
      ),
      b AS (
        SELECT o_custkey AS ck_b, count(*) AS n_99
        FROM orders WHERE year(o_orderdate) = 1999 GROUP BY 1
      )
      SELECT coalesce(o_custkey, ck_b) AS custkey,
             o_custkey IS NOT NULL AS has_97,
             ck_b IS NOT NULL AS has_99,
             coalesce(n_97, 0) AS n_97,
             coalesce(n_99, 0) AS n_99
      FROM a FULL OUTER JOIN b ON o_custkey = ck_b
      ORDER BY custkey""",

    "q71_text_source_roundtrip" -> """
      SELECT lang, count(*) AS n,
             CAST(sum(length(text)) AS BIGINT) AS sum_len,
             count(DISTINCT doc_id) AS n_docs
      FROM documents
      GROUP BY 1 ORDER BY 1""",

    "q70_union_by_name" -> """
      WITH u AS (
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE year(o_orderdate) = 1997
        UNION ALL BY NAME
        SELECT o_totalprice, o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE year(o_orderdate) = 1999
      )
      SELECT o_orderstatus, count(*) AS n,
             count(DISTINCT o_custkey) AS n_cust,
             floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      FROM u GROUP BY 1 ORDER BY o_orderstatus ASC NULLS FIRST""",

    "q69_range_interval_window" -> """
      SELECT o_orderkey, o_custkey,
             count(*) OVER w AS n_30d,
             floor(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) * 100 + 0.5) / 100 AS rev_30d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey""",

    // The oracle computes the same EXTRACTED values relationally — maps
    // are a projection-side container, so their consumption must reduce
    // to these scalars.
    "q68_map_funcs" -> """
      WITH per_flag AS (
        SELECT l_orderkey, l_returnflag, count(*) AS cnt
        FROM lineitem GROUP BY 1, 2
      )
      SELECT l_orderkey,
             CAST(count(*) AS INTEGER) AS n_flags,
             coalesce(max(CASE WHEN l_returnflag = 'R' THEN cnt END), 0) AS n_returned,
             bool_or(l_returnflag = 'A') AS has_a,
             bool_or(l_returnflag = 'N') AS has_n
      FROM per_flag
      GROUP BY 1 ORDER BY 1""",

    "q67_null_semantics" -> """
      WITH sup AS (
        SELECT s_suppkey, nullif(s_nationkey, 3) AS nk FROM supplier
      ),
      grouped AS (
        SELECT nk, count(*) AS n_rows, count(nk) AS n_nonnull
        FROM sup GROUP BY nk
      ),
      pairs AS (
        SELECT a.nk AS nk2, count(*) AS n_pairs
        FROM sup a JOIN sup b ON a.nk IS NOT DISTINCT FROM b.nk
        GROUP BY 1
      )
      SELECT nk, n_rows, n_nonnull, n_pairs
      FROM grouped JOIN pairs ON nk IS NOT DISTINCT FROM nk2
      ORDER BY nk ASC NULLS FIRST"""
  )
}
