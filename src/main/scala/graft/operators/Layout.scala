package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of scan performance. At
  * 100 TB the fastest query is the one that never reads most of the lake:
  * partition directories prune whole subtrees, z-order clustering makes
  * parquet row-group min/max stats tight on MULTIPLE columns at once, and
  * file compaction keeps the file count (and thus driver listing + task
  * scheduling overhead) proportional to data size instead of to ingest
  * batch count.
  *
  * Everything here is arithmetic or a plain Spark write — no RDDs, no
  * driver-side data movement.
  */
object Layout {

  /** Morton (z-order) interleave of the low `bits` bits of two NON-NEGATIVE
    * integer columns: bit i of `a` lands at output bit 2i+1, bit i of `b`
    * at 2i. Sorting by this key gives a space-filling curve over (a, b), so
    * a file/row-group span of the sort order covers a bounded RECTANGLE in
    * (a, b) space — min/max stats on both columns stay tight, and a box
    * predicate on either column skips most files (see Round7Spec for the
    * measured skip ratio). Pure codegen'd integer arithmetic: `bits` is
    * bounded at 31 so the 2×31 interleaved bits fit a long.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"zorder bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Inverse of [[zorderKey]] — (a, b) recovered from the key. Driver-side
    * helper for tests and debugging; not a Column.
    */
  def zorderDecode(z: Long, bits: Int): (Long, Long) = {
    var a = 0L; var b = 0L; var i = 0
    while (i < bits) {
      a |= ((z >> (2 * i + 1)) & 1L) << i
      b |= ((z >> (2 * i)) & 1L) << i
      i += 1
    }
    (a, b)
  }

  /** Rewrite `df` sorted by the z-order key of (`a`, `b`) into `dir`:
    * range-partition on the key (so files cover disjoint key ranges —
    * range, not hash, or the curve's locality is destroyed), sort within
    * each partition, and persist the key alongside the data. `nFiles`
    * stays a parameter because the right value is data-size/128 MB, which
    * only the caller knows at scale.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, bits: Int,
                    nFiles: Int, dir: String): Unit =
    df.withColumn("zkey", zorderKey(a, b, bits))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(dir)

  /** Per-file min/max statistics over the given columns — the skipping
    * index external table formats (Iceberg/Delta manifests) maintain,
    * built here by one aggregation over the data keyed on
    * `input_file_name()`. At 100 TB the index is files-sized (not
    * rows-sized), lives beside the table, and lets a planner select the
    * file subset a predicate can touch WITHOUT opening any footer. Pair
    * with [[writeZOrdered]]: clustering is what makes these ranges tight.
    */
  def statsIndex(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** The files of `index` (a [[statsIndex]] result) whose [min, max] boxes
    * intersect every given closed interval — the candidate set a range
    * predicate must read. Collecting is sound here: this is file METADATA
    * (one row per file), the thing every table-format planner holds on the
    * driver.
    */
  def filesForBox(index: DataFrame, box: Map[String, (Long, Long)]): Seq[String] = {
    val pred = box.map { case (c, (lo, hi)) =>
      col(s"${c}_max") >= lo && col(s"${c}_min") <= hi
    }.reduce(_ && _)
    index.filter(pred).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Per-file Bloom filter index over `key` — the skipping index for
    * EQUALITY lookups on high-cardinality columns, where min/max boxes
    * ([[statsIndex]]) are useless unless the data happens to be clustered
    * on the key (a time-ordered ingest leaves an id column spanning nearly
    * its full range in every file). One aggregation pass keyed on
    * `input_file_name()` builds an `mBits`-bit filter per file as 64-bit
    * words: each value contributes `k` double-hashed bit positions
    * (h1 + i·h2, the standard Kirsch–Mitzenmacher construction over two
    * xxhash64 seeds), exploded to (word, mask) pairs and OR-folded. The
    * index is files-sized metadata (mBits/64 longs per file), exactly what
    * Delta/Iceberg persist as bloom sidecars. Both hashes run INSIDE the
    * engine — [[bloomFilesFor]] probes with the same expressions, so
    * build/probe consistency is by construction, and cross-engine hash
    * portability is irrelevant: pruning never changes results (the oracle
    * for any bloom-scanned query is the plain filter), it only skips
    * files that provably lack the key.
    */
  def bloomIndex(spark: SparkSession, dir: String, key: String,
                 mBits: Int, k: Int): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), bloomPositions(col(key), mBits, k))
      .select(col("file"), explode(col("pos")).as("p"))
      .select(col("file"), (col("p") / 64).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").as("mask"))
      .groupBy(col("file"), col("w")).agg(expr("bit_or(mask)").as("bits"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("bloom"))
  }

  /** The k double-hashed bit positions of `key` as an array column `pos`.
    * Shared by index build and probe — consistency by construction.
    */
  private def bloomPositions(key: Column, mBits: Int, k: Int): Column = {
    val h1 = pmod(xxhash64(key), lit(mBits.toLong))
    // step must be odd so it is coprime with the power-of-two mBits and
    // the k probe positions stay distinct
    val h2 = pmod(xxhash64(key, lit(0x9e3779b97f4a7c15L)), lit(mBits.toLong))
      .bitwiseOR(lit(1L))
    array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)
      .as("pos")
  }

  /** The files of `index` (a [[bloomIndex]] result) that may contain ANY of
    * `keys` — every file actually containing one is included (no false
    * negatives: its build pass set exactly these bits), plus a false
    * positive sliver bounded by the (1-e^(-kn/m))^k budget the caller
    * sized. The probe evaluates the SAME hash expressions as the build on
    * a keys-sized literal frame, then tests the index rows; both frames
    * are metadata-scale (planner-side collect, like [[filesForBox]]).
    */
  def bloomFilesFor(spark: SparkSession, index: DataFrame, keys: Seq[Long],
                    mBits: Int, k: Int): Seq[String] = {
    import spark.implicits._
    require(keys.nonEmpty, "bloom probe needs at least one key")
    // one tiny job computes every key's (word, needed-bits) set; the file
    // test is per key — a file qualifies when ALL of some key's words
    // cover that key's bits (OR-merging different keys' masks into one
    // requirement would demand bits no single key sets and miss files)
    val probes = keys.toDF("key")
      .select(col("key"), bloomPositions(col("key"), mBits, k))
      .select(col("key"), explode(col("pos")).as("p"))
      .select(col("key"), (col("p") / 64).cast("int").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").as("mask"))
      .groupBy(col("key"), col("w")).agg(expr("bit_or(mask)").as("need"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values.toSeq
    val perKey = probes.map(_.map { case (_, w, need) =>
      element_at(col("bloom"), lit(w)).bitwiseAND(lit(need)) === lit(need)
    }.reduce(_ && _))
    index.filter(perKey.reduce(_ || _)).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** The bloom-indexed point-lookup read, end to end: scan ONLY the
    * candidate files for `keys`. Hardened for the absent-key case — when
    * the index proves no file can hold any key, `spark.read.parquet`
    * cannot take an empty path list, so the scan degrades to an empty
    * frame with the TABLE's schema (a lookup for a key that never
    * existed must return zero rows, not crash the planner).
    */
  def bloomScan(spark: SparkSession, dir: String, index: DataFrame,
                keys: Seq[Long], mBits: Int, k: Int): DataFrame = {
    val files = bloomFilesFor(spark, index, keys, mBits, k)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(dir).schema)
    else spark.read.parquet(files: _*)
  }

  /** Compact a parquet directory of many small files into
    * ceil(totalBytes / targetBytes) files at `dstDir`. Uses `coalesce`
    * (narrow — each output task concatenates input splits, no shuffle):
    * compaction is an I/O rewrite and must not pay a network pass; callers
    * with pathological skew can repartition upstream. Returns the output
    * file count so callers can audit the rewrite.
    */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new Path(srcDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_"))
    // flat (unpartitioned) directories only: a partitioned table keeps its
    // data under subdirectories, which this sizing pass would miss — and
    // compacting one should preserve the partition layout, a different
    // operation (rewrite per partition dir)
    require(files.nonEmpty,
      s"$srcDir has no top-level data files — partitioned tables need per-partition compaction")
    val totalBytes = files.map(_.getLen).sum
    val sized = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    // the scan already packs small files into splits (maxPartitionBytes /
    // openCostInBytes), so it may surface FEWER partitions than the size
    // target asks for — coalesce can only merge, never split, so the real
    // output count is the smaller of the two
    val nFiles = math.min(sized, df.rdd.getNumPartitions).max(1)
    df.coalesce(nFiles).write.mode("overwrite").parquet(dstDir)
    nFiles
  }

  /** Leaf partition directories of a Hive-layout table under `dir` — every
    * directory whose immediate children include a data file — as paths
    * RELATIVE to `dir` ("o_year=1997", "k1=a/k2=b"). Metadata-only listing,
    * same scale class as a manifest planner's file list.
    */
  def leafPartitionDirs(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filterNot(_.getPath.getName.startsWith("_"))
      val here = if (kids.exists(s => s.isFile &&
        !s.getPath.getName.startsWith("."))) Seq(p) else Nil
      here ++ kids.filter(_.isDirectory).flatMap(s => walk(s.getPath))
    }
    val rootUri = root.toUri.getPath.stripSuffix("/")
    walk(root).filter(_ != root)
      .map(_.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"))
  }

  /** [[compact]] for a directory-partitioned (Hive-layout) table: each leaf
    * partition directory is rewritten INDEPENDENTLY into size-targeted
    * files under the same relative path at `dstDir`, so the partition
    * layout — and with it planning-time partition pruning — survives the
    * rewrite untouched. This is the operation an ingest pipeline runs
    * daily: streaming/batch writers leave one small file per trigger per
    * partition, and compaction folds each partition back to
    * ceil(bytes/targetBytes) files without ever shuffling (per-partition
    * narrow coalesce, same rationale as [[compact]]) and without coupling
    * partitions to each other — at 100 TB the rewrites are independent
    * jobs a scheduler can run in parallel and retry per-partition.
    * Returns (relative partition dir -> output file count).
    */
  def compactPartitioned(spark: SparkSession, srcDir: String, dstDir: String,
                         targetBytes: Long): Map[String, Int] = {
    val parts = leafPartitionDirs(spark, srcDir)
    require(parts.nonEmpty,
      s"$srcDir has no partition subdirectories — flat tables go through compact()")
    // driver-side parallelism across partition rewrites: each is a small
    // independent Spark job; submitting them concurrently keeps the
    // cluster busy when individual partitions are thin
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, parts.size))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = parts.map { rel =>
        scala.concurrent.Future(rel ->
          compact(spark, s"$srcDir/$rel", s"$dstDir/$rel", targetBytes))
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
  }
}
