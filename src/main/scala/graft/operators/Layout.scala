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
