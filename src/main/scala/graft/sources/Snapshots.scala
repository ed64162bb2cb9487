package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-snapshot table on plain parquet — the time-travel /
  * reproducibility contract a training-data pipeline needs ("the exact
  * corpus run N trained on"), built from the same two primitives every
  * table format (Iceberg, Delta) uses: immutable data files plus an
  * atomically-published manifest per version.
  *
  * Layout under `tableDir`:
  * {{{
  *   batch-ab12cd34/              immutable data, one uniquely-named dir
  *                                per commit ATTEMPT (writer-scoped, so
  *                                concurrent committers never touch each
  *                                other's files)
  *   _manifests/00001.manifest    newline-separated data dirs visible at v1
  * }}}
  *
  * Each manifest lists the FULL set of data directories visible at that
  * version (a snapshot, not a delta), so `readAsOf(v)` is one manifest
  * read + one multi-path parquet scan — no log replay.
  *
  * Concurrency protocol: data is staged under a dir named by a fresh
  * writer-scoped id (never by version — version is only assigned at
  * publish), then the manifest is published EXCLUSIVELY: on HDFS-like
  * stores `rename` fails when the destination exists, and on the local
  * filesystem (where POSIX rename silently overwrites) publication goes
  * through a hard link, which the kernel refuses atomically when the name
  * is taken. The publish loser deletes nothing, recomputes the visible set
  * against the NEW latest manifest, and retries at version v+1 — its
  * staged data dir is untouched throughout, so a loser can never clobber a
  * winner's already-published files. A writer crash before publish leaves
  * only an orphaned (invisible, never-referenced) batch dir. Object stores
  * without atomic rename/link want a conditional-put here — same protocol,
  * different primitive. Readers pick the max manifest; data files are
  * never rewritten, so every historical version stays readable until
  * [[expire]] prunes it.
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(tableDir: String) = new Path(tableDir, "_manifests")

  private def manifestPath(tableDir: String, v: Int) =
    new Path(manifestDir(tableDir), f"$v%05d.manifest")

  /** Committed versions, ascending (empty for a fresh/nonexistent table). */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] = {
    val f = fs(spark, tableDir)
    val md = manifestDir(tableDir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toInt).sorted.toSeq
  }

  /** Append `df` as a new immutable batch and publish the next version.
    * Returns the committed version number. Safe under concurrent
    * committers: see the protocol note in the object doc.
    */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame): Int =
    commitWithHook(spark, tableDir, df, replace = false, _ => ())

  /** Publish `df` as the next version REPLACING the whole visible set
    * (the compaction/rewrite commit: the new manifest lists only the new
    * batch, old batch dirs stay on disk for time travel until [[expire]]).
    */
  def commitReplace(spark: SparkSession, tableDir: String, df: DataFrame): Int =
    commitWithHook(spark, tableDir, df, replace = true, _ => ())

  /** `beforePublish(v)` runs between version selection and the exclusive
    * publish attempt at `v` — test seam for forcing the publish race
    * deterministically (a competing commit inside the hook makes THIS
    * writer the loser on its first attempt).
    */
  private[graft] def commitWithHook(spark: SparkSession, tableDir: String,
                                    df: DataFrame, replace: Boolean,
                                    beforePublish: Int => Unit): Int = {
    val f = fs(spark, tableDir)
    // stage once, under a name no other writer can pick
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val batch = new Path(tableDir, s"batch-$uid")
    df.write.mode("errorifexists").parquet(batch.toString)
    val md = manifestDir(tableDir)
    f.mkdirs(md)
    var attempt = 0
    while (attempt < 50) {
      attempt += 1
      val prev = versions(spark, tableDir)
      val v = prev.lastOption.getOrElse(0) + 1
      beforePublish(v)
      val visible =
        if (replace) Seq(batch.toString)
        else prev.lastOption.map(readManifest(spark, tableDir, _))
          .getOrElse(Seq.empty) :+ batch.toString
      val tmp = new Path(md, s".$uid-$v.manifest.tmp")
      val out = f.create(tmp, true)
      try out.write((visible.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      if (publishExclusive(f, tmp, manifestPath(tableDir, v))) return v
      // lost the race: someone else owns v now — drop only OUR tmp file
      // (the staged batch dir is untouched) and retry against the new tip
      f.delete(tmp, false)
    }
    throw new IllegalStateException(
      s"commit to $tableDir still losing the publish race after $attempt attempts")
  }

  /** Atomically publish `tmp` at `dst` iff `dst` does not exist yet.
    * HDFS-like filesystems get this from `rename` (fails on an existing
    * destination); the local filesystem does NOT (POSIX rename silently
    * replaces files), so there the claim is a hard link — `link(2)` is
    * atomic and fails with EEXIST when the name is taken.
    */
  private def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
                               tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      val t = java.nio.file.Paths.get(tmp.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      try { java.nio.file.Files.createLink(d, t); f.delete(tmp, false); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else !f.exists(dst) && f.rename(tmp, dst)

  private def readManifest(spark: SparkSession, tableDir: String, v: Int): Seq[String] = {
    val f = fs(spark, tableDir)
    val in = f.open(manifestPath(tableDir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The table exactly as version `v` published it. */
  def readAsOf(spark: SparkSession, tableDir: String, v: Int): DataFrame = {
    require(versions(spark, tableDir).contains(v),
      s"version $v not committed at $tableDir")
    spark.read.parquet(readManifest(spark, tableDir, v): _*)
  }

  /** The newest committed version's view. */
  def readLatest(spark: SparkSession, tableDir: String): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"no committed versions at $tableDir")
    readAsOf(spark, tableDir, vs.last)
  }

  /** The rows ADDED between `fromV` and `toV` — incremental consumption
    * ("train on what's new since version N") as a plain scan of the batch
    * dirs `toV`'s manifest lists beyond `fromV`'s: O(new data), no
    * anti-join against the old corpus, because append-only manifests are
    * strict supersets. Raises if `fromV`'s visible set is NOT a subset of
    * `toV`'s (a [[commitReplace]]/compaction rewrite sits between them —
    * dir identity no longer tracks row identity, so "changes" has no
    * scan-shaped answer; re-baseline on the rewritten version instead).
    */
  def readChanges(spark: SparkSession, tableDir: String,
                  fromV: Int, toV: Int): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.contains(fromV) && vs.contains(toV) && fromV < toV,
      s"need committed versions fromV < toV, got $fromV -> $toV in $vs")
    val from = readManifest(spark, tableDir, fromV).toSet
    val to = readManifest(spark, tableDir, toV)
    require(from.subsetOf(to.toSet),
      s"version $fromV is not a subset of $toV — a replace/compaction " +
        "rewrite sits between them; re-baseline on the rewritten version")
    val added = to.filterNot(from)
    require(added.nonEmpty, s"no batches added between $fromV and $toV")
    spark.read.parquet(added: _*)
  }

  /** Retention: drop every version but the newest `keepLast`, then delete
    * the batch dirs no surviving manifest references. Returns the expired
    * version numbers.
    *
    * Ordering is the crash-safe direction: manifests are deleted FIRST
    * (after which `readAsOf` on an expired version raises at the
    * `versions` check — no reader can plan a scan over dirs about to
    * vanish), data dirs second. A crash in between leaves unreferenced
    * dirs behind — garbage, invisible, reclaimed by the next `expire`
    * sweep over still-expired manifests, never corruption. Note that for
    * a purely append-only history every old batch is still referenced by
    * the latest manifest, so expire only trims the time-travel horizon;
    * data space comes back once a [[commitReplace]] (compaction) has
    * rewritten the visible set.
    */
  def expire(spark: SparkSession, tableDir: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, tableDir)
    val vs = versions(spark, tableDir)
    val drop = vs.dropRight(keepLast)
    if (drop.isEmpty) return Seq.empty
    val keep = vs.takeRight(keepLast)
    val keptDirs = keep.flatMap(readManifest(spark, tableDir, _)).toSet
    val droppedDirs = drop.flatMap(readManifest(spark, tableDir, _)).toSet
    drop.foreach(v => f.delete(manifestPath(tableDir, v), false))
    (droppedDirs -- keptDirs).foreach(d => f.delete(new Path(d), true))
    drop
  }

  /** Compact the latest version's visible set into size-targeted files and
    * publish the rewrite as a new version ([[commitReplace]] — old versions
    * stay time-travelable until [[expire]]). This is the lake-maintenance
    * loop closed: streaming/batch ingest appends one small batch dir per
    * commit, compaction folds them into ceil(bytes/targetBytes) files, and
    * the swap is just another atomic manifest publish — readers never see
    * a half-compacted table. Returns the new version.
    */
  def compactLatest(spark: SparkSession, tableDir: String,
                    targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val f = fs(spark, tableDir)
    val dirs = readManifest(spark, tableDir, versions(spark, tableDir).last)
    val bytes = dirs.map(d => f.getContentSummary(new Path(d)).getLength).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // narrow coalesce, same rationale as Layout.compact: compaction is an
    // I/O rewrite, it must not pay a shuffle
    val df = spark.read.parquet(dirs: _*)
    commitReplace(spark, tableDir,
      df.coalesce(math.min(nFiles, df.rdd.getNumPartitions).max(1)))
  }
}
