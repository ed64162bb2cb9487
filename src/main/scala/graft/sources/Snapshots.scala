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
  *   _manifests/00001.manifest    newline-separated entries visible at v1:
  *                                data dirs, plus `delete:`-prefixed
  *                                equality-delete dirs ([[delete]])
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

  /** The exclusive-publish seam (r15): HOW a manifest name is claimed is
    * the one storage-dependent step of the whole commit protocol.
    * HDFS-like stores get it from rename-fails-on-existing, the local
    * filesystem from `link(2)` (see [[FsBackend]]); an S3-style object
    * store implements the SAME protocol with a conditional put
    * (`If-None-Match: *`) — everything else (staged immutable batch
    * dirs, loser-retries-at-next-version, max-merge in TxCatalog) is
    * backend-agnostic. Implementations must atomically publish `tmp`'s
    * bytes at `dst` iff `dst` does not exist, returning whether this
    * writer won; `tmp` may be consumed on success and must be left for
    * the caller to delete on failure.
    */
  trait PublishBackend {
    def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
                         tmp: Path, dst: Path): Boolean
  }

  /** The filesystem backend: rename-without-replace on HDFS-like
    * schemes, hard link on the local filesystem (POSIX rename silently
    * replaces, `link(2)` refuses atomically with EEXIST).
    */
  object FsBackend extends PublishBackend {
    override def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
                                  tmp: Path, dst: Path): Boolean =
      Snapshots.publishExclusive(f, tmp, dst)
  }

  /** A manifest line: a data batch dir, or (prefixed `delete:`) an
    * equality-delete batch dir whose parquet rows are the KEY TUPLES of
    * deleted rows. Delete entries mask only data entries listed BEFORE
    * them in the manifest (commit order = manifest order), which is the
    * sequence-number rule every merge-on-read format uses: a key deleted
    * at version N and re-appended at N+1 is visible again.
    */
  private[graft] final case class Entry(dir: String, isDelete: Boolean) {
    def line: String = if (isDelete) s"delete:$dir" else dir
  }

  private[graft] def parseEntry(line: String): Entry =
    if (line.startsWith("delete:")) Entry(line.stripPrefix("delete:"), isDelete = true)
    else Entry(line, isDelete = false)

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

  /** Merge-on-read row-level DELETE: rows of the current view matching
    * `predicate` die, WITHOUT rewriting any data file. What gets written is
    * one equality-delete batch — the distinct `keyCols` tuples of the
    * matched rows — and a manifest where that entry masks every earlier
    * data entry (reads apply one anti-join; see [[Entry]] for the ordering
    * rule). At 100 TB this is the difference between deleting a user's
    * documents in seconds (key scan + small sidecar write) and rewriting
    * the corpus; the debt is paid once, by the next [[compactLatest]],
    * which folds the masks into data and drops the delete entries.
    * `keyCols` must identify rows (the table's natural key): masking is by
    * key equality, so a non-key column would over-delete. Key equality is
    * NULL-SAFE (`<=>` in [[readAsOf]]), so rows whose key columns hold
    * NULL are deletable like any others — a plain equi-join would skip
    * them silently. Returns the new version.
    */
  def delete(spark: SparkSession, tableDir: String,
             predicate: org.apache.spark.sql.Column,
             keyCols: Seq[String]): Int = {
    require(keyCols.nonEmpty, "equality delete needs at least one key column")
    val keys = readLatest(spark, tableDir).filter(predicate)
      .select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    commitWithHook(spark, tableDir, keys, replace = false, _ => (),
      isDelete = true)
  }

  /** MERGE INTO, merge-on-read: every row of `df` lands as the table's
    * new truth for its `keyCols` tuple — updates mask the old row,
    * inserts just append — in ONE atomic version: the commit stages an
    * equality-delete sidecar (df's key tuples) plus df itself and
    * publishes a single manifest listing the mask BEFORE the data (so it
    * masks only pre-existing batches — [[Entry]]'s sequence rule). No
    * data file is rewritten; readers before the publish see none of it,
    * readers after see all of it. At 100 TB this is the upsert a CDC
    * ingest applies every few minutes, deferring the rewrite to
    * [[compactLatest]]. Returns the new version.
    */
  def upsert(spark: SparkSession, tableDir: String, df: DataFrame,
             keyCols: Seq[String]): Int = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val keys = df.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
      .distinct()
    commitEntries(spark, tableDir, Seq(keys -> true, df -> false),
      replace = false, _ => ())
  }

  /** `beforePublish(v)` runs between version selection and the exclusive
    * publish attempt at `v` — test seam for forcing the publish race
    * deterministically (a competing commit inside the hook makes THIS
    * writer the loser on its first attempt).
    */
  private[graft] def commitWithHook(spark: SparkSession, tableDir: String,
                                    df: DataFrame, replace: Boolean,
                                    beforePublish: Int => Unit,
                                    isDelete: Boolean = false,
                                    backend: PublishBackend = FsBackend): Int =
    commitEntries(spark, tableDir, Seq(df -> isDelete), replace,
      beforePublish, backend)

  /** The staged-commit core: write every (frame, isDelete) batch under its
    * own writer-scoped dir, then publish ONE manifest appending their
    * entries in the given order (order is semantics: a delete entry masks
    * only entries before it). Multi-entry commits are what makes
    * [[upsert]] atomic — the mask and the new rows become visible in the
    * same version or not at all.
    */
  private def commitEntries(spark: SparkSession, tableDir: String,
                            batches: Seq[(DataFrame, Boolean)],
                            replace: Boolean,
                            beforePublish: Int => Unit,
                            backend: PublishBackend = FsBackend): Int = {
    val f = fs(spark, tableDir)
    // schema enforcement (the Delta default): an append whose DATA schema
    // drifts from the table's poisons every multi-path read after it —
    // fail the commit, not the eventual reader. Intentional evolution is
    // a commitReplace (rewrite the visible set under the new schema).
    // Name-based equality: nullability and metadata don't gate.
    if (!replace) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(fd => (fd.name, fd.dataType)).toSeq
      versions(spark, tableDir).lastOption.foreach { v =>
        val cur = readAsOf(spark, tableDir, v).schema
        batches.filterNot(_._2).map(_._1.schema).foreach { b =>
          require(shape(b) == shape(cur),
            s"schema drift rejected: table $tableDir has ${cur.simpleString}, " +
              s"batch has ${b.simpleString}; evolve via commitReplace")
        }
      }
    }
    // stage once, under names no other writer can pick
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val entries = batches.zipWithIndex.map { case ((df, isDelete), i) =>
      val batch = new Path(tableDir, s"batch-$uid-$i")
      df.write.mode("errorifexists").parquet(batch.toString)
      Entry(batch.toString, isDelete).line
    }
    val md = manifestDir(tableDir)
    f.mkdirs(md)
    var attempt = 0
    while (attempt < 50) {
      attempt += 1
      val prev = versions(spark, tableDir)
      val v = prev.lastOption.getOrElse(0) + 1
      beforePublish(v)
      val visible =
        if (replace) entries
        else prev.lastOption.map(readManifest(spark, tableDir, _))
          .getOrElse(Seq.empty) ++ entries
      val tmp = new Path(md, s".$uid-$v.manifest.tmp")
      val out = f.create(tmp, true)
      try out.write((visible.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      if (backend.publishExclusive(f, tmp, manifestPath(tableDir, v))) return v
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
  private[sources] def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
                                        tmp: Path, dst: Path): Boolean =
    if (f.getScheme == "file") {
      val t = java.nio.file.Paths.get(tmp.toUri.getPath)
      val d = java.nio.file.Paths.get(dst.toUri.getPath)
      try { java.nio.file.Files.createLink(d, t); f.delete(tmp, false); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else !f.exists(dst) && f.rename(tmp, dst)

  /** The raw manifest lines of version `v` — entry identity, exposed to
    * [[TxCatalog]] so its max-merge can verify the monotonicity (entry
    * superset) its pin arithmetic relies on.
    */
  private[sources] def manifestEntries(spark: SparkSession, tableDir: String,
                                       v: Int): Seq[String] =
    readManifest(spark, tableDir, v)

  private def readManifest(spark: SparkSession, tableDir: String, v: Int): Seq[String] = {
    val f = fs(spark, tableDir)
    val in = f.open(manifestPath(tableDir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** The table exactly as version `v` published it. A manifest with no
    * delete entries (every append-only table) plans as ONE multi-path
    * parquet scan. Delete entries fold in manifest order — data dirs
    * between deletes batch into one scan, each delete anti-joins what
    * accumulated before it — so plan size is linear in manifest entries
    * and the key sets are small sidecars (AQE broadcasts the anti-join
    * build side); [[compactLatest]] resets both.
    */
  def readAsOf(spark: SparkSession, tableDir: String, v: Int): DataFrame = {
    require(versions(spark, tableDir).contains(v),
      s"version $v not committed at $tableDir")
    val ents = readManifest(spark, tableDir, v).map(parseEntry)
    if (!ents.exists(_.isDelete))
      return spark.read.parquet(ents.map(_.dir): _*)
    var acc: Option[DataFrame] = None
    var pending = List.empty[String]
    def flush(): Unit = if (pending.nonEmpty) {
      val scan = spark.read.parquet(pending.reverse: _*)
      acc = Some(acc.map(_.unionByName(scan)).getOrElse(scan))
      pending = Nil
    }
    ents.foreach {
      case Entry(d, false) => pending ::= d
      case Entry(d, true) =>
        flush()
        val base = acc.getOrElse(throw new IllegalStateException(
          s"manifest $v at $tableDir lists a delete before any data"))
        val keys = spark.read.parquet(d)
        // null-safe equality (<=>), not a plain equi-anti-join: with `=`,
        // a data row carrying a NULL key column can NEVER match a delete
        // tuple (NULL = x is NULL), so a GDPR-style delete would silently
        // skip it forever, and a NULL key tuple in the sidecar would mask
        // nothing. <=> treats NULL as a value, so NULL-keyed rows delete
        // and upsert exactly like any other key. Still an equi-join to
        // the planner (EqualNullSafe is an extractable join key), so the
        // small sidecar side broadcasts as before.
        val cond = keys.columns.map(c => base(c) <=> keys(c)).reduce(_ && _)
        acc = Some(base.join(keys, cond, "left_anti"))
    }
    flush()
    acc.get
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
    val added = to.filterNot(from).map(parseEntry)
    require(!added.exists(_.isDelete),
      s"a row-level delete sits between $fromV and $toV — appended dirs no " +
        "longer tell the whole row-set story; use readChangeEvents (or " +
        "re-baseline past the delete)")
    require(added.nonEmpty, s"no batches added between $fromV and $toV")
    spark.read.parquet(added.map(_.dir): _*)
  }

  /** The full change FEED between two versions — what a CDC consumer
    * applies, delete events included (the case [[readChanges]] refuses):
    * one row per inserted row (`_op = 'insert'`, all columns) and one per
    * deleted key tuple (`_op = 'delete'`, key columns set, data columns
    * null), with `_ord` the manifest position so replaying events in
    * `_ord` order reproduces the version transition exactly (an upsert
    * arrives as its delete mask then its rows — an UPDATE, in order).
    * Still O(changed data): only the ADDED batch dirs are read.
    */
  def readChangeEvents(spark: SparkSession, tableDir: String,
                       fromV: Int, toV: Int): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.contains(fromV) && vs.contains(toV) && fromV < toV,
      s"need committed versions fromV < toV, got $fromV -> $toV in $vs")
    val from = readManifest(spark, tableDir, fromV).toSet
    val to = readManifest(spark, tableDir, toV)
    require(from.subsetOf(to.toSet),
      s"version $fromV is not a subset of $toV — a replace/compaction " +
        "rewrite sits between them; re-baseline on the rewritten version")
    val added = to.filterNot(from).map(parseEntry)
    require(added.nonEmpty, s"no batches added between $fromV and $toV")
    added.zipWithIndex.map { case (e, i) =>
      spark.read.parquet(e.dir)
        .withColumn("_op", org.apache.spark.sql.functions.lit(
          if (e.isDelete) "delete" else "insert"))
        .withColumn("_ord", org.apache.spark.sql.functions.lit(i))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
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
    val keptDirs = keep.flatMap(readManifest(spark, tableDir, _))
      .map(parseEntry(_).dir).toSet
    val droppedDirs = drop.flatMap(readManifest(spark, tableDir, _))
      .map(parseEntry(_).dir).toSet
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
    val latest = versions(spark, tableDir).last
    val ents = readManifest(spark, tableDir, latest).map(parseEntry)
    val dataDirs = ents.filterNot(_.isDelete).map(_.dir)
    val bytes = dataDirs.map(d => f.getContentSummary(new Path(d)).getLength).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (ents.exists(_.isDelete)) {
      // merge-on-read debt comes due here: apply the delete masks once
      // (the anti-join IS the rewrite's job) and publish a manifest with
      // no delete entries — readers go back to the one-scan plan
      val df = readAsOf(spark, tableDir, latest)
      commitReplace(spark, tableDir, df.coalesce(nFiles))
    } else {
      // narrow coalesce, same rationale as Layout.compact: a pure-layout
      // rewrite must not pay a shuffle
      val df = spark.read.parquet(dataDirs: _*)
      commitReplace(spark, tableDir,
        df.coalesce(math.min(nFiles, df.rdd.getNumPartitions).max(1)))
    }
  }

  /** [[compactLatest]] fused with z-order clustering
    * ([[graft.operators.Layout.zorderKey]]): ONE maintenance pass that
    * pays down merge-on-read delete debt AND rewrites the visible rows
    * along the (a, b) space-filling curve, so the compacted files carry
    * tight min/max stats on BOTH columns and a
    * [[graft.operators.Layout.statsIndex]] box predicate skips most of
    * them — running compaction and clustering as separate rewrites would
    * read and write the table twice for the same end state. Unlike
    * [[compactLatest]]'s narrow coalesce, clustering is inherently a
    * shuffle (repartitionByRange samples the key to build skew-balanced
    * range bounds — at 100 TB that sampling is what keeps file sizes even
    * under key skew); that is the price of tight stats, paid once per
    * maintenance cycle, not per query. The sort key is dropped before
    * publish: ordering is a file-layout property, not schema, so readers
    * and time travel see the exact pre-compaction schema and rows —
    * another atomic manifest swap.
    */
  def compactLatestZOrdered(spark: SparkSession, tableDir: String,
                            a: String, b: String, bits: Int,
                            nFiles: Int): Int = {
    import org.apache.spark.sql.functions.col
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val latest = versions(spark, tableDir).last
    val clustered = readAsOf(spark, tableDir, latest)
      .withColumn("__zkey",
        graft.operators.Layout.zorderKey(col(a), col(b), bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
    commitReplace(spark, tableDir, clustered)
  }
}
