package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table atomic publish over [[Snapshots]] tables — the
  * catalog-level commit every multi-table lake needs once two artifacts
  * must stay mutually consistent (q96's stats table and its HLL register
  * table: a reader must never pair new stats with old registers).
  *
  * Mechanism: each member table commits normally ([[Snapshots.commit]] —
  * durable, but NOT yet visible through the catalog), then ONE catalog
  * manifest pinning (table → version) for every member is published with
  * the same exclusive-publish primitive Snapshots uses (hard link /
  * rename-without-replace). The catalog publish is the single commit
  * point: a reader that resolves versions from one catalog manifest sees
  * either every table's pre-commit pin or every table's post-commit pin,
  * never a mix. A writer crash between a member commit and the catalog
  * publish leaves orphaned table versions — durable, referenced by no
  * catalog manifest, invisible to catalog-resolved readers (the same
  * failure shape as Snapshots' orphaned batch dirs).
  *
  * Layout under `catDir`:
  * {{{
  *   _txmanifests/00001.manifest   one `<version>\t<tableDir>` line per
  *                                 pinned table — a full pin SET per
  *                                 catalog version (snapshot, not delta)
  * }}}
  *
  * Unlisted tables carry their previous pin forward, so independent
  * single-table transactions compose. Concurrent committers race on the
  * catalog version exactly like Snapshots committers race on a table
  * version; the loser re-merges over the new tip taking the MAX version
  * per table — correct for the append-only artifact tables this catalog
  * exists for (append manifests are supersets, so the max pin contains
  * both writers' rows). Tables maintained by commitReplace want ONE
  * catalog writer — that remains the stated contract. What the r15
  * guard proves (scoped precisely, r16 advice): a CONCURRENT INTERLEAVE
  * fails loudly — a contended merge verifies the superset property per
  * differing pin and aborts when a replace commit sits between the two
  * writers' version reads (see [[commitAllWrites]]). It does NOT
  * validate read sets, so two replace writers whose transactions
  * serialize cleanly (the second publishes after the first completes,
  * computed from a stale read) commit without complaint — a serialized
  * lost update is out of the guard's scope, which is why the one-writer
  * contract stands for replace-maintained tables.
  */
object TxCatalog {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(catDir: String) = new Path(catDir, "_txmanifests")

  private def manifestPath(catDir: String, v: Int) =
    new Path(manifestDir(catDir), f"$v%05d.manifest")

  /** Committed catalog versions, ascending (empty for a fresh catalog). */
  def versions(spark: SparkSession, catDir: String): Seq[Int] = {
    val f = fs(spark, catDir)
    val md = manifestDir(catDir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toInt).sorted.toSeq
  }

  /** The (tableDir → pinned version) map catalog version `v` published. */
  def pins(spark: SparkSession, catDir: String, v: Int): Map[String, Int] = {
    require(versions(spark, catDir).contains(v),
      s"catalog version $v not committed at $catDir")
    readPins(spark, catDir, v)
  }

  /** [[pins]] without the existence re-listing — for internal callers
    * that already hold a version number from a directory listing
    * (manifest files are immutable, so a listed version always reads).
    */
  private def readPins(spark: SparkSession, catDir: String, v: Int)
      : Map[String, Int] = {
    val f = fs(spark, catDir)
    val in = f.open(manifestPath(catDir, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { line =>
        val Array(ver, dir) = line.split("\t", 2)
        dir -> ver.toInt
      }.toMap
    finally in.close()
  }

  /** The newest catalog version's pin set (empty for a fresh catalog). */
  def latestPins(spark: SparkSession, catDir: String): Map[String, Int] =
    versions(spark, catDir).lastOption
      .map(readPins(spark, catDir, _)).getOrElse(Map.empty)

  /** One member write of a catalog transaction: `replace = true` commits
    * via [[Snapshots.commitReplace]] (the maintained-view shape — q103's
    * refresh); default is the append commit.
    */
  final case class TxWrite(tableDir: String, df: DataFrame,
                           replace: Boolean = false)

  /** Commit every (tableDir, df) APPEND write and publish ONE catalog
    * version pinning all of them — see [[commitAllWrites]].
    */
  def commitAll(spark: SparkSession, catDir: String,
                writes: Seq[(String, DataFrame)],
                beforePublish: Int => Unit = _ => ()): Int =
    commitAllWrites(spark, catDir,
      writes.map { case (t, df) => TxWrite(t, df) }, beforePublish)

  /** Commit every member write and publish ONE catalog version pinning
    * all of them — the atomic multi-table commit. Member tables commit
    * first (durable, catalog-invisible); `beforePublish(v)` is the test
    * seam between those commits and the catalog publish attempt at `v`
    * (a reader inside the hook must still see the OLD consistent pin
    * set). `backend` is the exclusive-publish seam threaded to BOTH the
    * member commits and the catalog publish ([[Snapshots.FsBackend]]
    * default; an object store passes its conditional-put
    * implementation — the protocol is unchanged). Returns the catalog
    * version.
    *
    * Concurrency contract (r15): when the publish runs into a CONCURRENT
    * transaction — we lost a publish race, or the tip already pins a
    * NEWER version of one of our member tables — the per-table max-merge
    * is only sound if every table whose pins differ is MONOTONE between
    * the two pins (the higher version's manifest contains the lower's
    * entries: true for append/delete commits, false across a
    * commitReplace). A replace rewrites the visible set, so the
    * surviving max pin would silently drop the other writer's rows and
    * the published set would mix transactions — exactly the inconsistent
    * pair this catalog exists to prevent. The guard checks the superset
    * property directly (two manifest reads per differing table, only on
    * the contended path) and fails loudly: replace-maintained member
    * tables want ONE catalog writer.
    */
  def commitAllWrites(spark: SparkSession, catDir: String,
                      writes: Seq[TxWrite],
                      beforePublish: Int => Unit = _ => (),
                      backend: Snapshots.PublishBackend = Snapshots.FsBackend)
      : Int = {
    require(writes.nonEmpty, "commitAll needs at least one table write")
    require(writes.map(_.tableDir).distinct.size == writes.size,
      "one write per table per transaction")
    val newPins = writes.map { w =>
      w.tableDir -> Snapshots.commitWithHook(spark, w.tableDir, w.df,
        replace = w.replace, _ => (), backend = backend)
    }.toMap
    val f = fs(spark, catDir)
    f.mkdirs(manifestDir(catDir))
    val uid = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    var attempt = 0
    var contended = false
    while (attempt < 50) {
      attempt += 1
      // ONE directory listing per attempt: both the previous pin set and
      // the next version derive from the same tip (manifest files are
      // immutable, so reading the listed tip is race-free). Listing
      // twice — prev from one listing, v from a later one — opened a
      // lost-update window where a commit landing in between was merged
      // OVER instead of max-merged (and it doubled the LIST round trips
      // an object store pays per attempt).
      val tip = versions(spark, catDir).lastOption
      val prev = tip.map(readPins(spark, catDir, _)).getOrElse(Map.empty)
      val v = tip.getOrElse(0) + 1
      beforePublish(v)
      // the guard below is necessarily one-sided (it sees only the
      // CATALOG tip), so close the other side here: if another writer
      // has advanced one of OUR replace-maintained member tables past
      // the version we committed, two writers are demonstrably live on
      // a replace table RIGHT NOW — publishing our (stale) pin would
      // expose a version set no single writer produced, and for
      // multi-table transactions it can surface half of the OTHER
      // transaction (its append-table rows ride any later superset pin
      // while its replace commit stays invisible). Fail before
      // publishing; append-only members never take this check.
      writes.filter(_.replace).foreach { w =>
        val tableTip = Snapshots.versions(spark, w.tableDir)
          .lastOption.getOrElse(0)
        if (tableTip > newPins(w.tableDir))
          throw new IllegalStateException(
            s"concurrent writer advanced replace-maintained table " +
              s"${w.tableDir} past this transaction's commit (tip " +
              s"$tableTip > pinned ${newPins(w.tableDir)}); replace-" +
              "maintained tables want one catalog writer")
      }
      // a tip already pinning PAST one of our fresh member commits means
      // another transaction committed after us — same contention as a
      // lost publish race, detectable before wasting the publish attempt
      contended ||= newPins.exists { case (t, nv) => prev.getOrElse(t, 0) > nv }
      if (contended) {
        (prev.keySet ++ newPins.keySet).foreach { t =>
          val (a, b) = (prev.getOrElse(t, 0), newPins.getOrElse(t, 0))
          if (a > 0 && b > 0 && a != b) {
            val lo = Snapshots.manifestEntries(spark, t, math.min(a, b)).toSet
            val hi = Snapshots.manifestEntries(spark, t, math.max(a, b)).toSet
            if (!lo.subsetOf(hi))
              throw new IllegalStateException(
                s"concurrent catalog transactions over replace-maintained " +
                  s"table $t: version ${math.max(a, b)} does not contain " +
                  s"${math.min(a, b)}'s visible set, so a max-merge would " +
                  "publish a pin set mixing transactions; replace-" +
                  "maintained tables want one catalog writer")
          }
        }
      }
      // carry unlisted tables forward; on a lost race, max-merge per
      // table (append-only manifests are supersets — verified above on
      // the contended path)
      val merged = (prev.keySet ++ newPins.keySet).map { t =>
        t -> math.max(prev.getOrElse(t, 0), newPins.getOrElse(t, 0))
      }.toSeq.sortBy(_._1)
      val tmp = new Path(manifestDir(catDir), s".$uid-$v.manifest.tmp")
      val out = f.create(tmp, true)
      try out.write(merged.map { case (t, ver) => s"$ver\t$t" }
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      if (backend.publishExclusive(f, tmp, manifestPath(catDir, v))) return v
      f.delete(tmp, false)
      contended = true
    }
    throw new IllegalStateException(
      s"catalog commit to $catDir still losing the publish race after $attempt attempts")
  }

  /** Read `tableDir` AT THE CATALOG'S PIN — never the table's own latest,
    * which may already contain a half-published transaction's member
    * commit. Resolving every table of a transaction from the same catalog
    * version is what makes the reader's view consistent.
    */
  def readTable(spark: SparkSession, catDir: String,
                tableDir: String): DataFrame = {
    val p = latestPins(spark, catDir)
    require(p.contains(tableDir),
      s"$tableDir is not pinned by any catalog version at $catDir")
    Snapshots.readAsOf(spark, tableDir, p(tableDir))
  }

  /** Every pinned table resolved from ONE catalog version — the
    * consistent multi-table snapshot a cross-table reader should hold for
    * its whole query instead of calling [[readTable]] per table (which
    * would re-resolve the catalog and could straddle a commit).
    */
  def snapshot(spark: SparkSession, catDir: String)
      : Map[String, DataFrame] =
    latestPins(spark, catDir).map { case (t, v) =>
      t -> Snapshots.readAsOf(spark, t, v)
    }

  /** Catalog-level TIME TRAVEL: every table resolved at catalog version
    * `v`'s pins — the CONSISTENT historical multi-table view ("the exact
    * stats+registers pair run N read"), which per-table
    * [[Snapshots.readAsOf]] alone cannot give you: table versions move
    * independently, and only a catalog manifest records which
    * combination was ever visible together. Works as long as the pinned
    * table versions haven't been [[Snapshots.expire]]d.
    */
  def snapshotAsOf(spark: SparkSession, catDir: String, v: Int)
      : Map[String, DataFrame] =
    pins(spark, catDir, v).map { case (t, ver) =>
      t -> Snapshots.readAsOf(spark, t, ver)
    }
}
