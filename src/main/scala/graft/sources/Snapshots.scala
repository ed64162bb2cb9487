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
  *   batch-00001/  (parquet)      immutable data, one dir per commit
  *   _manifests/00001.manifest    newline-separated data dirs visible at v1
  * }}}
  *
  * Each manifest lists the FULL set of data directories visible at that
  * version (a snapshot, not a delta), so `readAsOf(v)` is one manifest
  * read + one multi-path parquet scan — no log replay. Publication is
  * write-temp-then-rename: rename is atomic on HDFS/POSIX, so a reader
  * never observes a half-written manifest, and a writer crash before the
  * rename leaves only an orphaned (invisible) batch dir. Object stores
  * without atomic rename want a conditional-put here — same protocol,
  * different primitive. Readers pick the max manifest; data files are
  * never rewritten, so every historical version stays readable until a
  * retention job prunes it.
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(tableDir: String) = new Path(tableDir, "_manifests")

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
    * Returns the committed version number.
    */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame): Int = {
    val f = fs(spark, tableDir)
    val prev = versions(spark, tableDir)
    val v = prev.lastOption.getOrElse(0) + 1
    val batch = new Path(tableDir, f"batch-$v%05d")
    df.write.mode("overwrite").parquet(batch.toString)
    val visible = (prev.lastOption.map(readManifest(spark, tableDir, _))
      .getOrElse(Seq.empty) :+ batch.toString)
    val md = manifestDir(tableDir)
    f.mkdirs(md)
    val tmp = new Path(md, f".$v%05d.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write((visible.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(md, f"$v%05d.manifest")))
      throw new IllegalStateException(
        s"concurrent commit of version $v to $tableDir lost the publish race")
    v
  }

  private def readManifest(spark: SparkSession, tableDir: String, v: Int): Seq[String] = {
    val f = fs(spark, tableDir)
    val p = new Path(manifestDir(tableDir), f"$v%05d.manifest")
    val in = f.open(p)
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
}
