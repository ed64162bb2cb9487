package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Harness wiring for scratch storage — the ONE place a local-tmpdir
  * fallback is allowed to live.
  *
  * Operators and registered queries that need a writable directory
  * (binary-file sinks, append round-trips) must take it as a parameter and
  * resolve it through here, never `java.io.tmpdir` directly: on a real
  * cluster executors don't share the driver's tmp, so anything written
  * there is invisible to the next stage. Resolution order:
  *
  *   1. `spark.graft.scratch.dir` (session conf — a deployment sets this to
  *      shared storage: `hdfs://…`, `s3a://…`, a mounted NFS path);
  *   2. `SPARK_GRAFT_SCRATCH_DIR` (env — same, for un-conf'd harnesses);
  *   3. `java.io.tmpdir` — correct ONLY single-host (local[*] test runs).
  *
  * All paths go through the Hadoop `FileSystem` API, so whatever the root
  * resolves to — object store, HDFS, local disk — create/delete/list behave
  * identically.
  */
object Scratch {

  /** The configured scratch root (see resolution order above). */
  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratch.dir")
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH_DIR"))
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** An empty, freshly-created directory `<root>/graft_<name>` — cleared on
    * every call so append-mode round-trips start from a clean slate across
    * verify re-runs.
    */
  def fresh(spark: SparkSession, name: String): String = {
    val p = new Path(root(spark), s"graft_$name")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    p.toString
  }
}
