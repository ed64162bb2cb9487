package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of a `localCheckpoint()`'d Dataset's block-manager
  * storage. `Dataset.unpersist` cannot do this — a local checkpoint is not
  * a CacheManager entry but persisted blocks behind the plan's
  * [[LogicalRDD]] leaf (sql-private, hence this shim in the sql package
  * namespace, the ColumnBridge pattern). Without an explicit release the
  * superseded rounds of an iterative algorithm stay pinned until JVM GC
  * lets ContextCleaner find them — O(log n) full edge sets of avoidable
  * memory pressure on large graphs.
  *
  * DANGER: a localCheckpoint truncates lineage, so a released Dataset is
  * UNRECOVERABLE — callers must only release frames no surviving plan
  * references (see Dedup.starContractClusters: a round's inputs are
  * released only after the next round's checkpoint is materialized and
  * that round's convergence certificate has run).
  */
object CheckpointBridge {
  /** Releases ONLY a bare checkpoint result — a Dataset whose whole
    * analyzed plan is the single [[LogicalRDD]] a `localCheckpoint()`
    * call returned. A composite plan is a silent no-op by design:
    * walking into it would also unpersist OTHER live checkpoints it
    * references (e.g. an iterative loop's shared edge set — the exact
    * failure a first cut of this helper produced when handed a lazy
    * chain instead of the chain's checkpoint).
    */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
