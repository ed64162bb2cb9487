package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.sources.{Scratch, Snapshots}

/** Round-8 properties the hash oracles can't see: the snapshot publish
  * race resolves without clobbering, retention actually reclaims space
  * (once compaction has rewritten the visible set), and partition-aware
  * compaction shrinks per-partition file counts while keeping the layout
  * (and its planning-time pruning) intact.
  */
class Round8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def t(name: String) = graft.sources.Tables.load(spark, dir, name)

  private def dataFiles(d: String): Seq[String] = {
    val p = new Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith(".")).map(_.getPath.getName).toSeq
  }

  private def subdirs(d: String): Seq[String] = {
    val p = new Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  test("snapshot publish race: loser retries at the next version and clobbers nothing") {
    val tbl = Scratch.fresh(spark, "spec_snap_race")
    val a = (1L to 5L).toDF("id")
    val b = (11L to 13L).toDF("id")
    val raced = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the hook fires between version selection and the exclusive publish:
    // a competing commit lands version 1 first, making THIS writer the
    // deterministic loser on its first attempt
    val v = Snapshots.commitWithHook(spark, tbl, a, replace = false,
      _ => if (raced.compareAndSet(false, true)) { Snapshots.commit(spark, tbl, b): Unit })
    assert(v == 2, "loser must retry and land at the next version")
    assert(Snapshots.versions(spark, tbl) == Seq(1, 2))
    // the winner's version is exactly the competing commit, untouched
    assert(Snapshots.readAsOf(spark, tbl, 1).as[Long].collect().toSet ==
      (11L to 13L).toSet)
    // the retried commit appended on top of the winner, losing nothing
    assert(Snapshots.readLatest(spark, tbl).as[Long].collect().toSet ==
      ((1L to 5L) ++ (11L to 13L)).toSet)
  }

  test("snapshot retention: expired versions raise, survivors stay exact, compaction+expire reclaims dirs") {
    val tbl = Scratch.fresh(spark, "spec_snap_expire")
    Snapshots.commit(spark, tbl, (1L to 10L).toDF("id"))
    Snapshots.commit(spark, tbl, (11L to 15L).toDF("id"))
    Snapshots.commit(spark, tbl, (16L to 18L).toDF("id"))
    val all = (1L to 18L).toSet
    assert(subdirs(tbl).count(_.startsWith("batch-")) == 3)

    // append-only history: expire trims the horizon but every batch dir is
    // still referenced by the latest manifest, so no data is deleted
    assert(Snapshots.expire(spark, tbl, keepLast = 2) == Seq(1))
    intercept[IllegalArgumentException](Snapshots.readAsOf(spark, tbl, 1))
    assert(Snapshots.versions(spark, tbl) == Seq(2, 3))
    assert(Snapshots.readLatest(spark, tbl).as[Long].collect().toSet == all)
    assert(subdirs(tbl).count(_.startsWith("batch-")) == 3,
      "append-only expire must not delete still-referenced batch dirs")

    // compaction publishes the rewrite as version 4 with one file...
    val before = Snapshots.readLatest(spark, tbl).as[Long].collect().sorted.toSeq
    assert(Snapshots.compactLatest(spark, tbl, targetBytes = Long.MaxValue / 4) == 4)
    val manifest4 = Snapshots.readAsOf(spark, tbl, 4)
    assert(manifest4.as[Long].collect().sorted.toSeq == before,
      "compacted version must be value-identical to the view it rewrote")
    // ...and old versions remain time-travelable until expire
    assert(Snapshots.readAsOf(spark, tbl, 2).count() == 15)

    // now the small batch dirs are unreferenced by the survivor: reclaimed
    assert(Snapshots.expire(spark, tbl, keepLast = 1) == Seq(2, 3))
    val left = subdirs(tbl).filter(_.startsWith("batch-"))
    assert(left.size == 1, s"expected only the compacted batch dir, got $left")
    assert(dataFiles(s"$tbl/${left.head}").count(_.endsWith(".parquet")) == 1)
    assert(Snapshots.readLatest(spark, tbl).as[Long].collect().sorted.toSeq == before)
    intercept[IllegalArgumentException](Snapshots.readAsOf(spark, tbl, 3))
  }

  test("partitioned compaction: per-partition file counts drop, layout and pruning survive") {
    val small = Scratch.fresh(spark, "spec_pcompact_small")
    val packed = Scratch.fresh(spark, "spec_pcompact_packed")
    t("orders").withColumn("o_year", year(col("o_orderdate")))
      .repartition(16)
      .write.mode("overwrite").partitionBy("o_year").parquet(small)
    val parts = Layout.leafPartitionDirs(spark, small)
    assert(parts.nonEmpty && parts.forall(_.startsWith("o_year=")), parts.toString)
    parts.foreach { rel =>
      assert(dataFiles(s"$small/$rel").count(_.endsWith(".parquet")) > 1,
        s"fixture must start with many small files in $rel")
    }

    val out = Layout.compactPartitioned(spark, small, packed, 64L * 1024 * 1024)
    assert(out.keySet == parts.toSet)
    parts.foreach { rel =>
      val n = dataFiles(s"$packed/$rel").count(_.endsWith(".parquet"))
      assert(n == out(rel) && n == 1, s"$rel compacted to $n files")
    }

    // nothing lost, partition column values intact
    val got = spark.read.parquet(packed)
    assert(got.count() == t("orders").count())
    assert(got.select("o_year").distinct().count() == parts.size)

    // planning-time pruning still works on the compacted layout
    val q = got.filter(col("o_year") === 1997)
    val plan = q.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters: [isnotnull(o_year"),
      plan.toString)
    val scan = plan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.selectedPartitions.partitionCount == 1)

    // a flat (unpartitioned) directory is refused — that's compact()'s job
    val flat = Scratch.fresh(spark, "spec_pcompact_flat")
    t("region").write.mode("overwrite").parquet(flat)
    intercept[IllegalArgumentException](
      Layout.compactPartitioned(spark, flat, s"$flat-out", 1L << 20))
  }
}
