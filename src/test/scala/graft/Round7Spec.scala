package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Plan-shape and layout-effect properties of the round-7 lake operators —
  * the parts the hash oracles can't see: that partition pruning actually
  * prunes, that z-order clustering actually buys file skipping, that
  * compaction actually reduces file counts, and that Spark's runtime
  * bloom-filter join can be enabled without changing results.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def t(name: String) = graft.sources.Tables.load(spark, dir, name)

  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }

  test("zorder key is a bijection: decode(encode(a, b)) == (a, b)") {
    for (a <- 0L until 64L; b <- 0L until 64L) {
      val z = ((0 until 6).map { i =>
        (((a >> i) & 1L) << (2 * i + 1)) + (((b >> i) & 1L) << (2 * i))
      }).sum
      assert(Layout.zorderDecode(z, 6) == ((a, b)), s"at ($a, $b)")
    }
    // and the Column form computes the same key as the reference arithmetic
    val rows = spark.range(0, 256)
      .select((col("id") / 16).cast("long").as("a"), (col("id") % 16).as("b"))
      .withColumn("z", Layout.zorderKey(col("a"), col("b"), 4))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, z) =>
      assert(Layout.zorderDecode(z, 4) == ((a, b)), s"column form at ($a, $b)")
    }
  }

  test("q61 layout: the year filter becomes a partition filter and reads exactly one partition") {
    val tmp = graft.sources.Scratch.fresh(spark, "spec_lake")
    t("orders").withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    val pruned = spark.read.parquet(tmp).filter(col("o_year") === 1997)
    val scans = fileScans(pruned)
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty,
      "year predicate must prune at planning time, not row-filter at scan time")
    // execute THIS physical plan instance (a fresh .count() would build a
    // new QueryExecution whose metrics we can't see)
    pruned.queryExecution.executedPlan.execute().count()
    val partsRead = scans.head.metrics("numPartitions").value
    assert(partsRead == 1, s"expected 1 partition read, got $partsRead")
  }

  test("q62 layout: z-order clustering skips files a row-order layout cannot") {
    val src = t("lineitem").select(
      pmod(col("l_partkey"), lit(1024)).as("pa"),
      pmod(col("l_suppkey"), lit(1024)).as("sb"),
      col("l_quantity"))
    val zdir = graft.sources.Scratch.fresh(spark, "spec_zorder")
    val rdir = graft.sources.Scratch.fresh(spark, "spec_roworder")
    Layout.writeZOrdered(src, col("pa"), col("sb"), 10, nFiles = 8, dir = zdir)
    src.repartition(8).write.mode("overwrite").parquet(rdir)

    // per-file column stats, exactly what parquet row-group/file skipping
    // consults: how many files could contain rows of the q62 box?
    def filesIntersectingBox(d: String): (Long, Long) = {
      val stats = spark.read.parquet(d)
        .groupBy(input_file_name().as("f"))
        .agg(min("pa").as("pa_lo"), max("pa").as("pa_hi"),
          min("sb").as("sb_lo"), max("sb").as("sb_hi"))
      val total = stats.count()
      val hit = stats.filter(col("pa_hi") >= 128 && col("pa_lo") <= 255 &&
        col("sb_hi") >= 2 && col("sb_lo") <= 6).count()
      (hit, total)
    }
    val (zHit, zTotal) = filesIntersectingBox(zdir)
    val (rHit, rTotal) = filesIntersectingBox(rdir)
    assert(zTotal == 8 && rTotal == 8)
    assert(rHit == rTotal,
      s"row-order layout should leave every file intersecting the box (got $rHit/$rTotal)")
    assert(zHit < rHit, s"z-order must beat row order, got $zHit vs $rHit")

    // and the box predicate reaches the parquet scan as pushed filters on
    // the STORED cluster columns (the stats above only pay off if so)
    val boxed = spark.read.parquet(zdir)
      .filter(col("pa").between(128, 255) && col("sb").between(2, 6))
    val meta = fileScans(boxed).head.metadata.getOrElse("PushedFilters", "")
    assert(meta.contains("GreaterThanOrEqual(pa,128") && meta.contains("LessThanOrEqual(sb,6"),
      s"box predicate must push to the scan, got: $meta")
  }

  test("q64 layout: compaction collapses 64 ingest files to the size-targeted count") {
    val small = graft.sources.Scratch.fresh(spark, "spec_small")
    val packed = graft.sources.Scratch.fresh(spark, "spec_packed")
    t("documents").repartition(64).write.mode("overwrite").parquet(small)
    def dataFiles(d: String): Int = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).count(st => st.isFile && !st.getPath.getName.startsWith("_"))
    }
    assert(dataFiles(small) == 64)
    val totalBytes = {
      val p = new org.apache.hadoop.fs.Path(small)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
    }
    val n = Layout.compact(spark, small, packed, math.max(1L, totalBytes / 4))
    assert(n <= 8, s"quarter-size target must give a handful of files, got $n")
    assert(dataFiles(packed) == n)
    // nothing lost in the rewrite
    assert(spark.read.parquet(packed).count() == t("documents").count())
  }

  test("q63 stats index: the candidate set is a strict subset and loses no matching rows") {
    val src = t("lineitem").select(
      pmod(col("l_partkey"), lit(1024)).as("pa"),
      pmod(col("l_suppkey"), lit(1024)).as("sb"),
      col("l_quantity"))
    val zdir = graft.sources.Scratch.fresh(spark, "spec_statsidx")
    Layout.writeZOrdered(src, col("pa"), col("sb"), 10, nFiles = 8, dir = zdir)
    val idx = Layout.statsIndex(spark, zdir, Seq("pa", "sb"))
    assert(idx.count() == 8)
    val files = Layout.filesForBox(idx, Map("pa" -> (128L, 255L), "sb" -> (2L, 6L)))
    assert(files.nonEmpty && files.size < 8,
      s"z-ordered stats should prune some of 8 files, kept ${files.size}")
    val box = col("pa").between(128, 255) && col("sb").between(2, 6)
    val pruned = spark.read.parquet(files: _*).filter(box).count()
    val full = spark.read.parquet(zdir).filter(box).count()
    assert(pruned == full, "skipping must only skip provably-empty files")
  }

  test("q65 snapshots: historical versions stay exact and orphaned batches stay invisible") {
    import graft.sources.Snapshots
    val tbl = graft.sources.Scratch.fresh(spark, "spec_snap")
    val docs = t("documents")
    val even = docs.filter(col("doc_id") % 2 === 0)
    assert(Snapshots.commit(spark, tbl, even) == 1)
    assert(Snapshots.commit(spark, tbl, docs.filter(col("doc_id") % 2 =!= 0)) == 2)
    assert(Snapshots.versions(spark, tbl) == Seq(1, 2))
    // v1 is exactly the first commit, still readable after v2 published
    assert(Snapshots.readAsOf(spark, tbl, 1).count() == even.count())
    assert(Snapshots.readAsOf(spark, tbl, 1)
      .filter(col("doc_id") % 2 =!= 0).count() == 0)
    assert(Snapshots.readLatest(spark, tbl).count() == docs.count())
    // a writer crash before manifest publish = orphaned batch dir: invisible
    docs.limit(7).write.mode("overwrite").parquet(s"$tbl/batch-00099")
    assert(Snapshots.versions(spark, tbl) == Seq(1, 2))
    assert(Snapshots.readLatest(spark, tbl).count() == docs.count())
    intercept[IllegalArgumentException](Snapshots.readAsOf(spark, tbl, 99))
  }

  test("s09 product quantization: every vector coded in-range per subspace, and codes compress") {
    val e = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val codes = (0 until 4).map { j =>
      val sub = e.select(col("vec_id"), slice(col("v"), j * 16 + 1, 16).as("v"))
      val (_, assigned) = graft.operators.Kmeans.fit(sub, k = 8, iters = 2)
      assigned.select(col("vec_id"), col("cell").as(s"c_$j"))
    }.reduce(_.join(_, "vec_id"))
    assert(codes.count() == n, "every corpus vector must get a full code")
    assert(codes.filter((0 until 4).map(j =>
      col(s"c_$j") < 0 || col(s"c_$j") >= 8).reduce(_ || _)).count() == 0)
    // the index actually compresses: distinct code words << corpus size
    val words = codes.select((0 until 4).map(j => col(s"c_$j")): _*).distinct().count()
    assert(words <= 8L * 8 * 8 * 8)
    assert(words < n, s"code words ($words) should collide across $n vectors")
  }

  test("s09 scores are valid cosines and the query is deterministic across runs") {
    def run() = SparkEntry.queries("s09_knn_pq")(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val a = run()
    assert(a.nonEmpty)
    assert(a.forall { case (_, _, _, s) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 })
    assert(a == run(), "PQ training and scoring must be run-to-run deterministic")
  }

  test("streaming foreachBatch publishes micro-batches as snapshot versions (time-travel over a stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Snapshots
    implicit val sqlCtx = spark.sqlContext
    val tbl = graft.sources.Scratch.fresh(spark, "spec_stream_snap")
    val stream = MemoryStream[Long]
    // each micro-batch lands as one atomically-published snapshot version —
    // the streaming-ingest pattern for a corpus that training runs must be
    // able to pin ("train on the table exactly as of version N")
    val q = stream.toDS().toDF("doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Snapshots.commit(spark, tbl, batch): Unit
      }.start()
    stream.addData(1L to 10L: _*)
    q.processAllAvailable()
    stream.addData(11L to 15L: _*)
    q.processAllAvailable()
    q.stop()
    val vs = Snapshots.versions(spark, tbl)
    assert(vs == Seq(1, 2), s"two micro-batches -> two versions, got $vs")
    assert(Snapshots.readAsOf(spark, tbl, 1).count() == 10)
    assert(Snapshots.readLatest(spark, tbl).count() == 15)
    // the historical version is the exact stream prefix, not a re-read
    val v1 = Snapshots.readAsOf(spark, tbl, 1).as[Long].collect().toSet
    assert(v1 == (1L to 10L).toSet)
  }

  test("t13 BPE merges match a sequential reference implementation") {
    // reference BPE over the (word, count) table, driver-side: count
    // adjacent symbol pairs weighted by word frequency, merge the
    // (freq desc, left asc, right asc) winner greedily left-to-right
    val wordCounts = t("documents")
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .as[(String, Long)].collect().toMap
    var syms: Map[List[String], Long] =
      wordCounts.map { case (w, c) => w.map(_.toString).toList -> c }
    val expected = (1 to 3).map { r =>
      val freqs = syms.toSeq.flatMap { case (l, c) =>
        l.zip(l.tail).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((lw, rw), f) = freqs.minBy { case ((a, b), n) => (-n, a, b) }
      def apply(l: List[String]): List[String] = l match {
        case a :: b :: rest if a == lw && b == rw => (a + b) :: apply(rest)
        case a :: rest => a :: apply(rest)
        case Nil => Nil
      }
      syms = syms.groupBy { case (l, _) => apply(l) }.map { case (l, m) => l -> m.values.sum }
      (r, lw, rw, lw + rw, f)
    }.toList
    val got = SparkEntry.queries("t13_bpe_merges")(spark, dir)
      .as[(Int, String, String, String, Long)].collect().toList
    assert(got == expected)
  }

  test("g01 pagerank: scores positive, ranks dense+ordered, deterministic across runs") {
    // conservation is implied by construction (every node's outgoing mass
    // splits over deg edges); this test checks the observable contract of
    // the truncated top-20 output only
    def run() = SparkEntry.queries("g01_pagerank")(spark, dir)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val a = run()
    assert(a.nonEmpty && a.forall(_._4 > 0))
    assert(a == run(), "fixed-iteration decimal-summed PageRank must be deterministic")
    // ranks are dense from 1 and ordered by pr desc
    assert(a.map(_._1) == (1 to a.size).toList)
    assert(a.map(_._4).sliding(2).forall(p => p.size < 2 || p(0) >= p(1)))
  }

  test("runtime bloom-filter join: plan gains might_contain, result unchanged") {
    val plain = t("lineitem")
      .join(t("supplier").filter(col("s_nationkey") === 3), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity").cast("long")).as("q"))
      .orderBy(col("l_returnflag")).as[(String, Long)].collect().toSeq

    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join on tiny local fixtures so the optimizer's
      // size gates open — at real scale the defaults (10 MB creation side,
      // 10 GB probe side) fire on their own
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "1GB")
      spark.conf.set(keys(2), "0")
      spark.conf.set(keys(3), "-1")
      val bloomed = t("lineitem")
        .join(t("supplier").filter(col("s_nationkey") === 3), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity").cast("long")).as("q"))
      assert(bloomed.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "optimizer should inject a bloom filter on the probe side")
      val got = bloomed.orderBy(col("l_returnflag")).as[(String, Long)].collect().toSeq
      assert(got == plain, "runtime filtering must never change results")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
