package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Round 11: the events fixture has shipped with `ts` as parquet
  * TIMESTAMP(NANOS) (surfacing as a raw long under nanosAsLong) and as
  * TIMESTAMP(MICROS) (surfacing as TimestampNTZ) across fixture
  * generations. A fixed assumption of either encoding silently breaks every
  * query that touches `events` OR registers temp views — 16 queries failed
  * in round 10 for exactly this reason. These specs pin the adaptive load:
  * identical downstream schema (session-zoned TimestampType) and identical
  * values for both encodings, batch and streaming.
  */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Write the same three logical rows as (a) raw nanos longs the way a
    * TIMESTAMP(NANOS) file surfaces under nanosAsLong, and (b) NTZ micros
    * the way a pandas-written TIMESTAMP(MICROS) file surfaces.
    */
  private def writeFixtures(): (String, String) = {
    val base = Files.createTempDirectory("graft_ts_enc").toString
    val rows = Seq(
      (1L, 1704067200L * 1000000L, 10L, "view", 1.0, "{}"),
      (2L, 1704067260L * 1000000L + 123456L, 10L, "click", 2.0, "{}"),
      (3L, 1704070000L * 1000000L, 11L, "view", 3.0, "{}"))
    val nanosDir = s"$base/nanos/events.parquet"
    rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(nanosDir)
    val microsDir = s"$base/micros/events.parquet"
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros($"ts").cast(TimestampNTZType))
      .write.parquet(microsDir)
    (s"$base/nanos", s"$base/micros")
  }

  test("batch events load adapts to nanos-long and micros-NTZ encodings") {
    val (nanosDir, microsDir) = writeFixtures()
    val a = Tables.load(spark, nanosDir, "events")
    val b = Tables.load(spark, microsDir, "events")
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val key = Seq("event_id", "ts", "user_id", "event_type", "value")
    val av = a.select(key.map(col): _*).orderBy("event_id").collect().toSeq
    val bv = b.select(key.map(col): _*).orderBy("event_id").collect().toSeq
    assert(av === bv)
    // epoch arithmetic (what e03/e08 do) must analyze on both
    assert(a.select($"ts".cast(DoubleType)).count() === 3)
    assert(b.select($"ts".cast(DoubleType)).count() === 3)
  }

  test("streaming events read matches the batch load for both encodings") {
    val (nanosDir, microsDir) = writeFixtures()
    for (dir <- Seq(nanosDir, microsDir)) {
      val stream = graft.streaming.EventStreams.readEventStream(
        spark, s"$dir/events.parquet")
      assert(stream.schema("ts").dataType === TimestampType)
      val got = graft.streaming.EventStreams.runToMemory(
        stream, s"r11_enc_${dir.replaceAll("[^a-z]", "")}",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val batch = Tables.load(spark, dir, "events")
      assert(got.orderBy("event_id").collect().toSeq ===
        batch.orderBy("event_id").collect().toSeq)
    }
  }
}
