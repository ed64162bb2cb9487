package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Round-10 LLM-pipeline extensions (continues [[ExtensionQueries3]], split
  * for file hygiene): the remaining ingest-side steps a training-data
  * pipeline runs — RAG-style chunking with overlap, video shot-boundary
  * detection over the parsed multi-frame container, and event-rate anomaly
  * flagging. Same contract as the earlier extension files: every query
  * deterministic with a DuckDB oracle.
  */
object ExtensionQueries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Chunk geometry for t24: fixed window with overlap, the shape RAG /
    * context-window ingestion uses. stride < size, so consecutive chunks
    * share size − stride = 64 chars of context.
    */
  val ChunkSize = 256
  val ChunkStride = 192

  /** Rolling-rate spike rule for e09: a day spikes when its count exceeds
    * SpikeNum/SpikeDen × the mean of the trailing [[SpikeWindow]] observed
    * days — evaluated in cross-multiplied integer form, so both engines
    * agree bit-for-bit with no float division anywhere.
    */
  val SpikeWindow = 3
  val SpikeNum = 2
  val SpikeDen = 1

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Video scene detection (m07): the video third of the corpus carries a
    // REAL parsed multi-frame container (header-validated by
    // Multimodal.Vid — the moving-picture twin of the Ppm/Pcm paths), and
    // each clip reduces to per-transition integer SADs Σ|gray_f − gray_f−1|
    // with a cut wherever SAD exceeds the threshold — the classic
    // shot-boundary detector a video curation pipeline runs before
    // keyframe sampling. The space-padded still tail is SAD-0 by
    // construction, so n_cuts counts genuine content transitions. Scale
    // shape: embarrassingly parallel mapPartitions decode, zero shuffle
    // before the output sort. The oracle replays the header-stripping
    // arithmetic straight off the text.
    "m07_scene_detect" -> ((s, dir) => {
      val vid = Multimodal.videoFromDocuments(t(s, dir, "documents"))
      Multimodal.sceneDetect(vid, Multimodal.SceneCutThr).toDF()
        .select(col("doc_id"), col("n_frames"), col("n_cuts"),
          col("total_diff"), col("max_diff"))
        .orderBy(col("doc_id"))
    }),

    // Overlapping-window chunking (t24): every document split into
    // fixed-size chunks advancing by a smaller stride — the RAG-ingestion /
    // long-context packing step that is NOT t15's greedy sequence packing
    // (packing concatenates whole docs; chunking slices within one). Chunk
    // count is closed-form (1 + ceil(max(len−size,0)/stride)) so the
    // explode is bounded per row, and each chunk row carries its offset and
    // content md5 — the dedup-able, join-able unit downstream retrieval
    // indexes. Scale shape: stateless per-row generate (no shuffle); output
    // grows by ~len/stride per doc, the same fan-out a tokenizer pass has.
    "t24_chunk_overlap" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_chunks",
          (lit(1) + ceil(greatest(length(col("text")) - ChunkSize, lit(0))
            .cast("double") / ChunkStride)).cast("int"))
        .select(col("doc_id"), col("text"), col("n_chunks"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
        .withColumn("chunk_start", (col("chunk_idx") * ChunkStride).cast("int"))
        .withColumn("chunk",
          expr(s"substring(text, chunk_idx * $ChunkStride + 1, $ChunkSize)"))
        .select(col("doc_id"), col("chunk_idx"), col("n_chunks"),
          col("chunk_start"), length(col("chunk")).as("chunk_len"),
          md5(encode(col("chunk"), "UTF-8")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // Event-rate anomaly (e09): per event-type daily counts, each day
    // compared against the mean of its trailing 3 OBSERVED days (a row
    // window, not a range window — gaps are skipped identically in both
    // engines). The spike test cnt·W·Den > Num·Σprev is the cross-
    // multiplied form of cnt > (Num/Den)·mean(prev W) — all-integer, no
    // float drift, and only fires once a full trailing window exists.
    // This is the ingest-health tripwire a 100 TB event lake runs per
    // partition-arrival. Scale shape: one shuffle to (event_type) — a
    // handful of partitions each holding a day-ordered series; the window
    // is bounded (3 rows) so state never grows.
    "e09_rate_anomaly" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-SpikeWindow, -1)
      daily
        .withColumn("prev_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
        .withColumn("prev_days", count(col("n_events")).over(w).cast("int"))
        .withColumn("is_spike",
          col("prev_days") === SpikeWindow &&
            col("n_events") * SpikeWindow * SpikeDen > lit(SpikeNum) * col("prev_sum"))
        .orderBy(col("event_type"), col("day"))
    })
  )

  val oracles: Map[String, String] = Map(

    // Scene-detect replay: same space-padded gray frames (ascii(char) ==
    // payload byte — the fixture text is ASCII), same integer SADs, same
    // cut threshold. Integer arithmetic end-to-end.
    "m07_scene_detect" -> s"""
      WITH clip AS (
        SELECT doc_id,
               rpad(text, ${Multimodal.VidFrames * Multimodal.VidFrameBytes},
                 ' ') AS s
        FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
      ),
      p AS (
        SELECT doc_id, s, unnest(range(1, ${Multimodal.VidFrames})) AS fi
        FROM clip
      ),
      d AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(
                 range(0, ${Multimodal.VidFrameBytes}), j ->
                   abs(ascii(substr(s,
                         CAST(fi * ${Multimodal.VidFrameBytes} + j + 1
                           AS INTEGER), 1))
                     - ascii(substr(s,
                         CAST((fi - 1) * ${Multimodal.VidFrameBytes} + j + 1
                           AS INTEGER), 1))))) AS BIGINT) AS sad
        FROM p
      )
      SELECT doc_id, CAST(${Multimodal.VidFrames} AS INTEGER) AS n_frames,
             CAST(sum(CASE WHEN sad > ${Multimodal.SceneCutThr}
               THEN 1 ELSE 0 END) AS INTEGER) AS n_cuts,
             CAST(sum(sad) AS BIGINT) AS total_diff,
             CAST(max(sad) AS BIGINT) AS max_diff
      FROM d GROUP BY doc_id ORDER BY doc_id""",

    // Chunking replay: same closed-form chunk count, same offsets, same
    // md5 over the same substring bytes (ASCII text: chars == bytes).
    "t24_chunk_overlap" -> s"""
      WITH d AS (
        SELECT doc_id, text,
               CAST(1 + ceil(CAST(greatest(length(text) - $ChunkSize, 0)
                 AS DOUBLE) / $ChunkStride) AS INTEGER) AS n_chunks
        FROM documents
      ),
      c AS (
        SELECT doc_id, text, n_chunks,
               CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx
        FROM d
      ),
      x AS (
        SELECT doc_id, chunk_idx, n_chunks,
               CAST(chunk_idx * $ChunkStride AS INTEGER) AS chunk_start,
               substr(text, chunk_idx * $ChunkStride + 1, $ChunkSize) AS chunk
        FROM c
      )
      SELECT doc_id, chunk_idx, n_chunks, chunk_start,
             CAST(length(chunk) AS INTEGER) AS chunk_len,
             md5(chunk) AS chunk_md5
      FROM x ORDER BY doc_id, chunk_idx""",

    // Anomaly replay: identical row window (trailing 3 observed days),
    // identical cross-multiplied integer spike test.
    "e09_rate_anomaly" -> s"""
      WITH daily AS (
        SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
      ),
      r AS (
        SELECT event_type, day, n_events,
               CAST(coalesce(sum(n_events) OVER w, 0) AS BIGINT) AS prev_sum,
               CAST(count(n_events) OVER w AS INTEGER) AS prev_days
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN $SpikeWindow PRECEDING AND 1 PRECEDING)
      )
      SELECT event_type, day, n_events, prev_sum, prev_days,
             (prev_days = $SpikeWindow AND
              n_events * $SpikeWindow * $SpikeDen > $SpikeNum * prev_sum)
               AS is_spike
      FROM r ORDER BY event_type, day"""
  )
}
