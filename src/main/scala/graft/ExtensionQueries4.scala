package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Agg, Multimodal, VectorOps}
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

  /** BM25 retrieval constants for t25: the classic k1=1.2 / b=0.75, carried
    * in exact rational form (k1 = 6/5, b = 3/4) so the per-term
    * normalization cross-multiplies to all-integer numerator/denominator —
    * num = 44·tf·S, den = 20·tf·S + 6·S + 18·dl·N after clearing
    * denominators by 20·N·avgdl (S = Σ dl, N = corpus size). The only
    * doubles are ln(idf) — fixed-pointed the instant it is computed, the
    * t19 rule — and the final display division.
    */
  val Bm25Terms: Seq[String] = Seq("vector", "merge", "window")
  val Bm25K = 20

  /** Reciprocal-rank-fusion constants for s16: the standard K=60 damping,
    * contributions fixed-pointed as 1e9 DIV (K + rank) — integer division,
    * so fusion scores are exact BIGINTs in both engines.
    */
  val RrfK = 60
  val HybridK = 20
  val HybridQueryVec = 0L

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
    }),

    // Metadata-filtered vector search (s15): top-k cosine neighbors
    // restricted to candidates sharing the query's label — the
    // pre-filtered ANN every multi-tenant / attribute-constrained vector
    // store runs (search only *your* tenant, only docs passing the
    // predicate). Pre-filter beats post-filter here by construction:
    // the predicate lands on the candidate scan BEFORE any distance math,
    // so at 100 TB — where label/tenant is a partition column — the filter
    // is partition pruning and the scored set shrinks by the selectivity
    // up front, instead of scoring everything and discarding. Scale shape:
    // the query set broadcasts (it is a handful of vectors); the corpus
    // side is scan → filter → score, shuffle-free until the bounded
    // per-query rank window.
    "s15_filtered_knn" -> ((s, dir) =>
      filteredKnn(t(s, dir, "embeddings").select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("v")),
        col("vec_id") <= 2, k = 5)),

    // BM25 retrieval (t25): the lexical scoring baseline every RAG stack
    // pairs with its vector index — idf·tf saturation with doc-length
    // normalization, over the same whitespace tokenization the d10/t19
    // family uses. All corpus statistics (df, Σdl, N) are computed in the
    // query, never hardcoded. Float discipline is the t19 rule: ln(idf)
    // fixed-points to a BIGINT the moment it exists; the tf normalization
    // is exact integer arithmetic (see [[Bm25Terms]] doc); per-term scores
    // fixed-point BEFORE the per-doc sum so partitioning can never reorder
    // double additions. Scale shape: one stateless scan computes every
    // (doc × query-term) tf — |Q| is bounded, so the fan-out is a
    // constant factor — then one groupBy(doc) and a global top-k
    // (TakeOrdered, no full sort); df and the corpus stats broadcast.
    "t25_bm25" -> ((s, dir) =>
      bm25(t(s, dir, "documents"), Bm25Terms, Bm25K)),

    // Hybrid retrieval fusion (s16): reciprocal-rank fusion of the two
    // rankers this engine now owns — t25's BM25 lexical top-k and an exact
    // cosine vector top-k — the standard two-tower merge every hybrid
    // search stack (lexical + embedding) ships. RRF is rank-only, so the
    // two score scales never need calibrating, and the fused score
    // Σ 1e9 DIV (60 + rank) is exact integer arithmetic in both engines.
    // Docs surfaced by only one ranker keep their single contribution
    // (full outer join), which is RRF's recall property. Scale shape: both
    // inputs are already top-k-bounded (≤ K rows each), so the fusion join
    // and sort are trivially small regardless of corpus size; the heavy
    // lifting lives in the two rankers, each already scale-shaped.
    "s16_hybrid_rrf" -> ((s, dir) => {
      val lexW = Window.orderBy(col("score_fp").desc, col("doc_id").asc)
      val lex = bm25(t(s, dir, "documents"), Bm25Terms, HybridK)
        .withColumn("lex_rank", row_number().over(lexW).cast("int"))
        .select(col("doc_id"), col("lex_rank"))
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        VectorOps.toDouble(col("embedding")).as("v"))
      val q = broadcast(e.filter(col("vec_id") === HybridQueryVec)
        .select(col("v").as("qv")))
      val vecW = Window.orderBy(col("cos").desc, col("doc_id").asc)
      val vec = e.filter(col("vec_id") =!= HybridQueryVec).crossJoin(q)
        .withColumn("cos", Agg.roundAt(VectorOps.cosineFast(col("qv"), col("v")), 6))
        .select(col("vec_id").as("doc_id"), col("cos"))
        .orderBy(col("cos").desc, col("doc_id").asc)
        .limit(HybridK)
        .withColumn("vec_rank", row_number().over(vecW).cast("int"))
        .select(col("doc_id"), col("vec_rank"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf_fp",
          (coalesce(expr(s"1000000000 DIV ($RrfK + lex_rank)"), lit(0L)) +
            coalesce(expr(s"1000000000 DIV ($RrfK + vec_rank)"), lit(0L)))
            .cast("long"))
        .orderBy(col("rrf_fp").desc, col("doc_id").asc)
        .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf_fp"))
    })
  )

  /** s15's body over an (vec_id, label, v) frame: top-k cosine within the
    * query's label partition, queries selected by `queryPred`.
    */
  private[graft] def filteredKnn(e: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    e.select(col("vec_id"), col("label"), col("v").as("cv"))
      .join(broadcast(q),
        col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
      .withColumn("cos", VectorOps.cosineFast(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("label"),
        Agg.roundAt(col("cos"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** t25's body over a (doc_id, text) frame.
    *
    * ONE corpus scan: a single pass tokenizes and reduces each doc to the
    * narrow row (doc_id, dl, tf-per-term), persisted so the three
    * downstream consumers (corpus stats, per-term df, the scoring join)
    * never re-read text — at 100 TB the naive formulation re-scans and
    * re-tokenizes the corpus three times, which IS the query's cost.
    */
  private[graft] def bm25(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = split(lower(trim(col("text"))), "\\s+")
    val perDoc = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        transform(typedLit(terms),
          term => size(filter(col("toks"), x => x === term)).cast("long"))
          .as("tfs"))
      .persist()
    val stats = broadcast(perDoc.agg(sum(col("dl")).as("S"),
      count(lit(1)).as("N")))
    val hits = perDoc
      .select(col("doc_id"), col("dl"),
        posexplode(col("tfs")).as(Seq("ti", "tf")))
      .filter(col("tf") > 0)
      .withColumn("term", element_at(typedLit(terms), col("ti") + 1))
      .drop("ti")
    val dfs = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    hits.join(broadcast(dfs), "term").crossJoin(stats)
      .withColumn("idf_fp",
        floor(log((col("N") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * 1e9).cast("long"))
      .withColumn("num", lit(44L) * col("tf") * col("S"))
      .withColumn("den", lit(20L) * col("tf") * col("S") +
        lit(6L) * col("S") + lit(18L) * col("dl") * col("N"))
      .withColumn("term_fp",
        floor(col("idf_fp").cast("double") / 1e9 *
          (col("num").cast("double") / col("den").cast("double")) * 1e6)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_fp")).as("score_fp"), count(lit(1)).as("n_hits"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_hits"), col("score_fp"),
        (col("score_fp").cast("double") / 1e6).as("score"))
  }

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
      FROM r ORDER BY event_type, day""",

    // Filtered-kNN replay: s01's exact-cosine shape plus the label
    // equality pushed into the candidate join.
    "s15_filtered_knn" -> s"""
      WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),
      en AS (SELECT vec_id, label, v,
               sqrt(${ExtensionQueries.dotSql("v", "v")}) AS nrm FROM e),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id, c.label,
               ${ExtensionQueries.dotSql("q.v", "c.v")} / (q.nrm * c.nrm) AS cos
        FROM en q JOIN en c
          ON c.vec_id <> q.vec_id AND c.label = q.label
        WHERE q.vec_id <= 2
      ),
      ranked AS (
        SELECT query_id, vec_id, label, cos,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cos DESC, vec_id ASC) AS rank
        FROM scored
      )
      SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, label,
             floor(cos * 1000000 + 0.5) / 1000000 AS cos
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank""",

    // BM25 replay: same tokenization as the d10/t19 oracles, same
    // fixed-point idf, same integer tf normalization, same top-k order.
    "t25_bm25" -> bm25Oracle,

    // RRF replay: both rankers' oracle shapes as subqueries, ranks from
    // the same (score desc, doc_id asc) order, integer-division fusion.
    "s16_hybrid_rrf" -> s"""
      WITH lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id ASC)
                 AS INTEGER) AS lex_rank
        FROM ($bm25Oracle)
      ),
      ve AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),
      ven AS (SELECT vec_id, v,
                sqrt(${ExtensionQueries.dotSql("v", "v")}) AS nrm FROM ve),
      vq AS (SELECT v AS qv, nrm AS qnrm FROM ven
             WHERE vec_id = $HybridQueryVec),
      vs AS (
        SELECT c.vec_id AS doc_id,
               floor((${ExtensionQueries.dotSql("qv", "c.v")}
                 / (qnrm * c.nrm)) * 1000000 + 0.5) / 1000000 AS cos
        FROM ven c CROSS JOIN vq WHERE c.vec_id <> $HybridQueryVec
      ),
      vtop AS (SELECT doc_id, cos FROM vs
               ORDER BY cos DESC, doc_id ASC LIMIT $HybridK),
      vr AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC)
                 AS INTEGER) AS vec_rank
        FROM vtop
      )
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
             CAST(coalesce(1000000000 // ($RrfK + l.lex_rank), 0)
               + coalesce(1000000000 // ($RrfK + v.vec_rank), 0) AS BIGINT)
               AS rrf_fp
      FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id
      ORDER BY rrf_fp DESC, doc_id ASC"""
  )

  /** t25's DuckDB replay, shared with s16's lexical subquery (lazy: the
    * [[oracles]] map initializer above runs first).
    */
  private lazy val bm25Oracle: String = s"""
      WITH tok AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents
      ),
      d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
      st AS (SELECT CAST(sum(dl) AS BIGINT) AS s_dl,
                    CAST(count(*) AS BIGINT) AS n FROM d),
      qt AS (SELECT unnest([${Bm25Terms.map("'" + _ + "'").mkString(", ")}]) AS term),
      hit AS (
        SELECT doc_id, dl, term,
               CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
        FROM d CROSS JOIN qt
        WHERE len(list_filter(toks, x -> x = term)) > 0
      ),
      dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hit GROUP BY 1),
      sc AS (
        SELECT h.doc_id,
               CAST(floor(
                 CAST(CAST(floor(ln((st.n - dfc.df + 0.5) / (dfc.df + 0.5)
                     + 1.0) * 1000000000) AS BIGINT) AS DOUBLE) / 1000000000
                 * (CAST(44 * h.tf * st.s_dl AS DOUBLE)
                    / CAST(20 * h.tf * st.s_dl + 6 * st.s_dl
                           + 18 * h.dl * st.n AS DOUBLE))
                 * 1000000) AS BIGINT) AS term_fp
        FROM hit h JOIN dfc USING (term) CROSS JOIN st
      ),
      g AS (SELECT doc_id, CAST(sum(term_fp) AS BIGINT) AS score_fp,
                   count(*) AS n_hits FROM sc GROUP BY 1)
      SELECT doc_id, n_hits, score_fp,
             CAST(score_fp AS DOUBLE) / 1000000 AS score
      FROM g ORDER BY score_fp DESC, doc_id ASC LIMIT $Bm25K"""
}
