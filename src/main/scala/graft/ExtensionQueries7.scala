package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Agg, Dedup, Multimodal, TextOps, VectorOps}
import graft.sources.Tables

/** Round-12 LLM-pipeline extensions, second batch (continues
  * [[ExtensionQueries6]], split for file hygiene): the frequency-sketch,
  * split-hygiene, vocabulary-health, attribution and keyframe operators a
  * curation stack runs beside the dedup/ANN core. Same contract as every
  * extension file: each query is deterministic (fixed-point or all-integer
  * aggregates, canonical ORDER BY) and carries a DuckDB oracle.
  */
object ExtensionQueries7 {

  import ExtensionQueries5.SessionGapSec

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Count-Min geometry (q88). Width 16 is DELIBERATELY smaller than the
    * fixture's 31-term vocabulary so hash collisions actually occur and
    * the depth-3 min visibly tightens estimates — the regime the sketch
    * exists for. The estimate-side guarantee (est ≥ true, always) is
    * Round12bSpec's property; the oracle replays the collisions exactly.
    */
  val CmsDepth = 3
  val CmsWidth = 16L
  val CmsProbes = 20

  /** t30 vocabulary budget: top-[[VocabSize]] terms by (count desc, term
    * asc) — a total order, so the vocab set is identical in both engines.
    * 16 of the fixture's 31 terms, making per-source OOV rates sit mid-
    * range where the report is informative.
    */
  val VocabSize = 16

  /** s25 centroid fixed-point scale: per-dim per-label sums of
    * floor(x·1e9) are exact 64-bit integers (|x| ≲ 1, ≤ ~100 rows per
    * label at fixture SF; at 100 TB the sum still fits by 2^63/1e9 ≈ 9e9
    * rows per label), so centroids are order-independent — the one part of
    * a distributed mean a shuffle could otherwise perturb.
    */
  val CentFp = 1e9

  /** q88's per-row bucket for a term: row seed i is prepended so the depth
    * rows are independent hashes of the same 48-bit md5 family the KMV /
    * split operators use.
    */
  private def cmsBucket(i: Int, width: Long, term: org.apache.spark.sql.Column) =
    ExtensionQueries3.md5Hash48(concat(lit(s"$i:"), term)) % width

  /** q88's body over any (term) relation, geometry-parameterized so
    * Round12bSpec can drive the exact regime (width ≥ vocabulary → zero
    * collisions → est == true for every probe) beside the production
    * collision regime.
    */
  private[graft] def countMin(words: DataFrame, depth: Int, width: Long,
      probes: Int): DataFrame = {
    val counters = words
      .select(posexplode(array((0 until depth).map(i =>
        cmsBucket(i, width, col("term"))): _*)).as(Seq("row_i", "bucket")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probeSet = words.groupBy(col("term"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term").asc)
      .limit(probes)
    probeSet
      .select(col("term"), col("true_cnt"),
        posexplode(array((0 until depth).map(i =>
          cmsBucket(i, width, col("term"))): _*)).as(Seq("row_i", "bucket")))
      .join(broadcast(counters), Seq("row_i", "bucket"))
      .groupBy(col("term"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("term"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .orderBy(col("term"))
  }

  /** t30's body over any (source, term) relation, vocab-budget-
    * parameterized so Round12bSpec can pin the saturation point (budget ≥
    * vocabulary → zero OOV everywhere).
    */
  private[graft] def vocabCoverage(words: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = words.groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term").as("vterm"))
    words.join(broadcast(vocab), col("term") === col("vterm"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("vterm").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", Agg.roundAt(col("n_oov").cast("double")
        / col("n_tokens").cast("double"), 6))
      .orderBy(col("source"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Nearest-centroid label audit (s25): per-label mean embedding
    // (fixed-point exact), then every vector re-assigned to its nearest
    // centroid by cosine — the confusion matrix between stored labels and
    // embedding-space structure. This is the label-quality gate a training
    // pipeline runs before trusting classifier labels: off-diagonal mass
    // marks label noise or collapsed clusters, and the same shape serves
    // nearest-centroid (Rocchio) classification of UNlabeled vectors.
    // Scale shape: centroid build is ONE map-side-combinable pass to
    // |labels|×dims integer sums; the assignment pass broadcasts the
    // |labels|-row centroid table against the corpus (n×|labels| scored
    // rows, WindowGroupLimit-prunable rank); the confusion aggregate is
    // ≤ |labels|² rows and the normalization windows over that, never the
    // corpus.
    "s25_centroid_classify" -> ((s, dir) => {
      val e = ExtensionQueries.embeddingsD(s, dir)
      val st = e.select(col("label"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("label"), col("d"))
        .agg(sum(floor(col("x") * lit(CentFp)).cast("long")).as("sfp"),
          count(lit(1)).as("n"))
      val cents = st
        .select(col("label").as("clabel"),
          struct(col("d"), (col("sfp").cast("double") / col("n").cast("double")
            / lit(CentFp)).as("c")).as("st"))
        .groupBy(col("clabel"))
        .agg(array_sort(collect_list(col("st"))).as("ss"))
        .select(col("clabel"), transform(col("ss"), x => x.getField("c")).as("cv"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("clabel").asc)
      val fw = Window.partitionBy(col("label"))
      e.crossJoin(broadcast(cents))
        .withColumn("cos", VectorOps.cosineFast(col("v"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("label"), col("clabel"))
        .agg(count(lit(1)).as("n"))
        .withColumn("frac", Agg.roundAt(col("n").cast("double")
          / sum(col("n")).over(fw).cast("double"), 6))
        .select(col("label"), col("clabel").as("assigned"), col("n"),
          col("frac"))
        .orderBy(col("label"), col("assigned"))
    }),

    // Count-Min frequency sketch (q88): corpus term frequencies from a
    // depth×width counter grid — est(term) = min over rows of
    // counter[h_i(term)] — probed for the exact top-20 terms beside their
    // true counts. The 100 TB case: counter state is FIXED (depth×width
    // integers) no matter how large the vocabulary, partial grids merge by
    // element-wise addition up the agg tree (a streaming twin is the same
    // aggregation per micro-batch), and point estimates never rescan the
    // corpus — the complement of t12/t29's Space-Saving (which keeps the
    // top keys; CMS answers ANY key, overestimate-only). Scale shape: one
    // corpus pass to a depth×width-row aggregate; probes join the counter
    // grid broadcast.
    "q88_countmin" -> ((s, dir) =>
      countMin(t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term")),
        CmsDepth, CmsWidth, CmsProbes)),

    // Leakage-safe train/validation/test split (d18): d12 hashes CONTENT
    // so exact duplicates land together, but NEAR-duplicates hash apart —
    // a near-copy of a training doc in the test set is exactly the
    // contamination dedup exists to prevent. The fix: split by the d07
    // dedup CLUSTER (hash the cluster id, not the doc), so every member of
    // a near-dup clique lands in the same split and no LSH candidate pair
    // ever straddles a split boundary (Round12bSpec asserts zero
    // straddlers). Scale shape: d07's fixed-round label propagation (one
    // keyed join + aggregate per round) plus a row-local hash — nothing
    // beyond what dedup already paid.
    "d18_cluster_split" -> ((s, dir) => {
      val feats = ExtensionQueries.docFeatures(s, dir)
      val pairs = Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
      val clusters = Dedup
        .labelClusters(feats.select("id"), pairs,
          rounds = ExtensionQueries.ClusterRounds)
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      val hexDigit = substring(md5(col("cluster_id").cast("string")), 1, 1)
      val bucket = (array_position(
        split(lit("0,1,2,3,4,5,6,7,8,9,a,b,c,d,e,f"), ","), hexDigit) - 1)
        .cast("int")
      clusters.withColumn("bucket", bucket)
        .withColumn("split",
          when(col("bucket") <= 12, "train")
            .when(col("bucket") <= 14, "validation")
            .otherwise("test"))
        .select(col("doc_id"), col("cluster_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // Vocabulary coverage / UNK-rate report (t30): per-source fraction of
    // corpus tokens OUTSIDE the top-V vocabulary — the tokenizer-health
    // diagnostic run before committing a vocab budget (a source whose
    // OOV rate spikes will shatter into bytes/UNKs and train badly; the
    // per-source view catches it before mixing). Deterministic vocab: top
    // V by (count desc, term asc) — a total order shared with the oracle.
    // Scale shape: vocab build is a word-count (map-side combinable) and
    // the vocab itself is BOUNDED (V rows → broadcast); the scoring pass
    // is one corpus scan with a broadcast membership probe, aggregated to
    // |sources| rows.
    "t30_vocab_coverage" -> ((s, dir) =>
      vocabCoverage(t(s, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term")),
        VocabSize)),

    // Linear multi-touch attribution (e15): e08 credits the FIRST touch;
    // this splits each purchase's value EQUALLY across every touch event
    // in the same session at or before the purchase — the other standard
    // attribution model, and the one that needs the session join (e13) as
    // its substrate. Credit is fixed-pointed per assignment
    // (floor(value·1e6 / n_touches) micros) so the per-type totals are
    // exact integer sums — order-independent under any shuffle. Scale
    // shape: both joins are keyed on user_id with interval predicates
    // evaluated inside the matched group (per-user sessions and per-
    // session events are bounded); the per-purchase touch count is a
    // window over the joined rows partitioned by purchase id; the output
    // aggregate is |touch types| rows.
    "e15_linear_attribution" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val sessions = graft.streaming.EventStreams
        .sessionWindowed(events, SessionGapSec)
        .select(col("user_id").as("s_user"), col("session_start"),
          col("session_end"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("value"))
        .join(sessions, col("p_user") === col("s_user") &&
          col("p_ts") >= col("session_start") && col("p_ts") < col("session_end"))
      val touches = events.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
          col("event_type").as("touch_type"))
      val wp = Window.partitionBy(col("p_id"))
      purchases.join(touches, col("t_user") === col("p_user") &&
          col("t_ts") >= col("session_start") && col("t_ts") <= col("p_ts"))
        .withColumn("n_touches", count(lit(1)).over(wp))
        .withColumn("credit_fp",
          floor(col("value") * lit(1e6) / col("n_touches")).cast("long"))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_credits"),
          countDistinct(col("p_id")).as("n_purchases"),
          sum(col("credit_fp")).as("credit_fp"))
        .select(col("touch_type"), col("n_credits"), col("n_purchases"),
          Agg.roundAt(col("credit_fp").cast("double") / lit(1e6), 4)
            .as("credit"))
        .orderBy(col("touch_type"))
    }),

    // Keyframe extraction (m10): per clip, the frame after the largest
    // inter-frame SAD transition through the REAL container decode — the
    // representative still m07's shot boundaries exist to select, and the
    // unit preview generation, visual dedup indexes and vision-encoder
    // frame sampling consume. kf_md5 pins the extracted frame's raw bytes,
    // so the gate catches a one-byte drift anywhere in
    // parse→diff→argmax→extract. Scale shape: embarrassingly parallel
    // partition-local decode (the m07 shape), zero shuffle before the
    // output sort.
    "m10_keyframe_extract" -> ((s, dir) =>
      Multimodal.keyframes(
        Multimodal.videoFromDocuments(t(s, dir, "documents"))).toDF()
        .orderBy(col("doc_id")))
  )

  // ---- DuckDB SQL mirrors ----

  /** q88's bucket in DuckDB — the md5Hash48 rendering with the row seed
    * prepended, mod width. `i` must be a BIGINT column or literal.
    */
  private def cmsBucketSql(i: String, term: String): String =
    s"CAST(('0x' || substr(md5($i || ':' || $term), 1, 12)) AS BIGINT) % $CmsWidth"

  val oracles: Map[String, String] = Map(

    // Centroid replay: same fixed-point per-(label, dim) sums, same
    // two-step double division, centroid lists assembled in dim order,
    // s01's cosine form, same (cos desc, clabel asc) argmax rule.
    "s25_centroid_classify" -> s"""
      WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),
      st AS (
        SELECT label, i - 1 AS d,
               CAST(sum(CAST(floor(v[i] * ${CentFp}) AS BIGINT)) AS BIGINT) AS sfp,
               count(*) AS n
        FROM e, range(1, 65) t(i) GROUP BY 1, 2
      ),
      cent AS (
        SELECT label AS clabel,
               list(CAST(sfp AS DOUBLE) / CAST(n AS DOUBLE) / ${CentFp}
                 ORDER BY d) AS cv
        FROM st GROUP BY 1
      ),
      cn AS (SELECT clabel, cv,
                    sqrt(${ExtensionQueries.dotSql("cv", "cv")}) AS cnrm
             FROM cent),
      en AS (SELECT vec_id, label, v,
                    sqrt(${ExtensionQueries.dotSql("v", "v")}) AS nrm
             FROM e),
      scored AS (
        SELECT en.vec_id, en.label, cn.clabel,
               ${ExtensionQueries.dotSql("en.v", "cn.cv")} / (en.nrm * cn.cnrm) AS cos
        FROM en, cn
      ),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, clabel ASC) AS rn
        FROM scored
      ),
      agg AS (
        SELECT label, clabel AS assigned, count(*) AS n
        FROM r WHERE rn = 1 GROUP BY 1, 2
      )
      SELECT label, assigned, CAST(n AS BIGINT) AS n,
             floor(CAST(n AS DOUBLE)
               / CAST(sum(n) OVER (PARTITION BY label) AS DOUBLE)
               * 1000000 + 0.5) / 1000000 AS frac
      FROM agg ORDER BY label, assigned""",

    // Count-Min replay: identical seeded 48-bit hashes (collisions
    // included), identical counter grid, identical min-over-rows point
    // estimates for the identical deterministic probe set.
    "q88_countmin" -> s"""
      WITH words AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
      ),
      hashed AS (
        SELECT i AS row_i, ${cmsBucketSql("i", "term")} AS bucket
        FROM words, range(0, $CmsDepth) t(i)
      ),
      counters AS (
        SELECT row_i, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2
      ),
      probes AS (
        SELECT term, count(*) AS true_cnt FROM words GROUP BY 1
        ORDER BY true_cnt DESC, term ASC LIMIT $CmsProbes
      ),
      pb AS (
        SELECT p.term, p.true_cnt, i AS row_i,
               ${cmsBucketSql("i", "p.term")} AS bucket
        FROM probes p, range(0, $CmsDepth) t(i)
      ),
      est AS (
        SELECT pb.term, pb.true_cnt, min(c.cnt) AS est_cnt
        FROM pb JOIN counters c ON pb.row_i = c.row_i AND pb.bucket = c.bucket
        GROUP BY 1, 2
      )
      SELECT term, CAST(true_cnt AS BIGINT) AS true_cnt,
             CAST(est_cnt AS BIGINT) AS est_cnt,
             CAST(est_cnt - true_cnt AS BIGINT) AS overcount
      FROM est ORDER BY term""",

    // Cluster-split replay: d07's banded candidate pairs + unrolled label
    // propagation verbatim, then the d12 hex-bucket rule applied to the
    // CLUSTER id.
    "d18_cluster_split" -> s"""
      WITH ${ExtensionQueries.featuresCte},
      banded AS (
        SELECT doc_id, 0 AS band_idx, ${ExtensionQueries.bandSql(0)} AS bh FROM doc_feat
        UNION ALL SELECT doc_id, 1, ${ExtensionQueries.bandSql(1)} FROM doc_feat
        UNION ALL SELECT doc_id, 2, ${ExtensionQueries.bandSql(2)} FROM doc_feat
        UNION ALL SELECT doc_id, 3, ${ExtensionQueries.bandSql(3)} FROM doc_feat
      ),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
      ),
      l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
      ${ExtensionQueries.labelPropCtes(ExtensionQueries.ClusterRounds)},
      b AS (
        SELECT id AS doc_id, label AS cluster_id,
               CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(label AS VARCHAR)), 1, 1)) - 1 AS INTEGER) AS bucket
        FROM l${ExtensionQueries.ClusterRounds}
      )
      SELECT doc_id, cluster_id,
             CASE WHEN bucket <= 12 THEN 'train'
                  WHEN bucket <= 14 THEN 'validation'
                  ELSE 'test' END AS split
      FROM b ORDER BY doc_id""",

    // Coverage replay: identical total-order vocab, identical membership
    // aggregation, identical rounding.
    "t30_vocab_coverage" -> s"""
      WITH words AS (
        SELECT source,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
      ),
      vocab AS (
        SELECT term FROM words GROUP BY term
        ORDER BY count(*) DESC, term ASC LIMIT $VocabSize
      ),
      flagged AS (
        SELECT w.source,
               CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
        FROM words w LEFT JOIN vocab v ON w.term = v.term
      )
      SELECT source, count(*) AS n_tokens,
             CAST(sum(oov) AS BIGINT) AS n_oov,
             floor(CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               * 1000000 + 0.5) / 1000000 AS oov_rate
      FROM flagged GROUP BY source ORDER BY source""",

    // Attribution replay: e11's gaps-and-islands session CTEs (exact
    // integer micros, strict-> split rule), the same two interval joins,
    // the same per-purchase window count and fixed-point credit split.
    "e15_linear_attribution" -> s"""
      WITH e AS (
        SELECT event_id, user_id, event_type, value,
               CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
      ),
      m AS (
        SELECT *, CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > CAST($SessionGapSec AS BIGINT) * 1000000
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      s AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
      ),
      sess AS (
        SELECT user_id, sid, min(us) AS start_us,
               max(us) + CAST($SessionGapSec AS BIGINT) * 1000000 AS end_us
        FROM s GROUP BY 1, 2
      ),
      pur AS (
        SELECT p.event_id AS p_id, p.user_id, p.us AS p_us, p.value,
               sess.start_us
        FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        JOIN sess ON p.user_id = sess.user_id
          AND p.us >= sess.start_us AND p.us < sess.end_us
      ),
      j AS (
        SELECT pur.p_id, pur.value, t.event_type AS touch_type
        FROM pur JOIN e t ON t.user_id = pur.user_id
          AND t.event_type <> 'purchase'
          AND t.us >= pur.start_us AND t.us <= pur.p_us
      ),
      n AS (
        SELECT *, count(*) OVER (PARTITION BY p_id) AS n_touches FROM j
      ),
      c AS (
        SELECT touch_type, p_id,
               CAST(floor(value * 1000000 / n_touches) AS BIGINT) AS credit_fp
        FROM n
      )
      SELECT touch_type, count(*) AS n_credits,
             count(DISTINCT p_id) AS n_purchases,
             floor(CAST(sum(credit_fp) AS DOUBLE) / 1000000
               * 10000 + 0.5) / 10000 AS credit
      FROM c GROUP BY touch_type ORDER BY touch_type""",

    // Keyframe replay: m07's space-padded gray frames and integer SADs,
    // the same (sad desc, frame asc) argmax, md5 over the same frame
    // bytes (ASCII fixture text: chars == bytes).
    "m10_keyframe_extract" -> s"""
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
        SELECT doc_id, s, fi,
               CAST(list_sum(list_transform(
                 range(0, ${Multimodal.VidFrameBytes}), j ->
                   abs(ascii(substr(s,
                         CAST(fi * ${Multimodal.VidFrameBytes} + j + 1
                           AS INTEGER), 1))
                     - ascii(substr(s,
                         CAST((fi - 1) * ${Multimodal.VidFrameBytes} + j + 1
                           AS INTEGER), 1))))) AS BIGINT) AS sad
        FROM p
      ),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY sad DESC, fi ASC) AS rn
        FROM d
      )
      SELECT doc_id, CAST(fi AS INTEGER) AS kf_frame, sad AS kf_sad,
             md5(substr(s, CAST(fi * ${Multimodal.VidFrameBytes} + 1 AS INTEGER),
               ${Multimodal.VidFrameBytes})) AS kf_md5
      FROM r WHERE rn = 1 ORDER BY doc_id"""
  )
}
