package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-12 LLM-pipeline extensions (continues [[ExtensionQueries5]], split
  * for file hygiene): the index-selection table — graded retrieval metrics
  * across the WHOLE ANN family — and the session-attribution join that
  * consumes e11's published session windows. Same contract as the earlier
  * extension files: every query deterministic with a DuckDB oracle.
  */
object ExtensionQueries6 {

  import ExtensionQueries5.{KnnK, IdcgFp, SessionGapSec}

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The (method name → ranked retrieval) table s22 evaluates: every ANN
    * index the engine ships, each producing (query_id, vec_id, rank) —
    * registered query bodies where one exists, the shared stage-1 builders
    * for the quantized scans' pre-rescore rankings. Names sort identically
    * in both engines (lowercase ASCII).
    */
  private def annMethods(s: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    def rk(df: DataFrame) = df.withColumnRenamed("approx_rank", "rank")
    Seq(
      "ivf_label" -> ExtensionQueries.all("s04_knn_ivf")(s, dir),
      "ivf_learned" -> ExtensionQueries.all("s05_knn_ivf_learned")(s, dir),
      "pq" -> ExtensionQueries2.all("s09_knn_pq")(s, dir),
      "ivfpq" -> ExtensionQueries2.all("s11_knn_ivfpq")(s, dir),
      "int8_stage1" -> rk(ExtensionQueries5.int8Ranked(s, dir, KnnK)),
      "int8_rescore" -> ExtensionQueries5.all("s17_knn_int8_rescore")(s, dir),
      "binary_stage1" -> rk(ExtensionQueries5.binaryRanked(s, dir, KnnK)),
      "binary_rescore" -> ExtensionQueries5.all("s21_knn_binary_rescore")(s, dir))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Whole-family graded retrieval metrics (s22): recall@k, MRR and nDCG@k
    // for EVERY ANN index the engine ships — IVF (label-routed and
    // learned), PQ, IVF-PQ, and both quantized two-stage scans with their
    // stage-1-only counterparts — against the exact brute-force top-k as
    // graded truth. This is the table a serving team picks an index by:
    // s19 grades only the two SRP-LSH retrievers, and recall alone (s08/
    // s20) cannot see ranking quality; putting the stage-1-only rows
    // beside the rescored rows makes the value of the rescore stage a
    // measurable number per method (Round12Spec asserts rescored nDCG
    // dominates stage-1-only for both quantized families). Scale shape:
    // each retriever is its already-scale-shaped registered plan; the
    // metric joins are on (query_id, vec_id) — k rows per query per
    // method — so the evaluation itself adds no data-scale work.
    "s22_ann_method_metrics" -> ((s, dir) => {
      val (exact, queries) = ExtensionQueries5.gradedTruth(s, dir)
      annMethods(s, dir)
        .map { case (name, df) =>
          ExtensionQueries5.gradedMetrics(exact, queries, name, df)
        }
        .reduce(_.unionAll(_))
        .orderBy(col("method"), col("query_id"))
    }),

    // Session attribution (e13): join each purchase event to the session
    // window that contains it — the downstream consumer e11's published
    // [start, last+gap) bounds exist to serve (revenue-per-session,
    // time-to-purchase). Sessions of one user never overlap (a new session
    // requires a gap STRICTLY > the merge gap, so next.start > prev.end),
    // hence every purchase lands in exactly one session. Scale shape: ONE
    // equi-join keyed on user_id (both sides shuffle once on the same
    // key), the interval predicate evaluated inside the matched key group
    // — per-user session counts are bounded, so no broadcast and no range
    // explosion; time-into-session is exact integer micros.
    "e13_session_attribution" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val sessions = graft.streaming.EventStreams
        .sessionWindowed(events, SessionGapSec)
        .select(col("user_id").as("s_user"), col("session_start"),
          col("session_end"), col("n_events").as("session_events"))
      events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .join(sessions, col("user_id") === col("s_user") &&
          col("ts") >= col("session_start") && col("ts") < col("session_end"))
        .select(col("event_id"), col("user_id"), col("session_start"),
          col("session_events"),
          (unix_micros(col("ts")) - unix_micros(col("session_start")))
            .as("us_into_session"),
          col("value"))
        .orderBy(col("event_id"))
    })
  )

  // ---- DuckDB SQL mirrors ----

  /** One metrics CTE per method: hits, fixed-point DCG, first relevant
    * rank — over a ranked CTE `a_<name>(query_id, vec_id, rank)`.
    */
  private def metricsBlockSql(name: String): String = s"""
      m_$name AS (
        SELECT a.query_id,
               CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_hits,
               CAST(sum(CASE WHEN t.vec_id IS NOT NULL
                 THEN ${ExtensionQueries5.ndcgWeightSql("a.rank")} ELSE 0 END)
                 AS BIGINT) AS dcg_fp,
               min(CASE WHEN t.vec_id IS NOT NULL THEN a.rank END)
                 AS first_hit
        FROM a_$name a
        LEFT JOIN truth t
          ON a.query_id = t.query_id AND a.vec_id = t.vec_id
        GROUP BY 1
      )"""

  /** One union arm per method: the s19 metric formulas over `m_<name>`,
    * every query present (left join from the exact query set).
    */
  private def unionArmSql(name: String): String = s"""
        SELECT '$name' AS method, qs.query_id,
               coalesce(m.n_hits, 0) AS n_hits,
               floor(coalesce(m.n_hits, 0) / CAST($KnnK AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS recall,
               floor(CASE WHEN m.first_hit IS NOT NULL
                 THEN 1.0 / m.first_hit ELSE 0.0 END * 1000000 + 0.5)
                 / 1000000 AS mrr,
               floor(CAST(coalesce(m.dcg_fp, 0) AS DOUBLE) / $IdcgFp
                 * 1000000 + 0.5) / 1000000 AS ndcg
        FROM qs LEFT JOIN m_$name m ON qs.query_id = m.query_id"""

  /** The registered per-method oracles replayed as scoped subqueries (each
    * carries its own WITH — the g01 composition pattern), plus the shared
    * stage-1 CTE chains for the two pre-rescore rankings.
    */
  private def annMethodSql: Seq[(String, String)] = {
    def sub(oracle: String) =
      s"(SELECT query_id, vec_id, rank FROM ($oracle))"
    def stage1(chain: String, ranked: String) = s"""(
      SELECT query_id, vec_id, approx_rank AS rank FROM (
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),$chain
        SELECT * FROM $ranked WHERE approx_rank <= $KnnK
      ) st
    )"""
    Seq(
      "ivf_label" -> sub(ExtensionQueries.oracles("s04_knn_ivf")),
      "ivf_learned" -> sub(ExtensionQueries.oracles("s05_knn_ivf_learned")),
      "pq" -> sub(ExtensionQueries2.oracles("s09_knn_pq")),
      "ivfpq" -> sub(ExtensionQueries2.oracles("s11_knn_ivfpq")),
      "int8_stage1" -> stage1(ExtensionQueries5.int8StageSql, "r1i"),
      "int8_rescore" -> sub(ExtensionQueries5.oracles("s17_knn_int8_rescore")),
      "binary_stage1" -> stage1(ExtensionQueries5.binaryStageSql, "r1b"),
      "binary_rescore" -> sub(ExtensionQueries5.oracles("s21_knn_binary_rescore")))
  }

  val oracles: Map[String, String] = Map(

    // Metrics replay: the exact-truth CTE is the s01 oracle; every method's
    // ranked set is that method's own (individually hash-verified) oracle
    // as a scoped subquery; the metric formulas are s19's, with the same
    // integer-literal nDCG weights.
    "s22_ann_method_metrics" -> {
      val names = annMethodSql.map(_._1)
      val rankedCtes = annMethodSql
        .map { case (n, sql) => s"a_$n AS (SELECT * FROM $sql r)" }
        .mkString(",\n      ")
      s"""
      WITH truth AS (
        SELECT query_id, vec_id
        FROM (${ExtensionQueries.oracles("s01_knn_brute")}) b
      ),
      qs AS (SELECT DISTINCT query_id FROM truth),
      $rankedCtes,
      ${names.map(metricsBlockSql).mkString(",")}
      SELECT method, query_id, n_hits, recall, mrr, ndcg FROM (
        ${names.map(unionArmSql).mkString(" UNION ALL ")}
      ) u ORDER BY method, query_id"""
    },

    // Attribution replay: e11's gaps-and-islands session CTEs (exact
    // integer micros, strict-> split rule), purchases joined to their
    // containing [start, start-of-next) interval.
    "e13_session_attribution" -> s"""
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
        SELECT user_id, sid, min(ts) AS session_start, min(us) AS start_us,
               max(us) + CAST($SessionGapSec AS BIGINT) * 1000000 AS end_us,
               count(*) AS session_events
        FROM s GROUP BY 1, 2
      )
      SELECT p.event_id, p.user_id, sess.session_start, sess.session_events,
             p.us - sess.start_us AS us_into_session, p.value
      FROM (SELECT * FROM e WHERE event_type = 'purchase') p
      JOIN sess ON p.user_id = sess.user_id
        AND p.us >= sess.start_us AND p.us < sess.end_us
      ORDER BY p.event_id"""
  )
}
