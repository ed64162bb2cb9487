package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Agg, Kmeans}
import graft.sources.Tables

/** Round-13 additions: the convergence discipline applied to index
  * training (s32), ahead-of-the-petabyte LSH banding design (d20), and a
  * persisted inverted-index lake table with term-pruned serving (t32) —
  * the stored-artifact pattern (q84/s24/q94/q95) extended to lexical
  * retrieval. Same contract as every extension file: deterministic
  * results (fixed-point or all-integer aggregates, canonical ORDER BY),
  * each query carrying a DuckDB oracle.
  */
object ExtensionQueries8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** s32 training budget: [[ExtensionQueries.IvfCells]] cells (so the
    * oracle shares s05's training-CTE generator), cap 40 — a pure runaway
    * guard, far above the measured convergence depth (see
    * [[KmConvOracleUnroll]]).
    */
  val KmConvMaxIters = 40

  /** The oracle's fixed Lloyd unroll. Must be ≥ the measured convergence
    * depth at BOTH oracle scales (sf0.001 / sf0.01) — past the fixed
    * point every extra unrolled round is a no-op (assignment is a pure
    * function of centroids, recompute of an unchanged assignment returns
    * the same centroids), so the unrolled oracle equals the converged
    * engine. Measured depths (graft.tools.KmDepth): 13 at sf0.001, 25 at
    * sf0.01 (30 at sf0.1 and 127 at sf1, engine-only scales — the growth
    * that makes full-corpus exact convergence a per-scale cost and
    * motivates s33's bounded-sample form) — hence 30 here: ≥ +5 margin
    * at both oracle scales. Round13bSpec pins engine-converged ==
    * engine-fixed(unroll) on the fixture, which is exactly that
    * idempotence margin.
    */
  val KmConvOracleUnroll = 30

  /** s33's fixed training-sample size: the top-[[KmSampleN]] vectors by
    * the seed hash rank — a deterministic, scale-INDEPENDENT sample, so
    * the Lloyd depth on it is bounded however big the corpus grows. This
    * is the production answer to the depth growth s32's measurements
    * exposed (13 → 25 → 30 → cap-trip at sf0.001 → 0.01 → 0.1 → sf1):
    * exact full-corpus convergence is a per-scale cost, sample-trained
    * convergence is a constant one.
    */
  val KmSampleN = 250

  /** s33's oracle replay rounds — ≥ the measured SAMPLE convergence
    * depths with margin (same idempotence argument as
    * [[KmConvOracleUnroll]]). Measured sample depths (graft.tools.KmDepth
    * with sample=250): 8 / 9 / 6 / 5 at sf0.001 / 0.01 / 0.1 / sf1 —
    * bounded and FLAT across scales by construction (the sample size is
    * fixed), vs the full corpus's growing 13 / 25 / 30 / 127.
    */
  val KmSampleOracleUnroll = 16

  /** d20's signature budget: the 12 minhash slots d14 already computes —
    * the tuning table prices every (bands × rows) factorization of the
    * SAME signature a deployment has already paid for.
    */
  val LshSigSize = 12
  private[graft] val BandGrid: Seq[(Int, Int)] =
    Seq(1 -> 12, 2 -> 6, 3 -> 4, 4 -> 3, 6 -> 2, 12 -> 1)

  /** Collision S-curve threshold (1/b)^(1/r) for a (b, r) scheme,
    * computed ONCE driver-side and spliced into both engines as the same
    * literal — fractional pow is the one piece of this math whose last
    * ulp is not guaranteed identical across libms, so neither engine
    * computes it.
    */
  private def sStar(b: Int, r: Int): Double = math.pow(1.0 / b, 1.0 / r)

  /** The collision probability 1 − (1 − s^r)^b as an EXPLICIT
    * left-associated product expression over a column named `s` — integer
    * exponents unrolled to repeated IEEE multiplication, which both
    * engines evaluate bit-identically (no pow(), no libm).
    */
  private[graft] def pCollideSql(b: Int, r: Int): String = {
    val sr = "(" + Seq.fill(r)("s").mkString(" * ") + ")"
    val miss = s"(1.0 - $sr)"
    val missB = "(" + Seq.fill(b)(miss).mkString(" * ") + ")"
    s"(1.0 - $missB)"
  }

  /** d21's verification-threshold grid — bounded, so the sweep's fan-out
    * and its aggregation key space are constants.
    */
  private[graft] val DedupThresholds: Seq[Double] =
    Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

  /** t32 lake geometry: postings partitioned by a term-hash bucket so a
    * query's terms prune to their buckets' directories at the scan.
    */
  val IndexBuckets = 8

  /** Driver-side mirror of [[ExtensionQueries3.md5Hash48]] for literal
    * terms (first 48 md5 bits as a long) — lets the serving query compute
    * its probe buckets at PLAN time, so partition pruning needs no
    * engine-side hash of the probe set.
    */
  private[graft] def md5Hash48Lit(v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Until-convergence k-means (s32): the round-13 convergence
    // discipline — "a fixed iteration budget silently ships the wrong
    // answer once the data outgrows it" — applied to INDEX TRAINING.
    // s05 trains its IVF router with a fixed 2-iteration budget (fine
    // for routing); this operator runs Lloyd to the actual fixed point
    // (recompute∘assign idempotent), detected exactly from the k
    // collected centroid rows, capped at [[KmConvMaxIters]] as a runaway
    // guard. Scale shape: every iteration is the same constant-size plan
    // — corpus × broadcast(k literal centroids) + one explode/agg
    // shuffle — because the k·64 centroid doubles are re-emitted as a
    // literal each round (bounded, planner-side; never a data-scale
    // collect), so lineage cannot grow however deep convergence runs.
    // The oracle replays a FIXED [[KmConvOracleUnroll]]-round training
    // run ≥ the measured depth: past the fixed point extra rounds are
    // no-ops, so both engines land on identical centroids — the same
    // unroll-vs-adaptive argument d07's oracle uses.
    "s32_kmeans_converged" -> ((s, dir) => {
      val e = ExtensionQueries.embeddingsD(s, dir)
        .select(col("vec_id"), col("v"))
      val (cent, assigned, _) = Kmeans.fitConverged(e,
        k = ExtensionQueries.IvfCells, maxIters = KmConvMaxIters)
      val sizes = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"))
      cent.select(col("cell"), posexplode(col("cv")).as(Seq("dim", "val")))
        .join(sizes, Seq("cell"))
        .select(col("cell"), col("n_members"), col("dim"),
          Agg.roundAt(col("val"), 6).as("centroid"))
        .orderBy(col("cell"), col("dim"))
    }),

    // Sample-trained k-means (s33): s32's scale remedy. s32 proved exact
    // full-corpus convergence depth GROWS with data (and trips any fixed
    // cap eventually — measured at 10×); the production shape trains to
    // the fixed point on a FIXED-SIZE deterministic sample (the seed
    // hash-rank's top-[[KmSampleN]] prefix — the k seeds are therefore
    // identical to s32's) where depth is bounded at any corpus scale,
    // then assigns the FULL corpus in ONE row-local pass against the
    // trained literals. Scale shape: training cost is constant in corpus
    // size (sample rows × bounded depth); the only full-corpus work is
    // one shuffle-free assignment projection + one count aggregate.
    "s33_kmeans_sampled" -> ((s, dir) => {
      val e = ExtensionQueries.embeddingsD(s, dir)
        .select(col("vec_id"), col("v"))
      val samp = e.withColumn("hrank",
          pmod(pmod(col("vec_id"), lit(1000003L)) * lit(427799L), lit(1000003L)))
        .orderBy(col("hrank"), col("vec_id")).limit(KmSampleN)
        .select(col("vec_id"), col("v"))
      val (cent, _, _) = Kmeans.fitConverged(samp,
        k = ExtensionQueries.IvfCells, maxIters = KmConvMaxIters)
      val cents = cent.collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
      val sizes = Kmeans.assignLiteral(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      cent.select(col("cell"), posexplode(col("cv")).as(Seq("dim", "val")))
        .join(sizes, Seq("cell"))
        .select(col("cell"), col("n_members"), col("dim"),
          Agg.roundAt(col("val"), 6).as("centroid"))
        .orderBy(col("cell"), col("dim"))
    }),

    // LSH banding design table (d20): for every (bands × rows)
    // factorization of the signature budget, the expected behavior of
    // the banding scheme over the OBSERVED pair-similarity distribution
    // (d14's signature-estimated Jaccard, the table a deployment tunes
    // from when the exact join is unaffordable): collision threshold
    // s* = (1/b)^(1/r), expected candidate volume Σ p(s), expected
    // missed true dups Σ_{dup}(1−p), expected false candidates
    // Σ_{non-dup} p. This is the decision a 100 TB dedup run makes
    // BEFORE it runs — candidate volume is the join cost, missed dups
    // the quality cost — priced here from sketch state alone. Float
    // discipline: p is unrolled IEEE multiplication (no pow), s* a
    // driver-side literal, per-pair p fixed-pointed to 1e6 BEFORE the
    // integer sums, so partitioning can never reorder double adds.
    // Scale shape: ONE pass over the candidate table — each pair row
    // explodes a literal 6-struct array (one per (b,r) scheme), so the
    // d14 subtree executes once (the first form unioned six branch
    // SELECTs and re-ran the whole estimate pipeline per scheme:
    // measured 59 s at sf1 vs 11 s for d14 itself; this form is one
    // d14 execution + a 6× row fan-out of 4-field structs into a
    // 6-group aggregate). (The pair population is the surfaced
    // candidate set — at 100 TB substitute a uniform pair sample for
    // the unconditioned curve; the arithmetic is identical.)
    "d20_lsh_band_tuning" -> ((s, dir) => {
      val pairs = ExtensionQueries.all("d14_minhash_estimate")(s, dir)
        .select(col("est_jaccard").as("s"), col("jaccard"))
      val schemes = array(BandGrid.map { case (b, r) =>
        struct(lit(b).as("bands"), lit(r).as("rows_per_band"),
          lit(sStar(b, r)).as("s_star_raw"),
          floor(expr(pCollideSql(b, r)) * 1e6).cast("long").as("p_fp"))
      }: _*)
      pairs.select(explode(schemes).as("g"), col("jaccard"))
        .select(col("g.bands").as("bands"),
          col("g.rows_per_band").as("rows_per_band"),
          col("g.s_star_raw").as("s_star_raw"),
          col("g.p_fp").as("p_fp"), col("jaccard"))
        .groupBy(col("bands"), col("rows_per_band"), col("s_star_raw"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("p_fp")).as("cand_fp"),
          sum(when(col("jaccard") >= 0.5, lit(1000000L) - col("p_fp"))
            .otherwise(0L)).as("missed_fp"),
          sum(when(col("jaccard") < 0.5, col("p_fp"))
            .otherwise(0L)).as("false_fp"))
        .select(col("bands"), col("rows_per_band"),
          Agg.roundAt(col("s_star_raw"), 6).as("s_star"),
          col("n_pairs"),
          (col("cand_fp").cast("double") / 1e6).as("exp_candidates"),
          (col("missed_fp").cast("double") / 1e6).as("exp_missed_dups"),
          (col("false_fp").cast("double") / 1e6).as("exp_false_candidates"))
        .orderBy(col("rows_per_band"))
    }),

    // A/B experiment analysis (e17): per event type, a Welch z-test of
    // the event-value mean between the two user-hash variants — the
    // decision read-out every experimentation platform computes. Float
    // discipline: n, Σv and Σv² are EXACT (count + DECIMAL(30,6) sums —
    // v·v is one IEEE multiply, identical in both engines), so the mean
    // / variance / z doubles derive deterministically from exact inputs
    // through an op-for-op identical formula; z fixed-points at 1e6 and
    // the significance flag compares the ROUNDED z, so both engines gate
    // on identical values. Scale shape: one events scan → one 2·|types|-
    // group partial-aggregated shuffle; everything after is a |types|-row
    // self-merge.
    "e17_ab_test" -> ((s, dir) => {
      val perVariant = abVariantMoments(t(s, dir, "events"))
        .withColumn("mean", col("sv") / col("n"))
        .withColumn("variance",
          (col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
      val a = perVariant.filter(col("variant") === 0)
        .select(col("event_type"), col("n").as("n_a"),
          col("mean").as("mean_a"), col("variance").as("var_a"))
      val b = perVariant.filter(col("variant") === 1)
        .select(col("event_type"), col("n").as("n_b"),
          col("mean").as("mean_b"), col("variance").as("var_b"))
      a.join(b, Seq("event_type"))
        .withColumn("z", Agg.roundAt(
          (col("mean_b") - col("mean_a")) /
            sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 6))
        .select(col("event_type"), col("n_a"), col("n_b"),
          Agg.roundAt(col("mean_a"), 6).as("mean_a"),
          Agg.roundAt(col("mean_b"), 6).as("mean_b"),
          col("z").as("z_score"),
          (abs(col("z")) >= 1.959964).as("significant"))
        .orderBy(col("event_type"))
    }),

    // A/B conversion-rate test (e18): e17's binary-metric sibling — the
    // two-proportion z-test on converted-user rates (a user converts if
    // they have ≥1 HIGH-VALUE purchase — value > 90; a bare "any
    // purchase" definition saturates this fixture at rate 1.0 for both
    // variants, where the pooled variance is 0 and the z-statistic is
    // undefined — ANSI mode correctly refuses the 0/0 rather than
    // shipping a NaN verdict). All inputs are exact integers
    // (distinct-user counts), the pooled-variance z derives through an
    // op-for-op identical formula, significance gates on the ROUNDED z —
    // together e17 (continuous metric) and e18 (binary metric) are the
    // two read-outs every experimentation platform ships. Scale shape:
    // one events scan → per-user conversion flags (one user-keyed
    // partial-agg shuffle) → a 2-row variant aggregate.
    "e18_ab_conversion" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 90, 1)
          .otherwise(0)).as("converted"))
        .withColumn("variant", (col("user_id") % 2).cast("int"))
      val pv = perUser.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
      val a = pv.filter(col("variant") === 0)
        .select(col("n").as("n_a"), col("c").as("conv_a"))
      val b = pv.filter(col("variant") === 1)
        .select(col("n").as("n_b"), col("c").as("conv_b"))
      a.crossJoin(b)
        .withColumn("rate_a", col("conv_a").cast("double") / col("n_a"))
        .withColumn("rate_b", col("conv_b").cast("double") / col("n_b"))
        .withColumn("pool",
          (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b")))
        .withColumn("z", Agg.roundAt(
          (col("rate_b") - col("rate_a")) /
            sqrt(col("pool") * (lit(1.0) - col("pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          Agg.roundAt(col("rate_a"), 6).as("rate_a"),
          Agg.roundAt(col("rate_b"), 6).as("rate_b"),
          col("z").as("z_score"),
          (abs(col("z")) >= 1.959964).as("significant"))
    }),

    // Near-dup threshold sweep (d21): d20 prices the CANDIDATE-GENERATION
    // knob (bands × rows); this prices the VERIFICATION knob — for each
    // Jaccard threshold on the exact pair similarities, how many pairs
    // verify as duplicates and how many documents are touched. Together
    // they are the two decisions a dedup run makes before the petabyte
    // pass. One pass over the d04 verified pairs (the d20 explode
    // pattern: each pair row fans out to the bounded threshold grid,
    // then to its two doc sides), ONE aggregation per bounded threshold
    // key: pair count recovered exactly as doc-rows DIV 2, doc exposure
    // as a distinct count — never a collected array (a collect_list of
    // pair ids would be an unbounded aggregation buffer at 100 TB).
    "d21_dedup_threshold_sweep" -> ((s, dir) => {
      val feats = ExtensionQueries.docFeatures(s, dir)
      val pairs = graft.operators.Dedup.lshCandidatePairs(feats, bands = 4, rows = 3)
      val scored = graft.operators.Dedup.jaccardOnPairs(pairs, feats)
        .select(col("doc_a"), col("doc_b"),
          Agg.roundAt(col("jaccard"), 4).as("j"))
      scored.select(col("doc_a"), col("doc_b"), col("j"),
          explode(typedLit(DedupThresholds)).as("threshold"))
        .filter(col("j") >= col("threshold"))
        .select(col("threshold"),
          explode(array(col("doc_a"), col("doc_b"))).as("doc"))
        .groupBy(col("threshold"))
        .agg(expr("count(1) DIV 2").as("n_dup_pairs"),
          countDistinct(col("doc")).as("n_docs_touched"))
        .orderBy(col("threshold"))
    }),

    // Dedup-weighted token budget (t33): raw vs EFFECTIVE token counts
    // per source, where each document's tokens are down-weighted by its
    // d07 duplicate-cluster size (a doc duplicated 5× contributes its
    // tokens once, not five times). This is the number a training-data
    // buyer actually wants — "how many unique tokens do I have" — and it
    // composes two audited pipelines (d07's converged clusters, t01's
    // tokenization) joined on doc_id. Exact integer arithmetic: the
    // per-doc weight is (n_tokens · 1e6) DIV cluster_size, summed as
    // longs, so partitioning can never reorder float adds. Scale shape:
    // cluster sizes are one count over the (memoized) cluster table; the
    // weighting is a row-local join + one |sources|-group aggregate.
    "t33_dedup_weighted_tokens" -> ((s, dir) => {
      val clusters = ExtensionQueries.all("d07_dedup_clusters")(s, dir)
        .select(col("doc_id"), col("cluster_id"))
      val sizes = clusters.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("csize"))
      val tok = t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      tok.join(clusters, Seq("doc_id")).join(sizes, Seq("cluster_id"))
        .withColumn("eff_fp", expr("n_tokens * 1000000L DIV csize"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("raw_tokens"),
          sum(col("eff_fp")).as("eff_fp"))
        .select(col("source"), col("n_docs"), col("raw_tokens"),
          (col("eff_fp").cast("double") / 1e6).as("effective_tokens"),
          Agg.roundAt(col("eff_fp").cast("double") / 1e6 /
            col("raw_tokens"), 6).as("unique_fraction"))
        .orderBy(col("source"))
    }),

    // Persisted inverted-index lake table + term-pruned BM25 serving
    // (t32): t25 recomputes corpus statistics per query — the right
    // correctness baseline, the wrong operational shape. This builds the
    // index ONCE as lake artifacts (the q94/q95 pattern, lexical twin):
    // postings (term, doc_id, tf, dl) partitioned by a term-hash bucket,
    // per-term document frequencies, and the 1-row corpus stats — then
    // SERVES the query reading only index state: the postings scan is
    // pruned to the probe terms' hash-bucket partitions (bucket literals
    // computed at plan time) with the term filter pushed to parquet, df
    // and corpus stats broadcast from their own artifacts. At 100 TB the
    // build is one tokenize+aggregate ingest pass, and a query's cost is
    // the probe terms' posting rows — never a corpus rescan. Postings
    // carry dl (impact-style denormalization) so scoring joins nothing
    // doc-sized. Scoring math is t25's bit-for-bit (same fixed-point
    // idf/tf discipline), so the round trip build → partition → prune →
    // serve provably changes nothing: the oracle is t25's, computed
    // end-to-end from raw documents.
    "t32_inverted_index_lake" -> ((s, dir) => {
      import ExtensionQueries4.{Bm25Terms, Bm25K}
      val toks = split(lower(trim(col("text"))), "\\s+")
      val docs = t(s, dir, "documents")
      val base = docs.select(col("doc_id"), toks.as("tk"))
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("term"))
      val postings = base
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .withColumn("pbucket",
          (ExtensionQueries3.md5Hash48(col("term")) % IndexBuckets).cast("int"))
      val termStats = postings.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
      val corpus = docs.select(size(toks).cast("long").as("dl"))
        .agg(sum(col("dl")).as("S"), count(lit(1)).as("N"))
      val root = graft.sources.Scratch.fresh(s,
        s"inv_index_${new java.io.File(dir).getName}")
      postings.write.mode("overwrite").partitionBy("pbucket")
        .parquet(s"$root/postings")
      termStats.write.mode("overwrite").parquet(s"$root/terms")
      corpus.write.mode("overwrite").parquet(s"$root/corpus")
      // ---- serving: reads ONLY the index artifacts ----
      val probeBuckets = Bm25Terms
        .map(tm => (md5Hash48Lit(tm) % IndexBuckets).toInt).distinct
      val post = s.read.parquet(s"$root/postings")
        .filter(col("pbucket").isInCollection(probeBuckets) &&
          col("term").isInCollection(Bm25Terms))
      val dfs = broadcast(s.read.parquet(s"$root/terms")
        .filter(col("term").isInCollection(Bm25Terms)))
      val st = broadcast(s.read.parquet(s"$root/corpus"))
      post.join(dfs, Seq("term")).crossJoin(st)
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
        .limit(Bm25K)
        .select(col("doc_id"), col("n_hits"), col("score_fp"),
          (col("score_fp").cast("double") / 1e6).as("score"))
    })
  )

  /** The (ccos desc, cell asc) argmax as a lexicographic struct-min over
    * the same cosine arithmetic s05's oracle uses.
    */
  private def argminCellSql(vec: String, cent: String, cell: String): String = {
    import ExtensionQueries.dotSql
    val cos = s"((${dotSql(vec, cent)}) / " +
      s"(sqrt(${dotSql(vec, vec)}) * sqrt(${dotSql(cent, cent)})))"
    s"(min(struct_pack(nc := -$cos, cl := $cell))).cl"
  }

  /** A `rounds`-round Lloyd training run over the rows of `src` (a CTE
    * with (vec_id, v)) as RECURSIVE CTEs `seeds` + `cent(iter, cell, cv,
    * n_members)` — the recursion's working table materializes each
    * round's k centroids, so execution is linear in rounds (the
    * s05-style unrolled CTE chain at depth 30 planned to a 30× inlined
    * expression tree DuckDB spent >10 min on; this form runs in ~1 s).
    * The assignment's rank window becomes [[argminCellSql]] because a
    * window over the recursive table is not expressible there; the
    * cosine expression and the per-(cell,dim) DECIMAL recompute are
    * s05's oracle verbatim, so round r's centroids are bit-identical to
    * the engine's round r.
    */
  private def kmRecursionCtes(src: String, rounds: Int): String = s"""
      seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY ((vec_id % 1000003) * 427799) % 1000003, vec_id) - 1 AS INTEGER) AS cell, v
        FROM $src
        QUALIFY row_number() OVER (ORDER BY ((vec_id % 1000003) * 427799) % 1000003, vec_id) <= ${ExtensionQueries.IvfCells}
      ),
      cent(iter, cell, cv, n_members) AS (
        SELECT 0, cell, v, CAST(0 AS BIGINT) FROM seeds
        UNION ALL
        SELECT iter, cell, list(c ORDER BY dim) AS cv, min(cnt) AS n_members
        FROM (
          SELECT a.iter, a.cell, CAST(i AS INTEGER) AS dim,
                 CAST(sum(CAST(a.v[i+1] AS DECIMAL(30,6))) AS DOUBLE) / count(a.v[i+1]) AS c,
                 count(a.v[i+1]) AS cnt
          FROM (
            SELECT t.iter + 1 AS iter, s.vec_id, s.v,
                   ${argminCellSql("s.v", "t.cv", "t.cell")} AS cell
            FROM $src s CROSS JOIN cent t
            WHERE t.iter < $rounds
            GROUP BY 1, 2, 3
          ) a CROSS JOIN range(0, 64) t2(i)
          GROUP BY 1, 2, 3
        ) r
        GROUP BY iter, cell
      )"""

  /** e17's exact per-(event_type, variant) moments — n, Σv, Σv² with
    * decimal sums. Shared VERBATIM by the batch query and the streaming
    * twin: the key space is 2·|event types| (bounded), so as a
    * complete-mode streaming aggregation its state is the moments table
    * itself — the experiment read-out updates continuously while the
    * z-test join stays a tiny batch-side epilogue. StreamingSpec pins
    * stream ≡ batch across a batch split.
    */
  private[graft] def abVariantMoments(events: DataFrame): DataFrame =
    events
      .withColumn("variant", (col("user_id") % 2).cast("int"))
      .groupBy(col("event_type"), col("variant"))
      .agg(count(lit(1)).as("n"), Agg.decSum(col("value")).as("sv"),
        Agg.decSum(col("value") * col("value")).as("svv"))

  val oracles: Map[String, String] = Map(

    // Replays a fixed [[KmConvOracleUnroll]]-round training run over the
    // full corpus — see [[kmRecursionCtes]] for why it is recursive.
    "s32_kmeans_converged" -> s"""
      WITH RECURSIVE
      e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),${kmRecursionCtes("e", KmConvOracleUnroll)}
      SELECT c.cell, c.n_members, CAST(i AS INTEGER) AS dim,
             floor(c.cv[i + 1] * 1000000 + 0.5) / 1000000 AS centroid
      FROM cent c CROSS JOIN range(0, 64) t(i)
      WHERE c.iter = $KmConvOracleUnroll
      ORDER BY cell, dim""",

    // Trains over the hash-rank-prefix sample, then one full-corpus
    // assignment + count — the engine's two phases replayed exactly.
    "s33_kmeans_sampled" -> s"""
      WITH RECURSIVE
      e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
      ),
      samp AS (
        SELECT vec_id, v FROM e
        QUALIFY row_number() OVER (ORDER BY ((vec_id % 1000003) * 427799) % 1000003, vec_id) <= $KmSampleN
      ),${kmRecursionCtes("samp", KmSampleOracleUnroll)},
      final AS (
        SELECT cell, cv FROM cent WHERE iter = $KmSampleOracleUnroll
      ),
      assigned AS (
        SELECT f.vec_id, ${argminCellSql("f.v", "c.cv", "c.cell")} AS cell
        FROM e f CROSS JOIN final c
        GROUP BY f.vec_id, f.v
      ),
      sizes AS (
        SELECT cell, count(*) AS n_members FROM assigned GROUP BY cell
      )
      SELECT c.cell, s.n_members, CAST(i AS INTEGER) AS dim,
             floor(c.cv[i + 1] * 1000000 + 0.5) / 1000000 AS centroid
      FROM final c JOIN sizes s USING (cell)
      CROSS JOIN range(0, 64) t(i)
      ORDER BY cell, dim""",

    // Same unrolled-product collision math over the d14 estimate table.
    "d20_lsh_band_tuning" -> s"""
      WITH pairs AS (
        SELECT est_jaccard AS s, jaccard
        FROM (${ExtensionQueries.oracles("d14_minhash_estimate")})
      ),
      per AS (
        ${BandGrid.map { case (b, r) =>
          s"""SELECT $b AS bands, $r AS rows_per_band,
             CAST(${sStar(b, r)} AS DOUBLE) AS s_star_raw,
             CAST(floor(${pCollideSql(b, r)} * 1000000) AS BIGINT) AS p_fp, jaccard
          FROM pairs"""
        }.mkString("\n        UNION ALL\n        ")}
      )
      SELECT bands, rows_per_band,
             floor(s_star_raw * 1000000 + 0.5) / 1000000 AS s_star,
             count(*) AS n_pairs,
             CAST(sum(p_fp) AS DOUBLE) / 1000000 AS exp_candidates,
             CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1000000 - p_fp ELSE 0 END)
               AS DOUBLE) / 1000000 AS exp_missed_dups,
             CAST(sum(CASE WHEN jaccard < 0.5 THEN p_fp ELSE 0 END)
               AS DOUBLE) / 1000000 AS exp_false_candidates
      FROM per GROUP BY 1, 2, 3 ORDER BY rows_per_band""",

    // Exact n / Σv / Σv² per (type, variant); identical op-for-op mean /
    // variance / z formula; significance gates on the ROUNDED z.
    "e17_ab_test" -> s"""
      WITH pv AS (
        SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv,
               CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS svv
        FROM events GROUP BY 1, 2
      ),
      m AS (
        SELECT event_type, variant, n, sv / n AS mean,
               (svv - sv * sv / n) / (n - 1) AS variance
        FROM pv
      ),
      j AS (
        SELECT a.event_type, a.n AS n_a, b.n AS n_b,
               a.mean AS mean_a, b.mean AS mean_b,
               floor((b.mean - a.mean) / sqrt(a.variance / a.n + b.variance / b.n)
                 * 1000000 + 0.5) / 1000000 AS z_score
        FROM m a JOIN m b ON a.event_type = b.event_type
        WHERE a.variant = 0 AND b.variant = 1
      )
      SELECT event_type, n_a, n_b,
             floor(mean_a * 1000000 + 0.5) / 1000000 AS mean_a,
             floor(mean_b * 1000000 + 0.5) / 1000000 AS mean_b,
             z_score, abs(z_score) >= 1.959964 AS significant
      FROM j ORDER BY event_type""",

    // Exact per-user conversion flags; identical pooled-variance z.
    "e18_ab_conversion" -> s"""
      WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
               max(CASE WHEN event_type = 'purchase' AND value > 90
                 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1
      ),
      pv AS (
        SELECT variant, count(*) AS n, CAST(sum(converted) AS BIGINT) AS c
        FROM pu GROUP BY 1
      ),
      j AS (
        SELECT a.n AS n_a, b.n AS n_b, a.c AS conv_a, b.c AS conv_b,
               CAST(a.c AS DOUBLE) / a.n AS rate_a,
               CAST(b.c AS DOUBLE) / b.n AS rate_b,
               CAST(a.c + b.c AS DOUBLE) / (a.n + b.n) AS pool
        FROM pv a CROSS JOIN pv b
        WHERE a.variant = 0 AND b.variant = 1
      ),
      z AS (
        SELECT n_a, n_b, conv_a, conv_b, rate_a, rate_b,
               floor((rate_b - rate_a) / sqrt(pool * (1.0 - pool)
                 * (1.0 / n_a + 1.0 / n_b)) * 1000000 + 0.5) / 1000000 AS z_score
        FROM j
      )
      SELECT n_a, n_b, conv_a, conv_b,
             floor(rate_a * 1000000 + 0.5) / 1000000 AS rate_a,
             floor(rate_b * 1000000 + 0.5) / 1000000 AS rate_b,
             z_score, abs(z_score) >= 1.959964 AS significant
      FROM z""",

    // d04's verified pairs swept over the same bounded threshold grid;
    // pair count recovered exactly as doc-rows // 2.
    "d21_dedup_threshold_sweep" -> s"""
      WITH scored AS (
        SELECT doc_a, doc_b, jaccard AS j
        FROM (${ExtensionQueries.oracles("d04_jaccard_neardup")})
      ),
      pr AS (
        SELECT CAST(t.threshold AS DOUBLE) AS threshold, s.doc_a, s.doc_b
        FROM scored s
        CROSS JOIN (SELECT unnest([${DedupThresholds.mkString(", ")}]) AS threshold) t
        WHERE s.j >= CAST(t.threshold AS DOUBLE)
      ),
      d AS (
        SELECT threshold, unnest([doc_a, doc_b]) AS doc FROM pr
      )
      SELECT threshold, CAST(count(*) // 2 AS BIGINT) AS n_dup_pairs,
             CAST(count(DISTINCT doc) AS BIGINT) AS n_docs_touched
      FROM d GROUP BY 1 ORDER BY 1""",

    // d07's unrolled propagation + t01's tokenization, composed; the
    // weighting is integer fixed-point so the sums are order-free.
    "t33_dedup_weighted_tokens" -> s"""
      WITH clusters AS (
        SELECT doc_id, cluster_id FROM (${ExtensionQueries.oracles("d07_dedup_clusters")})
      ),
      sizes AS (
        SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY 1
      ),
      tok AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
      ),
      w AS (
        SELECT t.source, t.n_tokens, (t.n_tokens * 1000000) // s.csize AS eff_fp
        FROM tok t JOIN clusters c USING (doc_id) JOIN sizes s USING (cluster_id)
      )
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
             CAST(sum(eff_fp) AS DOUBLE) / 1000000 AS effective_tokens,
             floor(CAST(sum(eff_fp) AS DOUBLE) / 1000000
               / CAST(sum(n_tokens) AS BIGINT) * 1000000 + 0.5) / 1000000 AS unique_fraction
      FROM w GROUP BY source ORDER BY source""",

    // The lake round trip is transparent by construction: serving must
    // equal t25's end-to-end computation from raw documents.
    "t32_inverted_index_lake" -> ExtensionQueries4.oracles("t25_bm25")
  )
}
