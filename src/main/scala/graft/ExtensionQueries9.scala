package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{JoinOps, Linkage}
import graft.sources.Tables

/** Round-17 additions — the operator families the registry still lacked:
  * record linkage (d25 blocked+purged, d26 sorted-neighborhood), the
  * data×data interval-overlap join (e22), distributed sweep-line
  * concurrency (e23), Efraimidis–Spirakis weighted sampling (t39 global
  * budget, t40 per-stratum), and the per-channel image curation gate
  * (m12). Same contract as every extension file: deterministic results
  * (integer/fixed-point aggregates, canonical ORDER BY), each query
  * carrying a DuckDB oracle.
  */
object ExtensionQueries9 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** d25 verify threshold: a candidate pair is a match at Levenshtein
    * edit distance ≤ 2 on the entity name.
    */
  val LinkMaxDist = 2

  /** d25 profile-blocking balance shift: TPC-H acctbal floors at −999.99,
    * and Spark's `div` truncates toward zero while a negative quotient's
    * floor differs — shifting by +1000 keeps the bucket math in the
    * non-negative regime where truncation and floor agree in both
    * engines.
    */
  val LinkBalShift = 1000L

  /** d25 block-purging cap (Linkage.blockedCandidates maxSide): the
    * profile pass's block sizes grow linearly with the corpus (~55 per
    * side at sf1), so without the cap its pair term is quadratic at
    * scale. The name-prefix pass is self-bounding (≤ 10 keys share all
    * but the last digit) and never purges.
    */
  val LinkMaxBlock = 64

  /** d26 sorted-neighborhood window: records from opposite feeds within
    * this many positions of each other in the merged name order are
    * candidates.
    */
  val SnmWindow = 8

  /** d27 purge-cap grid: the maxSide choices the design table prices
    * (caps 1 and 2 exist so the table discriminates even at the small
    * oracle scales where typical blocks hold a handful of rows; the top
    * of the grid brackets the production LinkMaxBlock choice).
    */
  val LinkCapGrid = Seq(1, 2, 4, 8, 16, 32, 64, 128)

  /** d25/d27 linkage fixture — ONE home (the IngestMod rule) for the two
    * keyless feeds and both blocking keys, so the production query (d25)
    * and the purge-cap design table (d27) can never drift apart: the
    * customer registry split into even/odd keys standing in for
    * CRM-vs-billing extracts.
    */
  private def linkSide(c: DataFrame, p: String, even: Boolean): DataFrame = c
    .filter(if (even) col("c_custkey") % 2 === 0
            else col("c_custkey") % 2 =!= 0)
    .select(col("c_custkey").as(s"${p}_key"),
      col("c_name").as(s"${p}_name"),
      col("c_nationkey").as(s"${p}_nation"),
      col("c_mktsegment").as(s"${p}_segment"),
      col("c_acctbal").as(s"${p}_acctbal"))

  /** The (nation, segment, balance-bucket) profile blocking key; see
    * [[LinkBalShift]] for the non-negative-regime shift.
    */
  private def linkProfileKey(p: String): org.apache.spark.sql.Column =
    concat_ws(":",
      col(s"${p}_nation"), col(s"${p}_segment"),
      expr(s"CAST(floor(${p}_acctbal + $LinkBalShift) AS BIGINT)" +
        " div 1000"))

  /** The all-but-the-last-character name blocking key — length-aware, so
    * the block frees exactly one trailing digit (≤ 10 keys) no matter how
    * wide the entity's id printed.
    */
  private def linkNamePrefix(p: String): org.apache.spark.sql.Column =
    expr(s"substr(${p}_name, 1, length(${p}_name) - 1)")

  /** t39 sample size (< the 500-doc oracle fixtures, so selection is a
    * genuine cut at every scale the oracle runs).
    */
  val SampleK = 200

  /** t39 hash-seed prefix, decoupling the sampling uniform from every
    * other md5Hash48 use of doc_id.
    */
  val SampleSeed = "ws"

  /** ln(2^48) as one spliced double literal (48·ln2, computed once in the
    * JVM and rendered shortest-round-trip into both engines — identical
    * bits by construction).
    */
  val Ln2x48: Double = 48.0 * graft.functions.DetLn.Ln2

  /** t40 per-stratum sample size (each fixture source has 25 docs at the
    * oracle scales, so every stratum genuinely cuts).
    */
  val StratumK = 15

  private val d29PriorMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Session-scoped stored artifacts for d29's incremental entity
    * maintenance (the d22PriorRoot pattern — in a deployment, written by
    * yesterday's build job): the PRIOR corpus's converged entity table
    * and its name-key index (pre-keyed rows, so per-ingest maintenance
    * never re-derives the corpus's blocking keys — d17's band-index
    * contract applied to linkage). Prior = customer keys outside the
    * shared [[ExtensionQueries.ingestDelta]] convention. NAME LANE ONLY,
    * by contract: the purged profile lane cannot be maintained
    * incrementally — a delta pushing a block past the cap RETRACTS that
    * block's pairs from the full recompute, but star edges bake the old
    * connectivity in, so incremental equality is provable only for
    * purge-free blocking (the name pass is self-bounding ≤ 10 per side
    * by construction); capped lanes belong to the nightly full rebuild
    * (d28), exactly the q99/q104 split.
    */
  private[graft] def d29PriorRoot(s: SparkSession, dir: String): String = {
    d29PriorMemo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
    d29PriorMemo.computeIfAbsent((s, dir), { _ =>
      val prior = t(s, dir, "customer")
        .filter(ExtensionQueries.priorCorpus(col("c_custkey")))
      val pa = linkSide(prior, "a", even = true)
        .withColumn("k", linkNamePrefix("a"))
        .select(col("k"), col("a_key").as("key"), col("a_name").as("name"),
          lit(0).as("side"))
      val pb = linkSide(prior, "b", even = false)
        .withColumn("k", linkNamePrefix("b"))
        .select(col("k"), col("b_key").as("key"), col("b_name").as("name"),
          lit(1).as("side"))
      val matches = pa.join(pb.select(col("k"), col("key").as("bkey"),
            col("name").as("bname")), "k")
        .filter(levenshtein(col("name"), col("bname")) <= LinkMaxDist)
        .select(col("key").as("doc_a"), col("bkey").as("doc_b"))
      val entities = graft.operators.Dedup.labelClusters(
        prior.select(col("c_custkey").as("id")), matches,
        ExtensionQueries.ClusterMaxRounds)
      val root = graft.sources.Scratch.fresh(s,
        s"d29_prior_${graft.sources.Scratch.dirTag(dir)}")
      graft.sources.Snapshots.commit(s, s"$root/entities", entities)
      graft.sources.Snapshots.commit(s, s"$root/name_index",
        pa.unionByName(pb))
      root
    })
  }

  /** The t39/t40 Efraimidis–Spirakis key, ONE home for both engines (the
    * IngestMod rule): ln(u)/w over documents' (doc_id, n_chars), u from
    * the seeded 48-bit hash. Changing the seed, the +1 offset, or the
    * ln-key formula here changes the global AND stratified cuts
    * together — four call sites cannot drift.
    */
  private def samplingScore: org.apache.spark.sql.Column = {
    val h = ExtensionQueries3.md5Hash48(
      concat(lit(s"$SampleSeed:"), col("doc_id").cast("string")))
    (graft.functions.DetLn.detLn(h + 1) - lit(Ln2x48)) /
      col("n_chars").cast("double")
  }

  /** The oracle's `scored` CTE body mirroring [[samplingScore]]. */
  private def samplingScoredCte: String = s"""scored AS (
        SELECT doc_id, source, n_chars AS weight,
               (${graft.functions.DetLn.detLnSql(
                 s"CAST(('0x' || substr(md5('$SampleSeed:' || doc_id), 1, 12)) AS BIGINT) + 1")}
                - $Ln2x48) / CAST(n_chars AS DOUBLE) AS score
        FROM documents WHERE n_chars > 0
      )"""

  /** t41 total sample budget, apportioned across sources by weight. */
  val MixtureBudget = 300

  /** m12 curation flags, 1e6 fixed-point: a channel is too dark below
    * mean 64, near-flat below population variance 1000 (both cut the
    * fixture's image population meaningfully — ~30% each side at
    * sf0.01).
    */
  val DarkMeanFp = 64L * 1000000L
  val FlatVarFp = 1000L * 1000000L

  /** e22 incident definition: the [[IncidentTopN]] busiest
    * [[IncidentWinSec]]-second aligned windows by error-event count
    * (ties broken by window position). Top-N rather than a fixed count
    * threshold so the incident set is meaningful at every fixture scale
    * — a Poisson-tail threshold flips between "everything" and "nothing"
    * as event density grows 10× per decade in the fixture's fixed
    * 30-day span.
    */
  val IncidentTopN = 1000
  val IncidentWinSec = 600
  val IncidentWinMicros: Long = IncidentWinSec * 1000000L

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Record linkage / entity resolution (d25): match records across two
    // systems that share no key — here the customer registry split into
    // two feeds (even/odd keys) standing in for CRM-vs-billing extracts.
    // The tabular twin of the d02–d04 text pipeline, same two-phase scale
    // shape: BLOCKING equi-joins (an all-but-the-last-character name
    // pass + a (nation, segment, balance-bucket) profile pass — the
    // LSH-band analog; all-pairs never runs, the pairwise term is Σ|A_k|·|B_k|
    // over block keys), union deduped ONCE before scoring, then VERIFY =
    // codegen'd Levenshtein ≤ 2 and best-match resolution per left
    // record (min distance, then min right key). Blocking recall < 1 is
    // the real-world contract: a pair no pass co-keys is never scored —
    // deterministic and auditable, like choosing LSH bands. The profile
    // pass's block sizes grow linearly with the corpus, so it runs under
    // block PURGING (maxSide = LinkMaxBlock): oversized blocks drop
    // whole, capping every block's pair term — without it d25's sf1 line
    // was measured at 15.4 s (quadratic candidates), with it the name
    // pass (self-bounding ≤ 10-key blocks) carries the matches.
    "d25_record_linkage" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val cands = Linkage.blockedCandidates(
        linkSide(c, "a", even = true), linkSide(c, "b", even = false),
        Seq(
          (linkNamePrefix("a"), linkNamePrefix("b")),
          (linkProfileKey("a"), linkProfileKey("b"))),
        maxSide = LinkMaxBlock)
      val scored = cands
        .withColumn("distance", levenshtein(col("a_name"), col("b_name")))
        .filter(col("distance") <= LinkMaxDist)
      Linkage.bestMatch(scored, "a_key", "distance", "b_key")
        .select(col("a_key"), col("a_name"), col("b_key"), col("b_name"),
          col("distance"))
        .orderBy(col("a_key"))
    }),

    // Deterministic weighted sampling WITHOUT replacement (t39): the
    // Efraimidis–Spirakis one-pass reservoir — each doc draws a uniform
    // u from the portable 48-bit hash and ranks by ln(u)/w (the log form
    // of u^(1/w)); the top-K ranked docs are EXACTLY a weighted sample
    // without replacement, inclusion probability ∝ weight (here n_chars,
    // size-proportional corpus subsampling — the draw d15's
    // proportional-threshold mixture cannot give: a fixed sample SIZE,
    // weights respected, no replacement, no RNG). Determinism: u =
    // (h+1)/2^48 so ln u = DetLn(h+1) − 48·ln2 — every transcendental is
    // the shared DetLn over a positive integer, identical bits in both
    // engines; the divide by w and the subtraction are IEEE
    // correctly-rounded on identical inputs. Scale shape: one scan, one
    // TakeOrdered top-K (per-partition heaps, never a global sort) —
    // the 100 TB corpus never shuffles.
    "t39_weighted_sample" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("source"),
          col("n_chars").as("weight"), samplingScore.as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(SampleK)
        .orderBy(col("doc_id"))),

    // Per-channel image statistics (m12): the brightness/contrast
    // curation gate a vision pipeline runs before training — per
    // (image, channel), exact integer Σbyte/Σbyte² through the REAL PPM
    // decode, mean and population variance as 1e6 fixed-point, and the
    // too-dark / near-flat flags that drop no-signal images. Completes
    // the image-quality lane beside m11's duplicate lens (dedup finds
    // the same image twice; this finds images not worth keeping once).
    // Scale shape: embarrassingly parallel partition-local decode (the
    // m02/m07 shape), zero shuffle before the output sort.
    "m12_image_channel_stats" -> ((s, dir) =>
      graft.operators.Multimodal.channelStats(
        graft.operators.Multimodal.mediaFromDocuments(
          t(s, dir, "documents")),
        DarkMeanFp, FlatVarFp).toDF()
        .orderBy(col("doc_id"), col("channel"))),

    // Stratified weighted sampling (t40): t39's Efraimidis–Spirakis key
    // cut PER STRATUM — exactly StratumK docs per source, inclusion
    // within each stratum ∝ n_chars, no replacement, no RNG. The
    // per-source quota a mixture design (t34) hands to the sampler:
    // t39 fills a GLOBAL budget (heavy sources can dominate), t40
    // enforces the per-source allocation. Scale shape: the global
    // TakeOrdered becomes one rank window partitioned by source — a
    // single keyed shuffle, per-stratum heaps never meet.
    "t40_stratified_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("source"),
          col("n_chars").as("weight"), samplingScore.as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("rk") <= StratumK)
        .select(col("doc_id"), col("source"), col("weight"), col("score"),
          col("rk").cast("int").as("rk"))
        .orderBy(col("doc_id"))
    }),

    // Mixture-budget sampling (t41): the t34→t40 loop closed — a GLOBAL
    // budget apportioned across sources by weight (largest-remainder /
    // Hamilton method: base = floor(B·w/W), the B−Σbase leftovers go to
    // the largest fractional remainders, ties by source — exact integer
    // arithmetic, |alloc − quota| < 1 guaranteed), then each source's
    // allocation filled by the deterministic Efraimidis–Spirakis cut.
    // t39 fills a budget ignoring sources, t40 fixes K per source; t41
    // is what a training run actually executes: the designed mixture,
    // enforced to the document. Scale shape: the allocation table is
    // source-cardinality rows out of one aggregate (its rank window is
    // bounded by construction); docs take one source-keyed rank window
    // and a broadcast-sized alloc join — the corpus shuffles once.
    "t41_mixture_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("n_chars") > 0)
      val ws = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("w"))
      val a1 = ws.crossJoin(ws.agg(sum(col("w")).as("wtot")))
        .withColumn("base", expr(s"$MixtureBudget * w div wtot"))
        .withColumn("rem", expr(s"($MixtureBudget * w) % wtot"))
      val a2 = a1.withColumn("xrk", row_number().over(
        Window.orderBy(col("rem").desc, col("source").asc)))
      val alloc = a2.crossJoin(a2.agg(sum(col("base")).as("bsum")))
        .withColumn("alloc",
          (col("base") + when(col("xrk") <= lit(MixtureBudget) - col("bsum"),
            1L).otherwise(0L)).cast("int"))
        .select(col("source").as("a_source"), col("alloc"))
      docs
        .select(col("doc_id"), col("source"),
          col("n_chars").as("weight"), samplingScore.as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("doc_id").asc)))
        .join(alloc, col("source") === col("a_source"))
        .filter(col("rk") <= col("alloc"))
        .select(col("doc_id"), col("source"), col("weight"), col("score"),
          col("rk").cast("int").as("rk"), col("alloc"))
        .orderBy(col("doc_id"))
    }),

    // Sorted-neighborhood linkage (d26): blocking's classic complement
    // on the same two keyless feeds as d25 — both sides merge into ONE
    // totally-ordered list on the entity name and records from opposite
    // feeds within SnmWindow positions pair up. Where d25's blocks need
    // a key to match EXACTLY, the sorted neighborhood tolerates
    // key-local noise (close names sort together with no block key
    // agreeing), and candidate volume is ≤ 2·window per record BY
    // CONSTRUCTION — no purging needed. Scale shape: global positions
    // via the two-phase range-partition + per-partition rank +
    // bounded-offset prefix (Linkage.withGlobalPositions — never a
    // one-partition global window), then the positional band join as
    // the e22 bucket decomposition. Same verify + resolution as d25.
    "d26_sorted_neighborhood" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").as("a_key"), col("c_name").as("a_name"))
      val b = c.filter(col("c_custkey") % 2 =!= 0)
        .select(col("c_custkey").as("b_key"), col("c_name").as("b_name"))
      val cands = Linkage.sortedNeighborhood(a, b,
        col("a_name"), col("b_name"), "a_key", "b_key", SnmWindow)
      val scored = cands
        .withColumn("distance", levenshtein(col("a_name"), col("b_name")))
        .filter(col("distance") <= LinkMaxDist)
      Linkage.bestMatch(scored, "a_key", "distance", "b_key")
        .select(col("a_key"), col("a_name"), col("b_key"), col("b_name"),
          col("distance"))
        .orderBy(col("a_key"))
    }),

    // Purge-cap design table (d27): the decision d25's LinkMaxBlock=64
    // encodes, PRICED instead of asserted — for every cap in
    // LinkCapGrid, what the blocking scheme keeps and what it finds:
    // per pass the joint blocks surviving the cap and their pair term
    // Σ na·nb (the join cost the cap bounds), and across passes the
    // DEDUPLICATED candidate count plus the verified matches
    // (Levenshtein ≤ LinkMaxDist) those candidates contain (the recall
    // the cap buys). The d20 discipline applied to linkage: candidate
    // volume is the cost axis, matches found the quality axis, and a
    // deployment cites the row, not a guess. One evaluation per pair:
    // block memberships are counted ONCE per pass; each candidate is
    // generated once at the grid's loosest cap carrying min-over-passes
    // of its block's max(side) — the smallest cap that admits it — so
    // the per-cap table is a cumulative sum over a ≤|grid|-row
    // aggregate, never a re-run of blocking per cap. Scale shape: two
    // keyed count aggregates + the same bounded equi-joins as d25 at
    // cap gridMax (the table's own cost is the gridMax row's cost);
    // every post-pair structure is grid- or block-cardinality-sized.
    "d27_linkage_cap_tuning" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val a = linkSide(c, "a", even = true)
      val b = linkSide(c, "b", even = false)
      val gridMax = LinkCapGrid.max
      val capsLit = array(LinkCapGrid.map(lit(_)): _*)
      // smallest grid cap admitting a block of max side m (null: none)
      def firstCap(m: org.apache.spark.sql.Column) =
        LinkCapGrid.foldRight(lit(null).cast("int")) { (cp, acc) =>
          when(m <= cp, lit(cp)).otherwise(acc)
        }
      // cumulative per-cap table out of a ≤|grid|-row first-cap
      // aggregate: explode each row to every cap ≥ its first cap, union
      // a zero row per cap so empty caps still appear
      def perCap(stats: DataFrame, c1: String, c2: String,
          out1: String, out2: String) = {
        val zeros = LinkCapGrid.map(cp => (cp, 0L, 0L)).toDF("cap", c1, c2)
        stats
          .select(explode(capsLit).as("cap"), col("first_cap"),
            col(c1), col(c2))
          .filter(col("cap") >= col("first_cap"))
          .select("cap", c1, c2)
          .unionByName(zeros)
          .groupBy("cap")
          .agg(sum(col(c1)).as(out1), sum(col(c2)).as(out2))
      }
      // per-pass joint-block stats (block-key cardinality, tiny)
      def blockStats(keyA: org.apache.spark.sql.Column,
          keyB: org.apache.spark.sql.Column) = {
        val ga = a.groupBy(keyA.as("k")).agg(count(lit(1)).as("na"))
          .filter(col("k").isNotNull)
        val gb = b.groupBy(keyB.as("k")).agg(count(lit(1)).as("nb"))
          .filter(col("k").isNotNull)
        ga.join(gb, "k")
          .select(firstCap(greatest(col("na"), col("nb"))).as("first_cap"),
            (col("na") * col("nb")).as("p"))
          .filter(col("first_cap").isNotNull)
          .groupBy("first_cap")
          .agg(count(lit(1)).as("blocks"), sum(col("p")).as("pairs"))
      }
      // candidates at the loosest grid cap, each carrying the smallest
      // cap that admits it through SOME pass (membership window shares
      // the join's own shuffle key — the blockedCandidates shape)
      def passPairs(keyA: org.apache.spark.sql.Column,
          keyB: org.apache.spark.sql.Column) = {
        val ka = a.withColumn("k", keyA)
          .withColumn("na", count(lit(1)).over(Window.partitionBy(col("k"))))
          .filter(col("k").isNotNull && col("na") <= gridMax)
        val kb = b.withColumn("k", keyB)
          .withColumn("nb", count(lit(1)).over(Window.partitionBy(col("k"))))
          .filter(col("k").isNotNull && col("nb") <= gridMax)
        ka.join(kb, "k")
          .select(col("a_key"), col("a_name"), col("b_key"), col("b_name"),
            greatest(col("na"), col("nb")).as("route_max"))
      }
      val candAgg = passPairs(linkNamePrefix("a"), linkNamePrefix("b"))
        .unionByName(passPairs(linkProfileKey("a"), linkProfileKey("b")))
        .groupBy("a_key", "a_name", "b_key", "b_name")
        .agg(min(col("route_max")).as("min_max"))
        .select(firstCap(col("min_max")).as("first_cap"),
          when(levenshtein(col("a_name"), col("b_name")) <= LinkMaxDist,
            1L).otherwise(0L).as("mt"))
        .groupBy("first_cap")
        .agg(count(lit(1)).as("cands"), sum(col("mt")).as("matches"))
      perCap(blockStats(linkNamePrefix("a"), linkNamePrefix("b")),
          "blocks", "pairs", "name_blocks", "name_pairs")
        .join(perCap(blockStats(linkProfileKey("a"), linkProfileKey("b")),
          "blocks", "pairs", "profile_blocks", "profile_pairs"), "cap")
        .join(perCap(candAgg, "cands", "matches",
          "n_candidates", "n_matches"), "cap")
        .orderBy("cap")
    }),

    // Entity groups (d28): the linkage family's last stage — the
    // verified match graph collapsed into ENTITIES. d25 answers "which
    // record over there is this record?" (best match per record, a 1:1
    // read-out); d28 answers "which records, across BOTH feeds, are the
    // same real-world thing?": connected components over ALL verified
    // matches (dist ≤ LinkMaxDist, pre-resolution — two records joined
    // through a chain of matches are one entity even when they never
    // matched directly), every record labeled with its component's
    // minimum key as the canonical entity id; unmatched records are
    // their own singleton entity. Reuses the d07 cluster engine
    // (star-contraction to the min-label fixed point, O(log diameter)
    // alternations, memoized) on the purged blocking's match edges —
    // blocking → verify → resolution → ENTITY FORMATION, the full ER
    // pipeline. Scale shape: candidates are block-purged equi-joins
    // (never all-pairs), the component pass is the same bounded-round
    // machinery d07 runs at corpus scale.
    "d28_entity_groups" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val matches = Linkage.blockedCandidates(
          linkSide(c, "a", even = true), linkSide(c, "b", even = false),
          Seq(
            (linkNamePrefix("a"), linkNamePrefix("b")),
            (linkProfileKey("a"), linkProfileKey("b"))),
          maxSide = LinkMaxBlock)
        .filter(levenshtein(col("a_name"), col("b_name")) <= LinkMaxDist)
        .select(col("a_key").as("doc_a"), col("b_key").as("doc_b"))
      graft.operators.Dedup.labelClusters(
          c.select(col("c_custkey").as("id")), matches,
          maxRounds = ExtensionQueries.ClusterMaxRounds)
        .select(col("id").as("record_key"), col("label").as("entity_id"))
        .orderBy(col("record_key"))
    }),

    // Incremental entity MAINTENANCE (d29): the d22 discipline applied
    // to the linkage family — when the day's new records arrive, update
    // the converged ENTITY TABLE itself without re-matching history.
    // SERVING FORM: the prior entity assignment and the prior corpus's
    // name-key index are read from stored Snapshots tables (built once
    // per session by [[d29PriorRoot]]; in a deployment, by yesterday's
    // build job), so this query prices ONLY the per-ingest pass: key the
    // delta, join it against the stored index (plus delta×delta), verify
    // the new candidates, and propagate over { prior-entity star edges ∪
    // new match edges }. Stars preserve exactly the prior components'
    // connectivity, so the result provably equals a full re-match of the
    // whole corpus — including a delta record BRIDGING two previously
    // separate entities — while prior×prior matching never runs again.
    // NAME LANE ONLY by contract (see [[d29PriorRoot]]): purged lanes
    // can retract pairs when a delta crosses the cap, which star edges
    // cannot un-bake; those belong to the nightly full rebuild (d28).
    // The oracle is the purge-free name-lane full recompute — equality
    // IS the contract.
    "d29_incremental_entities" -> ((s, dir) => {
      val root = d29PriorRoot(s, dir)
      val priorEnt = graft.sources.Snapshots.readLatest(s, s"$root/entities")
      val index = graft.sources.Snapshots.readLatest(s, s"$root/name_index")
      val full = t(s, dir, "customer")
      val deltaC = full.filter(ExtensionQueries.ingestDelta(col("c_custkey")))
      val dA = linkSide(deltaC, "a", even = true)
        .withColumn("k", linkNamePrefix("a"))
        .select(col("k"), col("a_key").as("key"), col("a_name").as("name"))
      val dB = linkSide(deltaC, "b", even = false)
        .withColumn("k", linkNamePrefix("b"))
        .select(col("k"), col("b_key").as("key"), col("b_name").as("name"))
      val pA = index.filter(col("side") === 0).select("k", "key", "name")
      val pB = index.filter(col("side") === 1).select("k", "key", "name")
      // every new match has a delta record on some side, exactly once:
      // deltaA × (priorB ∪ deltaB), plus priorA × deltaB
      def pairs(l: DataFrame, r: DataFrame) = l
        .join(r.select(col("k"), col("key").as("rkey"),
          col("name").as("rname")), "k")
        .filter(levenshtein(col("name"), col("rname")) <= LinkMaxDist)
        .select(col("key").as("doc_a"), col("rkey").as("doc_b"))
      val newEdges = pairs(dA, pB.unionByName(dB)).unionByName(pairs(pA, dB))
      val stars = priorEnt.select(col("id").as("doc_a"),
        col("label").as("doc_b"))
      graft.operators.Dedup.labelClusters(
          full.select(col("c_custkey").as("id")),
          stars.unionByName(newEdges), ExtensionQueries.ClusterMaxRounds)
        .select(col("id").as("record_key"), col("label").as("entity_id"))
        .orderBy(col("record_key"))
    }),

    // Incident-exposure interval join (e22): which user sessions ran
    // through a platform incident, with no shared key between the two
    // interval sets — sessions are per-user, incidents are global. The
    // data×data interval-overlap join (JoinOps.intervalOverlapJoin):
    // both sides decompose into aligned time buckets, meet on a plain
    // bucket equi-join + exact closed-interval predicate, and each
    // overlapping pair is attributed to exactly ONE bucket (the one
    // containing max(starts)) so the output needs no pair-scale dedup.
    // Neither side is ever broadcast or collected — the incident list
    // happens to be bounded here (top-N windows over a fixed span), but
    // the plan is the one that survives when it isn't (maintenance
    // windows, regional outages, per-tenant incident feeds at 100 TB).
    // Fixture-honesty note: pair volume scales with interval DENSITY,
    // and ScaleUp compresses 10× events into the same 30-day span — the
    // all-error-windows form grows its pair count ~100× per decade
    // (1.8 M at sf0.1), which no real corpus does; the top-N incident
    // definition keeps the production row's cost linear in sessions.
    "e22_incident_exposure" -> ((s, dir) => {
      val W = IncidentWinMicros
      val ev = t(s, dir, "events")
      val winCounts = ev.filter(col("event_type") === "error")
        .select(expr(s"unix_micros(ts) div $W").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_errors"))
      // global rank over span/width ≤ ~4.3k rows — bounded by the time
      // span, never by data volume
      val incidents = winCounts
        .withColumn("rk", row_number().over(
          Window.orderBy(col("n_errors").desc, col("bucket").asc)))
        .filter(col("rk") <= IncidentTopN)
        .select((col("bucket") * W).as("w_start"),
          (col("bucket") * W + lit(W - 1)).as("w_end"),
          col("n_errors"))
      val sess = graft.streaming.EventStreams
        .sessionWindowed(ev, ExtensionQueries5.SessionGapSec)
        .select(col("user_id"), col("session_start"), col("session_end"),
          unix_micros(col("session_start")).as("s_start"),
          unix_micros(col("session_end")).as("s_end"))
      JoinOps.intervalOverlapJoin(sess, incidents,
          "s_start", "s_end", "w_start", "w_end", W)
        .groupBy(col("user_id"), col("session_start"), col("session_end"))
        .agg(count(lit(1)).as("n_incident_windows"),
          sum(col("n_errors")).as("n_incident_errors"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // Peak session concurrency per time window (e23): the load curve a
    // capacity planner reads — max sessions simultaneously open in each
    // aligned 10-minute bucket, plus the bucket's net change. The
    // textbook sweep-line is ONE global sort + running sum (a single
    // partition at 100 TB); EventOps.peakConcurrencyByBucket keeps the
    // data-scale work partitioned: local prefix maxima inside each
    // bucket in parallel, then the cross-bucket base as a prefix sum
    // over PER-BUCKET nets — span/width rows, bounded by the time span,
    // never by data volume. The aggregate answer to "what overlapped
    // when" that e22's pair listing cannot afford to materialize.
    "e23_peak_concurrency" -> ((s, dir) => {
      val W = IncidentWinMicros
      val sess = graft.streaming.EventStreams
        .sessionWindowed(t(s, dir, "events"),
          ExtensionQueries5.SessionGapSec)
        .select(unix_micros(col("session_start")).as("s_start"),
          unix_micros(col("session_end")).as("s_end"))
      graft.operators.EventOps
        .peakConcurrencyByBucket(sess, "s_start", "s_end", W)
        .select((col("bucket") * W).as("w_start"), col("peak"), col("net"))
        .orderBy(col("w_start"))
    }))

  def oracles: Map[String, String] = Map(

    // Linkage replay: both blocking joins, UNION + DISTINCT, the same
    // Levenshtein threshold, the same (distance, b_key) best-match rank.
    "d25_record_linkage" -> s"""
      WITH a AS (
        SELECT c_custkey AS a_key, c_name AS a_name,
               c_nationkey AS a_nation, c_mktsegment AS a_segment,
               c_acctbal AS a_acctbal
        FROM customer WHERE c_custkey % 2 = 0
      ),
      b AS (
        SELECT c_custkey AS b_key, c_name AS b_name,
               c_nationkey AS b_nation, c_mktsegment AS b_segment,
               c_acctbal AS b_acctbal
        FROM customer WHERE c_custkey % 2 <> 0
      ),
      ap AS (
        SELECT *, a_nation || ':' || a_segment || ':' ||
               CAST(floor(a_acctbal + $LinkBalShift) AS BIGINT) // 1000
               AS a_prof
        FROM a QUALIFY count(*) OVER (PARTITION BY a_nation, a_segment,
          CAST(floor(a_acctbal + $LinkBalShift) AS BIGINT) // 1000)
          <= $LinkMaxBlock
      ),
      bp AS (
        SELECT *, b_nation || ':' || b_segment || ':' ||
               CAST(floor(b_acctbal + $LinkBalShift) AS BIGINT) // 1000
               AS b_prof
        FROM b QUALIFY count(*) OVER (PARTITION BY b_nation, b_segment,
          CAST(floor(b_acctbal + $LinkBalShift) AS BIGINT) // 1000)
          <= $LinkMaxBlock
      ),
      an AS (
        SELECT * FROM a QUALIFY count(*) OVER (
          PARTITION BY substr(a_name, 1, length(a_name) - 1))
          <= $LinkMaxBlock
      ),
      bn AS (
        SELECT * FROM b QUALIFY count(*) OVER (
          PARTITION BY substr(b_name, 1, length(b_name) - 1))
          <= $LinkMaxBlock
      ),
      cand AS (
        SELECT DISTINCT a_key, a_name, b_key, b_name FROM (
          SELECT a_key, a_name, b_key, b_name FROM an JOIN bn
            ON substr(a_name, 1, length(a_name) - 1)
             = substr(b_name, 1, length(b_name) - 1)
          UNION ALL
          SELECT a_key, a_name, b_key, b_name FROM ap JOIN bp
            ON a_prof = b_prof
        )
      ),
      scored AS (
        SELECT *, levenshtein(a_name, b_name) AS distance FROM cand
        WHERE levenshtein(a_name, b_name) <= $LinkMaxDist
      ),
      best AS (
        SELECT *, row_number() OVER (
          PARTITION BY a_key ORDER BY distance, b_key) AS rk
        FROM scored
      )
      SELECT a_key, a_name, b_key, b_name,
             CAST(distance AS INTEGER) AS distance
      FROM best WHERE rk = 1 ORDER BY a_key""",

    // Weighted-sample replay: the same 48-bit uniform, the same DetLn
    // rendering of ln(u), the same rank-and-cut.
    "t39_weighted_sample" -> s"""
      WITH $samplingScoredCte,
      cut AS (
        SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT $SampleK
      )
      SELECT doc_id, source, weight, score FROM cut ORDER BY doc_id""",

    // Channel-stats replay: every pixel byte re-read from the text
    // raster (the m04 convention: chars == bytes for the ASCII fixture,
    // rpad truncates-or-pads to exactly W·H·3), the same integer
    // fixed-point mean/variance, flags on the same integers.
    "m12_image_channel_stats" -> s"""
      WITH img AS (
        SELECT doc_id,
               rpad(text, ${3 * graft.operators.Multimodal.ImgW *
                 graft.operators.Multimodal.ImgH}, ' ') AS raster
        FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 0
      ),
      ch AS (
        SELECT doc_id, c AS channel,
               CAST(list_sum(list_transform(range(0, ${graft.operators
                 .Multimodal.ImgW * graft.operators.Multimodal.ImgH}),
                 i -> ascii(substr(raster,
                   CAST(i * 3 + c AS INTEGER) + 1, 1)))) AS BIGINT) AS psum,
               CAST(list_sum(list_transform(range(0, ${graft.operators
                 .Multimodal.ImgW * graft.operators.Multimodal.ImgH}),
                 i -> ascii(substr(raster, CAST(i * 3 + c AS INTEGER) + 1, 1))
                    * ascii(substr(raster,
                        CAST(i * 3 + c AS INTEGER) + 1, 1)))) AS BIGINT)
                 AS psumsq
        FROM img, (SELECT unnest([0, 1, 2]) AS c)
      ),
      fp AS (
        SELECT doc_id, CAST(channel AS INTEGER) AS channel, psum, psumsq,
               psum * 1000000 // ${graft.operators.Multimodal.ImgW *
                 graft.operators.Multimodal.ImgH} AS mean_fp,
               (${graft.operators.Multimodal.ImgW *
                 graft.operators.Multimodal.ImgH} * psumsq - psum * psum)
                 * 1000000
                 // ${(graft.operators.Multimodal.ImgW.toLong *
                   graft.operators.Multimodal.ImgH) *
                   (graft.operators.Multimodal.ImgW.toLong *
                     graft.operators.Multimodal.ImgH)} AS var_fp
        FROM ch
      )
      SELECT doc_id, channel, psum, psumsq, mean_fp, var_fp,
             mean_fp < $DarkMeanFp AS too_dark,
             var_fp < $FlatVarFp AS low_contrast
      FROM fp ORDER BY doc_id, channel""",

    // Stratified-sample replay: identical scores, rank within source.
    "t40_stratified_sample" -> s"""
      WITH $samplingScoredCte,
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY score DESC, doc_id) AS rk
        FROM scored
      )
      SELECT doc_id, source, weight, score, CAST(rk AS INTEGER) AS rk
      FROM ranked WHERE rk <= $StratumK ORDER BY doc_id""",

    // Mixture-sample replay: same integer apportionment (floor quotas,
    // largest-remainder leftovers, source tie-break), same scores, same
    // per-source rank cut.
    "t41_mixture_sample" -> s"""
      WITH ws AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS w
        FROM documents WHERE n_chars > 0 GROUP BY 1
      ),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS wtot FROM ws),
      a1 AS (
        SELECT source, w,
               $MixtureBudget * w // wtot AS base,
               ($MixtureBudget * w) % wtot AS rem
        FROM ws, tot
      ),
      a2 AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS xrk
        FROM a1
      ),
      bs AS (SELECT CAST(sum(base) AS BIGINT) AS bsum FROM a2),
      alloc AS (
        SELECT source,
               CAST(base + CASE WHEN xrk <= $MixtureBudget - bsum
                                THEN 1 ELSE 0 END AS INTEGER) AS alloc
        FROM a2, bs
      ),
      $samplingScoredCte,
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY score DESC, doc_id) AS rk
        FROM scored
      )
      SELECT doc_id, r.source, weight, score,
             CAST(rk AS INTEGER) AS rk, alloc
      FROM ranked r JOIN alloc a ON r.source = a.source
      WHERE rk <= alloc ORDER BY doc_id""",

    // Sorted-neighborhood replay: one merged row_number order (name,
    // side, id — the same total order), the |Δpos| ≤ window pairing,
    // the same Levenshtein threshold and best-match rank.
    "d26_sorted_neighborhood" -> s"""
      WITH a AS (
        SELECT c_custkey AS a_key, c_name AS a_name
        FROM customer WHERE c_custkey % 2 = 0
      ),
      b AS (
        SELECT c_custkey AS b_key, c_name AS b_name
        FROM customer WHERE c_custkey % 2 <> 0
      ),
      u AS (
        SELECT a_name AS k, 0 AS side, a_key AS id FROM a
        UNION ALL
        SELECT b_name, 1, b_key FROM b
      ),
      p AS (
        SELECT *, row_number() OVER (ORDER BY k, side, id) AS pos FROM u
      ),
      cand AS (
        SELECT pa.id AS a_key, pa.k AS a_name, pb.id AS b_key,
               pb.k AS b_name
        FROM p pa JOIN p pb
          ON pa.side = 0 AND pb.side = 1
         AND abs(pa.pos - pb.pos) <= $SnmWindow
      ),
      scored AS (
        SELECT *, levenshtein(a_name, b_name) AS distance FROM cand
        WHERE levenshtein(a_name, b_name) <= $LinkMaxDist
      ),
      best AS (
        SELECT *, row_number() OVER (
          PARTITION BY a_key ORDER BY distance, b_key) AS rk
        FROM scored
      )
      SELECT a_key, a_name, b_key, b_name,
             CAST(distance AS INTEGER) AS distance
      FROM best WHERE rk = 1 ORDER BY a_key""",

    // Entity-group replay: d25's candidate CTEs (same QUALIFY purge),
    // the verify filter, then TRUE connected components via a recursive
    // reachability CTE (UNION-dedup'd label flooding: every (record,
    // reachable-label) pair, then min per record). Depth-INDEPENDENT on
    // purpose — the linkage match graph chains profile cliques through
    // name cliques and its diameter at sf0.01 already exceeds the d07
    // oracle's unrolled ClusterRounds (measured: the 8-round replay
    // under-merged entity 1110's chain), so a fixed-round mirror would
    // pin the wrong thing; the engine side is the exact fixed point by
    // construction (Round18Spec union-find) and the oracle now is too.
    // The closure's row count is Σ per-component size² — fine at the
    // compared scales (the driver never oracle-compares above sf0.01).
    "d28_entity_groups" -> s"""
      WITH RECURSIVE a AS (
        SELECT c_custkey AS a_key, c_name AS a_name,
               c_nationkey AS a_nation, c_mktsegment AS a_segment,
               c_acctbal AS a_acctbal
        FROM customer WHERE c_custkey % 2 = 0
      ),
      b AS (
        SELECT c_custkey AS b_key, c_name AS b_name,
               c_nationkey AS b_nation, c_mktsegment AS b_segment,
               c_acctbal AS b_acctbal
        FROM customer WHERE c_custkey % 2 <> 0
      ),
      ap AS (
        SELECT *, a_nation || ':' || a_segment || ':' ||
               CAST(floor(a_acctbal + $LinkBalShift) AS BIGINT) // 1000
               AS a_prof
        FROM a QUALIFY count(*) OVER (PARTITION BY a_nation, a_segment,
          CAST(floor(a_acctbal + $LinkBalShift) AS BIGINT) // 1000)
          <= $LinkMaxBlock
      ),
      bp AS (
        SELECT *, b_nation || ':' || b_segment || ':' ||
               CAST(floor(b_acctbal + $LinkBalShift) AS BIGINT) // 1000
               AS b_prof
        FROM b QUALIFY count(*) OVER (PARTITION BY b_nation, b_segment,
          CAST(floor(b_acctbal + $LinkBalShift) AS BIGINT) // 1000)
          <= $LinkMaxBlock
      ),
      an AS (
        SELECT * FROM a QUALIFY count(*) OVER (
          PARTITION BY substr(a_name, 1, length(a_name) - 1))
          <= $LinkMaxBlock
      ),
      bn AS (
        SELECT * FROM b QUALIFY count(*) OVER (
          PARTITION BY substr(b_name, 1, length(b_name) - 1))
          <= $LinkMaxBlock
      ),
      cand AS (
        SELECT DISTINCT a_key, a_name, b_key, b_name FROM (
          SELECT a_key, a_name, b_key, b_name FROM an JOIN bn
            ON substr(a_name, 1, length(a_name) - 1)
             = substr(b_name, 1, length(b_name) - 1)
          UNION ALL
          SELECT a_key, a_name, b_key, b_name FROM ap JOIN bp
            ON a_prof = b_prof
        )
      ),
      m AS (
        SELECT a_key, b_key FROM cand
        WHERE levenshtein(a_name, b_name) <= $LinkMaxDist
      ),
      edges AS (
        SELECT a_key AS src, b_key AS dst FROM m
        UNION ALL SELECT b_key, a_key FROM m
      ),
      reach(id, label) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.id
      )
      SELECT id AS record_key, min(label) AS entity_id
      FROM reach GROUP BY id ORDER BY record_key""",

    // Incremental-entity oracle: the purge-free NAME-LANE full
    // recompute over the whole corpus — the incremental maintenance
    // pass must land byte-equal to re-matching everything (true-
    // fixpoint recursive reachability, as d28).
    "d29_incremental_entities" -> s"""
      WITH RECURSIVE a AS (
        SELECT c_custkey AS a_key, c_name AS a_name
        FROM customer WHERE c_custkey % 2 = 0
      ),
      b AS (
        SELECT c_custkey AS b_key, c_name AS b_name
        FROM customer WHERE c_custkey % 2 <> 0
      ),
      m AS (
        SELECT a_key, b_key FROM a JOIN b
          ON substr(a_name, 1, length(a_name) - 1)
           = substr(b_name, 1, length(b_name) - 1)
        WHERE levenshtein(a_name, b_name) <= $LinkMaxDist
      ),
      edges AS (
        SELECT a_key AS src, b_key AS dst FROM m
        UNION ALL SELECT b_key, a_key FROM m
      ),
      reach(id, label) AS (
        SELECT c_custkey, c_custkey FROM customer
        UNION
        SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.id
      )
      SELECT id AS record_key, min(label) AS entity_id
      FROM reach GROUP BY id ORDER BY record_key""",

    // Cap-table replay: per-pass block counts once, candidates at the
    // loosest grid cap with min-over-passes max(side), one verify, and
    // the per-cap cumulation as inequality joins against the literal
    // grid (DuckDB-side convenience — the tables joined are grid- or
    // block-cardinality-sized).
    "d27_linkage_cap_tuning" -> s"""
      WITH a AS (
        SELECT c_custkey AS a_key, c_name AS a_name,
               c_nationkey AS a_nation, c_mktsegment AS a_segment,
               c_acctbal AS a_acctbal
        FROM customer WHERE c_custkey % 2 = 0
      ),
      b AS (
        SELECT c_custkey AS b_key, c_name AS b_name,
               c_nationkey AS b_nation, c_mktsegment AS b_segment,
               c_acctbal AS b_acctbal
        FROM customer WHERE c_custkey % 2 <> 0
      ),
      an AS (SELECT a_key, a_name,
               substr(a_name, 1, length(a_name) - 1) AS k FROM a),
      bn AS (SELECT b_key, b_name,
               substr(b_name, 1, length(b_name) - 1) AS k FROM b),
      ap AS (SELECT a_key, a_name, a_nation || ':' || a_segment || ':' ||
               (CAST(floor(a_acctbal + $LinkBalShift) AS BIGINT) // 1000)
               AS k FROM a),
      bp AS (SELECT b_key, b_name, b_nation || ':' || b_segment || ':' ||
               (CAST(floor(b_acctbal + $LinkBalShift) AS BIGINT) // 1000)
               AS k FROM b),
      cna AS (SELECT k, count(*) AS na FROM an GROUP BY 1),
      cnb AS (SELECT k, count(*) AS nb FROM bn GROUP BY 1),
      cpa AS (SELECT k, count(*) AS na FROM ap GROUP BY 1),
      cpb AS (SELECT k, count(*) AS nb FROM bp GROUP BY 1),
      caps AS (SELECT unnest([${LinkCapGrid.mkString(", ")}]) AS cap),
      bkn AS (SELECT greatest(na, nb) AS m, na * nb AS p
              FROM cna JOIN cnb USING (k)),
      bkp AS (SELECT greatest(na, nb) AS m, na * nb AS p
              FROM cpa JOIN cpb USING (k)),
      aggn AS (SELECT cap, count(m) AS name_blocks,
                 coalesce(CAST(sum(p) AS BIGINT), 0) AS name_pairs
               FROM caps LEFT JOIN bkn ON m <= cap GROUP BY cap),
      aggp AS (SELECT cap, count(m) AS profile_blocks,
                 coalesce(CAST(sum(p) AS BIGINT), 0) AS profile_pairs
               FROM caps LEFT JOIN bkp ON m <= cap GROUP BY cap),
      pn AS (SELECT an.a_key, an.a_name, bn.b_key, bn.b_name,
               greatest(cna.na, cnb.nb) AS rm
             FROM an JOIN bn USING (k) JOIN cna USING (k)
               JOIN cnb USING (k)
             WHERE cna.na <= ${LinkCapGrid.max}
               AND cnb.nb <= ${LinkCapGrid.max}),
      pp AS (SELECT ap.a_key, ap.a_name, bp.b_key, bp.b_name,
               greatest(cpa.na, cpb.nb) AS rm
             FROM ap JOIN bp USING (k) JOIN cpa USING (k)
               JOIN cpb USING (k)
             WHERE cpa.na <= ${LinkCapGrid.max}
               AND cpb.nb <= ${LinkCapGrid.max}),
      cand AS (SELECT a_key, a_name, b_key, b_name, min(rm) AS min_max
               FROM (SELECT * FROM pn UNION ALL SELECT * FROM pp)
               GROUP BY 1, 2, 3, 4),
      ver AS (SELECT min_max,
                CASE WHEN levenshtein(a_name, b_name) <= $LinkMaxDist
                     THEN 1 ELSE 0 END AS mt
              FROM cand),
      aggc AS (SELECT cap, count(min_max) AS n_candidates,
                 coalesce(CAST(sum(mt) AS BIGINT), 0) AS n_matches
               FROM caps LEFT JOIN ver ON min_max <= cap GROUP BY cap)
      SELECT caps.cap, name_blocks, name_pairs, profile_blocks,
             profile_pairs, n_candidates, n_matches
      FROM caps JOIN aggn USING (cap) JOIN aggp USING (cap)
        JOIN aggc USING (cap)
      ORDER BY cap""",

    // Incident-exposure replay: same aligned windows (integer-micros
    // div), same top-N tie rule, e11's session CTE, a plain closed-
    // interval overlap join (DuckDB's native IEJoin path), same
    // aggregate.
    "e22_incident_exposure" -> s"""
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        FROM events
      ),
      wc AS (
        SELECT us // $IncidentWinMicros AS bucket, count(*) AS n_errors
        FROM e WHERE event_type = 'error' GROUP BY 1
      ),
      inc AS (
        SELECT bucket * $IncidentWinMicros AS w_start,
               bucket * $IncidentWinMicros + ${IncidentWinMicros - 1} AS w_end,
               n_errors,
               row_number() OVER (ORDER BY n_errors DESC, bucket) AS rk
        FROM wc
      ),
      i AS (SELECT w_start, w_end, n_errors FROM inc WHERE rk <= $IncidentTopN),
      m AS (
        SELECT *, CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >
                            CAST(${ExtensionQueries5.SessionGapSec} AS BIGINT) * 1000000
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sgrp AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
      ),
      sess AS (
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL '${ExtensionQueries5.SessionGapSec} seconds'
                 AS session_end,
               min(us) AS s_start,
               max(us) + CAST(${ExtensionQueries5.SessionGapSec} AS BIGINT) * 1000000
                 AS s_end
        FROM sgrp GROUP BY user_id, sid
      )
      SELECT sess.user_id, sess.session_start, sess.session_end,
             count(*) AS n_incident_windows,
             CAST(sum(i.n_errors) AS BIGINT) AS n_incident_errors
      FROM sess JOIN i ON s_start <= w_end AND w_start <= s_end
      GROUP BY 1, 2, 3
      ORDER BY sess.user_id, sess.session_start""",

    // Concurrency replay: the textbook single-order sweep — the engine's
    // two-level split (per-bucket local maxima + bounded cross-bucket
    // base prefix) must reproduce it exactly. Same −1-before-+1 tie
    // order (the departure at us ended strictly before the arrival at
    // us began), same end+1 departure (closed intervals), same
    // carried-in base competing in the max when the bucket's first
    // delta sits past the bucket start (run before the bucket's first
    // delta = the previous bucket's closing run, lagged with a 0
    // default for the first bucket).
    "e23_peak_concurrency" -> s"""
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
      ),
      m AS (
        SELECT *, CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >
                            CAST(${ExtensionQueries5.SessionGapSec} AS BIGINT) * 1000000
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sgrp AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m
      ),
      sess AS (
        SELECT min(us) AS s_start,
               max(us) + CAST(${ExtensionQueries5.SessionGapSec} AS BIGINT) * 1000000
                 AS s_end
        FROM sgrp GROUP BY user_id, sid
      ),
      d AS (
        SELECT s_start AS us, 1 AS delta FROM sess
        UNION ALL
        SELECT s_end + 1, -1 FROM sess
      ),
      r AS (
        SELECT us // $IncidentWinMicros AS bucket, us, delta,
               sum(delta) OVER (ORDER BY us, delta
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM d
      ),
      pb AS (
        SELECT bucket, max(run) AS max_run, sum(delta) AS net,
               min(us) AS first_us
        FROM r GROUP BY bucket
      ),
      wb AS (
        SELECT *, sum(net) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - net
               AS base
        FROM pb
      )
      SELECT bucket * $IncidentWinMicros AS w_start,
             CAST(CASE WHEN first_us > bucket * $IncidentWinMicros
                       THEN greatest(max_run, base)
                       ELSE max_run END AS BIGINT) AS peak,
             CAST(net AS BIGINT) AS net
      FROM wb ORDER BY w_start""")
}
