package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over embedding vectors — the training step
  * of a LEARNED IVF index (round-2 verdict item #3: real centroids instead
  * of routing on a fixture label column).
  *
  * Everything is reproducible across engines and partitionings:
  *   - seeds are hash-ranked vectors (top-k by `(vec_id * 2654435761) mod
  *     1000003`, vec_id tiebreak) — no RNG, no driver state;
  *   - assignment is argmax cosine with a total (ccos desc, cell asc)
  *     tiebreak;
  *   - centroid recomputation uses exact decimal sums ([[Agg.decAvg]]), so
  *     iteration r's centroids are bit-identical however the corpus is
  *     partitioned — which is what lets a DuckDB oracle replay the whole
  *     training run and hash-match it.
  *
  * Scale shape: each iteration is one broadcast (k centroids) against the
  * partitioned corpus plus one explode+aggregate shuffle — the canonical
  * distributed k-means step, linear per iteration, no driver collection.
  * Iteration count is FIXED (not convergence-tested) to keep the plan
  * statically bounded; 2-3 iterations from spread seeds is the standard
  * IVF-training budget (centroids only need to partition space, not
  * converge).
  */
object Kmeans {

  /** Hash-ranked deterministic seeds: cell ids 0..k-1 in hash order.
    * The rank hash is the modular form ((id mod 1000003) * 427799) mod
    * 1000003 — value-identical to (id * 2654435761) mod 1000003 (427799 =
    * 2654435761 mod 1000003) but overflow-free for 64-bit ids: the direct
    * product overflows Long beyond id ~3.4e9, which ANSI mode turns into a
    * runtime error (found by the 10x scale-up run, whose shifted key
    * spaces exceed that; any production snowflake-style id would too).
    */
  def seedCentroids(e: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("hrank"), col("vec_id"))
    e.select(col("vec_id"), col("v"))
      .withColumn("hrank", pmod(pmod(col("vec_id"), lit(1000003L)) * lit(427799L), lit(1000003L)))
      .orderBy(col("hrank"), col("vec_id")).limit(k)
      // window over exactly k rows — the limit ran distributed (top-k), so
      // this single-partition numbering touches k vectors, not the corpus
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("v").as("cv"))
  }

  /** Assign every vector to its argmax-cosine centroid (cell asc tiebreak).
    *
    * The argmax is a `max_by` AGGREGATE, not a window (r20): the ranking
    * key struct (ccos, −cell) is a total order whose lexicographic max is
    * exactly the window's (ccos desc, cell asc) first row — same values,
    * same tie-break, same NaN-greatest semantics — but the aggregate
    * combines MAP-SIDE, so the shuffle carries one row per vector where
    * the window form shuffled the entire n·k scored cross join. At the
    * fixture's k = 8 that was 8 rows per vector (invisible); at
    * corpus-scaled cell counts (r20's ivfCellsFor: k = n/48) the window
    * form became an n²/48-row shuffle — ~833M rows / ~460 GB at the
    * sf10 audit geometry, found hung there — while this form's shuffle
    * stays n rows at ANY k.
    *
    * NULL-ordering caveat (r20 advice): `max_by` SKIPS rows whose ordering
    * value is NULL, so a NULL vector or centroid (NULL ccos) would drop
    * that candidate where the old window ranked it NULLS LAST. Embeddings
    * and trained centroids are non-null by construction on every fixture
    * and every [[recompute]] output (averages of non-null members), so the
    * two forms pick identical rows; callers feeding nullable vectors must
    * filter them first.
    */
  def assign(e: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = e.select(col("vec_id"), col("v"))
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", VectorOps.cosineFast(col("v"), col("cv")))
    scored.groupBy(col("vec_id"))
      .agg(max_by(struct(col("v"), col("cell")),
        struct(col("ccos"), (-col("cell")).as("negcell"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"), col("best.cell").as("cell"))
  }

  /** Exact-decimal per-(cell, dim) centroid recomputation. */
  def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cell"), posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy(col("cell"), col("dim"))
      .agg(Agg.decAvg(col("val")).as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cv"))

  // ---- grouped training: many independent k-means in one corpus pass ----
  //
  // Product quantization trains one quantizer PER SUBSPACE; running fit()
  // m times costs m passes over the corpus (m× the jobs, m× the shuffles).
  // Since the subspace problems are independent, they compose into ONE
  // pass by carrying a group column through every step: seeds rank per
  // group, assignment windows over (grp, vec_id), recomputation aggregates
  // per (grp, cell, dim). Per-group results are IDENTICAL to m separate
  // fit() runs (KmeansSpec pins this), so the per-subspace oracle replay
  // still hash-matches — but the engine shuffles m× fewer, wider stages.

  /** Per-group hash-ranked seeds over (grp, vec_id, v). */
  def seedCentroidsGrouped(e: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("hrank"), col("vec_id"))
    e.select(col("grp"), col("vec_id"), col("v"))
      .withColumn("hrank", pmod(pmod(col("vec_id"), lit(1000003L)) * lit(427799L), lit(1000003L)))
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .filter(col("cell") < k)
      .select(col("grp"), col("cell"), col("v").as("cv"))
  }

  /** Per-group argmax-cosine assignment: centroids join on `grp` (still a
    * broadcast — k×groups rows); the same map-side `max_by` argmax as
    * [[assign]], keyed by (grp, vec_id).
    */
  def assignGrouped(e: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = e.select(col("grp"), col("vec_id"), col("v"))
      .join(broadcast(centroids), Seq("grp"))
      .withColumn("ccos", VectorOps.cosineFast(col("v"), col("cv")))
    scored.groupBy(col("grp"), col("vec_id"))
      .agg(max_by(struct(col("v"), col("cell")),
        struct(col("ccos"), (-col("cell")).as("negcell"))).as("best"))
      .select(col("grp"), col("vec_id"),
        col("best.v").as("v"), col("best.cell").as("cell"))
  }

  /** Exact-decimal per-(grp, cell, dim) centroid recomputation. */
  def recomputeGrouped(assigned: DataFrame): DataFrame =
    assigned.select(col("grp"), col("cell"), posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy(col("grp"), col("cell"), col("dim"))
      .agg(Agg.decAvg(col("val")).as("c"))
      .groupBy(col("grp"), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cv"))

  /** [[fit]] for a (grp, vec_id, v) input: every group trains its own
    * k-means, all groups advance together in one pass per step.
    */
  def fitGrouped(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one Lloyd iteration")
    var cent = seedCentroidsGrouped(e, k)
    var assigned = assignGrouped(e, cent)
    cent = recomputeGrouped(assigned)
    for (_ <- 2 to iters) {
      assigned = assignGrouped(e, cent)
      cent = recomputeGrouped(assigned)
    }
    (cent.persist(), assigned.persist())
  }

  /** Until-convergence training (the round-13 convergence discipline,
    * applied to index TRAINING): Lloyd iterations run until the centroid
    * set reaches its fixed point — recompute(assign(c)) == c — capped at
    * `maxIters` as a runaway guard. Returns (converged centroids, the
    * assignment that produced them, iterations executed).
    *
    * Detection is exact and plan-bounded: after each recompute the k
    * centroid rows (k·dim doubles — CONSTANT size, never data-scale) are
    * collected and compared bit-for-bit against the iteration's input
    * centroids; the collected values are then spliced into the next
    * round's [[assignLiteral]] expressions, so every iteration is the
    * same constant-shape ONE-job plan (cached corpus scan → row-local
    * argmax projection → explode/agg recompute, a single shuffle) — no
    * lineage growth, no checkpoint files, however many rounds run.
    * Because cosine is scale-invariant, argmax-cosine assignment against
    * arithmetic-mean centroids IS spherical k-means (assignment can't
    * distinguish the mean from the normalized mean), whose objective
    * increases monotonically — so the loop terminates at a fixed point on
    * real-valued data; the cap guards the theoretical equal-objective
    * cycle. Past the fixed point every extra iteration is a no-op, which
    * is what lets a DuckDB oracle replay a FIXED unroll ≥ the measured
    * convergence depth and still hash-match the converged engine.
    */
  /** Row-local assignment against LITERAL centroids: per-cell cosine
    * columns folded with `greatest` over (cos, −cell) structs — Spark's
    * lexicographic struct ordering IS the (ccos desc, cell asc) total
    * order [[assign]] ranks by, over the same cosine arithmetic, so the
    * two forms pick identical cells. No join, no window, no shuffle:
    * with k literal centroids the whole assignment is a codegen'd
    * projection, which is what makes an until-convergence loop
    * affordable — each Lloyd iteration becomes ONE pipelined job (cached
    * corpus scan → row-local argmax → explode/agg recompute).
    */
  def assignLiteral(e: DataFrame, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    require(cents.size >= 2, "need at least two centroids")
    val best = greatest(cents.map { case (c, cv) =>
      struct(VectorOps.cosineFast(col("v"), typedLit(cv)).as("cos"),
        lit(-c).as("negcell"))
    }: _*)
    e.select(col("vec_id"), col("v"),
      (-best.getField("negcell")).cast("int").as("cell"))
  }

  def fitConverged(e: DataFrame, k: Int, maxIters: Int): (DataFrame, DataFrame, Int) = {
    require(maxIters >= 1, "need at least one Lloyd iteration")
    val spark = e.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(StructField("cell", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = true), nullable = true)))
    var cents = seedCentroids(e, k).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toVector))
      .sortBy(_._1).toVector
    var assigned: DataFrame = null
    var iters = 0
    var converged = false
    while (!converged && iters < maxIters) {
      assigned = assignLiteral(e, cents)
      val arr = recompute(assigned).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toVector))
        .sortBy(_._1).toVector
      iters += 1
      // the fixed-point test recompute(assign(c)) == c, exact on the
      // collected doubles (k·dim values — constant, never data-scale)
      converged = arr == cents
      cents = arr
    }
    import scala.jdk.CollectionConverters._
    val cent = spark.createDataFrame(
      cents.map { case (c, v) => Row(c, v) }.asJava, centSchema)
    (cent, assigned, iters)
  }

  /** Fixed-iteration training: returns (final centroids, final assignment)
    * where the assignment is the one that PRODUCED the final centroids —
    * the IVF posting lists, with no extra assignment pass.
    *
    * Both returned frames are persisted (session-scoped MEMORY_AND_DISK,
    * the ExtensionQueries cache policy): consumers read them repeatedly —
    * a PQ decode joins the codebooks once per subspace, IVF-PQ touches
    * centroids for probing AND the assignment for posting lists — and an
    * unpersisted training chain re-executes END TO END per consumer
    * (ReuseExchange never fires across differently-pruned consumers; see
    * PLANS.md). The centroid cache is k rows; the assignment cache is
    * corpus-sized — which is exactly the materialized index a deployment
    * would store anyway (measured: s11 cold 10.6 s → ~4 s at sf0.1).
    */
  def fit(e: DataFrame, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one Lloyd iteration")
    var cent = seedCentroids(e, k)
    var assigned = assign(e, cent)
    cent = recompute(assigned)
    for (_ <- 2 to iters) {
      assigned = assign(e, cent)
      cent = recompute(assigned)
    }
    (cent.persist(), assigned.persist())
  }
}
