package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force k-NN, and
  * sign-random-projection LSH for approximate search / near-dup detection.
  *
  * Design for 100 TB: brute-force k-NN is the correctness baseline (a
  * broadcast of the tiny query set against a fully partitioned corpus — one
  * pass, no shuffle until the per-query top-k). The LSH path buckets the
  * corpus with deterministic hyperplanes so candidate generation becomes an
  * equi-join on bucket id — shuffle-partitionable and independent of corpus
  * size per bucket.
  *
  * All float math widens to double first and folds strictly left-to-right,
  * so results are bit-identical in any engine evaluating IEEE doubles in
  * the same order (the DuckDB oracle does).
  */
object VectorOps {

  /** Element-wise widening to double (exact for float inputs). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Strict left-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; zero-norm inputs yield NaN (IEEE), branched
    * explicitly so Spark 4's ANSI divide-by-zero check cannot fire.
    * This is the portable-fold reference form (mirrorable in oracle SQL);
    * hot paths use [[cosineFast]], which is bit-identical.
    */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0, lit(Double.NaN)).otherwise(dot(a, b) / den)
  }

  /** Codegen'd native cosine ([[graft.functions.CosineSimilarity]]):
    * same accumulation order, same zero-norm semantics, bit-identical
    * results (asserted in CosineSimilaritySpec) — but a fused compiled loop
    * instead of interpreted higher-order lambdas.
    */
  def cosineFast(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSim(a, b)

  /** Deterministic pseudo-random hyperplane weight for (plane p, dim d):
    * integer arithmetic -> exact double, reproducible in any engine:
    * ((p*dims + d) * 2654435761 mod 1000003) / 1000003.0 - 0.5
    */
  def planeWeight(p: Int, d: Int, dims: Int): Double =
    (((p.toLong * dims + d) * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5

  /** Sign-random-projection bucket id over `planes` hyperplanes (bucket
    * space 2^planes). The plane vectors are generated inline as literal
    * arrays from [[planeWeight]] — no randomness, no driver state.
    * Portable-fold reference form; hot paths use [[lshBucketFast]].
    */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val plane = array((0 until dims).map(d => lit(planeWeight(p, d, dims))): _*)
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Native compiled variant of [[lshBucket]] — same plane formula, same
    * accumulation order, value-identical (LshBucketSpec).
    */
  def lshBucketFast(v: Column, planes: Int, dims: Int): Column =
    graft.functions.LshBucketExpr.lshBucket(v, planes, dims)

  /** Plane count scaled to the corpus: `ceil(log2(n / targetBucketSize))`,
    * clamped to [1, 62]. Each hyperplane halves expected bucket occupancy,
    * so this keeps E[bucket size] ≈ targetBucketSize at ANY corpus size —
    * the fix for fixed plane counts whose within-bucket pair joins go
    * quadratic as n grows. Corpus size is plan-time metadata (parquet
    * footers, [[graft.sources.Tables.rowCount]]): index build parameters
    * shape the expression tree, so they cannot be lazy in-plan scalars.
    * Occupancy bounds at 10x the fixture size are pinned in LshScaleSpec.
    */
  def planesFor(corpusSize: Long, targetBucketSize: Long): Int = {
    require(targetBucketSize > 0, "targetBucketSize must be positive")
    val ratio = math.max(1.0, corpusSize.toDouble / targetBucketSize)
    math.min(62, math.max(1, math.ceil(math.log(ratio) / math.log(2.0)).toInt))
  }

  /** Multi-probe bucket list: the base SRP bucket plus `nprobe - 1` buckets
    * obtained by flipping the lowest-|margin| plane bits (the planes the
    * vector sits closest to, i.e. the flips most likely to recover a true
    * neighbor hashed to the other side). Deterministic: margins tie-break by
    * plane index. Query-side only — the corpus keeps ONE bucket per vector,
    * so multi-probe multiplies candidate generation by nprobe without
    * touching corpus storage, and each (query, corpus) pair can match at
    * most once (probe buckets are distinct single-bit flips of the base).
    */
  def lshProbeBuckets(v: Column, planes: Int, dims: Int, nprobe: Int): Column = {
    require(nprobe >= 1 && nprobe <= planes + 1, s"nprobe must be in [1, planes+1]")
    val base = lshBucket(v, planes, dims)
    val margins = array((0 until planes).map { p =>
      val plane = array((0 until dims).map(d => lit(planeWeight(p, d, dims))): _*)
      struct(abs(dot(v, plane)).as("m"), lit(p).as("p"))
    }: _*)
    // array_sort on structs orders by (m asc, p asc) — total and portable.
    val flips = slice(array_sort(margins), 1, nprobe - 1)
    concat(
      array(base),
      transform(flips, f =>
        base.bitwiseXOR(pow(lit(2.0), f.getField("p").cast("double")).cast("long"))))
  }

  /** Brute-force top-k cosine neighbors of each query vector (exact).
    * `queries`/`corpus`: (id, vec) with double arrays. Excludes self-match.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val c = corpus.select(col("id").as("vec_id"), col("vec").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosineFast(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
  }
}
