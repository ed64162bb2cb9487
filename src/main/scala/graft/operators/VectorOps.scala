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
