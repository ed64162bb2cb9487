package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values, a.k.a. bottom-k / theta) distinct-count sketch
  * as a typed `Aggregator` — the mergeable-summary answer to
  * `COUNT(DISTINCT x)` over 100 TB: an exact distinct forces a full
  * shuffle of every key; the sketch folds each partition into its k
  * smallest distinct hash values (a bounded, k-longs summary), partials
  * merge by union-and-trim up the aggregation tree, and the estimate
  * falls out of the k-th smallest hash (Bar-Yossef et al. 2002; the same
  * bottom-k summary theta sketches build on).
  *
  *   - insert: a hash enters only if the summary has room or it beats the
  *     current k-th smallest; duplicates are dropped (the summary is a
  *     SET, which is what makes it insensitive to value multiplicity);
  *   - merge: distinct union trimmed to the k smallest — associative,
  *     commutative, order-independent;
  *   - estimate: with fewer than k kept hashes the sketch SAW every
  *     distinct hash (exact regime); saturated, the k-th smallest hash
  *     theta estimates density: est = (k-1) · 2^hashBits / theta, with
  *     relative error ~ 1/sqrt(k-2).
  *
  * DETERMINISM: the summary is a pure function of the input's distinct
  * hash SET — partitioning and merge order cannot change "the k smallest"
  * — so with a cross-engine-portable hash even the SATURATED estimate is
  * oracle-replayable (DuckDB: distinct hashes, ORDER BY, LIMIT k — q77),
  * unlike counting sketches whose approximate regime is merge-order
  * dependent (t12's trim merge). Hash collisions under-count identically
  * in both engines.
  */
object Kmv {

  /** Sketch output: kept hash count and the k-th smallest hash (theta).
    * The estimate is derived OUTSIDE (plain column arithmetic) so the
    * oracle mirrors one expression, not aggregator internals.
    */
  final case class KmvSummary(n_kept: Int, theta: Long)

  class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], KmvSummary] {
    require(k >= 2, s"KMV needs k >= 2, got $k")

    override def zero: Seq[Long] = Vector.empty

    // buffer invariant: strictly ascending, at most k values
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      if (b.length >= k && h >= b.last) b // saturated and too big: the hot path
      else if (b.contains(h)) b
      else ((b :+ h).sorted).take(k)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(b: Seq[Long]): KmvSummary =
      KmvSummary(b.length, if (b.isEmpty) 0L else b.last)

    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
  }

  def sketch(k: Int): KmvSketch = new KmvSketch(k)

  /** The same bottom-k summary, finishing to the kept hash list itself —
    * for sketch SET OPERATIONS (q87), which need the sample, not just
    * (count, theta). Same buffer, same merge, so the determinism argument
    * above carries over verbatim.
    */
  class KmvKeep(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private val inner = new KmvSketch(k)
    override def zero: Seq[Long] = inner.zero
    override def reduce(b: Seq[Long], h: Long): Seq[Long] = inner.reduce(b, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = inner.merge(a, b)
    override def finish(b: Seq[Long]): Seq[Long] = b
    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  def keep(k: Int): KmvKeep = new KmvKeep(k)
}
