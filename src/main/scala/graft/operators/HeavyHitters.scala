package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch as a typed `Aggregator` — the
  * mergeable-summary shape for "top terms over 100 TB": each partition
  * folds its rows into a bounded `capacity`-entry summary, partial
  * summaries (tiny — capacity entries, never data-sized) merge up the
  * aggregation tree, and one summary comes out. No shuffle of raw terms,
  * no driver-side counting.
  *
  * Semantics (Metwally et al.'s Space-Saving, with the top-k trim merge of
  * Agarwal et al.'s mergeable-summaries line):
  *   - insert: known key increments; unknown key with room enters at
  *     (1, 0); unknown key without room replaces the min-count entry,
  *     inheriting its count as both floor and error bound;
  *   - merge: shared keys sum counts and error bounds, then the union is
  *     trimmed to the `capacity` largest (count desc, term asc — total
  *     order, so merges are deterministic given the same partials);
  *   - estimates carry `err`: for a single UNMERGED summary the true
  *     in-partition count is within [count - err, count] (the invariant
  *     HeavyHittersSpec asserts single-partition-only). After a trim merge
  *     the bracket no longer holds — a key's count from a partial that
  *     dropped it is lost, so `est` can UNDERcount by mass `err` does not
  *     capture; the only post-merge guarantee is the overall n/capacity
  *     bound on total missed mass.
  *
  * EXACT REGIME: with `capacity` at or above the distinct-key count no
  * eviction or trim ever fires, every err is 0, and the summary is the
  * exact count map regardless of partitioning or merge order — which is
  * what lets t12's DuckDB oracle hash-match a sketch. The approximate
  * regime's guarantees are property-tested in HeavyHittersSpec instead.
  */
object HeavyHitters {

  /** One summary entry: estimated count `est` overcounts the in-summary
    * true count by at most `err`.
    */
  final case class SSEntry(term: String, est: Long, err: Long)

  class SpaceSaving(capacity: Int)
      extends Aggregator[Seq[String], Map[String, (Long, Long)], Seq[SSEntry]] {
    require(capacity > 0, s"capacity must be positive, got $capacity")

    override def zero: Map[String, (Long, Long)] = Map.empty

    override def reduce(buf: Map[String, (Long, Long)],
                        terms: Seq[String]): Map[String, (Long, Long)] =
      terms.foldLeft(buf)(insert)

    private def insert(b: Map[String, (Long, Long)],
                       t: String): Map[String, (Long, Long)] =
      b.get(t) match {
        case Some((c, e)) => b.updated(t, (c + 1, e))
        case None if b.size < capacity => b.updated(t, (1L, 0L))
        case None =>
          // deterministic victim: min count, term asc tiebreak
          val (vt, (vc, _)) = b.minBy { case (k, (c, _)) => (c, k) }
          (b - vt).updated(t, (vc + 1, vc))
      }

    override def merge(a: Map[String, (Long, Long)],
                       b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
      val u = (a.keySet ++ b.keySet).iterator.map { k =>
        val (c1, e1) = a.getOrElse(k, (0L, 0L))
        val (c2, e2) = b.getOrElse(k, (0L, 0L))
        k -> (c1 + c2, e1 + e2)
      }.toMap
      if (u.size <= capacity) u
      else u.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
    }

    override def finish(buf: Map[String, (Long, Long)]): Seq[SSEntry] =
      buf.toSeq.map { case (t, (c, e)) => SSEntry(t, c, e) }
        .sortBy(e => (-e.est, e.term))

    override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
      ExpressionEncoder[Map[String, (Long, Long)]]()
    override def outputEncoder: Encoder[Seq[SSEntry]] =
      ExpressionEncoder[Seq[SSEntry]]()
  }

  def spaceSaving(capacity: Int): SpaceSaving = new SpaceSaving(capacity)
}
