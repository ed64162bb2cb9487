package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise vector aggregation (`Aggregator` — the user-facing
  * form of a TypedImperativeAggregate): mutable double[] buffer, partial
  * merge per partition, one small array over the wire per group.
  *
  * This is the performance path for centroid/sum-of-vectors at scale; the
  * oracle-checkable deterministic path is the explode + [[Agg.decAvg]] per
  * (group, dim) formulation in `s03_vector_centroids` (double summation
  * order differs between the two, so they agree to ~1e-9 relative, not
  * bit-exactly — VectorAggSpec pins that).
  */
object VectorAgg {

  class SumVec(dims: Int) extends Aggregator[Array[Double], Array[Double], Array[Double]] {
    override def zero: Array[Double] = new Array[Double](dims)

    override def reduce(buf: Array[Double], v: Array[Double]): Array[Double] = {
      var i = 0
      val n = math.min(buf.length, v.length)
      while (i < n) { buf(i) += v(i); i += 1 }
      buf
    }

    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Double]): Array[Double] = buf

    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  def sumVec(dims: Int): SumVec = new SumVec(dims)
}
