package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed linear-algebra building blocks for embedding-column
  * preprocessing (PCA/whitening pipelines start from exactly these
  * statistics).
  *
  * Scale design: the Gram/covariance accumulation is a mergeable
  * [[Aggregator]] with a d·(d+1)/2 fixed-size buffer — each executor
  * folds its partition into one upper-triangle buffer map-side and the
  * shuffle carries ONE buffer per partition, never the n×d² exploded
  * stream a posexplode-self-join formulation would shuffle. At 100 TB the
  * cost is a single pass over the vectors plus a (numPartitions × 2080
  * longs) reduction — the same treeAggregate shape MLlib's
  * RowMatrix.computeGramianMatrix uses, expressed as a SQL aggregate so
  * it composes with any DataFrame pipeline.
  *
  * Accumulation is FIXED-POINT: components are pre-quantized to
  * round(x·10⁵) longs and the aggregator sums exact integer products, so
  * the result is bit-identical regardless of partition fold order — a
  * floating-point Gram reduction is nondeterministic in the last ulps,
  * which both breaks run-to-run reproducibility at scale and makes an
  * exact cross-engine oracle impossible. |q| ≤ ~10⁵·|x| keeps products
  * ≤ ~10¹⁰, so a corpus of 10⁸ vectors stays ~10¹⁸ < Long.MaxValue.
  */
object Linalg {

  /** Fixed-point scale for Gram accumulation: 5 decimal digits. */
  val GramFxScale = 1e5

  /** Mergeable upper-triangle Gram accumulator over pre-quantized
    * long vectors: buffer(k) = Σ_rows q(i)·q(j) for the k-th pair (i ≤ j)
    * in row-major upper-triangle order. */
  private final class GramAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    private val len = d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](len)
    override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
      require(v == null || v.length == d,
        s"gram_fx: expected $d dims, got ${if (v == null) -1 else v.length}")
      if (v != null) {
        val a = v.toArray
        var k = 0
        var i = 0
        while (i < d) {
          val xi = a(i)
          var j = i
          while (j < d) { buf(k) += xi * a(j); k += 1; j += 1 }
          i += 1
        }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < len) { a(k) += b(k); k += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Upper-triangle Gram aggregate over an `array<long>` column of
    * quantized components; returns `array<long>` of length d·(d+1)/2. */
  def gramFx(quantized: Column, d: Int): Column =
    udaf(new GramAgg(d)).apply(quantized)
}
