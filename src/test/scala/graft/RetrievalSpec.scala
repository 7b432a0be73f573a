package graft

import graft.functions.Linalg
import graft.queries.{CorpusQueries, PipelineQueries, RetrievalQueries}
import org.apache.spark.sql.functions._

/** Round-5 operators: BM25 + RRF retrieval, mixture weights, embedding
  * z-scoring, and the fixed-point Gram aggregator. Value-level parity is
  * the DuckDB oracle (tools/check.py); these pin semantics and laws. */
class RetrievalSpec extends SparkSpec {

  test("bm25Top: ranks are 1..k, scores non-increasing, ties break on doc_id") {
    val rows = RetrievalQueries.bm25Top(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= RetrievalQueries.TopK)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.zip(rows.tail).foreach { case (a, b) =>
      if (a.getDouble(2) == b.getDouble(2))
        assert(a.getLong(1) < b.getLong(1), "tie must break on doc_id")
    }
  }

  test("bm25: a doc with more query-term hits outscores one with fewer (same length)") {
    // driver-side reference on a two-doc corpus via the same formula
    val k1 = RetrievalQueries.K1; val b = RetrievalQueries.B
    def bm25(tf: Double, df: Double, n: Double, dl: Double, avgdl: Double) =
      math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * (k1 + 1.0) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
    assert(bm25(3, 2, 10, 40, 40) > bm25(1, 2, 10, 40, 40))
    // and tf saturates: the 10th hit adds less than the 2nd
    val g2 = bm25(2, 2, 10, 40, 40) - bm25(1, 2, 10, 40, 40)
    val g10 = bm25(10, 2, 10, 40, 40) - bm25(9, 2, 10, 40, 40)
    assert(g10 < g2)
  }

  test("rrfFusion: fused score is the rank-reciprocal sum of the two legs") {
    val rows = RetrievalQueries.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= RetrievalQueries.TopK)
    rows.foreach { r =>
      val rb = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val rc = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val expect = rb.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        rc.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(4) - expect) < 1e-6)
      assert(rb.isDefined || rc.isDefined)
    }
  }

  test("mixWeights: weights normalize to 1 and compress the natural shares") {
    val rows = PipelineQueries.mixWeights(spark, sf).collect()
    val w = rows.map(_.getDouble(4))
    assert(math.abs(w.sum - 1.0) < 1e-4)
    // α=0.5 compresses: max/min of mix_weight ≤ sqrt(max/min of nat_share)
    val p = rows.map(_.getDouble(3))
    val ratioP = p.max / p.min
    val ratioW = w.max / w.min
    // both ratios come from 6-dp-rounded outputs — allow relative slack
    assert(ratioW <= math.sqrt(ratioP) * (1.0 + 1e-4),
      s"temperature sampling must compress: $ratioW vs sqrt($ratioP)")
  }

  test("embedNorm: probe dims are standardized against full-corpus moments") {
    val out = CorpusQueries.embedNorm(spark, sf)
    val nProbe = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < CorpusQueries.NormProbeVecs).count()
    assert(out.count() == nProbe * 64)
    // recompute moments driver-side and spot-check vec 0, dim 0
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val xs = vecs.values.map(_.head).toArray
    val m = BigDecimal(xs.sum / xs.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = BigDecimal(math.sqrt(xs.map(x => (x - xs.sum / xs.length)).map(d => d * d).sum / xs.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z00 = out.filter(col("vec_id") === 0 && col("dim") === 0)
      .head().getDouble(2)
    val expect = BigDecimal((vecs(0L).head - m) / s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(z00 - expect) < 2e-6, s"z=$z00 expect=$expect")
  }

  test("gramFx: aggregator matches a driver-side exact integer Gram") {
    val d = 4
    val vs = Seq(
      Seq(0.1, -0.2, 0.3, 0.05),
      Seq(-0.15, 0.25, 0.0, 0.4),
      Seq(0.33, 0.11, -0.07, -0.2))
    def quant(x: Double): Long = math.floor(x * Linalg.GramFxScale + 0.5).toLong
    val qs = vs.map(_.map(quant))
    val expect = for (i <- 0 until d; j <- i until d)
      yield qs.map(q => q(i) * q(j)).sum
    val s = spark; import s.implicits._
    val got = qs.toDF("qv").agg(Linalg.gramFx($"qv", d).as("g"))
      .head().getSeq[Long](0)
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("gramFx: merge of partition buffers equals single-partition fold") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(64)(Seq.fill(8)(rnd.nextLong() % 1000L))
    val one = data.toDF("qv").coalesce(1)
      .agg(Linalg.gramFx($"qv", 8)).head().getSeq[Long](0)
    val many = data.toDF("qv").repartition(16)
      .agg(Linalg.gramFx($"qv", 8)).head().getSeq[Long](0)
    assert(one == many)
  }

  test("embedGram: upper-triangle index map covers d(d+1)/2 cells once") {
    val rows = CorpusQueries.embedGram(spark, sf).collect()
    val d = CorpusQueries.GramDims
    assert(rows.length == d * (d + 1) / 2)
    val cells = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.distinct.length == cells.length)
    assert(cells.forall { case (i, j) => j >= i && i >= 0 && j < d })
    // diagonal entries are sums of squares: strictly positive
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getLong(2) > 0L))
  }
}
