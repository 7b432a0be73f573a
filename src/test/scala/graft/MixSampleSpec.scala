package graft

import graft.queries.PipelineQueries

/** Mixture-realizing sampler: budget and rate laws on the real tier. Value
  * parity (which docs are picked) is the DuckDB oracle.
  */
class MixSampleSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("mixSample: rates in (0,1], sampled counts/tokens bounded by source " +
    "totals, up-weighted tail sources saturate at rate 1") {
    val rows = PipelineQueries.mixSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, ns) = (r.getLong(1), r.getLong(2))
      val (nt, st, rate) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(rate > 0.0 && rate <= 1.0)
      assert(ns <= nd && st <= nt)
      if (rate == 1.0) assert(ns == nd && st == nt,
        s"saturated source ${r.getString(0)} must keep everything")
    }
  }

  test("mixSample: realized token share tracks the sqrt-temperature target " +
    "within binomial noise for unsaturated sources") {
    val rows = PipelineQueries.mixSample(spark, sf).collect()
    rows.filter(r => r.getDouble(5) < 1.0).foreach { r =>
      val (nt, st, rate) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      val expected = rate * nt
      // docs are ~100 tokens; allow 6 sigma of doc-level binomial noise
      val sigma = math.sqrt(rate * (1 - rate) * nt * 120)
      assert(math.abs(st - expected) <= 6 * sigma + 120,
        s"${r.getString(0)}: sampled $st vs expected $expected (sigma $sigma)")
    }
  }
}
