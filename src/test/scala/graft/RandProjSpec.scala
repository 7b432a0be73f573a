package graft

import graft.functions.Similarity
import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

/** JL sign projection (Achlioptas 2003): matrix well-formedness, exact
  * linear-map replay against a driver-side fold, and the distortion the
  * lemma promises on the real embedding corpus. Value-level parity is the
  * DuckDB oracle; these pin what it can't phrase. */
class RandProjSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("ProjSigns: fixed 16x64 ±1 matrix, balanced enough to be non-degenerate") {
    val m = Similarity.ProjSigns
    assert(m.length == Similarity.ProjDim)
    assert(m.forall(_.length == Similarity.EmbeddingDim))
    assert(m.flatten.forall(x => x == 1.0 || x == -1.0))
    // no constant row (a constant row measures only the coordinate sum)
    m.zipWithIndex.foreach { case (row, j) =>
      assert(math.abs(row.sum) < Similarity.EmbeddingDim,
        s"projection row $j is constant")
    }
    // distinct rows — duplicated rows waste a dimension
    assert(m.map(_.toSeq).distinct.length == Similarity.ProjDim)
  }

  test("randProject: matches a driver-side sequential fold exactly") {
    val v = Array.tabulate(Similarity.EmbeddingDim)(i => 0.01 * i - 0.3)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.randProject($"v").as("p"))
      .collect()(0).getSeq[Double](0)
    val want = Similarity.ProjSigns.map { row =>
      var s = 0.0
      var i = 0
      while (i < row.length) { s += v(i) * row(i); i += 1 }
      BigDecimal(s * Similarity.ProjScale)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), j) =>
      assert(math.abs(g - w) < 1e-12, s"coord $j: engine $g vs replay $w")
    }
  }

  test("jlAudit: distortion concentrates — most vectors in-band, mean ratio near 1") {
    // k=16 gives Var(ratio²) = 2/k, std(ratio) ≈ 0.18: individual
    // vectors CAN fall outside the ε-band (that is what in_band reports);
    // the lemma's promise is concentration, so assert the fraction.
    val rows = CorpusQueries.jlAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val ratios = rows.filter(!_.isNullAt(3)).map(_.getDouble(3))
    assert(ratios.length == rows.length, "no zero-norm vectors in testdata")
    val inBand = rows.count(r => !r.isNullAt(4) && r.getBoolean(4))
    val frac = inBand.toDouble / rows.length
    assert(frac >= 0.9, s"only ${frac}%% of vectors within ±${CorpusQueries.JlEpsilon}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.1,
      s"mean norm ratio $mean should concentrate near 1")
  }

  test("randProj output: 16 rows per vector, coords on the 6-dp grid") {
    val rows = CorpusQueries.randProj(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == n * Similarity.ProjDim)
    rows.take(200).foreach { r =>
      val p = r.getDouble(2)
      val snapped = BigDecimal(p).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p == snapped, s"coordinate $p off the 6-dp grid")
    }
  }
}
