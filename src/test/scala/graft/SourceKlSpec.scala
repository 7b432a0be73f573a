package graft

import graft.queries.CorpusQueries

/** Pairwise source KL matrix: diagonal-zero and non-negativity laws on the
  * real tier plus an exact driver-side replay on a constructed corpus.
  */
class SourceKlSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("sourceKl: diagonal is exactly zero, off-diagonal non-negative " +
    "(up to the 6-dp term-quantization budget)") {
    val rows = CorpusQueries.sourceKl(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, t, kl) = (r.getString(0), r.getString(1), r.getDouble(3))
      if (s == t) assert(kl == 0.0, s"diag ($s) = $kl")
      // Gibbs: true KL >= 0; each term is quantized to 5e-7, so the sum
      // can undershoot by at most n_terms * 5e-7
      else assert(kl >= -(r.getLong(2) * 5e-7), s"KL($s,$t) = $kl")
    }
  }

  test("sourceKl: exact driver-side replay on a constructed two-source corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kl")
    try {
      val docs = Seq(
        (1L, "a a b c", "en", "s1", 0L),
        (2L, "a b", "en", "s1", 0L),
        (3L, "c c d", "en", "s2", 0L))
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val cnt = Map(("s1", "a") -> 3L, ("s1", "b") -> 2L, ("s1", "c") -> 1L,
        ("s2", "c") -> 2L, ("s2", "d") -> 1L)
      val n = Map("s1" -> 6L, "s2" -> 3L)
      val vocab = Seq("a", "b", "c", "d")
      def p(s: String, w: String): Double =
        (cnt.getOrElse((s, w), 0L) + 0.5) / (n(s) + 0.5 * vocab.size)
      def kl(s: String, t: String): Double =
        vocab.map { w =>
          BigDecimal(p(s, w) * math.log(p(s, w) / p(t, w)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      val got = CorpusQueries.sourceKl(spark, dir.toString).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      for (s <- Seq("s1", "s2"); t <- Seq("s1", "s2")) {
        val (nt, v) = got((s, t))
        assert(nt == 4L)
        assert(v == kl(s, t), s"KL($s,$t): got $v want ${kl(s, t)}")
      }
      assert(got(("s1", "s2"))._2 != got(("s2", "s1"))._2,
        "KL must be asymmetric on this corpus")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
