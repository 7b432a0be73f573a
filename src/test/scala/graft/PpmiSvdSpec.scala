package graft

import graft.queries.CorpusQueries

/** q_ppmi_svd: PPMI co-occurrence factorization (Levy & Goldberg 2014).
  * The DuckDB oracle pins exact values; this spec replays the WHOLE
  * pipeline — windowed symmetric co-occurrence, 6-dp PPMI, both deflated
  * power-iteration components on the DECIMAL grid — as an independent
  * plain-Scala twin, plus the spectral invariants and the degenerate
  * zero-matrix / no-pair corners. */
class PpmiSvdSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The engine's md5-prefix seed: conv(substr(md5(w),1,8),16,10) % 10. */
  private def seedOf(w: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(w.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    ((java.lang.Long.parseLong(hex, 16) % 10) + 1) / 10.0
  }

  /** Full twin: returns (comp, word) -> (loading, lambda). */
  private def twin(texts: Seq[String]): Map[(Long, String), (Double, Double)] = {
    val toks = texts.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
    val cooc = collection.mutable.Map[(String, String), Long]()
    for (t <- toks; i <- t.indices; d <- 1 to CorpusQueries.SkipgramWindow
         if i + d < t.length) {
      cooc((t(i), t(i + d))) = cooc.getOrElse((t(i), t(i + d)), 0L) + 1
      cooc((t(i + d), t(i))) = cooc.getOrElse((t(i + d), t(i)), 0L) + 1
    }
    if (cooc.isEmpty) return Map.empty
    val nw = cooc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = cooc.values.sum.toDouble
    val m = cooc.toMap.map { case ((w, c), n) =>
      (w, c) -> r6(math.log((n * nn) / (nw(w) * nw(c).toDouble)))
    }.filter(_._2 > 0.0)
    val words = nw.keys.toSeq.sorted
    var comps = Vector.empty[(Map[String, BigDecimal], BigDecimal)]
    for (_ <- 1 to CorpusQueries.SvdComps) {
      // products are EXACT decimal arithmetic quantized half-up — the
      // engine multiplies DECIMAL(18,6) values and rounds decimal-to-
      // decimal (double products of grid values sit on .5 cliffs)
      def q6(b: BigDecimal): BigDecimal =
        b.setScale(6, BigDecimal.RoundingMode.HALF_UP)
      var x = words.map(w => w -> BigDecimal(seedOf(w)).setScale(6)).toMap
      var lam = BigDecimal(0)
      for (_ <- 1 to CorpusQueries.SvdIters) {
        val y = collection.mutable.Map[String, BigDecimal]() ++
          words.map(_ -> BigDecimal(0))
        m.foreach { case ((w, c), g) => y(w) += q6(BigDecimal(g) * x(c)) }
        for ((vj, lj) <- comps) {
          val s = words.map(w => q6(vj(w) * x(w))).sum
          words.foreach(w => y(w) -= q6(q6(lj * vj(w)) * s))
        }
        val n2 = words.map(w => q6(y(w) * y(w))).sum.toDouble
        x = words.map(w => w -> (if (n2 > 0.0)
          BigDecimal(r6(y(w).toDouble / math.sqrt(n2))).setScale(6)
          else BigDecimal(0).setScale(6))).toMap
        lam = BigDecimal(r6(math.sqrt(n2))).setScale(6)
      }
      comps = comps :+ (x, lam)
    }
    comps.zipWithIndex.flatMap { case ((v, lam), i) =>
      words.map(w => (i + 1L, w) -> (v(w).toDouble, lam.toDouble))
    }.toMap
  }

  test("ppmiSvd matches a full plain-Scala deflated power-iteration " +
    "replay on real testdata: every loading and both lambdas") {
    val texts = graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect().toSeq
    val want = twin(texts)
    val got = CorpusQueries.ppmiSvd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet,
      s"vocab/comp mismatch: ${got.keySet.size} vs ${want.keySet.size}")
    got.foreach { case (k, (l, lam)) =>
      assert(l == want(k)._1, s"$k loading: engine $l twin ${want(k)._1}")
      assert(lam == want(k)._2, s"$k lambda: engine $lam twin ${want(k)._2}")
    }
  }

  test("spectral invariants: unit-norm components on the 6-dp grid, " +
    "lambda1 >= lambda2 >= 0, near-orthogonal after deflation") {
    val rows = CorpusQueries.ppmiSvd(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val byComp = rows.groupBy(_._1)
    assert(byComp.keySet == (1L to CorpusQueries.SvdComps).toSet)
    val lams = (1L to CorpusQueries.SvdComps)
      .map(c => byComp(c).head._4)
    assert(lams == lams.sorted.reverse && lams.forall(_ >= 0.0),
      s"spectrum must be nonincreasing: $lams")
    byComp.values.foreach { comp =>
      val n2 = comp.map(r => r._3 * r._3).sum
      assert(math.abs(n2 - 1.0) < 1e-4, s"component norm^2 $n2")
    }
    val v1 = byComp(1L).map(r => r._2 -> r._3).toMap
    val dot12 = byComp(2L).map(r => v1(r._2) * r._3).sum
    assert(math.abs(dot12) < 0.3,
      s"deflation must leave components near-orthogonal, got $dot12")
  }

  private def tier(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ppmi").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("degenerate: a corpus whose every PMI is exactly 0 (one word " +
    "co-occurring only with itself) yields zero loadings and lambda = 0 " +
    "through the n2 > 0 guard — never NaN") {
    val dir = tier(Seq("a a"))
    val rows = CorpusQueries.ppmiSvd(sql, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(rows == (1L to CorpusQueries.SvdComps).map(c =>
      (c, "a", 0.0, 0.0)).toSet, s"got $rows")
  }

  test("degenerate: single-token documents produce no pairs — empty " +
    "output with the contract schema, not a crash") {
    val dir = tier(Seq("alone", "also", "single"))
    val out = CorpusQueries.ppmiSvd(sql, dir)
    assert(out.columns.toSeq == Seq("comp", "word", "loading", "lambda"))
    assert(out.collect().isEmpty)
  }
}
