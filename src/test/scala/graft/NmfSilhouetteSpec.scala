package graft

import graft.queries.{CorpusQueries, SimilarityQueries}
import graft.sources.Tables

/** Round-12 operators: NMF topic modeling (Lee & Seung multiplicative
  * updates) and the simplified silhouette of the fitted k=16 quantizer.
  * The DuckDB oracles pin exact values; these specs pin the mathematical
  * invariants — the Frobenius objective actually decreases, the factor
  * update rule is multiplicative (zeros stay zeros), silhouette lives in
  * the nearest/second-nearest geometry — so a refactor can't keep the
  * hash while breaking the semantics.
  */
class NmfSilhouetteSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  /** Dense Frobenius reconstruction error ‖V − W·H‖² over the full
    * docs×vocab grid (zeros included), computed driver-side — the
    * independent twin of the objective the updates minimize. */
  private def frobenius(v: Array[(Long, String, Double)],
                        w: Map[(Long, Long), Double],
                        h: Map[(Long, String), Double]): Double = {
    val docs = w.keys.map(_._1).toSeq.distinct
    val terms = h.keys.map(_._2).toSeq.distinct
    val topics = w.keys.map(_._2).toSeq.distinct.sorted
    val vm = v.map { case (d, t, x) => (d, t) -> x }.toMap
    docs.flatMap { d =>
      terms.map { t =>
        val recon = topics.map(k => w((d, k)) * h((k, t))).sum
        val x = vm.getOrElse((d, t), 0.0)
        (x - recon) * (x - recon)
      }
    }.sum
  }

  test("nmfTopics: face shape — k topics, contiguous ranks, weights " +
    "nonnegative and nonincreasing within a topic, terms from the corpus") {
    val rows = CorpusQueries.nmfTopics(spark, sf).collect()
    val vocab = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.tokenize($"text")).as("w"))
      .distinct().as[String].collect().toSet
    val byTopic = rows.groupBy(_.getLong(0))
    assert(byTopic.size == CorpusQueries.NmfTopics)
    byTopic.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq ==
        (1 to math.min(CorpusQueries.NmfTopTerms, rs.length)))
      val ws = sorted.map(_.getDouble(3))
      ws.foreach(x => assert(x >= 0.0))
      ws.sliding(2).foreach {
        case Array(a, b) => assert(a >= b); case _ => ()
      }
      sorted.foreach(r => assert(vocab.contains(r.getString(2))))
    }
  }

  test("nmfTopics: the multiplicative updates decrease the Frobenius " +
    "objective from the deterministic inits") {
    val (vDf, w0Df, h0Df, wDf, hDf) = CorpusQueries.nmfFactors(spark, sf)
    val v = vDf.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    def wMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def hMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(1), r.getString(0)) -> r.getDouble(2)).toMap
    val before = frobenius(v, wMap(w0Df), hMap(h0Df))
    val after = frobenius(v, wMap(wDf), hMap(hDf))
    // Lee–Seung updates are monotone non-increasing in exact arithmetic;
    // the 6-dp quantization perturbs each entry by <= 5e-7, so a real
    // decrease at corpus scale dwarfs the grid noise
    assert(after < before,
      s"objective went $before -> $after (should decrease)")
    assert(after >= 0.0)
  }

  test("silhouette: every catalog vector accounted once, means within " +
    "[-1, 1], and >= 0 because assignment IS the nearest centroid") {
    val rows = SimilarityQueries.silhouette(spark, sf).collect()
    val catalog = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == catalog)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s >= 0.0 && s <= 1.0,
        s"cell ${r.getLong(0)} mean silhouette $s out of [0, 1]")
    }
    // cells come from the same fitted k=16 quantizer the IVF family uses
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.length <= 16)
  }

  test("silhouette: full-catalog driver-side twin — per-vector s from the " +
    "fitted centroids, aggregated per cell, matches the operator") {
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val cents = SimilarityQueries.kmeansProfile(spark, sf).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perVec = emb.map { case (_, v) =>
      val vn = math.sqrt(dot(v, v))
      val ds = cents.map { case (cid, cv) =>
        val cn = math.sqrt(dot(cv, cv))
        (math.sqrt(math.max(0.0, 2.0 - 2.0 * (dot(v, cv) / (vn * cn)))), cid)
      }.sorted
      val (a, b) = (ds.head._1, ds(1)._1)
      val s = if (math.max(a, b) > 0.0) r6((b - a) / math.max(a, b)) else 0.0
      ds.head._2 -> s
    }
    val want = perVec.groupBy(_._1).map { case (cid, ss) =>
      cid -> (ss.length.toLong,
        r6(ss.map(x => BigDecimal(x._2)).sum.toDouble / ss.length))
    }
    val got = SimilarityQueries.silhouette(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (cid, (n, m)) =>
      assert(got(cid)._1 == n, s"cell $cid member count")
      assert(math.abs(got(cid)._2 - m) < 2e-6, s"cell $cid mean: " +
        s"got ${got(cid)._2}, twin $m")
    }
  }
}
