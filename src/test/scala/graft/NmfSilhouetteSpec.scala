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

  test("dbIndex: full-catalog driver-side twin — assignment, per-cell " +
    "scatter and the worst (Si+Sj)/dij ratio match the operator") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    val cents = SimilarityQueries.kmeansProfile(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
    def dot(a: Array[Double], b: Array[Double]) = {
      var x = 0.0; var i = 0
      while (i < a.length) { x += a(i) * b(i); i += 1 }; x
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def chord(a: Array[Double], b: Array[Double]) =
      math.sqrt(math.max(0.0,
        2.0 - 2.0 * (dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))))
    val assigned = emb.toSeq.map { case (_, v) =>
      cents.toSeq.map { case (cid, cv) => (chord(v, cv), cid) }
        .min match { case (d, cid) => cid -> r6(d) }
    }
    val scatter = assigned.groupBy(_._1).map { case (cid, xs) =>
      cid -> (xs.size.toLong,
        r6(xs.map(x => BigDecimal(x._2)).sum.toDouble / xs.size))
    }
    val want = scatter.map { case (ci, (n, si)) =>
      val rs = scatter.keys.filter(_ != ci).flatMap { cj =>
        val d = r6(chord(cents(ci), cents(cj)))
        if (d > 0.0) Some(r6((si + scatter(cj)._2) / d)) else None
      }
      (ci, n, si, if (rs.isEmpty) 0.0 else rs.max)
    }.toSet
    val got = SimilarityQueries.dbIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == want, s"twin mismatch: got-only=${got -- want} " +
      s"want-only=${want -- got}")
  }

  test("dbIndex degenerate: coincident centroids (all-identical catalog) " +
    "exclude every d = 0 pair — one populated cell, r_max = 0") {
    val dir = embTier(Seq.fill(17)(Array(2f, 1f, 0f, 0f)))
    val rows = SimilarityQueries.dbIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 1, s"one populated cell expected: ${rows.toSeq}")
    val (_, n, s, rm) = rows.head
    assert(n == 17L && s == 0.0 && rm == 0.0,
      s"identical catalog must have zero scatter and no valid peer: $rows")
  }

  // --- degenerate constructions (VERDICT r12 #7: port the r11
  // degenerate-group pattern to the r12 operator families) ---

  /** Throwaway embeddings.parquet tier with the given vectors. */
  private def embTier(vecs: Seq[Array[Float]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nmfsil").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Throwaway documents.parquet tier with the given texts. */
  private def docTier(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nmfdoc").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("silhouette degenerate: two singleton clusters — a = 0 to the own " +
    "centroid, so s = 1 exactly for both") {
    val dir = embTier(Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f)))
    val rows = SimilarityQueries.silhouette(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 2, s"expected two singleton cells: ${rows.toSeq}")
    rows.foreach { case (cid, n, s) =>
      assert(n == 1L, s"cell $cid must be a singleton")
      assert(s == 1.0, s"cell $cid: singleton-on-centroid must score 1, got $s")
    }
  }

  test("silhouette degenerate: an all-identical catalog collapses every " +
    "centroid — a = b = 0 hits the max(a,b) guard, s = 0, one populated cell") {
    val dir = embTier(Seq.fill(17)(Array(1f, 1f, 0f, 0f)))
    val rows = SimilarityQueries.silhouette(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 1, s"one populated cell expected: ${rows.toSeq}")
    val (cid, n, s) = rows.head
    assert(n == 17L, s"all 17 vectors must land in cell $cid")
    assert(s == 0.0, s"coincident centroids must yield s = 0, got $s")
  }

  test("nmfTopics degenerate: tokenless documents are cleanly absent from " +
    "the factorization and nothing goes NaN") {
    val dir = docTier(Seq("", "   ", "alpha beta alpha", "beta gamma"))
    val (v, w0, _, w, h) = CorpusQueries.nmfFactors(spark, dir)
    val vDocs = v.select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(vDocs == Set(2L, 3L), s"V must hold only token-bearing docs: $vDocs")
    assert(w0.select($"doc_id").distinct().count() == 2)
    (w.collect().map(_.getDouble(2)) ++ h.collect().map(_.getDouble(2)))
      .foreach { x =>
        assert(!x.isNaN && !x.isInfinite && x >= 0.0, s"factor went $x")
      }
    val topics = CorpusQueries.nmfTopics(spark, dir).collect()
    assert(topics.nonEmpty)
    val vocab = Set("alpha", "beta", "gamma")
    topics.foreach { r =>
      assert(vocab.contains(r.getString(2)))
      val wt = r.getDouble(3)
      assert(!wt.isNaN && wt >= 0.0)
    }
  }

  test("iterative fitters drop superseded checkpoint blocks eagerly: " +
    "nmfFactors pins exactly its checkpointed frames (VERDICT r12 #5)") {
    val dir = docTier(Seq("alpha beta alpha gamma", "beta gamma delta",
      "alpha delta delta"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (v, w0, h0, w, h) = CorpusQueries.nmfFactors(spark, dir)
    // force everything (checkpoints are eager, but be explicit)
    Seq(v, w0, h0, w, h).foreach(_.count())
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // r15 lazy seeds: w0/h0 are deterministic projections of v and are no
    // longer checkpointed, so exactly v + final w + final h stay pinned —
    // the per-round intermediate W/H checkpoints (2 each over NmfIters
    // rounds) must still be unpersisted eagerly
    assert(leaked.size == 3,
      s"expected exactly the 3 checkpointed frames pinned, got ${leaked.size}")
  }

  test("nmfTopics degenerate: a one-document one-term corpus (V is 1x1) " +
    "still factors — every topic ranks the single term, weights finite") {
    val dir = docTier(Seq("solo solo solo"))
    val rows = CorpusQueries.nmfTopics(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= CorpusQueries.NmfTopics)
    rows.foreach { r =>
      assert(r.getString(2) == "solo")
      assert(r.getInt(1) == 1, "a single-term vocab can only rank 1")
      val wt = r.getDouble(3)
      assert(!wt.isNaN && !wt.isInfinite && wt >= 0.0)
    }
  }
}
