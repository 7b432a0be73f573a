package graft

import graft.queries.{CorpusQueries, PipelineQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

/** Round-5 curation operators: incremental ingest dedup, per-source
  * diversity profile, cross-source vocabulary overlap, and the LR quality
  * filter. Value-level parity is the DuckDB oracle (tools/check.py); these
  * pin the invariants the oracle can't phrase. */
class CurationSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("incrementalDedup: batch ids odd, index ids even, one row per batch doc") {
    val out = SimilarityQueries.incrementalDedup(spark, sf).collect()
    assert(out.nonEmpty, "synthetic corpus should contain cross-parity near-dups")
    out.foreach { r =>
      assert(r.getLong(0) % 2 == 1, s"batch_id ${r.getLong(0)} not odd")
      assert(r.getLong(1) % 2 == 0, s"matched_id ${r.getLong(1)} not even")
      assert(r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0)
    }
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "argmax must emit one row per batch doc")
  }

  test("incrementalDedup: agrees with the all-pairs variant restricted to cross-parity") {
    // every cross-parity J >= 0.8 pair jaccardPairs finds must reject that
    // batch doc, and the best-match J values must coincide
    val full = SimilarityQueries.jaccardPairs(spark, sf)
      .filter(($"doc_a" % 2 =!= $"doc_b" % 2))
      .select(
        when($"doc_a" % 2 === 1, $"doc_a").otherwise($"doc_b").as("batch_id"),
        when($"doc_a" % 2 === 1, $"doc_b").otherwise($"doc_a").as("idx_id"),
        $"jaccard")
      .groupBy($"batch_id").agg(max($"jaccard").as("best_j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val incr = SimilarityQueries.incrementalDedup(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(incr.keySet == full.keySet)
    full.foreach { case (id, j) => assert(incr(id) == j, s"doc $id: $j vs ${incr(id)}") }
  }

  test("ngramDiversity: ratio laws per source") {
    val rows = CorpusQueries.ngramDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp) = (r.getLong(1), r.getLong(2))
      val (nBi, dBi) = (r.getLong(4), r.getLong(5))
      assert(nTyp >= 1 && nTyp <= nTok)
      assert(dBi >= 1 && dBi <= nBi)
      // a document of n tokens yields exactly n-1 bigrams
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(6) > 0 && r.getDouble(6) <= 1.0)
      // bigram types can't exceed (token types)^2
      assert(dBi <= nTyp * nTyp)
    }
  }

  test("ngramDiversity: bigram total equals sum of per-doc (n-1)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", size(graft.functions.Text.tokenize($"text")).as("n"))
      .groupBy($"source")
      .agg(sum(greatest($"n" - 1, lit(0))).as("expect_bi"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CorpusQueries.ngramDiversity(spark, sf).collect().foreach { r =>
      assert(r.getLong(4) == docs(r.getString(0)),
        s"source ${r.getString(0)}: bigrams ${r.getLong(4)} != ${docs(r.getString(0))}")
    }
  }

  test("sourceOverlap: one row per unordered pair, set laws hold") {
    val nSrc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source").distinct().count()
    val rows = CorpusQueries.sourceOverlap(spark, sf).collect()
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      s"expected C($nSrc,2) pairs, got ${rows.length}")
    rows.foreach { r =>
      val (a, b, c) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(r.getString(0) < r.getString(1))
      assert(c <= math.min(a, b), "common can't exceed either set")
      val j = c.toDouble / (a + b - c)
      assert(math.abs(r.getDouble(5) - math.rint(j * 1e6) / 1e6) < 1e-9)
    }
  }

  test("qualityLr: score is the sigmoid of the documented feature weights") {
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(1)
      .collect().head
    val toks = doc.getString(1).trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length.toDouble
    val stopR = toks.count(t => graft.functions.Text.Stopwords.contains(t.toLowerCase)) / n
    val meanLen = toks.map(_.length).sum / n
    val ttr = toks.distinct.length / n
    val z = math.rint((PipelineQueries.LrBias +
      PipelineQueries.LrWLogLen * math.log1p(n) +
      PipelineQueries.LrWStop * stopR +
      PipelineQueries.LrWMeanLen * meanLen +
      PipelineQueries.LrWTtr * ttr) * 1e6) / 1e6
    val expect = math.rint(1.0 / (1.0 + math.exp(-z)) * 1e6) / 1e6
    val got = PipelineQueries.qualityLr(spark, sf)
      .filter($"doc_id" === doc.getLong(0)).collect().head
    assert(got.getDouble(1) == expect, s"score ${got.getDouble(1)} != $expect")
    assert(got.getBoolean(2) == (expect >= 0.5))
  }

  test("plan shapes: no cartesian blowup, argmax is an aggregate not a window") {
    val incr = SimilarityQueries.incrementalDedup(spark, sf)
      .queryExecution.executedPlan.toString
    val overlap = CorpusQueries.sourceOverlap(spark, sf)
      .queryExecution.executedPlan.toString
    val diversity = CorpusQueries.ngramDiversity(spark, sf)
      .queryExecution.executedPlan.toString
    for ((n, p) <- Seq("incr" -> incr, "overlap" -> overlap,
      "diversity" -> diversity)) {
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$n plans an NL join:\n$p")
    }
    // the per-batch-doc best match must be a partial+final max_by
    // aggregate, never a window sort over the match list
    assert(!incr.contains("Window"), s"argmax regressed to a window:\n$incr")
    assert(incr.contains("max_by") || incr.contains("HashAggregate"))
    // bigram construction is array-side: no join at all below the final
    // #sources-row profile join
    assert(!diversity.contains("SortMergeJoin"),
      s"diversity shuffles a corpus-sized join:\n$diversity")
  }

  test("sourceEntropy: bounds and a driver-side replay per source") {
    val rows = CorpusQueries.sourceEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side exact replay over the raw tokens
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .groupBy(_.getString(0))
    rows.foreach { r =>
      val src = r.getString(0)
      val counts = docs(src).toSeq
        .flatMap(_.getString(1).trim.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map(_._2.size.toLong).toSeq
      val n = counts.sum
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == counts.size)
      val clogc = counts
        .map(c => BigDecimal(math.rint(c * math.log(c.toDouble) * 1e6) / 1e6)
          .setScale(6))
        .sum
      val h = math.rint((math.log(n.toDouble) - clogc.toDouble / n) * 1e6) / 1e6
      assert(r.getDouble(3) == h, s"$src: entropy ${r.getDouble(3)} != $h")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0,
        s"$src: norm_entropy out of (0,1]")
    }
  }

  test("zipfProfile: slope negative on Zipf-ish text, regression over <= K points") {
    val rows = CorpusQueries.zipfProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= CorpusQueries.ZipfTopK)
      // rank-frequency counts are non-increasing, so the LS slope over
      // (ln rank, ln count) can never be positive
      assert(r.getDouble(2) <= 0.0,
        s"${r.getString(0)}: slope ${r.getDouble(2)} > 0")
      // intercept approximates ln(top count) — must be finite and sane
      assert(!r.getDouble(3).isNaN && r.getDouble(3) > 0)
    }
  }

  test("sourceEntropy/zipfProfile: degenerate one-word source emits NULL, not NaN") {
    // vocab = 1 zeroes the entropy normalizer ln(vocab) and the Zipf
    // denominator k·sxx − sx²; both engines must agree on NULL (the
    // oracle's CASE mirrors the when() guards). Pin the Spark side here.
    val dirPath = java.nio.file.Files.createTempDirectory("graft-degenerate")
    val dir = dirPath.toString
    try {
      Seq(
        (1L, "foo foo foo foo", "en", "mono", 15L),
        (2L, "foo foo", "en", "mono", 7L),
        (3L, "the quick brown fox the lazy dog the end", "en", "normal", 40L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val ent = CorpusQueries.sourceEntropy(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      val mono = ent("mono")
      assert(mono.getLong(2) == 1, "mono source must have vocab 1")
      assert(mono.getDouble(3) == 0.0, "entropy of a one-word source is 0")
      assert(mono.isNullAt(4), "norm_entropy must be NULL at vocab=1, not NaN")
      val norm = ent("normal")
      assert(!norm.isNullAt(4) && norm.getDouble(4) > 0 && norm.getDouble(4) <= 1.0)
      val zipf = CorpusQueries.zipfProfile(spark, dir).collect()
        .map(r => r.getString(0) -> r).toMap
      val zm = zipf("mono")
      assert(zm.getLong(1) == 1, "one distinct word -> one regression point")
      assert(zm.isNullAt(2) && zm.isNullAt(3),
        "slope/intercept must be NULL at k=1, not NaN")
      assert(!zipf("normal").isNullAt(2))
    } finally {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      val all = Files.walk(dirPath).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_: Path))
    }
  }

  test("qualityLr: map-only plan — no shuffle in the scoring stage") {
    // the operator itself (before the verify-order sort) must not exchange
    val plan = PipelineQueries.qualityLr(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    // the single allowed exchange is the global orderBy's range partition
    assert(exchanges <= 1, s"expected at most the output sort's exchange:\n$plan")
  }
}
