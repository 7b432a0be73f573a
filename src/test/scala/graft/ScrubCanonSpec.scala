package graft

import graft.queries.{CorpusQueries, SimilarityQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Round-9 curation write-faces: span scrubbing (the rewrite half of
  * exact-substring dedup) and quality-aware canonical selection. Value
  * parity is the DuckDB oracle; these pin the conservation laws and the
  * policy semantics on the real tier plus a constructed corpus.
  */
class ScrubCanonSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("spanScrub: token conservation — kept + removed == total, every doc") {
    val bad = CorpusQueries.spanScrub(spark, sf)
      .filter($"n_kept" + $"n_removed" =!= $"n_tokens" ||
        $"n_removed" < 0 || $"n_kept" < 0)
      .count()
    assert(bad == 0)
  }

  test("spanScrub: scrubbed fingerprint of an untouched doc equals the " +
    "rejoined tokenization; fully-duplicated docs scrub to the empty hash") {
    val rows = CorpusQueries.spanScrub(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        md5(concat_ws(" ", graft.functions.Text.tokenize($"text"))).as("full_fp"))
    // untouched docs: fp must equal the full-text token fingerprint
    val untouchedBad = rows.filter($"n_removed" === 0).join(docs, "doc_id")
      .filter($"cleaned_fp" =!= $"full_fp").count()
    assert(untouchedBad == 0)
    // emptied docs: md5("") — the canonical empty digest
    val emptyBad = rows.filter($"n_kept" === 0)
      .filter($"cleaned_fp" =!= "d41d8cd98f00b204e9800998ecf8427e").count()
    assert(emptyBad == 0)
  }

  test("spanScrub: constructed corpus — the shared passage is cut, the " +
    "unique prefix survives") {
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-scrub")
    try {
      Seq(
        (1L, s"alpha beta gamma $shared", "en", "a", 0L),
        (2L, s"delta epsilon $shared", "en", "a", 0L),
        (3L, "no duplication here at all just unique words entirely", "en", "a", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = CorpusQueries.spanScrub(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> r).toMap
      // doc 1: 3 unique + 12 shared; the 12-token span is duplicated
      assert(got(1L).getLong(1) == 15 && got(1L).getLong(2) == 12 &&
        got(1L).getLong(3) == 3)
      assert(got(2L).getLong(1) == 14 && got(2L).getLong(2) == 12 &&
        got(2L).getLong(3) == 2)
      // doc 3: untouched
      assert(got(3L).getLong(2) == 0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("dedupProfile: histogram covers the components exactly — sizes >= 2, " +
    "doc and removal totals reconcile") {
    val prof = SimilarityQueries.dedupProfile(spark, sf).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      assert(r.getLong(0) >= 2, "a near-dup cluster has at least two members")
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1))
      assert(r.getLong(3) == (r.getLong(0) - 1) * r.getLong(1))
    }
    val comp = SimilarityQueries.dedupComponents(spark, sf)
    assert(prof.map(_.getLong(2)).sum == comp.count())
    assert(prof.map(_.getLong(3)).sum ==
      comp.filter(!col("is_keeper")).count())
  }

  test("dedupCanonical: canonical doc carries the cluster-max score, " +
    "ties break to the lowest doc_id, moved is consistent") {
    val canon = SimilarityQueries.dedupCanonical(spark, sf)
    val comp = SimilarityQueries.dedupComponents(spark, sf)
      .select($"doc_id", $"component")
    val scored = comp.join(
      PipelineQueries.qualityLr(spark, sf).select($"doc_id", $"score"), "doc_id")
    val expect = scored.groupBy($"component")
      .agg(max($"score").as("best"), count(lit(1)).as("sz"))
    val joined = canon.join(expect, "component").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("canonical_score") == r.getAs[Double]("best"))
      assert(r.getAs[Long]("cluster_size") == r.getAs[Long]("sz"))
      assert(r.getAs[Long]("cluster_size") >= 2,
        "components only contain docs with at least one near-dup edge")
      assert(r.getAs[Boolean]("moved") ==
        (r.getAs[Long]("canonical_doc") != r.getAs[Long]("component")))
    }
    // the tie-break: among cluster members with score == best, canonical
    // must be the smallest doc_id
    val best = scored.join(expect, "component")
      .filter($"score" === $"best")
      .groupBy($"component").agg(min($"doc_id").as("want_doc"))
    val bad = canon.join(best, "component")
      .filter($"canonical_doc" =!= $"want_doc").count()
    assert(bad == 0)
  }
}
