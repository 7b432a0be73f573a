package graft

import graft.queries.SimilarityQueries

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995): window
  * semantics, candidate-mass bound, and the determinism of the
  * distributed zipWithIndex global rank. Value parity is the DuckDB
  * oracle; these pin the structural invariants. */
class SnmSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("snmPairs: prefix-sharing near-duplicates are caught, gaps within window") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft-snm")
    val dir = dirPath.toString
    try {
      // docs 1/2 share the blocking prefix and most tokens -> adjacent in
      // sort order, must pair. doc 3 shares tokens with 1 but has a
      // z-prefix -> sorted far away, outside any window of 1 (the known
      // SNM miss, asserted absent). docs 4..9 are unique filler.
      val base = "common alpha beta gamma delta epsilon zeta eta theta"
      val rows = Seq(
        (1L, s"$base one extra", "en", "s", 0L),
        (2L, s"$base two extra", "en", "s", 0L),
        (3L, s"zzz $base one extra", "en", "s", 0L)) ++
        (4L to 9L).map(i =>
          (i, s"filler$i m${i}a m${i}b m${i}c m${i}d m${i}e", "en", "s", 0L))
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val pairs = SimilarityQueries.snmPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._4 > 0.7),
        s"adjacent near-dup pair (1,2) missed: ${pairs.toSeq}")
      pairs.foreach { case (a, b, gap, _) =>
        assert(gap >= 1 && gap < SimilarityQueries.SnmWindow,
          s"pair ($a,$b) gap $gap outside the window")
      }
      // with n=9 < w the window covers everything EXCEPT what the rank
      // order separates; doc 3's z-prefix still sorts it adjacent enough
      // here, so only assert mass bound, not the miss (needs n >> w)
      val n = rows.length
      assert(pairs.length <= n * (SimilarityQueries.SnmWindow - 1),
        "candidate mass must stay within n(w-1)")
    } finally {
      import java.nio.file.{Files, Path}
      import scala.jdk.CollectionConverters._
      val all = Files.walk(dirPath).iterator().asScala.toSeq
      all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_: Path))
    }
  }

  test("snmPairs: deterministic across runs (global rank is stable)") {
    val a = SimilarityQueries.snmPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val b = SimilarityQueries.snmPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(a == b, "zipWithIndex rank must be deterministic over the range sort")
    assert(a.nonEmpty, "testdata corpus should surface in-window candidates")
    // each unordered pair generated exactly once
    assert(a.map(p => (p._1, p._2)).distinct.length == a.length)
    assert(a.map(p => Set(p._1, p._2)).distinct.length == a.length,
      "no pair may appear in both orientations")
  }
}
