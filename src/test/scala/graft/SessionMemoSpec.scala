package graft

import graft.queries.{SessionMemo, SimilarityQueries}

/** Pins the content-addressed session memo that backs the shared fits
  * (near-dup components, k-means quantizer, PQ/IVFADC codebooks): a memo
  * hit must serve the SAME artifact instance, and the tag must move when
  * the underlying table's file listing changes — stale fits served across
  * a tier regeneration were the failure mode the tag exists to prevent. */
class SessionMemoSpec extends SparkSpec {

  test("cached: second call with the same key serves the same instance, " +
    "computing once") {
    var computes = 0
    val key = "memospec:" + System.nanoTime()
    def get() = SessionMemo.cached(spark, key) { computes += 1; new Object }
    val a = get(); val b = get()
    assert(a eq b, "memo hit must return the identical artifact")
    assert(computes == 1, s"compute ran $computes times, expected 1")
  }

  test("cached: different keys compute independently") {
    val base = "memospec2:" + System.nanoTime()
    val a = SessionMemo.cached(spark, base + ":k=16")(new Object)
    val b = SessionMemo.cached(spark, base + ":k=32")(new Object)
    assert(!(a eq b))
  }

  test("tableTag: stable across calls, moves when the listing changes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memotag")
    try {
      val f = dir.resolve("documents.parquet")
      java.nio.file.Files.writeString(f, "v1")
      val t1 = SessionMemo.tableTag(dir.toString, "documents")
      assert(t1 == SessionMemo.tableTag(dir.toString, "documents"))
      // a rewrite with different size must change the tag even if mtime
      // granularity hides the touch
      java.nio.file.Files.writeString(f, "v2-longer")
      val t2 = SessionMemo.tableTag(dir.toString, "documents")
      assert(t1 != t2, "tag must move when the file listing changes")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("tableTag: missing table path fails fast (no silent dir-only tag); " +
    "a rewrite inside a nested partition subdir moves the tag") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memotag2")
    try {
      // ADVICE r9: missing path must not degenerate to a hash of the dir
      // string alone — that tag would never move and could serve stale fits
      intercept[IllegalArgumentException] {
        SessionMemo.tableTag(dir.toString, "documents")
      }
      val sub = dir.resolve("documents.parquet").resolve("part=0")
      java.nio.file.Files.createDirectories(sub)
      java.nio.file.Files.writeString(sub.resolve("f0.parquet"), "v1")
      val t1 = SessionMemo.tableTag(dir.toString, "documents")
      // ADVICE r9: a rewrite confined to a nested subdir's files (same
      // top-level listing) must still move the tag — requires recursion
      java.nio.file.Files.writeString(sub.resolve("f0.parquet"), "v2-longer")
      val t2 = SessionMemo.tableTag(dir.toString, "documents")
      assert(t1 != t2, "nested-subdir rewrite must move the tag")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("dedupComponents: memo hit returns the same frame for the same tier") {
    val a = SimilarityQueries.dedupComponents(spark, sf)
    val b = SimilarityQueries.dedupComponents(spark, sf)
    assert(a eq b, "same session + same tier must serve the cached labeling")
  }
}
