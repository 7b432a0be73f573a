package graft.queries

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession

/** Content-addressed per-session memo for fitted artifacts (the bucketed-
  * table doctrine generalized): a near-dup labeling, a k-means quantizer, a
  * PQ codebook are *artifacts of the corpus*, not of the query that happens
  * to ask for them — production pipelines fit them once and every
  * encode/search/dedup face reads the same fit. Registered queries stay
  * self-contained by contract (each can be run alone), but within one
  * session the second consumer of the same fit must not pay the Lloyd
  * rounds again for a bit-identical result.
  *
  * Keying: (SparkSession identity, caller key). Caller keys fold in a
  * [[tableTag]] — the source table's parquet file listing (name, size,
  * mtime) — so regenerating a tier mid-session forces a fresh fit instead
  * of serving a stale one. Values are expected to be localCheckpoint'ed
  * DataFrames (executor-resident blocks, constant-size plans), so a memo
  * hit costs a block read, not a recomputation.
  */
private[graft] object SessionMemo {
  private val memo = TrieMap[(Int, String), AnyRef]()

  /** md5 tag of `dir/table.parquet`'s file listing — cheap (driver-side
    * stat calls only) and changes whenever the tier is rewritten. */
  def tableTag(dir: String, table: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(dir.getBytes("UTF-8"))
    val f = new java.io.File(dir, s"$table.parquet")
    val files =
      if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
    files.filter(_.exists).foreach { p =>
      md.update(s"${p.getName}:${p.length}:${p.lastModified}".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString.take(12)
  }

  /** Serve `key`'s artifact for this session, computing it at most once.
    * TrieMap.getOrElseUpdate is atomic per key — concurrent first callers
    * compute once. */
  def cached[T <: AnyRef](spark: SparkSession, key: String)(compute: => T): T =
    memo.getOrElseUpdate((System.identityHashCode(spark), key), compute)
      .asInstanceOf[T]
}
