package graft

import graft.queries.SimilarityQueries
import graft.streaming.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming MinHash-LSH near-dup detection: parity with the batch
  * operator on real testdata, exactly-once pair emission, and watermark
  * eviction of the state-store index. */
class NearDupStreamSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def runStream(batches: Seq[Seq[(Long, String, java.sql.Timestamp)]],
                        lateness: String = "10 minutes",
                        name: String = "neardup_t"): Seq[Pipeline.NearDupPair] = {
    implicit val ctx = sql.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val pairs = Pipeline.nearDupStream(
      in.toDF().toDF("doc_id", "text", "ts"), lateness)
    val q = pairs.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      sql.table(name).as[Pipeline.NearDupPair].collect().toSeq
    } finally q.stop()
  }

  // offset off epoch 0: under EventTimeTimeout the exec drops rows with
  // ts <= watermark as late data, and the initial watermark is 0 — an
  // event AT epoch 0 is the degenerate boundary (real event times are
  // positive epoch-ms)
  private val base = 3600L * 1000L
  private def ts(ms: Long) = new java.sql.Timestamp(base + ms)

  test("parity with batch minhashDedup on sf0.001 documents, fed in 3 batches") {
    val docs = sources.Tables.documents(sql, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, ts(0L)) }
    val chunks = docs.grouped((docs.size + 2) / 3).toSeq
    val got = runStream(chunks, name = "neardup_parity")
    val expect = SimilarityQueries.minhashDedup(sql, sf)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(got.map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet == expect,
      s"streaming pairs != batch pairs (got ${got.size}, want ${expect.size})")
    // exactly-once: the first-colliding-band rule must prevent the same
    // pair surfacing from two buckets
    assert(got.size == got.distinct.size, "duplicate pair emissions")
  }

  test("pairs arrive incrementally: a dup in a later batch matches state") {
    val a = "the quick brown fox jumps over the lazy dog again and again ok"
    val b = a + " extra"
    val got = runStream(Seq(
      Seq((1L, a, ts(1000L))),
      Seq((2L, b, ts(2000L)))), name = "neardup_incr")
    assert(got.map(p => (p.doc_a, p.doc_b)) == Seq((1L, 2L)))
    assert(got.head.jaccard >= 0.8)
  }

  test("watermark evicts old index members: a dup past lateness is missed") {
    val a = "one two three four five six seven eight nine ten eleven twelve"
    // batch 2's fresh doc advances the watermark far past doc 1's event
    // time; batch 3's exact dup of doc 1 then finds an empty bucket
    val hour = 3600L * 1000L
    val got = runStream(Seq(
      Seq((1L, a, ts(0L))),
      Seq((50L, "unrelated filler text that moves the watermark forward now",
        ts(10 * hour))),
      Seq((2L, a, ts(10 * hour)))), lateness = "10 minutes",
      name = "neardup_evict")
    assert(!got.exists(p => p.doc_a == 1L),
      s"evicted member still produced a pair: $got")
  }

  test("parity with batch minhashDedup on the sf0.01 corpus (distinct " +
    "content from sf0.001), fed in 4 batches") {
    val dir = "/root/testdata/sf0.01"
    val docs = sources.Tables.documents(sql, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, t) => (id, t, ts(0L)) }
    val chunks = docs.grouped((docs.size + 3) / 4).toSeq
    val got = runStream(chunks, name = "neardup_parity001")
    val expect = SimilarityQueries.minhashDedup(sql, dir)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(expect.nonEmpty, "sf0.01 corpus must contain near-dup pairs")
    assert(got.map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet == expect,
      s"streaming pairs != batch pairs (got ${got.size}, want ${expect.size})")
    assert(got.size == got.distinct.size, "duplicate pair emissions")
  }

  test("exactly-once pair emission under a REAL epoch replay: crash between " +
    "jdbc sink and checkpoint commit, stream restarted from the checkpoint") {
    // the jdbcAppendIdempotent doctrine applied to near-dup pairs: a crash
    // after the sink write but before the checkpoint commit replays the
    // epoch; the stateful operator re-derives the same pairs (deterministic
    // per offset range) and the keyed purge-then-append converges to
    // exactly one copy — pair emission proven exactly-once under crash,
    // not just under a clean feed
    implicit val ctx = sql.sqlContext
    import org.apache.spark.sql.streaming.Trigger
    System.setProperty("derby.system.home", "/tmp/derby-home")
    val url = "jdbc:derby:memory:graftneardupreplay;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val a = "the quick brown fox jumps over the lazy dog again and again ok"
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    in.addData(Seq((1L, a, ts(1000L)), (2L, a + " extra", ts(2000L)),
      (3L, "totally unrelated words that share nothing with the others here",
        ts(3000L))))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nd-replay").toString
    @volatile var crashOnce = true
    def start() = Pipeline.nearDupStream(
        in.toDF().toDF("doc_id", "text", "ts")).toDF()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        Pipeline.jdbcAppendIdempotent(df, id, url, "neardup_pairs",
          "app", "app", driver)
        if (crashOnce) { crashOnce = false; sys.error("injected crash") }
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start().awaitTermination()
    }
    // restart from the same checkpoint: the epoch replays through the
    // rolled-back state store; the idempotent sink must converge
    start().awaitTermination()
    val back = sql.read.format("jdbc")
      .option("url", url).option("dbtable", "neardup_pairs")
      .option("user", "app").option("password", "app")
      .option("driver", driver).load()
    val pairs = back.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)), s"replayed epoch not exactly-once: $pairs")
  }

  test("short docs (< 3 tokens) produce no signatures and no pairs") {
    val got = runStream(Seq(Seq((1L, "hi there", ts(0L)),
      (2L, "hi there", ts(0L)))), name = "neardup_short")
    assert(got.isEmpty)
  }
}
