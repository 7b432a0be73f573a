package graft

import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

/** Pins for the GloVe weighted factorization (VERDICT r14 #7 stretch):
  * shape, AdaGrad step boundedness, determinism, the vocabulary cap,
  * and the plan shape of the cap itself. Value correctness at every
  * tier is the DuckDB oracle's job (q_glove_embed hash-matches at
  * sf0.001/0.01/0.1 this round). */
class GloveSpec extends SparkSpec {
  import org.apache.spark.sql.SparkSession

  test("glove: one row per (vocab word, dim), vectors differentiated") {
    val out = CorpusQueries.gloveEmbed(spark, sf).collect()
    val words = out.map(_.getString(0)).distinct
    assert(words.length <= CorpusQueries.GloveVocab)
    assert(out.length == words.length * CorpusQueries.GloveDim)
    // training moved something: more distinct values than the seed grid's
    // 10 per-side levels could produce by accident of identical updates
    assert(out.map(_.getDouble(2)).distinct.length > words.length / 2)
  }

  test("glove: AdaGrad keeps every coordinate within lr-bounded drift " +
    "of its seed range") {
    // each side's seed is in [0.05, 0.5]; AdaGrad's per-round step is
    // <= lr (|g|/sqrt(G + g^2) <= 1), so after T rounds each side lies in
    // [0.05 - T*lr, 0.5 + T*lr] and vec = w + c in twice that window.
    // Raw full-batch GD — the blow-up this operator deliberately avoids —
    // violates this bound on the first frequent word.
    val t = CorpusQueries.GloveIters * CorpusQueries.GloveLr
    val bounds = CorpusQueries.gloveEmbed(spark, sf)
      .agg(min(col("vec")), max(col("vec"))).head()
    assert(bounds.getDouble(0) >= 2 * (0.05 - t) - 1e-9)
    assert(bounds.getDouble(1) <= 2 * (0.5 + t) + 1e-9)
  }

  test("glove: deterministic across invocations") {
    val a = CorpusQueries.gloveEmbed(spark, sf).collect().toSeq
    val b = CorpusQueries.gloveEmbed(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("glove: the top-N vocabulary cut is a distributed sort-limit, " +
    "never a single-partition window") {
    // inspect the UNCHECKPOINTED pair grid — gloveEmbed's own final plan
    // starts from the checkpointed training state, so the cut lives in
    // this upstream subtree
    val (vocab, pairs) = CorpusQueries.glovePairGrid(spark, sf)
    val pv = vocab.queryExecution.executedPlan.toString
    assert(pv.contains("TakeOrderedAndProject"),
      s"vocab cap must compile to TakeOrderedAndProject:\n$pv")
    val pp = pairs.queryExecution.executedPlan.toString
    assert(!pp.contains("Window"),
      s"pair grid must not contain a window:\n$pp")
  }

  test("glove: the vocabulary cap binds on a >cap-vocab corpus") {
    // synthetic corpus with GloveVocab + 100 distinct tokens: the output
    // must carry exactly GloveVocab words, chosen by co-occurrence mass
    // with the deterministic (nw desc, word asc) tiebreak
    val dir = java.nio.file.Files.createTempDirectory("glove_cap").toString
    val n = CorpusQueries.GloveVocab + 100
    val s: SparkSession = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"w$i w${(i + 1) % n} w${(i + 2) % n}"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CorpusQueries.gloveEmbed(spark, dir)
      .select($"word").distinct().count()
    assert(out == CorpusQueries.GloveVocab)
  }
}
