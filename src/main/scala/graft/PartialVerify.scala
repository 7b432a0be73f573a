package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf100 partial-oracle dumps (VERDICT r13 #5): for the operators whose
  * FULL DuckDB replay exceeds the sandbox's ~71 GB scratch ceiling at the
  * 100× tier, dump a deterministic md5-sampled LINEAR intermediate that a
  * bounded DuckDB query can replay exactly — the corpus-sized half of each
  * operator gets tier-sf100 value evidence, and the iteration/rank half
  * stays covered by the full oracle at sf10.
  *
  * The sample predicate is `md5(key) < prefix` — a pure function of the
  * row, identical in Spark (string → UTF-8 binary → lowercase hex) and
  * DuckDB (`md5(CAST(key AS VARCHAR))`), so both sides select the same
  * rows with no coordination. tools/partial_check.py carries the DuckDB
  * side and compares row sets + values.
  */
object PartialVerify {
  /** Word-keyed sample: hex-md5 < "08" ≈ 1/32 of the vocabulary.
    * Env-overridable (with tools/partial_check.py reading the same
    * variable) so a small-tier validation run can widen the sample. */
  val WordPrefix: String = sys.env.getOrElse("PARTIAL_WORD_PREFIX", "08")

  /** Cell-keyed sample for the rnn mutuality check: hex-md5 of
    * "cid:sub" < "04" ≈ 1/64 of the post-split cells. Cell-COMPLETE
    * sampling (every member of a sampled cell is dumped) is what lets
    * the checker replay within-cell top-k ranks and the mutual filter
    * exactly — a member-sampled dump could not rank. ~1/64 of cells ×
    * ~4k occupancy bound keeps the replay's pair mass near
    * sample_vectors × 4k — linear, sized for the DuckDB scratch
    * ceiling at sf100. */
  val CellPrefix: String = sys.env.getOrElse("PARTIAL_CELL_PREFIX", "04")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val spark = GraftSession.local(defaultCpus = "4")
    import spark.implicits._
    // q_textrank: the TextRank graph's edge weights for sampled source
    // words — the n·W pair-stream aggregation is the tier-sized work; the
    // 5 PageRank rounds on the vocab-sized graph are sf10-oracled.
    // q_ppmi_svd: PPMI rows for sampled center words — the pair-stream
    // count + row/total marginals are the tier-sized work; the deflated
    // power iterations on the vocab-sized frames are sf10-oracled.
    val dumps: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_textrank" -> ((s, d) =>
        graft.queries.TextQueries.textrankEdges(s, d)
          .filter(md5($"src") < lit(WordPrefix))
          .orderBy($"src", $"dst")),
      "q_ppmi_svd" -> ((s, d) =>
        graft.queries.CorpusQueries.ppmiMatrix(s, d)
          .filter(md5($"w") < lit(WordPrefix))
          .select($"w", $"c", $"g".cast("double").as("g"))
          .orderBy($"w", $"c")),
      // q_glove_embed: the capped-vocab pair grid (fx, lx on the 6-dp
      // grid) for md5-sampled center words — the corpus-sized half (pair
      // counting + the top-GloveVocab cut); the AdaGrad rounds run on
      // vocab-bounded frames and stay covered by the sf1/sf10 full oracle
      "q_glove_pairs" -> ((s, d) => {
        val (_, pairs) = graft.queries.CorpusQueries.glovePairGrid(s, d)
        pairs.filter(md5($"i") < lit(WordPrefix))
          .select($"i", $"j", $"fx".cast("double").as("fx"),
            $"lx".cast("double").as("lx"))
          .orderBy($"i", $"j")
      }),
      // q_rnn_pairs: the post-split cell assignment for md5-sampled
      // (cid, sub) cells — cell-complete, so the checker can replay ALL
      // within-cell pairs and verify top-k ranks + the mutual filter
      // exactly (VERDICT r14 #3; the cosine-soundness check stays, this
      // adds the rank/mutuality axis it couldn't see)
      "q_rnn_cells" -> ((s, d) =>
        graft.queries.SimilarityQueries.rnnCellAssignment(s, d)
          .filter(md5(concat($"cid".cast("string"), lit(":"),
            $"sub".cast("string"))) < lit(CellPrefix))
          .orderBy($"vec_id"))
    )
    new java.io.File(outDir).mkdirs()
    dumps.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/${name}_partial")
          System.err.println(f"[partial] $name dumped in " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch { case e: Throwable =>
          System.err.println(s"[partial] $name failed: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
