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

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.sizeOfNull", "false")
      // bounded-buffer Aggregators (TopKNeighbors, sketches) must HASH-
      // aggregate: the default ObjectHashAggregate fallback threshold of
      // 128 keys silently degrades every typed-udaf groupBy to a sort of
      // its full input — at the sf100 pair stream (~8e9 rows) that sort
      // is a 200+ GB spill that killed the first r14 rnn run. 200k keys
      // covers the top-k family with 2.4x margin at sf100 (~83k distinct
      // vectors per task) at ~20 MB per task map, while GROWING-buffer
      // aggregations (assocRules' collect_list baskets: 625k+ groups per
      // task at sf10) still fall back before heap churn outweighs the
      // sort they were getting anyway — measured at sf10: 4M held the
      // full basket map and cost q_assoc_rules +23 s.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "200000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
          .orderBy($"w", $"c"))
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
