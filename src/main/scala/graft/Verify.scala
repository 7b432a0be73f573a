package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args(2+) optionally restrict the dump to named queries — a fast
    // re-dump path when iterating at the big ScaleUp tiers; the driver's
    // two-arg call still dumps everything
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // serialized persists (the suffix-sort blocks) compress ~4x — the
      // difference between fitting and filling local scratch at the 5M-doc
      // tier, and exactly what a real cluster config would set
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
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // registry manifest, so the checker can detect rows-only queries whose
    // dump failed (no oracle entry to cross-check against); a restricted
    // run manifests only its subset — the checker then scores exactly what
    // was asked for (the subset-tier artifacts, e.g. sf100, stay clean)
    val manifest =
      if (only.isEmpty) SparkEntry.queries.keys.toSeq else only.toSeq
    Files.writeString(Paths.get(s"$outDir/queries.txt"),
      manifest.sorted.mkString("", "\n", "\n"))
    spark.stop()
  }
}
