package graft
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
    val spark = GraftSession.local(defaultCpus = "4")
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
