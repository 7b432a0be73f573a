package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A warmup pass at sf0.001 first absorbs JVM/classloader/codegen startup
  * so measured times reflect query execution, not first-touch costs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warmup (not reported): smallest SF sibling of the target, same plans
    val warmDir = new java.io.File(sfDir).getParentFile match {
      case null => "/root/testdata/sf0.001"
      case p => s"$p/sf0.001"
    }
    var warmFailures = 0
    ordered.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() }
      catch { case _: Throwable => warmFailures += 1 }
    }
    if (warmFailures > 0)
      System.err.println(s"[bench] warmup skipped/failed for $warmFailures queries ($warmDir)")
    // a failed query reports -1 (never a plausible-looking elapsed time)
    def timedPass(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // two passes at the target SF (VERDICT r1 #9): pass 1 is what a cold
    // single-pass driver run sees; pass 2 is warm steady-state. The headline
    // is the warm pass; cold totals ride along so rounds stay comparable.
    val cold = timedPass()
    val results = timedPass()
    def fmt(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def total(rs: Seq[(String, Double)]): Double = rs.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${total(results)},"unit":"sec",""" +
      s""""queries":${fmt(results)},"cold_total":${total(cold)},""" +
      s""""queries_cold":${fmt(cold)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
