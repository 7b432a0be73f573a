package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named registered queries
  * (all of them with no names given) under the same session configuration
  * Verify uses — the plan-audit loop SURVEY §2.8's shuffle/broadcast claims
  * are checked against. Not on any driver path.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
