package graft

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
    // shared tuned builder: plans printed here must be the plans Verify
    // and Bench actually run (the fallback threshold changes which
    // aggregate survives — VERDICT r14 #1)
    val spark = GraftSession.local(defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n ===")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
  }
}
