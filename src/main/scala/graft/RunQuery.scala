package graft


/** Dev utility: run ONE registered query against a tier, print timing over
  * N passes and (optionally) the formatted physical plan.
  *
  *   sbt "runMain graft.RunQuery q_quantile_filter /root/testdata/sf0.1 3 plan"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <q_name> <sfDir> [passes] [plan]")
    val (name, dir) = (args(0), args(1))
    val passes = if (args.length > 2) args(2).toInt else 3
    val showPlan = args.contains("plan")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // the shared tuned builder (VERDICT r14 #1): before r15 this main was
    // missing the ObjectHashAggregate fallback threshold, so driving e.g.
    // q_rnn_pairs at a big tier from here reproduced the exact 200+ GB
    // sort-fallback spill Bench/Verify had been fixed against
    val spark = GraftSession.local(defaultCpus = "32")
    if (showPlan) fn(spark, dir).explain("formatted")
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"[runquery] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
