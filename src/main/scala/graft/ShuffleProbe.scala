package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (r16): run named registered queries once each and print the
  * EXECUTED shuffle truth — total shuffle bytes/records written, bytes
  * read, job and stage counts — summed over every job the query triggers,
  * including checkpoint jobs that `Explain` cannot see (a localCheckpoint
  * truncates the visible plan, so plan-file scan/exchange counts miss the
  * work inside iteration loops). This is the §1 "measure first" companion
  * to Explain: plan shape from Explain, executed shuffle mass from here.
  * Not on any driver path.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(defaultCpus = "4")
    spark.sparkContext.setLogLevel("ERROR")
    val wBytes = new AtomicLong(0); val wRecs = new AtomicLong(0)
    val rBytes = new AtomicLong(0); val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            wRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            rBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(e.stageInfos.size)
        }
      })
    names.foreach { n =>
      // settle listener events from the previous query before zeroing
      org.apache.spark.sql.GraftSqlBridge.drainListeners(spark)
      Seq(wBytes, rBytes, wRecs).foreach(_.set(0))
      Seq(jobs, stages).foreach(_.set(0))
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      org.apache.spark.sql.GraftSqlBridge.drainListeners(spark)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$n%-24s jobs=${jobs.get}%-3d stages=${stages.get}%-4d " +
        f"shufWrite=${wBytes.get / 1048576.0}%8.1f MiB " +
        f"recs=${wRecs.get}%-10d shufRead=${rBytes.get / 1048576.0}%8.1f MiB " +
        f"sec=$sec%6.2f")
    }
    spark.stop()
  }
}
