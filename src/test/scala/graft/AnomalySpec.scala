package graft

import graft.queries.{AnalyticQueries, TrendQueries}
import org.apache.spark.sql.functions._

/** Semantics of the r9 anomaly family (MAD outliers, CUSUM changepoint,
  * rolling correlation) on constructed inputs with hand-computable
  * expectations; DuckDB value parity is the driver oracle. */
class AnomalySpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def withTempDir[A](body: String => A): A = {
    val dirPath = java.nio.file.Files.createTempDirectory("graft-anom")
    try body(dirPath.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  private def writeValued(dir: String, rows: Seq[(String, Int, Double)]): Unit = {
    val base = 1704067200L
    rows.zipWithIndex.map { case ((tpe, hr, v), i) =>
      (i.toLong, base + hr * 3600L, 1L, tpe, v, """{"k":1}""")
    }.toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds($"epoch")).drop("epoch")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("madOutliers: median/MAD computed on constructed values, extreme point counted, baseline robust to it") {
    withTempDir { dir =>
      // 9 values: 8,9,10,10,10,10,11,12 and one wild 1000
      val vs = Seq(8.0, 9.0, 10.0, 10.0, 10.0, 10.0, 11.0, 12.0, 1000.0)
      writeValued(dir, vs.zipWithIndex.map { case (v, i) => ("click", i, v) })
      val r = AnalyticQueries.madOutliers(spark, dir).collect().head
      // median = 10 (5th of 9 sorted); adevs sorted: 0,0,0,0,1,1,2,2,990 -> MAD = 1
      assert(r.getDouble(2) == 10.0, s"med ${r.getDouble(2)}")
      assert(r.getDouble(3) == 1.0, s"mad ${r.getDouble(3)}")
      // threshold 3*1.4826*1 = 4.4478: only the 1000 exceeds it
      assert(r.getLong(4) == 1L, s"n_outliers ${r.getLong(4)}")
      assert(math.abs(r.getDouble(5) - 990.0 / 1.4826) < 1e-4)
    }
  }

  test("cusumChange: level shift after a stable week raises the alarm, and only after the shift") {
    withTempDir { dir =>
      // counts 10,11,10,11,10,11,10 (week: mu=10.43, sigma~.53), then 20/day
      val daily = Seq(10, 11, 10, 11, 10, 11, 10) ++ Seq.fill(7)(20)
      val rows = daily.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(j => ("view", d * 24, 1.0)) }
      // one event per row at distinct minutes inside the day's first hours
      val base = 1704067200L
      rows.zipWithIndex.map { case ((tpe, hr, v), i) =>
        (i.toLong, base + hr * 3600L + (i % 3000) * 7L, 1L, tpe, v, "{}")
      }.toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_seconds($"epoch")).drop("epoch")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = TrendQueries.cusumChange(spark, dir).collect()
        .sortBy(_.getTimestamp(1).getTime)
      assert(out.length == 14)
      val alarms = out.map(r => !r.isNullAt(7) && r.getBoolean(7))
      // no alarm in the baseline week; alarm present by the end of the shift
      assert(!alarms.take(7).exists(identity), "alarm during baseline")
      assert(alarms.drop(7).exists(identity), "no alarm after level shift")
      // alarms are a suffix here: S+ only grows under a sustained shift
      val first = alarms.indexOf(true)
      assert(alarms.drop(first).forall(identity))
    }
  }

  test("cusumChange: zero-variance baseline yields NULL statistics, not artifacts") {
    withTempDir { dir =>
      val rows = (0 until 10).flatMap(d => (0 until 5).map(j => ("view", d * 24, 1.0)))
      writeValued(dir, rows)
      val out = TrendQueries.cusumChange(spark, dir).collect()
      assert(out.forall(r => r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7)))
    }
  }

  test("rollingCorr: identical daily movements give r=1, mirrored give r=-1, short windows NULL") {
    withTempDir { dir =>
      // purchases 5,6,7,8,9,10,11,12,13,14; errors identical (r=1 regime)
      val rows = (0 until 10).flatMap { d =>
        (0 until (5 + d)).map(_ => ("purchase", d * 24, 1.0)) ++
          (0 until (5 + d)).map(_ => ("error", d * 24, 1.0))
      }
      writeValued(dir, rows)
      val out = AnalyticQueries.rollingCorr(spark, dir).collect()
        .sortBy(_.getTimestamp(0).getTime)
      assert(out.length == 10)
      // m < 3 on the first two days -> NULL r
      assert(out.take(2).forall(_.isNullAt(4)))
      out.drop(2).foreach(r => assert(math.abs(r.getDouble(4) - 1.0) < 1e-9))
    }
    withTempDir { dir =>
      // errors mirror purchases downward -> r = -1 once windows fill
      val rows = (0 until 10).flatMap { d =>
        (0 until (5 + d)).map(_ => ("purchase", d * 24, 1.0)) ++
          (0 until (20 - d)).map(_ => ("error", d * 24, 1.0))
      }
      writeValued(dir, rows)
      val out = AnalyticQueries.rollingCorr(spark, dir).collect()
        .sortBy(_.getTimestamp(0).getTime)
      out.drop(2).foreach(r => assert(math.abs(r.getDouble(4) + 1.0) < 1e-9))
    }
  }
}
