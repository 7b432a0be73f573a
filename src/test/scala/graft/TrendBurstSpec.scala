package graft

import graft.queries.{CorpusQueries, TrendQueries}
import org.apache.spark.sql.functions._

/** Semantics of the r9 trend family (burst z-score, EWMA smoothing) and the
  * sliding-window chunker, pinned on constructed inputs where the expected
  * values are computable by hand. The value-level gate vs DuckDB is the
  * driver oracle; these pin the *laws* (guards, recurrence, chunk geometry)
  * so a regression fails in `sbt test`, not in the driver run. */
class TrendBurstSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def withTempDir[A](body: String => A): A = {
    val dirPath = java.nio.file.Files.createTempDirectory("graft-trend")
    try body(dirPath.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** events.parquet with one event per (type, hour-offset) repetition. */
  private def writeEvents(dir: String, counts: Seq[(String, Int, Int)]): Unit = {
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    val rows = for {
      ((tpe, hr, n), i) <- counts.zipWithIndex
      j <- 0 until n
    } yield (i.toLong * 1000 + j, base + hr * 3600L + 60L * j, 1L, tpe, 1.0, """{"k":1}""")
    rows.toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds($"epoch")).drop("epoch")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("burstZscore: quiet baseline stays unflagged, 10x spike trips 3-sigma, short history yields NULL z") {
    withTempDir { dir =>
      // 30 hours alternating 4/6 (mean 5, nonzero variance), then a 50-spike
      val baseline = (0 until 30).map(h => ("click", h, if (h % 2 == 0) 4 else 6))
      writeEvents(dir, baseline :+ (("click", 30, 50)))
      val rows = TrendQueries.burstZscore(spark, dir).collect()
        .map(r => (r.getTimestamp(1).getTime / 3600000L % 100000, r)).toMap
      val spike = rows.maxBy(_._1)._2
      assert(spike.getLong(2) == 50 && spike.getBoolean(5), "spike hour must be flagged")
      // z for the spike: trailing 24h of alternating 4/6 -> mean 5, varp 1
      assert(math.abs(spike.getDouble(4) - 45.0) < 1e-6, s"z was ${spike.getDouble(4)}")
      // guard: first 12 hours have m < 12 -> z and is_burst suppressed
      val early = rows.filter(_._1 < rows.keys.min + 12).values
      assert(early.forall(r => r.isNullAt(4) && !r.getBoolean(5)))
      // no baseline hour is flagged
      assert(rows.values.count(_.getBoolean(5)) == 1)
    }
  }

  test("burstZscore: zero-variance baseline never divides by zero") {
    withTempDir { dir =>
      writeEvents(dir, (0 until 26).map(h => ("view", h, 5)) :+ (("view", 26, 40)))
      val rows = TrendQueries.burstZscore(spark, dir).collect()
      // varp = 0 for every window over the constant stretch -> z NULL everywhere
      assert(rows.forall(r => r.isNullAt(4) && !r.getBoolean(5)))
    }
  }

  test("kleinbergBursts: constructed burst enters q1 over the burst days and exits after; replayed by an independent driver-side Viterbi") {
    withTempDir { dir =>
      // view at 90/day for 30 days; click at 10/day except days 12-14 at
      // 39/day — a rate ~3x click's base share, i.e. right at p1, where q1
      // decisively wins its 3 days (and nowhere else). sf0.01's uniform
      // rates never leave q0, so this pins the q1 path.
      val counts = (0 until 30).flatMap { d =>
        val a = if (d >= 12 && d <= 14) 39 else 10
        Seq(("click", d * 24, a), ("view", d * 24, 90))
      }
      writeEvents(dir, counts)
      val got = TrendQueries.kleinbergBursts(spark, dir).collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime) ->
          ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
      // independent Viterbi per type, same model/tie rules
      val byDay = counts.groupBy(_._2 / 24).view.mapValues(_.map(c => c._1 -> c._3).toMap).toMap
      val days = byDay.keys.toSeq.sorted
      for (tpe <- Seq("click", "view")) {
        val rs = days.map(d => byDay(d)(tpe).toLong)
        val ds = days.map(d => byDay(d).values.sum.toLong)
        val p0 = rs.sum.toDouble / ds.sum.toDouble
        val p1 = math.min(3.0 * p0, 0.99)
        val tau = math.log(days.size.toDouble)
        def cost(r: Long, d: Long, p: Double) =
          -(r.toDouble * math.log(p) + (d - r).toDouble * math.log(1.0 - p))
        var c0 = cost(rs.head, ds.head, p0)
        var c1 = tau + cost(rs.head, ds.head, p1)
        val ch = collection.mutable.ArrayBuffer((true, true))
        for (t <- 1 until days.size) {
          val (n0, n1) = (math.min(c0, c1) + cost(rs(t), ds(t), p0),
            math.min(c0 + tau, c1) + cost(rs(t), ds(t), p1))
          ch += ((c0 <= c1, c1 <= c0 + tau)); c0 = n0; c1 = n1
        }
        val states = new Array[Int](days.size)
        states(days.size - 1) = if (c1 < c0) 1 else 0
        for (t <- days.size - 1 until 0 by -1)
          states(t - 1) =
            if (states(t) == 0) { if (ch(t)._1) 0 else 1 }
            else { if (ch(t)._2) 1 else 0 }
        days.zipWithIndex.foreach { case (d, i) =>
          val key = (tpe, 1704067200000L + d * 24L * 3600000L)
          assert(got(key)._3 == states(i),
            s"$tpe day $d: got ${got(key)._3} expected ${states(i)}")
        }
      }
      // and the burst actually fires: click is in q1 exactly on days 12-14
      val clickStates = (0 until 30).map(d =>
        got(("click", 1704067200000L + d * 24L * 3600000L))._3)
      assert(clickStates == (0 until 30).map(d => if (d >= 12 && d <= 14) 1 else 0),
        s"click states $clickStates")
      assert((0 until 30).forall(d =>
        got(("view", 1704067200000L + d * 24L * 3600000L))._3 == 0))
    }
  }

  test("ewmaSmooth matches the driver-side recurrence and seeds at the first day") {
    withTempDir { dir =>
      val daily = Seq(10, 20, 5, 40, 40, 1)
      writeEvents(dir, daily.zipWithIndex.map { case (n, d) => ("click", d * 24, n) })
      val got = TrendQueries.ewmaSmooth(spark, dir).collect()
        .map(r => (r.getLong(2), r.getDouble(3)))
      val expect = daily.drop(1).scanLeft(daily.head.toDouble)((a, x) => a * 0.7 + 0.3 * x)
      assert(got.map(_._1) sameElements daily.map(_.toLong))
      got.zip(expect).foreach { case ((_, g), e) =>
        assert(math.abs(g - math.rint(e * 1e6) / 1e6) < 1e-9, s"$g vs $e") }
    }
  }

  test("holtTrend matches the driver-side level/trend recurrences; forecast NULL only at t=1") {
    withTempDir { dir =>
      val daily = Seq(10, 12, 15, 20, 18, 30, 28)
      writeEvents(dir, daily.zipWithIndex.map { case (n, d) => ("click", d * 24, n) })
      val got = TrendQueries.holtTrend(spark, dir).collect()
      assert(got.head.isNullAt(5) && got.head.isNullAt(6))
      var (l, b) = (daily.head.toDouble, 0.0)
      daily.drop(1).zip(got.drop(1)).foreach { case (x, r) =>
        val f = l + b
        val l2 = 0.3 * x + 0.7 * (l + b)
        val b2 = 0.1 * (l2 - l) + 0.9 * b
        assert(math.abs(r.getDouble(5) - math.rint(f * 1e6) / 1e6) < 1e-9,
          s"forecast ${r.getDouble(5)} vs $f")
        assert(math.abs(r.getDouble(3) - math.rint(l2 * 1e6) / 1e6) < 1e-9)
        assert(math.abs(r.getDouble(4) - math.rint(b2 * 1e6) / 1e6) < 1e-9)
        l = l2; b = b2
      }
    }
  }

  test("chunker geometry: count formula, tail length, overlap, and cross-doc dedup") {
    withTempDir { dir =>
      val t40 = (1 to 40).map(i => s"w$i").mkString(" ")
      val t32 = (1 to 32).map(i => s"v$i").mkString(" ")
      val t5 = "a b c d e"
      Seq((1L, t40, "en", "s", 1L), (2L, t32, "en", "s", 2L),
          (3L, t5, "en", "s", 3L), (4L, t40, "en", "s", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val prof = CorpusQueries.chunkProfile(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(4)))).toMap
      // 40 tokens, C=32, S=24: chunks [1..32], [25..40] -> 2 chunks, tail 16
      assert(prof(1L) == ((2L, 16L)))
      // exactly C tokens -> a single full chunk
      assert(prof(2L) == ((1L, 32L)))
      // shorter than C -> one short chunk
      assert(prof(3L) == ((1L, 5L)))
      // doc 1 == doc 4: both of their chunks are corpus-level duplicates
      val dups = CorpusQueries.chunkDedup(spark, dir).collect()
      assert(dups.length == 2 && dups.forall(r => r.getLong(1) == 2 && r.getLong(2) == 2))
    }
  }
}
