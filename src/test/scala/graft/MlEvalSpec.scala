package graft

import graft.queries.{PipelineQueries, TrendQueries}
import org.apache.spark.sql.functions._

/** Classifier-evaluation (AUC / calibration) and rank-mover laws. Value
  * parity with DuckDB is the driver oracle; these pin the metric
  * identities against independent driver-side computations. */
class MlEvalSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("lrAuc equals an independently computed tie-corrected Mann-Whitney AUC at sf0.001") {
    val scored = PipelineQueries.qualityLr(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val labels = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val pairs = scored.toSeq.map { case (id, s) => (s, labels(id)) }
    // average ranks with ties, 1-based
    val sorted = pairs.sortBy(_._1)
    val avgRank = sorted.zipWithIndex.groupBy(_._1._1).toSeq.flatMap { case (_, g) =>
      val r = g.map(_._2 + 1.0).sum / g.size
      g.map { case ((_, lab), _) => (lab, r) }
    }
    val n1 = pairs.count(_._2).toDouble
    val n0 = pairs.size - n1
    val r1 = avgRank.filter(_._1).map(_._2).sum
    val expect = (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    val got = PipelineQueries.lrAuc(spark, sf).collect().head
    assert(got.getLong(0) == n1.toLong && got.getLong(1) == n0.toLong)
    assert(math.abs(got.getDouble(2) - expect) < 1e-6,
      s"auc ${got.getDouble(2)} vs $expect")
  }

  test("prCurve: every decile row replays exactly from driver-side counts") {
    val scored = PipelineQueries.qualityLr(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val labels = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en")).toMap
    val pos = scored.keys.count(labels)
    val rows = PipelineQueries.prCurve(spark, sf).collect()
    assert(rows.length == 10, "one row per decile threshold, always")
    rows.foreach { r =>
      val k = r.getInt(0)
      val predicted = scored.filter { case (_, s) =>
        math.min(9, math.floor(s * 10).toInt) >= k
      }
      val tp = predicted.keys.count(labels)
      assert(r.getDouble(1) == k / 10.0)
      assert(r.getLong(2) == predicted.size, s"pred_pos at decile $k")
      assert(r.getLong(3) == tp, s"tp at decile $k")
      assert(r.getLong(4) == pos - tp && r.getLong(5) == predicted.size - tp)
      if (predicted.nonEmpty)
        assert(math.abs(r.getDouble(6) - tp.toDouble / predicted.size) < 1e-6)
      else assert(r.isNullAt(6), "precision must be NULL when nothing predicted")
      if (pos > 0) assert(math.abs(r.getDouble(7) - tp.toDouble / pos) < 1e-6)
      val f1den = 2L * tp + (predicted.size - tp) + (pos - tp)
      if (f1den > 0) assert(math.abs(r.getDouble(8) - 2.0 * tp / f1den) < 1e-6)
      else assert(r.isNullAt(8), "f1 must be NULL, never NaN")
    }
    // operating-point laws: widening the threshold never shrinks coverage
    val preds = rows.map(_.getLong(2))
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b },
      "pred_pos must be non-increasing in the threshold")
    val tps = rows.map(_.getLong(3))
    assert(tps.zip(tps.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getLong(3) == pos, "threshold 0 predicts everything scored → recall 1")
  }

  test("qualityTopK: exact per-source top-N replay, and the plan is a WindowGroupLimit") {
    val scored = PipelineQueries.qualityLr(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val srcOf = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = scored.toSeq
      .map { case (id, s) => (srcOf(id), id, s) }
      .groupBy(_._1).view.mapValues(
        _.sortBy { case (_, id, s) => (-s, id) }
          .take(PipelineQueries.TopKPerSource)).toMap
    val got = PipelineQueries.qualityTopK(spark, sf).collect()
    assert(got.length == expect.values.map(_.size).sum)
    got.foreach { r =>
      val (src, rnk, id, score) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      val (_, eid, es) = expect(src)(rnk - 1)
      assert(id == eid && score == es, s"row $rnk of $src")
    }
    // the rank-filter must compile to a bounded per-task buffer, never a
    // source-sized sort: Spark's WindowGroupLimit node
    val plan = PipelineQueries.qualityTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan lacks WindowGroupLimit:\n$plan")
  }

  test("lrCalibration: bins partition the scored corpus and bin means sit inside their decile") {
    val bins = PipelineQueries.lrCalibration(spark, sf).collect()
    val nScored = PipelineQueries.qualityLr(spark, sf).count()
    assert(bins.map(_.getLong(1)).sum == nScored)
    bins.foreach { r =>
      val (bin, n, nPos, avg, frac) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(nPos <= n && frac >= 0.0 && frac <= 1.0)
      assert(avg >= bin / 10.0 - 1e-6 &&
        avg <= (if (bin == 9) 1.0 else (bin + 1) / 10.0) + 1e-6,
        s"bin $bin avg $avg outside decile")
    }
  }

  test("rankMovers: a key that flips from hot to cold tops the mover table with the right sign") {
    val dirPath = java.nio.file.Files.createTempDirectory("graft-movers")
    try {
      val base = 1704067200L
      // 30 keys at 5/period; key 0 gets 50 in period 1 only, key 1 gets 50
      // in period 2 only
      val rows = (0 until 30).flatMap { k =>
        def mk(day: Int, cnt: Int, tag: Int) = (0 until cnt).map(j =>
          (k.toLong * 100000 + day * 1000 + j * 2 + tag,
            base + day * 86400L + j, 1L, "click", 1.0, s"""{"k":$k}"""))
        mk(2, 5, 0) ++ mk(20, 5, 1) ++
          (if (k == 0) mk(3, 50, 0) else Nil) ++
          (if (k == 1) mk(21, 50, 1) else Nil)
      }
      rows.toDF("event_id", "epoch", "user_id", "event_type", "value", "props")
        .withColumn("ts", timestamp_seconds($"epoch")).drop("epoch")
        .write.mode("overwrite").parquet(s"${dirPath.toString}/events.parquet")
      val out = TrendQueries.rankMovers(spark, dirPath.toString).collect()
      assert(out.length <= 20)
      // key 0 takes rank1=1 then falls back into the tie block (delta -1);
      // key 1 mirrors it upward (+1); every other key's ranks are equal in
      // both periods -> only the two movers carry nonzero delta
      val topKeys = out.take(2).map(_.getLong(0)).toSet
      assert(topKeys == Set(0L, 1L), s"top movers ${topKeys}")
      val d = out.take(2).map(r => r.getLong(0) -> r.getInt(5)).toMap
      assert(d(0L) < 0 && d(1L) > 0,
        s"deltas $d: hot-then-cold must fall (rank1 small), cold-then-hot must rise")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
