package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins for the training-data pipeline operators. */
class PipelineSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("token shards: distributed prefix sum == single-window reference (sf0.001)") {
    // the operator range-partitions and stitches per-partition cumsums via
    // broadcast base offsets; the claim is that the result is identical to
    // the one-partition global running-sum window (which is only viable at
    // test scale — that's why the operator doesn't use it)
    val got = PipelineQueries.tokenShards(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val b = PipelineQueries.ShardTokens
    val w = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.Text.tokenCount($"text").cast("long").as("n"))
      .withColumn("cume", sum($"n").over(w))
      .collect().map { r =>
        val (id, n, cume) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val start = cume - n
        val ss = start / b
        val es = if (n == 0) ss else (cume - 1) / b
        (id, n, start, ss, es, ss != es)
      }
    assert(got.toSeq == ref.sortBy(_._1).toSeq)
    assert(got.nonEmpty && got.map(_._2).sum > 0)
  }

  test("packSequences: contiguous full windows, total fill = corpus tokens") {
    val rows = PipelineQueries.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val b = PipelineQueries.SeqTokens
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(graft.functions.Text.tokenCount($"text").cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq,
      "window ids must be contiguous from 0")
    assert(rows.map(_._3).sum == totalTokens,
      "window fills must partition the token stream")
    rows.init.foreach { r =>
      assert(r._3 == b, s"window ${r._1} not full: ${r._3}")
    }
    assert(rows.last._3 <= b && rows.last._3 > 0, "ragged tail fill")
    rows.foreach { r =>
      assert(r._4 <= r._2, s"window ${r._1}: spanning docs exceed doc count")
      assert(r._5 <= r._6, s"window ${r._1}: doc id range inverted")
    }
  }
}
