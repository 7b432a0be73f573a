package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.functions._

/** Pins for the relational operators whose semantics have knife edges the
  * DuckDB oracle exercises only statistically on the synthetic corpus. */
class RelationalSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("range join: inclusive [-1h, 0] window, cross-bin matches, zero-view purchases kept") {
    // crafted events: one purchase anchors 12:00:00; views probe the
    // window edges and the bin boundary (bins are 1h-aligned epochs, so
    // 11:30 lies in the PREVIOUS bin of a 12:00 purchase — the case the
    // 2-bin explode exists for)
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    val rows = Seq(
      // event_id, ts, user_id, event_type, value
      (1L, "2024-01-01 12:00:00", 1L, "purchase", 10.0),
      (2L, "2024-01-01 11:00:00", 1L, "view", 1.0),   // exactly -1h: IN (>=)
      (3L, "2024-01-01 10:59:59", 1L, "view", 2.0),   // just outside: OUT
      (4L, "2024-01-01 12:00:00", 1L, "view", 4.0),   // exactly at ts: IN (<=)
      (5L, "2024-01-01 11:30:00", 1L, "view", 8.0),   // previous bin: IN
      (6L, "2024-01-01 11:59:00", 2L, "view", 16.0),  // other user: OUT
      (7L, "2024-01-01 00:00:00", 3L, "purchase", 5.0) // no views at all
    )
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = RelationalQueries.rangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq((1L, 3L, 13.0), (7L, 0L, 0.0)))
  }
}
