package graft

import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._

/** Date-partitioned layout: the plan must prune partitions, not filter
  * rows after a full scan. */
class SinksSpec extends SparkSpec {

  test("daily-partitioned parquet prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-parts").toString
    val events = Tables.events(spark, sf)
    Sinks.writeDailyPartitioned(events, dir)
    val firstDay = events.select(to_date(min(col("ts")))).collect()(0).getDate(0)
    val oneDay = spark.read.parquet(dir).filter(col("day") === lit(firstDay))
    val plan = oneDay.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // never in PushedFilters/post-scan Filter over the full table
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("day"), s"day not in partition filters: $pf")
    val expected = events.filter(to_date(col("ts")) === lit(firstDay)).count()
    assert(oneDay.count() == expected && expected > 0)
    // full read round-trips every row
    assert(spark.read.parquet(dir).count() == events.count())
  }
}
