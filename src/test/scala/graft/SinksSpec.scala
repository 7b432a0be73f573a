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

  test("zValue: bit interleave matches a driver-side Morton reference") {
    val sql = SparkSpec.spark
    import sql.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    val pts = for (x <- 0L to 255L by 17; y <- 0L to 255L by 13) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Sinks.zValue(col("x"), col("y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"z($x,$y)")
    }
  }

  test("z-ordered layout: every partition covers a bounded rectangle in BOTH dims") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val events = Tables.events(spark, sf)
      .withColumn("x", pmod(col("user_id"), lit(256L)))
      .withColumn("y", pmod(floor(col("value")).cast("long"), lit(256L)))
    Sinks.writeZOrdered(events, "x", "y", dir, numFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count(), "round-trip must keep every row")
    // per-FILE bounding boxes: z-order keeps both dims narrow per file,
    // which is what parquet min/max footer pruning sees
    val boxes = back
      .withColumn("file", input_file_name())
      .groupBy("file")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // a 16-range split of a 16-bit z-space fixes the top 2 bits of each
    // dim exactly; ranges land mid-box in practice — assert the law that
    // matters for pruning: strictly narrower than the full 0..255 extent
    // in both dimensions for every file, and ≤ half the extent in x for
    // most files (a hash layout gives width ~255 in every file)
    assert(boxes.nonEmpty)
    boxes.foreach { case (wx, wy) =>
      assert(wx < 255 && wy < 255, s"file spans full extent: x=$wx y=$wy")
    }
    assert(boxes.count(_._1 <= 128) >= boxes.length / 2,
      s"x-widths not clustered: ${boxes.map(_._1).mkString(",")}")
  }
}
