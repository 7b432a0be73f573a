package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-side layouts. The reference's only batch sink is JDBC append
  * (spark_stream.py:40-48); at 100 TB the storage layout IS the query
  * plan, so the engine adds the two layouts that matter:
  *
  *  - date-partitioned parquet (`partitionBy(day)`) — time-range predicates
  *    prune whole directories at planning time (PartitionFilters in the
  *    scan, pinned in SinksSpec), which is the difference between scanning
  *    a day and scanning a decade;
  *  - bucketed tables (`bucketBy` on the join key) — repeated large-table
  *    joins skip their shuffle entirely (pinned in BucketingSpec).
  */
object Sinks {

  /** Write events date-partitioned: one directory per day, derived from the
    * event timestamp. Readers filtering on `day` scan only matching
    * directories. */
  def writeDailyPartitioned(events: DataFrame, path: String): Unit =
    events.withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(path)
}
