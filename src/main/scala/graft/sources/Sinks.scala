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

  /** Morton Z-value of two non-negative `bits`-bit integer columns (Morton
    * 1966 — the space-filling-curve clustering key behind Delta/Iceberg
    * OPTIMIZE ZORDER): bit i of x lands at position 2i+1, bit i of y at
    * 2i, so sorting by z interleaves both dimensions and any contiguous
    * z-range spans a bounded rectangle in (x, y). Pure shift/and/or
    * Catalyst expressions — whole-stage-codegen, no UDF. */
  def zValue(x: org.apache.spark.sql.Column,
             y: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-order-clustered parquet: range-partition by the Morton value of the
    * two clustering columns, sort within partitions, write. Every output
    * file then covers a narrow rectangle in BOTH dimensions, so min/max
    * footer stats prune scans on either column (or both) — the multi-
    * dimensional generalization of [[writeDailyPartitioned]]'s one-key
    * pruning. At 100 TB this is a single range-shuffle over the
    * clustering key; SinksSpec pins the per-partition bounding-box law
    * against a hash-layout control. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int = 16, bits: Int = 8): Unit = {
    val z = df.withColumn("__z",
      zValue(col(xCol).cast("long"), col(yCol).cast("long"), bits))
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
