package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join strategy for repeated large-table joins
  * at cluster scale: both sides pre-hashed into the same bucket layout on
  * the join key means the join runs with NO shuffle exchange at read time.
  * This spec pins that the plan is actually exchange-free (not just that
  * results are right), since that is the entire point of bucketing. */
class BucketingSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L by 2).map(i => (i, i * 2.0)).toDF("k", "rv")
    try {
      left.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/t_left").saveAsTable("graft_bkt_left")
      right.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$dir/t_right").saveAsTable("graft_bkt_right")
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = spark.table("graft_bkt_left")
          .join(spark.table("graft_bkt_right"), "k")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        assert(joined.count() == 500)
        // the same join on unbucketed frames DOES shuffle — the control
        val unbucketed = left.join(right, "k")
        assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
