package graft.queries

import graft.functions.Decay
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trend analytics over the `events` stream stand-in — the reference's
  * analytical core re-expressed as bounded queries (SURVEY.md §7.2 step 1).
  *
  * The reference computes per-row decay weights in foreachBatch
  * (edw_stream.py:78-105) and leaves the aggregation to Grafana; the engine
  * completes the pipeline: decay-weight → score → windowed weighted sums.
  *
  * Determinism: `as_of` is `max(ts)` of the dataset (scalar subquery), not
  * wall clock (SURVEY.md §7.4.1). Decay params here are rate=0.1,
  * halfLife=86400 s so the weight has dynamic range over the testdata's
  * 30-day span (the reference's 60 s halfLife would underflow to 0 for
  * anything older than ~2 h; the formula is identical).
  */
object TrendQueries {

  val Rate = 0.1
  val HalfLifeSec = 86400.0

  private def withAsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // broadcast 1-row max(ts) → no shuffle on the fact side
    ev.crossJoin(broadcast(ev.agg(max("ts").as("as_of"))))
  }

  /** Row-level EDW enrichment — parity with the reference's
    * twitter_sentiment_edw table shape (edw_stream.py:10-19): event fields +
    * weight + weighted score. */
  def edwEnriched(spark: SparkSession, dir: String): DataFrame = {
    val w = Decay.decayWeight(col("ts"), col("as_of"), Rate, HalfLifeSec)
    val s = Decay.eventScore(col("event_type"))
    withAsOf(spark, dir)
      .select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"),
        round(w, 6).as("weight"),
        round(w * s, 6).as("weighted_sentiment"))
      .orderBy("event_id")
  }

  /** Decayed sentiment trend per hour bucket — the flagship query. */
  def edwTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Decay.decayWeight(col("ts"), col("as_of"), Rate, HalfLifeSec)
    val s = Decay.eventScore(col("event_type"))
    withAsOf(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(
        round(sum(w), 6).as("sum_weight"),
        round(sum(w * s), 6).as("sum_weighted"),
        count(lit(1)).as("n_events"))
      .orderBy("bucket")
  }

  /** Decay-weighted value per event_type — "trending topics" analog:
    * recent activity counts more than old. */
  def decayedTypeTrend(spark: SparkSession, dir: String): DataFrame = {
    val w = Decay.decayWeight(col("ts"), col("as_of"), Rate, HalfLifeSec)
    withAsOf(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        round(sum(w), 6).as("decayed_count"),
        round(sum(w * col("value")), 6).as("decayed_value"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** Sentiment-label distribution (parity with the raw-table Grafana query). */
  def sentimentCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      .orderBy("event_type")

  /** ETL parse parity (SURVEY.md P1-P5): the reference casts Kafka binary →
    * string → from_json → flatten; here the JSON payload is `events.props`.
    * Extract `$.k`, aggregate by it. */
  def jsonEtl(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
              col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value").cast("decimal(18,2)")).cast("double"), 6).as("total_value"))
      .orderBy("k")

  /** Tumbling-window (1 day) per-type counts — true window aggregation the
    * reference lacks but its dashboards imply (SURVEY.md §2.5). */
  def dailyTypeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
      .orderBy("day", "event_type")
}
