package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's four streaming jobs, re-expressed on the Pipeline
  * components — a user of the reference can run the same four pipelines
  * against any Spark source (Kafka in production, MemoryStream in tests,
  * bounded frames for backfill):
  *
  *  - [[etl]]        ⇔ processing/spark_stream.py   (parse → project → sink)
  *  - [[edw]]        ⇔ processing/edw_stream.py     (decay-weighted enrich)
  *  - [[cmsJob]]     ⇔ processing/cms_stream.py     (keyword CMS metrics)
  *  - [[fmJob]]      ⇔ processing/flajolent_stream.py (FM distinct metrics)
  *
  * Differences by design (SURVEY.md §2.5): checkpoints everywhere, no
  * driver-side state or collect, explicit as-of for determinism in tests.
  * Each job takes the raw source frame (Kafka wire format: a binary/string
  * `value` column) and a foreachBatch-style sink callback, mirroring the
  * reference's JDBC-append structure without binding to Postgres.
  */
object TrendJobs {

  private def start(df: DataFrame, checkpointDir: String,
                    sink: (DataFrame, Long) => Unit,
                    onError: (Long, Throwable) => Unit,
                    trigger: Trigger): StreamingQuery =
    df.writeStream
      .foreachBatch(Pipeline.guardedForeachBatch(sink, onError))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(trigger)
      .start()

  /** spark_stream.py parity: parse → ETL projection → sink. */
  def etl(raw: DataFrame, checkpointDir: String,
          sink: (DataFrame, Long) => Unit,
          onError: (Long, Throwable) => Unit = rethrow,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(Pipeline.etlProjection(Pipeline.parseTweets(raw)),
      checkpointDir, sink, onError, trigger)

  /** edw_stream.py parity: parse → decay enrich (wall-clock as-of, like the
    * reference's datetime.now()) → sink. */
  def edw(raw: DataFrame, checkpointDir: String,
          sink: (DataFrame, Long) => Unit,
          onError: (Long, Throwable) => Unit = rethrow,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(Pipeline.enrich(Pipeline.parseTweets(raw), current_timestamp()),
      checkpointDir, sink, onError, trigger)

  /** cms_stream.py parity: per batch, append the raw rows via `sink` and the
    * tracked-keyword CMS estimates via `metricsSink` — both computed
    * distributed (the reference collects the batch to the driver). */
  def cmsJob(raw: DataFrame, checkpointDir: String,
             sink: (DataFrame, Long) => Unit,
             metricsSink: (DataFrame, Long) => Unit,
             onError: (Long, Throwable) => Unit = rethrow,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(Pipeline.parseTweets(raw), checkpointDir,
      (batch, id) => {
        if (!batch.isEmpty) {
          sink(batch, id)
          metricsSink(Pipeline.cmsMetrics(batch), id)
        }
      }, onError, trigger)

  /** flajolent_stream.py parity: raw append + one FM-estimate row per batch. */
  def fmJob(raw: DataFrame, checkpointDir: String,
            sink: (DataFrame, Long) => Unit,
            metricsSink: (DataFrame, Long) => Unit,
            onError: (Long, Throwable) => Unit = rethrow,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(Pipeline.parseTweets(raw), checkpointDir,
      (batch, id) => {
        if (!batch.isEmpty) {
          sink(batch, id)
          metricsSink(Pipeline.fmMetrics(batch), id)
        }
      }, onError, trigger)

  /** Takedown-cascade job — the streaming face of
    * [[graft.queries.TextQueries.takedownScrub]]: per micro-batch, drop
    * every document whose content fingerprint ([[graft.functions.Text
    * .fingerprint]], the same md5-of-normalized-text key the batch scrub
    * uses) appears in the ban-list dimension; survivors go to `sink`, the
    * scrubbed rows to `removedSink` (the audit trail a right-to-be-
    * forgotten pipeline must keep).
    *
    * The ban list is a SLOWLY CHANGING DIMENSION: `banList` is a thunk
    * re-evaluated at every micro-batch (a parquet / JDBC re-read in
    * production), so a takedown notice landing mid-stream takes effect on
    * the NEXT batch with no query restart. The anti-join broadcasts the
    * ban side and is STATE-FREE — nothing to watermark, no state-store
    * growth at any stream length, unlike a stream-stream formulation.
    * Rows with NULL text (malformed JSON, PERMISSIVE parse) have no
    * fingerprint and pass through to `sink` un-scrubbed — a takedown can
    * only name content, and dropping unparsed rows would hide ingest
    * errors from the error-table path. */
  def takedownJob(raw: DataFrame, checkpointDir: String,
                  banList: () => DataFrame,
                  sink: (DataFrame, Long) => Unit,
                  removedSink: (DataFrame, Long) => Unit = (_, _) => (),
                  onError: (Long, Throwable) => Unit = rethrow,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    start(Pipeline.parseTweets(raw), checkpointDir,
      (batch, id) => {
        if (!batch.isEmpty) {
          val bans = broadcast(
            banList().select(col("fp")).distinct())
          val fp = batch.withColumn("fp",
            graft.functions.Text.fingerprint(col("text")))
          sink(fp.join(bans, Seq("fp"), "left_anti").drop("fp"), id)
          removedSink(fp.filter(col("fp").isNotNull)
            .join(bans, Seq("fp"), "left_semi").drop("fp"), id)
        }
      }, onError, trigger)

  private def rethrow: (Long, Throwable) => Unit = (_, e) => throw e
}
