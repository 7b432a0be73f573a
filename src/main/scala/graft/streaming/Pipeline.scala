package graft.streaming

import graft.functions.{Decay, Sketches, Text}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming parity layer — the reference's four jobs re-expressed as one
  * composable pipeline (spark_stream.py, cms_stream.py, edw_stream.py,
  * flajolent_stream.py), with the fault-tolerance the reference lacks:
  * checkpoints (reference has none — a restart loses offsets AND the
  * driver-held CMS table, SURVEY.md §2.5), watermarked event-time windows,
  * and sketch state expressed as mergeable aggregation buffers instead of a
  * driver singleton (cms_stream.py:69).
  *
  * Every transform is a pure DataFrame→DataFrame function, so the same code
  * runs on a bounded frame (tests, backfill) and an unbounded stream —
  * Structured Streaming's incrementalization handles the rest.
  */
object Pipeline {

  /** Kafka source wiring (reference spark_stream.py:24-29). Subscribes
    * binary key/value; `startingOffsets=earliest` + checkpoint gives
    * at-least-once (the reference uses `latest` with no checkpoint: zero
    * delivery guarantees). */
  def kafkaStream(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** P1+P2+P3 chain (spark_stream.py:31-38): binary/string JSON value →
    * typed tweet columns. PERMISSIVE parse: malformed fields → null, exactly
    * like the reference's default from_json behavior. */
  def parseTweets(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), Tables.tweetSchema).as("data"))
      .select(
        col("data.text").as("text"),
        col("data.created_at").as("created_at"),
        col("data.sentiment").as("sentiment"),
        col("data.entities").as("entities"))

  /** ETL projection for the main sink (spark_stream.py:33-38): entities
    * re-serialized to a JSON string for relational storage. */
  def etlProjection(parsed: DataFrame): DataFrame =
    parsed.select(
      col("text"), col("created_at"), col("sentiment"),
      to_json(col("entities")).as("entities"))

  /** EDW enrichment (edw_stream.py:74-105): decay weight vs `asOf`,
    * case-insensitive sentiment score, weighted sentiment. In streaming,
    * pass `current_timestamp()` as `asOf` for the reference's wall-clock
    * semantics; tests/batch pass a literal for determinism. */
  def enrich(parsed: DataFrame, asOf: Column,
             rate: Double = Decay.DefaultRate,
             halfLife: Double = Decay.DefaultHalfLife): DataFrame = {
    val w = Decay.decayWeight(col("created_at"), asOf, rate, halfLife)
    val s = Decay.sentimentScore(col("sentiment"))
    parsed
      .withColumn("weight", w)
      .withColumn("weighted_sentiment", Decay.weightedSentiment(w, s))
  }

  /** Watermarked tumbling-window sentiment trend — the aggregate the
    * reference leaves to Grafana (SURVEY.md A3), here computed in-stream so
    * late data is bounded and state is evictable at scale. */
  def windowedTrend(parsed: DataFrame, windowLen: String = "1 minute",
                    lateness: String = "2 minutes"): DataFrame =
    parsed
      .withWatermark("created_at", lateness)
      .groupBy(window(col("created_at"), windowLen), col("sentiment"))
      .agg(count(lit(1)).as("n"),
        sum(Decay.sentimentScore(col("sentiment"))).as("score_sum"))
      .select(col("window.start").as("bucket"), col("sentiment"), col("n"),
        col("score_sum"))

  /** Per-batch keyword CMS metrics (cms_stream.py:89-127) — distributed:
    * tokenize+explode on executors, sketch as an aggregation buffer. Returns
    * one row per tracked keyword, mirroring the reference's cms_estimates
    * table (batch_id column added by the caller). */
  def cmsMetrics(batch: DataFrame): DataFrame = {
    val toks = batch.select(explode(Text.tokenize(col("text"))).as("tok"))
    val sketch = toks.agg(Sketches.cms(col("tok")).as("sketch"))
    val spark = batch.sparkSession
    import spark.implicits._
    sketch.crossJoin(Sketches.TrackedKeywords.toDF("keyword"))
      .select(col("keyword"),
        Sketches.cmsEstimateUdf(col("sketch"), col("keyword")).as("estimated_count"))
  }

  /** Cross-batch CUMULATIVE keyword CMS — exact parity with the reference's
    * lifetime semantics (cms_stream.py:69 holds one driver-global sketch
    * that accumulates over the life of the stream; [[cmsMetrics]] is the
    * per-batch variant). Spark-natively this is an unbounded streaming
    * aggregation in complete/update mode: the sketch lives in the state
    * store as a mergeable aggregation buffer — partitioned, checkpointed,
    * restart-safe — instead of a process singleton that a restart wipes.
    * Emits one row of cumulative tracked-keyword estimates per trigger. */
  def cmsCumulative(parsed: DataFrame): DataFrame =
    parsed.select(explode(Text.tokenize(col("text"))).as("tok"))
      .agg(Sketches.cms(col("tok")).as("sketch"))
      .select(Sketches.TrackedKeywords.map(k =>
        Sketches.cmsEstimateUdf(col("sketch"), lit(k)).as(k)): _*)

  /** Windowed trending keywords — the reference project's headline use case
    * (sports-keyword trend analysis) as one composable stream: tokenize →
    * watermarked tumbling window × word counts. Counts are incrementally
    * maintainable so they stream in append mode (rows final once the
    * watermark closes a window); RANKING is not incrementally maintainable,
    * so top-k runs per emitted window in the sink via [[topKPerWindow]] —
    * a few rows per window, trivial wherever it lands. */
  def keywordTrend(parsed: DataFrame, windowLen: String = "10 minutes",
                   lateness: String = "10 minutes"): DataFrame =
    parsed
      .filter(col("created_at").isNotNull)
      .withWatermark("created_at", lateness)
      .select(col("created_at"), explode(Text.tokenize(col("text"))).as("word"))
      .groupBy(window(col("created_at"), windowLen), col("word"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("word"), col("n"))

  /** Rank a [[keywordTrend]] output batch: top-k words per window bucket
    * (ties → word). */
  def topKPerWindow(counts: DataFrame, k: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n").desc, col("word"))
    counts.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("bucket"), col("rank"))
  }

  /** Per-batch FM distinct estimate (flajolent_stream.py:64-101). */
  def fmMetrics(batch: DataFrame): DataFrame =
    batch.agg(Sketches.fm(col("text")).as("fm_estimate"))

  /** Stream-stream interval join: correlate two tweet streams on sentiment
    * where the right event lands within `window` after the left one. Both
    * sides carry watermarks so Spark can bound the join state and emit
    * results incrementally — the streaming counterpart of the engine's
    * relational joins. Returns (sentiment, left text/time, right text/time). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   window: String = "1 hour",
                   lateness: String = "2 hours"): DataFrame = {
    val l = left.select(col("sentiment").as("l_sentiment"),
        col("text").as("l_text"), col("created_at").as("l_time"))
      .withWatermark("l_time", lateness)
    val r = right.select(col("sentiment").as("r_sentiment"),
        col("text").as("r_text"), col("created_at").as("r_time"))
      .withWatermark("r_time", lateness)
    l.join(r,
      expr(s"""l_sentiment = r_sentiment AND
               r_time >= l_time AND
               r_time <= l_time + INTERVAL $window"""))
      .select(col("l_sentiment").as("sentiment"),
        col("l_text"), col("l_time"), col("r_text"), col("r_time"))
  }

  /** Stream-static enrichment join: attach a static dimension frame (a
    * parquet/JDBC lookup table) to the stream by key. Spark re-plans the
    * static side each micro-batch; marking it broadcast keeps the join
    * map-side — the standard pattern for dimension enrichment at scale
    * (state-free, unlike stream-stream joins). Left join preserves stream
    * rows with no dimension match. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** The reference's error-table pattern (edw_stream.py:124-136): run the
    * batch writer; on failure append (batch_id, error, timestamp) to an
    * error sink instead of killing the query. */
  def guardedForeachBatch(
      process: (DataFrame, Long) => Unit,
      onError: (Long, Throwable) => Unit): (DataFrame, Long) => Unit =
    (batch, id) =>
      try process(batch, id)
      catch { case e: Throwable => onError(id, e) }

  /** Streaming deduplication by content fingerprint within the watermark —
    * the streaming face of the dedup surface: duplicates arriving within
    * `lateness` of each other are dropped; state for old fingerprints is
    * evicted by the watermark (bounded state at any throughput, unlike a
    * plain dropDuplicates whose state grows forever). */
  def dedupStream(parsed: DataFrame, lateness: String = "10 minutes"): DataFrame = {
    // malformed events parse to text=NULL (PERMISSIVE); dedup treats NULL
    // keys as equal, which would silently collapse every malformed row in
    // the watermark to one — pass them through un-deduped instead
    val wm = parsed.withWatermark("created_at", lateness)
    wm.filter(col("text").isNotNull)
      .dropDuplicatesWithinWatermark(Seq("text"))
      .unionByName(wm.filter(col("text").isNull))
  }

  /** A member of one LSH band bucket in the streaming near-dup index:
    * full MinHash signature + sorted hashed shingle set + event time. */
  case class BandMember(doc_id: Long, ts_ms: Long,
                        sig: Array[Long], sh: Array[Long])

  /** "10 minutes" → 600000L — the subset of Spark's interval grammar the
    * streaming lateness parameters use, parsed once driver-side so the
    * stateful closures capture a plain Long. */
  private[graft] def durationMs(s: String): Long = {
    val parts = s.trim.toLowerCase.split("\\s+")
    require(parts.length == 2, s"durationMs: expected '<n> <unit>', got '$s'")
    val v = parts(0).toLong
    // match bare "ms"/"s" before the plural strip — stripSuffix("s")
    // would turn "ms" into "m" (minutes!) and "s" into "" (ADVICE r10)
    parts(1) match {
      case "ms" => v
      case "s"  => v * 1000L
      case u => u.stripSuffix("s") match {
      case "millisecond" | "ms" => v
      case "second" | "sec"     => v * 1000L
      case "minute" | "min"     => v * 60000L
      case "hour" | "hr"        => v * 3600000L
      case "day"                => v * 86400000L
      case o => throw new IllegalArgumentException(s"durationMs: unit '$o'")
      }
    }
  }

  /** A confirmed streaming near-duplicate pair (doc_a < doc_b). */
  case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Streaming NEAR-duplicate detection — the streaming face of the batch
    * MinHash(128)+LSH(32×4) dedup ([[graft.queries.SimilarityQueries
    * .minhashDedup]], same signatures to the bit, same J ≥ 0.8 exact
    * verification): each arriving document is shingled and signed once
    * map-side, fanned out to its 32 band buckets, and compared ONLY
    * against its buckets' members — the LSH index lives in the state
    * store (RocksDB under the engine's test/production config) instead of
    * a static table.
    *
    * Exactly-once pair emission without cross-bucket coordination: every
    * bucket holds both FULL signatures, so each bucket evaluates
    * [[graft.functions.Similarity.firstCollidingBand]] locally and only
    * the first colliding band emits the pair — no downstream distinct, no
    * second stateful operator.
    *
    * Scale posture: per-bucket state is the same bounded bucket occupancy
    * the batch LSH join relies on (banding spreads near-uniform corpora;
    * adversarially hot buckets are a data-quality signal, surfaced by the
    * batch side's df-caps); expired members are evicted BOTH on the data
    * path (a bucket receiving new rows drops members behind the watermark)
    * and by event-time timeout — each bucket arms a timeout at
    * (max member ts + lateness), so quiet buckets are visited and REMOVED
    * once the watermark passes them instead of persisting forever (ADVICE
    * r9: under NoTimeout, most of a document's ~32 band keys never saw a
    * second row and their state grew with all documents ever seen). Total
    * state is therefore bounded by the window's document volume — the
    * index never grows past what a restart must replay. A duplicate
    * arriving after its partner's eviction is missed, the standard
    * watermark trade dedupStream already makes.
    *
    * Input schema: (doc_id long, text string, ts timestamp). Emits
    * verified pairs in append mode as they are discovered. Rows at or
    * behind the current watermark are dropped by the exec as late data
    * (standard EventTimeTimeout semantics) — consistent with the member
    * filter, which would have refused to index them anyway. */
  def nearDupStream(docs: DataFrame, lateness: String = "10 minutes"): Dataset[NearDupPair] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.Similarity
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val shArr = Similarity.shinglesOf(text, 3)
        if (shArr.isEmpty) Iterator.empty // < 3 tokens: no shingles, as in batch
        else {
          val sig = Similarity.minhashSigOf(shArr)
          val shh = shArr.map(Similarity.baseHash).distinct.sorted
          val r = Similarity.RowsPerBand
          (0 until Similarity.Bands).iterator.map { b =>
            // exact band key (band + the slice values themselves): no
            // hash-collision bucket merging, buckets match batch banding
            val key = b + ":" + sig.slice(b * r, b * r + r).mkString(",")
            (key, ts, BandMember(id, ts.getTime, sig, shh))
          }
        }
      }
      // the watermark must attach to THIS frame: typed flatMap drops
      // event-time metadata, and getCurrentWatermarkMs below requires a
      // watermark declared on the stateful operator's direct input
      .toDF("key", "ts", "member")
      .withWatermark("ts", lateness)
      .as[(String, java.sql.Timestamp, BandMember)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[BandMember], NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        val latenessMs = durationMs(lateness)
        (key: String, rows: Iterator[(String, java.sql.Timestamp, BandMember)],
         state: GroupState[Seq[BandMember]]) =>
          if (state.hasTimedOut) {
            // quiet-bucket eviction (ADVICE r9): the watermark has passed
            // every member's (ts + lateness) — none can still pair with an
            // admissible arrival, so the whole bucket goes
            state.remove()
            Iterator.empty
          } else {
            val band = key.takeWhile(_ != ':').toInt
            val wm = state.getCurrentWatermarkMs()
            var members = state.getOption.getOrElse(Seq.empty)
              .filter(m => wm <= 0 || m.ts_ms >= wm)
            val out = Seq.newBuilder[NearDupPair]
            // doc_id order within the batch → deterministic pair emission
            rows.map(_._3).toSeq.sortBy(_.doc_id).foreach { m =>
              if (!members.exists(_.doc_id == m.doc_id)) { // replay-idempotent
                members.foreach { o =>
                  if (Similarity.firstCollidingBand(m.sig, o.sig) == band) {
                    val j = Similarity.jaccardOfSorted(m.sh, o.sh)
                    if (j >= Similarity.JaccardThreshold)
                      out += NearDupPair(math.min(m.doc_id, o.doc_id),
                        math.max(m.doc_id, o.doc_id),
                        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                          .toDouble)
                  }
                }
                members = members :+ m
              }
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(members)
              // re-armed every visit: fires once the newest member ages out
              // (must stay strictly ahead of the current watermark)
              state.setTimeoutTimestamp(
                math.max(members.map(_.ts_ms).max + latenessMs, wm + 1))
            }
            out.result().iterator
          }
      }
  }

  /** Cross-batch running sentiment totals via managed per-key state
    * (`mapGroupsWithState`) — the engine's answer to the reference's
    * driver-held cross-batch accumulation (cms_stream.py:69): state lives in
    * the state store (checkpointable, partitioned by key across executors)
    * instead of a process-global singleton. Emits the updated total for
    * every key seen in the batch. */
  def runningSentimentCounts(parsed: DataFrame): Dataset[(String, Long)] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .select(coalesce(lower(col("sentiment")), lit("unknown")).as("sentiment"))
      .as[String]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Long)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (key, total)
      }
  }

  /** A per-(type, hour) burst evaluation emitted by [[burstAlerts]]. */
  case class BurstAlert(event_type: String, hr: Long, n: Long, m: Long,
                        z: Option[Double], is_burst: Boolean)

  /** Stateful streaming face of the batch burst detector
    * ([[graft.queries.TrendQueries.burstZscore]] — trailing-24-bucket
    * z-score, the same arithmetic expression to the bit): per event type
    * the state store keeps the last `horizonHours` hourly counts; each
    * micro-batch merges its counts in, trims, and re-emits the evaluation
    * for every bucket the batch touched — update-mode upsert keyed
    * (event_type, hr). Fed its full history in one batch it reproduces the
    * batch operator row-for-row (the parity test in StreamingSpec).
    *
    * State posture at scale: ≤ horizonHours (hr, count) pairs per type
    * under RocksDB — bounded regardless of stream length; silent hours
    * occupy no state and contribute no window mass (the batch RANGE
    * frame's gap-robustness, preserved). Evaluation reads the pre-trim
    * merged view so a late bucket older than the horizon still evaluates
    * against whatever history remains rather than crashing or skewing. */
  def burstAlerts(events: DataFrame, horizonHours: Long = 48): Dataset[BurstAlert] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type").cast("string").as("k"),
        (unix_timestamp(col("ts")) / 3600L).cast("long").as("hr"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], BurstAlert](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          val incoming = rows.map(_._2).toSeq
            .groupBy(identity).view.mapValues(_.size.toLong).toMap
          val prev = state.getOption.getOrElse(Map.empty[Long, Long])
          val merged = incoming.foldLeft(prev) { case (acc, (h, c)) =>
            acc.updated(h, acc.getOrElse(h, 0L) + c)
          }
          val maxHr = merged.keys.max
          state.update(merged.filter { case (h, _) => h > maxHr - horizonHours })
          incoming.keys.toSeq.sorted.iterator.map { hr =>
            val win = merged.filter { case (h, _) => h >= hr - 24 && h <= hr - 1 }
            val m = win.size.toLong
            val n = merged(hr)
            if (m >= 12) {
              val s = win.values.sum
              val ss = win.values.map(v => v * v).sum
              // the batch operator's exact expression shape: integer
              // sufficient statistics, one fixed double combination
              val mean = s.toDouble / m.toDouble
              val varp =
                (ss.toDouble - s.toDouble * s.toDouble / m.toDouble) / m.toDouble
              if (varp > 0.0) {
                val z = (n.toDouble - mean) / math.sqrt(varp)
                val z6 = BigDecimal(z)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                BurstAlert(key, hr, n, m, Some(z6), z >= 3.0)
              } else BurstAlert(key, hr, n, m, None, is_burst = false)
            } else BurstAlert(key, hr, n, m, None, is_burst = false)
          }
      }
  }

  /** A closed session emitted by [[sessionize]]. */
  case class ClosedSession(key: String, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Explicit-state sessionization via `flatMapGroupsWithState` with an
    * EVENT-TIME timeout — the general form of session aggregation when the
    * built-in `session_window` can't express the semantics (custom close
    * conditions, emit-on-close only, per-session payloads). State per key
    * is one (start, last, count) triple in the state store; a session
    * closes when the watermark passes last + gap (timeout fires with no
    * rows) or when a new event arrives past the gap. Append-mode output:
    * exactly one row per CLOSED session — open sessions emit nothing. */
  def sessionize(parsed: DataFrame, gapMinutes: Long = 30,
                 lateness: String = "1 hour"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = parsed.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    parsed
      .filter(col("created_at").isNotNull && col("sentiment").isNotNull)
      .withWatermark("created_at", lateness)
      // keep the watermarked timestamp column itself — casting it would
      // mint a fresh attribute without the event-time tag and event-time
      // timeouts would be rejected at analysis
      .select(col("sentiment").as("key"), col("created_at").as("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rowsTs: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          // keep millisecond precision: truncating to seconds here would
          // shift gap comparisons by up to ~1s and split sessions wrongly
          val rows = rowsTs.map { case (k, t) => (k, t.getTime) }
          def close(s: (Long, Long, Long)): ClosedSession =
            ClosedSession(key, new java.sql.Timestamp(s._1),
              new java.sql.Timestamp(s._2), s._3)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toSeq
            state.remove()
            out.iterator
          } else {
            val ts = rows.map(_._2).toSeq.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s._2 < gapMs =>
                  cur = Some((s._1, math.max(s._2, t), s._3 + 1))
                case Some(s) => // gap exceeded in-stream: close, start anew
                  closed ::= close(s)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s._2 + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }

  /** JDBC append sink body (spark_stream.py:40-48) — parity API for the
    * reference's Postgres path. Driver defaults to Postgres like the
    * reference; the sandbox round-trip test passes embedded Derby
    * (StreamingSpec — no Postgres server or driver jar here).
    *
    * Derby/Postgres delta, documented in lieu of an integration test: the
    * mechanics exercised against Derby (append DDL inference, batching,
    * type mapping for string/numeric/timestamp) are identical under the
    * Postgres dialect with one reference-relevant exception — the
    * reference's `edw_tweets.entities` column is Postgres JSONB
    * (edw_stream.py:13), which Spark's JDBC writer cannot emit directly: a
    * string column maps to TEXT. The parity recipe is the standard one:
    * write `to_json(entities)` as TEXT (or pre-create the table with a
    * JSONB column and `stringtype=unspecified` in the JDBC URL so Postgres
    * casts the text on insert); both keep this sink driver-agnostic. */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 user: String, password: String,
                 driver: String = "org.postgresql.Driver"): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("user", user).option("password", password)
      .option("driver", driver)
      .mode("append").save()

  /** EXACTLY-ONCE JDBC sink for foreachBatch (VERDICT r5 #6). foreachBatch
    * delivery is at-least-once: a crash between the sink write and the
    * checkpoint commit replays the whole epoch, and plain [[jdbcAppend]]
    * would then double-append. The standard idempotent-sink pattern fixes
    * it: every row is keyed by `batch_id`, and a delivery FIRST purges any
    * rows already carrying this epoch's id, THEN appends — so a replay
    * (full or partial: the purge also clears a half-written batch a crash
    * left behind) converges to exactly one copy of each epoch. Epoch
    * output must be deterministic for byte-identical convergence, which
    * Structured Streaming guarantees per checkpointed offset range.
    *
    * Scale note: the purge is one indexed DELETE on the driver connection
    * — O(replayed rows), executed once per epoch, zero cost on the
    * no-replay fast path; the append itself is the usual distributed
    * executor write. */
  def jdbcAppendIdempotent(df: DataFrame, batchId: Long, url: String,
                           table: String, user: String, password: String,
                           driver: String = "org.postgresql.Driver"): Unit = {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url, user, password)
    try {
      // the table won't exist before the first append (Spark's JDBC writer
      // creates it) — probe the catalog instead of parsing vendor errors
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      var exists = false
      while (rs.next())
        if (rs.getString("TABLE_NAME").equalsIgnoreCase(table)) exists = true
      rs.close()
      if (exists) {
        // Spark's JDBC writer quotes column identifiers on CREATE, so the
        // column is case-exact `batch_id` — quote it here too (an unquoted
        // name would upcase under Derby/Postgres folding and miss)
        val del = conn.prepareStatement(s"""DELETE FROM $table WHERE "batch_id" = ?""")
        try { del.setLong(1, batchId); del.executeUpdate() } finally del.close()
      }
    } finally conn.close()
    jdbcAppend(df.withColumn("batch_id", lit(batchId)), url, table, user,
      password, driver)
  }

  /** Start an ETL stream to parquet with checkpointing — the engine's
    * durable replacement for the reference's unguarded foreachBatch. */
  def startParquetSink(parsed: DataFrame, outDir: String, checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    etlProjection(parsed).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** K7 — the reference's console debug sink (spark_stream.py's
    * `format("console")` tap): truncate-disabled append echo of any
    * stream, the zero-setup inspection tool. Debug-only by design — the
    * driver-side print is the point, so it is never part of a measured
    * path. */
  def startConsoleSink(df: DataFrame, numRows: Int = 20,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("console")
      .option("numRows", numRows.toString)
      .option("truncate", "false")
      .outputMode("append")
      .trigger(trigger)
      .start()
}
