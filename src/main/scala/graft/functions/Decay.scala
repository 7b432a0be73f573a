package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exponential-decay weighting — the reference's title feature
  * ("exponential decaying window", reference edw_stream.py:64-100).
  *
  * Semantics preserved exactly: `weight = exp(-rate * dt / halfLife)` with
  * `dt = as_of_epoch_seconds - event_epoch_seconds` (edw_stream.py:78-84).
  * Note (SURVEY.md P7): despite the parameter name, the *effective* half-life
  * is `halfLife * ln2 / rate` (reference defaults 0.1 / 60 s ⇒ ≈416 s). We keep
  * the formula, not the name's implication.
  *
  * Deviations from the reference, by design:
  *  - `asOf` is an explicit column/literal, not wall-clock `datetime.now()`
  *    (edw_stream.py:75) — wall-clock is non-reproducible (SURVEY.md §7.4).
  *  - sentiment matching is case-insensitive: the reference compares
  *    lowercase labels against capitalized producer output
  *    ("Positive"/"Negative"/"Neutral", fake_producer.py:46) so its score is
  *    always 0.0 — a bug we do not reproduce (SURVEY.md P8).
  *
  * Everything here is pure `Column` arithmetic (Catalyst `Exp`/`Multiply`/
  * `Divide`/`CaseWhen`) — whole-stage-codegen'd, no UDFs, scales linearly.
  */
object Decay {

  /** Reference defaults: DECAY_RATE=0.1, HALF_LIFE=60 s (edw_stream.py:65-66). */
  val DefaultRate: Double = 0.1
  val DefaultHalfLife: Double = 60.0

  /** Fractional epoch seconds of a timestamp column, microseconds preserved.
    *
    * Version-robust formulation: Spark 4.1's analyzer rejects the direct
    * `TIMESTAMP_NTZ → DOUBLE` cast older runtimes coerced, so we go through
    * `timestamp_ltz` (identity for LTZ inputs; NTZ is interpreted in the
    * session TZ, which the engine pins to UTC — no semantic change) and
    * `unix_micros`. NOT `unix_timestamp`, which truncates to whole seconds
    * and would shift every decay weight. */
  def epochSeconds(ts: Column): Column =
    unix_micros(ts.cast("timestamp_ltz")).cast("double") / lit(1e6)

  /** `exp(-rate * (asOf - ts) / halfLife)`, timestamps in epoch seconds
    * (fractional seconds preserved via [[epochSeconds]]).
    */
  def decayWeight(ts: Column, asOf: Column,
                  rate: Double = DefaultRate,
                  halfLife: Double = DefaultHalfLife): Column =
    exp(lit(-rate) * (epochSeconds(asOf) - epochSeconds(ts)) / lit(halfLife))

  /** Positive→+1, Negative→-1, else 0 (edw_stream.py:92-96), case-insensitive. */
  def sentimentScore(label: Column): Column =
    when(lower(label) === "positive", lit(1.0))
      .when(lower(label) === "negative", lit(-1.0))
      .otherwise(lit(0.0))

  /** Sentiment-style score over the testdata `events.event_type` domain
    * (purchase = positive signal, error = negative, rest neutral). */
  def eventScore(eventType: Column): Column =
    when(eventType === "purchase", lit(1.0))
      .when(eventType === "error", lit(-1.0))
      .otherwise(lit(0.0))

  /** `weight * score` (edw_stream.py:97-100). */
  def weightedSentiment(weight: Column, score: Column): Column = weight * score
}
