package graft.queries

import graft.functions.Decay
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // per-TYPE sums span millions of rows at the scale tiers — quantize
    // each term to the 6-dp grid and fold in DECIMAL (order-exact), or the
    // 6th decimal of a ~1e7 raw-double sum flips with partition layout
    // (caught live in the r12 sf10 sweep after the tier regenerated with a
    // different file order; the hour-bucketed sibling keeps raw sums — its
    // per-group mass stays far below the grid)
    withAsOf(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(round(w, 6).cast("decimal(28,6)")).cast("double")
          .as("decayed_count"),
        sum(round(w * col("value"), 6).cast("decimal(28,6)")).cast("double")
          .as("decayed_value"),
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

  /** Burst detection — the "is this trending NOW" classifier the reference's
    * dashboards eyeball (Grafana panels over edw_metrics; SURVEY.md §2.5):
    * per (event_type, hour) count vs a trailing-24-hour baseline, flagged
    * when the z-score clears 3σ.
    *
    * The baseline frame is a RANGE frame over the integer epoch-hour
    * (`RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING`), so a silent hour
    * contributes nothing and can never shift the window the way a ROWS
    * frame would — semantically "the last 24 wall-clock hours", gap-robust.
    *
    * Determinism doctrine: every windowed statistic is an exact integer
    * (count / sum / sum-of-squares); mean, variance and z are derived from
    * those integers by one fixed arithmetic expression shared with the
    * DuckDB oracle, so the doubles agree bit-for-bit. Variance via the
    * computational formula (ss − s²/m)/m is safe here: counts are small
    * non-negative integers, no catastrophic cancellation at this scale.
    *
    * Scale posture: one shuffle to (type, hour) counts — the frame that the
    * window then runs over is |types|·|hours|, calendar-bounded, NOT
    * data-bounded; at 100 TB the per-hour pre-aggregation IS the reduction
    * (map-side partial counts collapse before the exchange). */
  def burstZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, dir)
      .groupBy($"event_type",
        (unix_timestamp($"ts") / 3600L).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"hr")
      .rangeBetween(-24, -1)
    val m  = count(lit(1)).over(w)
    val s  = sum($"n").over(w)
    val ss = sum($"n" * $"n").over(w)
    val mean = s.cast("double") / m.cast("double")
    val varp = (ss.cast("double") - s.cast("double") * s.cast("double") / m.cast("double")) / m.cast("double")
    val z = ($"n".cast("double") - mean) / sqrt(varp)
    hourly
      .select($"event_type", timestamp_seconds($"hr" * 3600L).as("bucket"),
        $"n", m.as("m"),
        when(m >= 12 && varp > 0.0, round(z, 6)).as("z"),
        when(m >= 12 && varp > 0.0, z >= 3.0).otherwise(lit(false)).as("is_burst"))
      .orderBy($"event_type", $"bucket")
  }

  /** Kleinberg 2-state burst automaton (Kleinberg 2002, "Bursty and
    * Hierarchical Structure in Streams", the discrete/batched variant of
    * §4) over daily per-type rates — THE canonical trend-detection
    * algorithm, and the principled complement to `burstZscore`'s
    * threshold heuristic: it finds burst *intervals* by globally optimal
    * state assignment, not per-bucket triggers.
    *
    * Model: each day t has r_t events of the type out of d_t total; state
    * q0 emits at the type's base rate p0 = R/D, state q1 at p1 =
    * min(3·p0, 0.99). Day cost in state q is the binomial NLL
    * −(r·ln p_q + (d−r)·ln(1−p_q)) (the C(d,r) term is state-independent
    * and cancels); entering q1 costs τ = ln T once. The optimal state
    * sequence is Viterbi: forward pass keeps (c0, c1) plus one
    * predecessor flag pair per day, backward pass reconstructs states.
    *
    * Scale posture: the only corpus-sized work is the daily count
    * aggregate; the dense (type × day) grid, the forward fold, and the
    * backtrack fold all run over calendar-bounded arrays (T days per
    * type) — never data-sized state. At 100 TB the DP cost is unchanged.
    *
    * Determinism: p0/p1/τ and every cost derive from exact integer counts
    * through one fixed double expression shared with the oracle (`log` =
    * `ln`, never `log1p`); ties prefer q0 / staying (<= comparisons),
    * mirrored exactly in the SQL. The DuckDB oracle replays BOTH Viterbi
    * passes as recursive CTEs and must agree on every state. */
  def kleinbergBursts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("r"))
    val dayTot = daily.groupBy($"day").agg(sum($"r").as("d"))
    val types = daily.select($"event_type").distinct()
    val grid = dayTot.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .select($"event_type", $"day", coalesce($"r", lit(0L)).as("r"), $"d")
    val perType = grid.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"r", $"d"))).as("series"),
        sum($"r").as("rtot"), sum($"d").as("dtot"))
      .withColumn("p0", $"rtot".cast("double") / $"dtot".cast("double"))
      .withColumn("p1", least($"p0" * lit(3.0), lit(0.99)))
      .withColumn("lnp0", log($"p0")).withColumn("ln1p0", log(lit(1.0) - $"p0"))
      .withColumn("lnp1", log($"p1")).withColumn("ln1p1", log(lit(1.0) - $"p1"))
      .withColumn("tlen", size($"series"))
      .withColumn("tau", log($"tlen".cast("double")))
    def cost(e: Column, lnp: Column, ln1p: Column): Column =
      -(e("r").cast("double") * lnp + (e("d") - e("r")).cast("double") * ln1p)
    val e1 = element_at(col("series"), 1)
    val fwd = aggregate(
      when($"tlen" >= 2, slice($"series", lit(2), $"tlen" - 1))
        .otherwise(expr("array()")
          .cast("array<struct<day:timestamp,r:bigint,d:bigint>>")),
      struct(
        cost(e1, $"lnp0", $"ln1p0").as("c0"),
        ($"tau" + cost(e1, $"lnp1", $"ln1p1")).as("c1"),
        array(struct(lit(true).as("s0"), lit(true).as("s1"))).as("ch")),
      (acc, e) => struct(
        (least(acc("c0"), acc("c1")) + cost(e, $"lnp0", $"ln1p0")).as("c0"),
        (least(acc("c0") + $"tau", acc("c1")) + cost(e, $"lnp1", $"ln1p1")).as("c1"),
        concat(acc("ch"), array(struct(
          (acc("c0") <= acc("c1")).as("s0"),
          (acc("c1") <= acc("c0") + $"tau").as("s1")))).as("ch")))
    val withFwd = perType.withColumn("fw", fwd)
      .withColumn("finalState",
        when($"fw.c1" < $"fw.c0", lit(1)).otherwise(lit(0)))
    // backtrack: statesRev = [s_T, s_{T-1}, …, s_1]; s_{t-1} follows the
    // predecessor flag recorded at step t for the state chosen at t
    val statesRev = aggregate(
      when($"tlen" >= 2, reverse(sequence(lit(2), $"tlen")))
        .otherwise(expr("array()").cast("array<int>")),
      array($"finalState"),
      (acc, t) => concat(acc, array(
        when(element_at(acc, -1) === 0,
          when(element_at($"fw.ch", t)("s0"), lit(0)).otherwise(lit(1)))
          .otherwise(
            when(element_at($"fw.ch", t)("s1"), lit(1)).otherwise(lit(0))))))
    withFwd
      .withColumn("states", reverse(statesRev))
      .select($"event_type", round($"p0", 6).as("p0"), $"series", $"states")
      .select($"event_type", $"p0",
        posexplode($"series").as(Seq("pos", "e")), $"states")
      .select($"event_type", $"e.day".as("day"), $"e.r".as("n"), $"e.d".as("d"),
        element_at($"states", $"pos" + 1).as("state"), $"p0")
      .orderBy($"event_type", $"day")
  }

  /** Holt's linear trend method (double exponential smoothing, Holt 1957)
    * over daily per-type counts — the forecasting step a trend dashboard
    * puts next to the smoothed line: level l_t = α·x_t + (1−α)(l_{t−1} +
    * b_{t−1}), trend b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1} with α=0.3,
    * β=0.1, seeds l₁ = x₁, b₁ = 0; the one-step-ahead forecast f_t =
    * l_{t−1} + b_{t−1} (NULL at t=1) and its absolute error audit the fit
    * in-band. Same determinism/scale doctrine as the EWMA: one corpus
    * aggregate, calendar-bounded left-to-right folds, recursive-CTE oracle
    * replaying the identical double recurrences. */
  def holtTrend(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = daily
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"n"))).as("series"))
      .withColumn("ns", transform($"series", e => e("n").cast("double")))
    val init = struct(
      element_at($"ns", 1).as("l"), lit(0.0).as("b"),
      array(struct(element_at($"ns", 1).as("l"), lit(0.0).as("b"),
        lit(null).cast("double").as("f"))).as("hist"))
    val fold = aggregate(
      when(size($"ns") >= 2, slice($"ns", lit(2), size($"ns") - 1))
        .otherwise(expr("array()").cast("array<double>")),
      init,
      (acc, x) => {
        val f = acc("l") + acc("b")
        val l2 = lit(0.3) * x + lit(0.7) * (acc("l") + acc("b"))
        val b2 = lit(0.1) * (l2 - acc("l")) + lit(0.9) * acc("b")
        struct(l2.as("l"), b2.as("b"),
          concat(acc("hist"), array(struct(l2.as("l"), b2.as("b"), f.as("f")))).as("hist"))
      })
    base
      .withColumn("hist", fold("hist"))
      .select($"event_type", posexplode($"series").as(Seq("pos", "e")), $"hist")
      .select($"event_type", $"e.day".as("day"), $"e.n".as("n"),
        round(element_at($"hist", $"pos" + 1)("l"), 6).as("level"),
        round(element_at($"hist", $"pos" + 1)("b"), 6).as("trend"),
        round(element_at($"hist", $"pos" + 1)("f"), 6).as("forecast"),
        round(abs($"e.n".cast("double") - element_at($"hist", $"pos" + 1)("f")), 6)
          .as("abs_err"))
      .orderBy($"event_type", $"day")
  }

  /** Holt–Winters additive seasonal smoothing (Winters 1960 — the
    * triple-exponential member of the Holt family) over daily per-type
    * counts with a weekly period m=7: the forecaster to reach for once
    * day-of-week cycles dominate the series, where [[holtTrend]] would
    * book every Saturday dip as a trend change. Seeds (after the first
    * full week): l₇ = (Σ_{t≤7} x_t)/7 (exact integer sum), b₇ = 0,
    * s_t = x_t − l₇ for t = 1..7. For t ≥ 8:
    *   f_t = l_{t−1} + b_{t−1} + s_{t−7}
    *   l_t = α(x_t − s_{t−7}) + (1−α)(l_{t−1} + b_{t−1})   α = 0.3
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}               β = 0.1
    *   s_t = γ(x_t − (l_{t−1} + b_{t−1})) + (1−γ)s_{t−7}   γ = 0.2
    * (the "seasonal vs previous smoothed" NIST/Hyndman variant with the
    * seasonal innovation measured against the one-step prediction base).
    * Series shorter than m+1 = 8 days emit NULL smoothed columns — the
    * degenerate-series doctrine, never a misfit on a partial week.
    *
    * Scale posture: the Holt doctrine verbatim — one corpus-sized daily
    * count aggregate, then calendar-bounded per-type left-to-right folds
    * whose state is (l, b, the 7-slot rotating seasonal buffer); the DP
    * cost is independent of row count. Determinism: every recurrence is
    * one fixed double expression shared operation-for-operation with the
    * DuckDB oracle's recursive CTE (which carries the same 7-slot list),
    * seeds derive from exact integer sums, rounding only at output. */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = 7
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = daily.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"n"))).as("series"))
      .withColumn("ns", transform($"series", e => e("n").cast("double")))
      .withColumn("tlen", size($"ns"))
    val seeded = base
      .withColumn("l0",
        aggregate(slice($"ns", 1, m), lit(0.0), (a, x) => a + x) / lit(7.0))
      .withColumn("seeds", transform(slice($"ns", 1, m), x => x - $"l0"))
    val init = struct($"l0".as("l"), lit(0.0).as("b"), $"seeds".as("s"),
      expr("array()")
        .cast("array<struct<l:double,b:double,s:double,f:double>>").as("hist"))
    val fold = aggregate(
      when($"tlen" >= m + 1, slice($"ns", lit(m + 1), $"tlen" - m))
        .otherwise(expr("array()").cast("array<double>")),
      init,
      (acc, x) => {
        val sOld = element_at(acc("s"), 1)
        val f = acc("l") + acc("b") + sOld
        val l2 = lit(0.3) * (x - sOld) + lit(0.7) * (acc("l") + acc("b"))
        val b2 = lit(0.1) * (l2 - acc("l")) + lit(0.9) * acc("b")
        val s2 = lit(0.2) * (x - (acc("l") + acc("b"))) + lit(0.8) * sOld
        struct(l2.as("l"), b2.as("b"),
          concat(slice(acc("s"), 2, m - 1), array(s2)).as("s"),
          concat(acc("hist"),
            array(struct(l2.as("l"), b2.as("b"), s2.as("s"), f.as("f"))))
            .as("hist"))
      })
    val fitted = $"tlen" >= m + 1
    val h = (t: Column) => element_at($"hist", t - m)
    seeded
      .withColumn("hist", fold("hist"))
      .select($"event_type", $"tlen", $"seeds",
        posexplode($"series").as(Seq("pos", "e")), $"hist")
      .withColumn("t", $"pos" + 1)
      .select($"event_type", $"e.day".as("day"), $"e.n".as("n"),
        when(fitted && $"t" > m, round(h($"t")("l"), 6)).as("level"),
        when(fitted && $"t" > m, round(h($"t")("b"), 6)).as("trend"),
        when(fitted,
          when($"t" <= m, round(element_at($"seeds", $"t"), 6))
            .otherwise(round(h($"t")("s"), 6))).as("season"),
        when(fitted && $"t" > m, round(h($"t")("f"), 6)).as("forecast"),
        when(fitted && $"t" > m,
          round(abs($"e.n".cast("double") - h($"t")("f")), 6)).as("abs_err"))
      .orderBy($"event_type", $"day")
  }

  /** Rank movers — the "what moved this week" trending table: each
    * props-key `k` is counted over the first 15 days vs the rest of the
    * window (the split anchored at the dataset's min day, not the calendar
    * month, so it is tier-independent), ranked within each period
    * (count desc, k asc — fully deterministic), and the top-20 movers by
    * absolute rank shift are emitted. Scale posture: one corpus-sized
    * aggregate onto |keys| rows; the ranking windows and the top-k run on
    * that vocabulary-bounded frame. */
  def rankMovers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(get_json_object($"props", "$.k").cast("long").as("k"), $"ts")
    val minDay = ev.agg(min(date_trunc("day", $"ts")).as("d0"))
    val dd = datediff(date_trunc("day", $"ts"), $"d0")
    val counted = ev.crossJoin(broadcast(minDay))
      .groupBy($"k")
      .agg(sum(when(dd < 15, 1L).otherwise(0L)).as("c1"),
        sum(when(dd >= 15, 1L).otherwise(0L)).as("c2"))
    counted
      .select($"k", $"c1", $"c2",
        row_number().over(Window.orderBy($"c1".desc, $"k")).as("rank1"),
        row_number().over(Window.orderBy($"c2".desc, $"k")).as("rank2"))
      .withColumn("delta", $"rank1" - $"rank2")
      .orderBy(abs($"delta").desc, $"k")
      .limit(20)
  }

  /** CUSUM changepoint detection (Page 1954) over daily per-type counts —
    * the sequential level-shift detector that catches slow drifts the
    * z-score burst test misses (it accumulates small deviations instead of
    * thresholding each bucket). Baseline μ/σ are the sample mean/std of
    * the type's FIRST 7 days (exact integer sums → one shared double
    * expression); slack κ = σ/2, alarm threshold h = 5σ;
    * S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − κ)),
    * S⁻_t = max(0, S⁻_{t−1} + (μ − κ − x_t)). A zero-variance baseline
    * (σ = 0) yields NULL statistics, never a division artifact — the same
    * degenerate-source doctrine as zipfProfile.
    *
    * Scale posture: identical to the EWMA — one corpus-sized daily count
    * aggregate, then calendar-bounded per-type HOF folds. The DuckDB
    * oracle replays the recursion in a recursive CTE. */
  def cusumChange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val base = daily
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"n"))).as("series"))
      .withColumn("ns", transform($"series", e => e("n").cast("double")))
      .withColumn("b", slice($"ns", 1, 7))
      .withColumn("bn", size($"b").cast("double"))
      // exact integer baseline sums (the doubles derive from these alone)
      .withColumn("bs", aggregate(slice(transform($"series", e => e("n")), 1, 7),
        lit(0L), (a, x) => a + x).cast("double"))
      .withColumn("bss", aggregate(slice(transform($"series", e => e("n")), 1, 7),
        lit(0L), (a, x) => a + x * x).cast("double"))
      .withColumn("mu", $"bs" / $"bn")
      .withColumn("sigma", sqrt(($"bss" - $"bs" * $"bs" / $"bn") / ($"bn" - lit(1.0))))
      .withColumn("kappa", $"sigma" / lit(2.0))
      .withColumn("h", lit(5.0) * $"sigma")
    val init = struct(
      greatest(lit(0.0), element_at($"ns", 1) - $"mu" - $"kappa").as("sp"),
      greatest(lit(0.0), $"mu" - $"kappa" - element_at($"ns", 1)).as("sn"),
      array(struct(
        greatest(lit(0.0), element_at($"ns", 1) - $"mu" - $"kappa").as("sp"),
        greatest(lit(0.0), $"mu" - $"kappa" - element_at($"ns", 1)).as("sn"))).as("hist"))
    val fold = aggregate(
      when(size($"ns") >= 2, slice($"ns", lit(2), size($"ns") - 1))
        .otherwise(expr("array()").cast("array<double>")),
      init,
      (acc, x) => struct(
        greatest(lit(0.0), acc("sp") + (x - $"mu" - $"kappa")).as("sp"),
        greatest(lit(0.0), acc("sn") + ($"mu" - $"kappa" - x)).as("sn"),
        concat(acc("hist"), array(struct(
          greatest(lit(0.0), acc("sp") + (x - $"mu" - $"kappa")).as("sp"),
          greatest(lit(0.0), acc("sn") + ($"mu" - $"kappa" - x)).as("sn")))).as("hist")))
    base
      .withColumn("hist", fold("hist"))
      .select($"event_type", round($"mu", 6).as("mu"), round($"sigma", 6).as("sigma"),
        $"sigma".as("sigma_raw"), $"h", $"series", $"hist")
      .select($"event_type", $"mu", $"sigma", $"sigma_raw", $"h",
        posexplode($"series").as(Seq("pos", "e")), $"hist")
      .select($"event_type", $"e.day".as("day"), $"e.n".as("n"), $"mu", $"sigma",
        when($"sigma_raw" > 0.0,
          round(element_at($"hist", $"pos" + 1)("sp"), 6)).as("cusum_pos"),
        when($"sigma_raw" > 0.0,
          round(element_at($"hist", $"pos" + 1)("sn"), 6)).as("cusum_neg"),
        when($"sigma_raw" > 0.0,
          element_at($"hist", $"pos" + 1)("sp") > $"h" ||
            element_at($"hist", $"pos" + 1)("sn") > $"h").as("alarm"))
      .orderBy($"event_type", $"day")
  }

  /** EWMA trend smoothing (α = 0.3) over daily per-type counts — the
    * classic "smoothed trend line + direction" panel. ewma_1 = n_1,
    * ewma_t = 0.7·ewma_{t−1} + 0.3·n_t, computed by a left-to-right HOF
    * fold over each type's day-ordered count array so the float operation
    * sequence is fixed — the DuckDB oracle replays the identical recurrence
    * in a recursive CTE and the doubles agree bit-for-bit (both sides cast
    * the coefficients to DOUBLE; DuckDB would otherwise read 0.7 as
    * DECIMAL).
    *
    * Scale posture: the only corpus-sized work is the daily count aggregate
    * (one shuffle, map-side combine); the fold runs over |types| arrays of
    * calendar length — a per-type O(days²) driver-free HOF that is
    * vocabulary-sized, never data-sized. */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"day", $"n"))).as("series"))
      .select($"event_type", $"series", posexplode($"series").as(Seq("pos", "e")))
      .select($"event_type", $"e.day".as("day"), $"e.n".as("n"),
        round(aggregate(
          slice(transform($"series", x => x("n").cast("double")), lit(2), $"pos"),
          element_at($"series", 1)("n").cast("double"),
          (acc, x) => acc * lit(0.7) + lit(0.3) * x), 6).as("ewma"))
      .orderBy($"event_type", $"day")
  }
}
