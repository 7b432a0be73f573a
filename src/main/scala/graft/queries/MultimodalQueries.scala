package graft.queries

import graft.functions.{Multimodal, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payloads + typed metadata through the
  * partition-batched decode/feature stubs (see Multimodal.scala STUB
  * NOTICE). The decode arithmetic is deliberately SQL-expressible so the
  * whole pipeline — binary cast, mapPartitions decode, re-aggregation — is
  * verified against the DuckDB oracle, not just smoke-tested. */
object MultimodalQueries {

  /** Decode metadata per payload, then profile per media_type: row counts,
    * total bytes, average decoded dimensions. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    Multimodal.decodeAll(media).toDF()
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        round(avg(col("width")), 6).as("avg_width"),
        round(avg(col("height")), 6).as("avg_height"),
        round(avg(col("channels")), 6).as("avg_channels"))
      .orderBy(col("media_type"))
  }

  /** Frame-sampling profile per payload (n = 4 frames): frame count and
    * frame byte length — the video-path plumbing registered end-to-end
    * (stub arithmetic, real mapPartitions batch shape). */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    Multimodal.framesAll(media, 4).toDF()
      .orderBy(col("doc_id"))
  }

  /** Per-payload stub features joined back to metadata; emits the feature
    * L2 norm (exercises the array<double> feature path end-to-end). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    Multimodal.featuresAll(media).toDF()
      .select(col("doc_id"),
        round(Similarity.l2norm(col("feature")), 6).as("feature_norm"))
      .orderBy(col("doc_id"))
  }
}
