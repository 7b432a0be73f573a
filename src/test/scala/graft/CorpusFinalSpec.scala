package graft

import graft.queries.{PipelineQueries, SimilarityQueries}
import org.apache.spark.sql.functions._

/** End-to-end curation funnel: monotone-gate laws and cross-parity with the
  * operators it composes. Value parity is the DuckDB oracle.
  */
class CorpusFinalSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("corpusFinal: gates shrink monotonically and totals cross-check the " +
    "composed operators") {
    val rows = PipelineQueries.corpusFinal(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, g1, g2, g3) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd >= g1 && g1 >= g2 && g2 >= g3, s"${r.getString(0)}: funnel not monotone")
      assert(g3 > 0 || r.getLong(5) == 0)
    }
    // totals: docs == documents count; after_dedup == dedupCorpus survivors
    val totalDocs = rows.map(_.getLong(1)).sum
    val totalDedup = rows.map(_.getLong(2)).sum
    assert(totalDocs ==
      graft.sources.Tables.documents(spark, sf).count())
    assert(totalDedup == SimilarityQueries.dedupCorpus(spark, sf).count())
    // final tokens equal the direct recount over the surviving doc set
    val keep = PipelineQueries.qualityLr(spark, sf).filter($"keep")
      .select($"doc_id")
    val survivors = SimilarityQueries.dedupCorpus(spark, sf).select($"doc_id")
    val want = graft.sources.Tables.documents(spark, sf)
      .join(survivors, "doc_id").join(keep, "doc_id")
      .filter($"lang" === "en")
      .agg(sum(size(graft.functions.Text.tokenize($"text")).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(5)).sum == want)
  }
}
