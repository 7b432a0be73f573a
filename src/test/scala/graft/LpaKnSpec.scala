package graft

import graft.queries.{CorpusQueries, GraphQueries}
import org.apache.spark.sql.functions._

/** Round-9 additions: weighted label-propagation communities and the
  * Kneser–Ney bigram scorer. Value parity is the DuckDB oracle; these pin
  * the semantics on constructed inputs an oracle over the shipped tables
  * can't phrase.
  */
class LpaKnSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("labelPropOf: two cliques with a weak bridge resolve to two " +
    "communities labeled by their smallest member") {
    // cliques {0,1,2} and {10,11,12} at weight 10, bridge 2-10 at weight 1
    val cl = for {
      base <- Seq(0L, 10L); a <- 0 to 2; b <- (a + 1) to 2
    } yield (base + a, base + b, 10L)
    val e = (cl :+ ((2L, 10L, 1L))).toDF("src", "dst", "w")
    val nodes = (Seq(0L, 1L, 2L) ++ Seq(10L, 11L, 12L)).toDF("node")
    val got = GraphQueries.labelPropOf(e, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), s"got $got")
  }

  test("labelPropOf: tie on vote weight breaks to the smallest label") {
    // node 5 bridges two label-anchoring triangles {1,3,4} and {2,6,7}
    // (bare leaf pairs would oscillate under synchronous updates — the
    // triangles stabilize to their min label by round 2); 5's equal-weight
    // view of labels 1 and 2 must resolve to 1
    val tri = Seq((1L, 3L, 10L), (1L, 4L, 10L), (3L, 4L, 10L),
      (2L, 6L, 10L), (2L, 7L, 10L), (6L, 7L, 10L))
    val e = (tri ++ Seq((1L, 5L, 3L), (2L, 5L, 3L))).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("node")
    val got = GraphQueries.labelPropOf(e, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 1L, s"got $got")
    assert(Seq(1L, 3L, 4L).forall(got(_) == 1L) &&
      Seq(2L, 6L, 7L).forall(got(_) == 2L), s"got $got")
  }

  test("labelProp: every nation gets a community; community ids are " +
    "themselves nation keys") {
    val rows = GraphQueries.labelProp(spark, sf).collect()
    assert(rows.length == 25)
    val keys = rows.map(_.getInt(0)).toSet
    rows.foreach(r => assert(keys.contains(r.getInt(2))))
  }

  test("knBigram: driver-side Kneser-Ney replay on a constructed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-kn")
    try {
      val texts = Seq("a b a b c", "b c d", "a c")
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // independent replay: exact integer statistics, same formula
      val bigrams = texts.map(_.split(" ").toSeq.sliding(2).map(p => (p(0), p(1))).toSeq)
      val all = bigrams.flatten
      val cb = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val h1 = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nh = cb.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nc = cb.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val bt = cb.size.toDouble
      val d = CorpusQueries.KnDiscount
      def p(w1: String, w2: String): Double =
        (math.max(cb((w1, w2)) - d, 0.0) + d * nh(w1) * nc(w2) / bt) / h1(w1)
      val want = bigrams.zipWithIndex.map { case (bs, i) =>
        val nll = bs.map { case (w1, w2) =>
          BigDecimal(-math.log(p(w1, w2)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        val nm = (nll * 1000000).toLong
        val xm = (2 * nm + bs.size) / (2 * bs.size)
        i.toLong -> (bs.size.toLong, xm / 1e6)
      }.toMap
      val got = CorpusQueries.knBigram(spark, dir.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == want, s"got $got want $want")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("knBigram: probabilities are a proper distribution per history — " +
    "xent strictly positive, n_bigrams == tokens-1") {
    val rows = CorpusQueries.knBigram(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf)
        .select($"doc_id",
          size(graft.functions.Text.tokenize($"text")).as("nt")), "doc_id")
    assert(rows.filter($"n_bigrams".isNotNull &&
      $"n_bigrams" =!= greatest($"nt" - 1, lit(0))).count() == 0)
    assert(rows.filter($"xent".isNotNull && $"xent" <= 0.0).count() == 0)
  }
}
