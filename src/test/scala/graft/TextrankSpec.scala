package graft

import graft.queries.{GraphQueries, TextQueries}

/** TextRank keyword extraction (round 12). The DuckDB oracle pins exact
  * values at every tier; this spec re-derives the whole computation
  * driver-side on the small tier — co-occurrence pairs, symmetric weighted
  * edges, out-weight fractions, the quantized-contribution iteration — and
  * demands the identical top list, so the operator can't drift from the
  * published algorithm while keeping a plausible-looking output.
  */
class TextrankSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def twin(): Seq[(String, Double)] = {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val pairs = docs.flatMap { case (_, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      for {
        i <- t.indices
        off <- 1 to TextQueries.TrWindow
        if i + off < t.length && t(i) != t(i + off)
      } yield (t(i), t(i + off))
    }
    val edges = (pairs ++ pairs.map(_.swap))
      .groupBy(identity).map { case ((s, d), xs) => (s, d, xs.length.toDouble) }
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val frac = edges.map { case (s, d, w) => (s, d, w / outw(s)) }
    val nodes = edges.map(_._1).toSeq.distinct
    var score = nodes.map(_ -> 1.0).toMap
    val dmp = GraphQueries.Damping
    for (_ <- 1 to TextQueries.TrIters) {
      val insum = frac.toSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, f) =>
          BigDecimal(score(s) * f)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }
      score = nodes.map(n =>
        n -> ((1.0 - dmp) + dmp * insum.getOrElse(n, 0.0))).toMap
    }
    score.toSeq.sortBy { case (w, s) => (-s, w) }.take(TextQueries.TrTop)
  }

  test("textrank: the distributed result equals the driver-side twin — " +
    "same words, same scores, same order") {
    val got = TextQueries.textrank(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = twin()
    assert(got.map(_._1) == want.map(_._1),
      s"word list drift:\n got ${got.map(_._1)}\nwant ${want.map(_._1)}")
    got.zip(want).foreach { case ((w, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9, s"$w: $gs vs twin $ws")
    }
  }

  test("textrank: every score >= the teleport floor and the list is " +
    "capped, distinct, score-ordered") {
    val rows = TextQueries.textrank(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.length <= TextQueries.TrTop)
    assert(rows.map(_._1).distinct.length == rows.length)
    rows.foreach { case (_, s) =>
      assert(s >= (1.0 - GraphQueries.Damping) - 1e-9)
    }
    rows.sliding(2).foreach {
      case Array((wa, sa), (wb, sb)) =>
        assert(sa > sb || (sa == sb && wa < wb))
      case _ => ()
    }
  }
}
