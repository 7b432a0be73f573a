package graft

import graft.queries.CorpusQueries

/** Pins the suffix-adjacency exact-substring span detector on a corpus
  * with PLANTED duplicates of known extent — the property the fixed-gram
  * detector cannot express: the reported span is the exact maximal
  * repeated region, whatever its length. */
class SuffixSpansSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  /** Write a throwaway documents.parquet tier with the given texts. */
  private def tier(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sufx").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synth", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a planted 12-token verbatim quote reports its exact extent " +
    "(variable length, not gram-clipped)") {
    val quote = words("q", 12) // 12 unique tokens, repeated verbatim
    val d0 = words("a", 5) + " " + quote + " " + words("b", 5)
    val d1 = words("c", 7) + " " + quote + " " + words("d", 3)
    val dir = tier(Seq(d0, d1))
    val got = CorpusQueries.suffixSpans(sql, dir)
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 0: quote occupies tokens 6..17; doc 1: tokens 8..19
    assert(got == Set((0L, 6L, 17L, 12L), (1L, 8L, 19L, 12L)),
      s"expected the exact 12-token extents, got $got")
  }

  test("a repeat shorter than SuffixMinL is invisible; exactly L fires") {
    val shortQ = words("s", CorpusQueries.SuffixMinL - 1)
    val exactQ = words("e", CorpusQueries.SuffixMinL)
    val filler1 = words("x", 4)
    val filler2 = words("y", 4)
    val dir = tier(Seq(
      s"$filler1 $shortQ $exactQ",
      s"$filler2 $shortQ $exactQ"))
    val got = CorpusQueries.suffixSpans(sql, dir)
      .select($"doc_id", $"span_tokens").as[(Long, Long)].collect()
    // the shortQ (7 tokens) alone cannot fire, but shortQ+exactQ are
    // adjacent in both docs => the maximal repeated region is the full
    // 15-token run, proving sub-L material is still claimed when it is
    // part of a longer exact repeat
    val L = CorpusQueries.SuffixMinL.toLong
    assert(got.toSet == Set((0L, 2 * L - 1), (1L, 2 * L - 1)),
      s"expected both docs to span the full ${2 * L - 1}-token repeat: " +
        got.mkString(", "))
  }

  test("a duplicated run LONGER than the W cap still reports full extent " +
    "(islands extend past per-pair LCP)") {
    val longQ = words("z", CorpusQueries.SuffixCapW + 10) // 40 tokens > W=30
    val dir = tier(Seq(
      words("a", 3) + " " + longQ,
      words("b", 3) + " " + longQ))
    val got = CorpusQueries.suffixSpans(sql, dir)
      .select($"doc_id", $"span_start", $"span_end").as[(Long, Long, Long)]
      .collect().toSet
    val n = CorpusQueries.SuffixCapW + 10L
    assert(got == Set((0L, 4L, 3L + n), (1L, 4L, 3L + n)),
      s"W-capped LCPs must still coalesce to the full $n-token run: $got")
  }

  test("within-document repetition is caught (Lee et al. dedup any " +
    "repeated substring, not only cross-doc)") {
    val rep = words("r", 10)
    val dir = tier(Seq(
      rep + " " + words("m", 6) + " " + rep,
      words("u", 20))) // second doc: no repeats
    val got = CorpusQueries.suffixSpans(sql, dir)
      .select($"doc_id", $"span_start", $"span_end").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((0L, 1L, 10L), (0L, 17L, 26L)),
      s"both occurrences inside doc 0 must surface as spans: $got")
  }

  test("suffixScrub: n_tokens = n_removed + n_kept on real testdata, and " +
    "a verbatim-duplicated doc pair scrubs to its non-repeated fringe") {
    val rows = CorpusQueries.suffixScrub(sql, sf)
      .select($"doc_id", $"n_tokens", $"n_removed", $"n_kept")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, t, r, k) =>
      assert(t == r + k, s"doc $id: $t != $r + $k")
    }
    assert(rows.exists(_._3 > 0), "testdata must contain scrubbed docs")
    // planted pair: two identical 20-token docs => everything is repeated,
    // nothing survives the cut
    val twin = words("t", 20)
    val dir = tier(Seq(twin, twin))
    val got = CorpusQueries.suffixScrub(sql, dir)
      .select($"doc_id", $"n_removed", $"n_kept", $"cleaned_fp")
      .as[(Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(got.map(g => (g._2, g._3)) == Seq((20L, 0L), (20L, 0L)),
      s"verbatim twins must scrub fully: $got")
    // md5 of the empty string — the fingerprint of a fully-cut doc
    assert(got.forall(_._4 == "d41d8cd98f00b204e9800998ecf8427e"))
  }

  test("suffixScrub cuts exactly the planted duplicate, keeping unique " +
    "material (no gram-granularity fringe)") {
    val quote = words("q", 12)
    val d0 = words("a", 5) + " " + quote + " " + words("b", 5)
    val d1 = words("c", 7) + " " + quote + " " + words("d", 3)
    val dir = tier(Seq(d0, d1))
    val got = CorpusQueries.suffixScrub(sql, dir)
      .select($"doc_id", $"n_tokens", $"n_removed", $"n_kept")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 22L, 12L, 10L), (1L, 22L, 12L, 10L)),
      s"exactly the 12 quoted tokens must go: $got")
  }

  test("hot-prefix skew route (range sort + boundary stitch) is " +
    "bit-identical to the hash-grouped cold route") {
    // 120 docs all carrying the SAME 16-token boilerplate — one prefix
    // group holding every suffix position of the repeat, exactly the
    // straggler shape ADVICE r12 flags. hotBudget=1 forces the whole
    // group through the range route, and with 4 shuffle partitions the
    // group spans several range partitions, so the first-row stitch is
    // genuinely exercised (dropping it loses boundary adjacency pairs).
    val boiler = words("hot", 16)
    val texts = (0 until 120).map(i => words(s"u${i}x", 4) + " " + boiler)
    val dir = tier(texts)
    def spans(budget: Long) =
      CorpusQueries.suffixSpanFramesUncached(sql, dir, hotBudget = budget)
        .select($"doc_id", $"span_start", $"span_end", $"span_tokens",
          $"n_positions")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val cold = spans(Long.MaxValue) // nothing over budget: r12 plan
    val hot = spans(1L)             // every multi-row prefix goes hot
    assert(cold.nonEmpty && cold == hot,
      s"routes diverge: cold-only=${cold -- hot} hot-only=${hot -- cold}")
    // every doc must report exactly the 16-token boilerplate extent;
    // covered suffix starts are positions 5..13 (>= L tokens remaining)
    assert(cold == (0 until 120).map(i => (i.toLong, 5L, 20L, 16L, 9L)).toSet,
      s"expected the planted 16-token extent in all 120 docs: $cold")
  }

  test("mixed corpus routes hot and cold prefixes independently and " +
    "still matches the single-route answer") {
    // one hot boilerplate (40 copies) + a distinct cross-doc quote pair:
    // the quote's prefix group (2 rows) stays cold at budget=10 while the
    // boilerplate (40+ rows/prefix) goes hot — both must surface.
    val boiler = words("bp", 12)
    val quote = words("qq", 10)
    val texts = (0 until 40).map(i => words(s"f${i}z", 3) + " " + boiler) ++
      Seq(words("g", 4) + " " + quote, words("h", 6) + " " + quote)
    val dir = tier(texts)
    def spans(budget: Long) =
      CorpusQueries.suffixSpanFramesUncached(sql, dir, hotBudget = budget)
        .select($"doc_id", $"span_start", $"span_end")
        .as[(Long, Long, Long)].collect().toSet
    val mixed = spans(10L)
    assert(mixed == spans(Long.MaxValue),
      "mixed hot/cold routing must not change the span set")
    assert(mixed.contains((40L, 5L, 14L)) && mixed.contains((41L, 7L, 16L)),
      s"the cold-routed quote pair must still surface: $mixed")
  }

  test("a NUL inside a token fails loudly instead of corrupting the " +
    "suffix sort keys") {
    val bad = words("n", 6) + " evil" + "\u0000" + "token " + words("p", 6)
    val dir = tier(Seq(bad, words("ok", 20)))
    val e = intercept[Exception] {
      CorpusQueries.suffixSpanFramesUncached(sql, dir).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("U+0000")),
      s"expected the NUL guard to fire, got: ${msgs(e).mkString(" | ")}")
  }

  test("spans within a document are pairwise disjoint and non-adjacent " +
    "on real testdata") {
    val rows = CorpusQueries.suffixSpans(sql, sf)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1 + 1, s"overlapping/adjacent spans: $sorted")
        case _ =>
      }
    }
    assert(rows.nonEmpty, "testdata must contain exact repeats")
  }
}
