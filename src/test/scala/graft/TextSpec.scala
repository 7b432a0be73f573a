package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("tokenize splits on whitespace runs, trims ends") {
    val toks = Seq("  hello   world\tfoo\n").toDF("t")
      .select(Text.tokenize($"t").as("toks")).head().getSeq[String](0)
    assert(toks == Seq("hello", "world", "foo"))
  }

  test("tokenCount and tokenSet") {
    val r = Seq("a b a c b a").toDF("t")
      .select(Text.tokenCount($"t").as("n"), Text.tokenSet($"t").as("s")).head()
    assert(r.getInt(0) == 6)
    assert(r.getSeq[String](1) == Seq("a", "b", "c"))
  }

  test("normText + fingerprint are whitespace/case insensitive") {
    val fps = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("t")
      .select(Text.fingerprint($"t").as("fp")).collect().map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  test("stopwordRatio, punctRatio bounds") {
    val r = Seq("the quick brown fox, and the dog!").toDF("t")
      .select(Text.stopwordRatio($"t").as("sw"), Text.punctRatio($"t").as("p")).head()
    val sw = r.getDouble(0); val p = r.getDouble(1)
    assert(sw > 0.0 && sw < 1.0)   // "the" x2, "and" of 7 tokens
    assert(math.abs(sw - 3.0 / 7.0) < 1e-9)
    assert(p > 0.0 && p < 0.2)     // "," and "!"
  }

  test("extractEntities keeps capitalized tokens") {
    val es = Seq("say LeBron and Lakers beat phoenix").toDF("t")
      .select(Text.extractEntities($"t").as("e")).head().getSeq[String](0)
    assert(es == Seq("LeBron", "Lakers"))
  }

  test("rolling hash folds code points, null-propagates, matches manual fold") {
    assert(Text.rollingHashOf(null) == null)
    assert(Text.rollingHashOf("abc") == 96354L) // pinned vs DuckDB list_reduce
    // supplementary-plane char counts once (as its code point), not as two
    // UTF-16 surrogates — keeps parity with SQL character splitting
    val s = "a😀b" // a, U+1F600, b
    val expected = Seq(97, 0x1F600, 98)
      .foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    assert(Text.rollingHashOf(s) == expected)
  }

  test("winnowing fingerprints match the reference computation") {
    // pinned against the Python/DuckDB reference for this exact string
    val fps = Text.winnowOf("the quick brown fox jumps")
    assert(fps.length == 7)
    assert(fps.take(3).toSeq == Seq(32585304L, 32701777L, 32826446L))
    assert(fps.last == 102642205L)
    // guarantee: identical texts share all fingerprints; a shared substring
    // of length >= k+w-1 shares at least one
    val a = Text.winnowOf("xxxx shared-substring-here yyyy")
    val b = Text.winnowOf("zz shared-substring-here qqqq")
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    assert(Text.winnowOf("short").isEmpty)
    assert(Text.winnowOf(null).isEmpty)
  }

  test("langGuess picks marker-heavy language") {
    val r = Seq("the cat is on a mat and the dog", "el perro y la casa de que y")
      .toDF("t").select(Text.langGuess($"t").as("l")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "es"))
  }

  test("nfc normalization composes decomposed code points; null propagates") {
    val composed = "caf\u00e9"          // precomposed e-acute
    val decomposed = "cafe\u0301"       // e + combining acute
    assert(Text.nfcOf(decomposed) == composed)
    assert(Text.nfcOf(composed) == composed)
    assert(Text.nfcOf(null) == null)
    // via the Column surface: both forms fingerprint identically after nfc
    val sql2 = SparkSpec.spark
    import sql2.implicits._
    val fps = Seq(composed, decomposed).toDF("text")
      .select(Text.fingerprint(Text.nfc(col("text"))).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("null text propagates safely through the whole text surface") {
    val sql2 = SparkSpec.spark
    import sql2.implicits._
    val df = Seq[Option[String]](None, Some("a quick test"), Some(""))
      .toDF("text")
    val out = df.select(
      Text.tokenize(col("text")).as("toks"),
      Text.tokenCount(col("text")).as("n"),
      Text.fingerprint(col("text")).as("fp"),
      Text.rollingHash(col("text")).as("rh"),
      Text.winnow(col("text")).as("wf"),
      Text.langGuess(col("text")).as("lg"),
      Text.nfc(col("text")).as("nfc"),
      Text.qualityScore(col("text")).as("q"),
      Text.extractEntities(col("text")).as("ents"),
      Text.ngrams(col("text"), 2).as("bg")).collect()
    val nullRow = out(0)
    // null in -> null/empty out, never a throw
    assert(nullRow.isNullAt(nullRow.fieldIndex("toks")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("fp")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("rh")))
    assert(nullRow.getSeq[Long](nullRow.fieldIndex("wf")).isEmpty)
    assert(nullRow.getString(nullRow.fieldIndex("lg")) == "und")
    assert(nullRow.isNullAt(nullRow.fieldIndex("nfc")))
    assert(nullRow.getSeq[String](nullRow.fieldIndex("bg")).isEmpty)
    // empty string: zero counts, no tokens, defined score
    val emptyRow = out(2)
    assert(emptyRow.getInt(emptyRow.fieldIndex("n")) == 0)
    assert(!emptyRow.isNullAt(emptyRow.fieldIndex("q")))
  }

  test("winnowing guarantee: shared substring >= k+w-1 yields a shared fingerprint") {
    // Schleimer et al. guarantee, checked over seeded random docs
    val rnd = new scala.util.Random(4242)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 50).foreach { i =>
      val shared = randStr(8) // k + w - 1 = 5 + 4 - 1 = 8
      val a = randStr(rnd.nextInt(20)) + shared + randStr(rnd.nextInt(20))
      val b = randStr(rnd.nextInt(20)) + shared + randStr(rnd.nextInt(20))
      val common = Text.winnowOf(a).toSet intersect Text.winnowOf(b).toSet
      assert(common.nonEmpty, s"iteration $i: no shared fingerprint for '$shared'")
    }
  }
}
