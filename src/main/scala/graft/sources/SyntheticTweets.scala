package graft.sources

/** Deterministic port of the reference's synthetic tweet producer
  * (fake_producer.py:54-102): a seeded RNG replaces Faker/`random`, so the
  * one property the reference leaves implicit but pins in its console output
  * — the 20–50% keyword-injection-rate contract (fake_producer.py:68-79) —
  * becomes assertable in tests (SyntheticTweetsSpec).
  *
  * Enrichment parity: the reference producers attach sentiment (VADER) and
  * entities (spaCy NER → PERSON/ORG) at the source (fake_producer.py:43-51);
  * here sentiment is a deterministic stand-in draw and entities use the
  * engine's capitalized-token extraction contract (Text.extractEntities), so
  * generated messages exercise the same downstream schema
  * (text, created_at, sentiment, entities) end-to-end.
  */
object SyntheticTweets {

  case class Tweet(text: String, created_at: String, sentiment: String,
                   entities: Seq[String])

  /** The sports keywords the reference injects (fake_producer.py:24). */
  val Keywords: Seq[String] = Seq("LeBron", "GOAT", "cooked", "mid", "Lakers",
    "Wemby", "Messi", "football", "Cricket", "Basketball")

  /** Filler vocabulary for sentences — deliberately DISJOINT from
    * [[Keywords]] so a keyword token appears in a message iff it was
    * injected (the property the injection-rate test counts). */
  private val Vocab = Vector("alpha", "bravo", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "yankee", "zulu")

  private val Sentiments = Vector("Positive", "Negative", "Neutral")

  /** Faker-style sentence: n words, first capitalized, trailing period. */
  private def sentence(rnd: scala.util.Random, nbWords: Int): String = {
    val ws = Array.fill(nbWords)(Vocab(rnd.nextInt(Vocab.size)))
    ws(0) = ws(0).capitalize
    ws.mkString(" ") + "."
  }

  private val EntityRe = "^[A-Z][a-zA-Z]+$".r

  /** Same contract as Text.extractEntities: wholly-alphabetic capitalized
    * tokens (anchored match excludes punctuation-attached tokens). */
  def entitiesOf(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(t => t.nonEmpty && EntityRe.matches(t))

  private val EpochBase = java.time.Instant.parse("2024-01-01T00:00:00Z")

  /** Generate `total` tweets with the reference's injection policy:
    * target ~ uniform[0.2·total, 0.5·total] keyword tweets; each message
    * injects (sentence + keyword + sentence) with p = 0.5 until the target
    * is met, else a plain 8–15 word sentence (fake_producer.py:54-79). */
  def generate(seed: Long, total: Int = 1000): Seq[Tweet] = {
    val rnd = new scala.util.Random(seed)
    val minK = (0.2 * total).toInt
    val maxK = (0.5 * total).toInt
    val target = minK + rnd.nextInt(maxK - minK + 1) // randint is inclusive
    var keywordCount = 0
    var sent = 0
    val out = Vector.newBuilder[Tweet]
    while (sent < total) {
      val include = keywordCount < target && rnd.nextDouble() < 0.5
      val text =
        if (include)
          s"${sentence(rnd, 6)} ${Keywords(rnd.nextInt(Keywords.size))} ${sentence(rnd, 6)}"
        else sentence(rnd, 8 + rnd.nextInt(8)) // nb_words ∈ [8, 15]
      val createdAt =
        EpochBase.plusSeconds(rnd.nextInt(30 * 24 * 3600).toLong).toString
      out += Tweet(text, createdAt, Sentiments(rnd.nextInt(Sentiments.size)),
        entitiesOf(text))
      sent += 1
      if (include) keywordCount += 1
    }
    out.result()
  }
}
