package graft

import graft.functions.Text
import graft.sources.SyntheticTweets
import org.apache.spark.sql.functions._

/** The deterministic fake_producer port: injection-rate contract,
  * determinism, and entity parity with the engine's extractor. */
class ProducerSpec extends SparkSpec {
  private val sql = SparkSpec.spark
  import sql.implicits._

  test("same seed -> identical stream; different seed -> different stream") {
    val a = SyntheticTweets.generate(42L, 200)
    val b = SyntheticTweets.generate(42L, 200)
    val c = SyntheticTweets.generate(43L, 200)
    assert(a == b)
    assert(a != c)
    assert(a.length == 200)
  }

  test("keyword injection rate lands in the reference's 20-50% envelope") {
    val kw = SyntheticTweets.Keywords.toSet
    for (seed <- Seq(1L, 7L, 42L, 2024L)) {
      val tweets = SyntheticTweets.generate(seed, 1000)
      // vocab is disjoint from keywords, so containment == injection
      val injected = tweets.count(
        _.text.split("\\s+").exists(kw.contains))
      assert(injected >= 200 && injected <= 500,
        s"seed $seed: $injected injected, outside [200, 500]")
      // no message carries more than one injected keyword occurrence
      val multi = tweets.count(_.text.split("\\s+").count(kw.contains) > 1)
      assert(multi == 0)
    }
  }

  test("producer entities == engine extractEntities over the same text") {
    val tweets = SyntheticTweets.generate(7L, 100)
    val viaEngine = tweets.map(_.text).toDF("text")
      .select(Text.extractEntities(col("text")).as("e"))
      .collect().map(_.getSeq[String](0))
    tweets.map(_.entities).zip(viaEngine).zipWithIndex.foreach {
      case ((fromProducer, fromEngine), i) =>
        assert(fromProducer == fromEngine, s"tweet $i")
    }
    // injected capitalized keywords surface as entities
    val kw = Set("LeBron", "GOAT", "Lakers", "Wemby", "Messi", "Cricket", "Basketball")
    assert(tweets.exists(_.entities.exists(kw.contains)))
  }

  test("DSv2 tweet source: partitioned, deterministic, schema-correct") {
    def read(seed: Long, total: Int, parts: Int) =
      spark.read.format("graft.sources.TweetSourceProvider")
        .option("seed", seed).option("total", total)
        .option("partitions", parts).load()
    val df = read(42L, 1000, 4)
    assert(df.schema.fieldNames.toSeq ==
      Seq("text", "created_at", "sentiment", "entities"))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // deterministic: same options -> identical rows
    val a = df.collect().map(_.toString).sorted
    val b = read(42L, 1000, 4).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // different seed -> different corpus
    val c = read(7L, 1000, 4).collect().map(_.toString).sorted
    assert(!a.sameElements(c))
    // injection contract holds for the union of slices
    val kw = SyntheticTweets.Keywords.toSet
    val injected = df.select("text").collect()
      .count(_.getString(0).split("\\s+").exists(kw.contains))
    assert(injected >= 200 && injected <= 500, s"$injected outside [200,500]")
    // uneven split covers the remainder path
    assert(read(1L, 10, 3).count() == 10)
  }

  test("DSv2 tweet source rejects invalid partition counts") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.TweetSourceProvider")
        .option("partitions", 0).load().count()
    }
    assert(e.getMessage.contains("partitions > 0"))
  }
}
