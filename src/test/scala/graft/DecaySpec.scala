package graft

import graft.functions.Decay
import org.apache.spark.sql.functions._

class DecaySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("decay weight closed-form: dt=0 => 1.0") {
    val w = Seq((0.0, 0.0)).toDF("t", "asof")
      .select(Decay.decayWeight($"t".cast("timestamp"), $"asof".cast("timestamp")).as("w"))
      .head().getDouble(0)
    assert(w === 1.0)
  }

  test("decay weight at effective half-life halves") {
    // effective half-life = halfLife * ln2 / rate = 60 * ln2 / 0.1 ≈ 415.888s
    val dt = 60.0 * math.log(2) / 0.1
    val w = Seq((0.0, dt)).toDF("t", "asof")
      .select(Decay.decayWeight($"t".cast("timestamp"), $"asof".cast("timestamp")).as("w"))
      .head().getDouble(0)
    assert(math.abs(w - 0.5) < 1e-9)
  }

  test("decay weight is strictly in (0, 1] for dt >= 0 and monotone") {
    val df = Seq(0.0, 1.0, 60.0, 3600.0, 86400.0).map(dt => (0.0, dt))
      .toDF("t", "asof")
      .select(Decay.decayWeight($"t".cast("timestamp"), $"asof".cast("timestamp")).as("w"))
    val ws = df.collect().map(_.getDouble(0))
    assert(ws.forall(w => w > 0.0 && w <= 1.0))
    assert(ws.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("sentiment score mapping is case-insensitive (SURVEY P8 bug fixed)") {
    val rows = Seq("Positive", "negative", "NEUTRAL", "positive", "whatever")
      .toDF("s").select(Decay.sentimentScore($"s").as("sc")).collect().map(_.getDouble(0))
    assert(rows.toSeq == Seq(1.0, -1.0, 0.0, 1.0, 0.0))
  }

  test("event score maps purchase/error/other") {
    val rows = Seq("purchase", "error", "click").toDF("s")
      .select(Decay.eventScore($"s").as("sc")).collect().map(_.getDouble(0))
    assert(rows.toSeq == Seq(1.0, -1.0, 0.0))
  }
}
